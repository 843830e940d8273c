"""Unsorted scatter vs sort+segment vs planned SpMM-style reduce, on chip.

VERDICT r2 #9: ``ops.scatter_*`` rides XLA's generic scatter
(``.at[].add``); SURVEY §7's plan said "sort + segment under the hood;
TPUs hate atomics" — but nobody measured which wins on the real chip.
This races, at E in {1M, 4M} x F in {128, 512}:

  a) xla_scatter   — ops.scatter_sum (jnp .at[].add, unsorted index)
  b) sort_segment  — argsort(index) once per call + gather + segment_sum
  c) presorted     — segment_sum on an already-sorted index (the loader/
     plan path: sorting amortised to zero across steps)

Prints one JSON line per config; the scatter() docstring routes by this
table.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import numpy as np

    import jax

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(HERE, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    import jax.numpy as jnp

    from pyg_lib_tpu import ops

    rng = np.random.default_rng(0)
    iters = 8
    for e in (1_048_576, 4_194_304):
        n = e // 16
        for f in (128, 512):
            idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
            idx_sorted = jnp.sort(idx)
            src = jax.jit(lambda: jax.random.normal(
                jax.random.key(0), (e, f), jnp.float32))()

            def mk_loop(fn, n=n, f=f):
                @jax.jit
                def loop(s):
                    # Carry the [n, f] OUTPUT accumulator (the [e, f]
                    # source stays loop-invariant); the data dependence
                    # keeps XLA from collapsing the iterations.
                    def body(_, out):
                        return fn(s + out.sum() * 1e-12)

                    return jax.lax.fori_loop(
                        0, iters, body, jnp.zeros((n, f),
                                                  jnp.float32)).sum()

                return loop

            configs = {
                'xla_scatter': mk_loop(
                    lambda s: ops.scatter_sum(s, idx, dim=0, dim_size=n)),
                'sort_segment': mk_loop(lambda s: jax.ops.segment_sum(
                    jnp.take(s, jnp.argsort(idx), axis=0),
                    idx_sorted, num_segments=n,
                    indices_are_sorted=True)),
                'presorted': mk_loop(lambda s: jax.ops.segment_sum(
                    s, idx_sorted, num_segments=n,
                    indices_are_sorted=True)),
            }
            for name, loop in configs.items():
                try:
                    float(loop(src))
                    t0 = time.perf_counter()
                    float(loop(src))
                    ms = max(time.perf_counter() - t0 - 0.030,
                             1e-6) / iters * 1e3
                    gbps = (e * f * 4 + n * f * 4) / (ms * 1e-3) / 1e9
                    print(json.dumps({
                        'strategy': name, 'E': e, 'F': f,
                        'ms': round(ms, 2), 'eff_gbps': round(gbps, 1),
                    }), flush=True)
                except Exception as exc:
                    print(json.dumps({'strategy': name, 'E': e, 'F': f,
                                      'error': repr(exc)[:200]}),
                          flush=True)


if __name__ == '__main__':
    main()
