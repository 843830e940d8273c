"""Wide-feature SpMM: bf16 vs int8 quantised message streaming.

The row-gather is transaction-bound below ~2 KB rows (BENCHMARKS.md), so
message-dtype savings barely move F=512. At F=1024 the materialised slab
round-trip (gather write + kernel read) is 17 GB/iter in bf16 and half
that in int8 — this measures what the quantised mode actually buys.

Note the f32 slab at this scale (17 GB) exceeds HBM: int8/bf16 modes are
also the only way this config RUNS on one 16 GB chip.

Prints one JSON line per config. Run on the real chip.
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

    n, e, f = 262_144, 4_194_304, 1024
    rng = np.random.default_rng(0)
    deg = rng.integers(0, 2 * e // n, size=n)
    deg = (deg * (e / max(deg.sum(), 1))).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    e_actual = int(rowptr[-1])
    col = rng.integers(0, n, size=e_actual).astype(np.int32)

    x = jax.jit(
        lambda: jax.random.normal(jax.random.key(0), (n, f), jnp.float32)
    )()
    graph = ops.build_spmm_graph(rowptr, col)
    iters = 8
    useful = e_actual * f * 4 + e_actual * 4 + n * f * 4

    for prec in ('bf16', 'int8'):

        @jax.jit
        def loop(x, prec=prec):
            def body(_, x):
                return ops.spmm(x, graph, precision=prec) * 1e-6 + x

            return jax.lax.fori_loop(0, iters, body, x).sum()

        t0 = time.time()
        float(loop(x))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        float(loop(x))
        ms = max(time.perf_counter() - t0 - 0.030, 1e-6) / iters * 1e3
        print(json.dumps({
            'config': f'F={f} {prec}',
            'ms_per_iter': round(ms, 2),
            'eff_gbps': round(useful / (ms * 1e-3) / 1e9, 1),
            'compile_s': round(compile_s, 1),
        }), flush=True)


if __name__ == '__main__':
    main()
