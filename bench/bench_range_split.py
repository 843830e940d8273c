"""Measure column-range-partitioned SpMM vs the single-plan headline.

Hypothesis (BENCHMARKS.md environment facts): the XLA row-gather's
per-row transaction cost depends on the gathered-table operand size
(~7 ns/row from <=150 MB tables vs ~13 ns/row from ~500 MB ones on
v5e). The headline bench graph's feature table is 262k x 512 f32 =
537 MB, so splitting the source-node space into S static ranges and
gathering each range's messages from a materialised <=150 MB slice
should cut the dominant gather cost ~2x, at the cost of S-1 extra
output-plane adds (stream-bound).

Prints one JSON line per config:
  {"config": "S=4 bf16", "ms_per_iter": ..., "eff_gbps": ...}

Run on the real chip (default axon env); compiles are cached in
.jax_cache so driver/bench re-runs stay warm.
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

    n, e, f = 262_144, 4_194_304, 512
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
    iters = 16
    useful = e_actual * f * 4 + e_actual * 4 + n * f * 4

    # "S=4f" = 4 ranges through the FUSED multi-range kernel (one output
    # write) vs "S=4" = separate per-range partial sums + final add.
    configs = os.environ.get('PYGT_RANGE_SPLITS', '1,2,4,4f').split(',')
    for cfg in configs:
        try:
            fused = cfg.endswith('f')
            s = int(cfg.rstrip('f'))
            t0 = time.time()
            # 'auto' chunks: per-(tile, range) counts sit near the 512
            # boundary at S=4 (mean 512), where a 512-chunk pads ~50%.
            graph = ops.build_spmm_graph(
                rowptr, col, range_split=s,
                chunk=512 if s == 1 else 'auto', range_fused=fused)
            build_s = time.time() - t0
            if s > 1:
                plans = graph.fwd.plans
                e_pad = sum(p.col_padded.shape[0] for p in plans)
            else:
                e_pad = graph.fwd.col_padded.shape[0]

            @jax.jit
            def loop(x, graph=graph):
                def body(_, x):
                    return ops.spmm(x, graph, precision='bf16') * 1e-6 + x

                return jax.lax.fori_loop(0, iters, body, x).sum()

            t0 = time.time()
            float(loop(x))
            compile_s = time.time() - t0
            t0 = time.perf_counter()
            float(loop(x))
            ms = max(time.perf_counter() - t0 - 0.030, 1e-6) / iters * 1e3
            print(json.dumps({
                'config': f'S={cfg} bf16',
                'ms_per_iter': round(ms, 2),
                'eff_gbps': round(useful / (ms * 1e-3) / 1e9, 1),
                'pad_factor': round(e_pad / e_actual, 3),
                'plan_build_s': round(build_s, 1),
                'compile_s': round(compile_s, 1),
            }), flush=True)
            del graph, loop
        except Exception as exc:  # keep measuring the other configs
            print(json.dumps({'config': f'S={cfg} bf16',
                              'error': repr(exc)[:300]}), flush=True)


if __name__ == '__main__':
    main()
