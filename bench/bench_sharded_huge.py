"""31M-edge x 128-f32 full train step on one 16 GB chip (sharded plans).

Reproduces the BENCHMARKS.md huge-graph config: 2M nodes / 31M edges,
`ShardedSpmmGraph` with 8 uniform row splits, forward+backward through
`spmm_sharded`, run EAGERLY per split so plan arrays travel as device
arguments (closed-over 100+ MB constants overflow the remote compile
payload). `PYGT_HUGE_RANGE_SPLIT=S` additionally column-partitions every
split: the 1 GB feature table is far past the small-operand gather knee,
so S=4 slices should cut the dominant gather cost.

Prints one JSON line. Expect minutes of one-time cost (plan build +
first-step compiles through the tunnel); steady state is what's timed.
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

    n, e, f = 2_000_000, 31_000_000, 128
    splits = int(os.environ.get('PYGT_HUGE_SPLITS', 8))
    rs = int(os.environ.get('PYGT_HUGE_RANGE_SPLIT', 1))
    family = os.environ.get('PYGT_HUGE_GRAPH', 'uniform')
    dedup = os.environ.get('PYGT_HUGE_DEDUP', 'off')
    rng = np.random.default_rng(0)
    deg = rng.integers(0, 2 * e // n, size=n)
    deg = (deg * (e / max(deg.sum(), 1))).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    e_actual = int(rowptr[-1])
    if family == 'powerlaw':
        # papers100M-class in-degree skew (Zipf 1.2 hubs)
        p = 1.0 / np.arange(1, n + 1)**1.2
        p /= p.sum()
        col = rng.choice(n, size=e_actual, p=p).astype(np.int64)
    else:
        col = rng.integers(0, n, size=e_actual).astype(np.int64)

    t0 = time.time()
    graph = ops.build_spmm_graph_sharded(
        rowptr, col, splits, chunk=512 if rs == 1 else 'auto',
        range_split=rs, dedup=dedup)
    build_s = time.time() - t0

    x = jax.jit(
        lambda: jax.random.normal(jax.random.key(0), (n, f), jnp.float32)
    )()

    def loss(v):
        return (ops.spmm_sharded(v, graph, reduce='mean',
                                 precision='bf16')**2).sum()

    vg = jax.value_and_grad(loss)  # eager: plans ride as device args
    t0 = time.time()
    val, g = vg(x)
    float(val), float(g[0, 0])
    first_s = time.time() - t0
    t0 = time.perf_counter()
    val, g = vg(x)
    float(val), float(g[0, 0])
    step_s = time.perf_counter() - t0
    print(json.dumps({
        'config': f'31M sharded={splits} rs={rs} bf16 '
                  f'{family} dedup={dedup}',
        'step_s': round(step_s, 3),
        'first_step_s': round(first_s, 1),
        'plan_build_s': round(build_s, 1),
        'traffic_gbps': round(
            2 * (e_actual * f * 4 + e_actual * 4 + n * f * 4) / step_s /
            1e9, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
