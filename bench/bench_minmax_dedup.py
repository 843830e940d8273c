"""Dedup min/max (``pallas/spmm_dedup_minmax``) vs the per-edge path.

Round-5: ``spmm(reduce='max'/'min')`` rode the per-edge gather + scan
kernel (``segment_minmax_kernel``), paying the hub re-fetch penalty on
power-law graphs. The dedup min/max plan drops duplicate ``(row, col)``
pairs and gathers each (128-row tile, column) pair once (order
statistics make duplicates fully redundant).

Measures the VERDICT round-4 target shape — 262k nodes / 4.2M edges /
F=128, Zipf(1.2) in-degree — plus F=512 and a uniform control. One JSON
line per measurement; ``speedup`` is vs the per-edge path on the same
graph/width.
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

    n, e = 262_144, 4_194_304
    rng = np.random.default_rng(0)
    iters = 8
    dev = jax.devices()[0].device_kind

    def csr(row, col):
        order = np.argsort(row, kind='stable')
        rowptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
        return rowptr, col[order].astype(np.int64)

    def timed(graph, x):
        loop = jax.jit(lambda x, g: jax.lax.fori_loop(
            0, iters,
            lambda _, xx: ops.spmm(xx, g, reduce='max') * 1e-6 + xx,
            x).sum())
        float(loop(x, graph))
        t = time.time()
        float(loop(x, graph))
        return max(time.time() - t - 0.030, 1e-6) / iters

    graphs = {
        'powerlaw': csr(rng.integers(0, n, e),
                        rng.choice(n, e,
                                   p=(lambda q: q / q.sum())(
                                       1.0 / np.arange(1, n + 1)**1.2))),
        'uniform': csr(rng.integers(0, n, e),
                       rng.integers(0, n, e).astype(np.int64)),
    }
    for gname, (rowptr, col) in graphs.items():
        for f in ((128, 512) if gname == 'powerlaw' else (128, )):
            x = jax.jit(lambda: jax.random.normal(
                jax.random.key(0), (n, f), jnp.float32))()
            g_plain = ops.build_spmm_graph(rowptr, col)
            t0 = time.time()
            g_mm = ops.build_spmm_graph(rowptr, col, minmax='auto')
            build_s = time.time() - t0
            base = timed(g_plain, x)
            t = timed(g_mm, x) if g_mm.mm is not g_plain.fwd else base
            mm = g_mm.mm
            rec = {
                'metric': 'spmm_max_ms', 'graph': gname, 'f': f,
                'per_edge_ms': round(base * 1e3, 2),
                'dedup_ms': round(t * 1e3, 2),
                'speedup': round(base / t, 2),
                'plan': type(mm).__name__,
                'build_s': round(build_s, 1),
                'backend': dev,
            }
            if type(mm).__name__ == 'DedupMinmaxPlan':
                rec.update(ec=mm.ec, uc=mm.uc, chunks=mm.num_chunks,
                           scan_len=mm.scan_len)
            print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
