"""Dedup-gather SpMM (``pallas/spmm_dedup``) vs the single plan, on chip.

The round-4 lever against the gather transaction floor (DESIGN.md §8):
on graphs with tile-scope column reuse — power-law in-degree (hubs) or
cluster-contiguous locality — the dedup plan gathers each (128-row tile,
column) pair once and re-expands duplicates on the MXU, compounding
transaction savings with message-slab round-trip savings.

Measures three graph families at headline scale (262k / 4.2M / F=512):
uniform (no reuse — dedup auto-declines), power-law Zipf(1.2) (the
BASELINE milestone shape), planted-partition clustered. For each:
single-plan bf16 baseline, then dedup at f32/bf16/int8 when the
estimator picks it. One JSON line per measurement.
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
    from pyg_lib_tpu.ops.pallas.spmm_dedup import (build_dedup_plan,
                                                   dedup_plan_apply,
                                                   estimate_dedup)

    n, e, f = 262_144, 4_194_304, 512
    rng = np.random.default_rng(0)
    iters = 16
    bytes_eff = e * f * 4 + e * 4 + n * f * 4

    def csr(row, col):
        order = np.argsort(row, kind='stable')
        rowptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
        return rowptr, col[order].astype(np.int64)

    def timed(fn, x, plan):
        # the plan is a jit ARGUMENT (registered pytree): its arrays
        # lower to parameters, not inline module constants
        loop = jax.jit(lambda x, p: jax.lax.fori_loop(
            0, iters, lambda _, xx: fn(xx, p) * 1e-6 + xx, x).sum())
        float(loop(x, plan))
        t = time.time()
        float(loop(x, plan))
        return max(time.time() - t - 0.030, 1e-6) / iters

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (n, f),
                                          jnp.float32))()

    graphs = {}
    graphs['uniform'] = csr(rng.integers(0, n, e), rng.integers(0, n, e))
    p = 1.0 / np.arange(1, n + 1)**1.2
    p /= p.sum()
    graphs['powerlaw'] = csr(rng.integers(0, n, e), rng.choice(n, e, p=p))
    k = 256
    blk = n // k
    crow = rng.integers(0, n, e)
    same = rng.random(e) < 0.8
    ccol = np.where(same, (crow // blk) * blk + rng.integers(0, blk, e),
                    rng.integers(0, n, e))
    graphs['clustered'] = csr(crow, ccol)

    for name, (rowptr, col) in graphs.items():
        uc, gain = estimate_dedup(rowptr, col)
        g1 = ops.build_spmm_graph(rowptr, col)
        dt = timed(lambda xx, g: ops.spmm(xx, g, precision='bf16'), x, g1)
        emit(graph=name, plan='single', precision='bf16',
             ms=round(dt * 1e3, 2), gbps=round(bytes_eff / dt / 1e9, 1),
             est_uc=uc, est_gain=round(gain, 2))
        if gain < 1.3:
            continue
        pd = build_dedup_plan(rowptr, col, uc=uc, hot='off')
        slot_ratio = e / pd.uniq_cols.shape[0]
        base = dt
        for prec in [None, 'bf16', 'int8']:
            dt = timed(
                lambda xx, p: dedup_plan_apply(xx, p, precision=prec), x,
                pd)
            emit(graph=name, plan='dedup', precision=prec or 'f32',
                 ms=round(dt * 1e3, 2),
                 gbps=round(bytes_eff / dt / 1e9, 1),
                 slot_ratio=round(slot_ratio, 2),
                 speedup_vs_single_bf16=round(base / dt, 2))
        # Two-level plan: hot hub columns leave the chunks for the
        # VMEM-resident slab + dense count-matrix contraction.
        pdh = build_dedup_plan(rowptr, col)
        if pdh.num_hot:
            slot_ratio_h = e / (pdh.uniq_cols.shape[0] + pdh.num_hot)
            for prec in [None, 'bf16', 'int8']:
                dt = timed(
                    lambda xx, p: dedup_plan_apply(xx, p, precision=prec),
                    x, pdh)
                emit(graph=name, plan='dedup+hot', precision=prec or 'f32',
                     ms=round(dt * 1e3, 2),
                     gbps=round(bytes_eff / dt / 1e9, 1),
                     num_hot=pdh.num_hot, uc=pdh.uc,
                     slot_ratio=round(slot_ratio_h, 2),
                     speedup_vs_single_bf16=round(base / dt, 2))


if __name__ == '__main__':
    main()
