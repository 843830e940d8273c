"""Headline benchmark: planned SpMM (fused GNN aggregation) on one chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}``.

The metric is the BASELINE.json headline — SpMM (gather + segment-sum-CSR
message passing, ``pyg_lib_tpu.ops.spmm``) *effective* bandwidth: useful
bytes (x rows read once per edge + col indices + output write) divided by
steady-state wall time, on a mean-degree-16 random graph with hidden width
512 (a typical GraphSAGE/GAT hidden size).  ``vs_baseline`` is the fraction
of the chip's HBM roofline achieved (the reference publishes no numbers —
BASELINE.md — so roofline fraction is the agreed denominator).
"""

import json
import time

import numpy as np

# Per-chip HBM roofline (GB/s). TPU v5e: 819 GB/s.
HBM_ROOFLINE_GBPS = {
    'TPU v5 lite': 819.0,
    'TPU v5': 2765.0,
    'TPU v4': 1228.0,
    'cpu': 50.0,
}


def _roofline(device) -> float:
    kind = getattr(device, 'device_kind', 'cpu')
    for k, v in HBM_ROOFLINE_GBPS.items():
        if kind.startswith(k):
            return v
    return HBM_ROOFLINE_GBPS['cpu']


def main():
    import jax
    import jax.numpy as jnp

    from pyg_lib_tpu import ops

    dev = jax.devices()[0]

    # Synthetic graph: N nodes, E edges (mean degree 16), F features.
    n, e, f = 262_144, 4_194_304, 512
    rng = np.random.default_rng(0)
    deg = rng.integers(0, 2 * e // n, size=n)
    deg = (deg * (e / max(deg.sum(), 1))).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    e_actual = int(rowptr[-1])
    col = rng.integers(0, n, size=e_actual).astype(np.int32)

    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    graph = ops.build_spmm_graph(rowptr, col)  # one-time host plan

    iters = 16

    # The host<->device tunnel has ~30ms round-trip latency, so iterate
    # INSIDE one jitted program (each iteration depends on the last to
    # defeat CSE) and sync once.
    @jax.jit
    def loop(x):
        def body(_, x):
            return ops.spmm(x, graph) * 1e-6 + x

        return jax.lax.fori_loop(0, iters, body, x).sum()

    s = float(loop(x))  # compile + warmup
    start = time.perf_counter()
    s = float(loop(x))
    elapsed = (time.perf_counter() - start - 0.030) / iters

    # Useful bytes: one x row per edge + col indices + output write.
    bytes_moved = e_actual * f * 4 + e_actual * 4 + n * f * 4
    gbps = bytes_moved / elapsed / 1e9
    roof = _roofline(dev)

    print(json.dumps({
        'metric': 'spmm_effective_bandwidth',
        'value': round(gbps, 2),
        'unit': 'GB/s',
        'vs_baseline': round(gbps / roof, 4),
    }))


if __name__ == '__main__':
    main()
