"""Device-op benchmarks: segment/scatter/spmm bandwidth, grouped-GEMM FLOPs.

Counterpart of the reference benchmark harness
(reference ``benchmark/ops/*.py``, ``benchmark/csrc/ops/matmul.cpp``) —
prints one JSON line per metric, GB/s or TFLOP/s plus roofline fraction.

Run: ``python bench/bench_ops.py [metric-substring ...]``
(no args = all metrics; each TPU compile takes 30-60s, so CI-style runs
filter to one metric).
"""

import json
import sys
import time

import numpy as np

HBM_GBPS = {'TPU v5 lite': 819.0, 'TPU v5': 2765.0, 'TPU v4': 1228.0}
MXU_BF16_TFLOPS = {'TPU v5 lite': 197.0, 'TPU v5': 459.0, 'TPU v4': 275.0}


def _lookup(table, device, default):
    kind = getattr(device, 'device_kind', '')
    for k, v in table.items():
        if kind.startswith(k):
            return v
    return default


def _time(fn, arg, iters=8):
    import jax

    @jax.jit
    def loop(a):
        def body(_, a):
            return fn(a) * 1e-6 + a

        return jax.lax.fori_loop(0, iters, body, a).sum()

    float(loop(arg))
    t0 = time.perf_counter()
    float(loop(arg))
    return (time.perf_counter() - t0 - 0.030) / iters


def main():
    import jax
    import jax.numpy as jnp

    from pyg_lib_tpu import ops

    want = sys.argv[1:]

    def selected(name):
        return not want or any(w in name for w in want)

    dev = jax.devices()[0]
    hbm = _lookup(HBM_GBPS, dev, 50.0)
    mxu = _lookup(MXU_BF16_TFLOPS, dev, 1.0)
    results = []

    rng = np.random.default_rng(0)
    n, e, f = 262_144, 4_194_304, 128
    deg = rng.integers(0, 2 * e // n, size=n)
    deg = (deg * (e / max(deg.sum(), 1))).astype(np.int64)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    e_actual = int(rowptr[-1])
    col = rng.integers(0, n, size=e_actual).astype(np.int32)
    rp = jnp.asarray(rowptr)
    msgs = jnp.asarray(rng.normal(size=(e_actual, f)).astype(np.float32))

    # segment_sum_csr (pre-gathered messages -> per-row sums)
    if selected('segment_sum_csr'):
        def seg(m):
            o = ops.segment_sum_csr(m, rp)
            return jnp.pad(o, ((0, e_actual - n), (0, 0)))

        t = _time(seg, msgs)
        gbps = (e_actual * f * 4 + n * f * 4) / t / 1e9
        results.append({'metric': 'segment_sum_csr_bandwidth',
                        'value': round(gbps, 2), 'unit': 'GB/s',
                        'vs_roofline': round(gbps / hbm, 4)})

    # planned spmm (gather + reduce), f = 512
    if selected('spmm') or selected('aggregation'):
        f2 = 512
        x2 = jnp.asarray(rng.normal(size=(n, f2)).astype(np.float32))
        graph = ops.build_spmm_graph(rowptr, col)

        def spmm_fn(x):
            return ops.spmm(x, graph)

        t = _time(spmm_fn, x2)
        gbps = (e_actual * f2 * 4 + e_actual * 4 + n * f2 * 4) / t / 1e9
        results.append({'metric': 'spmm_effective_bandwidth',
                        'value': round(gbps, 2), 'unit': 'GB/s',
                        'vs_roofline': round(gbps / hbm, 4)})
        eps = e_actual / t / 1e9
        results.append({'metric': 'aggregation_throughput',
                        'value': round(eps, 3), 'unit': 'Gedges/s',
                        'vs_roofline': None})

    # segment_matmul (hetero per-relation transform): 8 relations, ragged
    if selected('segment_matmul'):
        g_cnt = 8
        sizes = rng.multinomial(131_072, np.ones(g_cnt) / g_cnt)
        ptr = np.zeros(g_cnt + 1, np.int64)
        ptr[1:] = np.cumsum(sizes)
        xs = jnp.asarray(
            rng.normal(size=(int(ptr[-1]), 256)).astype(np.float32))
        ws = jnp.asarray(
            rng.normal(size=(g_cnt, 256, 256)).astype(np.float32) * 0.05)
        ptr_j = jnp.asarray(ptr)

        def segmm(x):
            return ops.segment_matmul(x, ptr_j, ws)

        t = _time(segmm, xs)
        tflops = 2 * int(ptr[-1]) * 256 * 256 / t / 1e12
        results.append({'metric': 'segment_matmul_compute',
                        'value': round(tflops, 2), 'unit': 'TFLOP/s',
                        'vs_roofline': round(tflops / mxu, 4)})

    # fused segment softmax (attention path)
    if selected('softmax'):
        from pyg_lib_tpu.ops.pallas.spmm_chunked import build_spmm_plan
        from pyg_lib_tpu.ops.pallas.segment_softmax_kernel import (
            segment_softmax_planned, )
        n2, e2 = 131_072, 2_097_152
        deg2 = rng.integers(0, 2 * e2 // n2, size=n2)
        deg2 = (deg2 * (e2 / max(deg2.sum(), 1))).astype(np.int64)
        rp2 = np.zeros(n2 + 1, np.int64)
        rp2[1:] = np.cumsum(deg2)
        e2a = int(rp2[-1])
        plan = build_spmm_plan(rp2, np.zeros(e2a, np.int32), chunk=512,
                               with_edge_maps=True)
        xs2 = jnp.asarray(rng.normal(size=(plan.col_padded.shape[0],
                                           f)).astype(np.float32))

        def sm(a):
            return segment_softmax_planned(a, plan)

        t = _time(sm, xs2, iters=4)
        gbps = 4 * e2a * f * 4 / t / 1e9  # 3 reads + 1 write
        results.append({'metric': 'segment_softmax_bandwidth',
                        'value': round(gbps, 2), 'unit': 'GB/s',
                        'vs_roofline': round(gbps / hbm, 4)})

    # planned R-GCN layer (3 relations, 2 node types)
    if selected('rgcn'):
        from pyg_lib_tpu.models import (build_rgcn_graphs, init_rgcn_spmm,
                                        rgcn_forward_spmm)
        n_a, n_b, fr = 131_072, 65_536, 256
        def _csr(nd, ns, d):
            dg = rng.integers(0, 2 * d, size=nd)
            rp = np.zeros(nd + 1, np.int64)
            rp[1:] = np.cumsum(dg)
            return rp, rng.integers(0, ns, size=int(rp[-1])).astype(np.int64)
        rowptr_d, col_d = {}, {}
        rowptr_d[('a', 'r1', 'a')], col_d[('a', 'r1', 'a')] = _csr(
            n_a, n_a, 8)
        rowptr_d[('b', 'r2', 'a')], col_d[('b', 'r2', 'a')] = _csr(
            n_a, n_b, 4)
        rowptr_d[('a', 'r3', 'b')], col_d[('a', 'r3', 'b')] = _csr(
            n_b, n_a, 4)
        graphs = build_rgcn_graphs(rowptr_d, col_d, {'a': n_a, 'b': n_b})
        total_edges = sum(int(rp[-1]) for rp in rowptr_d.values())
        xd = {'a': jnp.asarray(rng.normal(size=(n_a, fr)).astype(
                  np.float32)),
              'b': jnp.asarray(rng.normal(size=(n_b, fr)).astype(
                  np.float32))}
        prm = init_rgcn_spmm(jax.random.key(0), [fr, fr], 3)

        def rgcn_fn(x_a):
            out = rgcn_forward_spmm(prm, {'a': x_a, 'b': xd['b']}, graphs)
            return out['a']

        t = _time(rgcn_fn, xd['a'], iters=4)
        results.append({'metric': 'rgcn_layer_throughput',
                        'value': round(total_edges / t / 1e9, 3),
                        'unit': 'Gedges/s', 'vs_roofline': None})

    # scatter_sum with unsorted index
    if selected('scatter_sum'):
        idx = jnp.asarray(rng.integers(0, n, size=e_actual).astype(np.int32))

        def sc(m):
            o = ops.scatter_sum(m, idx, dim=0, dim_size=n)
            return jnp.pad(o, ((0, e_actual - n), (0, 0)))

        t = _time(sc, msgs)
        gbps = (e_actual * f * 4 + n * f * 4) / t / 1e9
        results.append({'metric': 'scatter_sum_bandwidth',
                        'value': round(gbps, 2), 'unit': 'GB/s',
                        'vs_roofline': round(gbps / hbm, 4)})

    for r in results:
        print(json.dumps(r))


if __name__ == '__main__':
    main()
