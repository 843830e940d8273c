"""Head-to-head: pyg_lib_tpu host ops vs the reference libpyg.so.

Races the C++ sampling engine and the host-side op fallbacks against the
reference's own CPU kernels (``torch.ops.pyg.*``) on IDENTICAL inputs —
the reference's benchmark suite does the same against torch-sparse/DGL
(reference ``benchmark/sampler/neighbor.py:50-120``,
``benchmark/sampler/hetero_neighbor.py:16-60``).

Requires the locally-built reference (``python tools/build_reference.py``,
path override via ``PYGT_REFERENCE_LIB``).  Prints one JSON line per
(op, config): ``{"op": ..., "threads": N, "ours_ms": ..., "ref_ms": ...,
"speedup": ours-vs-ref}``. speedup > 1 means pyg_lib_tpu is faster.

Sampler timings are single-process wall clock over `repeat` calls on
fresh seed batches (both engines pay their full per-call cost, including
output allocation). RNG draws differ across engines by design — the work
per call is the same distributionally (uniform fanout sampling on the
same graph); sizes are reported so skew would be visible.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_LIB = os.environ.get('PYGT_REFERENCE_LIB', '/tmp/refsrc/build/libpyg.so')


def _bench(fn, repeat=10, warmup=2):
    """Median per-call ms. Median, not mean: this 1-core dev VM shows
    rare ~100 ms scheduler stalls that poison a 10-rep mean (a single
    stall measured subgraph at 8 ms vs its true 0.27 ms)."""
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # ms


def main():
    import torch

    if not os.path.exists(_LIB):
        print(json.dumps({'error': f'{_LIB} missing; run '
                          'tools/build_reference.py'}))
        return
    torch.ops.load_library(_LIB)
    pyg = torch.ops.pyg

    from pyg_lib_tpu import datasets, sampler
    from pyg_lib_tpu.sampler import _cpp

    assert _cpp.get_lib() is not None, 'native sampler not built'

    results = []

    def emit(op, threads, ours_ms, ref_ms, **extra):
        rec = {'op': op, 'threads': threads, 'ours_ms': round(ours_ms, 3),
               'ref_ms': round(ref_ms, 3),
               'speedup': round(ref_ms / max(ours_ms, 1e-9), 2), **extra}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---------------------------------------------------------- graphs ----
    n = 1_000_000
    rowptr, col = datasets.powerlaw_graph(n, avg_degree=16, seed=0)
    rowptr_t = torch.from_numpy(rowptr)
    col_t = torch.from_numpy(col)
    rng = np.random.default_rng(0)
    batches = [rng.choice(n, size=1024, replace=False).astype(np.int64)
               for _ in range(12)]
    fanouts = [15, 10, 5]

    for threads in (1, 8):
        torch.set_num_threads(threads)
        _cpp.set_num_threads(threads)

        # ---------------------------------------------- neighbor_sample ----
        it = iter(range(10**9))

        def ours_ns():
            seeds = batches[next(it) % len(batches)]
            sampler.neighbor_sample(rowptr, col, seeds, fanouts,
                                    rng=next(it), impl='cpp')

        it2 = iter(range(10**9))

        def ref_ns():
            seeds = torch.from_numpy(batches[next(it2) % len(batches)])
            pyg.neighbor_sample(rowptr_t, col_t, seeds, fanouts, None, None,
                                None, None, False, False, True, False,
                                'uniform', True)
        emit('neighbor_sample[15,10,5]', threads, _bench(ours_ns),
             _bench(ref_ns))

        # one-hop full expansion stresses the mapper/relabel path
        def ours_1hop():
            seeds = batches[next(it) % len(batches)]
            sampler.neighbor_sample(rowptr, col, seeds, [-1], rng=next(it),
                                    impl='cpp')

        def ref_1hop():
            seeds = torch.from_numpy(batches[next(it2) % len(batches)])
            pyg.neighbor_sample(rowptr_t, col_t, seeds, [-1], None, None,
                                None, None, False, False, True, False,
                                'uniform', True)
        emit('neighbor_sample[-1]', threads, _bench(ours_1hop),
             _bench(ref_1hop))

        # -------------------------------------------------------- subgraph
        sub_nodes = np.sort(batches[0][:1024])
        sub_nodes_t = torch.from_numpy(sub_nodes)

        def ours_sub():
            sampler.subgraph(rowptr, col, sub_nodes, impl='cpp')

        def ref_sub():
            pyg.subgraph(rowptr_t, col_t, sub_nodes_t, True)
        emit('subgraph[1024]', threads, _bench(ours_sub), _bench(ref_sub))

        # ----------------------------------------------------- random_walk
        def ours_rw():
            sampler.random_walk(rowptr, col, batches[0], 80, rng=next(it))

        def ref_rw():
            pyg.random_walk(rowptr_t, col_t, torch.from_numpy(batches[0]),
                            80, 1.0, 1.0)
        emit('random_walk[80]', threads, _bench(ours_rw), _bench(ref_rw))

    # ------------------------------------------------ hetero (OMP scaling)
    rng = np.random.default_rng(1)
    N = {'paper': 200_000, 'author': 300_000}
    ets = [('paper', 'cites', 'paper'), ('author', 'writes', 'paper'),
           ('paper', 'rev_writes', 'author')]
    rowptr_d, col_d, rowptr_dt, col_dt = {}, {}, {}, {}
    for (s, r, d) in ets:
        e = 2_000_000
        rows = np.sort(rng.integers(0, N[s], size=e))
        rp = np.zeros(N[s] + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=N[s]), out=rp[1:])
        cc = rng.integers(0, N[d], size=e).astype(np.int64)
        rowptr_d[(s, r, d)] = rp
        col_d[(s, r, d)] = cc
        key = f'{s}__{r}__{d}'
        rowptr_dt[key] = torch.from_numpy(rp)
        col_dt[key] = torch.from_numpy(cc)
    nn = {k: [10, 10] for k in ets}
    nn_t = {f'{s}__{r}__{d}': [10, 10] for (s, r, d) in ets}
    node_types = ['paper', 'author']
    edge_types_list = [list(et) for et in ets]
    seeds_p = [rng.choice(N['paper'], 1024, replace=False).astype(np.int64)
               for _ in range(8)]

    for threads in (1, 8):
        torch.set_num_threads(threads)
        _cpp.set_num_threads(threads)
        it = iter(range(10**9))

        def ours_het():
            sampler.hetero_neighbor_sample(
                rowptr_d, col_d, {'paper': seeds_p[next(it) % 8]}, nn,
                rng=next(it), impl='cpp')

        it2 = iter(range(10**9))

        def ref_het():
            pyg.hetero_neighbor_sample(
                node_types, edge_types_list, rowptr_dt, col_dt,
                {'paper': torch.from_numpy(seeds_p[next(it2) % 8])}, nn_t,
                None, None, None, None, False, False, True, False,
                'uniform', True)
        emit('hetero_neighbor_sample[10,10]', threads, _bench(ours_het, 6),
             _bench(ref_het, 6))

    # --------------------------------------- device-op host comparisons ----
    # The reference's scatter/segment run on the torch CPU backend; ours
    # run through JAX (XLA:CPU here — on TPU they are measured by
    # bench_ops.py instead). Apples-to-apples only as "host fallback".
    # NOTE: env vars are too late here (the axon dev image imports jax at
    # interpreter startup, capturing JAX_PLATFORMS=axon) — force the CPU
    # backend through jax.config like tests/conftest.py does, and verify.
    import jax

    jax.config.update('jax_platforms', 'cpu')
    assert jax.default_backend() == 'cpu', (
        'device-op comparison must run on XLA:CPU, got '
        f'{jax.default_backend()}')
    import jax.numpy as jnp

    from pyg_lib_tpu import ops

    e, f, nseg = 4_000_000, 128, 250_000
    idx = np.sort(rng.integers(0, nseg, size=e)).astype(np.int64)
    src = rng.normal(size=(e, f)).astype(np.float32)
    src_j = jnp.asarray(src)
    idx_j = jnp.asarray(idx)
    src_t = torch.from_numpy(src)
    idx_t = torch.from_numpy(idx)
    indptr = np.zeros(nseg + 1, np.int64)
    np.cumsum(np.bincount(idx, minlength=nseg), out=indptr[1:])
    indptr_j = jnp.asarray(indptr)
    indptr_t = torch.from_numpy(indptr)

    torch.set_num_threads(8)
    _cpp.set_num_threads(8)

    scatter_j = jax.jit(
        lambda s, i: ops.scatter_sum(s, i, dim=0, dim_size=nseg))
    scatter_j(src_j, idx_j).block_until_ready()
    emit('scatter_sum[4M,128]', 8,
         _bench(lambda: scatter_j(src_j, idx_j).block_until_ready(), 5),
         _bench(lambda: pyg.scatter_sum(src_t, idx_t, 0, None, nseg), 5),
         backend='jax-cpu-vs-torch-cpu')

    seg_j = jax.jit(lambda s, p: ops.segment_sum_csr(s, p))
    seg_j(src_j, indptr_j).block_until_ready()
    emit('segment_sum_csr[4M,128]', 8,
         _bench(lambda: seg_j(src_j, indptr_j).block_until_ready(), 5),
         _bench(lambda: pyg.segment_sum_csr(src_t, indptr_t, None), 5),
         backend='jax-cpu-vs-torch-cpu')

    slower = [r for r in results if r['speedup'] < 1.0]
    print(json.dumps({'summary': 'vs_reference', 'configs': len(results),
                      'faster_or_equal': len(results) - len(slower),
                      'slower': [f"{r['op']}@t{r['threads']}"
                                 for r in slower]}), flush=True)


if __name__ == '__main__':
    main()
