"""Gather locality via node reordering: the clustered-graph SpMM lever.

VERDICT r2 #4 / BENCHMARKS.md round-3 conclusion: the headline SpMM is
bound by the gather's per-row transaction cost, and on the
uniform-random bench graph neither fewer bytes (bf16) nor smaller table
operands (range_split — falsified on chip) lift it. The remaining route
is LOCALITY, which only exists on clustered graphs (the shape of every
real-world target: citation/product/social graphs).

This measures it end-to-end at headline scale (262k nodes / ~4.2M edges
/ F=512, bf16 messages), planted-partition graph with 32 clusters and
90% intra-cluster edges:

  a) natural    — cluster-contiguous labeling (plan order visits the
                  table one cluster window at a time);
  b) shuffled   — random labeling of the same graph (what a raw dataset
                  drop looks like; destroys locality, = headline regime);
  c) recovered  — shuffled graph -> partition.metis(k=32) ->
                  partition.cluster_reorder (OUR pipeline's answer);
  d) fused-16   — natural labeling through the compact fused-range
                  kernel (range_fused=True, S=16): per-cluster slice
                  gathers + skipped DMAs on empty (tile, range) pairs.

Prints one JSON line per variant (ms/iter, effective GB/s on the same
useful-bytes contract as bench.py) plus a summary with the
locality_speedup (natural vs shuffled) and recovery_fraction (how much
of the natural-order win metis+reorder recovers from a shuffled drop).
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

    from pyg_lib_tpu import ops, partition
    from pyg_lib_tpu.datasets import clustered_graph

    n, f, k = 262_144, 512, 32
    iters = 16
    rowptr, col, cluster = clustered_graph(n, k, avg_degree=16,
                                           p_intra=0.9, seed=0)
    e = int(rowptr[-1])

    # Shuffled labeling of the same graph.
    rng = np.random.default_rng(1)
    shuffle = rng.permutation(n)
    s_rp, s_cl, _, _ = partition.cluster_reorder(
        rowptr, col, np.argsort(shuffle))  # part=ranks -> arbitrary order

    x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (n, f),
                                          jnp.float32))()
    bytes_moved = e * f * 4 + e * 4 + n * f * 4

    def measure(name, graph, **extra):
        @jax.jit
        def loop(x):
            def body(_, x):
                return ops.spmm(x, graph, precision='bf16') * 1e-6 + x

            return jax.lax.fori_loop(0, iters, body, x).sum()

        try:
            float(loop(x))
            t0 = time.perf_counter()
            float(loop(x))
            ms = max(time.perf_counter() - t0 - 0.030, 1e-6) / iters * 1e3
            gbps = bytes_moved / (ms * 1e-3) / 1e9
            rec = {'variant': name, 'ms': round(ms, 2),
                   'eff_gbps': round(gbps, 1), **extra}
        except Exception as exc:
            rec = {'variant': name, 'error': repr(exc)[:300], **extra}
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.perf_counter()
    g_nat = ops.build_spmm_graph(rowptr, col)
    nat = measure('natural', g_nat,
                  plan_s=round(time.perf_counter() - t0, 1))
    del g_nat

    t0 = time.perf_counter()
    g_shuf = ops.build_spmm_graph(s_rp, s_cl)
    shuf = measure('shuffled', g_shuf,
                   plan_s=round(time.perf_counter() - t0, 1))
    del g_shuf

    # Recovery: our partitioner on the shuffled drop, then reorder.
    t0 = time.perf_counter()
    part = partition.metis(s_rp, s_cl, k)
    r_rp, r_cl, _, _ = partition.cluster_reorder(s_rp, s_cl, part)
    part_s = time.perf_counter() - t0
    intra = float(np.mean(
        part[np.repeat(np.arange(n), np.diff(s_rp))] == part[s_cl]))
    g_rec = ops.build_spmm_graph(r_rp, r_cl)
    rec = measure('recovered', g_rec, partition_s=round(part_s, 1),
                  intra_fraction=round(intra, 3))
    del g_rec

    # Compact fused-range kernel, one range per cluster window.
    g_fused = ops.build_spmm_graph(rowptr, col, chunk=512,
                                   range_split=16, range_fused=True)
    fused = measure('fused_range_16', g_fused)
    del g_fused

    if 'ms' in nat and 'ms' in shuf:
        summary = {
            'summary': 'locality',
            'locality_speedup': round(shuf['ms'] / nat['ms'], 2),
        }
        if 'ms' in rec:
            gain = shuf['ms'] - nat['ms']
            summary['recovery_fraction'] = round(
                (shuf['ms'] - rec['ms']) / gain, 2) if gain > 1e-9 else 0.0
        if 'ms' in fused:
            summary['fused_vs_natural'] = round(nat['ms'] / fused['ms'], 2)
        print(json.dumps(summary), flush=True)


if __name__ == '__main__':
    main()
