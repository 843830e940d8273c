"""build_spmm_graph(reorder=...) end-to-end at headline scale.

Round-5 verdict task: integrate cluster reordering into the graph
builder and measure whether it lifts the uniform-graph gather floor.
Measures, at 262k nodes / ~4.2M edges / F=512 / bf16 messages:

* uniform-random + reorder='auto' — the adversarial headline graph;
  expectation from theory: nothing to recover (no cluster structure),
  'auto' must DECLINE so callers don't pay permute passes for nothing.
* planted-partition (256 clusters, 80% intra), SHUFFLED labels (what a
  raw dataset drop looks like) — dedup='auto' alone vs
  dedup+reorder='auto': the in-API recovery of the round-4 locality
  result (BENCHMARKS.md planted-partition row, 295-297 GB/s).

One JSON line per config (ms/iter, effective GB/s on bench.py's
useful-bytes contract, whether reorder was adopted, build seconds).
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

    n, f = 262_144, 512
    e = 4_194_304
    rng = np.random.default_rng(0)
    iters = 16
    bytes_eff = e * f * 4 + e * 4 + n * f * 4
    dev = jax.devices()[0].device_kind

    def csr(row, col):
        order = np.argsort(row, kind='stable')
        rowptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(row, minlength=n), out=rowptr[1:])
        return rowptr, col[order].astype(np.int64)

    def sbm_shuffled(clusters=256, p_intra=0.8):
        relabel = rng.permutation(n)
        size = n // clusters
        row0 = rng.integers(0, n, e)
        intra = rng.random(e) < p_intra
        base = (row0 // size) * size
        col0 = np.where(intra,
                        base + rng.integers(0, size, e),
                        rng.integers(0, n, e))
        return csr(relabel[row0], relabel[np.minimum(col0, n - 1)])

    def measure(name, rowptr, col, **build_kw):
        t0 = time.time()
        graph = ops.build_spmm_graph(rowptr, col, **build_kw)
        build_s = time.time() - t0
        x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (n, f),
                                              jnp.float32))()

        @jax.jit
        def loop(x, graph):
            def body(_, x):
                return ops.spmm(x, graph, precision='bf16') * 1e-6 + x

            return jax.lax.fori_loop(0, iters, body, x).sum()

        float(loop(x, graph))
        t0 = time.time()
        float(loop(x, graph))
        dt = max(time.time() - t0 - 0.030, 1e-6) / iters
        print(json.dumps({
            'config': name, 'ms': round(dt * 1e3, 2),
            'gbps': round(bytes_eff / dt / 1e9, 1),
            'plan': type(graph.fwd).__name__,
            'reorder_adopted': graph.perm is not None,
            'build_s': round(build_s, 1), 'backend': dev,
        }), flush=True)

    u_rp, u_cl = csr(rng.integers(0, n, e),
                     rng.integers(0, n, e).astype(np.int64))
    measure('uniform dedup=auto', u_rp, u_cl, dedup='auto')
    measure('uniform dedup=auto reorder=auto', u_rp, u_cl, dedup='auto',
            reorder='auto')
    s_rp, s_cl = sbm_shuffled()
    measure('sbm-shuffled dedup=auto', s_rp, s_cl, dedup='auto')
    measure('sbm-shuffled dedup=auto reorder=auto', s_rp, s_cl,
            dedup='auto', reorder='auto')


if __name__ == '__main__':
    main()
