"""Weak-scaling artifact for the distributed halo-aggregation path.

VERDICT r2 #5: ring (``ppermute``) vs all-gather halo at D in {1,2,4,8}
on a power-law graph sized D x n_per_device (weak scaling), on the
virtual CPU mesh (``--xla_force_host_platform_device_count``).

Honest metric on a TIMESHARED host: all virtual devices share one core,
so wall-clock speedup is unmeasurable; what IS measurable is the
*serialized weak-scaling efficiency* ``D * t(1) / t(D)`` — perfect
sharding (zero added communication/recompute) keeps total serialized
work proportional to total problem size, so efficiency 1.0; halo
overhead shows up as <1.0.  Real-ICI projection is driven by the also
reported ``halo_fraction`` (cross-device edges / all edges): an
all-gather moves the full feature matrix regardless, while ring traffic
is (D-1)/D of the matrix but with single-block peak memory.

Prints one JSON line per (strategy, D).
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyg_lib_tpu import datasets, parallel, partition  # noqa: E402


def measure(d, n_per_dev=8192, avg_deg=16, f=64, iters=8):
    n = d * n_per_dev
    rowptr, col = datasets.powerlaw_graph(n, avg_degree=avg_deg, seed=0)
    dev_of = np.minimum(np.arange(n) // n_per_dev, d - 1)
    row = np.repeat(np.arange(n), np.diff(rowptr))
    halo_frac = float((dev_of[row] != dev_of[col]).mean()) if len(col) \
        else 0.0

    mesh = parallel.make_mesh((d, ), ('data', ),
                              devices=jax.devices()[:d])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, f)).astype(np.float32))
    x = jax.device_put(x, parallel.named_sharding(mesh, 'data', None))

    out = {}
    ep = partition.mesh_edge_partition(rowptr, col, d)
    epb = partition.mesh_edge_partition_blocked(rowptr, col, d)
    spec = parallel.named_sharding(mesh, 'data', None)
    spec3 = parallel.named_sharding(mesh, 'data', None, None)
    src_ids = jax.device_put(jnp.asarray(ep.src_ids), spec)
    rp = jax.device_put(jnp.asarray(ep.rowptr), spec)
    rb = jax.device_put(jnp.asarray(epb.rowptr_blk), spec3)
    sb = jax.device_put(jnp.asarray(epb.src_blk), spec3)

    for name, fn in (
            ('all_gather', lambda xx: parallel.halo_exchange_aggregate(
                mesh, xx, src_ids, rp)),
            ('ring', lambda xx: parallel.ring_halo_aggregate(
                mesh, xx, rb, sb))):

        @jax.jit
        def loop(xx, fn=fn):
            def body(_, xx):
                return fn(xx) * 1e-6 + xx

            return jax.lax.fori_loop(0, iters, body, xx).sum()

        float(loop(x))
        t0 = time.perf_counter()
        float(loop(x))
        out[name] = (time.perf_counter() - t0) / iters
    return halo_frac, out


def main():
    t1 = {}
    for d in (1, 2, 4, 8):
        halo_frac, times = measure(d)
        for name, t in times.items():
            if d == 1:
                t1[name] = t
            eff = d * t1[name] / t if t > 0 else 0.0
            print(json.dumps({
                'strategy': name, 'devices': d,
                'halo_fraction': round(halo_frac, 3),
                'ms_per_step': round(t * 1e3, 2),
                'serialized_weak_efficiency': round(eff, 3),
            }), flush=True)


if __name__ == '__main__':
    main()
