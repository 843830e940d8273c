"""R-GCN hetero paths on an ogbn-mag-shaped synthetic (scaled 1/4).

Compares the round-1 per-relation path (R dense dots + R planned spmm
calls, ``rgcn_forward_spmm``) against the round-2 fused hetero plan (one
ragged_dot grouped transform + one weighted chunked reduce per dst type,
``rgcn_forward_planned``) — SURVEY.md §7 hard part 2: relation sizes are
~100x skewed like ogbn-mag (cites 1.35M / writes 1.78M / affiliated 250k
/ has_topic 1.87M at this scale vs institution's 2.2k nodes).

Prints one JSON line per path. Run on the TPU chip.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(HERE, '.jax_cache'))
    from pyg_lib_tpu.models import gnn

    rng = np.random.default_rng(0)
    # ogbn-mag shape / 4.
    num_nodes = {'paper': 184_000, 'author': 282_000,
                 'institution': 2_200, 'field': 15_000}
    rel_shapes = {
        ('paper', 'cites', 'paper'): 1_350_000,
        ('author', 'writes', 'paper'): 1_780_000,
        ('author', 'affiliated', 'institution'): 250_000,
        ('paper', 'has_topic', 'field'): 1_870_000,
    }
    # PYGT_HETERO_SKEW=1: Zipf(1.2) source popularity per relation — the
    # real ogbn-mag shape (popular papers/fields dominate citations and
    # topics), where the per-relation dedup-auto plans engage.
    skew = os.environ.get('PYGT_HETERO_SKEW', '0') == '1'
    rowptr_d, col_d = {}, {}
    for (s, r, d), e in rel_shapes.items():
        rows = np.sort(rng.integers(0, num_nodes[d], size=e))
        rowptr = np.zeros(num_nodes[d] + 1, np.int64)
        np.cumsum(np.bincount(rows, minlength=num_nodes[d]),
                  out=rowptr[1:])
        rowptr_d[(s, r, d)] = rowptr
        if skew:
            p = 1.0 / np.arange(1, num_nodes[s] + 1)**1.2
            p /= p.sum()
            col_d[(s, r, d)] = rng.choice(num_nodes[s], size=e, p=p)
        else:
            col_d[(s, r, d)] = rng.integers(0, num_nodes[s], size=e)

    f_in, f_hid, f_out = 128, 128, 128
    params = gnn.init_rgcn_spmm(jax.random.PRNGKey(0),
                                [f_in, f_hid, f_out],
                                num_relations=len(rel_shapes))
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    x_dict = {t: jnp.asarray(rng.normal(size=(n, f_in)).astype(np.float32))
              for t, n in num_nodes.items()}

    t0 = time.perf_counter()
    graphs = gnn.build_rgcn_graphs(rowptr_d, col_d, num_nodes)
    t_plans = time.perf_counter() - t0
    from pyg_lib_tpu.ops.pallas.spmm_dedup import DedupSpmmPlan
    n_dedup = sum(
        isinstance(g.fwd, DedupSpmmPlan) for g in graphs.values())
    print(f'# skew={skew}: {n_dedup}/{len(graphs)} relations on dedup '
          'plans', flush=True)
    graphs_nodedup = (gnn.build_rgcn_graphs(rowptr_d, col_d, num_nodes,
                                            dedup='off')
                      if n_dedup else None)
    t0 = time.perf_counter()
    hplan = gnn.build_rgcn_planned(rowptr_d, col_d, num_nodes)
    t_hplan = time.perf_counter() - t0
    t0 = time.perf_counter()
    hsliced = gnn.build_rgcn_planned(rowptr_d, col_d, num_nodes,
                                     chunk='auto', range_sliced=True)
    t_hsl = time.perf_counter() - t0
    print(f'# plan build: per-relation {t_plans:.1f}s, fused '
          f'{t_hplan:.1f}s, sliced {t_hsl:.1f}s')

    iters = 8
    results = {}
    variants = [('per_relation', gnn.rgcn_forward_spmm, graphs),
                ('fused_planned', gnn.rgcn_forward_planned, hplan),
                ('fused_sliced', gnn.rgcn_forward_planned, hsliced)]
    if graphs_nodedup is not None:
        variants.insert(1, ('per_relation_nodedup', gnn.rgcn_forward_spmm,
                            graphs_nodedup))
    for name, fn, arg in variants:
        try:
            # Plans/graphs pass through jit as ARGUMENTS (registered
            # pytrees): a closure would inline their arrays as module
            # constants — measured to 413 the remote-compile tunnel once
            # the recalibrated hot matrices joined the plans.
            @jax.jit
            def loop(x_dict, arg, fn=fn):
                def body(_, xd):
                    out = fn(params, xd, arg)
                    return {t: xd[t] + 1e-9 * out[t][:xd[t].shape[0]].sum()
                            for t in xd}

                xd = jax.lax.fori_loop(0, iters, body, x_dict)
                return sum(v.sum() for v in xd.values())

            s = float(loop(x_dict, arg))
            t0 = time.perf_counter()
            s = float(loop(x_dict, arg))
            el = (time.perf_counter() - t0 - 0.030) / iters
            results[name] = el
            print(json.dumps({
                'metric': f'rgcn_mag_quarter_{name}',
                'value': round(el * 1e3, 1),
                'unit': 'ms/step',
            }), flush=True)
        except Exception as exc:  # keep measuring the other paths
            print(json.dumps({'metric': f'rgcn_mag_quarter_{name}',
                              'error': repr(exc)[:300]}), flush=True)
    if 'per_relation' in results and 'fused_planned' in results:
        print(json.dumps({
            'metric': 'rgcn_fused_speedup',
            'value': round(
                results['per_relation'] / results['fused_planned'], 2),
            'unit': 'x',
        }))
    if 'per_relation' in results and 'fused_sliced' in results:
        print(json.dumps({
            'metric': 'rgcn_sliced_speedup',
            'value': round(
                results['per_relation'] / results['fused_sliced'], 2),
            'unit': 'x',
        }))


if __name__ == '__main__':
    main()
