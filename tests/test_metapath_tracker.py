"""MetapathTracker: expected/reported accounting parity with the reference
algorithm (reference csrc/classes/cpu/neighbor_sampler.cpp:62-160)."""

import numpy as np

from pyg_lib_tpu.classes import MetapathTracker


def test_metapath_tree_and_expected_sizes():
    edge_types = [('a', 'to', 'b'), ('b', 'to', 'a')]
    nn = {('a', 'to', 'b'): [2, 2], ('b', 'to', 'a'): [3, 3]}
    tr = MetapathTracker(edge_types, nn, seed_node_types=['a'])

    # hop 0: seed metapath 0 (type a)
    # hop 1: a->b gives mp 1; b->a inapplicable (no b sources yet)
    # hop 2: a->b from nothing new... b->a from mp 1 gives mp 2, plus
    #        a->b from remaining a-sources.
    mp_seed = tr.init_batch(batch_id=0, node_t='a', batch_size=5)
    assert mp_seed == 0
    mp_ab = tr.get_neighbor_metapath(0, ('a', 'to', 'b'))
    assert tr.get_sample_size(0, 0, ('a', 'to', 'b')) == 5 * 2
    mp_aba = tr.get_neighbor_metapath(mp_ab, ('b', 'to', 'a'))
    # hop-1 expansion of mp_ab uses fanout index 1 of b->to->a: 3
    assert tr.expected_sample_size[0][mp_aba] == 5 * 2 * 3

    tr.report_sample_size(0, mp_ab, 7)
    tr.report_sample_size(0, mp_ab, 2)
    assert tr.get_reported_sample_size(0, mp_ab) == 9
    assert tr.get_reported_sample_size(0, 999) == 0
    assert tr.get_reported_sample_size(0, mp_seed) == 5


def test_metapath_multiple_seed_types():
    edge_types = [('u', 'r', 'v')]
    nn = {('u', 'r', 'v'): [4]}
    tr = MetapathTracker(edge_types, nn, seed_node_types=['u', 'v'])
    assert tr.seed_metapaths == {'u': 0, 'v': 1}
    tr.init_batch(1, 'u', 3)
    assert tr.get_sample_size(1, 0, ('u', 'r', 'v')) == 12
