"""End-to-end training tests: the milestone-config shapes actually learn
(BASELINE.json configs 1-2 at synthetic scale)."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def test_full_batch_gcn_learns():
    from examples.train_gcn import main
    acc = main(num_nodes=200, epochs=60, verbose=False)
    assert acc > 0.85, acc


def test_minibatch_sage_learns():
    from examples.train_sage_minibatch import main
    acc = main(num_nodes=400, steps=40, batch_size=32, verbose=False)
    assert acc > 0.8, acc


def test_hetero_rgcn_learns():
    from examples.train_rgcn_hetero import main
    acc = main(num_papers=200, num_authors=100, steps=40, batch_size=24,
               verbose=False)
    assert acc > 0.8, acc
