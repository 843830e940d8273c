"""Driver-facing entry points stay green (compile-checked by the harness).

Runs on the CPU backend with 8 virtual devices (tests/conftest.py), the
same environment the driver's multi-chip dry run uses.
"""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 7
    assert bool(jax.numpy.isfinite(out).all())


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
