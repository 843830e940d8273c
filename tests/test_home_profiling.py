"""home dir + profiling helpers."""

import os

import numpy as np

import pyg_lib_tpu
from pyg_lib_tpu import profiling
from pyg_lib_tpu.home import get_home_dir, set_home_dir


def test_home_dir_env_and_override(tmp_path, monkeypatch):
    monkeypatch.setenv('PYG_LIB_TPU_HOME', str(tmp_path / 'envhome'))
    import pyg_lib_tpu.home as home
    monkeypatch.setattr(home, '_home_dir', None)
    assert get_home_dir() == str(tmp_path / 'envhome')
    assert os.path.isdir(get_home_dir())
    set_home_dir(str(tmp_path / 'override'))
    assert get_home_dir() == str(tmp_path / 'override')
    monkeypatch.setattr(home, '_home_dir', None)


def test_roofline_and_measure():
    import jax
    import jax.numpy as jnp

    roof = profiling.device_roofline()
    assert roof.hbm_gbps > 0 and roof.balance_flop_per_byte() > 0

    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)).astype(
        np.float32))
    fn = jax.jit(lambda a: a * 2.0)
    res = profiling.measure(fn, x, iters=3,
                            bytes_accessed=2 * x.size * 4)
    assert res['seconds'] > 0 and res['gbps'] > 0
    assert 'hbm_fraction' in res


def test_trace_context(tmp_path):
    import jax
    import jax.numpy as jnp

    with profiling.trace(str(tmp_path / 'tr')) as d:
        jnp.zeros(8).block_until_ready()
    assert os.path.isdir(d)
