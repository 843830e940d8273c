"""Checkpoint round-trips (orbax helpers)."""

import numpy as np

import jax
import jax.numpy as jnp

from pyg_lib_tpu.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from pyg_lib_tpu.models import init_sage


def test_save_restore_roundtrip(tmp_path):
    params = init_sage(jax.random.key(0), [8, 16, 4])
    d = save_checkpoint(str(tmp_path / 'ckpt'), params, step=3,
                        metadata={'loader_epoch': 2})
    assert 'step_000000003' in d

    like = init_sage(jax.random.key(1), [8, 16, 4])  # different values
    restored, meta = restore_checkpoint(str(tmp_path / 'ckpt'), like)
    assert meta['step'] == 3 and meta['loader_epoch'] == 2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_selection(tmp_path):
    params = {'w': jnp.arange(4.0)}
    save_checkpoint(str(tmp_path / 'c'), params, step=1)
    save_checkpoint(str(tmp_path / 'c'),
                    {'w': jnp.arange(4.0) * 2}, step=10)
    assert latest_step(str(tmp_path / 'c')) == 10
    restored, meta = restore_checkpoint(str(tmp_path / 'c'),
                                        {'w': jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored['w']),
                                  np.arange(4.0) * 2)
    assert meta['step'] == 10


def test_training_resume_equivalence(tmp_path):
    """Save at step k, keep training; restore and retrain from k — the
    final params must match exactly (optimizer state included)."""
    import optax

    from pyg_lib_tpu.models import sage_forward

    rng = np.random.default_rng(0)
    n, f = 32, 8
    deg = rng.integers(1, 4, size=n)
    rowptr = np.zeros(n + 1, np.int64)
    rowptr[1:] = np.cumsum(deg)
    row = jnp.asarray(rng.integers(0, n, size=int(rowptr[-1])))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=n))

    params = init_sage(jax.random.key(0), [f, 16, 4])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss(p):
            logits = sage_forward(p, x, jnp.asarray(rowptr), row)
            return -jnp.take_along_axis(jax.nn.log_softmax(logits),
                                        y[:, None], axis=1).mean()

        g = jax.grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(3):
        params, opt_state = step(params, opt_state)
    save_checkpoint(str(tmp_path / 'r'), (params, opt_state), step=3)
    for _ in range(2):
        params, opt_state = step(params, opt_state)

    like = (init_sage(jax.random.key(9), [f, 16, 4]),
            opt.init(init_sage(jax.random.key(9), [f, 16, 4])))
    (p2, o2), meta = restore_checkpoint(str(tmp_path / 'r'), like)
    assert meta['step'] == 3
    for _ in range(2):
        p2, o2 = step(p2, o2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
