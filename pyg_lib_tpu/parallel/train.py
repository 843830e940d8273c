"""Sharded training steps for sampled mini-batch GNN training.

Data-parallel over the batch axis (each device gets a slice of the padded
mini-batches), parameters replicated (optionally tensor-sharded on the
'model' axis via sharding constraints).  Gradients are averaged by XLA's
automatic collectives under ``jit`` with sharded inputs — no hand-written
psum needed (the compiler inserts reduce-scatter/all-reduce over ICI).
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_train_step']


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    mesh: Mesh, batch_spec=None):
    """Builds a jitted ``(params, opt_state, batch) -> (params, opt_state,
    loss)`` step.

    ``loss_fn(params, batch) -> scalar`` must consume one device-shard of
    the batch pytree when sharded; with ``batch_spec`` given, each leaf of
    ``batch`` is sharded accordingly (e.g. ``P('data')`` on the leading
    axis) and XLA inserts the gradient all-reduce.
    """

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if batch_spec is not None:
        # A single sharding for a pytree argument broadcasts to all leaves;
        # None leaves params/opt_state shardings to follow their arguments
        # (they may be tensor-sharded on the 'model' axis by the caller).
        step = jax.jit(
            step,
            in_shardings=(None, None, NamedSharding(mesh, batch_spec)))
    else:
        step = jax.jit(step)
    return step
