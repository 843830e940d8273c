"""Sharded training steps for sampled mini-batch GNN training.

Data-parallel over the batch axis (each device gets a slice of the padded
mini-batches), parameters replicated (optionally tensor-sharded on the
'model' axis via ``param_spec`` or caller-side constraints). Gradients
are averaged by XLA's automatic collectives under ``jit`` with sharded
inputs — no hand-written psum needed (the compiler inserts
reduce-scatter/all-reduce over ICI).

The reference has no training layer (it is a kernel library; SURVEY.md
§2.5); this provides the TPU-native memory/throughput levers a
production loop needs on 16 GB chips:

* **gradient accumulation** (``accum_steps``) — a ``lax.scan`` over
  microbatches inside one compiled step, trading wall time for
  activation memory so sampled batches can exceed what one backward
  pass fits;
* **rematerialisation** (``remat=True``) — ``jax.checkpoint`` around
  the loss, re-computing activations in the backward instead of
  storing them (pairs with the sharded 31M-edge plans, DESIGN.md §8);
* **buffer donation** (``donate=True``, opt-in: it invalidates the
  caller's params/opt-state references) — buffers are donated to the
  step so XLA updates them in place instead of holding old+new copies
  live.
"""

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding

__all__ = ['make_train_step']


def make_train_step(loss_fn: Callable,
                    optimizer: optax.GradientTransformation,
                    mesh: Mesh,
                    batch_spec=None,
                    *,
                    param_spec=None,
                    accum_steps: int = 1,
                    remat: bool = False,
                    donate: bool = False):
    """Builds a jitted ``(params, opt_state, batch) -> (params, opt_state,
    loss)`` step.

    ``loss_fn(params, batch) -> scalar`` must consume one device-shard of
    the batch pytree when sharded; with ``batch_spec`` given, each leaf of
    ``batch`` is sharded accordingly (e.g. ``P('data')`` on the leading
    axis) and XLA inserts the gradient all-reduce. ``param_spec``
    optionally pins parameter (and opt-state) sharding, e.g.
    ``P('model')`` for tensor-sharded weights.

    With ``accum_steps > 1`` every leaf of ``batch`` must carry a leading
    ``[accum_steps, ...]`` microbatch axis — keep it unsharded by
    prepending ``None`` to your spec (e.g. ``P(None, 'data')``). The step
    scans the microbatches, averages their gradients and losses, and
    applies ONE optimizer update — numerically the mean-loss step over
    the concatenated batch, at one microbatch's activation footprint.
    """
    if accum_steps < 1:
        raise ValueError(f'accum_steps must be >= 1, got {accum_steps}')
    lfn = jax.checkpoint(loss_fn) if remat else loss_fn

    def step(params, opt_state, batch):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(lfn)(params, batch)
        else:
            # f32 accumulators: bf16 running sums would round away small
            # late microbatch contributions at large accum_steps.
            zeros = jax.tree.map(
                lambda p: jax.numpy.zeros(p.shape, jax.numpy.float32),
                params)

            def micro(carry, mb):
                loss_acc, grads_acc = carry
                loss, grads = jax.value_and_grad(lfn)(params, mb)
                return (loss_acc + loss.astype(jax.numpy.float32),
                        jax.tree.map(
                            lambda a, g: a + g.astype(jax.numpy.float32),
                            grads_acc, grads)), None

            # length= makes a batch whose leading axis != accum_steps an
            # immediate shape error instead of a silent mis-scaling.
            (loss, grads), _ = jax.lax.scan(
                micro, (jax.numpy.float32(0.0), zeros), batch,
                length=accum_steps)
            inv = 1.0 / accum_steps
            loss = loss * inv
            grads = jax.tree.map(
                lambda g, p: (g * inv).astype(p.dtype), grads, params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard(spec):
        return None if spec is None else NamedSharding(mesh, spec)

    kwargs = {}
    if batch_spec is not None or param_spec is not None:
        # A single sharding for a pytree argument broadcasts to all
        # leaves; None leaves a sharding to follow the argument. The
        # opt state always follows its argument (it mixes per-param
        # moments with scalar counters a broadcast spec cannot fit).
        kwargs['in_shardings'] = (shard(param_spec), None,
                                  shard(batch_spec))
    if donate:
        kwargs['donate_argnums'] = (0, 1)
    return jax.jit(step, **kwargs)
