"""Point-cloud classification: DGCNN EdgeConv over ops.knn graphs.

Exercises the geometry op family (knn; fps/radius power the PointNet++
variant in ``models.pointnet_sa_forward``) composed into a trainable
model — synthetic shapes (sphere / cube-shell / two-cluster) in place of
ModelNet (offline container).

    PYTHONPATH=. python examples/train_pointcloud.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from pyg_lib_tpu import ops
from pyg_lib_tpu.models import edgeconv_forward, init_edgeconv


def make_cloud(rng, label, n=128):
    if label == 0:  # sphere surface
        v = rng.normal(size=(n, 3))
        return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
            np.float32)
    if label == 1:  # cube shell
        v = rng.uniform(-1, 1, (n, 3))
        face = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        v[np.arange(n), face] = sign
        return v.astype(np.float32)
    # two gaussian clusters
    c = rng.choice([-0.7, 0.7], (n, 1))
    return (c * np.ones((1, 3)) +
            0.25 * rng.normal(size=(n, 3))).astype(np.float32)


def main(steps: int = 150, k: int = 12, n_pts: int = 128,
         verbose: bool = True):
    rng = np.random.default_rng(0)
    params = {
        'conv': init_edgeconv(jax.random.key(0), [3, 32, 64]),
        'head_w': jax.random.normal(jax.random.key(1), (64, 3)) * 0.1,
        'head_b': jnp.zeros((3, )),
    }
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def forward(p, pts, idx):
        h = edgeconv_forward(p['conv'], pts, idx, k)
        pooled = jnp.max(h, axis=0)  # global max pool
        return pooled @ p['head_w'] + p['head_b']

    @jax.jit
    def step(p, opt_state, pts, idx, y):
        def loss_fn(p):
            logits = forward(p, pts, idx)
            return -jax.nn.log_softmax(logits)[y]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(p, updates), opt_state, loss

    t0 = time.time()
    for i in range(steps):
        y = int(rng.integers(0, 3))
        pts = jnp.asarray(make_cloud(rng, y, n_pts))
        idx = ops.knn(pts, pts, k=k)  # dynamic graph per cloud
        params, opt_state, loss = step(params, opt_state, pts, idx, y)
        if verbose and i % 30 == 0:
            print(f'step {i:4d} loss {float(loss):.4f}')

    # eval accuracy on fresh clouds
    correct = 0
    trials = 60
    for _ in range(trials):
        y = int(rng.integers(0, 3))
        pts = jnp.asarray(make_cloud(rng, y, n_pts))
        idx = ops.knn(pts, pts, k=k)
        pred = int(jnp.argmax(forward(params, pts, idx)))
        correct += pred == y
    acc = correct / trials
    if verbose:
        print(f'accuracy on fresh clouds: {acc:.2f} '
              f'({time.time() - t0:.1f}s)')
    return acc


if __name__ == '__main__':
    main()
