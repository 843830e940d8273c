"""Checkpoint helpers (orbax) for params, optimizer state and loaders.

The reference's only persistence is TorchScript pickling of its stateful
classes (``csrc/classes/cpu/hash_map.cpp:265-275`` ``def_pickle``); a
training framework needs real checkpoints. These helpers wrap
``orbax.checkpoint.StandardCheckpointer`` for array pytrees (params /
opt_state) and attach small JSON metadata (step, loader epoch) so a run
resumes exactly: SpMM plans and sampler engines are NOT serialised —
they are deterministic functions of the (graph, seed) already on disk
and rebuild faster than they (de)serialise.
"""

import json
import os
from typing import Any, Dict, Optional

__all__ = ['save_checkpoint', 'restore_checkpoint', 'latest_step']


_LOADER_KEY = 'loader_state'


def _ckpt_dir(path: str, step: Optional[int]) -> str:
    return os.path.join(path, f'step_{step:09d}') if step is not None \
        else path


def save_checkpoint(path: str, state, step: Optional[int] = None,
                    metadata: Optional[Dict[str, Any]] = None,
                    loader=None) -> str:
    """Saves an array pytree (params / (params, opt_state) / any pytree)
    plus JSON ``metadata`` under ``path[/step_XXXXXXXXX]``. Returns the
    checkpoint directory.

    ``loader``: a ``pyg_lib_tpu.loader.*Loader`` (anything exposing
    ``state_dict()``) whose position is stored in the metadata, so
    :func:`restore_checkpoint` with ``loader=`` resumes epochs and sample
    streams exactly."""
    import orbax.checkpoint as ocp

    d = os.path.abspath(_ckpt_dir(path, step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(d, 'state'), state, force=True)
    meta = dict(metadata or {})
    if loader is not None:
        meta[_LOADER_KEY] = loader.state_dict()
    if step is not None:
        meta['step'] = step
    with open(os.path.join(d, 'metadata.json'), 'w') as f:
        json.dump(meta, f)
    return d


def restore_checkpoint(path: str, like, step: Optional[int] = None,
                       loader=None):
    """Restores ``(state, metadata)``; ``like`` is an abstract or concrete
    pytree with the target structure/shapes (e.g. freshly-initialised
    params). ``step=None`` on a stepped directory picks the latest.
    ``loader=``: apply the checkpoint's stored loader position via
    ``loader.load_state_dict`` (no-op if the checkpoint has none)."""
    import orbax.checkpoint as ocp

    if step is None and latest_step(path) is not None:
        step = latest_step(path)
    d = os.path.abspath(_ckpt_dir(path, step))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(d, 'state'), like)
    meta_path = os.path.join(d, 'metadata.json')
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if loader is not None and _LOADER_KEY in meta:
        loader.load_state_dict(meta[_LOADER_KEY])
    return state, meta


def latest_step(path: str) -> Optional[int]:
    """Largest COMPLETE ``step_*`` checkpoint under ``path`` (None if
    flat or none complete).

    ``metadata.json`` is the commit marker: :func:`save_checkpoint`
    writes it strictly AFTER the orbax save finalises, so a directory
    missing it is a crashed/in-progress save — resume must fall back to
    the previous intact step rather than fail (or silently drop the
    loader position) on a half-written one."""
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith('step_'):
            try:
                step = int(name[5:])
            except ValueError:
                continue
            if os.path.exists(os.path.join(path, name, 'metadata.json')):
                steps.append(step)
    return max(steps) if steps else None
