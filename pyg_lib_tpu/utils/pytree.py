"""Plan NamedTuples as JAX pytrees with STATIC configuration.

Every host-built plan (``SpmmPlan``, ``DedupSpmmPlan``, ...) mixes
device arrays (gather lists, chunk metadata) with static configuration
(row counts, chunk sizes, flags). As plain NamedTuples they are already
pytrees — but with the static ints as *leaves*, which breaks tracing
(``plan.ec`` must stay a Python int inside ``jit``), so plans
historically had to ride jit CLOSURES. Closed-over arrays are lowered
into the compiled module as inline constants: at headline scale a dedup
plan adds ~260 MB of dense constants to every executable — measured to
push remote-compile requests over the tunnel's HTTP 413 limit and to
stretch a single compile to ~990 s (round 4).

:func:`register_plan_pytree` re-registers a plan class so its array
fields are pytree CHILDREN and its configuration fields are aux_data
(static, hashable, part of the jit cache key). Plans then pass through
``jit`` boundaries as ordinary arguments — module sizes drop back to
KBs, and two graphs with identical shapes/config share ONE compiled
executable instead of retracing.

Aux values must be hashable for jaxpr equality: small numpy arrays and
dicts in static fields are encoded to nested tuples (and decoded back
on unflatten), so classes like ``HeteroSpmmPlan`` (host-side
``src_ptr`` offsets, ``num_nodes`` dict) register cleanly.

No reference counterpart: torch passes ``Tensor`` arguments by pointer
and has no trace/compile boundary to cross.
"""

import numpy as np
from jax import tree_util

__all__ = ['register_plan_pytree']

_NP = '__np__'
_DICT = '__dict__'
_TUP = '__tup__'


def _encode_aux(v):
    """Make a static-field value hashable (tuples all the way down)."""
    if isinstance(v, np.ndarray):
        return (_NP, str(v.dtype), v.shape, tuple(v.reshape(-1).tolist()))
    if isinstance(v, dict):
        return (_DICT,
                tuple((k, _encode_aux(x)) for k, x in sorted(v.items())))
    if isinstance(v, (list, tuple)):
        # Plain tuples recurse too (a static tuple holding a numpy array
        # or dict would otherwise flatten to an unhashable treedef); the
        # tag keeps decode unambiguous vs the __np__/__dict__ markers.
        return (_TUP, tuple(_encode_aux(x) for x in v))
    return v


def _decode_aux(v):
    if isinstance(v, tuple) and len(v) == 4 and v[0] == _NP:
        return np.asarray(v[3], dtype=np.dtype(v[1])).reshape(v[2])
    if isinstance(v, tuple) and len(v) == 2 and v[0] == _DICT:
        return {k: _decode_aux(x) for k, x in v[1]}
    if isinstance(v, tuple) and len(v) == 2 and v[0] == _TUP:
        return tuple(_decode_aux(x) for x in v[1])
    return v


def register_plan_pytree(cls, static_fields):
    """Register NamedTuple ``cls`` as a pytree whose ``static_fields``
    ride aux_data; remaining fields are children. Explicit registration
    takes precedence over JAX's built-in namedtuple handling. Returns
    ``cls`` (usable as a class decorator via ``partial``)."""
    static_fields = tuple(static_fields)
    unknown = set(static_fields) - set(cls._fields)
    if unknown:
        raise ValueError(f'{cls.__name__} has no fields {sorted(unknown)}')
    dyn_fields = tuple(f for f in cls._fields if f not in static_fields)

    def flatten_with_keys(p):
        children = tuple((tree_util.GetAttrKey(f), getattr(p, f))
                         for f in dyn_fields)
        aux = tuple(_encode_aux(getattr(p, f)) for f in static_fields)
        return children, aux

    def flatten(p):
        return (tuple(getattr(p, f) for f in dyn_fields),
                tuple(_encode_aux(getattr(p, f)) for f in static_fields))

    def unflatten(aux, children):
        kw = dict(zip(dyn_fields, children))
        kw.update(
            {f: _decode_aux(v)
             for f, v in zip(static_fields, aux)})
        return cls(**kw)

    tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten,
                                        flatten)
    return cls
