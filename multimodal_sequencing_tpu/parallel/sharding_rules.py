"""Parameter sharding rules for tensor parallelism.

Megatron-style TP over the mesh `model` axis, applied by parameter path —
no model-code changes; jit + XLA insert the collectives from the operand
shardings:

  attention query/key/value kernels  -> shard output dim   P(None, model)
  attention out kernel               -> shard input dim    P(model, None)
  MLP intermediate kernel            -> shard output dim   P(None, model)
  MLP output kernel                  -> shard input dim    P(model, None)
  matching biases of column-sharded layers -> P(model)
  embeddings / LayerNorms / heads    -> replicated

This is the standard column-then-row pairing, one all-reduce per matmul
pair in fwd/bwd. The optimizer moments (mu/nu) carry the same path
suffixes as their parameters, so one path-based rule shards the whole
TrainState consistently. The reference has no TP (SURVEY §2.4); this is
the growth path the 2-D mesh reserves.

FSDP / ZeRO-style sharding (`fsdp=True`): params and optimizer moments
additionally shard their largest free dimension over the mesh `data`
axis. XLA's SPMD partitioner inserts the all-gather before each use and
reduce-scatters the matching gradient — the standard fully-sharded
data-parallel schedule, expressed purely through shardings (no model-code
changes). Composes with the TP rules: a (in, out) kernel can end up
P(data, model). Small leaves (< _FSDP_MIN_ELEMS) stay replicated — the
gather latency would cost more than the memory saved.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# below this many elements FSDP keeps the leaf replicated (LayerNorms,
# biases: collective overhead > memory saved)
_FSDP_MIN_ELEMS = 1 << 16

# (path suffix, spec)
_RULES = [
    (("attention", "query", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "key", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "value", "kernel"), P(None, MODEL_AXIS)),
    (("attention", "query", "bias"), P(MODEL_AXIS)),
    (("attention", "key", "bias"), P(MODEL_AXIS)),
    (("attention", "value", "bias"), P(MODEL_AXIS)),
    (("attention", "out", "kernel"), P(MODEL_AXIS, None)),
    (("intermediate", "kernel"), P(None, MODEL_AXIS)),
    (("intermediate", "bias"), P(MODEL_AXIS)),
    (("output", "kernel"), P(MODEL_AXIS, None)),
]


def _path_names(path):
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        elif hasattr(p, "idx"):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


def spec_for_path(path, leaf, mesh_model_size: int):
    """PartitionSpec for one leaf by path suffix; replicate when the
    sharded dimension would not divide evenly (or the leaf is scalar)."""
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return P()
    names = _path_names(path)
    for suffix, spec in _RULES:
        k = len(suffix)
        if len(names) >= k and names[-k:] == suffix:
            axis_pos = list(spec).index(MODEL_AXIS)
            if (axis_pos < leaf.ndim
                    and leaf.shape[axis_pos] % mesh_model_size == 0):
                return spec
            return P()
    return P()


def _with_fsdp(spec: P, leaf, dsize: int,
               min_elems: int = _FSDP_MIN_ELEMS) -> P:
    """Extend a (possibly TP-sharded) spec with data-axis sharding on the
    largest still-free, evenly-divisible dimension."""
    if (not hasattr(leaf, "ndim") or leaf.ndim == 0
            or leaf.size < min_elems):
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    best, best_dim = None, 0
    for i, (e, d) in enumerate(zip(entries, leaf.shape)):
        if e is None and d % dsize == 0 and d > best_dim:
            best, best_dim = i, d
    if best is None:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def tree_shardings(tree, mesh: Mesh, fsdp: bool = False,
                   fsdp_min_elems: int = _FSDP_MIN_ELEMS,
                   apply_tp: bool = True):
    """NamedSharding tree for any pytree (TrainState, params, opt state)
    by path-suffix TP rules (+ optional FSDP data-axis sharding);
    everything unmatched is replicated. `apply_tp=False` skips the TP
    rules even when the mesh model axis is >1 — used when that axis
    hosts pipeline stages (parallel/pipeline.py), where per-layer
    weights must stay whole per stage and only FSDP applies."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    msize = sizes.get(MODEL_AXIS, 1) if apply_tp else 1
    dsize = sizes.get(DATA_AXIS, 1)
    if msize == 1 and not (fsdp and dsize > 1):
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)

    def leaf_sharding(path, leaf):
        spec = spec_for_path(path, leaf, msize) if msize > 1 else P()
        if fsdp and dsize > 1:
            spec = _with_fsdp(spec, leaf, dsize, fsdp_min_elems)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_state(state, mesh: Mesh, fsdp: bool = False,
                fsdp_min_elems: int = _FSDP_MIN_ELEMS,
                apply_tp: bool = True):
    """Place a TrainState onto the mesh with TP (+FSDP) param/moment
    shardings."""
    sh = tree_shardings(state, mesh, fsdp=fsdp,
                        fsdp_min_elems=fsdp_min_elems, apply_tp=apply_tp)
    return jax.tree.map(jax.device_put, state, sh)
