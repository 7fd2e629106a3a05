"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's DataParallel / DDP(nccl) layer
(`/root/reference/trainers/train.py:212-221,1426-1438`): a 2-D
(data, model) `jax.sharding.Mesh` over ICI, batch arrays sharded on the
`data` axis, parameters replicated (the reference model sizes need no TP;
the `model` axis exists so encoder blocks can be pjit-sharded if configs
grow — SURVEY §2.4). Gradient reduction is XLA's psum inserted by jit from
the shardings; no explicit collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data
    axis. Device order follows jax.devices() — contiguous on ICI for a
    single slice."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            f"mesh (data={n_data}, model={n_model}) does not fit "
            f"{len(devices)} devices — run on a host with enough chips or "
            f"force a virtual CPU platform (--num_cpu_devices N)")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def param_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated."""
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    sh = param_sharding(mesh)
    return jax.device_put(tree, sh)


def seq_shard(x):
    """Megatron-style sequence-parallel activation constraint: shard a
    (B, S, H) activation as P(data, model, None) so the LN/dropout/residual
    regions between the TP matmul pairs compute on S/model_size tokens per
    device; XLA turns the surrounding TP all-reduces into
    reduce-scatter + all-gather pairs. No-op when traced outside a mesh
    context, when the mesh has no model axis to use, or when S does not
    divide evenly — so model code can call it unconditionally."""
    try:  # jax.interpreters.pxla.thread_resources deprecated in 0.8.2
        from jax._src.mesh import thread_resources
    except ImportError:  # pragma: no cover - older jax
        from jax.interpreters.pxla import thread_resources
    mesh = thread_resources.env.physical_mesh
    if (mesh.empty or MODEL_AXIS not in mesh.axis_names
            or getattr(x, "ndim", 0) != 3):
        return x
    msize = dict(mesh.shape)[MODEL_AXIS]
    if msize <= 1 or x.shape[1] % msize != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, P(DATA_AXIS, MODEL_AXIS, None))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Move a host batch onto the mesh, sharding every array's leading axis
    over `data`. Non-array entries (guids, raw texts) pass through."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out
