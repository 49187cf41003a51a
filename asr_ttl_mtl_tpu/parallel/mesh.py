"""Device mesh and sharding rules (the framework's "communication layer").

The reference is single-GPU with no distributed backend (SURVEY.md §2.6); on
TPU the equivalent layer is a `jax.sharding.Mesh` plus named sharding rules —
XLA inserts the ICI collectives (psum for data-parallel grads, all-gather /
reduce-scatter for tensor-parallel matmuls). This module names that layer so
it is explicit and testable on simulated devices
(`--xla_force_host_platform_device_count`).

Axes:
  dp — data parallel: batch dimension of every batch array
  tp — tensor parallel: attention-head / MLP-hidden dimension of the weights

Whisper tiny/base fit on one chip, so dp is the production axis; tp rules are
still provided (and dry-run tested) so larger variants shard cleanly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Tuple[int, int] = (0, 1), devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('dp', 'tp') mesh. dp=0 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    dp, tp = mesh_shape
    if tp <= 0:
        tp = 1
    if dp <= 0:
        dp = len(devices) // tp
    n = dp * tp
    assert n <= len(devices), f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}"
    mesh_devices = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(mesh_devices, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def stacked_data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 1 (batch) of a (steps, batch, ...) stack across dp."""
    return NamedSharding(mesh, P(None, "dp", *([None] * (ndim - 2))))


def _tp_spec_for_path(path: Tuple, leaf) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    Weights are stored (in, out). Column-parallel (shard out) for QKV and MLP
    up-projection; row-parallel (shard in) for attention-out and MLP
    down-projection — the standard Megatron layout, which makes each
    attention/MLP block need exactly one psum on its output.
    """
    keys = [getattr(k, "key", getattr(k, "name", None)) or str(getattr(k, "idx", k)) for k in path]
    names = [str(k) for k in keys]
    joined = "/".join(names)

    if "blocks" not in joined:
        return P()  # embeddings, convs, final LNs: replicated
    if names[-2:] == ["out", "w"] or names[-2:] == ["fc2", "w"]:
        return P("tp", None)  # row-parallel
    if names[-1] == "w" and names[-2] in ("query", "key", "value", "fc1"):
        return P(None, "tp")  # column-parallel
    if names[-1] == "b" and names[-2] in ("query", "value", "fc1"):
        return P("tp")
    return P()  # layer norms, row-parallel biases


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a parameter tree (tp rules when tp>1)."""
    tp = mesh.shape.get("tp", 1)

    def one(path, leaf):
        if tp <= 1:
            return NamedSharding(mesh, P())
        spec = _tp_spec_for_path(path, leaf)
        # fall back to replication when a dim is not divisible by tp
        for axis, name in enumerate(spec):
            if name == "tp" and leaf.shape[axis] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Put each array in the batch dict with its batch axis over dp."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim"):
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
        else:
            out[k] = v
    return out
