"""Device mesh + sharding: the TPU-native replacement for the reference's
NCCL process groups (/root/reference/utils/__init__.py:124-176, main.py:322-334).

Single-controller SPMD: build a Mesh over ("data", "model") axes, annotate
shardings with NamedSharding, and let XLA insert the collectives over ICI.
  - DP: batch sharded over "data"; gradient psum is implicit in pjit.
  - TP (optional, for large variants / serving): attention-head and MLP-hidden
    dims sharded over "model".
  - SyncBN: flax BatchNorm(axis_name="data") pmeans batch stats.

Multi-host bootstrap is ``jax.distributed.initialize()`` (replaces torchrun
c10d rendezvous); nothing else changes — the mesh spans all processes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def build_mesh(config: MeshConfig = MeshConfig(),
               devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf, model_axis_size: int) -> P:
    """Tensor-parallel layout rules for LeMeViT params.

    With model_axis_size == 1 everything is replicated. Otherwise shard the
    obvious contraction-free dims: qkv/mlp-hidden outputs column-wise, the
    following projection row-wise — the Megatron layout, expressed purely as
    sharding annotations (XLA inserts the psum).
    """
    if model_axis_size <= 1:
        return P()
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(names)
    if leaf.ndim == 2:
        if any(s in joined for s in ("qkv", "qv1", "kv2", "kv", "/q/")) or \
           names[-2:-1] == ["fc1"]:
            return P(None, "model")   # column parallel
        if any(s in joined for s in ("proj", "fc2")):
            return P("model", None)   # row parallel
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with TP-aware layouts."""
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        spec = _param_spec(path, leaf, model_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
