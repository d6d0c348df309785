"""Tensor-parallel sharding of the diffusion stack over the 'model' axis.

The reference's only "parallelism" is putting the diffusion model on a
second GPU (SURVEY.md §2.5). TPU-native scaling instead SHARDS the UNet over
the mesh's model axis: attention/linear output features and conv output
channels are partitioned, and XLA's SPMD partitioner inserts the ICI
collectives implied by the annotations (all-gathers before norms,
reduce-scatters after row-parallel matmuls). The video frame axis rides the
'data' axis — the honest sequence-parallel analog (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from guidedvd3dgs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(name: str, arr: jnp.ndarray, model_dim_size: int) -> P:
    """Partition rule per torch-named parameter.

    Output features/channels (dim 0 of torch Linear/Conv weights) shard over
    MODEL_AXIS when divisible; biases/norms follow dim 0; everything else is
    replicated.
    """
    if arr.ndim == 0:
        return P()
    d0 = arr.shape[0]
    divisible = d0 % model_dim_size == 0 and d0 >= model_dim_size
    is_norm = ".norm" in name or name.endswith((".0.weight", ".0.bias")) and arr.ndim == 1
    if not divisible:
        return P()
    if arr.ndim >= 2 and (".weight" in name) and not is_norm:
        # torch Linear (out, in) / Conv (out, in, ...) — shard out features
        return P(MODEL_AXIS, *([None] * (arr.ndim - 1)))
    return P()


def shard_params(params, mesh: Mesh):
    """Place a torch-named parameter dict with model-axis sharding.

    Also accepts a DiffusionParams-style NamedTuple of sub-model dicts
    (each dict sharded independently, same rules)."""
    if not isinstance(params, dict) and hasattr(params, "_fields"):
        return type(params)(*[shard_params(d, mesh) for d in params])
    msize = mesh.shape[MODEL_AXIS]
    out = {}
    for k, v in params.items():
        spec = _spec_for(k, v, msize)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_video_batch(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Shard the frame axis of (B, T, H, W, C) video tensors over DATA_AXIS."""
    return jax.device_put(x, NamedSharding(mesh, P(None, DATA_AXIS)))
