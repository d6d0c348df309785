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
    """Partition rule per torch-named parameter (Megatron-style pairing).

    - First matmul of a pair (to_q/to_k/to_v/to_k_ip/to_v_ip, proj_in, ...):
      column-parallel — shard output features (torch Linear/Conv dim 0).
    - Second matmul of a pair (attention ``to_out.0``, feed-forward
      ``net.2``): ROW-parallel — shard input features (dim 1), so the
      sharded activations of the first matmul are consumed locally and XLA
      emits one psum/reduce-scatter per pair instead of all-gathering
      activations around every layer.
    - GEGLU ``net.0.proj``: replicated — dim-0 sharding would split the
      (value, gate) concat halves across different devices and force a
      regather at the jnp.split; its pair partner ``net.2`` still
      row-parallelizes by local slicing of the replicated activation.
    - Norm scales/biases and anything non-divisible: replicated.
    """
    if arr.ndim == 0:
        return P()
    # precedence fixed (ADVICE/VERDICT r2): the ndim guard must apply to the
    # endswith clause only, not bind tighter than the `or`
    is_norm = (".norm" in name) or (
        name.endswith((".0.weight", ".0.bias")) and arr.ndim == 1
    )
    if arr.ndim >= 2 and (".weight" in name) and not is_norm:
        if name.endswith((".to_out.0.weight", ".net.2.weight")):
            d1 = arr.shape[1]
            if d1 % model_dim_size == 0 and d1 >= model_dim_size:
                return P(None, MODEL_AXIS, *([None] * (arr.ndim - 2)))
            return P()
        if name.endswith(".net.0.proj.weight"):
            return P()
        d0 = arr.shape[0]
        if d0 % model_dim_size == 0 and d0 >= model_dim_size:
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
