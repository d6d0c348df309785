"""Device mesh helpers (L-parallel).

The reference has exactly one parallelism mechanism: a two-GPU model
placement split inside one process (reference: train_guidedvd.py:551-553,
arguments/__init__.py:129 `guidance_gpu_id`). On TPU we replace device
placement + blocking `.to(device)` copies with a `jax.sharding.Mesh` and
sharding annotations; XLA inserts the ICI collectives (SURVEY.md §2.5).

Axes:
  "data"  — camera/frame batch axis: the 3DGS trainer data-parallelizes the
            per-camera render+loss over chips (grads all-reduced by XLA);
            the diffusion stack shards the 25-frame video axis here too
            (the honest "sequence parallel" analog, SURVEY.md §5.7).
  "model" — tensor-parallel axis for the diffusion UNet/VAE (attention heads
            and conv channels over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis batch sharding: (axis, None, None, ...)."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
