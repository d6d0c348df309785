"""Torch checkpoint -> JAX parameter dict conversion.

Because nnops consumes torch memory layouts directly (Linear (out,in), Conv
OIHW/OIDHW — see nnops.py), conversion is a pure dtype/array copy with name
handling only:

  * the ViewCrafter ckpt quirk "framestride_embed" -> "fps_embedding"
    (reference: third_party/ViewCrafter/utils_vc/diffusion_utils.py:84-109)
  * splitting the monolithic VIPLatentDiffusion state_dict into the five
    sub-model dicts (UNet / VAE / text CLIP / image CLIP / Resampler) plus
    schedule buffers.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

import jax.numpy as jnp

SUBMODEL_PREFIXES = {
    "unet": "model.diffusion_model.",
    "vae": "first_stage_model.",
    "clip_text": "cond_stage_model.",
    "clip_image": "embedder.",
    "resampler": "image_proj_model.",
}


def to_jax(value) -> jnp.ndarray:
    if hasattr(value, "detach"):
        value = value.detach().cpu().numpy()
    return jnp.asarray(np.asarray(value))


def convert_state_dict(sd: Mapping[str, object], dtype=None) -> Dict[str, jnp.ndarray]:
    """Flat torch state_dict -> flat jnp dict (same names, same layouts)."""
    out = {}
    for k, v in sd.items():
        a = to_jax(v)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        out[k] = a
    return out


def from_torch_module(module, dtype=None) -> Dict[str, jnp.ndarray]:
    """Convert a live torch nn.Module (parity-test helper)."""
    return convert_state_dict(module.state_dict(), dtype=dtype)


def load_viewcrafter_checkpoint(path: str, dtype=None):
    """Load a ViewCrafter model.ckpt and split into sub-model param dicts.

    Handles the '*.framestride_embed.*' legacy naming
    (reference: diffusion_utils.py:95-105) and Lightning 'state_dict' nesting.
    Returns dict with keys: unet, vae, clip_text, clip_image, resampler,
    buffers (schedule arrays like scale_arr / betas).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if "module" in sd and isinstance(sd["module"], dict):  # deepspeed layout
        sd = {k.replace("module.", "", 1): v for k, v in sd["module"].items()}

    renamed = {}
    for k, v in sd.items():
        if "framestride_embed" in k:
            k = k.replace("framestride_embed", "fps_embedding")
        renamed[k] = v

    split: Dict[str, Dict[str, jnp.ndarray]] = {name: {} for name in SUBMODEL_PREFIXES}
    buffers: Dict[str, jnp.ndarray] = {}
    for k, v in renamed.items():
        for name, prefix in SUBMODEL_PREFIXES.items():
            if k.startswith(prefix):
                a = to_jax(v)
                if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
                    a = a.astype(dtype)
                split[name][k[len(prefix):]] = a
                break
        else:
            buffers[k] = to_jax(v)
    split["buffers"] = buffers
    return split
