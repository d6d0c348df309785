"""VGG19 perceptual loss (functional JAX).

Equivalent of the reference VggLoss (reference: utils/vgg_loss.py:4-53):
VGG19 features split after each block's last pre-pool ReLU (torchvision
`features` indices [:4], [4:9], [9:18], [18:27], [27:36]); inputs
ImageNet-normalized and bilinear-resized to 224x224 (optionally masked);
loss = sum of per-block feature MSEs.

Weights come from a torchvision vgg19 state_dict (torch layout, consumed
directly — see nnops). No pretrained weights ship in this environment, so
`load_vgg19` returns None when no file is available and callers fall back
to skipping the perceptual term (flagged, not silent).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import Params, conv2d

VGG_MEAN = (0.485, 0.456, 0.406)
VGG_STD = (0.229, 0.224, 0.225)

# torchvision vgg19.features conv indices per block (relu after each; pools
# at 4, 9, 18, 27, 36)
_BLOCK_CONVS = [
    [0, 2],  # block 1 -> relu2 (features[:4])
    [5, 7],  # block 2 (features[4:9])
    [10, 12, 14, 16],  # block 3
    [19, 21, 23, 25],  # block 4
    [28, 30, 32, 34],  # block 5
]


def _maxpool2x(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg19_block_features(p: Params, x: jnp.ndarray):
    """x: (N, H, W, 3) normalized. Yields the 5 block outputs."""
    feats = []
    for bi, convs in enumerate(_BLOCK_CONVS):
        if bi > 0:
            x = _maxpool2x(x)
        for ci in convs:
            x = jax.nn.relu(conv2d(p, f"features.{ci}", x, padding=1))
        feats.append(x)
    return feats


def vgg_perceptual_loss(
    p: Params,
    x: jnp.ndarray,  # (N, 3, H, W) in [0, 1] (torch layout like the reference)
    y: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # (N, 1, H, W)
    resize: bool = True,
) -> jnp.ndarray:
    xi = jnp.transpose(x, (0, 2, 3, 1))
    yi = jnp.transpose(y, (0, 2, 3, 1))
    mean = jnp.asarray(VGG_MEAN, xi.dtype)
    std = jnp.asarray(VGG_STD, xi.dtype)
    xi = (xi - mean) / std
    yi = (yi - mean) / std
    if resize:
        n = xi.shape[0]
        xi = jax.image.resize(xi, (n, 224, 224, 3), "bilinear")
        yi = jax.image.resize(yi, (n, 224, 224, 3), "bilinear")
        if mask is not None:
            m = jnp.transpose(mask.astype(jnp.float32), (0, 2, 3, 1))
            m = jax.image.resize(m, (n, 224, 224, 1), "nearest")
            xi = xi * m
            yi = yi * m
    loss = 0.0
    for fx, fy in zip(vgg19_block_features(p, xi), vgg19_block_features(p, yi)):
        loss = loss + jnp.mean(jnp.square(fx - fy))
    return loss


def load_vgg19(path: Optional[str] = None) -> Optional[Params]:
    """Load a torchvision vgg19 state_dict (.pth). Searches VGG19_WEIGHTS
    env var and the torch hub cache; returns None if unavailable."""
    candidates = [path, os.environ.get("VGG19_WEIGHTS")]
    try:
        import torch

        hub = os.path.join(torch.hub.get_dir(), "checkpoints")
        if os.path.isdir(hub):
            candidates += [
                os.path.join(hub, f) for f in os.listdir(hub) if f.startswith("vgg19")
            ]
    except Exception:
        pass
    for c in candidates:
        if c and os.path.exists(c):
            import torch

            from guidedvd3dgs_tpu.diffusion.convert import convert_state_dict

            sd = torch.load(c, map_location="cpu", weights_only=False)
            sd = sd.get("state_dict", sd)
            return convert_state_dict({k: v for k, v in sd.items() if k.startswith("features.")})
    return None


def random_vgg19(seed: int = 0) -> Params:
    """Random-weight VGG19 feature params: the true architecture at the true
    cost, for profiling the perceptual term when no pretrained weights are
    on disk (tools/profile_guided_iter.py). NOT a quality substitute."""
    import numpy as np

    rng = np.random.default_rng(seed)
    chans = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
             10: (128, 256), 12: (256, 256), 14: (256, 256), 16: (256, 256),
             19: (256, 512), 21: (512, 512), 23: (512, 512), 25: (512, 512),
             28: (512, 512), 30: (512, 512), 32: (512, 512), 34: (512, 512)}
    p: Params = {}
    for ci, (cin, cout) in chans.items():
        w = rng.normal(scale=(2.0 / (9 * cin)) ** 0.5, size=(cout, cin, 3, 3))
        p[f"features.{ci}.weight"] = jnp.asarray(w, jnp.float32)
        p[f"features.{ci}.bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def make_vgg_loss_fn(
    path: Optional[str] = None, random_init: bool = False
) -> Optional[Callable]:
    p = load_vgg19(path)
    if p is None and random_init:
        p = random_vgg19()
    if p is None:
        return None
    return lambda x, y, mask=None: vgg_perceptual_loss(p, x, y, mask)
