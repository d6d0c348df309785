"""LPIPS (alex / vgg16 / squeeze) — functional JAX rebuild.

Equivalent of the reference lpipsPyTorch
(reference: lpipsPyTorch/modules/lpips.py:8-36, networks.py:36-96,
utils.py:6-8): z-score the input with the LPIPS shift/scale, run the
backbone, unit-normalize each tapped activation over channels, square the
difference, apply the learned 1x1 'lin' weights, average spatially, sum over
taps. Both eval conventions are supported: vgg on [0,1] inputs and alex on
[-1,1] inputs (reference metrics.py:71-80).

Unlike the reference (which constructs a new LPIPS net per call,
lpipsPyTorch/__init__.py:9-29), the model is loaded once and jitted.

Weights: torchvision alexnet/vgg16 `features.*` state_dicts + the LPIPS
v0.1 lin weights. None ship in this image; `load_lpips` searches
LPIPS_WEIGHTS_DIR / torch hub cache and returns None when unavailable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from guidedvd3dgs_tpu.diffusion.nnops import Params, conv2d

SHIFT = (-0.030, -0.088, -0.188)
SCALE = (0.458, 0.448, 0.450)

# torchvision `features` module indices and taps (reference networks.py:77-96)
ALEX = dict(
    convs={0: (4, 2, 11), 3: (1, 2, 5), 6: (1, 1, 3), 8: (1, 1, 3), 10: (1, 1, 3)},
    pools=[2, 5],  # maxpool3x2 BEFORE these conv indices... see _alex_forward
    target_layers=(2, 5, 8, 10, 12),
    n_channels=(64, 192, 384, 256, 256),
)


def _normalize_activation(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


def _relu(x):
    return jax.nn.relu(x)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _alex_features(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """torchvision alexnet.features taps at layer indices 2,5,8,10,12
    (after each relu; pools at 2,5 come after taps 2,5... layer order:
    0 conv(3,64,k11,s4,p2) 1 relu [tap2] 2 maxpool 3 conv(64,192,k5,p2)
    4 relu [tap5] 5 maxpool 6 conv(192,384,k3,p1) 7 relu [tap8]
    8 conv(384,256) 9 relu [tap10] 10 conv(256,256) 11 relu [tap12]."""
    feats = []
    x = conv2d(p, "0", x, stride=4, padding=2)
    feats.append(_relu(x))  # after layer idx 1 (tap index 2)
    x = _maxpool(feats[-1])
    x = conv2d(p, "3", x, padding=2)
    feats.append(_relu(x))  # tap 5
    x = _maxpool(feats[-1])
    x = conv2d(p, "6", x, padding=1)
    feats.append(_relu(x))  # tap 8
    x = conv2d(p, "8", feats[-1], padding=1)
    feats.append(_relu(x))  # tap 10
    x = conv2d(p, "10", feats[-1], padding=1)
    feats.append(_relu(x))  # tap 12
    return feats


def _maxpool_ceil(x, k=3, s=2):
    """torch MaxPool2d(ceil_mode=True): right/bottom -inf padding so the last
    partial window counts."""
    pads = []
    for dim in (1, 2):
        n = x.shape[dim]
        out = -(-(n - k) // s) + 1  # ceil
        pads.append(max(0, (out - 1) * s + k - n))
    x = jnp.pad(x, ((0, 0), (0, pads[0]), (0, pads[1]), (0, 0)),
                constant_values=-jnp.inf)
    return _maxpool(x, k, s)


def _fire(p: Params, idx: int, x: jnp.ndarray) -> jnp.ndarray:
    """SqueezeNet Fire module (squeeze 1x1 -> relu -> expand 1x1 | 3x3 concat)."""
    s = _relu(conv2d(p, f"{idx}.squeeze", x, padding=0))
    e1 = _relu(conv2d(p, f"{idx}.expand1x1", s, padding=0))
    e3 = _relu(conv2d(p, f"{idx}.expand3x3", s, padding=1))
    return jnp.concatenate([e1, e3], axis=-1)


def _squeeze_features(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """torchvision squeezenet1_1.features, LPIPS 7-slice taps (reference
    networks.py:15-16,70 SqueezeNet; slices after layers 1,4,7,9,10,11,12;
    channels 64,128,256,384,384,512,512)."""
    feats = []
    x = _relu(conv2d(p, "0", x, stride=2, padding=0))
    feats.append(x)  # slice1: conv0 + relu
    x = _maxpool_ceil(x)
    x = _fire(p, 3, x)
    feats.append(_fire(p, 4, x))  # slice2
    x = _maxpool_ceil(feats[-1])
    x = _fire(p, 6, x)
    feats.append(_fire(p, 7, x))  # slice3
    x = _maxpool_ceil(feats[-1])
    feats.append(_fire(p, 9, x))  # slice4
    feats.append(_fire(p, 10, feats[-1]))  # slice5
    feats.append(_fire(p, 11, feats[-1]))  # slice6
    feats.append(_fire(p, 12, feats[-1]))  # slice7
    return feats


def _vgg16_features(p: Params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """torchvision vgg16.features taps at 4,9,16,23,30 (relu before each
    pool). Conv indices: block1 0,2; block2 5,7; block3 10,12,14;
    block4 17,19,21; block5 24,26,28."""
    feats = []
    blocks = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    for bi, convs in enumerate(blocks):
        if bi > 0:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for ci in convs:
            x = _relu(conv2d(p, str(ci), x, padding=1))
        feats.append(x)
    return feats


_FEATURE_FNS = {"alex": _alex_features, "vgg": _vgg16_features,
                "squeeze": _squeeze_features}


@dataclass(frozen=True)
class LPIPSModel:
    net_type: str  # 'alex' | 'vgg' | 'squeeze'
    backbone: Params  # torchvision features.* (keys are bare indices)
    lin: Params  # {'0.weight': (1, C, 1, 1), ...}

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        return lpips_apply(self, x, y)


def lpips_apply(model: LPIPSModel, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: (N, 3, H, W) torch-layout images (range per eval convention).
    Returns (N,) distances."""
    shift = jnp.asarray(SHIFT).reshape(1, 1, 1, 3)
    scale = jnp.asarray(SCALE).reshape(1, 1, 1, 3)
    xi = (jnp.transpose(x, (0, 2, 3, 1)) - shift) / scale
    yi = (jnp.transpose(y, (0, 2, 3, 1)) - shift) / scale
    feat_fn = _FEATURE_FNS[model.net_type]
    fx = feat_fn(model.backbone, xi)
    fy = feat_fn(model.backbone, yi)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize_activation(a) - _normalize_activation(b)) ** 2
        w = model.lin[f"{i}.weight"].reshape(1, 1, 1, -1)  # (1, C, 1, 1) torch
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def load_lpips(net_type: str = "alex", weights_dir: Optional[str] = None) -> Optional[LPIPSModel]:
    """Load torchvision backbone + LPIPS v0.1 lin weights from disk.
    Searches `weights_dir`, $LPIPS_WEIGHTS_DIR and the torch hub cache.
    Returns None if unavailable (callers must surface this, not hide it)."""
    import glob

    dirs = [d for d in [weights_dir, os.environ.get("LPIPS_WEIGHTS_DIR")] if d]
    try:
        import torch

        dirs.append(os.path.join(torch.hub.get_dir(), "checkpoints"))
    except Exception:
        return None

    backbone_pat = {"alex": "alexnet*", "vgg": "vgg16*",
                    "squeeze": "squeezenet*"}[net_type]
    lin_pat = f"*{net_type}*.pth"
    backbone_sd = lin_sd = None
    import torch

    for d in dirs:
        if not os.path.isdir(d):
            continue
        for f in glob.glob(os.path.join(d, backbone_pat)):
            backbone_sd = torch.load(f, map_location="cpu", weights_only=False)
        for f in glob.glob(os.path.join(d, lin_pat)):
            sd = torch.load(f, map_location="cpu", weights_only=False)
            if any("lin" in k for k in sd):
                lin_sd = sd
    if backbone_sd is None or lin_sd is None:
        return None

    from guidedvd3dgs_tpu.diffusion.convert import convert_state_dict

    backbone = convert_state_dict(
        {k[len("features."):]: v for k, v in backbone_sd.items() if k.startswith("features.")}
    )
    # lpips lin weights: 'lin0.model.1.weight' -> '0.weight'
    lin = {}
    for k, v in lin_sd.items():
        if "lin" in k and k.endswith("weight"):
            idx = k.split("lin")[1].split(".")[0]
            lin[f"{idx}.weight"] = jnp.asarray(v.detach().numpy())
    return LPIPSModel(net_type=net_type, backbone=backbone, lin=lin)


def lpips(x, y, net_type: str = "alex", model: Optional[LPIPSModel] = None):
    """Reference lpipsPyTorch.lpips signature (lpipsPyTorch/__init__.py:9-29)."""
    m = model or load_lpips(net_type)
    if m is None:
        raise FileNotFoundError(
            f"LPIPS {net_type} weights not found; set LPIPS_WEIGHTS_DIR "
            "(torchvision backbone + LPIPS v0.1 lin .pth)"
        )
    return lpips_apply(m, x, y)
