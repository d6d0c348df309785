"""Image-grid visualisation helpers.

Equivalent of the reference debug plotter (reference: utils/vis_utils.py:8-28):
a two-row grid — images on top, JET-colormapped weight maps below (first two
weight slots blank, matching the reference's two leading blank tiles) — saved
as one png. Pure numpy + cv2; channels-last (H, W, 3) float images in [0, 1].
"""

from __future__ import annotations

import numpy as np


def make_grid(images: np.ndarray, padding: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """Tile (N, H, W, 3) images into one row (H+2p, N*(W+p)+p, 3),
    torchvision.utils.make_grid(nrow=N) semantics."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    out = np.full(
        (h + 2 * padding, n * (w + padding) + padding, c), pad_value, np.float32
    )
    for i in range(n):
        x0 = padding + i * (w + padding)
        out[padding : padding + h, x0 : x0 + w] = images[i]
    return out


def colormap_jet(gray: np.ndarray) -> np.ndarray:
    """(H, W) in [0, 1] -> (H, W, 3) RGB jet colormap."""
    import cv2

    u8 = (np.clip(np.asarray(gray, np.float32), 0.0, 1.0) * 255).astype(np.uint8)
    bgr = cv2.applyColorMap(u8, cv2.COLORMAP_JET)
    return bgr[:, :, ::-1].astype(np.float32) / 255.0


def plot_images(images: np.ndarray, weight_map: np.ndarray, save_image_name: str) -> None:
    """Save a 2-row debug grid (reference utils/vis_utils.py:8-28).

    images: (N, H, W, 3) in [0, 1]; weight_map: (N-2, H, W) arbitrary range
    (min-max normalised jointly, as upstream). Row 1 = images; row 2 = two
    blank tiles then the colored maps.
    """
    import cv2

    images = np.asarray(images, np.float32)
    weight_map = np.asarray(weight_map, np.float32)
    n, h, w, _ = images.shape
    lo, hi = weight_map.min(), weight_map.max()
    norm = (weight_map - lo) / max(hi - lo, 1e-12)
    colored = np.stack([colormap_jet(m) for m in norm], 0)
    blanks = np.ones((2, h, w, 3), np.float32)
    row1 = make_grid(images)
    row2 = make_grid(np.concatenate([blanks, colored], 0))
    combined = np.concatenate([row1, row2], axis=0)
    u8 = (np.clip(combined, 0.0, 1.0) * 255).astype(np.uint8)
    cv2.imwrite(save_image_name, u8[:, :, ::-1])
