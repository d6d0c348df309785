"""Video + image-grid artifacts (SURVEY.md §4 "visual artifacts").

Role of the reference's `save_video` (h264 mp4 writer,
third_party/ViewCrafter/utils_vc/pvd_utils.py:37-47) and
`utils/vis_utils.py:8-28 plot_images` (row grids with optional JET weight
maps): the guided trainer's primary debugging instruments. Writes mp4 via
OpenCV (mp4v) with a png-sequence fallback when no codec is available.
"""

from __future__ import annotations

import atexit
import os
import queue
import threading
from typing import Optional, Sequence

import numpy as np


class AsyncArtifactWriter:
    """Single background worker for event-artifact encodes (mp4/npz/png).

    The guided trainer spends ~7 s per diffusion event host-encoding debug
    videos (measured: 272 s of a 3457 s 10k-iter run — timing_summary.json
    `event_phase_s.artifacts`); while the main thread is blocked on device
    work it holds no GIL, so the encode overlaps training instead of
    serializing with it. Submissions must carry HOST data (np.ndarray) —
    callers do the device->host pull up front so device buffers are not
    retained across iterations. Errors are captured and re-raised at
    drain() so a broken artifact cannot crash training mid-step silently.
    """

    def __init__(self) -> None:
        self._q: "queue.Queue" = queue.Queue()
        self._errs: list = []
        self._thread: Optional[threading.Thread] = None
        # the worker is a daemon thread: without this, queued writes would
        # be silently dropped at interpreter exit whenever training dies on
        # a path that skips the timing-summary drain (ADVICE r3 #2)
        atexit.register(self._drain_at_exit)

    def _drain_at_exit(self) -> None:
        try:
            self.drain()
        except Exception as e:  # never mask the original exit reason
            import sys

            print(f"AsyncArtifactWriter: {e}", file=sys.stderr)

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, kwargs = item
            try:
                fn(*args, **kwargs)
            except Exception as e:  # surfaced at drain()
                self._errs.append(e)

    def submit(self, fn, *args, **kwargs) -> None:
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        self._q.put((fn, args, kwargs))

    def drain(self) -> None:
        """Block until every queued write finished; re-raise the first
        captured error (with the rest noted)."""
        if self._thread is not None and self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
            self._thread = None
        if self._errs:
            errs, self._errs = self._errs, []
            raise RuntimeError(
                f"{len(errs)} async artifact write(s) failed"
            ) from errs[0]


# Shared writer for trainer event artifacts (drained by the trainers'
# timing-summary write and at run end).
artifact_writer = AsyncArtifactWriter()


def _to_uint8(frames: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) float [0,1] -> uint8 (uint8 passes through unchanged —
    callers may quantize ON DEVICE and pull 1/4 of the bytes through the
    remote-TPU tunnel; see to_uint8_device)."""
    frames = np.asarray(frames)
    if frames.dtype == np.uint8:
        return frames
    return (np.clip(frames.astype(np.float32), 0.0, 1.0) * 255.0 + 0.5).astype(
        np.uint8
    )


def to_uint8_device(x):
    """Device-side mirror of _to_uint8: quantize artifacts to uint8 BEFORE
    the device->host pull. The mp4/png targets are 8-bit anyway, and the
    remote-TPU tunnel moves ~190 MB of f32 frames per diffusion event when
    pulled at full precision — this cuts every artifact pull 4x."""
    import jax.numpy as jnp

    return (jnp.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def save_video(frames: np.ndarray, path: str, fps: int = 10) -> None:
    """frames: (T, H, W, 3) in [0, 1] (rgb) or (T, H, W) grayscale."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = np.repeat(frames[..., None], 3, axis=-1)
    arr = _to_uint8(frames)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import cv2

        h, w = arr.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("VideoWriter failed to open")
        for f in arr:
            vw.write(f[:, :, ::-1])  # rgb -> bgr
        vw.release()
    except Exception:
        # fallback: frame pngs next to the requested path
        base = os.path.splitext(path)[0]
        os.makedirs(base, exist_ok=True)
        save_png_sequence(arr, base)


def save_png_sequence(frames_u8: np.ndarray, dirpath: str) -> None:
    import cv2

    for i, f in enumerate(frames_u8):
        cv2.imwrite(os.path.join(dirpath, f"{i:03d}.png"), f[:, :, ::-1])


def load_image(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3) uint8 rgb."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1].copy()


def save_image(img: np.ndarray, path: str) -> None:
    """img: (3, H, W) or (H, W, 3) or (H, W) in [0, 1]."""
    import cv2

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3):
        img = np.transpose(img, (1, 2, 0))
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, _to_uint8(img[None])[0][:, :, ::-1])


def plot_image_grid(
    rows: Sequence[np.ndarray],
    path: str,
    weights: Optional[Sequence[np.ndarray]] = None,
) -> None:
    """Stack image rows into one grid png; optional per-row weight maps are
    JET-colormapped and appended (reference utils/vis_utils.py:8-28)."""
    import cv2

    tiles = []
    for i, row in enumerate(rows):
        row = np.asarray(row)
        if row.ndim == 3 and row.shape[0] in (1, 3):
            row = np.transpose(row, (1, 2, 0))
        if row.ndim == 2:
            row = row[..., None]
        if row.shape[-1] == 1:
            row = np.repeat(row, 3, axis=-1)
        tiles.append(_to_uint8(row[None])[0])
        if weights is not None and i < len(weights) and weights[i] is not None:
            wmap = np.asarray(weights[i], np.float32)
            wmap = (wmap - wmap.min()) / max(float(wmap.max() - wmap.min()), 1e-8)
            jet = cv2.applyColorMap((wmap * 255).astype(np.uint8), cv2.COLORMAP_JET)
            tiles.append(jet[:, :, ::-1])
    grid = np.concatenate(tiles, axis=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, grid[:, :, ::-1])
