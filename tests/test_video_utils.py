"""AsyncArtifactWriter (utils/video.py): ordering, completion, error
surfacing — the guided trainer's event artifacts ride this thread."""

import os

import numpy as np
import pytest

from guidedvd3dgs_tpu.utils.video import AsyncArtifactWriter, save_video


def test_writes_complete_at_drain(tmp_path):
    w = AsyncArtifactWriter()
    frames = np.zeros((3, 16, 16, 3), np.float32)
    paths = [str(tmp_path / f"v{i}.mp4") for i in range(4)]
    for p in paths:
        w.submit(save_video, frames, p)
    w.drain()
    for p in paths:
        # mp4 written, or the png-sequence fallback dir when no codec
        assert os.path.exists(p) or os.path.isdir(os.path.splitext(p)[0])


def test_errors_surface_at_drain(tmp_path):
    w = AsyncArtifactWriter()

    def boom():
        raise ValueError("bad artifact")

    w.submit(boom)
    w.submit(save_video, np.zeros((2, 8, 8, 3), np.float32),
             str(tmp_path / "ok.mp4"))
    with pytest.raises(RuntimeError, match="1 async artifact"):
        w.drain()
    # the writer stays usable after an error drain
    w.submit(save_video, np.zeros((2, 8, 8, 3), np.float32),
             str(tmp_path / "ok2.mp4"))
    w.drain()


def test_drain_idempotent_when_empty():
    w = AsyncArtifactWriter()
    w.drain()
    w.drain()
