"""SIBR remote-viewer socket protocol (L2 aux).

Equivalent of the reference network GUI
(reference: gaussian_renderer/network_gui.py:26-85): a non-blocking TCP
listener speaking the SIBR viewer protocol — 4-byte little-endian length +
JSON request carrying resolution/fov/near-far/view matrices (with the y/z
column sign flip), answered with the raw RGB bytes + a verify string.
Class-based instead of module globals; renders via any callable
(MiniCam -> (3, H, W) float image).
"""

from __future__ import annotations

import json
import socket
import traceback
from typing import Callable, Optional, Tuple

import numpy as np

from guidedvd3dgs_tpu.scene.cameras import MiniCam


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self) -> bool:
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, socket.timeout):
            return False

    def _read(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                break
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """Returns (MiniCam | None, do_training, shs_python,
        rot_scale_python, keep_alive, scaling_modifier)
        (reference network_gui.py:56-85)."""
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, bool(msg.get("train", False)), False, False, False, 1.0
        try:
            view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            view[:, 1] *= -1
            view[:, 2] *= -1
            proj = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
            proj[:, 1] *= -1
            proj[:, 2] *= -1
            cam = MiniCam(
                width=width, height=height,
                fovy=msg["fov_y"], fovx=msg["fov_x"],
                znear=msg["z_near"], zfar=msg["z_far"],
                world_view_transform=view, full_proj_transform=proj,
            )
        except Exception:
            traceback.print_exc()
            raise
        return (
            cam,
            bool(msg["train"]),
            bool(msg["shs_python"]),
            bool(msg["rot_scale_python"]),
            bool(msg["keep_alive"]),
            msg["scaling_modifier"],
        )

    def serve_once(self, render_fn: Callable, source_path: str, training: bool) -> bool:
        """One poll of the viewer loop (the commented-out block in reference
        train_baseline.py:227 / 3DGS upstream). Returns keep-alive."""
        if self.conn is None and not self.try_connect():
            return True
        try:
            cam, do_training, *_rest, keep_alive, scaling = self.receive()
            img_bytes = None
            if cam is not None:
                img = np.asarray(render_fn(cam, scaling))
                img = np.clip(img * 255, 0, 255).astype(np.uint8)
                img_bytes = memoryview(np.transpose(img, (1, 2, 0)).copy()).tobytes()
            self.send(img_bytes, source_path)
            return keep_alive or training
        except Exception:
            self.conn = None
            return True
