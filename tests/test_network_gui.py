"""SIBR viewer socket protocol: request -> rendered bytes + verify string."""

import json
import socket
import threading

import numpy as np

from guidedvd3dgs_tpu.viewer.network_gui import NetworkGUI


def test_gui_round_trip():
    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]

    h, w = 4, 6

    def render_fn(cam, scaling):
        assert cam.width == w and cam.height == h
        return np.full((3, h, w), 0.5, np.float32)

    def client():
        c = socket.create_connection(("127.0.0.1", port))
        msg = {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": list(np.eye(4).flatten().astype(float)),
            "view_projection_matrix": list(np.eye(4).flatten().astype(float)),
        }
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little"))
        c.sendall(payload)
        img = b""
        want = h * w * 3
        while len(img) < want:
            img += c.recv(want - len(img))
        n = int.from_bytes(c.recv(4), "little")
        verify = c.recv(n).decode()
        c.close()
        return img, verify

    result = {}

    def run_client():
        result["img"], result["verify"] = client()

    t = threading.Thread(target=run_client, daemon=True)
    t.start()
    # poll until the connection lands, then serve one request
    import time

    for _ in range(200):
        if gui.try_connect():
            break
        time.sleep(0.02)
    else:
        raise AssertionError("client never connected")
    keep = gui.serve_once(render_fn, "/path/to/scene", training=True)
    t.join(timeout=5)

    assert keep
    assert result["verify"] == "/path/to/scene"
    arr = np.frombuffer(result["img"], np.uint8)
    assert arr.shape[0] == h * w * 3
    assert (arr == 127).all()  # 0.5 * 255
