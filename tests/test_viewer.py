"""Viewer protocol: wire-format round trip against a mock SIBR client."""

import json
import socket
import threading

import numpy as np

from fourdgs_tpu.viewer import ViewerServer, decode_camera


def _client_request(port, message):
    c = socket.create_connection(("127.0.0.1", port), timeout=5)
    payload = json.dumps(message).encode()
    c.sendall(len(payload).to_bytes(4, "little"))
    c.sendall(payload)
    h, w = message["resolution_y"], message["resolution_x"]
    want = h * w * 3
    buf = b""
    while len(buf) < want:
        buf += c.recv(want - len(buf))
    vlen = int.from_bytes(c.recv(4), "little")
    verify = c.recv(vlen).decode()
    c.close()
    return np.frombuffer(buf, np.uint8).reshape(h, w, 3), verify


def test_viewer_roundtrip():
    server = ViewerServer(port=0)
    port = server.listener.getsockname()[1]
    message = {
        "resolution_x": 8, "resolution_y": 6, "train": True,
        "fov_x": 1.0, "fov_y": 0.9, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": np.eye(4, dtype=np.float32).flatten().tolist(),
        "view_projection_matrix":
            np.eye(4, dtype=np.float32).flatten().tolist(),
    }

    result = {}

    def client():
        result["img"], result["verify"] = _client_request(port, message)

    th = threading.Thread(target=client)
    th.start()

    def render(req):
        assert req.width == 8 and req.height == 6
        assert req.scaling_modifier == 1.0
        img = np.zeros((req.height, req.width, 3), np.float32)
        img[..., 0] = 1.0
        return img

    # Poll until the request is served, with a real deadline. A fixed
    # iteration count used to exhaust before the client thread even
    # connected on a loaded machine; server.close() then reset the
    # client's blocked recv -> ConnectionResetError in the thread
    # (PytestUnhandledThreadExceptionWarning under the full suite).
    import time
    deadline = time.monotonic() + 20.0
    keep = True
    while not result and time.monotonic() < deadline:
        keep = server.poll(render, verify="ok")
        time.sleep(0.001)
    th.join(timeout=5)
    assert not th.is_alive()
    server.close()
    assert result, "viewer request was never served"
    assert keep is True
    assert result["verify"] == "ok"
    assert (result["img"][..., 0] == 255).all()
    assert (result["img"][..., 1] == 0).all()


def test_decode_camera_flips():
    view = np.eye(4, dtype=np.float32)
    msg = {"resolution_x": 4, "resolution_y": 4, "train": False,
           "fov_x": 1.0, "fov_y": 1.0, "z_near": 0.01, "z_far": 100.0,
           "shs_python": False, "rot_scale_python": False,
           "keep_alive": False, "scaling_modifier": 2.0,
           "view_matrix": view.flatten().tolist(),
           "view_projection_matrix": view.flatten().tolist()}
    req = decode_camera(msg)
    # Y/Z columns flipped then transposed into M @ [x; 1] convention.
    np.testing.assert_allclose(req.viewmatrix,
                               np.diag([1.0, -1.0, -1.0, 1.0]))
    assert req.scaling_modifier == 2.0
    assert decode_camera({**msg, "resolution_x": 0}) is None
