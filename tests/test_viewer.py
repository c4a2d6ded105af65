"""SIBR remote-viewer protocol round-trip over a localhost socket.

Plays the client side of the wire protocol the reference's
SIBR_remoteGaussian_app speaks (network_gui.py:27-98): handshake (render
mode list), camera JSON -> raw RGB frame + source path + metrics JSON.
"""
import json
import socket
import struct
import threading

import numpy as np

from feature3dgs_tpu.viewer.network_gui import NetworkGUI


def _client_roundtrip(port, results):
    c = socket.create_connection(("127.0.0.1", port), timeout=10)
    # handshake: u32 length + JSON render item list
    n = struct.unpack("I", c.recv(4))[0]
    results["render_items"] = json.loads(c.recv(n).decode())

    w, h = 32, 16
    view = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": w, "resolution_y": h, "train": True,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": view.ravel().tolist(),
        "view_projection_matrix": view.ravel().tolist(),
        "render_mode": 0,
    }
    payload = json.dumps(msg).encode()
    c.sendall(struct.pack("I", len(payload)))
    c.sendall(payload)

    def read_exact(k):
        buf = b""
        while len(buf) < k:
            chunk = c.recv(k - len(buf))
            assert chunk, "server closed"
            buf += chunk
        return buf

    results["frame"] = read_exact(w * h * 3)
    n = int.from_bytes(read_exact(4), "little")
    results["source_path"] = read_exact(n).decode()
    n = struct.unpack("I", read_exact(4))[0]
    results["metrics"] = json.loads(read_exact(n).decode())
    c.close()


def test_viewer_protocol_roundtrip():
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]
    results = {}
    client = threading.Thread(target=_client_roundtrip, args=(port, results))
    client.start()

    # server side: accept, receive a camera, send a frame
    import time
    cam = None
    deadline = time.time() + 10
    while time.time() < deadline:
        if gui.try_connect(["RGB", "Depth"]):
            cam = gui.receive()
            break
    assert cam is not None
    assert (cam.width, cam.height) == (32, 16)
    assert cam.do_training and cam.keep_alive
    # the y/z flips + transpose turn identity into diag(1,-1,-1,1)
    np.testing.assert_allclose(cam.view, np.diag([1, -1, -1, 1]).astype(np.float32))

    img = np.zeros((16, 32, 3), np.float32)
    img[:, :, 0] = 1.0
    gui.send(img, "/some/scene", {"#": 123, "loss": 0.5})
    client.join(timeout=10)
    assert not client.is_alive()

    assert results["render_items"] == ["RGB", "Depth"]
    frame = np.frombuffer(results["frame"], np.uint8).reshape(16, 32, 3)
    assert frame[:, :, 0].min() == 255 and frame[:, :, 1].max() == 0
    assert results["source_path"] == "/some/scene"
    assert results["metrics"]["#"] == 123
    gui.disconnect()
    gui.listener.close()


def test_viewer_camera_to_view():
    from feature3dgs_tpu.viewer.network_gui import ViewerCamera
    view = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    cam = ViewerCamera(width=8, height=8, fovx=1.0, fovy=0.8, znear=0.01,
                       zfar=100.0, view=view, proj_full=view,
                       do_training=False, keep_alive=True,
                       scaling_modifier=1.0, render_mode=0)
    cv = cam.to_view()
    assert cv.width == 8 and cv.height == 8
    assert np.isfinite(np.asarray(cv.campos)).all()
