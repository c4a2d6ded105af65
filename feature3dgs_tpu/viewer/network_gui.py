"""SIBR-remote-viewer-compatible TCP server.

Speaks the exact wire protocol of the reference's network_gui
(/root/reference/gaussian_renderer/network_gui.py:27-98) so the upstream
SIBR_remoteGaussian_app can connect to a training/viewing process of this
framework unmodified:

  server -> client on connect : u32 length + JSON list of render-mode names
  client -> server per frame  : u32 length + JSON camera message
      {resolution_x/y, train, fov_y, fov_x, z_near, z_far, keep_alive,
       scaling_modifier, view_matrix (16 floats), view_projection_matrix,
       render_mode}
  server -> client per frame  : raw H*W*3 bytes + u32 length + source-path
                                string + u32 length + metrics JSON

Matrix conventions: the client sends torch-style row-vector matrices (the
transpose of our math-convention view matrix) with the same y/z axis flips
applied by the reference (:86-89).
"""
from __future__ import annotations

import json
import math
import socket
import struct
from dataclasses import dataclass

import numpy as np


@dataclass
class ViewerCamera:
    width: int
    height: int
    fovx: float
    fovy: float
    znear: float
    zfar: float
    view: np.ndarray       # [4,4] math convention (column vectors)
    proj_full: np.ndarray  # [4,4] = P @ V
    do_training: bool
    keep_alive: bool
    scaling_modifier: float
    render_mode: int

    def to_view(self):
        import jax.numpy as jnp
        from feature3dgs_tpu.core.projection import CameraView
        return CameraView(
            view=jnp.asarray(self.view), proj=jnp.asarray(self.proj_full),
            campos=jnp.asarray(np.linalg.inv(self.view)[:3, 3].astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(self.fovx * 0.5)),
            tan_fovy=jnp.float32(math.tan(self.fovy * 0.5)),
            width=self.width, height=self.height)


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def _send_json(self, data):
        payload = json.dumps(data).encode("utf-8")
        self.conn.sendall(struct.pack("I", len(payload)))
        self.conn.sendall(payload)

    def try_connect(self, render_items):
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            self._send_json(render_items)
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer disconnected")
            buf += chunk
        return buf

    def receive(self) -> ViewerCamera | None:
        length = int.from_bytes(self._read_exact(4), "little")
        msg = json.loads(self._read_exact(length).decode("utf-8"))
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None
        # client sends row-vector (transposed) matrices; flip columns 1,2
        # exactly as the reference (network_gui.py:85-89), then transpose to
        # the math convention.
        wvt = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        wvt[:, 1] = -wvt[:, 1]
        wvt[:, 2] = -wvt[:, 2]
        vpt = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        vpt[:, 1] = -vpt[:, 1]
        return ViewerCamera(
            width=width, height=height,
            fovx=msg["fov_x"], fovy=msg["fov_y"],
            znear=msg["z_near"], zfar=msg["z_far"],
            view=wvt.T, proj_full=vpt.T,
            do_training=bool(msg["train"]),
            keep_alive=bool(msg["keep_alive"]),
            scaling_modifier=msg["scaling_modifier"],
            render_mode=msg["render_mode"])

    def send(self, image: np.ndarray | None, source_path: str, metrics: dict):
        """image: [H,W,3] float in [0,1] or uint8; sent as raw RGB bytes."""
        if image is not None:
            img = np.asarray(image)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            self.conn.sendall(img.tobytes())
        self.conn.sendall(len(source_path).to_bytes(4, "little"))
        self.conn.sendall(source_path.encode("ascii"))
        self._send_json(metrics)

    def disconnect(self):
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None
