"""Live network viewer: SIBR remote-viewer socket protocol.

Port of gaussian_renderer/network_gui.py: a length-prefixed JSON camera
message comes in, a raw RGB byte frame goes out. The reference
initializes this but keeps the training-loop hook commented out
(train.py:131-144); we expose the same init/try_connect/receive/send
surface plus a convenience `serve_step` the loop can call.
"""

from __future__ import annotations

import json
import socket
import struct
import traceback
from typing import Optional

import numpy as np

_listener: Optional[socket.socket] = None
conn: Optional[socket.socket] = None
addr = None

host = "127.0.0.1"
port = 6009


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009) -> None:
    global host, port, _listener
    host, port = wish_host, wish_port
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((host, port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    if _listener is None:
        return
    try:
        conn, addr = _listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read() -> dict:
    messageLength = conn.recv(4)
    messageLength = int.from_bytes(messageLength, "little")
    message = conn.recv(messageLength)
    return json.loads(message.decode("utf-8"))


def send(message_bytes: Optional[bytes], verify: str) -> None:
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Returns (custom_camera_dict_or_None, do_training,
    convert_SHs_python, compute_cov3D_python, keep_alive, scaling_modifier).
    """
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width != 0 and height != 0:
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            convert_SHs = bool(message["shs_python"])
            compute_cov = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_mod = message["scaling_modifier"]
            world_view = np.reshape(
                np.array(message["view_matrix"]), (4, 4)
            ).astype(np.float32)
            world_view[:, 1] = -world_view[:, 1]
            world_view[:, 2] = -world_view[:, 2]
            full_proj = np.reshape(
                np.array(message["view_projection_matrix"]), (4, 4)
            ).astype(np.float32)
            full_proj[:, 1] = -full_proj[:, 1]
            cam = dict(width=width, height=height, fovy=fovy, fovx=fovx,
                       znear=znear, zfar=zfar, world_view=world_view,
                       full_proj=full_proj)
        except Exception:
            traceback.print_exc()
            raise
        return cam, do_training, convert_SHs, compute_cov, keep_alive, scaling_mod
    return None, None, None, None, None, None


def serve_step(render_fn, source_path: str) -> bool:
    """Poll the viewer once; render and reply if a camera arrived.

    render_fn(cam_dict) -> (H, W, 3) float image in [0, 1].
    Returns True if training should continue.
    """
    global conn
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            net_image_bytes = None
            cam, do_training, _, _, keep_alive, _ = receive()
            if cam is not None:
                img = np.clip(render_fn(cam), 0.0, 1.0)
                net_image_bytes = memoryview(
                    (img * 255).astype(np.uint8).tobytes()
                )
            send(net_image_bytes, source_path)
            if do_training or not keep_alive:
                break
        except Exception:
            conn = None
    return True
