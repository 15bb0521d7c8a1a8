"""SIBR remote-viewer protocol roundtrip: length-prefixed JSON in,
raw RGB frame + verify string out (network_gui.py wire format)."""

import json
import socket
import struct
import threading

import numpy as np

import gftorf_tpu.viewer as viewer


def test_viewer_roundtrip():
    srv = viewer.ViewerServer("127.0.0.1", 0)
    port = srv.listener.getsockname()[1]
    got = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = dict(
            resolution_x=8, resolution_y=6, train=True, keep_alive=True,
            scaling_modifier=1.25, shs_python=False, rot_scale_python=False,
            fov_y=0.8, fov_x=1.0, z_near=0.01, z_far=100.0,
            view_matrix=list(np.eye(4).flatten()),
            view_projection_matrix=list(np.eye(4).flatten()),
        )
        b = json.dumps(msg).encode()
        s.sendall(struct.pack("<I", len(b)) + b)
        need = 8 * 6 * 3
        buf = b""
        while len(buf) < need + 4:
            buf += s.recv(4096)
        got["frame"] = buf[:need]
        (vlen,) = struct.unpack("<I", buf[need:need + 4])
        while len(buf) < need + 4 + vlen:
            buf += s.recv(4096)
        got["verify"] = buf[need + 4:need + 4 + vlen].decode("ascii")
        s.close()

    t = threading.Thread(target=client)
    t.start()

    reqs = []

    def render(req):
        reqs.append(req)
        return np.full((req.height, req.width, 3), 0.5)

    import time

    deadline = time.time() + 5
    while srv.conn is None and time.time() < deadline:
        srv.poll()
        time.sleep(0.01)
    assert srv.serve_step(render, "/scene/path")
    t.join(timeout=5)

    assert got["verify"] == "/scene/path"
    assert got["frame"] == bytes([127]) * (8 * 6 * 3)
    req = reqs[0]
    assert (req.width, req.height) == (8, 6)
    assert req.scaling_modifier == 1.25
    # SIBR -> ours column sign flips on the view matrix (y, z)
    np.testing.assert_array_equal(
        req.world_view, np.diag([1.0, -1.0, -1.0, 1.0])
    )
