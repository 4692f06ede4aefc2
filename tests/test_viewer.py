"""Web viewer (utils/viewer.py): serve a Testbed over HTTP, poll a frame,
move the camera — the GUI counterpart runs headless end-to-end."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import pathlib
    import tempfile

    import tests.test_testbed as tt
    from ngp_tpu.testbed import Testbed, default_config
    from ngp_tpu.utils.viewer import make_server

    p = tt._small_image(pathlib.Path(tempfile.mkdtemp()))
    cfg = default_config("image")
    cfg["encoding"].update({"n_levels": 4, "log2_hashmap_size": 10})
    tb = Testbed(scene=str(p), config=cfg, batch_size=1 << 10)
    srv = make_server(tb, port=0, n_train_steps=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _get(srv, path):
    host, port = srv.server_address
    with urllib.request.urlopen(f"http://{host}:{port}{path}", timeout=120) as r:
        return r.read(), r.headers.get("Content-Type")


def test_viewer_endpoints(server):
    page, ctype = _get(server, "/")
    assert ctype == "text/html" and b"canvas" in page

    jpg, ctype = _get(server, "/frame.jpg?w=64&h=64")
    assert ctype == "image/jpeg" and jpg[:2] == b"\xff\xd8"  # JPEG SOI

    state, _ = _get(server, "/state")
    s = json.loads(state)
    assert s["step"] >= 2  # the frame poll trained a chunk

    # camera update
    host, port = server.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/camera",
        data=json.dumps({"yaw": 1.25}).encode(), method="POST",
    )
    urllib.request.urlopen(req, timeout=30)
    assert abs(server.viewer_camera.yaw - 1.25) < 1e-6


def test_orbit_xform_sane():
    from ngp_tpu.utils.viewer import ViewerState

    v = ViewerState()
    m = v.xform()
    assert m.shape == (3, 4)
    # eye sits at radius from center; forward points at the center
    eye = m[:, 3]
    f = m[:, 2]
    c = np.asarray([0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.linalg.norm(eye - c), v.radius, rtol=1e-5)
    np.testing.assert_allclose(
        f, (c - eye) / np.linalg.norm(c - eye), atol=1e-5
    )
