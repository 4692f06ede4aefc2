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


def test_viewer_nerf_extras(tmp_path):
    """Crop box, camera-path editor, and level-histogram endpoints (the
    GUI parity extras: src/testbed.cu:1409-1541, 1019-1147, 1932)."""
    import tests.test_nerf_engine as tn
    from ngp_tpu.testbed import Testbed
    from ngp_tpu.utils.viewer import make_server

    tb = Testbed(mode="nerf", config=dict(tn.CONFIG),
                 batch_size=1 << 10, grid_size=16, n_steps_per_unit=128)
    tb.engine = None  # built below from the in-memory dataset
    from ngp_tpu.engines.nerf import NerfEngine

    tb.engine = NerfEngine(dict(tn.CONFIG), tn._make_dataset(4),
                           batch_size=1 << 10, grid_size=16,
                           n_steps_per_unit=128)
    tb.state, tb.grid = tb.engine.init_state(), tb.engine.init_grid()
    srv = make_server(tb, port=0, n_train_steps=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address

        def post(path, payload):
            req = urllib.request.Request(
                f"http://{host}:{port}{path}",
                data=json.dumps(payload).encode(), method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read() or b"{}")

        # crop box reaches the engine
        post("/crop", {"min": [0.2, 0.2, 0.2], "max": [0.8, 0.8, 0.8]})
        state = json.loads(_get(srv, "/state")[0])
        np.testing.assert_allclose(state["crop"][0], [0.2, 0.2, 0.2])

        # path editor: two keyframes -> playback flag; export is valid JSON
        assert post("/path", {"op": "add"})["n_keyframes"] == 1
        srv.viewer_camera.yaw = 1.0
        assert post("/path", {"op": "add"})["n_keyframes"] == 2
        assert post("/path", {"op": "play"})["playing"] is True
        doc = json.loads(_get(srv, "/path.json")[0])
        assert len(doc["path"]) == 2 and "R" in doc["path"][0]
        # a playback frame renders
        jpg, ctype = _get(srv, "/frame.jpg?w=32&h=32&train=0")
        assert ctype == "image/jpeg"
        assert post("/path", {"op": "clear"})["n_keyframes"] == 0

        # histograms: one list per level
        h = json.loads(_get(srv, "/histograms")[0])
        assert len(h["levels"]) == dict(tn.CONFIG)["encoding"]["n_levels"]
    finally:
        srv.shutdown()
