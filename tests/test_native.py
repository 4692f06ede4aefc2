"""Native C++ host-geometry library (native/ngp_host.cpp) vs the numpy
builders: same algorithms, bit-identical outputs. Skipped when the
library can't be built (no g++)."""

import numpy as np
import pytest

from ngp_tpu import native


def _mesh(n=400, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0.2, 0.8, size=(n, 1, 3))
    tri = c + rng.normal(scale=0.03, size=(n, 3, 3))
    return np.clip(tri, 0.0, 1.0).astype(np.float32)


pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native library unavailable")


def test_native_bvh_matches_numpy():
    from ngp_tpu.geometry.triangle_bvh import LEAF_SIZE, _build_bvh_numpy

    tris = _mesh()
    ref = _build_bvh_numpy(tris)
    nat = native.bvh_build(tris, LEAF_SIZE)
    assert nat is not None
    names = ["node_min", "node_max", "node_a", "node_b", "node_leaf",
             "triangles", "normals", "tri_index"]
    for name, n_arr in zip(names, nat):
        r_arr = np.asarray(getattr(ref, name))
        np.testing.assert_array_equal(
            np.asarray(n_arr), r_arr, err_msg=f"mismatch in {name}"
        )


def test_native_bvh_queries_work():
    """End-to-end: the shipped build_bvh (native-preferred) answers a
    closest-point query correctly."""
    import jax.numpy as jnp

    from ngp_tpu.geometry.triangle_bvh import build_bvh, closest_point

    tris = _mesh(n=64, seed=3)
    bvh = build_bvh(tris)
    q = jnp.asarray([[0.5, 0.5, 0.5], [0.1, 0.9, 0.2]])
    d, _, _ = closest_point(bvh, q)
    # brute force
    from ngp_tpu.geometry.triangle_bvh import closest_point_on_triangle

    p = np.asarray(q)[:, None, :]
    cp = np.asarray(
        closest_point_on_triangle(
            jnp.asarray(p), jnp.asarray(tris[None, :, 0]),
            jnp.asarray(tris[None, :, 1]), jnp.asarray(tris[None, :, 2])
        )
    )
    brute = np.sqrt(((p - cp) ** 2).sum(-1)).min(-1)
    np.testing.assert_allclose(np.asarray(d), brute, rtol=1e-4, atol=1e-5)


def test_native_octree_matches_numpy(monkeypatch):
    from ngp_tpu.geometry.triangle_octree import TriangleOctree

    tris = _mesh(n=150, seed=1).astype(np.float64)
    nat = TriangleOctree.build(tris, max_depth=5)

    monkeypatch.setenv("NGP_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    ref = TriangleOctree.build(tris, max_depth=5)
    monkeypatch.setattr(native, "_TRIED", False)

    assert nat.n_vertices == ref.n_vertices
    assert nat.dt_depth == ref.dt_depth
    for d in range(5):
        np.testing.assert_array_equal(nat.codes[d], ref.codes[d])
        np.testing.assert_array_equal(nat.verts[d], ref.verts[d])
    np.testing.assert_array_equal(nat.distance_field, ref.distance_field)


def test_native_chessboard_dt_exact():
    rng = np.random.default_rng(4)
    occ = rng.random((16, 16, 16)) < 0.02
    occ[0, 0, 0] = True  # ensure non-empty
    got = native.chessboard_dt(occ)
    # brute-force L-inf distance
    pts = np.argwhere(occ)
    zz, yy, xx = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    grid = np.stack([zz, yy, xx], -1).reshape(-1, 1, 3)
    want = np.abs(grid - pts[None]).max(-1).min(-1).reshape(16, 16, 16)
    np.testing.assert_array_equal(got, want)
