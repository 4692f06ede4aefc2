"""Triangle octree (sparse voxel pyramid) + Takikawa encoding tests.

Reference semantics: ``triangle_octree.cuh:46-382`` (build/traverse/
contains), ``takikawa_encoding.cuh:28-468`` (per-level trilinear blend of
dual-vertex features, zeros for unreached levels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.geometry.triangle_octree import (
    TriangleOctree,
    _chessboard_distance,
    tri_box_overlap,
)
from ngp_tpu.models.takikawa import TakikawaEncoding


def _cube_mesh(lo=0.3, hi=0.7):
    """12-triangle axis-aligned cube in [lo, hi]^3."""
    c = np.array(
        [[x, y, z] for z in (lo, hi) for y in (lo, hi) for x in (lo, hi)],
        np.float32,
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # z faces
        (0, 4, 5, 1), (2, 3, 7, 6),  # y faces
        (0, 2, 6, 4), (1, 5, 7, 3),  # x faces
    ]
    tris = []
    for a, b, cc, d in quads:
        tris.append([c[a], c[b], c[cc]])
        tris.append([c[a], c[cc], c[d]])
    return np.asarray(tris, np.float32)


def test_tri_box_overlap_basic():
    tri = np.array([[[0.1, 0.1, 0.5], [0.9, 0.1, 0.5], [0.5, 0.9, 0.5]]])
    # box containing part of the triangle
    assert tri_box_overlap(np.array([[0.5, 0.5, 0.5]]), 0.2, tri)[0]
    # box far away
    assert not tri_box_overlap(np.array([[0.5, 0.5, 0.0]]), 0.2, tri)[0]
    # box crossed by the triangle plane but outside its extent
    assert not tri_box_overlap(np.array([[2.0, 0.5, 0.5]]), 0.2, tri)[0]
    # tiny box pierced by the triangle interior (no vertex inside)
    assert tri_box_overlap(np.array([[0.5, 0.3, 0.5]]), 0.05, tri)[0]


def test_tri_box_overlap_vs_sampling():
    rng = np.random.default_rng(0)
    tri = rng.uniform(0.2, 0.8, (50, 3, 3))
    center = rng.uniform(0.2, 0.8, (50, 3))
    half = 0.15
    got = tri_box_overlap(center, half, tri)
    # dense barycentric sampling: point-in-box => overlap must be True
    u = rng.uniform(size=(200, 2))
    u = np.where(u.sum(-1, keepdims=True) > 1, 1 - u, u)
    pts = (
        tri[:, None, 0]
        + u[None, :, 0:1] * (tri[:, None, 1] - tri[:, None, 0])
        + u[None, :, 1:2] * (tri[:, None, 2] - tri[:, None, 0])
    )  # (50, 200, 3)
    inside = (np.abs(pts - center[:, None, :]) <= half).all(-1).any(-1)
    assert not (inside & ~got).any(), "SAT missed a sampled intersection"


def test_chessboard_distance_exact():
    rng = np.random.default_rng(1)
    occ = rng.uniform(size=(12, 12, 12)) < 0.03
    occ[5, 5, 5] = True  # ensure non-empty
    d = _chessboard_distance(occ)
    pts = np.argwhere(occ)
    zz, yy, xx = np.meshgrid(*[np.arange(12)] * 3, indexing="ij")
    q = np.stack([zz, yy, xx], -1).reshape(-1, 1, 3)
    brute = np.abs(q - pts[None]).max(-1).min(-1).reshape(12, 12, 12)
    np.testing.assert_array_equal(d, brute)


@pytest.fixture(scope="module")
def cube_octree():
    return TriangleOctree.build(_cube_mesh(), max_depth=5)


def test_octree_build_structure(cube_octree):
    oc = cube_octree
    assert oc.max_depth == 5
    assert len(oc.codes) == 5
    assert len(oc.codes[0]) == 1  # root
    # nesting: every occupied voxel's parent is occupied
    for d in range(1, 5):
        R = 1 << d
        c = oc.codes[d].astype(np.int64)
        x, y, z = c & (R - 1), (c >> d) & (R - 1), c >> (2 * d)
        pc = (x >> 1) + ((y >> 1) << (d - 1)) + ((z >> 1) << (2 * (d - 1)))
        assert np.isin(pc, oc.codes[d - 1]).all()
    # the cube surface spans ~0.4 of the domain: finest level is sparse
    assert 0 < len(oc.codes[4]) < (16**3) // 2
    # vertex ids are in range and each level has 8 per voxel
    for d in range(5):
        assert oc.verts[d].shape == (len(oc.codes[d]), 8)
    assert oc.n_vertices == max(v.max() for v in oc.verts) + 1


def test_octree_contains_surface(cube_octree):
    tris = _cube_mesh()
    rng = np.random.default_rng(2)
    u = rng.uniform(size=(500, 2))
    u = np.where(u.sum(-1, keepdims=True) > 1, 1 - u, u)
    ti = rng.integers(0, len(tris), 500)
    pts = (
        tris[ti, 0]
        + u[:, 0:1] * (tris[ti, 1] - tris[ti, 0])
        + u[:, 1:2] * (tris[ti, 2] - tris[ti, 0])
    )
    # nudge strictly inside the cells (points exactly on voxel faces may
    # legitimately land in the empty neighbor)
    pts = np.clip(pts, 1e-4, 1 - 1e-4)
    inward = (np.asarray([0.5, 0.5, 0.5]) - pts) * 1e-3
    got = np.asarray(cube_octree.contains(jnp.asarray(pts + inward)))
    assert got.mean() > 0.98
    far = jnp.asarray([[0.02, 0.02, 0.02], [0.98, 0.98, 0.98], [0.5, 0.5, 0.5]])
    assert not np.asarray(cube_octree.contains(far)).any()


def test_octree_skip_distance_safe(cube_octree):
    oc = cube_octree
    G = 1 << oc.dt_depth
    c = oc.codes[oc.dt_depth].astype(np.int64)
    occ_cells = np.stack(
        [c & (G - 1), (c >> oc.dt_depth) & (G - 1), c >> (2 * oc.dt_depth)], -1
    )
    rng = np.random.default_rng(3)
    q = rng.uniform(size=(256, 3)).astype(np.float32)
    skip = np.asarray(oc.skip_distance(jnp.asarray(q)))
    # true distance to the nearest occupied voxel (box) must be >= skip
    lo = occ_cells / G
    hi = (occ_cells + 1) / G
    d = np.maximum(lo[None] - q[:, None], np.maximum(q[:, None] - hi[None], 0.0))
    true = np.sqrt((np.maximum(d, 0) ** 2).sum(-1)).min(1)
    assert (skip <= true + 1e-5).all()


def test_takikawa_encoding_forward_and_zeros(cube_octree):
    enc = TakikawaEncoding(octree=cube_octree, starting_level=1,
                           n_features_per_level=2)
    assert enc.n_levels == 4
    assert enc.n_output_dims == 8
    params = enc.init(jax.random.PRNGKey(0))
    assert params["table"].shape == (cube_octree.n_vertices, 2)

    x = jnp.asarray([[0.31, 0.31, 0.31], [0.02, 0.02, 0.02]])
    out = enc(params, x)
    assert out.shape == (2, 8)
    # point far from the mesh: its depth-1 voxel ([0,0.5]^3) touches the
    # cube so level 0 may be nonzero, but every deeper level is empty
    # there and must output exact zeros (kernel_takikawa's unreached-level
    # zeroing, takikawa_encoding.cuh:152-161)
    np.testing.assert_allclose(np.asarray(out[1, 2:]), 0.0, atol=0)
    # point on the surface: finest level occupied => nonzero features
    assert np.abs(np.asarray(out[0])).max() > 0


def test_takikawa_matches_bruteforce(cube_octree):
    """Custom-VJP path == plain gather+blend, and matches a per-level
    numpy reimplementation of kernel_takikawa's trilinear blend."""
    enc = TakikawaEncoding(octree=cube_octree, starting_level=0,
                           n_features_per_level=2)
    key = jax.random.PRNGKey(1)
    params = {"table": jax.random.normal(key, (cube_octree.n_vertices, 2))}
    x = jnp.asarray(np.random.default_rng(5).uniform(0.25, 0.75, (64, 3)),
                    jnp.float32)
    fast = np.asarray(enc(params, x))
    slow = np.asarray(enc(params, x, differentiable_inputs=True))
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)

    table = np.asarray(params["table"])
    oc = cube_octree
    xn = np.asarray(x)
    for d in range(oc.max_depth):
        R = 1 << d
        cell = np.clip(np.floor(xn * R), 0, R - 1).astype(np.int64)
        frac = xn * R - cell
        code = cell[:, 0] + (cell[:, 1] << d) + (cell[:, 2] << (2 * d))
        j = np.searchsorted(oc.codes[d], code)
        jc = np.minimum(j, len(oc.codes[d]) - 1)
        found = oc.codes[d][jc] == code
        vid = oc.verts[d][jc]  # (N, 8)
        expect = np.zeros((len(xn), 2))
        for c in range(8):
            w = np.ones(len(xn))
            for dim in range(3):
                b = (c >> dim) & 1
                w *= frac[:, dim] if b else 1 - frac[:, dim]
            expect += w[:, None] * table[vid[:, c]]
        expect = np.where(found[:, None], expect, 0.0)
        np.testing.assert_allclose(
            fast[:, d * 2 : d * 2 + 2], expect, rtol=1e-4, atol=1e-5
        )


def test_takikawa_table_gradient(cube_octree):
    enc = TakikawaEncoding(octree=cube_octree, starting_level=0,
                           n_features_per_level=2)
    params = enc.init(jax.random.PRNGKey(2))
    x = jnp.asarray([[0.35, 0.4, 0.45], [0.6, 0.55, 0.65]])

    def loss(p):
        return jnp.sum(enc(p, x) ** 2)

    g_fast = jax.grad(loss)(params)["table"]
    g_ref = jax.grad(lambda p: jnp.sum(enc(p, x, differentiable_inputs=True) ** 2))(
        params
    )["table"]
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
    assert float(jnp.abs(g_fast).sum()) > 0


def test_takikawa_sum_mode(cube_octree):
    enc = TakikawaEncoding(octree=cube_octree, starting_level=0,
                           n_features_per_level=4, sum_instead_of_concat=True)
    assert enc.n_output_dims == 4
    params = enc.init(jax.random.PRNGKey(3))
    out = enc(params, jnp.asarray([[0.4, 0.4, 0.4]]))
    assert out.shape == (1, 4)


def test_sdf_engine_with_takikawa_and_octree():
    """End-to-end: the reference's configs/sdf/takikawa.json schema trains
    and renders through the SDF engine with octree acceleration."""
    from ngp_tpu.engines.sdf import SdfEngine
    from ngp_tpu.geometry.mesh import normalize_mesh

    cfg = {
        "encoding": {
            "otype": "Takikawa",
            "n_levels": 5,
            "starting_level": 2,
            "n_features_per_level": 2,
        },
        "network": {"otype": "FullyFusedMLP", "n_neurons": 32,
                     "n_hidden_layers": 2, "activation": "ReLU",
                     "output_activation": "None"},
        "loss": {"otype": "MAPE"},
        "optimizer": {"otype": "Adam", "learning_rate": 1e-3},
    }
    mesh = normalize_mesh(_cube_mesh(0.0, 1.0))
    eng = SdfEngine(cfg, mesh, batch_size=2048)
    assert eng.octree is not None and eng.octree.max_depth == 5
    state = eng.init_state()
    state, loss = eng.train(state, 8)
    assert np.isfinite(float(loss))
    iou = eng.calculate_iou(state, n_samples=4096)
    assert 0.0 <= iou <= 1.0
    rgb, hit = eng.render_image(state, eye=(0.5, 0.5, -0.6),
                                lookat=(0.5, 0.5, 0.5), resolution=(32, 32))
    assert np.isfinite(rgb).all()
