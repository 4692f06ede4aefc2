"""SDF mode tests: mesh IO + normalization, BVH queries vs analytic
ground truth, training-sample recipe, end-to-end fit + IoU + sphere-traced
render on a cube mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.geometry.mesh import Mesh, normalize_mesh, sample_surface
from ngp_tpu.geometry.triangle_bvh import (
    build_bvh,
    closest_point,
    ray_intersect,
    signed_distance_watertight,
)


def _cube_triangles(center, half):
    """12-triangle cube with outward CCW winding."""
    c = np.asarray(center, np.float32)
    h = float(half)
    v = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float32,
    ) * h + c
    faces = [
        (0, 2, 1), (0, 3, 2),  # z- (normal -z)
        (4, 5, 6), (4, 6, 7),  # z+
        (0, 1, 5), (0, 5, 4),  # y-
        (3, 6, 2), (3, 7, 6),  # y+
        (0, 4, 7), (0, 7, 3),  # x-
        (1, 2, 6), (1, 6, 5),  # x+
    ]
    return v[np.asarray(faces)]


def _cube_sdf(p, center, half):
    q = np.abs(p - center) - half
    outside = np.linalg.norm(np.maximum(q, 0), axis=-1)
    inside = np.minimum(q.max(axis=-1), 0)
    return outside + inside


@pytest.fixture(scope="module")
def cube_mesh():
    tris = _cube_triangles([0.5, 0.5, 0.5], 0.25)
    return Mesh(
        triangles=tris,
        mesh_scale=1.0,
        raw_aabb_min=np.zeros(3, np.float32),
        raw_aabb_max=np.ones(3, np.float32),
        aabb_min=np.full(3, 0.05, np.float32),
        aabb_max=np.full(3, 0.95, np.float32),
    )


def test_normalize_mesh():
    tris = _cube_triangles([10.0, -5.0, 3.0], 2.0)
    m = normalize_mesh(tris)
    v = m.triangles.reshape(-1, 3)
    assert v.min() >= 0.0 and v.max() <= 1.0
    # cube is centered
    np.testing.assert_allclose(v.mean(axis=0), [0.5, 0.5, 0.5], atol=1e-5)


def test_surface_sampling(cube_mesh):
    rng = np.random.default_rng(0)
    pts = sample_surface(cube_mesh, rng.uniform(size=(2000, 3)).astype(np.float32))
    d = np.abs(_cube_sdf(pts, 0.5, 0.25))
    assert d.max() < 1e-5
    # roughly uniform over the 6 faces
    on_top = np.abs(pts[:, 2] - 0.75) < 1e-5
    assert 0.1 < on_top.mean() < 0.25


def test_bvh_signed_distance_matches_analytic(cube_mesh):
    bvh = build_bvh(cube_mesh.triangles)
    rng = np.random.default_rng(1)
    p = rng.uniform(0.05, 0.95, size=(500, 3)).astype(np.float32)
    got = np.asarray(signed_distance_watertight(bvh, jnp.asarray(p)))
    want = _cube_sdf(p, 0.5, 0.25)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bvh_closest_point(cube_mesh):
    bvh = build_bvh(cube_mesh.triangles)
    p = jnp.asarray([[0.5, 0.5, 0.95], [0.1, 0.5, 0.5]])
    dist, cp, tri = closest_point(bvh, p)
    np.testing.assert_allclose(np.asarray(dist), [0.2, 0.15], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp[0]), [0.5, 0.5, 0.75], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp[1]), [0.25, 0.5, 0.5], atol=1e-5)


def test_bvh_ray_intersect(cube_mesh):
    bvh = build_bvh(cube_mesh.triangles)
    o = jnp.asarray([[0.5, 0.5, 0.0], [0.5, 0.5, 0.5], [0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, tri = ray_intersect(bvh, o, d)
    np.testing.assert_allclose(np.asarray(t[:2]), [0.25, 0.25], atol=1e-5)
    assert not bool(jnp.isfinite(t[2]))  # misses the cube


CONFIG = {
    "loss": {"otype": "MAPE"},
    "optimizer": {
        "otype": "Ema",
        "decay": 0.95,
        "nested": {"otype": "Adam", "learning_rate": 1e-3, "beta1": 0.9,
                   "beta2": 0.99, "epsilon": 1e-15, "l2_reg": 1e-6},
    },
    "encoding": {"otype": "HashGrid", "n_levels": 6, "n_features_per_level": 2,
                 "log2_hashmap_size": 14, "base_resolution": 8,
                 "per_level_scale": 1.6},
    "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 64,
                "n_hidden_layers": 2},
}


@pytest.fixture(scope="module")
def engine(cube_mesh):
    from ngp_tpu.engines.sdf import SdfEngine

    return SdfEngine(dict(CONFIG), cube_mesh, batch_size=1 << 13, seed=3)


def test_training_sample_recipe(engine):
    pos, dist = engine.generate_training_samples(jax.random.PRNGKey(0), 8192)
    pos, dist = np.asarray(pos), np.asarray(dist)
    assert pos.shape == (8192, 3)
    # first half: exact surface, distance 0
    assert np.all(dist[: 4096] == 0)
    np.testing.assert_allclose(
        np.abs(_cube_sdf(pos[:4096], 0.5, 0.25)), 0, atol=1e-5
    )
    # offset samples have small distances, uniform ones span the box
    assert np.abs(dist[4096 : 4096 + 3072]).mean() < 0.01
    gt = _cube_sdf(pos[4096:], 0.5, 0.25)
    np.testing.assert_allclose(dist[4096:], gt, atol=2e-4)


@pytest.mark.slow
def test_sdf_fit_cube(engine):
    state = engine.init_state()
    state, loss = engine.train(state, 200)
    iou = engine.calculate_iou(state, n_samples=1 << 14)
    assert iou > 0.9, iou

    img, hit = engine.render_image(
        state, eye=[0.5, 0.5, 1.6], lookat=[0.5, 0.5, 0.5], resolution=(64, 64)
    )
    frac = hit.mean()
    # cube covers the central part of the view
    assert 0.05 < frac < 0.6, frac
    assert hit[32, 32]
    assert not hit[2, 2]
    assert img[32, 32].sum() > 0.2

    # snapshot round trip
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "sdf.msgpack")
        engine.save_snapshot(p, state)
        s2 = engine.load_snapshot(p)
        iou2 = engine.calculate_iou(s2, n_samples=1 << 14)
        assert abs(iou2 - iou) < 0.02


def test_brdf_shading_properties():
    """evaluate_shading (testbed_sdf.cu:78-148): backfaces get ambient only;
    a lit front face exceeds ambient; energy scales with light color."""
    import jax.numpy as jnp

    from ngp_tpu.ops.shading import BRDFParams, evaluate_shading

    N = jnp.asarray([[0.0, 1.0, 0.0]] * 3)
    V = jnp.asarray([[0.0, 1.0, 0.0]] * 3)
    L = jnp.asarray([0.0, 1.0, 0.0])
    base = jnp.full((3, 3), 0.64)
    amb = jnp.full((3, 3), 0.1)
    sun = jnp.stack([jnp.zeros(3), jnp.full(3, 2.0), jnp.full(3, 4.0)])
    out = np.asarray(evaluate_shading(base, amb, sun, L, V, N, BRDFParams()))
    assert np.all(out[1] > out[0])  # light adds energy
    assert np.all(out[2] > out[1])  # monotone in light color
    # backface: flip normal -> ambient-only
    out_back = np.asarray(
        evaluate_shading(base, amb, sun, L, V, -N, BRDFParams())
    )
    np.testing.assert_allclose(out_back[1], out_back[0], atol=1e-6)


def test_soft_shadow_visibility_update():
    import jax.numpy as jnp

    from ngp_tpu.ops.shading import soft_shadow_visibility_update

    mv, pd, td = (jnp.ones(2), jnp.full(2, 1e20), jnp.asarray([0.5, 0.5]))
    # a tiny sphere radius near an occluder drops visibility sharply
    mv2, pd2, td2 = soft_shadow_visibility_update(
        mv, pd, td, jnp.asarray([1e-4, 0.2]), 8.0
    )
    assert float(mv2[0]) < 0.01  # grazing an occluder
    assert float(mv2[1]) > 0.5  # wide clearance
    np.testing.assert_allclose(np.asarray(td2), [0.5001, 0.7], rtol=1e-4)


def test_sdf_render_modes_and_shadows():
    """All shade_kernel_sdf modes render; with a blocker cube along the sun
    direction, the BRDF shade with shadow rays darkens occluded pixels vs
    the unshadowed shade (GT BVH, no training needed)."""
    from ngp_tpu.engines.sdf import SdfEngine
    from ngp_tpu.geometry.mesh import Mesh

    tris = np.concatenate([
        _cube_triangles([0.45, 0.35, 0.5], 0.2),
        # blocker offset along sun dir (1,1,1)/sqrt(3) from the main cube
        _cube_triangles([0.72, 0.72, 0.77], 0.08),
    ])
    mesh = Mesh(
        triangles=tris, mesh_scale=1.0,
        raw_aabb_min=np.zeros(3, np.float32),
        raw_aabb_max=np.ones(3, np.float32),
        aabb_min=np.full(3, 0.02, np.float32),
        aabb_max=np.full(3, 0.98, np.float32),
    )
    engine = SdfEngine(dict(CONFIG), mesh, batch_size=1 << 12, seed=3)
    state = engine.init_state()
    eye, lookat = (0.5, 1.3, -0.6), (0.5, 0.45, 0.5)
    imgs = {}
    for mode in ("shade", "ao", "normals", "positions", "cost"):
        rgb, hit = engine.render_image(
            state, eye, lookat, resolution=(48, 48), gt_bvh=True, mode=mode
        )
        assert np.isfinite(rgb).all(), mode
        assert hit.any(), mode
        imgs[mode] = (rgb, hit)

    rgb_sh, hit = engine.render_image(
        state, eye, lookat, resolution=(48, 48), gt_bvh=True, mode="shade",
        shadow=True,
    )
    rgb_nosh = imgs["shade"][0]
    lum_sh = rgb_sh.sum(-1)[hit]
    lum_no = rgb_nosh.sum(-1)[hit]
    assert np.all(lum_sh <= lum_no + 1e-4)
    assert (lum_sh < lum_no - 1e-3).any(), "shadows changed nothing"
    # normals mode encodes unit normals
    nrm = imgs["normals"][0][imgs["normals"][1]] * 2.0 - 1.0
    np.testing.assert_allclose(
        np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-2
    )


def test_winding_sign_robust_to_holes():
    """Winding-number sign (the PathEscape-counterpart mode): correct
    inside/outside on a watertight cube AND on the same cube with a face
    removed, where the closest-normal (watertight) test is unreliable
    near the hole."""
    import numpy as np
    import jax.numpy as jnp

    from ngp_tpu.geometry.triangle_bvh import (
        build_bvh,
        signed_distance_watertight,
        signed_distance_winding,
        winding_number,
    )

    lo, hi = 0.3, 0.7
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)])
    # 12 triangles, outward orientation
    faces = [
        (0, 1, 3), (0, 3, 2),  # x = lo
        (4, 6, 7), (4, 7, 5),  # x = hi
        (0, 4, 5), (0, 5, 1),  # y = lo
        (2, 3, 7), (2, 7, 6),  # y = hi
        (0, 2, 6), (0, 6, 4),  # z = lo
        (1, 5, 7), (1, 7, 3),  # z = hi
    ]
    tris = np.asarray([[v[a], v[b], v[c]] for a, b, c in faces], np.float32)
    pts = jnp.asarray([
        [0.5, 0.5, 0.5],    # center: inside
        [0.65, 0.65, 0.65], # near a corner: inside
        [0.9, 0.5, 0.5],    # outside
        [0.5, 0.1, 0.5],    # outside
    ])

    bvh = build_bvh(jnp.asarray(tris))
    sd_w = np.asarray(signed_distance_winding(bvh, pts))
    sd_ref = np.asarray(signed_distance_watertight(bvh, pts))
    assert (np.sign(sd_w) == [-1, -1, 1, 1]).all()
    # watertight + winding agree on the closed mesh (incl. magnitudes)
    np.testing.assert_allclose(sd_w, sd_ref, rtol=1e-5, atol=1e-6)

    # remove the z=hi face pair -> open box; winding still classifies the
    # interior as enclosed (w > 0.5) and the exterior as open
    tris_open = jnp.asarray(tris[:10])
    w = np.asarray(winding_number(tris_open, pts))
    assert w[0] > 0.5 and w[1] > 0.5 and w[2] < 0.5 and w[3] < 0.5
    bvh_open = build_bvh(tris_open)
    sd_open = np.asarray(signed_distance_winding(bvh_open, pts))
    assert (np.sign(sd_open) == [-1, -1, 1, 1]).all()


def test_sdf_engine_sign_mode_winding(cube_mesh):
    from ngp_tpu.engines.sdf import SdfEngine
    import numpy as np
    import jax

    eng = SdfEngine(dict(CONFIG), cube_mesh, batch_size=512,
                    sign_mode="winding")
    pos, dist = eng.generate_training_samples(jax.random.PRNGKey(0), 512)
    assert np.isfinite(np.asarray(dist)).all()
    # some interior (negative) and exterior (positive) samples exist
    d = np.asarray(dist)
    assert (d < 0).any() and (d > 0).any()

    import pytest

    with pytest.raises(ValueError):
        SdfEngine(dict(CONFIG), cube_mesh, batch_size=512,
                  sign_mode="bogus")
