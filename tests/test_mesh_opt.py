"""Differentiable mesh optimization (``marching_cubes.cu:710-774``,
``MeshState`` trainable verts)."""

import jax
import jax.numpy as jnp
import numpy as np

from ngp_tpu.ops.mesh_opt import (
    mesh_opt_gradient,
    optimize_mesh,
    vertex_ring_and_normals,
)


def _tetra():
    verts = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    faces = jnp.asarray(
        [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], jnp.int32
    )
    return verts, faces


def test_ring_and_normals():
    verts, faces = _tetra()
    ring, normals = vertex_ring_and_normals(verts, faces)
    # each tetra vertex's 1-ring is the other three, each seen twice
    expect0 = (verts[1] + verts[2] + verts[3]) / 3.0
    np.testing.assert_allclose(np.asarray(ring[0]), np.asarray(expect0),
                               atol=1e-6)
    # outward orientation: normal at vertex 0 points away from the centroid
    centroid = jnp.mean(verts, 0)
    assert float(jnp.dot(normals[0], verts[0] - centroid)) > 0


def test_gradient_terms():
    verts, faces = _tetra()
    d = jnp.asarray([3.0, 1.0, 3.0, 1.0])  # above/below thresh 2.0
    dg = jnp.asarray([[1.0, 0, 0]] * 4)
    g = mesh_opt_gradient(verts, faces, d, dg, thresh=2.0, k_smooth=0.0,
                          k_density=1.0, k_inflate=0.0)
    # pure density term: ±normalized gradient
    np.testing.assert_allclose(np.asarray(g[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[1]), [-1, 0, 0], atol=1e-6)


def test_optimize_mesh_converges_to_isosurface():
    """Vertices of a noisy sphere mesh move toward the σ(x)=thresh level
    set of an analytic density field."""
    rng = np.random.default_rng(0)
    # icosahedron-ish point set on a sphere of radius 0.3 + noise
    n = 42
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    verts = jnp.asarray(0.5 + pts * (0.3 + rng.uniform(-0.1, 0.1, (n, 1))),
                        jnp.float32)
    # fake faces: consecutive triples (topology only affects smoothing)
    faces = jnp.asarray(
        [[i, (i + 1) % n, (i + 2) % n] for i in range(n)], jnp.int32
    )

    def density_fn(v):
        # density high inside radius 0.3: thresh 2.5 crossed exactly there
        r = jnp.linalg.norm(v - 0.5, axis=-1)
        return 5.0 * jax.nn.sigmoid((0.3 - r) * 50.0)

    out = optimize_mesh(density_fn, verts, faces, thresh=2.5, n_steps=60,
                        learning_rate=2e-3, k_smooth=0.0, k_density=1.0,
                        k_inflate=0.0)
    r0 = np.abs(np.linalg.norm(np.asarray(verts) - 0.5, axis=1) - 0.3).mean()
    r1 = np.abs(np.linalg.norm(np.asarray(out) - 0.5, axis=1) - 0.3).mean()
    assert r1 < r0 * 0.5, (r0, r1)


def test_engine_hook():
    from __graft_entry__ import _default_config, _tiny_sphere_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    eng = NerfEngine(_default_config(), _tiny_sphere_dataset(n_views=4, res=32),
                     batch_size=1 << 11)
    state, grid = eng.init_state(), eng.init_grid()
    state, grid, _ = eng.train(state, grid, 4)
    verts, faces = _tetra()
    verts = verts * 0.2 + 0.4  # inside the unit AABB
    out = eng.optimize_mesh_vertices(state, verts, faces, n_steps=2)
    assert out.shape == verts.shape
    assert np.isfinite(np.asarray(out)).all()
