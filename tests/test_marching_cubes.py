"""Marching-cubes tests: topology invariants on a sphere (watertight,
Euler characteristic 2, consistent outward winding), accuracy, OBJ/PLY
export round trip."""

import os

import numpy as np

from ngp_tpu.ops.marching_cubes import marching_cubes, save_obj, save_ply


def _sphere_field(n=40, r=0.35):
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / (n - 1) - 0.5
    return r - np.sqrt((g**2).sum(0))


def test_sphere_topology_and_accuracy():
    n = 40
    verts, faces = marching_cubes(_sphere_field(n), 0.0)
    assert len(verts) > 1000 and len(faces) > 2000
    r = np.linalg.norm(verts / (n - 1) - 0.5, axis=-1)
    np.testing.assert_allclose(r, 0.35, atol=2e-3)

    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2), "not watertight"
    assert len(verts) - len(uniq) + len(faces) == 2, "wrong Euler characteristic"

    de = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    _, c2 = np.unique(de, axis=0, return_counts=True)
    assert c2.max() == 1, "inconsistent orientation"

    # outward normals for an inside-positive field
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(b - a, c - a)
    outward = np.sum(nrm * (a - (n - 1) / 2), axis=1)
    assert (outward > 0).mean() > 0.99


def test_world_transform_and_export(tmp_path):
    verts, faces = marching_cubes(
        _sphere_field(24), 0.0, origin=[1.0, 2.0, 3.0], spacing=[0.1, 0.1, 0.1]
    )
    center = verts.mean(axis=0)
    np.testing.assert_allclose(center, [1.0 + 1.15, 2.0 + 1.15, 3.0 + 1.15], atol=0.02)

    p = tmp_path / "m.obj"
    save_obj(str(p), verts, faces)
    from ngp_tpu.geometry.mesh import load_obj

    tris = load_obj(str(p))
    assert tris.shape == (len(faces), 3, 3)
    save_ply(str(tmp_path / "m.ply"), verts, faces)
    assert (tmp_path / "m.ply").stat().st_size > 0


def test_sdf_engine_mesh_export():
    from test_sdf import CONFIG, _cube_triangles
    from ngp_tpu.engines.sdf import SdfEngine
    from ngp_tpu.geometry.mesh import Mesh

    mesh = Mesh(
        triangles=_cube_triangles([0.5, 0.5, 0.5], 0.25),
        mesh_scale=1.0,
        raw_aabb_min=np.zeros(3, np.float32),
        raw_aabb_max=np.ones(3, np.float32),
        aabb_min=np.full(3, 0.1, np.float32),
        aabb_max=np.full(3, 0.9, np.float32),
    )
    eng = SdfEngine(dict(CONFIG), mesh, batch_size=1 << 12, seed=3)
    state = eng.init_state()
    state, _ = eng.train(state, 60)
    verts, faces = eng.compute_marching_cubes_mesh(state, resolution=48)
    assert len(verts) > 100
    # the extracted surface hugs the cube: all vertices within the box + slack
    assert np.all(verts > 0.15) and np.all(verts < 0.85)
