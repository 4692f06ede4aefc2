"""Fork extras: mesh / point-cloud seeded occupancy priors
(``Testbed::load_mesh_for_density_grid`` src/testbed_nerf.cu:3176-3300,
``build_density_grid_from_point_cloud`` :3302-3407) and the .xyz loader."""

import numpy as np

from ngp_tpu.ops import occupancy as occ


def test_seed_from_mesh_marks_triangle_cells():
    cfg = occ.OccupancyGridConfig(grid_size=32, n_cascades=1)
    # one triangle in the z=0.5 plane
    tri = np.asarray(
        [[[0.2, 0.2, 0.5], [0.8, 0.2, 0.5], [0.2, 0.8, 0.5]]], np.float32
    )
    d = occ.seed_grid_from_mesh(cfg, tri)
    assert d.shape == (1, 32, 32, 32)
    z = int(0.5 * 32)
    # cells on the triangle are trainable
    assert d[0, int(0.3 * 32), int(0.3 * 32), z] == 0.0
    assert d[0, int(0.25 * 32), int(0.25 * 32), z] == 0.0
    # far-away cell stays culled
    assert d[0, 2, 2, 30] == -1.0
    # everything off the z-slab is culled
    off = np.delete(d[0], [z - 1, z, z + 1], axis=2)
    assert (off == -1.0).all()


def test_seed_from_point_cloud_dilation_and_planes():
    cfg = occ.OccupancyGridConfig(grid_size=16, n_cascades=2)
    pts = np.asarray([[0.5, 0.5, 0.5]], np.float32)
    d = occ.seed_grid_from_point_cloud(cfg, pts, dilation=1)
    c = 8  # cell of 0.5 at G=16
    neigh = d[0, c - 1 : c + 2, c - 1 : c + 2, c - 1 : c + 2]
    assert (neigh == 0.0).all()
    assert d[0, c - 3, c, c] == -1.0
    # ground/sky planes only at the last cascade
    assert (d[1, :, :, 0] == 0.0).all() and (d[1, 0, :, :] == 0.0).all()
    assert (d[1, :, :, 15] == 0.0).all() and (d[1, 15, :, :] == 0.0).all()
    assert d[0, 1, 1, 0] == -1.0  # not on cascade 0


def test_xyz_loader(tmp_path):
    from ngp_tpu.geometry.mesh import load_xyz

    p = tmp_path / "pc.xyz"
    p.write_text("# comment\n1.0 2.0 3.0 255 0 0\n4 5 6\nbad line\n")
    pts = load_xyz(str(p))
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])


def test_engine_init_grid_with_prior():
    import sys

    sys.path.insert(0, "tests")
    from tests.test_nerf_engine import CONFIG, _make_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    ds = _make_dataset(4)
    eng = NerfEngine(
        dict(CONFIG), ds, batch_size=1 << 12, grid_size=32,
        n_steps_per_unit=128, seed=11,
    )
    # sphere-shell prior: trainable only near the sphere surface
    pts = []
    rng = np.random.default_rng(0)
    for _ in range(500):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        pts.append(0.5 + 0.2 * v)
    prior = occ.seed_grid_from_point_cloud(
        eng.grid_cfg, np.asarray(pts, np.float32), mark_ground_sky=False
    )
    grid = eng.init_grid(precomputed_density=prior)
    d = np.asarray(grid.density[0])
    # center of the sphere (far from the shell at G=32) is culled by the prior
    assert d[16, 16, 16] == -1.0
    assert (d >= 0).sum() > 0
    # training still runs and the guard never fires
    state = eng.init_state()
    state, grid, m = eng.train(state, grid, 12)
    assert np.isfinite(float(m["loss"]))
