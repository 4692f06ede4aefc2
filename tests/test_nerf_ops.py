"""NeRF op tests: stepping space, cascades, occupancy grid maintenance,
the exponential-lattice parallel march vs a sequential reference march, and
gradient parity of the compositing loss vs the reference's closed-form
(suffix-trick) gradients (``src/testbed_nerf.cu:1660-2012``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops import occupancy as occ
from ngp_tpu.ops.composite import composite, nerf_training_loss
from ngp_tpu.ops.marching import SteppingSpace, march_rays, ray_aabb_range


# ---------------------------------------------------------------- stepping


@pytest.mark.parametrize("cone", [0.0, 1.0 / 256.0])
def test_stepping_space_roundtrip(cone):
    s = SteppingSpace.make(cone)
    t = jnp.asarray([1e-3, 0.01, 0.1, 0.433, 1.0, 3.0, 10.0, 100.0, 2000.0])
    n = s.to_steps(t)
    np.testing.assert_allclose(s.from_steps(n), t, rtol=5e-5)
    # dt = from(n+1) - from(n) is within [MIN, MAX] cone stepsize
    dt = s.from_steps(n + 1.0) - s.from_steps(n)
    assert float(jnp.min(dt)) >= occ.MIN_CONE_STEPSIZE * 0.999
    assert float(jnp.max(dt)) <= occ.MAX_CONE_STEPSIZE * 1.001


def test_stepping_space_cone_zero_is_linear():
    s = SteppingSpace.make(0.0)
    t = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(s.to_steps(t), t / occ.MIN_CONE_STEPSIZE, rtol=1e-6)


# ---------------------------------------------------------------- cascades


def test_mip_from_pos():
    pos = jnp.asarray(
        [
            [0.5, 0.5, 0.5],  # center -> mip 0
            [0.9, 0.5, 0.5],  # maxval 0.4 < 0.5 -> mip 0
            [1.0, 0.5, 0.5],  # maxval 0.5 -> mip 1
            [1.3, 0.5, 0.5],  # maxval 0.8 -> mip 1
            [2.0, 0.5, 0.5],  # maxval 1.5 -> mip 2
            [4.0, 0.5, 0.5],  # maxval 3.5 -> mip 3
        ]
    )
    mips = occ.mip_from_pos(pos, max_mip=7)
    np.testing.assert_array_equal(np.asarray(mips), [0, 0, 1, 1, 2, 3])
    # clamped by max_mip
    assert int(occ.mip_from_pos(jnp.asarray([[100.0, 0.5, 0.5]]), 3)[0]) == 3


def test_mip_from_dt_escalates_with_step():
    pos = jnp.asarray([[0.6, 0.5, 0.5]])
    small = occ.mip_from_dt(jnp.asarray([1e-4]), pos, 7, 128)
    big = occ.mip_from_dt(jnp.asarray([0.1]), pos, 7, 128)
    assert int(small[0]) == 0
    assert int(big[0]) > int(small[0])


def test_occupied_at_lookup():
    cfg = occ.OccupancyGridConfig(grid_size=16, n_cascades=2)
    G = cfg.grid_size
    bitfield = np.zeros((2, G, G, G), np.uint8)
    bitfield[0, 8, 8, 8] = 1  # cell covering [0.5, 0.5625)³ at mip 0
    bitfield[1, 2, 8, 8] = 1  # mip 1 covers [-0.5, 1.5]³
    bf = jnp.asarray(bitfield)
    pos = jnp.asarray(
        [
            [0.53, 0.53, 0.53],  # inside the occupied mip-0 cell
            [0.4, 0.53, 0.53],  # empty mip-0 cell
            [-0.22, 0.56, 0.56],  # mip-1 occupied cell x in [-0.25,-0.125)
        ]
    )
    mip = jnp.asarray([0, 0, 1])
    got = np.asarray(occ.occupied_at(bf, pos, mip))
    np.testing.assert_array_equal(got, [True, False, True])
    # out-of-range positions are unoccupied
    assert not bool(occ.occupied_at(bf, jnp.asarray([[3.0, 0.5, 0.5]]), jnp.asarray([0]))[0])


def test_bitfield_maxpool_propagates_to_coarser():
    cfg = occ.OccupancyGridConfig(grid_size=16, n_cascades=3)
    G = cfg.grid_size
    density = np.zeros((3, G, G, G), np.float32)
    density[0, 5, 6, 7] = 1.0  # occupied fine cell
    bits = np.asarray(occ.build_bitfield(jnp.asarray(density), jnp.asarray(1.0)))
    assert bits[0, 5, 6, 7] == 1
    # its image in cascade 1's central half: G/4 + cell//2
    q = G // 4
    assert bits[1, q + 2, q + 3, q + 3] == 1
    # and in cascade 2
    assert bits[2, q + (q + 2) // 2, q + (q + 3) // 2, q + (q + 3) // 2] == 1
    assert bits.sum() == 3


def test_ema_update_and_culled_cells():
    density = jnp.asarray([[-1.0, 0.5, 0.2]])
    splat = jnp.asarray([[5.0, 0.1, 0.9]])
    out = np.asarray(occ.ema_update_density(density, splat, 0.95))
    np.testing.assert_allclose(out, [[-1.0, 0.475, 0.9]], rtol=1e-6)


def test_update_grid_state_smoke():
    cfg = occ.OccupancyGridConfig(grid_size=8, n_cascades=2)
    state = occ.init_grid_state(cfg)
    idx = jnp.asarray([0, 5, 100])
    sigma = jnp.asarray([1000.0, 2000.0, 3000.0])
    new = occ.update_grid_state(cfg, state, idx, sigma)
    d = np.asarray(new.density).reshape(-1)
    assert d[0] > 0 and d[5] > 0 and d[100] > 0
    assert int(new.ema_step) == 1
    assert np.asarray(new.bitfield).reshape(-1)[0] == 1


def test_sample_update_cells_shapes_and_bias():
    cfg = occ.OccupancyGridConfig(grid_size=8, n_cascades=1)
    # ~10% of cells occupied: the 10-probe loop should concentrate the
    # nonuniform half far above the base rate (the reference keeps the last
    # probe on a full miss, so concentration is strong but not total).
    rng = np.random.default_rng(3)
    density_np = np.where(
        rng.uniform(size=(1, 8, 8, 8)) < 0.1, 5.0, 0.0
    ).astype(np.float32)
    density = jnp.asarray(density_np)
    idx, pos = occ.sample_update_cells(
        cfg, jax.random.PRNGKey(0), density, n_uniform=256, n_nonuniform=256
    )
    assert idx.shape == (512,) and pos.shape == (512, 3)
    occupied_flat = jnp.asarray(density_np.reshape(-1) > 0.01)
    frac_nonuniform = float(jnp.mean(occupied_flat[idx[256:]]))
    frac_uniform = float(jnp.mean(occupied_flat[idx[:256]]))
    assert frac_nonuniform > 0.6
    assert frac_uniform < 0.3


# ------------------------------------------------- sequential march oracle


def _mip_from_pos_np(pos, max_mip):
    maxval = np.max(np.abs(pos - 0.5))
    if maxval <= 0:
        return 0
    e = math.floor(math.log2(maxval)) + 1
    return int(np.clip(e + 1, 0, max_mip))


def _mip_from_dt_np(dt, pos, max_mip, G):
    mip = _mip_from_pos_np(pos, max_mip)
    dtx = dt * 2 * G
    if dtx < 1.0:
        return mip
    e = math.floor(math.log2(dtx)) + 1
    return int(np.clip(max(mip, e), 0, max_mip))


def _occupied_np(bitfield, pos, mip):
    G = bitfield.shape[1]
    p = (pos - 0.5) * (2.0 ** -mip) + 0.5
    cell = np.floor(p * G).astype(int)
    if np.any(cell < 0) or np.any(cell >= G):
        return False
    return bitfield[mip, cell[0], cell[1], cell[2]] > 0


def _sequential_march(o, d, bitfield, aabb_min, aabb_max, stepping, n0, max_mip, max_iter=8192):
    """Straight numpy port of the reference's training march
    (``generate_training_samples_nerf`` second pass +
    ``advance_to_next_voxel``)."""
    G = bitfield.shape[1]
    idir = 1.0 / d
    samples = []

    def to_s(t):
        return float(stepping.to_steps(jnp.asarray(t)))

    def from_s(n):
        return float(stepping.from_steps(jnp.asarray(n)))

    t = from_s(float(n0))
    for _ in range(max_iter):
        pos = o + t * d
        if np.any(pos < aabb_min) or np.any(pos > aabb_max):
            break
        dt = from_s(to_s(t) + 1.0) - t
        mip = _mip_from_dt_np(dt, pos, max_mip, G)
        if _occupied_np(bitfield, pos, mip):
            samples.append((t, dt))
            t = from_s(to_s(t) + 1.0)
        else:
            # find largest empty voxel surrounding us
            while mip < max_mip and not _occupied_np(bitfield, pos, mip + 1):
                mip += 1
            res = G * (2.0 ** -mip)
            p = res * (pos - 0.5)
            tv = (np.floor(p + 0.5 + 0.5 * np.sign(d)) - p) * idir
            dist = max(float(np.min(tv)) / res, 0.0)
            n_now = to_s(t)
            n_target = to_s(t + dist)
            t = from_s(n_now + math.ceil(max(n_target - n_now, 0.5)))
    return samples


@pytest.mark.parametrize(
    "cone,n_casc", [(0.0, 1), (1.0 / 256.0, 1), (0.0, 3)]
)
def test_lattice_march_matches_sequential(cone, n_casc):
    """The parallel exponential-lattice march must reproduce the reference's
    sequential DDA exactly (see marching.py docstring for why these
    configurations are exactly equivalent)."""
    rng = np.random.default_rng(0)
    G = 16
    aabb_scale = 2 ** (n_casc - 1)
    cfg = occ.OccupancyGridConfig(grid_size=G, n_cascades=n_casc)
    # random density -> bitfield via the real pipeline so the max-pool
    # invariant holds
    density = rng.uniform(0, 0.02, size=(n_casc, G, G, G)).astype(np.float32)
    bitfield = np.asarray(occ.build_bitfield(jnp.asarray(density), jnp.asarray(1.0)))

    stepping = SteppingSpace.make(cone)
    half = 0.5 * aabb_scale
    aabb_min = np.full(3, 0.5 - half, np.float32)
    aabb_max = np.full(3, 0.5 + half, np.float32)

    N = 16
    o = rng.uniform(0.5 - half, 0.5 + half, size=(N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    tmin, _ = ray_aabb_range(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb_min), jnp.asarray(aabb_max))
    jitter = rng.uniform(0, 1, size=(N,)).astype(np.float32)
    n0 = np.asarray(stepping.to_steps(tmin)) + jitter

    K = 64
    span = occ.SQRT3 * aabb_scale
    M = int(math.ceil(
        float(stepping.to_steps(jnp.asarray(span)) - stepping.to_steps(jnp.asarray(0.0)))
    )) + 2
    marched = march_rays(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(bitfield),
        jnp.asarray(aabb_min), jnp.asarray(aabb_max),
        stepping, jnp.asarray(n0), M, K, cfg.max_mip,
    )

    for i in range(N):
        ref = _sequential_march(
            o[i], d[i], bitfield, aabb_min, aabb_max, stepping, n0[i], cfg.max_mip
        )[:K]
        got_n = int(marched.n_samples[i])
        assert got_n == len(ref), f"ray {i}: {got_n} vs {len(ref)}"
        if ref:
            ref_t = np.asarray([t for t, _ in ref])
            ref_dt = np.asarray([dt for _, dt in ref])
            np.testing.assert_allclose(
                np.asarray(marched.t[i, : len(ref)]), ref_t, rtol=1e-4, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(marched.dt[i, : len(ref)]), ref_dt, rtol=1e-4, atol=1e-6
            )


# --------------------------------------------------------- composite + loss


def test_composite_against_loop():
    rng = np.random.default_rng(1)
    N, K = 4, 8
    rgb = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
    sigma = rng.uniform(0, 50, (N, K)).astype(np.float32)
    dt = np.full((N, K), 0.01, np.float32)
    t_mid = np.cumsum(dt, axis=1).astype(np.float32)
    valid = np.ones((N, K), bool)
    valid[2, 5:] = False

    out = composite(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(dt),
        jnp.asarray(t_mid), jnp.asarray(valid), min_transmittance=1e-4,
    )

    for i in range(N):
        T, acc, dep = 1.0, np.zeros(3), 0.0
        for j in range(K):
            if not valid[i, j] or T < 1e-4:
                continue
            alpha = 1.0 - math.exp(-sigma[i, j] * dt[i, j])
            acc += alpha * T * rgb[i, j]
            dep += alpha * T * t_mid[i, j]
            T *= 1.0 - alpha
        np.testing.assert_allclose(np.asarray(out.rgb[i]), acc, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.depth[i]), dep, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(out.transmittance[i]), T, rtol=1e-4, atol=1e-6)


def _reference_grads(raw, dt, t_mid, valid, complete, bg, target, n_rays):
    """Numpy port of the reference's hand-written gradient
    (``compute_loss_kernel_train_nerf`` second pass, L2 loss, Logistic rgb,
    Exponential density, no regularizers)."""
    N, K, _ = raw.shape
    grads = np.zeros_like(raw)
    for i in range(N):
        # forward pass
        T = 1.0
        rgb_ray = np.zeros(3)
        steps = 0
        for j in range(K):
            if not valid[i, j] or T < 1e-4:
                break
            c = 1.0 / (1.0 + np.exp(-raw[i, j, :3]))
            sg = math.exp(raw[i, j, 3])
            alpha = 1.0 - math.exp(-sg * dt[i, j])
            rgb_ray += alpha * T * c
            T *= 1.0 - alpha
            steps += 1
        full = steps == np.sum(valid[i])
        if complete[i] and full:
            rgb_ray = rgb_ray + T * bg[i]
        lg = 2.0 * (rgb_ray - target[i])  # d(sum_c (p-t)^2)/dp
        # backward pass with the suffix trick
        T2 = 1.0
        rgb_ray2 = np.zeros(3)
        for j in range(steps):
            c = 1.0 / (1.0 + np.exp(-raw[i, j, :3]))
            sg = math.exp(raw[i, j, 3])
            alpha = 1.0 - math.exp(-sg * dt[i, j])
            weight = alpha * T2
            rgb_ray2 += weight * c
            T2 *= 1.0 - alpha
            suffix = rgb_ray - rgb_ray2
            dl_drgb = weight * lg
            grads[i, j, :3] = dl_drgb * c * (1 - c) / n_rays
            density_deriv = math.exp(np.clip(raw[i, j, 3], -15, 15))
            dl_dmlp = density_deriv * dt[i, j] * np.dot(lg, T2 * c - suffix)
            grads[i, j, 3] = dl_dmlp / n_rays
    return grads


def test_training_loss_grads_match_reference_formula():
    rng = np.random.default_rng(2)
    N, K = 6, 10
    raw = rng.normal(0, 1, (N, K, 4)).astype(np.float32)
    raw[..., 3] += 1.0
    dt = rng.uniform(0.005, 0.02, (N, K)).astype(np.float32)
    t_mid = np.cumsum(dt, 1).astype(np.float32)
    valid = np.ones((N, K), bool)
    valid[1, 7:] = False
    valid[3, :] = False
    complete = np.asarray([True, True, False, True, True, False])
    bg = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    target = rng.uniform(0, 1, (N, 3)).astype(np.float32)

    from ngp_tpu.ops.losses import l2

    def loss_of(raw_j):
        loss, _ = nerf_training_loss(
            raw_j, jnp.asarray(dt), jnp.asarray(t_mid), jnp.asarray(valid),
            jnp.asarray(complete), jnp.asarray(bg), jnp.asarray(target),
            l2, "Logistic", "Exponential",
            mean_density=jnp.asarray(1.0),  # disables the density bootstrap reg
            near_distance=0.0,
        )
        return loss

    got = np.asarray(jax.grad(loss_of)(jnp.asarray(raw)))
    want = _reference_grads(raw, dt, t_mid, valid, complete, bg, target, N)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_march_more_slots_than_lattice():
    """K > M (tiny scenes / few lattice points): compaction must pad, not
    truncate — regression for the sorted-key compaction."""
    G = 8
    cfg = occ.OccupancyGridConfig(grid_size=G, n_cascades=1)
    density = np.full((1, G, G, G), 0.02, np.float32)
    bitfield = np.asarray(
        occ.build_bitfield(jnp.asarray(density), jnp.asarray(1.0))
    )
    stepping = SteppingSpace.make(0.0)
    o = jnp.asarray([[0.1, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    n0 = jnp.asarray([0.5])
    M, K = 66, 256  # fewer lattice points than sample slots
    m = march_rays(o, d, jnp.asarray(bitfield), jnp.zeros(3), jnp.ones(3),
                   stepping, n0, M, K, cfg.max_mip)
    assert m.t.shape == (1, K)
    n = int(m.n_samples[0])
    assert 0 < n <= M
    assert bool(jnp.all(m.valid[0, :n])) and not bool(jnp.any(m.valid[0, n:]))


def test_stride_cells_pow2_covers_all_cells_odd_cascades():
    """Stride-residue refresh with n_cascades=3 (aabb_scale=4): a pow2
    stride count divides the pow2 cell count; every cell of every cascade
    is hit exactly once across the period (ADVICE r4 regression — the old
    auto count 2*n_cascades=6 broke place_stride's dense reshape)."""
    cfg = occ.OccupancyGridConfig(grid_size=8, n_cascades=3)
    n_strides = 8
    seen = np.zeros((cfg.n_cascades, cfg.n_cells), bool)
    for phase in range(n_strides):
        vals = jnp.ones((cfg.n_cascades * cfg.n_cells // n_strides,))
        splat = occ.place_stride(cfg, vals, jnp.int32(phase), n_strides)
        assert splat.shape == (3, 8, 8, 8)
        seen |= np.asarray(splat).reshape(3, -1) > 0
        pos = occ.stride_cells(cfg, jax.random.PRNGKey(phase), jnp.int32(phase), n_strides)
        assert pos.shape == (cfg.n_cascades * cfg.n_cells // n_strides, 3)
    assert seen.all()


def test_stride_cells_rejects_non_dividing_count():
    cfg = occ.OccupancyGridConfig(grid_size=8, n_cascades=3)
    with np.testing.assert_raises(ValueError):
        occ.stride_cells(cfg, jax.random.PRNGKey(0), jnp.int32(0), 6)
    with np.testing.assert_raises(ValueError):
        occ.place_stride(cfg, jnp.ones((cfg.n_cells // 2,)), jnp.int32(0), 6)


def test_engine_grid_strides_rounded_to_pow2():
    """NerfEngine auto stride count must be a power of two for every
    accepted aabb_scale (ADVICE r4: 2*n_cascades=6 crashed training for
    aabb_scale 4/16/32/64)."""
    from ngp_tpu.engines.nerf import NerfEngine
    from tests.test_nerf_engine import CONFIG, _make_dataset

    ds = _make_dataset(n_views=4)
    ds.aabb_scale = 4
    eng = NerfEngine(
        dict(CONFIG), ds, batch_size=1 << 12, grid_size=16,
        n_steps_per_unit=64,
    )
    assert eng.grid_cfg.n_cascades == 3
    s = eng._grid_strides
    assert s & (s - 1) == 0 and eng.grid_cfg.n_cells % s == 0
    state = eng.init_state()
    grid = eng.init_grid()
    # one non-warmup stride update must run (the old count crashed here)
    g2 = eng.update_grid(state, grid, jax.random.PRNGKey(1), warmup=False)
    assert np.isfinite(float(g2.mean_density))


@pytest.mark.parametrize("cone,n_casc", [(0.0, 1), (1.0 / 128, 3)])
def test_hierarchical_march_matches_ungated(cone, n_casc):
    """Gated march (coarse-pooled dilated bitfield + segment budget) must
    equal the ungated march EXACTLY when the budget covers all passing
    segments — the gate is conservative by construction (see
    occ.build_coarse_gate). Also checks the k-major truncation direction
    under a tight budget."""
    rng = np.random.default_rng(5)
    G = 16
    aabb_scale = 2 ** (n_casc - 1)
    cfg = occ.OccupancyGridConfig(grid_size=G, n_cascades=n_casc)
    density = rng.uniform(0, 0.02, size=(n_casc, G, G, G)).astype(np.float32)
    bitfield = occ.build_bitfield(jnp.asarray(density), jnp.asarray(1.0))
    gate = occ.build_coarse_gate(bitfield, pool=8)
    assert gate.shape == (n_casc, 2, 2, 2)

    stepping = SteppingSpace.make(cone)
    half = 0.5 * aabb_scale
    aabb_min = np.full(3, 0.5 - half, np.float32)
    aabb_max = np.full(3, 0.5 + half, np.float32)
    N = 32
    o = rng.uniform(0.5 - half, 0.5 + half, size=(N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmin, _ = ray_aabb_range(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb_min),
        jnp.asarray(aabb_max),
    )
    n0 = np.asarray(stepping.to_steps(tmin)) + rng.uniform(0, 1, N).astype(
        np.float32
    )
    span = occ.SQRT3 * aabb_scale
    M = int(math.ceil(float(
        stepping.to_steps(jnp.asarray(span)) - stepping.to_steps(jnp.asarray(0.0))
    ))) + 2
    M = -(-M // 8) * 8
    K = 64
    args = (jnp.asarray(o), jnp.asarray(d), bitfield,
            jnp.asarray(aabb_min), jnp.asarray(aabb_max), stepping,
            jnp.asarray(n0), M, K, cfg.max_mip)
    ref = march_rays(*args)
    got = march_rays(*args, gate=gate, seg_budget=N * (M // 8) - 1)
    assert int(got.gate_total) > 0
    np.testing.assert_array_equal(
        np.asarray(got.n_samples), np.asarray(ref.n_samples)
    )
    np.testing.assert_array_equal(np.asarray(got.total), np.asarray(ref.total))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))

    # tight budget: strictly fewer-or-equal samples, and only DEEP
    # segments may be dropped (k-major): the first kept samples agree
    tight = march_rays(*args, gate=gate, seg_budget=8)
    tot_t = np.asarray(tight.total)
    assert (tot_t <= np.asarray(ref.total)).all()
