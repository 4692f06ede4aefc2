"""NeRF train + render engine — the TPU counterpart of
``src/testbed_nerf.cu`` (train_nerf / training_prep_nerf / render_nerf).

Design (TPU-first, not a port):

* **Static shapes.** A training batch is ``n_rays × n_samples`` sample
  slots; the reference's adaptive rays-per-batch + atomic compaction is
  replaced by the exponential-lattice parallel march (see
  ``ngp_tpu/ops/marching.py``) and masked compositing. Padded slots ride
  along in the batched MLP — the MXU prefers a fixed large batch over
  dynamic shapes.
* **One jitted function per phase**: ``train_step`` (sample rays → march →
  network → composite+loss → grads → optax), ``update_grid`` (density
  re-query → scatter-max → EMA → bitfield+mips), ``render_chunk``. No host
  syncs inside any of them.
* Reference semantics preserved: sRGB-space targets with random background
  compositing, Huber/L2 ray losses with 1/n_rays gradient scaling, density
  bootstrap/near-camera regularizers, EMA parameter averaging for
  inference, occupancy warmup schedule (all cells < step 256, then ¼+¼),
  prep cadence every ``clamp(step/16, 1, 16)`` steps
  (``testbed.cu:4321``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ngp_tpu.data.nerf_loader import NerfDataset
from ngp_tpu.geometry.aabb import AABB
from ngp_tpu.geometry.camera import (
    LENS_EQUIRECT,
    LENS_FTHETA,
    LENS_LATLONG,
    LENS_OPENCV,
    LENS_OPENCV_FISHEYE,
    LENS_PINHOLE,
    equirectangular_to_dir,
    f_theta_undistortion,
    grid_at_lerp,
    iterative_undistortion,
    latlong_to_dir,
    opencv_fisheye_lens_distortion_delta,
    opencv_lens_distortion_delta,
)
from ngp_tpu.models.factory import create_nerf_network
from ngp_tpu.ops import occupancy as occ
from ngp_tpu.ops.composite import (
    composite,
    density_activation,
    nerf_training_loss,
    rgb_activation,
)
from ngp_tpu.ops.losses import get_loss
from ngp_tpu.ops.marching import SteppingSpace, march_rays, ray_aabb_range, warp_direction
from ngp_tpu.optim import EmaState, ema_init, ema_update, make_optimizer
from ngp_tpu.train import TrainState, default_grid_label_fn


class RayBatch(NamedTuple):
    origins: jax.Array  # (N, 3)
    dirs: jax.Array  # (N, 3) normalized
    target_rgba: jax.Array  # (N, 4) sRGB + straight alpha in [0,1]
    n0: jax.Array  # (N,) jittered stepping-space march start
    img: jax.Array  # (N,) source image index
    uv: jax.Array  # (N, 2) pixel uv
    target_depth: jax.Array | None = None  # (N,) GT ray distance, 0 = none


ERROR_MAP_RES = 16  # testbed.h:674
MIN_PDF = 0.01


def _mat_to_quat(m: jax.Array) -> jax.Array:
    """Batched (N, 3, 3) rotation → (N, 4) quaternion (w, x, y, z) via the
    branch-free Shepperd construction: compute all four candidate forms and
    select the numerically largest pivot."""
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # candidate squared pivots (×4): w², x², y², z²
    qw2 = jnp.maximum(1.0 + t, 0.0)
    qx2 = jnp.maximum(1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2], 0.0)
    qy2 = jnp.maximum(1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2], 0.0)
    qz2 = jnp.maximum(1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2], 0.0)
    cands = jnp.stack([qw2, qx2, qy2, qz2], -1)
    pick = jnp.argmax(cands, axis=-1)
    s_w = 0.5 / jnp.sqrt(jnp.maximum(qw2, 1e-12))
    q_w = jnp.stack([
        0.25 / s_w,
        (m[..., 2, 1] - m[..., 1, 2]) * s_w,
        (m[..., 0, 2] - m[..., 2, 0]) * s_w,
        (m[..., 1, 0] - m[..., 0, 1]) * s_w,
    ], -1)
    s_x = 0.5 / jnp.sqrt(jnp.maximum(qx2, 1e-12))
    q_x = jnp.stack([
        (m[..., 2, 1] - m[..., 1, 2]) * s_x,
        0.25 / s_x,
        (m[..., 0, 1] + m[..., 1, 0]) * s_x,
        (m[..., 0, 2] + m[..., 2, 0]) * s_x,
    ], -1)
    s_y = 0.5 / jnp.sqrt(jnp.maximum(qy2, 1e-12))
    q_y = jnp.stack([
        (m[..., 0, 2] - m[..., 2, 0]) * s_y,
        (m[..., 0, 1] + m[..., 1, 0]) * s_y,
        0.25 / s_y,
        (m[..., 1, 2] + m[..., 2, 1]) * s_y,
    ], -1)
    s_z = 0.5 / jnp.sqrt(jnp.maximum(qz2, 1e-12))
    q_z = jnp.stack([
        (m[..., 1, 0] - m[..., 0, 1]) * s_z,
        (m[..., 0, 2] + m[..., 2, 0]) * s_z,
        (m[..., 1, 2] + m[..., 2, 1]) * s_z,
        0.25 / s_z,
    ], -1)
    q = jnp.take_along_axis(
        jnp.stack([q_w, q_x, q_y, q_z], -2), pick[..., None, None], axis=-2
    )[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def _quat_to_mat(q: jax.Array) -> jax.Array:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)


def _lerp_xforms(xf_a: jax.Array, xf_b: jax.Array, t: jax.Array) -> jax.Array:
    """Per-ray pose interpolation for rolling shutter: translation lerp +
    rotation slerp, matching ``get_xform_given_rolling_shutter``
    (``common_device.cuh:401-408``). ``xf_*`` (N, 3, 4), ``t`` (N,)."""
    pos = xf_a[:, :, 3] + (xf_b[:, :, 3] - xf_a[:, :, 3]) * t[:, None]
    qa = _mat_to_quat(xf_a[:, :, :3])
    qb = _mat_to_quat(xf_b[:, :, :3])
    # shortest-path slerp with nlerp fallback for tiny angles
    dot = jnp.sum(qa * qb, axis=-1, keepdims=True)
    qb = jnp.where(dot < 0, -qb, qb)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-4
    wa = jnp.where(small, 1.0 - t[:, None], jnp.sin((1.0 - t[:, None]) * theta) / jnp.where(small, 1.0, sin_t))
    wb = jnp.where(small, t[:, None], jnp.sin(t[:, None] * theta) / jnp.where(small, 1.0, sin_t))
    q = wa * qa + wb * qb
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([_quat_to_mat(q), pos[:, :, None]], axis=-1)


class ErrorMapState(NamedTuple):
    """Per-image training-error maps driving importance sampling
    (``Testbed::Nerf::Training::ErrorMap``): loss deposits accumulate into
    ``data``; the CDFs are rebuilt on a growing schedule
    (``testbed_nerf.cu:3704-3752``) and mixed with MIN_PDF uniform mass
    like ``construct_cdf_2d``/``construct_cdf_1d``."""

    data: jax.Array  # (I, R, R) accumulated loss
    cdf_x: jax.Array  # (I, R, R) conditional CDF over x given y
    cdf_y: jax.Array  # (I, R)
    cdf_img: jax.Array  # (I,)
    use_cdf: jax.Array  # () bool — False until first rebuild


def _build_cdfs(data: jax.Array):
    """(I, R, R) error map → normalized, MIN_PDF-mixed CDFs."""
    I, R, _ = data.shape
    row = jnp.cumsum(data + 1e-10, axis=2)  # (I, R, R)
    row_sum = row[:, :, -1]
    frac = (jnp.arange(R, dtype=jnp.float32) + 1.0) / R
    cdf_x = (1.0 - MIN_PDF) * row / row_sum[..., None] + MIN_PDF * frac
    col = jnp.cumsum(row_sum, axis=1)  # (I, R)
    col_sum = col[:, -1]
    cdf_y = (1.0 - MIN_PDF) * col / col_sum[:, None] + MIN_PDF * frac
    img = jnp.cumsum(col_sum)
    MIN_PMF = 0.1  # image-level mixing (testbed_nerf.cu:3741)
    ifrac = (jnp.arange(I, dtype=jnp.float32) + 1.0) / I
    cdf_img = (1.0 - MIN_PMF) * img / img[-1] + MIN_PMF * ifrac
    return cdf_x, cdf_y, cdf_img


def _sample_discrete(cdf_rows: jax.Array, u: jax.Array) -> jax.Array:
    """Per-row inverse-CDF bin pick: cdf_rows (N, B) ascending (last ≈ 1),
    u (N,) → bin index. B is tiny (16), so count-compare beats searches."""
    return jnp.clip(
        jnp.sum(u[:, None] >= cdf_rows, axis=1), 0, cdf_rows.shape[1] - 1
    ).astype(jnp.int32)


class DatasetArrays(NamedTuple):
    """Device-resident training data, passed as jit arguments (NOT closed
    over — closure would bake hundreds of MB of pixels into the executable
    as constants)."""

    images: jax.Array  # (I, H, W, 4) uint8 (or f16 HDR)
    xforms: jax.Array  # (I, 3, 4)
    focals: jax.Array  # (I, 2)
    pps: jax.Array  # (I, 2)
    depths: jax.Array | None = None  # (I, H, W) NGP-scale z-depth, 0 = none
    xforms_end: jax.Array | None = None  # (I, 3, 4) shutter-end pose
    rays: jax.Array | None = None  # (I, H, W, 6) supplied per-pixel rays


@dataclass
class NerfEngine:
    config: dict  # reference-format network config json
    dataset: NerfDataset
    batch_size: int = 1 << 18  # total sample slots per step (testbed.h:1005)
    min_samples_per_ray: int = 16
    max_samples_per_ray: int = 1024  # NERF_STEPS()
    min_rays_per_batch: int = 64
    adapt_every: int = 16  # K-bucket re-selection cadence (host sync point)
    n_render_samples: int = 192  # K for rendering
    grid_size: int = occ.NERF_GRIDSIZE
    n_steps_per_unit: int = occ.NERF_STEPS  # finest marching steps per unit
    density_grid_decay: float = 0.95  # testbed.h:741
    # Occupancy-update cadence. The reference updates every
    # clamp(step/16, 1, 16) steps with an all-cells sweep before step 256
    # (testbed.cu:4321, testbed_nerf.cu:4137) — the DEFAULT here since
    # round 3. Round 2 shipped a "decoupled" schedule (cheap decay-only
    # passes + sparse re-queries) that turned out to defeat pruning
    # entirely: with every cell decaying in lockstep, the bitfield
    # threshold min(0.01, mean_density) *chases* the decay and no cell
    # ever crosses it (measured on fox: occupancy fractions bit-frozen for
    # 320+ steps while mean_density fell 20x). The reference's all-cells
    # sweeps are what make the value distribution bimodal — empty cells
    # re-queried to sigma*dt ~ 0 collapse, occupied ones stay pinned — so
    # the mean sits far above the empty mass and pruning works. The sweep
    # costs ~100 ms on v5e (8.4M chunked density queries), paid every step
    # only for the first ~16 steps.
    reference_prep_cadence: bool = True
    # Visible-cell initial density: upstream instant-ngp starts visible
    # cells at 0 (occupancy earned from the first all-cells sweep,
    # mark_untrained_density_grid upstream); the yblin fork starts them at
    # 1.0, which costs ~90 decays before anything can prune. Default
    # upstream; set True for exact fork parity.
    fork_grid_init: bool = False
    # Regular (non-warmup) occupancy refresh strategy. True (default):
    # TPU-first stride-residue round-robin (occ.stride_cells — zero probe
    # gathers, dense splat; measured 927 ms -> ~70 ms per update on v5e).
    # False: the reference's probe sampling + segment-max splat
    # (occ.sample_update_cells), kept for A/B parity runs.
    grid_stride_update: bool = True
    # Round-robin period: each cell of each cascade is re-queried once per
    # this many updates (0 = auto: 2·n_cascades, keeping the per-update
    # query count at ~n_cells/2 like the reference's n_cells/4 × 2 kinds).
    grid_update_strides: int = 0
    # Round-2 decoupled schedule knobs (reference_prep_cadence=False).
    # Kept for A/B only — see above; NOT recommended.
    grid_update_interval: int = 16
    grid_decay_interval: int = 4
    grid_sample_divisor: int = 8  # reference uses n_cells/4 per kind
    warmup_all_cells_steps: int = 32
    # Sample compaction (the reference's atomicAdd compaction pass,
    # testbed_nerf.cu:1660-2012, rebuilt scatter-free): the network runs
    # only on a fixed budget of `frac·n_rays·K` compacted sample rows.
    # K targets 2× the mean samples/ray, so ~50% of slots are real; 0.625
    # leaves headroom. Overflow drops the *last* lattice steps across rays
    # (k-major order) — the analogue of the reference's step cap. 1.0
    # disables compaction.
    compaction_budget_frac: float = 0.625
    # Same idea in the render path (shade/depth/ao modes): the network
    # runs on a fixed budget of compacted sample rows; 1.0 disables.
    render_compaction_frac: float = 0.625
    # Staged renderer (shade/depth/ao): split the lattice into
    # len(render_stage_budgets) segments; stage s marches/shades only a
    # compacted subset of still-alive rays at a static budget of
    # ceil(N·budgets[s]) (pow2-rounded) — the wavefront counterpart
    # (testbed_nerf.cu:2504-2659). OFF by default: measured on fox, the
    # ray-liveness assumption fails for outward-looking cameras — the
    # ~half of rays that miss the subject never terminate by
    # transmittance and stay alive through the whole lattice, so any
    # budget < 1.0 truncates exactly the rays that still need content
    # (sky pixels render fine, but not-yet-terminated SUBJECT rays in the
    # truncated tail go to background) while the staging overhead (4
    # marches + sorts) costs ~15%. Profitable only for inward-looking
    # captures whose rays all hit a surface early; enable + tune budgets
    # per scene, watching last_render_overflow.
    render_staged: bool = False
    # Budgets must COVER the per-stage alive fraction: rays alive past a
    # stage's budget are truncated to background (counted in
    # last_render_overflow).
    render_stage_budgets: tuple = (1.0, 1.0, 0.5, 0.375)
    # Per-stage sample-compaction budget (occupied samples per segment are
    # ~4x sparser than over the whole lattice).
    render_staged_compaction_frac: float = 0.35
    seed: int = 1337
    snap_to_pixel_centers: bool = True
    train_with_random_bg: bool = True
    near_distance: float = 0.1  # testbed.h:740
    min_transmittance_train: float = 1e-4
    min_transmittance_render: float = 0.01  # testbed.h:791
    background_color: tuple = (0.0, 0.0, 0.0)  # testbed.h:936
    # Camera-parameter refinement (testbed.h:708-727). The reference
    # accumulates gradients for 16 steps and steps host-side Adam
    # optimizers; here the per-image pose/exposure/focal offsets live in a
    # "camera" parameter group updated by optax every step with the same
    # lr decay (x0.33 every 128 steps) and L2 pull toward zero.
    optimize_extrinsics: bool = False
    optimize_exposure: bool = False
    optimize_focal_length: bool = False
    # Trainable lens-distortion grid (``trainable_buffer.cuh:1-113``): a
    # (H, W, 2) uv-grid of camera-space dir offsets added after lens
    # undistortion (``uv_to_ray``'s ``dir.xy += distortion.at_lerp(uv)``,
    # common_device.cuh:492). Gradients arrive via autodiff through the
    # bilinear read — the same 4-corner deposit as
    # ``deposit_image_gradient`` (testbed_nerf.cu:2088-2099), minus the
    # reference's deposit-weight normalization, which Adam's second-moment
    # scaling makes redundant.
    optimize_distortion: bool = False
    distortion_resolution: tuple = (32, 32)  # (H, W), testbed.h:713
    # Depth supervision: λ·L1(GT ray distance, composited depth) per ray
    # with a depth record (src/testbed_nerf.cu:1848-1856; default off like
    # the reference's depth_supervision_lambda, testbed.h:745).
    depth_supervision_lambda: float = 0.0
    # Trainable latlong background (envmap.cuh + the envmap trainer,
    # src/testbed.cu:4101-4110). A dataset-provided envmap is used as a
    # *fixed* background unless train_envmap=True.
    train_envmap: bool = False
    envmap_resolution: tuple = (256, 512)  # (H, W) when no dataset envmap
    extrinsic_learning_rate: float = 1e-3
    extrinsic_l2_reg: float = 1e-4
    exposure_l2_reg: float = 0.0

    def __post_init__(self):
        ds = self.dataset
        aabb_scale = min(int(ds.aabb_scale), 1 << (occ.NERF_CASCADES - 1))
        if aabb_scale & (aabb_scale - 1):
            raise ValueError("aabb_scale must be a power of two")
        self.aabb_scale = aabb_scale
        max_cascade = 0
        while (1 << max_cascade) < aabb_scale:
            max_cascade += 1
        self.max_cascade = max_cascade
        self.grid_cfg = occ.OccupancyGridConfig(
            grid_size=self.grid_size,
            n_cascades=max_cascade + 1,
            decay=self.density_grid_decay,
        )
        # Fixed stepping in unit scenes, exponential otherwise
        # (load_nerf_post, testbed_nerf.cu:3107).
        self.cone_angle = 0.0 if aabb_scale <= 1 else 1.0 / 256.0
        # MIN/MAX cone stepsizes follow the reference formulas
        # (testbed_nerf.cu:70-81) parameterized on steps-per-unit.
        min_step = occ.SQRT3 / self.n_steps_per_unit
        max_step = (
            min_step
            * (1 << (occ.NERF_CASCADES - 1))
            * self.n_steps_per_unit
            / self.grid_size
        )
        self.stepping = SteppingSpace.make(self.cone_angle, min_step, max_step)
        self.aabb = AABB.from_scale(float(aabb_scale))
        # Render crop box (m_render_aabb; dataset "render_aabb" key or the
        # crop-box GUI gizmo). None = full scene AABB. Mutable at runtime —
        # it rides into the jitted render as an argument, not a constant.
        self.render_aabb = getattr(ds, "render_aabb", None)
        # Lattice length: worst case is a ray entering at t=0 and crossing
        # the full AABB diagonal.
        diag = occ.SQRT3 * aabb_scale
        span = self.stepping.to_steps_scalar(diag) - self.stepping.to_steps_scalar(0.0)
        # Rounded up to a multiple of 8 so the hierarchical march's 8-point
        # segment gate applies (the extra tail points fall past the AABB
        # and are culled by before_exit).
        self.n_lattice = min(-(-(int(math.ceil(span)) + 2) // 8) * 8, 2048)

        # Activations: HDR datasets train with exponential rgb (load_nerf_post).
        self.rgb_act = "Exponential" if ds.is_hdr else "Logistic"
        self.density_act = "Exponential"

        self._maybe_autocomplete_grid_config()
        self.network = create_nerf_network(
            self.config, n_extra_dims=ds.n_extra_learnable_dims
        )
        self.n_extra_dims = int(ds.n_extra_learnable_dims)
        self.optimize_extra_dims = self.n_extra_dims > 0
        self.loss_fn = get_loss(self.config.get("loss", {"otype": "Huber"}).get("otype", "Huber"))
        model_tx, self.ema_decay, self.lr_schedule = make_optimizer(
            self.config["optimizer"], grid_label_fn=None
        )

        # Two-group parameter tree: {"model": ..., "camera": ...}. The model
        # subtree routes to the tcnn-style stack (sparse-Adam on grid
        # tables), the camera subtree to its own decayed Adam or to a
        # freezer when refinement is off.
        def label_fn(params):
            def label(path, leaf):
                names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
                if names and names[0] == "camera":
                    return "camera" if self._camera_trainable else "frozen"
                if names and names[0] == "envmap":
                    return "envmap" if self.train_envmap else "frozen"
                return "grid" if "table" in names else "dense"

            return jax.tree_util.tree_map_with_path(label, params)

        self._camera_trainable = (
            self.optimize_extrinsics
            or self.optimize_exposure
            or self.optimize_focal_length
            or self.optimize_extra_dims
            or self.optimize_distortion
        )
        import optax as _optax

        from ngp_tpu.optim import _unwrap_ema, _unwrap_schedule, scale_by_adam_skip_zero

        # The reference accumulates camera gradients for 16 train steps and
        # then takes one Adam step at extrinsic_learning_rate, decaying
        # ×0.33 every 128 *camera* steps (= 2048 train steps). Our camera
        # Adam runs every train step, so divide the rate by 16 and stretch
        # the decay accordingly.
        cam_schedule = lambda step: jnp.maximum(
            (self.extrinsic_learning_rate / 16.0) * 0.33 ** (step // 2048),
            self.lr_schedule(step) / 1000.0,
        )
        dense = model_tx
        inner_cfg, _ = _unwrap_ema(self.config["optimizer"])
        inner_cfg, _ = _unwrap_schedule(inner_cfg)
        sparse = _optax.chain(
            scale_by_adam_skip_zero(
                b1=float(inner_cfg.get("beta1", 0.9)),
                b2=float(inner_cfg.get("beta2", 0.999)),
                eps=float(inner_cfg.get("epsilon", 1e-8)),
            ),
            _optax.scale_by_learning_rate(self.lr_schedule),
        )
        camera_tx = _optax.chain(
            _optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8),
            _optax.add_decayed_weights(self.extrinsic_l2_reg),
            _optax.scale_by_learning_rate(cam_schedule),
        )
        # Envmap trainer (src/testbed.cu:4101-4110): its own optimizer from
        # the config's "envmap" block when given, else the reference's
        # envmap defaults (Adam, lr 1e-2, RelativeL2 handled in-loss).
        env_cfg = self.config.get("envmap", {}).get("optimizer", {})
        env_inner, _ = _unwrap_ema(env_cfg) if env_cfg else ({}, None)
        env_inner, _ = _unwrap_schedule(env_inner) if env_inner else ({}, None)
        envmap_tx = _optax.chain(
            _optax.scale_by_adam(
                b1=float(env_inner.get("beta1", 0.9)),
                b2=float(env_inner.get("beta2", 0.99)),
                eps=float(env_inner.get("epsilon", 1e-8)),
            ),
            _optax.scale_by_learning_rate(
                lambda step: float(env_inner.get("learning_rate", 1e-2))
            ),
        )
        self.tx = _optax.multi_transform(
            {
                "dense": dense,
                "grid": sparse,
                "camera": camera_tx,
                "envmap": envmap_tx,
                "frozen": _optax.set_to_zero(),
            },
            label_fn,
        )

        # Envmap background shape (dataset envmap wins; train-from-scratch
        # uses envmap_resolution).
        ds_env = getattr(ds, "envmap", None)
        if ds_env is not None:
            self._envmap_shape = tuple(ds_env.shape)
        elif self.train_envmap:
            self._envmap_shape = (*self.envmap_resolution, 4)
        else:
            self._envmap_shape = None

        # Device-side dataset buffers. The shutter-end xforms are kept only
        # when they differ (rolling shutter / motion blur,
        # ``get_xform_given_rolling_shutter`` in ``common_device.cuh:401``).
        self.rolling_shutter = tuple(getattr(ds, "rolling_shutter", (0.0,) * 4))
        has_rs = ds.xforms.shape[1] > 1 and (
            any(abs(v) > 0 for v in self.rolling_shutter)
            or bool(np.any(ds.xforms[:, 1] != ds.xforms[:, 0]))
        )
        self.data = DatasetArrays(
            images=jnp.asarray(ds.images),  # (I, H, W, 4) uint8 or f16
            xforms=jnp.asarray(ds.xforms[:, 0]),  # (I, 3, 4) start xform
            focals=jnp.asarray(ds.focal_lengths),
            pps=jnp.asarray(ds.principal_points),
            depths=(
                jnp.asarray(ds.depths)
                if getattr(ds, "depths", None) is not None
                and self.depth_supervision_lambda > 0.0
                else None
            ),
            xforms_end=jnp.asarray(ds.xforms[:, 1]) if has_rs else None,
            rays=(
                jnp.asarray(ds.rays)
                if getattr(ds, "rays", None) is not None
                else None
            ),
        )
        if self.data.rays is not None:
            # Supplied rays: no meaningful camera origin for the near-cam
            # penalty (testbed_nerf.cu:3053-3055 sets near_distance = 0)
            self.near_distance = 0.0
        self.lens = ds.lens
        self.resolution = ds.resolution  # (W, H)

        # Adaptive batch geometry: n_rays × K = batch_size with K a power of
        # two. This is the static-shape counterpart of the reference's
        # adaptive rays_per_batch (NerfCounters::update_after_training,
        # testbed_nerf.cu:3583-3609): early training (grid all-occupied)
        # runs few rays with long sample chains, converged training runs
        # many rays with short chains. Each bucket is one compiled program.
        self._k_max = self._pow2_clamp(
            self.max_samples_per_ray, self.min_samples_per_ray,
            self.batch_size // self.min_rays_per_batch,
        )
        self._k = self._pow2_clamp(
            self.n_lattice, self.min_samples_per_ray, self._k_max
        )
        self._n_rays = max(self.batch_size // self._k, self.min_rays_per_batch)

        self._jit_cache: dict[Any, Any] = {}
        # Round the stride count UP to a power of two: any pow2 divides the
        # pow2 G³ cell count, whereas e.g. 2·n_cascades = 6 (aabb_scale 4)
        # leaves n_cells % n_strides != 0 and place_stride's dense reshape
        # would fail (ADVICE r4). stride_cells/place_stride also assert.
        want_strides = self.grid_update_strides or max(
            4, 2 * self.grid_cfg.n_cascades
        )
        self._grid_strides = 1 << (want_strides - 1).bit_length()
        # Hierarchical march (ops/marching.py gate mode): coarse-gate
        # segment stats ride every step; the fine-gather budget starts
        # disabled (None = full) and adapts from measured gate totals.
        self._march_gate_eligible = (
            self.grid_size % 8 == 0 and self.grid_size >= 16
            and self.n_lattice % 8 == 0
        )
        self._seg_budget: int | None = None
        self.use_importance_sampling = bool(ds.wants_importance_sampling)
        self._emap: ErrorMapState | None = None
        self._emap_interval = 128  # n_steps_between_error_map_updates
        self._emap_next_rebuild = 128

    @property
    def samples_per_step(self) -> int:
        """Network-processed sample rows per training step — the quantity
        the reference calls its batch size (its counters adapt rays so the
        *compacted* sample count ≈ 2^18, ``testbed_nerf.cu:3583-3609``).
        With compaction this is the compact budget; without, every slot."""
        if self.compaction_budget_frac < 1.0:
            b = -(-int(self.batch_size * self.compaction_budget_frac) // 1024) * 1024
            if 0 < b < self.batch_size:
                return b
        return self.batch_size

    @staticmethod
    def _pow2_clamp(x: float, lo: int, hi: int) -> int:
        # Power-of-two buckets (each bucket is a separately compiled
        # program; the persistent compile cache makes revisits free).
        # Round 2 used power-of-FOUR to save compiles, but the coarseness
        # costs up to 2.5x wasted sample slots right where it matters
        # most — e.g. fox settles at mean samples/ray ~200, whose 2x
        # target (410) rounded up to a 1024 bucket.
        b = max(int(math.ceil(max(x, 1)) - 1).bit_length(), 0)
        return int(min(max(1 << b, lo), hi))

    # -- config autocompletion (reset_network, testbed.cu:3961-4005)

    def _maybe_autocomplete_grid_config(self):
        enc = self.config.get("encoding", {})
        if "grid" not in enc.get("otype", "").lower():
            return
        if not enc.get("base_resolution"):
            enc["base_resolution"] = 1 << (enc.get("log2_hashmap_size", 15) // 3)
        if not enc.get("per_level_scale"):
            # Upstream auto-derivation: finest level ≈ 2048·aabb_scale.
            # (The yblin fork hard-codes 2.0 here — we keep the upstream
            # formula, which is what the published fox results use.)
            n_levels = enc.get("n_levels", 16)
            if n_levels > 1:
                enc["per_level_scale"] = math.exp(
                    math.log(2048.0 * self.aabb_scale / enc["base_resolution"])
                    / (n_levels - 1)
                )
            else:
                enc["per_level_scale"] = 2.0
        self.config["encoding"] = enc

    # -- initialization

    def init_state(self) -> TrainState:
        I = self.data.images.shape[0]
        params = {
            "model": self.network.init(jax.random.PRNGKey(self.seed)),
            "camera": {
                "pos": jnp.zeros((I, 3)),
                "rot": jnp.zeros((I, 3)),  # rotation vectors
                "exposure": jnp.zeros((I, 3)),
                "focal": jnp.zeros((2,)),  # log-scale focal multiplier
                "latents": 0.1
                * jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(self.seed), 1),
                    (I, max(self.n_extra_dims, 1)),
                ),
                # zero-initialized like the reference's TrainableBuffer
                # (reset_network, testbed.cu:4101-4127 distortion block)
                "distortion": jnp.zeros((*self.distortion_resolution, 2)),
            },
        }
        if self._envmap_shape is not None:
            # Linear-HDR latlong background (envmap.cuh): seeded from the
            # dataset's envmap image when present, else near-black like the
            # reference's trainer init.
            ds_env = getattr(self.dataset, "envmap", None)
            if ds_env is not None:
                img = jnp.asarray(np.asarray(ds_env, np.float32))
            else:
                img = jnp.full(self._envmap_shape, 1e-4, jnp.float32)
            params["envmap"] = {"image": img}
        return TrainState(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema=ema_init(params),
        )

    def init_grid(self, precomputed_density=None) -> occ.OccupancyGridState:
        """Zeroed grid, then camera-frustum culling: visible cells start
        occupied (density 1), unseen cells are -1 forever
        (``mark_untrained_density_grid`` at step 0).

        ``precomputed_density`` is an optional (C, G, G, G) prior from
        ``occ.seed_grid_from_mesh`` / ``seed_grid_from_point_cloud`` (the
        fork's geometry-seeded grids, ``src/testbed_nerf.cu:3440-3457``):
        its -1 cells stay culled forever, its 0 cells train normally."""
        state = occ.init_grid_state(self.grid_cfg)
        vis0 = 1.0 if self.fork_grid_init else 0.0
        if self.data.rays is not None:
            # Camera-frustum culling is only meaningful when the cameras
            # are (testbed_nerf.cu:3448-3452): supplied-ray datasets keep
            # every cell trainable.
            density = jnp.full_like(state.density, vis0)
        else:
            density = occ.mark_untrained_cells(
                self.grid_cfg,
                state.density,
                self.data.xforms,
                self.data.focals,
                self.data.pps,
                self.resolution,
                visible_init=vis0,
            )
        if precomputed_density is not None:
            pre = jnp.asarray(precomputed_density, jnp.float32)
            if pre.shape != density.shape:
                raise ValueError(
                    f"precomputed density shape {pre.shape} != "
                    f"{density.shape}"
                )
            # intersect the priors: culled by either geometry or frustum
            density = jnp.where(pre < 0.0, -1.0, density)
        mean = jnp.mean(jnp.maximum(density[0], 0.0))
        bitfield = occ.build_bitfield(density, mean)
        return occ.OccupancyGridState(density, bitfield, mean, state.ema_step)

    # -- ray generation

    def _pixel_dirs_cam(self, uv: jax.Array, focal: jax.Array, pp: jax.Array):
        """Camera-space directions for uv∈[0,1]² with per-ray intrinsics —
        ALL lens dialects of the reference's ``uv_to_ray``
        (``common_device.cuh:443-510``): pinhole/OpenCV/fisheye give
        unnormalized z=1 dirs; F-theta/LatLong/Equirectangular give unit
        dirs (so the depth-supervision |dir| factor is 1, like the
        reference's already-unit lens dirs)."""
        params = jnp.asarray(self.lens.params, jnp.float32)
        if self.lens.mode == LENS_FTHETA:
            return f_theta_undistortion(uv - pp, params)
        if self.lens.mode == LENS_LATLONG:
            return latlong_to_dir(uv)
        if self.lens.mode == LENS_EQUIRECT:
            return equirectangular_to_dir(uv)
        W, H = self.resolution
        x = (uv[:, 0] - pp[:, 0]) * W / focal[:, 0]
        y = (uv[:, 1] - pp[:, 1]) * H / focal[:, 1]
        if self.lens.mode == LENS_OPENCV:
            x, y = iterative_undistortion(opencv_lens_distortion_delta, params, x, y)
        elif self.lens.mode == LENS_OPENCV_FISHEYE:
            x, y = iterative_undistortion(
                opencv_fisheye_lens_distortion_delta, params, x, y
            )
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def init_error_map(self) -> ErrorMapState:
        I = self.data.images.shape[0]
        R = ERROR_MAP_RES
        data = jnp.zeros((I, R, R), jnp.float32)
        cdf_x, cdf_y, cdf_img = _build_cdfs(data)
        return ErrorMapState(data, cdf_x, cdf_y, cdf_img, jnp.asarray(False))

    def _sample_ray_batch(
        self, key: jax.Array, data: DatasetArrays, n: int,
        emap: ErrorMapState | None = None,
    ) -> RayBatch:
        """Pick (image, pixel) pairs and build world rays + targets —
        ``generate_training_samples_nerf``'s ray setup
        (``testbed_nerf.cu:1417-1490``). With a valid error map, images and
        pixels are drawn from the loss CDFs (``image_idx`` /
        ``nerf_random_image_pos_training``) — gradients stay importance-
        weighted on purpose, like the reference."""
        W, H = self.resolution
        kimg, kuv, kjit = jax.random.split(key, 3)
        img_uniform = jax.random.randint(kimg, (n,), 0, data.images.shape[0])
        uv_uniform = jax.random.uniform(kuv, (n, 2))
        if emap is not None:
            R = ERROR_MAP_RES
            u3 = jax.random.uniform(jax.random.fold_in(key, 3), (n, 3))
            img_cdf = _sample_discrete(
                jnp.broadcast_to(emap.cdf_img[None, :], (n, emap.cdf_img.shape[0])),
                u3[:, 0],
            )
            by = _sample_discrete(emap.cdf_y[img_cdf], u3[:, 1])
            bx = _sample_discrete(
                emap.cdf_x[img_cdf, by], u3[:, 2]
            )
            jit2 = jax.random.uniform(jax.random.fold_in(key, 4), (n, 2))
            uv_cdf = (jnp.stack([bx, by], -1).astype(jnp.float32) + jit2) / R
            img = jnp.where(emap.use_cdf, img_cdf, img_uniform)
            uv = jnp.where(emap.use_cdf, uv_cdf, uv_uniform)
        else:
            img = img_uniform
            uv = uv_uniform
        px = jnp.clip(
            jnp.floor(uv * jnp.asarray([W, H], jnp.float32)).astype(jnp.int32),
            0,
            jnp.asarray([W - 1, H - 1]),
        )
        if self.snap_to_pixel_centers:
            uv = (px.astype(jnp.float32) + 0.5) / jnp.asarray([W, H], jnp.float32)

        rgba = data.images[img, px[:, 1], px[:, 0]].astype(jnp.float32)
        if data.images.dtype == jnp.uint8:
            rgba = rgba / 255.0

        if data.rays is not None:
            # Explicitly supplied per-pixel rays override the camera model
            # (generate_training_samples_nerf, testbed_nerf.cu:1454-1458).
            r = data.rays[img, px[:, 1], px[:, 0]]
            o = r[:, :3]
            d = r[:, 3:]
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            target_depth = None
            if data.depths is not None:
                z = data.depths[img, px[:, 1], px[:, 0]]
                target_depth = z * jnp.linalg.norm(r[:, 3:], axis=-1)
            tmin, _ = ray_aabb_range(o, d, self.aabb.min, self.aabb.max)
            n0 = self.stepping.to_steps(tmin) + jax.random.uniform(kjit, (n,))
            return RayBatch(o, d, rgba, n0, img, uv, target_depth)

        focal = data.focals[img]
        pp = data.pps[img]
        xf = data.xforms[img]  # (n, 3, 4)
        if data.xforms_end is not None:
            # Rolling shutter / motion blur: per-ray shutter time from the
            # dataset vec4 + a random motion-blur draw, then lerp/slerp
            # between the start and end poses
            # (get_xform_given_rolling_shutter, common_device.cuh:401-408).
            rs = jnp.asarray(self.rolling_shutter, jnp.float32)
            tblur = jax.random.uniform(jax.random.fold_in(key, 9), (n,))
            pixel_t = rs[0] + rs[1] * uv[:, 0] + rs[2] * uv[:, 1] + rs[3] * tblur
            xf = _lerp_xforms(xf, data.xforms_end[img], pixel_t)
        dir_cam = self._pixel_dirs_cam(uv, focal, pp)
        d = jnp.einsum("nij,nj->ni", xf[:, :, :3], dir_cam)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = xf[:, :, 3]

        target_depth = None
        if data.depths is not None:
            # GT z-depth at the pixel, converted to distance along the
            # normalized ray by the unnormalized camera-dir length
            # (testbed_nerf.cu:1848-1851: |ray.d| · read_depth(uv)).
            z = data.depths[img, px[:, 1], px[:, 0]]
            target_depth = z * jnp.linalg.norm(dir_cam, axis=-1)

        tmin, _ = ray_aabb_range(o, d, self.aabb.min, self.aabb.max)
        n0 = self.stepping.to_steps(tmin) + jax.random.uniform(kjit, (n,))
        return RayBatch(o, d, rgba, n0, img, uv, target_depth)

    # -- training

    def _network_on_samples(self, params, origins, dirs, marched, extra=None,
                            plan=None):
        """Evaluate the NeRF network at the (ray, sample) slots; returns raw
        (N, K, 4). ``params`` is the model subtree; ``extra`` optional
        per-ray latent codes (N, E).

        With a ``plan`` (``ngp_tpu.ops.compaction``), inputs are laid out
        k-major (K, N), compacted to the plan's fixed budget of real
        samples, run through the network, and expanded back — the
        scatter-free counterpart of the reference's compaction pass
        (``testbed_nerf.cu:1660-2012``); non-kept slots return raw 0 and
        must be masked out of the composite by the caller."""
        from ngp_tpu.ops.compaction import compact_rows, expand_rows

        N, K = marched.t.shape
        diff_inputs = (
            self.optimize_extrinsics
            or self.optimize_focal_length
            or self.optimize_distortion
        )
        pos = origins[:, None, :] + dirs[:, None, :] * marched.t[..., None]
        pos_w = self.aabb.relative_pos(pos)  # (N, K, 3)
        dirs_w = warp_direction(dirs)  # (N, 3)
        if plan is None:
            pos_f = pos_w.reshape(N * K, 3)
            dir_f = jnp.broadcast_to(dirs_w[:, None, :], (N, K, 3)).reshape(N * K, 3)
            extra_f = None
            if extra is not None:
                E = extra.shape[-1]
                extra_f = jnp.broadcast_to(extra[:, None, :], (N, K, E)).reshape(-1, E)
            raw = self.network(
                params, pos_f, dir_f, extra=extra_f,
                differentiable_inputs=diff_inputs,
            )
            return raw.reshape(N, K, 4)

        # k-major layout so budget overflow truncates the march tail
        pos_km = jnp.transpose(pos_w, (1, 0, 2)).reshape(K * N, 3)
        dir_km = jnp.broadcast_to(dirs_w[None, :, :], (K, N, 3)).reshape(K * N, 3)
        pos_c = compact_rows(pos_km, plan)
        dir_c = compact_rows(dir_km, plan)
        extra_c = None
        if extra is not None:
            E = extra.shape[-1]
            extra_km = jnp.broadcast_to(extra[None, :, :], (K, N, E)).reshape(-1, E)
            extra_c = compact_rows(extra_km, plan)
        raw_c = self.network(
            params, pos_c, dir_c, extra=extra_c,
            differentiable_inputs=diff_inputs,
        )
        raw = expand_rows(raw_c, plan).reshape(K, N, 4)
        return jnp.transpose(raw, (1, 0, 2))

    @staticmethod
    def _rodrigues(rotvec):
        """Batched rotation-vector → matrix (RotationAdamOptimizer's
        composition, ``adam_optimizer.h``). sinc form with Taylor guards so
        gradients are finite at the zero rotation."""
        t2 = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)  # θ²
        small = t2 < 1e-8
        # fully-finite unselected branches (the where-NaN-gradient trap)
        t2s = jnp.maximum(t2, 1e-8)
        theta = jnp.sqrt(t2s)
        a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
        b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
        vx, vy, vz = rotvec[..., 0], rotvec[..., 1], rotvec[..., 2]
        zeros = jnp.zeros_like(vx)
        K = jnp.stack(
            [
                jnp.stack([zeros, -vz, vy], -1),
                jnp.stack([vz, zeros, -vx], -1),
                jnp.stack([-vy, vx, zeros], -1),
            ],
            -2,
        )
        eye = jnp.broadcast_to(jnp.eye(3), K.shape)
        return eye + a[..., None] * K + b[..., None] * (K @ K)

    def _adjusted_rays(self, cam, img, uv, data):
        """Differentiable ray generation with per-image pose offsets and a
        global log-focal multiplier applied on top of the dataset cameras
        (``Testbed::Nerf::Training::update_transforms`` semantics)."""
        W, H = self.resolution
        focal = data.focals[img] * jnp.exp(cam["focal"])[None, :]
        pp = data.pps[img]
        dir_cam = self._pixel_dirs_cam(uv, focal, pp)
        if self.optimize_distortion:
            # dir.xy += distortion.at_lerp(uv) (common_device.cuh:492)
            dir_cam = dir_cam.at[:, :2].add(
                grid_at_lerp(cam["distortion"], uv)
            )
        xf = data.xforms[img]
        Rdelta = self._rodrigues(cam["rot"][img])
        Rn = Rdelta @ xf[:, :, :3]
        d = jnp.einsum("nij,nj->ni", Rn, dir_cam)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = xf[:, :, 3] + cam["pos"][img]
        return o, d

    def batch_loss_and_grads(
        self, params, bitfield, mean_density, key, data, k: int, n_rays: int,
        emap: ErrorMapState | None = None,
    ):
        """Sample a ray batch, march, and compute (loss, metrics, grads[,
        emap']) — the shard-local core reused by both the single-chip step
        and the data-parallel step (ngp_tpu/parallel/nerf_dp.py). With an
        error map, rays draw from the loss CDFs and per-ray losses are
        bilinearly deposited back (``compute_loss_kernel_train_nerf``'s
        error_map splat, ``testbed_nerf.cu:1870-1900``)."""
        batch = self._sample_ray_batch(key, data, n_rays, emap)
        marched = march_rays(
            batch.origins,
            batch.dirs,
            bitfield,
            self.aabb.min,
            self.aabb.max,
            self.stepping,
            batch.n0,
            self.n_lattice,
            k,
            self.grid_cfg.max_mip,
            gate=(
                occ.build_coarse_gate(bitfield)
                if self._march_gate_eligible else None
            ),
            seg_budget=self._seg_budget,
        )

        # Compaction plan (non-differentiable ints, computed once outside
        # the grad): k-major so overflow drops the last march steps.
        plan = None
        valid_eff = marched.valid
        if self.compaction_budget_frac < 1.0:
            from ngp_tpu.ops.compaction import compaction_plan

            # The network budget derives from batch_size alone — the slot
            # grid n_rays x k may exceed it (adapt_batch_geometry fills the
            # budget with rays, reference NerfCounters semantics).
            nk = n_rays * k
            budget = min(self.samples_per_step, nk)
            if 0 < budget < nk:
                plan = compaction_plan(
                    jnp.transpose(marched.valid).reshape(-1), budget
                )
                keep_nk = jnp.transpose(plan.keep.reshape(k, n_rays))
                valid_eff = marched.valid & keep_nk

        kbg = jax.random.fold_in(key, 7)
        if self.train_with_random_bg:
            bg = jax.random.uniform(kbg, (n_rays, 3))
        else:
            bg = jnp.broadcast_to(
                jnp.asarray(self.background_color), (n_rays, 3)
            )

        from ngp_tpu.ops.tonemap import linear_to_srgb, srgb_to_linear

        def loss_of(p):
            cam = p["camera"]
            if (
                self.optimize_extrinsics
                or self.optimize_focal_length
                or self.optimize_distortion
            ):
                o, d = self._adjusted_rays(cam, batch.img, batch.uv, data)
            else:
                o, d = batch.origins, batch.dirs
            extra = cam["latents"][batch.img] if self.n_extra_dims > 0 else None
            # Targets pre-composited over the background in sRGB space
            # (testbed_nerf.cu:1805-1820 SRGB branch); per-image exposure
            # scales the linear color before re-encoding.
            a = batch.target_rgba[:, 3:4]
            rgb_t = batch.target_rgba[:, :3]
            if self.optimize_exposure:
                scale = jnp.exp2(cam["exposure"][batch.img])
                rgb_t = linear_to_srgb(srgb_to_linear(rgb_t) * scale)
            bg_used = bg
            if "envmap" in p:
                # Envmap background over the pre-envmap color
                # (testbed_nerf.cu:1787-1791); the envmap lives in linear
                # HDR, the sRGB conversion inside the loss reproduces the
                # reference's srgb_to_linear_derivative division
                # (testbed_nerf.cu:1994-1997). Gradients reach the envmap
                # through the ray composite only — the target mix is
                # stop-gradiented like the reference's.
                from ngp_tpu.ops.envmap import read_envmap

                env = read_envmap(p["envmap"]["image"], d)
                if self.rgb_act == "Logistic":
                    mixed = env[:, :3] + srgb_to_linear(bg) * (1.0 - env[:, 3:4])
                    bg_used = linear_to_srgb(jnp.maximum(mixed, 0.0))
                else:
                    bg_used = env[:, :3] + bg * (1.0 - env[:, 3:4])
            target = rgb_t * a + (1.0 - a) * jax.lax.stop_gradient(bg_used)
            raw = self._network_on_samples(p["model"], o, d, marched, extra, plan)
            return nerf_training_loss(
                raw,
                marched.dt,
                marched.t,
                valid_eff,
                marched.complete,
                bg_used,
                target,
                self.loss_fn,
                self.rgb_act,
                self.density_act,
                mean_density,
                depth_sample=marched.t,
                near_distance=self.near_distance,
                target_depth=batch.target_depth,
                depth_lambda=self.depth_supervision_lambda,
            )

        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        hit = marched.total > 0
        metrics = {
            "loss": aux["loss_display"],
            "measured_samples": aux["measured_samples"],
            "mean_total": jnp.sum(marched.total)
            / jnp.maximum(jnp.sum(hit.astype(jnp.int32)), 1),
            "seg_total": (
                marched.gate_total
                if marched.gate_total is not None
                else jnp.zeros((), jnp.int32)
            ),
            "n_rays": jnp.asarray(n_rays, jnp.int32),
        }
        if emap is None:
            return loss, metrics, grads

        # bilinear error deposit (4-corner scatter; ~4·n_rays elements)
        R = ERROR_MAP_RES
        p = jnp.clip(batch.uv * R - 0.5, 0.0, R - 1.0 - 1e-4)
        p0 = p.astype(jnp.int32)
        w = p - p0.astype(jnp.float32)
        val = aux["per_ray_loss"]
        d = emap.data
        for dy in (0, 1):
            for dx in (0, 1):
                wt = (w[:, 0] if dx else 1 - w[:, 0]) * (w[:, 1] if dy else 1 - w[:, 1])
                d = d.at[
                    batch.img,
                    jnp.minimum(p0[:, 1] + dy, R - 1),
                    jnp.minimum(p0[:, 0] + dx, R - 1),
                ].add(wt * val)
        return loss, metrics, grads, emap._replace(data=d)

    def apply_grads(self, state: TrainState, grads) -> TrainState:
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, self.ema_decay, state.step)
        return TrainState(state.step + 1, params, opt_state, ema)

    def _train_step(self, state: TrainState, bitfield, mean_density, key, data, emap, k: int, n_rays: int | None = None):
        if n_rays is None:
            n_rays = self.batch_size // k
        out = self.batch_loss_and_grads(
            state.params, bitfield, mean_density, key, data, k, n_rays, emap
        )
        if emap is None:
            _, metrics, grads = out
        else:
            _, metrics, grads, emap = out
        return self.apply_grads(state, grads), emap, metrics

    def train_step(self, state, grid: occ.OccupancyGridState, emap, key):
        k, n_rays = self._k, self._n_rays
        cache_key = ("train_step", k, n_rays, self._seg_budget)
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(partial(self._train_step, k=k, n_rays=n_rays),
                         donate_argnums=(0, 5))
            self._jit_cache[cache_key] = fn
        return fn(state, grid.bitfield, grid.mean_density, key, self.data, emap)

    def rebuild_error_map(self, emap: ErrorMapState) -> ErrorMapState:
        fn = self._jit_cache.get("rebuild_emap")
        if fn is None:
            def _rebuild(e):
                cdf_x, cdf_y, cdf_img = _build_cdfs(e.data)
                return ErrorMapState(e.data, cdf_x, cdf_y, cdf_img, jnp.asarray(True))

            fn = jax.jit(_rebuild)
            self._jit_cache["rebuild_emap"] = fn
        return fn(emap)

    def adapt_batch_geometry(self, metrics) -> None:
        """Re-pick the (n_rays, K) bucket from the measured per-ray sample
        count, aiming for K ≈ 2× the mean so only the tail truncates.
        Down-switches require a 25% margin (hysteresis) — every bucket is a
        separate compiled program and oscillating across a boundary costs
        minutes of recompilation.

        Also the degenerate-batch guard: the reference self-aborts when a
        training batch yields zero rays (``testbed_nerf.cu:3693-3697``,
        SURVEY §5.3) — continuing would only train the background. Unlike
        the reference, our occupancy update samples the density MLP over
        *all* cells, so a transiently empty bitfield resurrects on the
        next update; the guard therefore fires only on three consecutive
        zero-sample checks. This is the one place the train loop already
        syncs device→host, so the check is free."""
        if float(metrics["measured_samples"]) == 0.0:
            self._zero_sample_checks = getattr(self, "_zero_sample_checks", 0) + 1
            if self._zero_sample_checks >= 3:
                raise RuntimeError(
                    "Training generated 0 samples for 3 consecutive checks "
                    "— the scene geometry/occupancy grid is degenerate "
                    "(reference guard: testbed_nerf.cu:3693-3697). Check "
                    "aabb_scale, camera poses, and the transforms.json "
                    "scale/offset."
                )
            return
        self._zero_sample_checks = 0
        mean_total = max(float(metrics["mean_total"]), 1.0)
        target = self._pow2_clamp(2.0 * mean_total, self.min_samples_per_ray, self._k_max)
        if target > self._k:
            self._k = target
        elif target < self._k:
            with_margin = self._pow2_clamp(
                2.5 * mean_total, self.min_samples_per_ray, self._k_max
            )
            if with_margin < self._k:
                self._k = with_margin
        # Ray count fills the compact budget with REAL samples (the
        # reference adapts rays_per_batch so compacted samples ~ 2^18,
        # NerfCounters::update_after_training testbed_nerf.cu:3583-3609).
        # Before this, rays were pinned at batch_size/K, which left the
        # network running on ~50% padding once K's 2x headroom kicked in.
        # Nearest power of two; slot grid capped at 2x batch_size (march
        # cost scales with n_rays x n_lattice).
        # Power-of-FOUR ray buckets: every (k, n_rays) pair is a separately
        # compiled program and a train-step compile costs 1-3 min on the
        # tunnel even with the persistent cache (deserialization alone is
        # minutes-scale) — pow4 keeps a bench run to ~2-3 programs total.
        # The ≤2x slot waste it can cost is bounded by the compact budget:
        # the network still runs on exactly samples_per_step rows.
        want = self.samples_per_step / mean_total
        n_rays = 1 << (2 * int(round(math.log2(max(want, 1.0)) / 2.0)))
        n_rays = max(self.min_rays_per_batch, min(
            n_rays, (2 * self.batch_size) // self._k))
        self._n_rays = n_rays

        # Hierarchical-march fine budget: pow2 of 1.6x the measured
        # gate-passing segments (normalized per ray — the metrics may come
        # from a different ray bucket under the pipelined adapt), floor +
        # grow-eagerly/shrink-with-margin hysteresis; None disables the
        # compaction (full fine sweep) when the budget wouldn't save.
        # Overflow at 1.6x headroom truncates only the DEEPEST segments
        # (k-major plan) — the same truncation class as the K sample cap,
        # and only transiently until the next adapt window grows the
        # budget. The gate self-disables early in training (bitfield
        # barely pruned -> pass fraction too high for any budget to save)
        # and engages as occupancy converges.
        seg_total = float(metrics.get("seg_total", 0.0))
        n_rays_meas = int(metrics.get("n_rays", self._n_rays))
        if self._march_gate_eligible and seg_total > 0:
            msg = self.n_lattice // 8
            per_ray = seg_total / max(n_rays_meas, 1)
            full = self._n_rays * msg
            want_b = per_ray * self._n_rays * 1.6 + 2048
            grow = 1 << (max(int(want_b), 1) - 1).bit_length()
            if grow >= full:
                self._seg_budget = None
            elif self._seg_budget is None or grow > self._seg_budget:
                self._seg_budget = grow
            else:
                shrink = 1 << (
                    max(int(per_ray * self._n_rays * 2.4 + 2048), 1) - 1
                ).bit_length()
                if shrink < self._seg_budget:
                    self._seg_budget = shrink

    # -- occupancy maintenance (training_prep_nerf)

    def chunked_density(self, params, pos_w: jax.Array, chunk: int = 1 << 19) -> jax.Array:
        """Raw density-MLP output channel 0 for many warped positions,
        evaluated in fixed-size chunks via ``lax.map`` so the hash
        encoding's (L, N, 8) gather intermediates stay bounded — the
        counterpart of the reference's ≤2·128³ batching
        (``testbed_nerf.cu:3500-3516``)."""
        n = pos_w.shape[0]
        if n <= chunk:
            return self.network.density(params, pos_w)[:, 0]
        pad = (-n) % chunk
        if pad:
            pos_w = jnp.concatenate([pos_w, jnp.zeros((pad, 3), pos_w.dtype)], 0)
        chunks = pos_w.reshape(-1, chunk, 3)
        out = jax.lax.map(lambda p: self.network.density(params, p)[:, 0], chunks)
        return out.reshape(-1)[:n]

    def _decay_grid(self, grid: occ.OccupancyGridState):
        """Decay-only pass: EMA decay with no fresh samples (equivalent to
        an update whose splat is empty). This is what erodes the
        initially-occupied visible space; it costs one elementwise sweep."""
        density = occ.ema_update_density(grid.density, jnp.zeros_like(grid.density), self.grid_cfg.decay)
        mean = jnp.mean(jnp.maximum(density[0], 0.0))
        return occ.OccupancyGridState(
            density, occ.build_bitfield(density, mean), mean, grid.ema_step + 1
        )

    def decay_grid(self, grid):
        fn = self._jit_cache.get("decay_grid")
        if fn is None:
            fn = jax.jit(self._decay_grid, donate_argnums=0)
            self._jit_cache["decay_grid"] = fn
        return fn(grid)

    def _update_grid(self, params, grid: occ.OccupancyGridState, key, warmup: bool):
        if warmup:
            # All-cells sweep: the splat is dense by construction — no
            # segment-max (all_cells returns cascade-major order, which
            # reshapes straight to (C, G, G, G)).
            idx, pos = occ.all_cells(self.grid_cfg, key)
            pos_w = self.aabb.relative_pos(pos)
            raw = self.chunked_density(params["model"], pos_w)
            sigma = density_activation(self.density_act)(raw)
            G, C = self.grid_cfg.grid_size, self.grid_cfg.n_cascades
            return occ.update_grid_state_dense(
                self.grid_cfg, grid, sigma.reshape(C, G, G, G)
            )
        if self.grid_stride_update:
            # TPU-first stride-residue refresh (occ.stride_cells docstring):
            # every cell of every cascade re-queried once per _grid_strides
            # updates, zero probe gathers, dense splat. Cost parity with the
            # reference's ~n_cells/2 queries per update; the reference's
            # occupancy-biased resampling is replaced by the deterministic
            # round-robin (testbed_nerf.cu:635-676 semantics it replaces).
            phase = grid.ema_step % self._grid_strides
            pos = occ.stride_cells(self.grid_cfg, key, phase, self._grid_strides)
            pos_w = self.aabb.relative_pos(pos)
            raw = self.chunked_density(params["model"], pos_w)
            sigma = density_activation(self.density_act)(raw)
            splat = occ.place_stride(self.grid_cfg, sigma, phase, self._grid_strides)
            # Culled cells (-1) must not resurrect: their splat is ignored
            # by ema_update_density's where(density < 0).
            # NOTE on marginal-cell flicker (ADVICE r4): build_bitfield's
            # thresh_scale=decay^(strides/2) knob would keep mid-period
            # decayed cells occupied, but measured on the sphere fixture
            # it slows occupancy pruning enough to stall training (PSNR
            # 22 -> 3.7 at 400 steps), so the compensation stays OFF by
            # default; flicker only affects cells within ~2x of the
            # threshold, which EMA-max re-captures at their next residue
            # pass.
            return occ.update_grid_state_dense(self.grid_cfg, grid, splat)
        divisor = 4 if self.reference_prep_cadence else self.grid_sample_divisor
        n_part = self.grid_cfg.n_cells // divisor * self.grid_cfg.n_cascades
        idx, pos = occ.sample_update_cells(
            self.grid_cfg, key, grid.density, n_part, n_part
        )
        pos_w = self.aabb.relative_pos(pos)
        raw = self.chunked_density(params["model"], pos_w)
        sigma = density_activation(self.density_act)(raw)
        return occ.update_grid_state(self.grid_cfg, grid, idx, sigma)

    def update_grid(self, state: TrainState, grid, key, warmup: bool):
        name = ("update_grid", warmup)
        fn = self._jit_cache.get(name)
        if fn is None:
            fn = jax.jit(partial(self._update_grid, warmup=warmup), donate_argnums=1)
            self._jit_cache[name] = fn
        return fn(state.params, grid, key)

    # -- the outer loop (Testbed::train + training_prep cadence)

    def train(self, state, grid, n_steps: int, log_every: int = 0,
              metrics_file: str | None = None):
        """Run ``n_steps`` steps with interleaved occupancy updates. Returns
        (state, grid, last_metrics). Throughput/loss meters accumulate on
        ``self.meters`` (SURVEY §5.1/§5.5); ``metrics_file`` appends JSONL
        records at the sync cadence."""
        import time as _time

        from ngp_tpu.utils.meters import MetricsLogger, TrainMeters

        if not hasattr(self, "meters") or self.meters is None:
            self.meters = TrainMeters()
        logger = MetricsLogger(metrics_file) if metrics_file else None
        win_t0 = _time.monotonic()
        win_steps = 0
        metrics = {}
        base_key = jax.random.PRNGKey(self.seed ^ 0x5EED)
        # Host-side step counter: syncing state.step costs a full tunnel
        # round trip (~20-70 ms) AND drains the dispatch pipeline. The
        # counter is keyed on the identity of the state object this train
        # loop last returned — any externally modified/reloaded state
        # misses the key and re-syncs once.
        cached = getattr(self, "_host_step", None)
        if cached is not None and cached[0] == id(state):
            step0 = cached[1]
        else:
            step0 = int(state.step)
        if self._emap is None:
            self._emap = self.init_error_map()
        for step in range(step0, step0 + n_steps):
            if self.reference_prep_cadence:
                interval = min(max(step // 16, 1), 16)
                if step % interval == 0:
                    gkey = jax.random.fold_in(base_key, 2 * step + 1)
                    grid = self.update_grid(state, grid, gkey, warmup=step < 256)
            elif step % self.grid_update_interval == 0:
                gkey = jax.random.fold_in(base_key, 2 * step + 1)
                grid = self.update_grid(
                    state, grid, gkey, warmup=step < self.warmup_all_cells_steps
                )
            elif step % self.grid_decay_interval == 0:
                grid = self.decay_grid(grid)
            # error-map CDF rebuild on the reference's growing schedule
            # (every 128 steps, interval ×1.5 after each rebuild)
            if self.use_importance_sampling and step >= self._emap_next_rebuild:
                self._emap = self.rebuild_error_map(self._emap)
                self._emap_interval = int(self._emap_interval * 1.5)
                self._emap_next_rebuild = step + self._emap_interval
            key = jax.random.fold_in(base_key, 2 * step)
            state, self._emap, metrics = self.train_step(state, grid, self._emap, key)
            win_steps += 1
            if (step + 1) % self.adapt_every == 0:
                # Pipelined adapt: fetching the metrics of the step just
                # dispatched would block until the device catches up —
                # draining the whole dispatch pipeline every window (the
                # round-4 bench lost ~RTT+window of device time to this
                # per adapt). Instead start an async copy of THIS window's
                # metrics and process the PREVIOUS window's (whose copy
                # has had a full window to land). One window of adaptation
                # lag is harmless — the K/ray hysteresis already damps
                # faster oscillation than that.
                jax.tree.map(lambda x: x.copy_to_host_async(), metrics)
                now = _time.monotonic()
                window = {
                    "metrics": metrics,
                    "steps": win_steps,
                    "rays": float(self._n_rays) * win_steps,
                    "wall": now - win_t0,
                    "step": step + 1,
                }
                prev = getattr(self, "_pending_window", None)
                self._pending_window = window
                if prev is not None:
                    self._process_window(prev, logger)
                win_t0 = _time.monotonic()
                win_steps = 0
            if log_every and step % log_every == 0:
                print(
                    f"step {step}: loss={float(metrics['loss']):.5f} "
                    f"samples={int(metrics['measured_samples'])} "
                    f"k={self._k} "
                    f"({self.meters.samples_per_s.value/1e6:.2f} Msamples/s)"
                )
        if logger is not None:
            # Flush the pending window so the JSONL log is complete for
            # this call (costs one pipeline drain — only paid when a
            # metrics file was requested; the bench path stays drain-free
            # with meters lagging one window).
            prev = getattr(self, "_pending_window", None)
            if prev is not None:
                self._pending_window = None
                self._process_window(prev, logger)
            logger.close()
        self._host_step = (id(state), step0 + n_steps)
        return state, grid, metrics

    def _process_window(self, win, logger) -> None:
        """Fetch + account one adapt window (see the pipelined-adapt note
        in :meth:`train`)."""
        m = jax.device_get(win["metrics"])
        loss_ema = self.meters.update_loss(float(m["loss"]))
        self.meters.update_window(
            win["steps"],
            float(m["measured_samples"]) * win["steps"],
            win["rays"],
            win["wall"],
        )
        if logger is not None:
            logger.log(
                win["step"],
                loss=float(m["loss"]),
                loss_ema=loss_ema,
                samples_per_s=self.meters.samples_per_s.value,
                rays_per_s=self.meters.rays_per_s.value,
                step_ms=self.meters.step_ms.value,
                k=self._k,
            )
        self.adapt_batch_geometry(m)

    # -- rendering

    def inference_params(self, state: TrainState):
        return state.ema.params if self.ema_decay is not None else state.params

    def _eval_marched(self, params, origins, dirs, marched,
                      budget_frac: float):
        """Network evaluation at the marched samples → (rgb (N, K, 3),
        sigma (N, K)). k-major sample compaction at ``budget_frac`` of the
        slot grid (the training compaction's sibling; the reference's
        wavefront only feeds alive samples to inference,
        ``testbed_nerf.cu:2504-2659``) — budget overflow drops the deepest
        march steps, the same bias as the reference's step cap."""
        from ngp_tpu.ops.compaction import (
            compact_rows,
            compaction_plan,
            expand_rows,
        )

        N, K = marched.t.shape
        plan = None
        if budget_frac < 1.0:
            budget = min(-(-int(N * K * budget_frac) // 1024) * 1024, N * K)
            if 0 < budget < N * K:
                plan = compaction_plan(
                    jnp.transpose(marched.valid).reshape(-1), budget
                )
                keep = jnp.transpose(plan.keep.reshape(K, N))
                marched = marched._replace(valid=marched.valid & keep)
        pos = origins[:, None, :] + dirs[:, None, :] * marched.t[..., None]
        pos_w = self.aabb.relative_pos(pos)
        dir_w3 = warp_direction(dirs)
        if plan is not None:
            pos_km = jnp.transpose(pos_w, (1, 0, 2)).reshape(K * N, 3)
            dir_km = jnp.broadcast_to(
                dir_w3[None, :, :], (K, N, 3)
            ).reshape(K * N, 3)
            pos_c = compact_rows(pos_km, plan)
            dir_c = compact_rows(dir_km, plan)
            n = pos_c.shape[0]
        else:
            pos_c = pos_w.reshape(N * K, 3)
            dir_c = jnp.broadcast_to(
                dir_w3[:, None, :], (N, K, 3)
            ).reshape(N * K, 3)
            n = N * K
        chunk = 1 << 18
        pad = (-n) % chunk
        if pad:
            pos_c = jnp.concatenate([pos_c, jnp.zeros((pad, 3))], 0)
            dir_c = jnp.concatenate([dir_c, jnp.zeros((pad, 3))], 0)
        if self.n_extra_dims > 0:
            ez = jnp.zeros((chunk, self.n_extra_dims))
            net = lambda a: self.network(params["model"], a[0], a[1], extra=ez)
        else:
            net = lambda a: self.network(params["model"], a[0], a[1])
        raw = jax.lax.map(
            net, (pos_c.reshape(-1, chunk, 3), dir_c.reshape(-1, chunk, 3))
        ).reshape(-1, 4)[:n]
        if plan is not None:
            raw = jnp.transpose(
                expand_rows(raw, plan).reshape(K, N, 4), (1, 0, 2)
            )
        else:
            raw = raw.reshape(N, K, 4)
        rgb = rgb_activation(self.rgb_act)(raw[..., :3])
        sigma = density_activation(self.density_act)(raw[..., 3])
        return rgb, sigma

    def _miss_background(self, params, dirs):
        """Per-ray background color: the render bg, with the trainable
        envmap composited over it for miss rays (render tracer's envmap
        path, ``testbed_nerf.cu:2317-2318``)."""
        N = dirs.shape[0]
        bg = jnp.broadcast_to(
            jnp.asarray(self.background_color, jnp.float32), (N, 3)
        )
        if "envmap" in params:
            from ngp_tpu.ops.envmap import read_envmap
            from ngp_tpu.ops.tonemap import linear_to_srgb, srgb_to_linear

            env = read_envmap(params["envmap"]["image"], dirs)
            if self.rgb_act == "Logistic":
                mixed = env[:, :3] + srgb_to_linear(bg) * (1.0 - env[:, 3:4])
                bg = linear_to_srgb(jnp.maximum(mixed, 0.0))
            else:
                bg = env[:, :3] + bg * (1.0 - env[:, 3:4])
        return bg

    def _finish_shade(self, params, dirs, marched, rgb, sigma, mode,
                      min_transmittance):
        comp = composite(
            rgb, sigma, marched.dt, marched.t, marched.valid,
            self.min_transmittance_render
            if min_transmittance is None else min_transmittance,
        )
        if mode == "depth":
            return (
                jnp.repeat(comp.depth[:, None], 3, axis=1),
                comp.depth,
                comp.opacity,
            )
        if mode == "ao":
            return (
                jnp.repeat(comp.opacity[:, None], 3, 1),
                comp.depth,
                comp.opacity,
            )
        bg = self._miss_background(params, dirs)
        out_rgb = comp.rgb + comp.transmittance[:, None] * bg
        return out_rgb, comp.depth, comp.opacity

    def _render_chunk_staged(self, params, bitfield, origins, dirs,
                             crop_min, crop_max, mode: str = "shade",
                             min_transmittance: float | None = None):
        """Staged renderer with survivor compaction — the TPU counterpart
        of the reference's alive-ray wavefront (``render_nerf``'s
        payload compaction loop, ``testbed_nerf.cu:2504-2659``). The
        exponential lattice is split into ``len(render_stage_budgets)``
        segments; every stage marches + shades only a *compacted* subset
        of still-alive rays (transmittance above the early-out threshold
        and still inside the AABB), at a static power-of-two ray budget.

        Static-shape semantics: stage ``s`` processes at most
        ``ceil(N·render_stage_budgets[s])`` rays. Rays alive beyond a
        stage's budget are terminated and composited onto the background
        — the same truncation class as the slot-grid K cap, chosen so
        the budgets (defaults measured on fox: <2% of rays survive half
        the lattice at render quality) make overflow rare; the segment-
        local ``min_transmittance`` early-out is *conservative* vs the
        single-pass renderer (it cuts against segment-local rather than
        global transmittance, so it only ever keeps more samples)."""
        N = origins.shape[0]
        budgets = self.render_stage_budgets
        S = len(budgets)
        M = self.n_lattice
        Ms = -(-M // S)
        tmin, _ = ray_aabb_range(origins, dirs, self.aabb.min, self.aabb.max)
        tcmin, tcmax = ray_aabb_range(origins, dirs, crop_min, crop_max)
        n0 = self.stepping.to_steps(jnp.maximum(tmin, tcmin) + 1e-4)
        min_T = (
            self.min_transmittance_render
            if min_transmittance is None else min_transmittance
        )
        rgb_acc = jnp.zeros((N, 3))
        depth_acc = jnp.zeros((N,))
        Tr = jnp.ones((N,))
        alive = jnp.ones((N,), bool)
        overflow = jnp.zeros((), jnp.int32)  # rays truncated by budgets
        iota = jnp.arange(N, dtype=jnp.int32)
        frac = getattr(self, "render_staged_compaction_frac", 0.35)
        for s, bfrac in enumerate(budgets):
            A = min(N, max(256, 1 << (int(math.ceil(N * bfrac)) - 1).bit_length()))
            if A < N:
                keys = jnp.where(alive, iota, iota + N)
                (ks,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
                sel = ks[:A]
                sel_alive = sel < N
                idx = jnp.where(sel_alive, sel, 0)
                # overflow rays (alive but beyond the budget) terminate
                selected = (
                    jnp.zeros((N,), jnp.int32)
                    .at[idx].max(sel_alive.astype(jnp.int32))
                ) > 0
                overflow = overflow + jnp.sum(
                    (alive & ~selected).astype(jnp.int32)
                )
                alive = alive & selected
            else:
                idx = iota
                sel_alive = alive
            o_s = jnp.take(origins, idx, axis=0)
            d_s = jnp.take(dirs, idx, axis=0)
            marched = march_rays(
                o_s, d_s, bitfield, self.aabb.min, self.aabb.max,
                self.stepping, jnp.take(n0, idx) + float(s * Ms), Ms,
                min(self.n_render_samples, Ms), self.grid_cfg.max_mip,
            )
            marched = marched._replace(
                valid=marched.valid
                & (marched.t <= jnp.take(tcmax, idx)[:, None])
                & sel_alive[:, None]
            )
            rgb_s, sigma_s = self._eval_marched(params, o_s, d_s, marched, frac)
            comp = composite(
                rgb_s, sigma_s, marched.dt, marched.t, marched.valid, min_T
            )
            tr_in = jnp.take(Tr, idx)
            rgb_acc = rgb_acc.at[idx].add(
                jnp.where(sel_alive, 1.0, 0.0)[:, None]
                * tr_in[:, None] * comp.rgb
            )
            depth_acc = depth_acc.at[idx].add(
                jnp.where(sel_alive, tr_in * comp.depth, 0.0)
            )
            tr_out = tr_in * jnp.where(sel_alive, comp.transmittance, 1.0)
            Tr = Tr.at[idx].set(
                jnp.where(sel_alive, tr_out, jnp.take(Tr, idx))
            )
            seg_exited = (
                marched.exited
                if marched.exited is not None
                else jnp.zeros_like(sel_alive)
            )
            still = sel_alive & (tr_out > min_T) & ~seg_exited
            alive = alive.at[idx].set(
                jnp.where(sel_alive, still, jnp.take(alive, idx))
            )
        bg = self._miss_background(params, dirs)
        out_rgb = rgb_acc + Tr[:, None] * bg
        if mode == "depth":
            return (jnp.repeat(depth_acc[:, None], 3, 1), depth_acc,
                    1.0 - Tr, overflow)
        if mode == "ao":
            op = 1.0 - Tr
            return jnp.repeat(op[:, None], 3, 1), depth_acc, op, overflow
        return out_rgb, depth_acc, 1.0 - Tr, overflow

    def _render_chunk(self, params, bitfield, origins, dirs, crop_min,
                      crop_max, mode: str = "shade",
                      min_transmittance: float | None = None):
        """One fixed-size chunk of rays → (rgb, depth, opacity).

        ``mode`` selects the reference's debug render modes
        (``ERenderMode``, ``common.h:110-122``; per-mode branches of
        ``composite_kernel_nerf``, ``testbed_nerf.cu:1024-1230``):
        ``shade`` (default), ``depth``, ``normals`` (composited
        −∇σ/|∇σ|), ``positions``, ``cost`` (march-step count heat), ``ao``
        (accumulated opacity).

        ``crop_min``/``crop_max`` is the render crop box — the reference's
        ``m_render_aabb`` (crop-box gizmo / ``render_aabb`` dataset key):
        rays march only inside its intersection with the scene AABB."""
        tmin, _ = ray_aabb_range(origins, dirs, self.aabb.min, self.aabb.max)
        tcmin, tcmax = ray_aabb_range(origins, dirs, crop_min, crop_max)
        n0 = self.stepping.to_steps(jnp.maximum(tmin, tcmin) + 1e-4)
        marched = march_rays(
            origins,
            dirs,
            bitfield,
            self.aabb.min,
            self.aabb.max,
            self.stepping,
            n0,
            self.n_lattice,
            self.n_render_samples,
            self.grid_cfg.max_mip,
        )
        marched = marched._replace(
            valid=marched.valid & (marched.t <= tcmax[:, None])
        )
        if mode in ("shade", "depth", "ao"):
            rgb, sigma = self._eval_marched(
                params, origins, dirs, marched,
                getattr(self, "render_compaction_frac", 0.625),
            )
            return self._finish_shade(
                params, dirs, marched, rgb, sigma, mode, min_transmittance
            )
        # Debug modes (normals / positions / encoding / cost) run
        # uncompacted — they need the full (N, K) sample layout.
        N, K = marched.t.shape
        pos = origins[:, None, :] + dirs[:, None, :] * marched.t[..., None]
        pos_w = self.aabb.relative_pos(pos)
        dir_w3 = warp_direction(dirs)
        pos_w = pos_w.reshape(N * K, 3)
        dir_w = jnp.broadcast_to(
            dir_w3[:, None, :], (N, K, 3)
        ).reshape(N * K, 3)
        n = N * K
        # Chunk the sample sweep: at render sizes (rays × K samples) the
        # encoding's (L, N, C, D) index intermediates would exceed HBM.
        chunk = 1 << 18
        pad = (-n) % chunk
        if pad:
            pos_w = jnp.concatenate([pos_w, jnp.zeros((pad, 3))], 0)
            dir_w = jnp.concatenate([dir_w, jnp.zeros((pad, 3))], 0)
        if self.n_extra_dims > 0:
            ez = jnp.zeros((chunk, self.n_extra_dims))
            net = lambda a: self.network(params["model"], a[0], a[1], extra=ez)
        else:
            net = lambda a: self.network(params["model"], a[0], a[1])
        raw = jax.lax.map(
            net,
            (pos_w.reshape(-1, chunk, 3), dir_w.reshape(-1, chunk, 3)),
        ).reshape(-1, 4)[:n].reshape(N, K, 4)
        rgb = rgb_activation(self.rgb_act)(raw[..., :3])
        sigma = density_activation(self.density_act)(raw[..., 3])
        if mode == "normals":
            # −∇σ/|∇σ| composited like color, mapped to [0,1]
            # (testbed_nerf.cu's Normals composite branch).
            def dsum(p3):
                r = self.network.density(
                    params["model"], p3, differentiable_inputs=True
                )
                return jnp.sum(density_activation(self.density_act)(r[:, 0]))

            g = jax.lax.map(
                jax.grad(dsum), pos_w.reshape(-1, chunk, 3)
            ).reshape(-1, 3)[:n].reshape(N, K, 3)
            nrm = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
            rgb = (nrm + 1.0) * 0.5
        elif mode == "positions":
            rgb = pos_w[: N * K].reshape(N, K, 3)
        elif mode == "encoding":
            # EncodingVis: composite the pos-encoding's features as color
            # (the reference's visualize_activation path; first three
            # feature channels, squashed to [0,1]).
            def enc_fn(p3):
                e = self.network.pos_encoding(
                    params["model"]["pos_encoding"], p3
                )
                return jax.nn.sigmoid(e[:, :3] * 20.0)

            rgb = jax.lax.map(
                enc_fn, pos_w.reshape(-1, chunk, 3)
            ).reshape(-1, 3)[:n].reshape(N, K, 3)
        comp = composite(
            rgb, sigma, marched.dt, marched.t, marched.valid,
            self.min_transmittance_render
            if min_transmittance is None else min_transmittance,
        )
        if mode == "depth":
            return (
                jnp.repeat(comp.depth[:, None], 3, axis=1),
                comp.depth,
                comp.opacity,
            )
        if mode == "cost":
            heat = marched.n_samples.astype(jnp.float32) / 128.0
            return jnp.repeat(heat[:, None], 3, 1), comp.depth, comp.opacity
        if mode == "ao":
            return (
                jnp.repeat(comp.opacity[:, None], 3, 1),
                comp.depth,
                comp.opacity,
            )
        bg = jnp.broadcast_to(
            jnp.asarray(self.background_color, jnp.float32), (N, 3)
        )
        if "envmap" in params:
            # Miss rays show the envmap (render tracer's envmap path,
            # testbed_nerf.cu:2317-2318), over the render bg color.
            from ngp_tpu.ops.envmap import read_envmap
            from ngp_tpu.ops.tonemap import linear_to_srgb, srgb_to_linear

            env = read_envmap(params["envmap"]["image"], dirs)
            if self.rgb_act == "Logistic":
                mixed = env[:, :3] + srgb_to_linear(bg) * (1.0 - env[:, 3:4])
                bg = linear_to_srgb(jnp.maximum(mixed, 0.0))
            else:
                bg = env[:, :3] + bg * (1.0 - env[:, 3:4])
        out_rgb = comp.rgb + comp.transmittance[:, None] * bg
        return out_rgb, comp.depth, comp.opacity

    def render_rays(self, state, grid, origins, dirs, chunk: int = 1 << 16,
                    mode: str = "shade",
                    min_transmittance: float | None = None):
        """Render arbitrary rays in fixed-size chunks; returns (rgb, depth,
        opacity) arrays shaped like the inputs. ``min_transmittance``
        overrides the engine default (the reference eval protocol uses
        1e-4, testbed.h:791 vs run.py eval) without mutating engine state."""
        staged = (
            getattr(self, "render_staged", True)
            and mode in ("shade", "depth", "ao")
            and len(getattr(self, "render_stage_budgets", ())) > 1
        )
        key = ("render", chunk, mode, min_transmittance, staged)
        fn = self._jit_cache.get(key)
        if fn is None:
            impl = self._render_chunk_staged if staged else self._render_chunk
            fn = jax.jit(partial(impl, mode=mode,
                                 min_transmittance=min_transmittance))
            self._jit_cache[key] = fn
        params = self.inference_params(state)
        crop = getattr(self, "render_aabb", None)
        cmin = jnp.asarray(
            crop[0] if crop is not None else self.aabb.min, jnp.float32
        )
        cmax = jnp.asarray(
            crop[1] if crop is not None else self.aabb.max, jnp.float32
        )
        n = origins.shape[0]
        rgbs, depths, opas = [], [], []
        overflow = None
        for s in range(0, n, chunk):
            o = origins[s : s + chunk]
            d = dirs[s : s + chunk]
            pad = chunk - o.shape[0]
            if pad:
                o = jnp.concatenate([o, jnp.ones((pad, 3), o.dtype)], 0)
                d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)], 0)
            out = fn(params, grid.bitfield, o, d, cmin, cmax)
            rgb, dep, opa = out[:3]
            if staged:
                # rays truncated by a stage budget (device scalar; fetched
                # lazily by whoever inspects last_render_overflow)
                overflow = out[3] if overflow is None else overflow + out[3]
            take = chunk - pad
            rgbs.append(rgb[:take])
            depths.append(dep[:take])
            opas.append(opa[:take])
        if staged:
            self.last_render_overflow = overflow
        return (
            jnp.concatenate(rgbs, 0),
            jnp.concatenate(depths, 0),
            jnp.concatenate(opas, 0),
        )

    def render_image(self, state, grid, image_index: int, stride: int = 1,
                     mode: str = "shade", overlay: str | None = None):
        """Render the training view ``image_index`` (optionally strided for
        quick eval); returns (H', W', 3) in the training color space.

        ``mode``: see :meth:`render_rays`. ``overlay``: ``"gt"`` splices the
        ground-truth left half next to the render (the GUI's ground-truth
        overlay, ``testbed.cu:4722-4752``); ``"error"`` returns a
        false-color squared-error heat map (``:4755-4774``)."""
        W, H = self.resolution
        xs = np.arange(0, W, stride)
        ys = np.arange(0, H, stride)
        px, py = np.meshgrid(xs, ys)
        uv = jnp.asarray(
            np.stack([(px + 0.5) / W, (py + 0.5) / H], axis=-1).reshape(-1, 2),
            jnp.float32,
        )
        n = uv.shape[0]
        focal = jnp.broadcast_to(self.data.focals[image_index], (n, 2))
        pp = jnp.broadcast_to(self.data.pps[image_index], (n, 2))
        dir_cam = self._pixel_dirs_cam(uv, focal, pp)
        if self.optimize_distortion:
            # render with the learned distortion grid, like the reference's
            # render_with_lens_distortion default (testbed_nerf.cu:2776-2779)
            dir_cam = dir_cam.at[:, :2].add(
                grid_at_lerp(
                    self.inference_params(state)["camera"]["distortion"], uv
                )
            )
        xf = self.data.xforms[image_index]
        d = dir_cam @ xf[:, :3].T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(xf[:, 3], (n, 3))
        rgb, depth, opa = self.render_rays(state, grid, o, d, mode=mode)
        img = rgb.reshape(len(ys), len(xs), 3)
        if overlay is not None:
            gt = self.data.images[image_index][py, px][..., :3].astype(
                jnp.float32
            )
            if self.data.images.dtype == jnp.uint8:
                gt = gt / 255.0
            if overlay == "gt":
                half = img.shape[1] // 2
                img = jnp.concatenate([gt[:, :half], img[:, half:]], axis=1)
            elif overlay == "error":
                err = jnp.mean((img - gt) ** 2, axis=-1)
                # false-color heat: blue → red over the error range
                e = err / jnp.maximum(jnp.max(err), 1e-9)
                img = jnp.stack([e, 0.25 * e, 1.0 - e], axis=-1)
            else:
                raise ValueError(f"unknown overlay {overlay!r}")
        return img

    def render_density_slice(self, state, z: float, resolution: int = 256):
        """Density on an axis-aligned plane at height ``z`` ∈ [0,1] of the
        AABB — the Slice render mode, which skips tracing entirely
        (``render_nerf``'s Slice branch, ``testbed_nerf.cu:2752-2871``).
        Returns (res, res) activated densities."""
        xs = (np.arange(resolution) + 0.5) / resolution
        px, py = np.meshgrid(xs, xs)
        pos_w = jnp.asarray(
            np.stack([px, np.full_like(px, z), py], -1).reshape(-1, 3),
            jnp.float32,
        )
        params = self.inference_params(state)
        raw = self.chunked_density(params["model"], pos_w)
        sigma = density_activation(self.density_act)(raw)
        return np.asarray(sigma).reshape(resolution, resolution)

    def render_view(
        self,
        state,
        grid,
        xform,
        focal,
        pp=(0.5, 0.5),
        width: int | None = None,
        height: int | None = None,
        spp: int = 1,
        snap_to_pixel_centers: bool | None = None,
        seed: int = 0,
        aperture_size: float = 0.0,
        focus_z: float = 1.0,
        pixel_stride: int = 1,
        lens=None,
        min_transmittance: float | None = None,
    ):
        """Render an arbitrary camera view: ``xform`` (3,4) camera-to-world,
        ``focal`` (fx, fy) in pixels at the given resolution, ``pp``
        principal point in [0,1]². ``spp > 1`` jitters sub-pixel ray offsets
        and averages in linear radiance — the TPU render epilogue's
        accumulate buffer (``CudaRenderBuffer::accumulate``,
        ``src/render_buffer.cu``). ``snap_to_pixel_centers=None`` (default)
        snaps single-sample renders and jitters when spp > 1 (an all-pass
        snap would just average identical images). ``pixel_stride`` renders
        every Nth pixel of the FULL-resolution raster at its true pixel
        center — registration-exact against ``image[::N, ::N]`` ground
        truth (unlike shrinking width+focal, which shifts rays by
        (N−1)/2 px). Returns (rgb (H',W',3) in the training color space,
        depth (H',W'), opacity (H',W'))."""
        from ngp_tpu.ops.tonemap import linear_to_srgb, srgb_to_linear

        W = int(width if width is not None else self.resolution[0])
        H = int(height if height is not None else self.resolution[1])
        xform = jnp.asarray(xform, jnp.float32)
        focal = jnp.asarray(focal, jnp.float32).reshape(2)
        pp = jnp.asarray(pp, jnp.float32).reshape(2)
        px, py = np.meshgrid(
            np.arange(0, W, pixel_stride), np.arange(0, H, pixel_stride)
        )
        Wout, Hout = px.shape[1], px.shape[0]
        base = np.stack([px, py], axis=-1).reshape(-1, 2).astype(np.float32)
        n = base.shape[0]
        snap = (spp <= 1) if snap_to_pixel_centers is None else snap_to_pixel_centers

        acc_rgb = None
        acc_depth = None
        acc_opa = None
        rng = np.random.default_rng(seed)
        for s in range(max(spp, 1)):
            if snap or spp <= 1:
                off = np.asarray([0.5, 0.5], np.float32)
            else:
                off = rng.random(2).astype(np.float32)
            uv = jnp.asarray((base + off) / np.asarray([W, H], np.float32))
            focal_b = jnp.broadcast_to(focal, (n, 2))
            pp_b = jnp.broadcast_to(pp, (n, 2))
            # _pixel_dirs_cam assumes dataset resolution; inline the math
            # with this view's W/H instead.
            x = (uv[:, 0] - pp_b[:, 0]) * W / focal_b[:, 0]
            y = (uv[:, 1] - pp_b[:, 1]) * H / focal_b[:, 1]
            lens_eff = self.lens if lens is None else lens
            params_l = jnp.asarray(lens_eff.params, jnp.float32)
            if lens_eff.mode == LENS_OPENCV:
                x, y = iterative_undistortion(
                    opencv_lens_distortion_delta, params_l, x, y
                )
            elif lens_eff.mode == LENS_OPENCV_FISHEYE:
                x, y = iterative_undistortion(
                    opencv_fisheye_lens_distortion_delta, params_l, x, y
                )
            dir_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
            d = dir_cam @ xform[:, :3].T
            o = jnp.broadcast_to(xform[:, 3], (n, 3))
            if aperture_size > 0.0:
                # thin-lens DoF: jitter origins on the aperture disk, keep
                # the focus plane sharp (uv_to_ray's aperture path,
                # common_device.cuh:443-510); one disk sample per spp pass.
                from ngp_tpu.geometry.camera import square2disk_shirley

                au = jnp.asarray(rng.random((n, 2)).astype(np.float32))
                blur = aperture_size * square2disk_shirley(au * 2.0 - 1.0)
                offset = blur[:, 0:1] * xform[:, 0] + blur[:, 1:2] * xform[:, 1]
                lookat = o + d * focus_z
                o = o + offset
                d = (lookat - o) / focus_z
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            rgb, depth, opa = self.render_rays(
                state, grid, o, d, min_transmittance=min_transmittance
            )
            rgb_lin = srgb_to_linear(rgb) if self.rgb_act == "Logistic" else rgb
            acc_rgb = rgb_lin if acc_rgb is None else acc_rgb + rgb_lin
            acc_depth = depth if acc_depth is None else acc_depth + depth
            acc_opa = opa if acc_opa is None else acc_opa + opa
        k = float(max(spp, 1))
        rgb_lin = acc_rgb / k
        rgb = (
            linear_to_srgb(rgb_lin) if self.rgb_act == "Logistic" else rgb_lin
        )
        return (
            rgb.reshape(Hout, Wout, 3),
            (acc_depth / k).reshape(Hout, Wout),
            (acc_opa / k).reshape(Hout, Wout),
        )

    def render_view_foveated(
        self, state, grid, xform, focal, foveation,
        width: int | None = None, height: int | None = None,
        buffer_scale: float = 0.5, pp=(0.5, 0.5),
    ):
        """Foveated render: cast rays for a ``buffer_scale``-sized render
        buffer whose pixels are warped toward the foveation focus, then
        resample to full resolution (the reference's foveation pipeline —
        ``Foveation`` warp in ray generation,
        ``init_rays_with_payload_kernel_nerf`` + display unwarp). Returns
        (rgb (H, W, 3), buffer_resolution)."""
        W = int(width if width is not None else self.resolution[0])
        H = int(height if height is not None else self.resolution[1])
        Wb = max(int(round(W * buffer_scale)), 16)
        Hb = max(int(round(H * buffer_scale)), 16)
        xform = jnp.asarray(xform, jnp.float32)
        focal = jnp.asarray(focal, jnp.float32).reshape(2)
        pp = jnp.asarray(pp, jnp.float32).reshape(2)

        # buffer pixel grid -> full-image uv through the warp
        bx, by = np.meshgrid(np.arange(Wb), np.arange(Hb))
        uv_b = jnp.asarray(
            np.stack([(bx + 0.5) / Wb, (by + 0.5) / Hb], -1).reshape(-1, 2),
            jnp.float32,
        )
        uv = foveation.warp(uv_b)
        n = uv.shape[0]
        x = (uv[:, 0] - pp[0]) * W / focal[0]
        y = (uv[:, 1] - pp[1]) * H / focal[1]
        dir_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)
        d = dir_cam @ xform[:, :3].T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(xform[:, 3], (n, 3))
        rgb, _, _ = self.render_rays(state, grid, o, d)
        buf = rgb.reshape(Hb, Wb, 3)

        # full-res pixel grid -> buffer coords through the inverse warp
        fx, fy = np.meshgrid(np.arange(W), np.arange(H))
        uv_full = jnp.asarray(
            np.stack([(fx + 0.5) / W, (fy + 0.5) / H], -1).reshape(-1, 2),
            jnp.float32,
        )
        uv_buf = foveation.unwarp(uv_full)
        out = grid_at_lerp(buf, uv_buf).reshape(H, W, 3)
        return out, (Wb, Hb)

    def eval_test_transforms(
        self,
        state,
        grid,
        test_dataset,
        spp: int = 1,
        stride: int = 1,
        max_views: int | None = None,
        compute_flip: bool = False,
        save_first_to: str | None = None,
    ) -> dict:
        """Held-out evaluation over a test dataset's views, mirroring the
        reference's ``--test_transforms`` protocol
        (``/root/reference/scripts/run.py:208-266``): black background,
        pixel-center rays, sRGB-space clipped PSNR + SSIM per view.

        ``test_dataset`` is a ``NerfDataset`` (e.g. from
        ``load_nerf(test_transforms.json)``); geometry must share the
        training dataset's scale/offset convention, which ``load_nerf``
        guarantees for same-scene transform files. Rays use the TEST
        dataset's lens model (a distorted-lens test set renders with its
        own undistortion, not the training set's); the reference eval's
        1e-4 min transmittance is passed per-call, not by mutating engine
        state."""
        from ngp_tpu.utils import metrics as M

        n_views = test_dataset.images.shape[0]
        if max_views is not None:
            n_views = min(n_views, max_views)
        per_view = []
        W, H = test_dataset.resolution
        for i in range(n_views):
            # pixel_stride keeps strided eval rays registration-exact
            # against the image[::stride] ground truth (full-res focal,
            # true pixel centers)
            rgb, _, _ = self.render_view(
                state,
                grid,
                test_dataset.xforms[i, 0],
                test_dataset.focal_lengths[i],
                test_dataset.principal_points[i],
                width=W,
                height=H,
                spp=spp,
                pixel_stride=stride,
                lens=test_dataset.lens,
                min_transmittance=1e-4,  # reference eval setting
            )
            pred = np.clip(np.asarray(rgb), 0.0, 1.0)
            img = test_dataset.images[i][::stride, ::stride].astype(np.float32)
            if test_dataset.images.dtype == np.uint8:
                img = img / 255.0
            ref = np.clip(img[..., :3] * img[..., 3:4], 0.0, 1.0)
            m = M.mse(pred, ref)
            entry = {
                "view": i,
                "mse": m,
                "psnr": M.psnr_from_mse(m),
                "ssim": M.ssim(pred, ref),
            }
            if compute_flip:
                entry["flip"] = M.flip(ref, pred)
            per_view.append(entry)
            if i == 0 and save_first_to:
                from ngp_tpu.data.exr import write_exr  # noqa: F401
                import PIL.Image

                arr = (pred * 255).astype(np.uint8)
                PIL.Image.fromarray(arr).save(save_first_to)
        res = {
            "n_views": len(per_view),
            "psnr": float(np.mean([e["psnr"] for e in per_view])),
            "min_psnr": float(np.min([e["psnr"] for e in per_view])),
            "max_psnr": float(np.max([e["psnr"] for e in per_view])),
            "ssim": float(np.mean([e["ssim"] for e in per_view])),
            "per_view": per_view,
        }
        if compute_flip:
            res["flip"] = float(np.mean([e["flip"] for e in per_view]))
        return res

    def psnr(self, state, grid, image_index: int, stride: int = 1) -> float:
        """PSNR of a rendered training view vs the stored image, compared in
        the training color space with the render background color — the
        analogue of ``run.py``'s test-transforms evaluation."""
        pred = np.asarray(self.render_image(state, grid, image_index, stride))
        img = self.dataset.images[image_index][::stride, ::stride].astype(np.float32)
        if self.dataset.images.dtype == np.uint8:
            img = img / 255.0
        a = img[..., 3:4]
        bg = np.asarray(self.background_color, np.float32)
        target = img[..., :3] * a + (1.0 - a) * bg
        mse = float(np.mean((pred - target) ** 2))
        return -10.0 * math.log10(max(mse, 1e-12))

    # -- mesh export (compute_marching_cubes_mesh, python_api.cu:101-125)

    def compute_marching_cubes_mesh(
        self, state, resolution: int = 256, density_thresh: float = 2.5,
        aabb=None,
    ):
        """Extract an isosurface of the *raw* density-MLP output (the
        reference meshes raw MLP values, ``grid_samples_half_to_float``,
        with GUI default threshold 2.5). Returns (verts, faces) in scene
        space."""
        from ngp_tpu.ops.marching_cubes import marching_cubes

        lo, hi = aabb if aabb is not None else (self.aabb.min, self.aabb.max)
        lo, hi = np.asarray(lo), np.asarray(hi)
        params = self.inference_params(state)
        n = resolution
        axes = [np.linspace(lo[d], hi[d], n, dtype=np.float32) for d in range(3)]
        grid_pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
        pos_w = self.aabb.relative_pos(jnp.asarray(grid_pts))
        raw = np.asarray(self.chunked_density(params["model"], pos_w))
        field = raw.reshape(n, n, n)
        spacing = (hi - lo) / (n - 1)
        return marching_cubes(field, density_thresh, origin=lo, spacing=spacing)

    def optimize_mesh_vertices(
        self, state, verts, faces, n_steps: int = 10,
        density_thresh: float = 2.5, learning_rate: float = 1e-4,
        k_smooth: float = 2048.0, k_density: float = 128.0,
        k_inflate: float = 1.0,
    ):
        """Differentiable mesh refinement against the raw density field —
        the reference's ``optimize_mesh`` path (``MeshState`` trainable
        verts + ``compute_mesh_opt_gradients``,
        ``src/marching_cubes.cu:710-774``)."""
        from ngp_tpu.ops.mesh_opt import optimize_mesh

        params = self.inference_params(state)

        def density_fn(v):
            pos_w = self.aabb.relative_pos(v)
            return self.network.density(
                params["model"], pos_w, differentiable_inputs=True
            )[:, 0]

        return optimize_mesh(
            density_fn, jnp.asarray(verts, jnp.float32),
            jnp.asarray(faces, jnp.int32), density_thresh, n_steps,
            learning_rate, k_smooth, k_density, k_inflate,
        )

    # -- snapshots (save_snapshot/load_snapshot, testbed.cu:4873-5057)

    def save_snapshot(self, path: str, state: TrainState, grid, include_optimizer=False):
        from ngp_tpu.utils.snapshot import save_snapshot

        payload = {
            "mode": "nerf",
            "network_config": self.config,
            "snapshot": {
                "training_step": np.asarray(state.step),
                "params": jax.tree.map(np.asarray, state.params),
                "ema_params": jax.tree.map(np.asarray, state.ema.params),
                "density_grid": np.asarray(grid.density, np.float16),
                "density_grid_mean": np.asarray(grid.mean_density),
                "aabb_scale": self.aabb_scale,
                # loss EMA restored like the reference (testbed.cu:5037-5038)
                "loss_ema": getattr(self, "meters", None).loss_ema
                if getattr(self, "meters", None) else 0.0,
            },
        }
        if include_optimizer:
            payload["snapshot"]["opt_state"] = jax.tree.map(
                np.asarray, state.opt_state
            )
        save_snapshot(path, payload)

    def load_snapshot(self, path: str):
        from ngp_tpu.utils.snapshot import load_snapshot

        doc = load_snapshot(path)
        snap = doc["snapshot"]
        params = jax.tree.map(jnp.asarray, snap["params"])
        state = TrainState(
            step=jnp.asarray(snap["training_step"], jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema=EmaState(jax.tree.map(jnp.asarray, snap["ema_params"])),
        )
        density = jnp.asarray(snap["density_grid"], jnp.float32)
        mean = jnp.asarray(snap["density_grid_mean"])
        grid = occ.OccupancyGridState(
            density, occ.build_bitfield(density, mean), mean, jnp.zeros([], jnp.int32)
        )
        if "loss_ema" in snap:
            from ngp_tpu.utils.meters import TrainMeters

            self.meters = TrainMeters()
            self.meters.loss_ema = float(snap["loss_ema"])
            self.meters.n_loss_updates = 1
        return state, grid

    def save_reference_snapshot(self, path: str, state: TrainState, grid,
                                compress: bool = True) -> None:
        """Write a reference-format ``.ingp``/``.msgpack`` snapshot
        (``Testbed::save_snapshot``, ``src/testbed.cu:4873-4937``): the
        network config with a ``snapshot`` key holding the tcnn-layout
        parameter buffer and the Morton-ordered fp16 density grid."""
        from ngp_tpu.data import ingp_snapshot as ingp

        params = self.inference_params(state)
        doc = dict(self.config)
        doc["snapshot"] = {
            "version": ingp.SNAPSHOT_FORMAT_VERSION,
            "mode": "nerf",
            "training_step": int(state.step),
            "loss": 0.0,
            "density_grid_size": self.grid_size,
            "density_grid_binary": ingp.density_grid_to_reference(
                np.asarray(grid.density)
            ),
            "n_params": ingp.reference_n_params(self.network),
            "params_type": "__half",
            "params_binary": ingp.params_to_reference(
                jax.tree.map(np.asarray, params["model"]), self.network
            ),
            "nerf": {"aabb_scale": self.aabb_scale},
        }
        ingp.save_ingp(path, doc, compress=compress)

    def load_reference_snapshot(self, path: str):
        """Read a reference-format snapshot into a fresh ``(state, grid)``
        (``Testbed::load_snapshot``, ``src/testbed.cu:4939-5057``). The
        network config in the snapshot must describe the same architecture
        this engine was built with."""
        from ngp_tpu.data import ingp_snapshot as ingp

        doc = ingp.load_ingp(path)
        if "snapshot" not in doc:
            raise ValueError(f"'{path}' does not contain a snapshot")
        snap = doc["snapshot"]
        gsize = int(snap.get("density_grid_size", occ.NERF_GRIDSIZE))
        if gsize != self.grid_size:
            raise ValueError(
                f"snapshot grid size {gsize} != engine grid size "
                f"{self.grid_size}"
            )
        model = jax.tree.map(
            jnp.asarray, ingp.params_from_reference(snap, self.network)
        )
        state = self.init_state()
        params = dict(state.params)
        params["model"] = model
        state = TrainState(
            step=jnp.asarray(int(snap.get("training_step", 0)), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema=EmaState(jax.tree.map(jnp.asarray, params)),
        )
        density = jnp.asarray(
            ingp.density_grid_from_reference(
                snap["density_grid_binary"],
                self.grid_cfg.n_cascades,
                self.grid_size,
            )
        )
        mean = jnp.mean(jnp.maximum(density[0], 0.0))
        grid = occ.OccupancyGridState(
            density,
            occ.build_bitfield(density, mean),
            mean,
            jnp.zeros([], jnp.int32),
        )
        return state, grid
