"""2D training-position samplers for image fitting — Uniform, Halton(2,3),
Sobol-ish low discrepancy, and Stratified, mirroring the reference's
``halton23_kernel`` / ``sobol2_kernel`` / ``stratify2_kernel``
(``src/testbed_image.cu:41-77``) as vectorized JAX ops keyed off the global
sample index (so streams are deterministic and step-indexed like the
reference's)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _radical_inverse(base: int, idx: jax.Array, n_digits: int = 20) -> jax.Array:
    """Vectorized radical inverse (van der Corput in the given base)."""
    idx = idx.astype(jnp.uint32)
    result = jnp.zeros(idx.shape, jnp.float32)
    inv_base = 1.0 / base
    scale = inv_base
    for _ in range(n_digits):
        digit = idx % base
        result = result + digit.astype(jnp.float32) * scale
        idx = idx // base
        scale = scale * inv_base
    return result


def halton23(base_idx: jax.Array, n: int) -> jax.Array:
    """(n, 2) Halton(2,3) points starting at sample index ``base_idx``."""
    idx = base_idx + jnp.arange(n, dtype=jnp.uint32)
    return jnp.stack(
        [_radical_inverse(2, idx), _radical_inverse(3, idx)], axis=-1
    )


def _sobol_owen_scramble(x: jax.Array, seed: jax.Array) -> jax.Array:
    # Laine-Karras style hash scramble, the spirit of tcnn's ld_random_val.
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> 16) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


def _reverse_bits32(x: jax.Array) -> jax.Array:
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _sobol2d(idx: jax.Array) -> jax.Array:
    """First two Sobol dimensions (direction numbers: identity & Pascal)."""
    idx = idx.astype(jnp.uint32)
    d0 = _reverse_bits32(idx)
    # Second dimension via the classic bit recurrence.
    v = idx
    x = jnp.zeros_like(idx)
    c = jnp.uint32(1 << 31)
    for _ in range(32):
        x = jnp.where(v & 1, x ^ c, x)
        v = v >> 1
        c = c ^ (c >> 1)
    return jnp.stack([d0, x], axis=-1)


def sobol2(base_idx: jax.Array, n: int, seed: jax.Array) -> jax.Array:
    idx = base_idx + jnp.arange(n, dtype=jnp.uint32)
    pts = _sobol2d(idx)
    seed = jnp.asarray(seed, jnp.uint32)
    s0 = _sobol_owen_scramble(pts[:, 0], seed * jnp.uint32(0x9E3779B9) + 1)
    s1 = _sobol_owen_scramble(pts[:, 1], seed * jnp.uint32(0x9E3779B9) + 2)
    out = jnp.stack([s0, s1], axis=-1)
    return out.astype(jnp.float32) * (1.0 / 4294967296.0)


def uniform2(key: jax.Array, n: int) -> jax.Array:
    return jax.random.uniform(key, (n, 2))


def stratify2(positions: jax.Array, log2_batch_size: int) -> jax.Array:
    """Jitter uniform samples into a sqrt(batch)×sqrt(batch) grid, matching
    ``stratify2_kernel``. Requires a square power-of-two batch."""
    n = positions.shape[0]
    log2_size = log2_batch_size // 2
    size = 1 << log2_size
    in_batch = jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << log2_batch_size) - 1)
    x = (in_batch & (size - 1)).astype(jnp.float32)
    y = (in_batch >> log2_size).astype(jnp.float32)
    return jnp.stack(
        [positions[:, 0] / size + x / size, positions[:, 1] / size + y / size],
        axis=-1,
    )


def sample_positions(
    mode: str, key: jax.Array, step: jax.Array, batch_size: int, seed: int = 1337
) -> jax.Array:
    """Dispatch on the reference's ERandomMode."""
    mode = mode.lower()
    base = (jnp.asarray(step, jnp.uint32) * jnp.uint32(batch_size)).astype(jnp.uint32)
    if mode == "halton":
        return halton23(base, batch_size)
    if mode == "sobol":
        return sobol2(base, batch_size, jnp.uint32(seed))
    pos = uniform2(key, batch_size)
    if mode == "stratified":
        lb = int(batch_size).bit_length() - 1
        if (1 << lb) == batch_size and lb % 2 == 0:
            pos = stratify2(pos, lb)
    return pos
