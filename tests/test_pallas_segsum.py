"""MXU one-hot segment-sum kernel (ops/pallas/segsum.py) vs numpy add.at,
in Pallas interpret mode (compiles with stock Mosaic on TPU; interpret
exercises the same program on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.pallas.segsum import segment_sum_onehot


@pytest.mark.parametrize("m,t,f", [(1000, 256, 2), (513, 640, 4), (64, 4096, 1)])
def test_onehot_segsum_matches_numpy(m, t, f):
    rng = np.random.default_rng(0)
    keys = rng.integers(0, t, size=m).astype(np.int32)
    vals = rng.normal(size=(m, f)).astype(np.float32)
    ref = np.zeros((t, f), np.float32)
    np.add.at(ref, keys, vals.astype(np.float32))
    got = np.asarray(
        segment_sum_onehot(jnp.asarray(keys), jnp.asarray(vals), t,
                           sc=256, interpret=True)
    )
    # bf16 one-hot matmul: addends quantized to bf16, fp32 accumulation
    tol = 2 ** -8 * np.abs(vals).sum(0).max() + 1e-6
    np.testing.assert_allclose(got, ref, atol=float(tol))


def test_onehot_segsum_empty_and_padding():
    keys = jnp.asarray([5, 5, 130], jnp.int32)
    vals = jnp.asarray([[1.0], [2.0], [4.0]])
    out = np.asarray(segment_sum_onehot(keys, vals, 200, sc=128, interpret=True))
    assert out[5, 0] == 3.0 and out[130, 0] == 4.0
    assert out.sum() == 7.0  # padded keys contribute nothing


def test_segment_sum_sorted_blocks_interpret_matches_numpy():
    """Interval-extraction kernel (the production sorted-run extractor,
    ops/pallas/segsum_sorted.py) in interpret mode vs a numpy oracle:
    uniform keys, a pathological single-block concentration, empty
    blocks, and block-boundary rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ngp_tpu.ops.pallas.segsum_sorted import (
        RB,
        block_starts_for,
        segment_sum_sorted_blocks,
    )

    rng = np.random.default_rng(11)
    L, M, F, T = 3, 5000, 4, 4 * RB
    keys = np.stack([
        rng.integers(0, T, M),                      # uniform over 4 blocks
        np.minimum(rng.integers(0, 40, M) + RB, T - 1),  # one hot block
        np.concatenate([                             # boundary rows + gap
            np.full(M // 2, RB - 1), np.full(M - M // 2, 3 * RB),
        ]),
    ]).astype(np.int32)
    vals = rng.normal(size=(L, M, F)).astype(np.float32)

    want = np.zeros((L, T, F), np.float32)
    for l in range(L):
        np.add.at(want[l], keys[l], vals[l])

    order = np.argsort(keys, axis=1, kind="stable")
    keys_s = np.take_along_axis(keys, order, axis=1)
    vals_s = np.stack(
        [np.take_along_axis(vals[..., f], order, axis=1) for f in range(F)],
        axis=1,
    )  # (L, F, M)
    starts = block_starts_for(jnp.asarray(keys), T, interpret=True)
    got = np.asarray(
        segment_sum_sorted_blocks(
            jnp.asarray(keys_s), jnp.asarray(vals_s), starts, T,
            interpret=True,
        )
    )
    # addends ride the one-hot matmul as bf16 with fp32 accumulation —
    # the production precision class (tcnn fp16-atomics equivalent)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.02 * scale
    # empty rows must be exactly zero (no junk from window slop)
    empty = ~np.isin(np.arange(T), keys.reshape(-1))
    assert np.abs(got[:, empty]).max() == 0.0

