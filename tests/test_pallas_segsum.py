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
