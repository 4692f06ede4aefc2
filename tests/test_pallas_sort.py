"""VMEM-resident bitonic sort kernel (ops/pallas/sort.py), interpret mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from ngp_tpu.ops.pallas.sort import bitonic_sort_pos


@pytest.mark.parametrize("b,n", [(1, 256), (2, 2048), (3, 1024)])
def test_bitonic_sort_matches_numpy(b, n):
    rng = np.random.default_rng(b * 1000 + n)
    keys = rng.integers(0, n // 2, (b, n)).astype(np.int32)
    keys[:, -3:] = 2**31 - 1  # sentinel padding sorts to the tail
    sk, sp = bitonic_sort_pos(jnp.asarray(keys), interpret=True)
    sk, sp = np.asarray(sk), np.asarray(sp)
    for i in range(b):
        assert (sk[i] == np.sort(keys[i])).all()
        assert (keys[i][sp[i]] == sk[i]).all()


def test_bitonic_sort_already_sorted_and_reversed():
    n = 512
    up = np.arange(n, dtype=np.int32)[None]
    dn = up[:, ::-1].copy()
    for arr in (up, dn):
        sk, sp = bitonic_sort_pos(jnp.asarray(arr), interpret=True)
        assert (np.asarray(sk)[0] == np.arange(n)).all()
