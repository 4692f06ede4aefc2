"""Golden parity fixtures (round-2 verdict task 6 / BASELINE "allclose"
clause, self-consistency half): a frozen `.ingp` snapshot plus a frozen
render and gradient probe, committed under tests/golden/. The test runs
the full load→render→gradient chain and asserts allclose against the
frozen arrays — any drift in the activation clamps
(`src/testbed_nerf.cu:317-388` counterparts), sRGB conversions
(`common_device.cuh:75-122`), marching/compositing, or the `.ingp`
codec fails here even when the statistical training tests still pass.

Regenerate (intentional numerics changes only): tests/golden/make_golden.py
"""

import os
import sys

import jax
import numpy as np

HERE = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, os.path.dirname(__file__))  # for `golden.` imports


def test_golden_render_and_gradients():
    from golden.make_golden import build_engine

    gold = np.load(os.path.join(HERE, "golden.npz"))
    eng = build_engine()
    state, grid = eng.load_reference_snapshot(os.path.join(HERE, "golden.ingp"))

    img = np.asarray(eng.render_image(state, grid, 0, stride=4))
    np.testing.assert_allclose(
        img, gold["render"], rtol=2e-4, atol=2e-4,
        err_msg="render drifted vs frozen golden (activation clamps / "
                "sRGB / marching / .ingp codec)",
    )

    key = jax.random.PRNGKey(99)
    _, _, grads = eng.batch_loss_and_grads(
        state.params, grid.bitfield, grid.mean_density, key, eng.data,
        k=64, n_rays=64,
    )
    table = np.asarray(grads["model"]["pos_encoding"]["table"])
    np.testing.assert_allclose(
        table[:, :256, :], gold["grad_table_slice"], rtol=5e-3, atol=1e-5,
        err_msg="hash-table gradient drifted vs frozen golden",
    )
    np.testing.assert_allclose(
        np.linalg.norm(table.reshape(-1)), gold["grad_table_norm"],
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(grads["model"]["density_mlp"]["weights"][0]),
        gold["grad_mlp0"], rtol=5e-3, atol=1e-6,
        err_msg="density-MLP gradient drifted vs frozen golden",
    )
