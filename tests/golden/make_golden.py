"""Regenerate the golden parity fixtures (tests/golden/*.npz, golden.ingp).

Frozen artifacts pin the full load→render→gradient numerics: the
activation clamps (`ops/composite.py`, reference
`src/testbed_nerf.cu:317-388`), the sRGB math
(`common_device.cuh:75-122` counterparts in `ops/tonemap.py`), the
marching/compositing chain, and the `.ingp` codec. If any of those
drift, `test_golden_parity.py` fails even though the training dynamics
tests might still pass.

Run from the repo root ON CPU (the fixtures are fp32-exact only there):

    python tests/golden/make_golden.py

Commit the regenerated files ONLY for intentional numerics changes, and
say why in the commit message.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def build_engine():
    from test_nerf_engine import CONFIG, _make_dataset
    from ngp_tpu.engines.nerf import NerfEngine

    return NerfEngine(
        dict(CONFIG), _make_dataset(6), batch_size=1 << 12, grid_size=16,
        n_steps_per_unit=128, density_grid_decay=0.8, seed=11,
    )


def main():
    jax.config.update("jax_platforms", "cpu")
    eng = build_engine()
    state, grid = eng.init_state(), eng.init_grid()
    state, grid, _ = eng.train(state, grid, 48)

    eng.save_reference_snapshot(os.path.join(HERE, "golden.ingp"), state, grid)
    # compute every golden artifact from the RELOADED snapshot, so the
    # test's load->render->grad chain sees identical (fp16-rounded) params
    state, grid = eng.load_reference_snapshot(os.path.join(HERE, "golden.ingp"))

    img = np.asarray(eng.render_image(state, grid, 0, stride=4))

    # gradient probe: fixed key, fixed geometry
    key = jax.random.PRNGKey(99)
    _, _, grads = eng.batch_loss_and_grads(
        state.params, grid.bitfield, grid.mean_density, key, eng.data,
        k=64, n_rays=64,
    )
    table = np.asarray(grads["model"]["pos_encoding"]["table"])
    mlp0 = np.asarray(grads["model"]["density_mlp"]["weights"][0])
    np.savez(
        os.path.join(HERE, "golden.npz"),
        render=img,
        grad_table_slice=table[:, :256, :],
        grad_table_norm=np.linalg.norm(table.reshape(-1)),
        grad_mlp0=mlp0,
    )
    print("golden fixtures written:", img.shape, table.shape)


if __name__ == "__main__":
    main()
