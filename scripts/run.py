#!/usr/bin/env python3
"""Training/eval driver — the counterpart of the reference's
``scripts/run.py`` (``run.py:80-318``): train any of the four primitives
from the command line, evaluate PSNR/IoU/MSE, take screenshots, export
meshes, save/load snapshots.

Examples:
    python scripts/run.py data/nerf/fox --n_steps 2000 \\
        --screenshot out/fox.png --save_snapshot out/fox.ingp
    python scripts/run.py data/sdf/armadillo.obj --n_steps 1000 \\
        --save_mesh out/armadillo.obj
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def write_image(path: str, img) -> None:
    import numpy as np

    img = np.asarray(img)
    if path.endswith(".exr"):
        from ngp_tpu.data.exr import write_exr

        write_exr(path, img.astype(np.float32))
        return
    from PIL import Image

    arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scene", nargs="?", default="",
                   help="scene path: transforms.json/dir (NeRF), obj/stl (SDF), "
                        "nvdb/npy (volume), image file (image)")
    p.add_argument("--mode", default=None, choices=["nerf", "sdf", "image", "volume"])
    p.add_argument("--network", default=None, help="network config json")
    p.add_argument("--n_steps", type=int, default=2000)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--load_snapshot", default=None)
    p.add_argument("--save_snapshot", default=None)
    p.add_argument("--screenshot", default=None, help="render a view to this path")
    p.add_argument("--screenshot_w", type=int, default=512)
    p.add_argument("--screenshot_h", type=int, default=512)
    p.add_argument("--save_mesh", default=None, help="marching-cubes export (obj/ply)")
    p.add_argument("--marching_cubes_res", type=int, default=256)
    p.add_argument("--marching_cubes_density_thresh", type=float, default=2.5)
    p.add_argument("--test_view", type=int, default=0,
                   help="training view index for NeRF PSNR eval / screenshot")
    p.add_argument("--eval_stride", type=int, default=2)
    p.add_argument("--seed", type=int, default=1337)
    p.add_argument("--compile_cache", default=os.path.expanduser("~/.cache/jax_comp_cache"))
    args = p.parse_args(argv)

    if args.compile_cache:
        import jax

        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from ngp_tpu.testbed import Testbed

    kw = {"seed": args.seed}
    if args.batch_size:
        kw["batch_size"] = args.batch_size
    tb = Testbed(mode=args.mode, scene=args.scene or None,
                 config=args.network, **kw)

    if args.load_snapshot:
        tb.load_snapshot(args.load_snapshot)
        print(f"loaded snapshot at step {tb.training_step}")

    if args.n_steps > 0 and tb.engine is not None:
        t0 = time.time()
        tb.train(args.n_steps)
        dt = time.time() - t0
        print(f"trained {args.n_steps} steps in {dt:.1f}s "
              f"({args.n_steps / dt:.2f} steps/s), loss={tb.loss:.6f}")

    # evaluation
    if tb.mode == "nerf":
        psnr = tb.psnr(args.test_view, stride=args.eval_stride)
        print(f"PSNR (train view {args.test_view}): {psnr:.2f} dB")
    elif tb.mode == "sdf":
        iou = tb.calculate_iou()
        print(f"IoU: {iou:.4f}")
    elif tb.mode == "image":
        mse = tb.compute_image_mse()
        print(f"MSE: {mse:.6f}  PSNR: {-10 * __import__('math').log10(max(mse, 1e-12)):.2f} dB")

    if args.save_snapshot:
        os.makedirs(os.path.dirname(args.save_snapshot) or ".", exist_ok=True)
        tb.save_snapshot(args.save_snapshot)
        print(f"saved snapshot to {args.save_snapshot}")

    if args.screenshot:
        os.makedirs(os.path.dirname(args.screenshot) or ".", exist_ok=True)
        if tb.mode == "nerf":
            img = tb.render(args.screenshot_w, args.screenshot_h,
                            training_view=args.test_view)
        else:
            img = tb.render(args.screenshot_w, args.screenshot_h)
        write_image(args.screenshot, img)
        print(f"wrote {args.screenshot}")

    if args.save_mesh:
        from ngp_tpu.ops.marching_cubes import save_obj, save_ply

        verts, faces = tb.compute_marching_cubes_mesh(
            args.marching_cubes_res, args.marching_cubes_density_thresh
        )
        os.makedirs(os.path.dirname(args.save_mesh) or ".", exist_ok=True)
        if args.save_mesh.endswith(".ply"):
            save_ply(args.save_mesh, verts, faces)
        else:
            save_obj(args.save_mesh, verts, faces)
        print(f"wrote {args.save_mesh} ({len(verts)} verts, {len(faces)} faces)")


if __name__ == "__main__":
    main()
