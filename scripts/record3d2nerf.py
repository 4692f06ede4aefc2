#!/usr/bin/env python3
"""Convert a Record3D capture to transforms.json (reference
``scripts/record3d2nerf.py``)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngp_tpu.data.convert import record3d_to_transforms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", required=True, help="Record3D capture folder")
    ap.add_argument("--subsample", default=1, type=int)
    args = ap.parse_args()

    out = record3d_to_transforms(args.scene, args.subsample)
    path = os.path.join(args.scene, "transforms.json")
    print(f"{len(out['frames'])} frames -> {path}")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
