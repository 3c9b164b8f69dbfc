"""PCGC voxel<->world PLY conversion — ``util_rescale_ply.py`` /
``util_scale_ply.py`` equivalents (xyz-offset)/factor and inverse
(util_rescale_ply.py:8-16)."""

from __future__ import annotations

import argparse

from ..io.ply import read_ply, write_ply


def rescale(in_path: str, out_path: str, offset: float = 512.0,
            factor: float = 256.0, inverse: bool = False):
    d = read_ply(in_path)
    xyz = d["xyz"]
    if inverse:
        xyz = xyz * factor + offset  # world -> voxel (util_scale_ply)
    else:
        xyz = (xyz - offset) / factor  # voxel -> world (util_rescale_ply)
    write_ply(out_path, xyz, rgb=d.get("rgb"), normal=d.get("normal"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--offset", type=float, default=512.0)
    ap.add_argument("--factor", type=float, default=256.0)
    ap.add_argument("--inverse", action="store_true",
                    help="world -> voxel instead of voxel -> world")
    args = ap.parse_args(argv)
    rescale(args.input, args.output, args.offset, args.factor, args.inverse)


if __name__ == "__main__":
    main()
