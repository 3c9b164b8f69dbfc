"""Pipeline orchestration helpers — the ``bash.py`` + ``diff_pic.py``
equivalent surface.

The reference chains its tools through subprocesses (bash.py:1-104); here
the same steps are direct in-process calls (rescale, metric scoring,
difference maps) so a whole evaluation pipeline is one python function. The
pointersect inference step referenced by bash.py:45-55 targets the external
apple/ml-pointersect CLI, which the reference itself does not vendor; it is
intentionally not reproduced.
"""

from __future__ import annotations

import os
import typing as T

import numpy as np

from ..io.image import write_png
from . import pic_metrics, rescale_ply


def rescale_run(input, output, factor, input_offset=0.0, offset=512,
                show=False):
    """Voxel -> world rescale step (bash.py:2-15)."""
    if show:
        print(f"rescale {input} -> {output} factor={factor} offset={offset}")
    rescale_ply.rescale(input, output, offset=offset, factor=factor)


def scale_run(input, output, factor, show=False):
    """World -> voxel scale step (bash.py:17-27)."""
    if show:
        print(f"scale {input} -> {output} factor={factor}")
    rescale_ply.rescale(input, output, offset=0.0, factor=factor, inverse=True)


def psnr_run(p1, p2, show=False):
    """(simple_benchmark.py:27-34, in-process)"""
    return pic_metrics.psnr_dirs(p1, p2)


def msssim_run(p1, p2, show=False):
    return pic_metrics.msssim_dirs(p1, p2)


def lpips_run(p1, p2, show=False):
    return pic_metrics.lpips_dirs(p1, p2)


def save_difference_map(gt_rgb, rgb, save_pth: str):
    """(gt − render + 1)·128 difference images (diff_pic.py)."""
    os.makedirs(os.path.join(save_pth, "diff"), exist_ok=True)
    gt_rgb = np.asarray(gt_rgb)
    rgb = np.asarray(rgb)
    b, q = gt_rgb.shape[:2]
    for ib in range(b):
        for iq in range(q):
            img = np.clip((gt_rgb[ib, iq] - rgb[ib, iq] + 1.0) * 128.0, 0, 255)
            write_png(
                os.path.join(save_pth, "diff", f"rgb_{iq}.png"),
                img.astype(np.uint8),
            )


def evaluate_pair(render_dir: str, gt_dir: str) -> T.Dict[str, T.Optional[float]]:
    """Score one render/gt directory pair with all three metrics."""
    return {
        "psnr": pic_metrics.psnr_dirs(render_dir, gt_dir),
        "ms_ssim": pic_metrics.msssim_dirs(render_dir, gt_dir),
        "lpips": pic_metrics.lpips_dirs(render_dir, gt_dir),
    }
