"""Directory-pair image scoring — pic_psnr.py / pic_mssim.py / pic_lpips.py
equivalents, merged into one module (in-process, no subprocesses needed).

Conventions preserved exactly:
- images matched as ``rgb_*.png`` listings of each directory (pic_psnr.py:10-13)
- PSNR on 0-255 values: 20·log10(255) − 10·log10(mse) (pic_psnr.py:44)
- MS-SSIM with data_range=255 on raw 0-255 images (pic_mssim.py:35-39)
- LPIPS: the reference feeds 0-255 images into lpips-alex (pic_lpips.py:34-37)
  — ``strict_parity=True`` reproduces that quirk, False feeds [-1, 1]
- difference maps written as (diff+256)/2 uint8 (pic_psnr.py:14-23)
"""

from __future__ import annotations

import os
import typing as T

import jax.numpy as jnp
import numpy as np

from ..io.image import read_png, write_png
from ..metrics import ms_ssim as _ms_ssim
from ..metrics import psnr255
from ..metrics.lpips import LPIPS, lpips_available


def get_pic_list(pic_pth: str) -> T.List[str]:
    lis = sorted(os.listdir(pic_pth))
    return [os.path.join(pic_pth, n) for n in lis if n[:4] == "rgb_"]


def _load_pairs(p1: str, p2: str):
    ls1, ls2 = get_pic_list(p1), get_pic_list(p2)
    for f1, f2 in zip(ls1, ls2):
        img1 = read_png(f1).astype(np.float32)
        img2 = read_png(f2).astype(np.float32)
        if img1.shape[0] != img2.shape[0]:
            print(f"Resizing img1 with shape {img1.shape} to img2 with shape "
                  f"{img2.shape}")
            from ..render.renderer import bilinear_resize

            img1 = np.asarray(
                bilinear_resize(
                    jnp.asarray(img1).transpose(2, 0, 1),
                    img2.shape[0], img2.shape[1],
                )
            ).transpose(1, 2, 0)
        yield f1, img1, img2


def psnr_dirs(p1: str, p2: str, diff_dir: T.Optional[str] = None) -> float:
    total, n = 0.0, 0
    for f1, img1, img2 in _load_pairs(p1, p2):
        total += float(psnr255(jnp.asarray(img1), jnp.asarray(img2)))
        n += 1
        if diff_dir:
            os.makedirs(diff_dir, exist_ok=True)
            diff = img1 - img2
            write_png(
                os.path.join(diff_dir, os.path.basename(f1)),
                ((diff + 256) / 2).astype(np.uint8),
            )
    psnr = total / max(n, 1)
    print(f"psnr between {p1} and {p2}: " + "{:06}".format(psnr))
    return psnr


def msssim_dirs(p1: str, p2: str) -> float:
    total, n = 0.0, 0
    for _, img1, img2 in _load_pairs(p1, p2):
        total += float(
            _ms_ssim(
                jnp.asarray(img1).transpose(2, 0, 1),
                jnp.asarray(img2).transpose(2, 0, 1),
                data_range=255.0,
            )
        )
        n += 1
    val = total / max(n, 1)
    print(f"MS-SSIM between {p1} and {p2}: " + "{:06}".format(val))
    return val


def lpips_dirs(p1: str, p2: str, strict_parity: bool = True,
               weights_path: T.Optional[str] = None) -> T.Optional[float]:
    from ..metrics.lpips import DEFAULT_WEIGHTS

    wp = weights_path or DEFAULT_WEIGHTS
    if not lpips_available(wp):
        print(
            f"[Warn] LPIPS SKIPPED (no weights at {wp}).\n"
            f"       Pretrained AlexNet-LPIPS weights cannot be bundled; "
            f"convert the official lpips checkpoint once with:\n"
            f"         python -m gpcr_tpu.cli.convert_lpips "
            f"/path/to/lpips_alex.pth\n"
            f"       (any `lpips.LPIPS(net='alex')` state-dict .pth works; "
            f"reads it torch-free)"
        )
        return None
    model = LPIPS.load(wp)
    total, n = 0.0, 0
    for _, img1, img2 in _load_pairs(p1, p2):
        a = jnp.asarray(img1).transpose(2, 0, 1)[None]
        b = jnp.asarray(img2).transpose(2, 0, 1)[None]
        if not strict_parity:
            a = a / 127.5 - 1.0
            b = b / 127.5 - 1.0
        total += float(model(a, b)[0])
        n += 1
    val = total / max(n, 1)
    print(f"LPIPS between {p1} and {p2}: " + "{:06}".format(val))
    return val


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("metric", choices=["psnr", "msssim", "lpips"])
    ap.add_argument("dir1")
    ap.add_argument("dir2")
    ap.add_argument("--diff_dir", default=None)
    ap.add_argument("--lpips_weights", default=None,
                    help="path to a converted lpips_alex.npz (defaults to "
                         "weights/lpips_alex.npz; see metrics.lpips."
                         "convert_lpips_pth for the torch-free converter)")
    args = ap.parse_args(argv)
    if args.metric == "psnr":
        psnr_dirs(args.dir1, args.dir2, args.diff_dir)
    elif args.metric == "msssim":
        msssim_dirs(args.dir1, args.dir2)
    else:
        lpips_dirs(args.dir1, args.dir2, weights_path=args.lpips_weights)


if __name__ == "__main__":
    main()
