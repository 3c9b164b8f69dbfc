"""Golden-frame parity: the full CLI pipeline vs oracle-rendered fixtures.

tests/golden/ holds 12-view 512² circle renders of a 100K-point synthetic
cloud produced by the sequential numpy oracle (scripts/make_golden.py) —
i.e. the reference CUDA forward semantics at benchmark resolution, through
x2 supersampling, background compositing, bilinear downscale, and the
save_pic uint8 conventions. Any drift beyond the 0.05 dB PSNR budget in the
production path fails here.

The reference's own QA mechanism is exactly this golden-image comparison
(simple_benchmark.py:219-222, pic_psnr.py:38-52).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def golden_manifest():
    mpath = os.path.join(GOLDEN, "manifest.json")
    if not os.path.exists(mpath):
        pytest.skip("golden fixtures not generated (scripts/make_golden.py)")
    with open(mpath) as f:
        return json.load(f)


def test_fixture_integrity(golden_manifest):
    """The stored PNGs match the manifest hashes (guards fixture rot)."""
    import hashlib

    from gpcr_tpu.io.image import read_png

    for i, expect in enumerate(golden_manifest["sha256_uint8"]):
        img = read_png(os.path.join(GOLDEN, f"rgb_{i}.png"))
        assert hashlib.sha256(img.tobytes()).hexdigest() == expect, i


def test_cli_simple_matches_golden(golden_manifest, tmp_path):
    """End-to-end `cli.benchmark simple` on the fixture cloud reproduces the
    oracle frames: per-view PSNR >= 50 dB on uint8 (the 0.05 dB budget
    corresponds to ~1e-3 relative error; 50 dB is ~3e-3 mean abs — any
    semantic deviation lands far below this)."""
    from gpcr_tpu.cli import benchmark as B
    from gpcr_tpu.io.image import read_png

    m = golden_manifest
    ds = tmp_path / "ds" / "scene"
    ds.mkdir(parents=True)
    os.symlink(os.path.join(GOLDEN, "pcd_0.ply"), ds / "pcd_0.ply")
    rpth = str(tmp_path / "render") + "/"

    B.main([
        "simple", "--id_list", "scene",
        "--dataset_root", str(tmp_path / "ds"),
        "--rpth", rpth, "--skip_mesh", "--voxelized",
        "--scale_factor", str(m["scale_factor"]),
        "--fov", str(int(m["fov"])),
        "--sigma", str(m["sigma"]),
        "--background_color", "1",
    ])

    out_dir = rpth + f"scene_simple_sigma_{m['sigma']}"
    psnrs = []
    for i in range(m["n_views"]):
        got = read_png(os.path.join(out_dir, f"rgb_{i}.png")).astype(
            np.float64
        )
        ref = read_png(os.path.join(GOLDEN, f"rgb_{i}.png")).astype(
            np.float64
        )
        mse = np.mean((got - ref) ** 2)
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        psnrs.append(psnr)
    assert min(psnrs) >= 50.0, psnrs
