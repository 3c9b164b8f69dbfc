"""LPIPS path proof: torch-free .pth conversion + forward parity vs torch.

No real lpips-alex weights exist in this environment (no egress, no lpips/
torchvision packages), so the pipeline is proven on synthetic weights in the
exact ``lpips.LPIPS(net='alex')`` checkpoint schema:
  1. a synthetic state dict is torch.save'd (torch IS available, cpu),
  2. converted WITHOUT torch through io/torch_zip + convert_lpips_pth,
  3. the JAX forward is cross-checked against an independent torch
     implementation of the LPIPS forward built from the same weights,
  4. the CLI scorer runs end-to-end and prints the pic_lpips.py-format line,
     and prints an explicit 'unavailable' line when weights are absent.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gpcr_tpu.metrics import lpips as L


def synthetic_lpips_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    conv_idx = [0, 3, 6, 8, 10]
    for i, (o, c, k, s, p) in enumerate(L._ALEX_CONVS):
        w = (rng.randn(o, c, k, k) * (2.0 / (c * k * k)) ** 0.5).astype(
            np.float32
        )
        b = (rng.randn(o) * 0.01).astype(np.float32)
        sd[f"net.slice{i+1}.{conv_idx[i]}.weight"] = torch.tensor(w)
        sd[f"net.slice{i+1}.{conv_idx[i]}.bias"] = torch.tensor(b)
        lin = np.abs(rng.randn(1, o, 1, 1)).astype(np.float32) * 0.1
        sd[f"lins.{i}.model.1.weight"] = torch.tensor(lin)
    return sd


def torch_lpips_forward(sd, x1, x2):
    """Independent torch implementation of the lpips-alex forward."""
    import torch.nn.functional as F

    shift = torch.tensor(L._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(L._SCALE).view(1, 3, 1, 1)
    conv_idx = [0, 3, 6, 8, 10]

    def feats(x):
        x = (x - shift) / scale
        taps = []
        for i, (o, c, k, s, p) in enumerate(L._ALEX_CONVS):
            w = sd[f"net.slice{i+1}.{conv_idx[i]}.weight"]
            b = sd[f"net.slice{i+1}.{conv_idx[i]}.bias"]
            x = F.conv2d(x, w, b, stride=s, padding=p)
            x = F.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return taps

    f1, f2 = feats(x1), feats(x2)
    total = torch.zeros(x1.shape[0])
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / torch.sqrt((a**2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b**2).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = sd[f"lins.{i}.model.1.weight"].view(1, -1, 1, 1)
        total = total + (d * lin).sum(1).mean((-2, -1))
    return total


def test_torch_free_conversion_and_forward_parity(tmp_path):
    sd = synthetic_lpips_state_dict()
    pth = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, pth)

    out = str(tmp_path / "lpips_alex.npz")
    L.convert_lpips_pth(pth, out)  # no torch import inside
    model = L.LPIPS.load(out)

    rng = np.random.RandomState(1)
    a = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    b = rng.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    got = np.asarray(model(a, b))
    want = torch_lpips_forward(sd, torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # identical images score ~0
    assert float(np.asarray(model(a, a)).max()) < 1e-6


def test_lpips_dirs_end_to_end(tmp_path, capsys):
    from gpcr_tpu.cli import pic_metrics
    from gpcr_tpu.io.image import write_png

    sd = synthetic_lpips_state_dict()
    pth = str(tmp_path / "w.pth")
    torch.save(sd, pth)
    wpath = str(tmp_path / "w.npz")
    L.convert_lpips_pth(pth, wpath)

    rng = np.random.RandomState(2)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    for i in range(2):
        img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        write_png(str(d1 / f"rgb_{i}.png"), img)
        noisy = np.clip(
            img.astype(np.int32) + rng.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        write_png(str(d2 / f"rgb_{i}.png"), noisy)

    val = pic_metrics.lpips_dirs(str(d1), str(d2), weights_path=wpath)
    out = capsys.readouterr().out
    assert val is not None and np.isfinite(val)
    assert "LPIPS between" in out  # the pic_lpips.py print format

    # no weights -> explicit skip line, never silent
    missing = str(tmp_path / "none.npz")
    val2 = pic_metrics.lpips_dirs(str(d1), str(d2), weights_path=missing)
    out2 = capsys.readouterr().out
    assert val2 is None and "SKIPPED" in out2


def test_convert_lpips_cli(tmp_path, capsys):
    """The one-command converter CLI: .pth in, validated npz out."""
    from gpcr_tpu.cli import convert_lpips as cli

    sd = synthetic_lpips_state_dict()
    pth = str(tmp_path / "lpips_alex.pth")
    torch.save(sd, pth)
    out = str(tmp_path / "w.npz")
    cli.main([pth, "--out", out])
    assert L.lpips_available(out)
    assert "lpips_available() is now True" in capsys.readouterr().out
