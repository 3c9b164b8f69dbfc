"""Torch-free torch-zip checkpoint reading (VERDICT item 5).

- reads the REAL torch fixture shipped with the reference
  (/root/reference/validate/temp_state_dict.pt — a Camera state dict written
  by torch.save; see simple_benchmark.py:134);
- round-trips our own writer through our reader;
- converter round-trip: a reference-schema flat state dict saved as a torch
  zip loads through ``render.checkpoint.load_params`` (no torch import) and
  drives PCEncoder to the same output as natively-built params.
"""

import os

import numpy as np
import pytest

from gpcr_tpu.io.torch_zip import is_torch_zip, load_torch_zip, save_torch_zip

REF_FIXTURE = "/root/reference/validate/temp_state_dict.pt"


@pytest.mark.skipif(
    not os.path.exists(REF_FIXTURE), reason="reference fixture absent"
)
def test_load_reference_torch_fixture():
    d = load_torch_zip(REF_FIXTURE)
    assert d["H_c2w"].shape == (1, 12, 4, 4)
    assert d["H_c2w"].dtype == np.float32
    assert d["intrinsic"].shape == (1, 12, 3, 3)
    assert d["width_px"] == 512 and d["height_px"] == 512
    R = d["H_c2w"][0, :, :3, :3]
    assert np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max() < 1e-5


def test_roundtrip_writer_reader(tmp_path):
    rng = np.random.RandomState(0)
    obj = {
        "a": rng.randn(2, 3, 4).astype(np.float32),
        "b": rng.randn(5),
        "i": np.arange(7, dtype=np.int64),
        "nested": {"x": np.ones((2, 2), np.float32)},
        "s": 512,
    }
    pth = str(tmp_path / "rt.pt")
    save_torch_zip(pth, obj)
    assert is_torch_zip(pth)
    back = load_torch_zip(pth)
    assert np.allclose(back["a"], obj["a"])
    assert np.allclose(back["b"], obj["b"])
    assert (back["i"] == obj["i"]).all()
    assert np.allclose(back["nested"]["x"], 1.0)
    assert back["s"] == 512


def test_torch_cross_validation(tmp_path):
    """torch itself (cpu, available as a test oracle only) agrees with our
    reader on the reference fixture and can load our writer's output."""
    torch = pytest.importorskip("torch")
    if os.path.exists(REF_FIXTURE):
        ours = load_torch_zip(REF_FIXTURE)
        theirs = torch.load(REF_FIXTURE, map_location="cpu")
        assert np.allclose(theirs["H_c2w"].numpy(), ours["H_c2w"])
    obj = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    pth = str(tmp_path / "w.pt")
    save_torch_zip(pth, obj)
    t = torch.load(pth, map_location="cpu", weights_only=False)
    assert np.allclose(t["w"].numpy(), obj["w"])


def test_unpickler_rejects_arbitrary_globals(tmp_path):
    import io
    import pickle
    import zipfile

    buf = io.BytesIO()

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    pickle.dump({"x": Evil()}, buf)
    pth = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(pth, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
    with pytest.raises(pickle.UnpicklingError):
        load_torch_zip(pth)


def test_converter_roundtrip_drives_encoder(tmp_path):
    """Reference-schema torch zip -> load_params -> PCEncoder forward equals
    natively-initialized params (pins shapes, nesting, 1^3-kernel expansion)."""
    import jax
    import jax.numpy as jnp

    from gpcr_tpu.models.encoder import PCEncoder, PCMLInfo
    from gpcr_tpu.ops import sparse
    from gpcr_tpu.render.checkpoint import _flatten, load_params

    info = PCMLInfo(
        clr_encoder_channels="9 8 8 8 8 8", sh_deg=1, sh_feat_deg=0,
        scale_factor=96,
    )
    model = PCEncoder(info)
    params = model.init(jax.random.PRNGKey(0))

    # write as a torch-style flat state dict (1^3 kernels as (Cin, Cout),
    # the way MinkowskiEngine stores them)
    flat = {}
    for k, v in _flatten(params).items():
        v = np.asarray(v)
        if k.endswith(".kernel") and v.shape[0] == 1:
            v = v[0]
        flat[k] = v
    pth = str(tmp_path / "model.pt")
    save_torch_zip(pth, flat)

    loaded = load_params(pth, info)

    rng = np.random.RandomState(1)
    coords = jnp.asarray(
        np.unique(rng.randint(0, 32, (300, 3)), axis=0).astype(np.float32)
    )
    n = coords.shape[0]
    feats = jnp.asarray(rng.rand(n, 9).astype(np.float32))
    grid = sparse.quantize_average(coords, feats)
    plan = model.build_plan(grid)
    out_a = model.apply(params, grid, plan)
    out_b = model.apply(loaded, grid, plan)
    np.testing.assert_allclose(
        np.asarray(out_a.sh), np.asarray(out_b.sh), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_a.rotation), np.asarray(out_b.rotation), atol=1e-6
    )
