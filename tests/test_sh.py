"""SH evaluation vs the reference implementation (loaded from
/root/reference/models/sh_utils.py as a torch oracle — no code copied)."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest

from gpcr_tpu.utils import sh as jsh


def _load_reference_sh():
    spec = importlib.util.spec_from_file_location(
        "ref_sh_utils", "/root/reference/models/sh_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_sh():
    return _load_reference_sh()


def test_constants(ref_sh):
    assert np.isclose(jsh.C0, ref_sh.C0)
    assert np.isclose(jsh.C1, ref_sh.C1)
    np.testing.assert_allclose(np.array(jsh.C2), np.array(ref_sh.C2))
    np.testing.assert_allclose(np.array(jsh.C3), np.array(ref_sh.C3))
    np.testing.assert_allclose(np.array(jsh.C4), np.array(ref_sh.C4))


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(ref_sh, deg):
    import torch

    rng = np.random.RandomState(deg)
    n, c = 64, 3
    k = (deg + 1) ** 2
    sh = rng.randn(n, c, k).astype(np.float32)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    ref = ref_sh.eval_sh(deg, torch.from_numpy(sh), torch.from_numpy(dirs)).numpy()
    got = np.asarray(jsh.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_rgb_sh_roundtrip(ref_sh):
    import torch

    rgb = np.random.RandomState(0).rand(32, 3).astype(np.float32)
    ref = ref_sh.RGB2SH(torch.from_numpy(rgb)).numpy()
    got = np.asarray(jsh.RGB2SH(jnp.asarray(rgb)))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    back = np.asarray(jsh.SH2RGB(jnp.asarray(got)))
    np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-6)


def test_sh_dim_num():
    for d in range(5):
        assert jsh.sh_dim_num(d) == (d + 1) ** 2
