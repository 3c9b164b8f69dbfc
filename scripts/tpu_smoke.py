"""TPU smoke test — runs on the REAL device (not under the CPU-forcing test
conftest): renders a small scene on the TPU and on CPU, checks parity, and
asserts the timing sync actually blocks (jax.block_until_ready is a no-op on
the axon platform — utils/timing.sync must provide the barrier).

Run:  python scripts/tpu_smoke.py     (exit 0 = pass)
The driver's bench env runs this class of check; the CPU test suite cannot
catch platform-specific regressions (matmul precision, layout, Pallas
lowering) that this does.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def subprocess_env(platform: str) -> dict:
    """Env for a subprocess pinned to `platform`.

    Under the pytest conftest the parent process forces JAX_PLATFORMS=cpu +
    a virtual 8-device CPU mesh; a TPU subprocess must strip both (the axon
    plugin ignores JAX_PLATFORMS, but the host-device-count flag would
    still fork virtual CPU devices)."""
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("JAX_PLATFORMS", None)
        flags = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = " ".join(
            f for f in flags.split()
            if "host_platform_device_count" not in f
        )
    return env


def render_small(platform: str, use_stream: bool):
    """Render in a subprocess pinned to `platform`; returns (rgb, ms)."""
    code = f"""
import sys, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
{'jax.config.update("jax_platforms", "cpu")' if platform == 'cpu' else ''}
import numpy as np
import jax.numpy as jnp
import time
from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.utils.timing import sync

rng = np.random.RandomState(0)
n = 5000
means = jnp.asarray(rng.randn(n, 3) * 0.3 + np.array([0, 0, 2.5]), jnp.float32)
scales = jnp.asarray(rng.rand(n, 3) * 0.05 + 0.01, jnp.float32)
rots = jnp.asarray(rng.randn(n, 4), jnp.float32)
op = jnp.asarray(rng.rand(n), jnp.float32)
feats = jnp.asarray(rng.rand(n, 3), jnp.float32)

view = jnp.eye(4)
P = np.zeros((4, 4), np.float32)
P[0, 0] = P[1, 1] = 1.0
P[3, 2] = 1.0
P[2, 2] = 100.0 / (100.0 - 0.01)
P[2, 3] = -(100.0 * 0.01) / (100.0 - 0.01)
settings = R.GaussianRasterizationSettings(
    image_height=128, image_width=128, tanfovx=1.0, tanfovy=1.0,
    bg=jnp.full((3,), 0.5), scale_modifier=1.0,
    viewmatrix=view, projmatrix=jnp.asarray(P.T), sh_degree=0,
    campos=jnp.zeros(3),
)
config = R.RasterizeConfig(
    max_dup_per_gaussian=16, chunk_size=64,
    impl={"'stream'" if use_stream else "'xla'"},
)
import functools
fn = jax.jit(functools.partial(
    R.rasterize_gaussians, settings=settings, config=config))
out, _ = fn(means, op, scales=scales, rotations=rots, colors_precomp=feats)
sync(out)
t0 = time.perf_counter()
out, _ = fn(means, op, scales=scales, rotations=rots, colors_precomp=feats)
sync(out)
ms = (time.perf_counter() - t0) * 1e3
np.save("/tmp/smoke_{platform}_{int(use_stream)}.npy", np.asarray(out))
print(json.dumps(dict(ms=ms, platform=str(jax.devices()[0]))))
"""
    # generous timeout: the XLA-blend compile is ~2 min unloaded but has
    # been observed >15 min when the host CPU is saturated by concurrent
    # jobs (XLA compiles host-side; the persistent cache makes reruns fast)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=2400, env=subprocess_env(platform))
    if r.returncode != 0:
        raise RuntimeError(f"{platform} render failed:\n{r.stderr[-2000:]}")
    import json

    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    meta = json.loads(line)
    rgb = np.load(f"/tmp/smoke_{platform}_{int(use_stream)}.npy")
    return rgb, meta


def main():
    # Cross-platform f32 tolerance: preprocess agrees to ~1.5e-5 (verified:
    # projection matmuls are precision-pinned), but exp() differs at ~1 ulp
    # between the TPU VPU and the CPU libm and compounds through tens of
    # composited alpha factors — measured image drift ~5e-4, invisible at
    # uint8 (0.13/255) and worth ~66 dB, far inside the 0.05 dB budget.
    tol = 2e-3
    cpu_xla, _ = render_small("cpu", use_stream=False)
    tpu_xla, meta = render_small("tpu", use_stream=False)
    assert "TPU" in meta["platform"], f"not on TPU: {meta['platform']}"
    err = float(np.abs(cpu_xla - tpu_xla).max())
    print(f"TPU xla-path vs CPU: max_err={err:.2e} (device {meta['platform']})")
    assert err < tol, err
    u8 = np.abs(
        np.clip(cpu_xla * 255, 0, 255).round()
        - np.clip(tpu_xla * 255, 0, 255).round()
    )
    assert u8.max() <= 1 and (u8 > 0).mean() < 0.01, (
        u8.max(), float((u8 > 0).mean())
    )
    print(f"uint8 parity: max_delta={int(u8.max())} "
          f"frac_nonzero={float((u8 > 0).mean()):.4f}")

    tpu_stream, meta2 = render_small("tpu", use_stream=True)
    err2 = float(np.abs(cpu_xla - tpu_stream).max())
    print(f"TPU stream-path (Pallas kernel) vs CPU: max_err={err2:.2e}")
    assert err2 < tol, err2

    # the sync must be a real barrier: a second timed run of a heavy op must
    # cost milliseconds, not microseconds (dispatch-only would be ~0)
    assert meta["ms"] > 1.0, f"sync did not block ({meta['ms']} ms)"
    print(f"timing sync blocks: {meta['ms']:.1f} ms for the timed render")
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()


def grad_small(platform: str):
    """One differentiable fwd+bwd step in a subprocess pinned to
    `platform`. On TPU this exercises the custom_vjp replay-kernel
    backward (ops/rasterize_stream_vjp.py — impl='stream' routes to it
    on real hardware); on CPU the XLA differentiable-scan oracle.
    Returns dict(loss=float, gmeans=..., gscales=..., gops=...)."""
    out_pth = f"/tmp/smoke_grad_{platform}.npz"
    code = f"""
import sys, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
{'jax.config.update("jax_platforms", "cpu")' if platform == 'cpu' else ''}
import numpy as np
import jax.numpy as jnp
import functools
from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.utils.timing import sync

rng = np.random.RandomState(1)
n = 3000
means = jnp.asarray(rng.randn(n, 3) * 0.3 + np.array([0, 0, 2.5]), jnp.float32)
scales = jnp.asarray(rng.rand(n, 3) * 0.05 + 0.01, jnp.float32)
rots = jnp.asarray(rng.randn(n, 4), jnp.float32)
op = jnp.asarray(rng.rand(n), jnp.float32)
feats = jnp.asarray(rng.rand(n, 3), jnp.float32)

view = jnp.eye(4)
P = np.zeros((4, 4), np.float32)
P[0, 0] = P[1, 1] = 1.0
P[3, 2] = 1.0
P[2, 2] = 100.0 / (100.0 - 0.01)
P[2, 3] = -(100.0 * 0.01) / (100.0 - 0.01)
settings = R.GaussianRasterizationSettings(
    image_height=128, image_width=128, tanfovx=1.0, tanfovy=1.0,
    bg=jnp.full((3,), 0.5), scale_modifier=1.0,
    viewmatrix=view, projmatrix=jnp.asarray(P.T), sh_degree=0,
    campos=jnp.zeros(3),
)
config = R.RasterizeConfig(
    max_dup_per_gaussian=16, chunk_size=64, differentiable=True,
    impl={"'stream'" if platform != 'cpu' else "'xla'"},
)

def loss_fn(means, scales, op):
    out, _ = R.rasterize_gaussians(
        means, op, settings=settings, config=config,
        scales=scales, rotations=rots, colors_precomp=feats)
    return jnp.sum(out * out)

val, (gm, gs, go) = jax.jit(
    jax.value_and_grad(loss_fn, argnums=(0, 1, 2)))(means, scales, op)
sync((val, gm))
np.savez({out_pth!r}, loss=np.asarray(val), gmeans=np.asarray(gm),
         gscales=np.asarray(gs), gops=np.asarray(go))
print(json.dumps(dict(platform=str(jax.devices()[0]))))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=2400, env=subprocess_env(platform))
    if r.returncode != 0:
        raise RuntimeError(f"{platform} grad failed:\n{r.stderr[-2000:]}")
    import json

    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    meta = json.loads(line)
    data = dict(np.load(out_pth))
    data["platform"] = meta["platform"]
    return data
