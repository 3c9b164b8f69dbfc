"""pcrender end-to-end scoreboard at the BASELINE configs, through the
real CLI surface (random weights — weights are absent in this environment;
the reference's 'model time / rgb time' protocol doesn't depend on them).

Builds a deployed-config checkpoint + an 800K THuman-like ply, then runs
`python -m gpcr_tpu.cli.benchmark pcrender --skip_mesh ...` and reports the
scoreboard lines (simple_raw_render.py:372-379,433-456 protocol).
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import yaml

    import jax

    from gpcr_tpu.io.ply import write_ply
    from gpcr_tpu.models.encoder import PCEncoder, PCMLInfo
    from gpcr_tpu.render import checkpoint as CK

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    extra = [a for a in sys.argv[1:] if a.startswith("--")]
    n = int(argv[0]) if len(argv) > 0 else 800_000
    sf = int(argv[1]) if len(argv) > 1 else 448

    root = tempfile.mkdtemp(prefix="pcrender_bench_")
    info_dict = {
        "clr_encoder_channels": "9 32 64 128 256 128",
        "sh_deg": 1, "sh_feat_deg": 0,
        "use_rotation": True, "use_scale": True, "use_offset": True,
        "use_dc_offset": False, "use_opacity": False, "est_normal": True,
        "normalize_normal": True, "enable_opacity": True,
        "scale_factor": sf, "model_type": "unet",
    }
    run = os.path.join(root, "train")
    os.makedirs(os.path.join(run, "option"))
    os.makedirs(os.path.join(run, "checkpoint"))
    with open(os.path.join(run, "option", "options.yaml"), "w") as f:
        yaml.safe_dump({"pcml_info": info_dict}, f)
    enc = PCEncoder(PCMLInfo.from_dict(info_dict))
    params = enc.init(jax.random.PRNGKey(0))
    ckpt = os.path.join(run, "checkpoint", "model_epoch1.npz")
    CK.save_params(ckpt, params)

    rng = np.random.RandomState(0)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = v + rng.randn(n, 3) * 0.002
    coords = np.clip(xyz * sf + 512, 0, 1023).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)
    ds = os.path.join(root, "ds", "0519")
    os.makedirs(ds)
    write_ply(os.path.join(ds, "pcd_0.ply"), coords, rgb)

    cmd = [
        sys.executable, "-m", "gpcr_tpu.cli.benchmark", "pcrender",
        "--ckpt", ckpt, "--id_list", "0519",
        "--dataset_root", os.path.join(root, "ds"),
        "--rpth", os.path.join(root, "out") + "/",
        "--skip_mesh", "--voxelized",
        "--scale_factor", str(sf), "--fov", "45",
    ] + extra
    print("running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    for line in r.stdout.splitlines():
        if ("time" in line or "Info" in line or "Warn" in line
                or line.startswith("#")):
            print(line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)
    outdir = os.path.join(root, "out")
    print("outputs:", sorted(os.listdir(outdir)))


if __name__ == "__main__":
    main()
