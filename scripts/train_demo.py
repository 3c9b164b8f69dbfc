"""Training demonstration: the reconstructed trainer actually trains.

Runs the end-to-end differentiable pipeline (quantize -> SparseUNet ->
fused rasterize -> image losses, train/trainer.py) for hundreds of steps on
synthetic textured scenes (or a THuman-layout --dataset_root), reporting a
loss curve and held-out-view PSNR vs ray-cast mesh GT, with checkpoint +
resume through train/trainer.save_train_state.

The reference ships only the training CONFIG (options.yaml:113-184); this
script is the closest runnable reconstruction of its protocol, scaled to a
CPU/TPU demo (higher lr + shorter warmup than the 1e-5/4000 production
values, since the demo is a few hundred steps, not 80 epochs).

Run:  python scripts/train_demo.py --steps 500 --out /tmp/train_demo
Resume after an interrupt:  add --resume
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--out", default="/tmp/train_demo")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dataset_root", default=None,
                    help="THuman-layout tree <root>/<id>/<id>.obj "
                         "[+ pcd_0.ply]; defaults to synthetic scenes")
    ap.add_argument("--hw", type=int, default=48)
    ap.add_argument("--n_points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n_views", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--ckpt_every", type=int, default=100)
    ap.add_argument("--eval_every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: whatever JAX picks — on a "
                         "TPU host the jitted step is one dispatch/step)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from gpcr_tpu.train.data import DataLoader
    from gpcr_tpu.train.trainer import (
        Trainer, load_train_state, make_optimizer, save_train_state,
    )
    from gpcr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    os.makedirs(args.out, exist_ok=True)

    scale_factor = 96
    trainer = Trainer(
        info={
            "clr_encoder_channels": "9 16 32 48 64 32",
            "sh_deg": 1, "sh_feat_deg": 0,
            "use_rotation": True, "use_scale": True, "use_offset": True,
            "use_dc_offset": True, "use_opacity": True, "est_normal": True,
            "normalize_normal": True, "enable_opacity": True,
            "scale_factor": scale_factor, "model_type": "unet",
        },
        render_hw=(args.hw, args.hw),
        optimizer=make_optimizer(args.lr, args.warmup),
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0))

    loader = DataLoader(
        dataset_root=args.dataset_root,
        batch_size=args.batch, n_points=args.n_points,
        n_views=args.n_views, hw=args.hw, scale_factor=scale_factor,
        seed=0,
    )
    # held-out eval: a scene pool + view draw the training loader never sees
    eval_loader = DataLoader(
        dataset_root=args.dataset_root,
        batch_size=2, n_points=args.n_points, n_views=args.n_views,
        hw=args.hw, scale_factor=scale_factor, seed=777,
        synthetic_pool=2,
    )
    # rotate the synthetic eval pool away from the train pool
    if args.dataset_root is None:
        from gpcr_tpu.train.data import synthetic_scene

        eval_loader.scenes = [
            {"mesh": synthetic_scene(seed=100 + s), "coords": None,
             "rgb": None}
            for s in range(2)
        ]
    eval_batch = eval_loader.next_batch()

    ckpt = os.path.join(args.out, "train_state.npz")
    start_step = 0
    history = []
    hist_path = os.path.join(args.out, "curve.json")
    if args.resume and os.path.exists(ckpt):
        params, opt_state, start_step = load_train_state(
            ckpt, params, opt_state
        )
        if os.path.exists(hist_path):
            history = json.load(open(hist_path))
        print(f"[resume] from step {start_step}")

    step_fn = trainer.make_train_step(donate=False)
    eval_fn = trainer.make_eval_psnr()

    psnr0 = float(eval_fn(params, eval_batch))
    print(f"step {start_step:4d}  held-out PSNR {psnr0:.2f} dB")
    if start_step == 0:
        history.append({"step": 0, "psnr": psnr0})

    t0 = time.time()
    window = []
    for step in range(start_step, args.steps):
        batch = loader.next_batch()
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        loss = float(metrics["loss"])
        window.append(loss)
        rec = {"step": step + 1, "loss": loss}
        if (step + 1) % 25 == 0:
            print(
                f"step {step + 1:4d}  loss {np.mean(window):.4f}  "
                f"({(time.time() - t0) / max(step + 1 - start_step, 1):.2f}"
                f" s/step)"
            )
            window = []
        if (step + 1) % args.eval_every == 0 or step + 1 == args.steps:
            rec["psnr"] = float(eval_fn(params, eval_batch))
            print(f"step {step + 1:4d}  held-out PSNR {rec['psnr']:.2f} dB")
        history.append(rec)
        if (step + 1) % args.ckpt_every == 0 or step + 1 == args.steps:
            save_train_state(ckpt, params, opt_state, step + 1)
            json.dump(history, open(hist_path, "w"))

    psnrs = [h["psnr"] for h in history if "psnr" in h]
    losses = [h["loss"] for h in history if "loss" in h]
    k = max(len(losses) // 10, 1)
    print(
        f"\nsummary: loss {np.mean(losses[:k]):.4f} -> "
        f"{np.mean(losses[-k:]):.4f}; held-out PSNR "
        f"{psnrs[0]:.2f} -> {psnrs[-1]:.2f} dB "
        f"({'IMPROVED' if psnrs[-1] > psnrs[0] + 0.5 else 'no gain'})"
    )
    json.dump(history, open(hist_path, "w"))
    print(f"curve: {hist_path}  checkpoint: {ckpt}")


if __name__ == "__main__":
    main()
