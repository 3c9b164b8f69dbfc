"""Training CLI — the trainer the reference ships only config for.

    python -m gpcr_tpu.cli.train --steps 1000 --batch_size 2 \
        --dataset_root ./example/THuman-256  # or omit for synthetic scenes

Checkpoints go through orbax (params + optimizer state + step), resumable
with --resume. Multi-device: data parallel over the 'dp' mesh axis and
views over 'sp' (see gpcr_tpu.parallel).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--n_points", type=int, default=4096)
    ap.add_argument("--n_views", type=int, default=2)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--scale_factor", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--warmup", type=int, default=4000)
    ap.add_argument("--dataset_root", type=str, default="")
    ap.add_argument("--out_dir", type=str, default="runs/train")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save_every", type=int, default=200)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--channels", type=str, default="9 16 32 64 64 32")
    ap.add_argument("--sp", type=int, default=1, help="view-parallel size")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from gpcr_tpu.parallel.sharding import make_mesh, replicate, shard_batch
    from gpcr_tpu.train.data import DataLoader
    from gpcr_tpu.train.trainer import Trainer, make_optimizer

    mesh_paths = None
    if args.dataset_root:
        mesh_paths = []
        for d in sorted(os.listdir(args.dataset_root)):
            obj = os.path.join(args.dataset_root, d, f"{d}.obj")
            if os.path.exists(obj):
                mesh_paths.append(obj)

    trainer = Trainer(
        info={
            "clr_encoder_channels": args.channels,
            "sh_deg": 1, "sh_feat_deg": 0,
            "use_rotation": True, "use_scale": True, "use_offset": True,
            "use_dc_offset": False, "use_opacity": False, "est_normal": True,
            "normalize_normal": True, "enable_opacity": True,
            "scale_factor": args.scale_factor, "model_type": "unet",
        },
        render_hw=(args.hw, args.hw),
        optimizer=make_optimizer(args.lr, args.warmup),
    )
    loader = DataLoader(
        mesh_paths=mesh_paths, batch_size=args.batch_size,
        n_points=args.n_points, n_views=args.n_views, hw=args.hw,
        scale_factor=args.scale_factor,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_dir = os.path.abspath(os.path.join(args.out_dir, "checkpoint"))
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=3)
    )

    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    start_step = 0
    if args.resume and mngr.latest_step() is not None:
        start_step = mngr.latest_step()
        restored = mngr.restore(start_step)
        params, opt_state = restored["params"], restored["opt_state"]
        print(f"[resume] step {start_step}")

    mesh = make_mesh(sp=args.sp)
    with mesh:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        step_fn = trainer.make_train_step(donate=False)

        t0 = time.time()
        for step in range(start_step, args.steps):
            batch = loader.next_batch()
            sharded = shard_batch(
                {k: v for k, v in batch.items() if k != "tanfov"}, mesh
            )
            sharded["tanfov"] = batch["tanfov"]
            params, opt_state, metrics = step_fn(params, opt_state, sharded)
            if (step + 1) % args.log_every == 0:
                m = {k: float(np.asarray(v)) for k, v in metrics.items()}
                dt = (time.time() - t0) / args.log_every
                t0 = time.time()
                print(
                    f"step {step + 1}: loss={m['loss']:.5f} "
                    + " ".join(f"{k}={v:.5f}" for k, v in m.items() if k != "loss")
                    + f" ({dt:.2f} s/step)",
                    flush=True,
                )
            if (step + 1) % args.save_every == 0 or step + 1 == args.steps:
                mngr.save(
                    step + 1,
                    args=ocp.args.StandardSave(
                        {"params": params, "opt_state": opt_state}
                    ),
                )
    mngr.wait_until_finished()
    print(f"[done] {args.steps} steps; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
