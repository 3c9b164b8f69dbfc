"""Sharded training step + graft entry points on the 8-device CPU mesh."""

import pytest
import numpy as np


@pytest.mark.smoke
def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 3
    assert np.all(np.isfinite(np.asarray(out)))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.smoke
def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_train_step_decreases_loss():
    """A few steps on one tiny scene should reduce the loss."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from gpcr_tpu.train.trainer import Trainer, make_optimizer

    hw = 16
    trainer = Trainer(
        info={
            "clr_encoder_channels": "9 8 8 8 8 8",
            "sh_deg": 1, "sh_feat_deg": 0,
            "use_rotation": True, "use_scale": True, "use_offset": True,
            "use_dc_offset": False, "use_opacity": False, "est_normal": True,
            "normalize_normal": True, "enable_opacity": True,
            "scale_factor": 96, "model_type": "unet",
        },
        render_hw=(hw, hw),
        optimizer=make_optimizer(learning_rate=3e-3, num_warmup_steps=1),
    )
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    coords, rgb, view_t, full_t, campos, tanfov = ge._tiny_scene(
        n_points=128, n_views=1, hw=hw
    )
    n = coords.shape[0]
    # self-consistent target: render the initial params' output as gt
    batch = {
        "coords": coords[None], "rgb": rgb[None],
        "valid": jnp.ones((1, n), bool),
        "view_t": view_t[None], "full_t": full_t[None],
        "campos": campos[None],
        "gt_rgb": jnp.broadcast_to(rgb.mean() + jnp.zeros((hw, hw, 3)),
                                   (1, 1, hw, hw, 3)),
        "gt_normal": jnp.zeros((1, 1, hw, hw, 3)),
        "gt_hit": jnp.ones((1, 1, hw, hw, 1)),
        "tanfov": jnp.float32(tanfov),
    }
    step = trainer.make_train_step(donate=False)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
