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
    # reachable target: the render of a DIFFERENTLY-seeded model — the
    # losses can actually be driven down (zero-normal GT is unfittable by
    # unit-normalized predictions and made this test flaky)
    tgt_params = trainer.model.init(jax.random.PRNGKey(7))
    tgt = trainer._per_cloud_render(
        tgt_params, coords, rgb, jnp.ones((n,), bool),
        view_t, full_t, campos, jnp.float32(tanfov),
    )
    batch = {
        "coords": coords[None], "rgb": rgb[None],
        "valid": jnp.ones((1, n), bool),
        "view_t": view_t[None], "full_t": full_t[None],
        "campos": campos[None],
        "gt_rgb": tgt["rgb"][None],
        "gt_normal": tgt["normal"][None],
        "gt_hit": tgt["hitmap"][None, ..., :1],
        "tanfov": jnp.float32(tanfov),
    }
    step = trainer.make_train_step(donate=False)
    losses = []
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < losses[0], losses


@pytest.mark.smoke
def test_grads_finite_with_padding_rows():
    """Regression: a batch whose clouds have PADDING rows (valid=False)
    must yield finite gradients — d||n||/dn at the zero padding rows used
    to poison the final conv's grads with NaN through normalize_normal."""
    import jax
    import jax.numpy as jnp

    from gpcr_tpu.train.data import DataLoader
    from gpcr_tpu.train.trainer import Trainer, make_optimizer

    trainer = Trainer(
        info={
            "clr_encoder_channels": "9 8 8 8 8 8", "sh_deg": 1,
            "sh_feat_deg": 0, "use_rotation": True, "use_scale": True,
            "use_offset": True, "use_dc_offset": True, "use_opacity": True,
            "est_normal": True, "normalize_normal": True,
            "enable_opacity": True, "scale_factor": 96,
            "model_type": "unet",
        },
        render_hw=(24, 24), optimizer=make_optimizer(1e-3, 10),
    )
    params, _ = trainer.init(jax.random.PRNGKey(0))
    dl = DataLoader(batch_size=1, n_points=512, n_views=1, hw=24, seed=0,
                    synthetic_pool=1)
    batch = dl.next_batch()
    assert not bool(batch["valid"].all()), "fixture must include padding"
    (_, _), grads = jax.jit(
        jax.value_and_grad(trainer.loss_fn, has_aux=True)
    )(params, batch)
    bad = sum(
        int(jnp.isnan(l).sum() + jnp.isinf(l).sum())
        for l in jax.tree_util.tree_leaves(grads)
    )
    assert bad == 0, f"{bad} non-finite gradient elements"
