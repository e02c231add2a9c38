"""End-to-end train-step tests for all three model families on the virtual
CPU mesh, at reduced resolution to keep single-core compile times sane.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shineon_tpu.parallel.mesh import data_sharding, make_mesh, replicated_sharding

# compile-dominated mesh/oracle tests: run with `pytest -m heavy`
pytestmark = pytest.mark.heavy


def _base_opt(**kw):
    base = dict(
        model="warp", dataset="viton", datamode="train", is_train=True,
        person_inputs=["agnostic", "cocopose"], cloth_inputs=["cloth"],
        # warp's regression tower needs feature maps >= 8x6 -> fine >= 128x96
        fine_height=128, fine_width=96, radius=3, val_fraction=0.1,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=False,
        lr=1e-4, keep_epochs=5, decay_epochs=5, accumulated_batches=1,
        batch_size=8, workers=0, no_shuffle=False, grid_size=3,
        limit_train_batches="1.0", limit_val_batches="1.0",
        ngf=16, self_attn=False, num_attn=2, activation=None, precision=32,
        tryon_list=None, warp_cloth_dir=None, pen_flow_mask=1.0,
        display_count=200, save_count=10000, experiments_dir="/tmp/exp",
        name="t", checkpoint="", fast_dev_run=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _raw_image_batch(opt, batch, frames=None, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    H, W = opt.fine_height, opt.fine_width
    lead = (batch,) if frames is None else (batch, frames)

    def u8(*tail):
        return rng.randint(0, 255, lead + tail).astype(np.uint8)

    raw = {
        "image_u8": u8(H, W, 3),
        "prev_image_u8": u8(H, W, 3),
        "prev_image_valid": np.ones(lead, np.float32),
        "cloth_u8": u8(H, W, 3),
        "parse_u8": rng.randint(0, 20, lead + (H, W)).astype(np.uint8),
    }
    if "cocopose" in opt.person_inputs:
        raw["cocopose_kp"] = rng.rand(*lead, 18, 3).astype(np.float32) * 40
    if "densepose" in opt.person_inputs:
        raw["densepose_u8"] = u8(H, W, 3)
        raw["densepose_valid"] = np.ones(lead, np.float32)
    if opt.flow_warp or "flow" in opt.person_inputs:
        raw["flow_raw"] = rng.randn(*lead, H, W, 2).astype(np.float32)
        raw["flow_valid"] = np.ones(lead, np.float32)
    if opt.model == "warp":
        raw["grid_vis_u8"] = u8(H, W, 3)
    return raw


def _shard(raw, mesh):
    sharding = data_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in raw.items()}


def test_warp_train_step_on_mesh():
    from shineon_tpu.models.warp_model import WarpModel

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    opt = _base_opt()
    model = WarpModel(opt)
    state = model.init_state(jax.random.PRNGKey(0), steps_per_epoch=4)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = model.make_train_step()
    batch = _shard(_raw_image_batch(opt, 8), mesh)

    # snapshot before stepping: the train step donates the state buffers
    params_before = jax.tree_util.tree_map(np.asarray, state.nets["gmm"].params)
    state1, metrics = step(state, batch)
    loss0 = float(metrics["loss/G"])
    assert np.isfinite(loss0)
    assert int(jax.device_get(state1.step)) == 1
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - b, state1.nets["gmm"].params, params_before
        ),
        0.0,
    )
    assert delta > 0

    # val step runs in eval mode and returns checkpoint_on
    val = model.make_val_step()(state1, batch)
    assert np.isfinite(float(val["checkpoint_on"]))


def test_warp_loss_decreases_on_fixed_batch():
    from shineon_tpu.models.warp_model import WarpModel

    mesh = make_mesh()
    opt = _base_opt(lr=5e-4)
    model = WarpModel(opt)
    state = model.init_state(jax.random.PRNGKey(1), steps_per_epoch=100)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = model.make_train_step()
    batch = _shard(_raw_image_batch(opt, 8), mesh)
    first = None
    for i in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss/G"])
    assert float(metrics["loss/G"]) < first


def test_unet_mask_train_step_single_frame():
    from shineon_tpu.models.unet_mask_model import UnetMaskModel

    mesh = make_mesh()
    opt = _base_opt(
        model="unet_mask", person_inputs=["agnostic", "densepose"], num_attn=0,
        fine_height=64, fine_width=64,
    )
    model = UnetMaskModel(opt)
    state = model.init_state(jax.random.PRNGKey(2), steps_per_epoch=4)
    state = jax.device_put(state, replicated_sharding(mesh))
    step = model.make_train_step()
    batch = _shard(_raw_image_batch(opt, 8), mesh)
    state1, metrics = step(state, batch)
    for key in ("loss/G", "loss/G/l1", "loss/G/vgg", "loss/G/tryon_mask_l1"):
        assert np.isfinite(float(metrics[key])), key


def test_unet_mask_flow_warp_frames():
    # single-device on purpose: this is the heaviest CPU test and the 8-way
    # oversubscribed virtual mesh occasionally trips XLA:CPU's collective
    # rendezvous timeout (hard abort); mesh coverage lives in the warp/SAMS
    # mesh tests
    from shineon_tpu.models.unet_mask_model import UnetMaskModel

    opt = _base_opt(
        model="unet_mask", person_inputs=["agnostic", "densepose"],
        flow_warp=True, n_frames_total=3, n_frames_now=3, num_attn=0,
        fine_height=64, fine_width=64, batch_size=4,
    )
    model = UnetMaskModel(opt)
    state = model.init_state(jax.random.PRNGKey(3), steps_per_epoch=4)
    batch = {k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 4, frames=3).items()}
    # forward shapes: 5*n output channels split into rendered/mask/flow-mask
    feats = model.features(batch)
    p_r, t_m, p_t, f_m = model.forward(
        state.nets["unet"].params, feats, train=False
    )
    assert p_r.shape[-1] == 9 and t_m.shape[-1] == 3
    assert p_t.shape[-1] == 9 and f_m.shape[-1] == 3
    state1, metrics = model.make_train_step()(state, batch)
    assert np.isfinite(float(metrics["loss/G"]))
    assert "loss/G/l1_prev" in metrics


def _sams_opt_tiny(**kw):
    base = _base_opt(
        model="sams", dataset="vvt",
        person_inputs=["agnostic", "densepose", "flow"],
        flow_warp=True, n_frames_total=3, n_frames_now=3,
        fine_height=32, fine_width=24,
        encoder_input="flow", activation="relu",
        norm_G="spectralspadesyncbatch3x3", ngf_base=2, ngf_pow_outer=3,
        ngf_pow_inner=5, ngf_pow_step=1, num_middle=1,
        attention_middle_indices=(), attention_decoder_indices=(),
        init_type="xavier", init_variance=0.02,
        num_D=2, ndf=8, n_layers_D=4, norm_D="spectralinstance",
        gan_mode="hinge", lr_D=3e-4, no_ganFeat_loss=False,
        wt_l1=1.0, wt_vgg=1.0, wt_multiscale=1.0, wt_temporal=1.0,
        batch_size=8,
    )
    base.__dict__.update(kw)
    return base


def test_sams_progressive_masking():
    """n_frames_now < n_frames_total: early frames must stay zero in the
    generated buffer and be zero-masked for the temporal D."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(n_frames_now=2)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(4), steps_per_epoch=4)
    batch = {
        k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()
    }
    feats = model.features(batch)
    fake, _, buffer, _ = model.generate_n_frames(
        state.nets["generator"].params, state.nets["generator"].stats,
        feats, train=False,
    )
    buffer = np.asarray(buffer)
    assert np.all(buffer[:, 0] == 0)  # frame 0 not generated
    assert np.abs(buffer[:, 1]).max() > 0
    np.testing.assert_array_equal(np.asarray(fake), buffer[:, 2])
    masked = np.asarray(model.mask_unused_frames(feats["image"]))
    assert np.all(masked[:, 0] == 0) and np.abs(masked[:, 1:]).max() > 0


def test_sams_train_step_updates_all_three_nets():
    from shineon_tpu.models.sams_model import SamsModel

    mesh = make_mesh()
    opt = _sams_opt_tiny()
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(5), steps_per_epoch=4)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = _shard(_raw_image_batch(opt, 8, frames=3), mesh)
    params_before = {
        net: jax.tree_util.tree_map(np.asarray, state.nets[net].params)
        for net in ("generator", "d_multi", "d_temporal")
    }  # the train step donates the state buffers
    state1, metrics = model.make_train_step()(state, batch)
    for key in ("loss", "loss/G/adv_multiscale", "loss/G/adv_temporal",
                "loss/D/multi", "loss/D/temporal"):
        assert np.isfinite(float(metrics[key])), key
    for net in ("generator", "d_multi", "d_temporal"):
        delta = jax.tree_util.tree_reduce(
            lambda acc, x: acc + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(
                lambda a, b: np.asarray(a) - b,
                state1.nets[net].params, params_before[net],
            ),
            0.0,
        )
        assert delta > 0, f"{net} params did not update"

    val = model.make_val_step()(state1, batch)
    assert np.isfinite(float(val["checkpoint_on"]))


def test_sams_train_step_on_2d_mesh_data_x_space():
    """dp x sp mesh: batch over 'data', image height over 'space' — GSPMD
    inserts the conv halo exchanges. Generated frames must match the
    replicated run to reduction-order noise, and the fused train step must
    produce finite losses.

    (Losses themselves are NOT compared tightly: at random init the
    autoregressive magnitudes are large, so ~1e-6 relative reduction-order
    differences get amplified through the GAN losses.)"""
    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.parallel.mesh import (
        make_mesh_2d,
        replicated_sharding,
        shard_batch_spatial,
    )

    opt = _sams_opt_tiny(batch_size=4)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(6), steps_per_epoch=4)
    raw = _raw_image_batch(opt, 4, frames=3)

    mesh2d = make_mesh_2d(2, 2)
    state2 = jax.device_put(state, replicated_sharding(mesh2d))
    batch2 = shard_batch_spatial(raw, mesh2d, spatial_size=opt.fine_height)
    batch1 = {k: jnp.asarray(v) for k, v in raw.items()}

    @jax.jit
    def gen(state, batch):
        feats = model.features(batch)
        _, _, frames, _ = model.generate_n_frames(
            state.nets["generator"].params, state.nets["generator"].stats,
            feats, train=True,
        )
        return frames

    frames2 = np.asarray(gen(state2, batch2))
    frames1 = np.asarray(gen(state, batch1))
    scale = max(np.abs(frames1).max(), 1.0)
    assert np.abs(frames2 - frames1).max() / scale < 1e-4

    _, metrics2d = model.make_train_step()(state2, batch2)
    for key in ("loss", "loss/D/multi", "loss/D/temporal"):
        assert np.isfinite(float(metrics2d[key])), key


def test_gradient_accumulation_matches_reference_semantics():
    """--accumulated_batches k: params update only every k steps (the
    reference's Lightning accumulate_grad_batches, train.py:107)."""
    from shineon_tpu.models.warp_model import WarpModel

    opt = _base_opt(accumulated_batches=2, batch_size=4)
    model = WarpModel(opt)
    state = model.init_state(jax.random.PRNGKey(9), steps_per_epoch=4)
    step = model.make_train_step()
    batch = {k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 4).items()}
    p0 = jax.tree_util.tree_map(np.asarray, state.nets["gmm"].params)
    state, _ = step(state, batch)
    p1 = jax.tree_util.tree_map(np.asarray, state.nets["gmm"].params)
    # first micro-step: gradients accumulated, no update yet
    deltas1 = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1))
    ]
    assert max(deltas1) == 0.0
    state, _ = step(state, batch)
    p2 = jax.tree_util.tree_map(np.asarray, state.nets["gmm"].params)
    deltas2 = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2))
    ]
    assert max(deltas2) > 0.0


def test_sams_remat_flag_runs():
    """--remat wraps the generator frame application in jax.checkpoint; the
    fused step must still run and produce finite losses."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(batch_size=2)
    opt.remat = True
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(10), steps_per_epoch=4)
    batch = {k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()}
    _, metrics = model.make_train_step()(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_sams_fast_gan_step_runs():
    """--fast_gan_step reuses the G-step clip for the D updates (documented
    approximation); the fused step must run with finite losses and update all
    nets."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(batch_size=2)
    opt.fast_gan_step = True
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(12), steps_per_epoch=4)
    batch = {k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()}
    _, metrics = model.make_train_step()(state, batch)
    for key in ("loss", "loss/D/multi", "loss/D/temporal"):
        assert np.isfinite(float(metrics[key])), key


def test_sams_eval_serving_with_warmed_stats_is_finite():
    """The serving configuration bench.py measures: eval-mode (running-stat)
    normalization after warming the stats with train-mode rollouts. Guards
    the stat-threading of generate_n_frames (train=True returns updated
    stats; train=False consumes them) and the bf16 window carry."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(batch_size=2, precision=16)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(11), steps_per_epoch=4)
    batch = {
        k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()
    }
    feats = model.features(batch)
    g = state.nets["generator"]
    params, stats = g.params, g.stats
    for _ in range(2):
        _, _, _, new_stats = model.generate_n_frames(
            params, stats, feats, train=True
        )
        stats = new_stats or stats
    fake, _, buffer, _ = model.generate_n_frames(
        params, stats, feats, train=False
    )
    assert np.all(np.isfinite(np.asarray(fake, np.float32)))
    assert np.all(np.isfinite(np.asarray(buffer, np.float32)))
    # eval serving carries the window/compute at bf16; outputs follow
    assert buffer.dtype == jnp.bfloat16
