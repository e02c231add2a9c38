"""Regression tests for the round-2 runtime fixes:

  * --limit_val_batches applied exactly once (loader-level, not re-applied
    by the validation loop)
  * ragged final test batch padded to the static batch size before mesh
    sharding (drop_last=False + multi-device mesh)
  * --no_ganFeat_loss wired to the discriminators' get_intermediate_features
    (reference discriminator.py:66,141)
  * explicit --gpu_ids restricts the Trainer's data mesh
    (reference train.py:76-85)
  * --reference_gan_semantics reproduces the reference's zero-gradient
    generator adversarial term
"""

import argparse
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from test_train_e2e import _raw_image_batch, _sams_opt_tiny  # noqa: E402


# --------------------------------------------------------------- val batches


class _CountingLoader:
    """Quacks like shineon DataLoader after limit_batches was applied."""

    def __init__(self, n_batches, batch):
        self.n_batches = n_batches
        self.batch = batch
        self.served = 0

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        for _ in range(self.n_batches):
            self.served += 1
            yield dict(self.batch)


def test_limit_val_batches_applied_once(tmp_path):
    """With --limit_val_batches 0.5 the loader already halves its length; the
    validation loop must consume exactly len(loader) batches, not half again."""
    from shineon_tpu.datasets.loader import DataLoader
    from shineon_tpu.training.loop import Trainer

    # the loader-level cap: 10 batches at 0.5 -> 5
    ds = [{"x": np.zeros(3, np.float32)} for _ in range(20)]
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, workers=0,
        process_index=0, process_count=1, limit_batches=0.5,
    )
    assert len(loader) == 5

    opt = argparse.Namespace(
        batch_size=2, limit_val_batches="0.5", fast_dev_run=False,
        experiments_dir=str(tmp_path), name="valcap",
    )
    trainer = Trainer(opt)
    counting = _CountingLoader(len(loader), {"x": np.zeros((2, 3), np.float32)})

    class _Model:
        def visualize_from(self, *a, **kw):
            pass

    def val_step(state, batch):
        return {"loss": jnp.asarray(0.5)}

    trainer._run_validation(_Model(), val_step, None, None, counting)
    assert counting.served == 5  # NOT 2 (the old double application gave 2)


# ------------------------------------------------------------- ragged batch


def test_pad_ragged_batch_repeats_last_sample():
    from shineon_tpu.training.loop import _pad_ragged_batch

    batch = {
        "image_u8": np.arange(3 * 4).reshape(3, 4).astype(np.uint8),
        "names": ["a", "b", "c"],
    }
    out = _pad_ragged_batch(batch, 8)
    assert out["image_u8"].shape == (8, 4)
    np.testing.assert_array_equal(out["image_u8"][3:], [batch["image_u8"][-1]] * 5)
    assert out["names"] == ["a", "b", "c"]  # host names untouched
    # full batches pass through unchanged
    same = _pad_ragged_batch(batch, 3)
    np.testing.assert_array_equal(same["image_u8"], batch["image_u8"])


def test_ragged_final_test_batch_over_mesh(tmp_path):
    """3 test samples, batch 2, 2-device mesh: the final 1-sample batch must
    shard (padded) and write exactly the 3 real outputs."""
    import glob

    from fixtures import make_viton_fixture
    from shineon_tpu.models.unet_mask_model import UnetMaskModel
    from shineon_tpu.training.loop import Trainer

    root = tmp_path / "viton"
    make_viton_fixture(str(root), n=3, datamode="test")
    opt = argparse.Namespace(
        model="unet_mask", dataset="viton", datamode="test", is_train=False,
        person_inputs=["agnostic", "cocopose"], cloth_inputs=["cloth"],
        fine_height=64, fine_width=64, radius=3, val_fraction=0.25,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=False,
        lr=1e-4, keep_epochs=1, decay_epochs=0, accumulated_batches=1,
        batch_size=2, workers=0, no_shuffle=True,
        limit_train_batches="1.0", limit_val_batches="1.0",
        ngf=8, self_attn=False, num_attn=0, activation=None, precision=32,
        tryon_list=None, warp_cloth_dir=None, pen_flow_mask=1.0,
        display_count=1, save_count=10000,
        experiments_dir=str(tmp_path / "exp"), name="ragged",
        checkpoint="", fast_dev_run=False, loglevel="info",
        val_check_interval="1", viton_dataroot=str(root),
        data_list="test_pairs.txt", result_dir=str(tmp_path / "results"),
    )
    model = UnetMaskModel(opt)
    model.override_hparams(opt)
    state = model.init_state(jax.random.PRNGKey(0), steps_per_epoch=1)
    trainer = Trainer(opt)
    assert len(trainer.mesh.devices.ravel()) == 2  # batch 2 -> 2-device mesh
    trainer.test(model, state)
    pngs = glob.glob(
        osp.join(opt.result_dir, "**", "*.jpg"), recursive=True
    ) + glob.glob(osp.join(opt.result_dir, "**", "*.png"), recursive=True)
    assert len(pngs) == 3, pngs


# ----------------------------------------------------------------- ganFeat


def test_no_ganfeat_loss_wiring():
    from shineon_tpu.models.sams_model import SamsModel

    on = SamsModel(_sams_opt_tiny())
    assert on.multiscale_discriminator.get_intermediate_features
    assert on.temporal_discriminator.get_intermediate_features

    off = SamsModel(_sams_opt_tiny(no_ganFeat_loss=True))
    assert not off.multiscale_discriminator.get_intermediate_features
    assert not off.temporal_discriminator.get_intermediate_features


def test_no_ganfeat_loss_step_runs():
    """The single-logit discriminator outputs must flow through the fused
    step end-to-end."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(no_ganFeat_loss=True, batch_size=2)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(7), steps_per_epoch=4)
    batch = {
        k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()
    }
    _, metrics = model.make_train_step()(state, batch)
    for key in ("loss", "loss/D/multi", "loss/D/temporal"):
        assert np.isfinite(float(metrics[key])), key


# ------------------------------------------------------------------ gpu_ids


def test_gpu_ids_restricts_mesh(tmp_path):
    from shineon_tpu.training.loop import Trainer

    def opt(**kw):
        base = dict(
            batch_size=8, experiments_dir=str(tmp_path), name="gpuids",
        )
        base.update(kw)
        return argparse.Namespace(**base)

    all_devs = len(jax.devices())
    assert all_devs == 8
    # default: not explicit -> every device
    t = Trainer(opt(gpu_ids=[0], gpu_ids_explicit=False))
    assert len(t.mesh.devices.ravel()) == all_devs
    # explicit subset -> restricted mesh
    t = Trainer(opt(gpu_ids=[0, 1], gpu_ids_explicit=True))
    assert len(t.mesh.devices.ravel()) == 2
    # out-of-range ids are dropped with a warning, valid ones kept
    t = Trainer(opt(gpu_ids=[0, 99], gpu_ids_explicit=True))
    assert len(t.mesh.devices.ravel()) == 1


def test_gpu_ids_explicit_recorded_by_parse():
    from shineon_tpu.options.train_options import TrainOptions

    argv = ["--model", "warp", "--dataset", "viton", "--name", "x"]
    opt = TrainOptions().parse(argv)
    assert opt.gpu_ids_explicit is False
    opt = TrainOptions().parse(argv + ["--gpu_ids", "0,1"])
    assert opt.gpu_ids_explicit is True and opt.gpu_ids == [0, 1]


# ------------------------------------------------- reference GAN semantics


@pytest.mark.parametrize("ref_semantics", [False, True])
def test_reference_gan_semantics_gradient(ref_semantics):
    """With L1/VGG weights zeroed, the generator loss is purely adversarial.
    Under --reference_gan_semantics the criterion sees only the real branch,
    so its gradient w.r.t. the generator params must vanish; under the default
    (pred_fake) it must not."""
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt_tiny(
        wt_l1=0.0, wt_vgg=0.0, batch_size=2,
        reference_gan_semantics=ref_semantics,
    )
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(11), steps_per_epoch=4)
    feats = model.features({
        k: jnp.asarray(v) for k, v in _raw_image_batch(opt, 2, frames=3).items()
    })

    def loss_fn(g_params):
        loss, _ = model._generator_losses(g_params, state, feats, train=False)
        return loss

    grads = jax.grad(loss_fn)(state.nets["generator"].params)
    gnorm = jax.tree_util.tree_reduce(
        lambda acc, g: acc + float(jnp.abs(g).sum()), grads, 0.0
    )
    if ref_semantics:
        assert gnorm == pytest.approx(0.0, abs=1e-12)
    else:
        assert gnorm > 1e-3
