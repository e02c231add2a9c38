"""In-process Trainer integration: fit + test passes over synthetic data on
the virtual CPU mesh (the CLI path minus argparse)."""

import glob
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from fixtures import make_viton_fixture  # noqa: E402


def _opt(tmp_path, **kw):
    import argparse

    base = dict(
        model="unet_mask", dataset="viton", datamode="train", is_train=True,
        person_inputs=["agnostic", "cocopose"], cloth_inputs=["cloth"],
        fine_height=64, fine_width=64, radius=3, val_fraction=0.25,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=False,
        lr=1e-4, keep_epochs=1, decay_epochs=0, accumulated_batches=1,
        batch_size=2, workers=0, no_shuffle=False,
        limit_train_batches="1.0", limit_val_batches="1.0",
        ngf=8, self_attn=False, num_attn=0, activation=None, precision=32,
        tryon_list=None, warp_cloth_dir=None, pen_flow_mask=1.0,
        display_count=1, save_count=10000,
        experiments_dir=str(tmp_path / "exp"), name="itest",
        checkpoint="", fast_dev_run=True, loglevel="info",
        val_check_interval="1", viton_dataroot=str(tmp_path / "viton"),
        data_list="train_pairs.txt",
        result_dir=str(tmp_path / "results"),
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("itest")
    make_viton_fixture(str(tmp / "viton"), n=4)
    make_viton_fixture(str(tmp / "viton"), n=4, datamode="test")
    return tmp


def test_fit_and_test_roundtrip(data_root):
    from shineon_tpu.models.unet_mask_model import UnetMaskModel
    from shineon_tpu.training.loop import Trainer

    opt = _opt(data_root)
    model = UnetMaskModel(opt)
    trainer = Trainer(opt)
    state = trainer.fit(model)

    exp = osp.join(opt.experiments_dir, opt.name)
    # checkpoints written: a FINAL named save + hparams + topk from validation
    assert osp.exists(osp.join(exp, "checkpoints", "hparams.json"))
    finals = glob.glob(osp.join(exp, "checkpoints", "named", "FINAL_*"))
    assert finals, os.listdir(osp.join(exp, "checkpoints", "named"))
    assert glob.glob(osp.join(exp, "checkpoints", "topk", "*"))
    # tensorboard events written
    assert glob.glob(osp.join(exp, "tb", "events.*"))

    # test pass exports PNGs with skip-if-exists resume
    test_opt = _opt(
        data_root, is_train=False, datamode="test", no_shuffle=True,
        data_list="test_pairs.txt", fast_dev_run=False,
    )
    model.override_hparams(test_opt)
    model.opt = test_opt
    model.preprocess_config = model.preprocess_config  # unchanged plan
    trainer.opt = test_opt
    model.setup("test")
    trainer.test(model, state)
    pngs = glob.glob(
        osp.join(test_opt.result_dir, "**", "*.jpg"), recursive=True
    ) + glob.glob(osp.join(test_opt.result_dir, "**", "*.png"), recursive=True)
    assert len(pngs) == 4, pngs
    # re-running skips existing outputs without error
    trainer.test(model, state)
