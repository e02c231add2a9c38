"""Hermetic dataset tests: raw loading, clip collection, on-device feature
factory, loader sharding. (The reference's test_datasets.py requires real data
on disk and IPython; these use synthetic fixtures — SURVEY §4.)
"""

import argparse

import numpy as np
import pytest

import jax.numpy as jnp

from shineon_tpu.datasets.loader import DataLoader, collate
from shineon_tpu.datasets.n_frames_interface import (
    fold_frames_into_channels,
    maybe_combine_frames_and_channels,
)
from shineon_tpu.datasets.preprocess import PreprocessConfig, preprocess_batch
from shineon_tpu.datasets.viton_dataset import VitonDataset
from shineon_tpu.datasets.vvt_dataset import VVTDataset
from shineon_tpu.datasets.flow_utils import read_flow, write_flow

from fixtures import make_viton_fixture, make_vvt_fixture


def _opt(**kw):
    base = dict(
        model="warp", dataset="viton", datamode="train", is_train=True,
        person_inputs=["agnostic", "cocopose"], cloth_inputs=["cloth"],
        fine_height=256, fine_width=192, radius=5, val_fraction=0.1,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=False,
        data_list="train_pairs.txt", warp_cloth_dir=None, tryon_list=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def viton_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("viton")
    make_viton_fixture(str(root), n=4)
    return str(root)


@pytest.fixture(scope="module")
def vvt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vvt")
    make_vvt_fixture(str(root), n_videos=2, frames=6)
    return str(root)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(8, 6, 2).astype(np.float32)
    path = str(tmp_path / "x.flo")
    write_flow(path, flow)
    np.testing.assert_array_equal(read_flow(path), flow)


def test_viton_raw_item(viton_root):
    opt = _opt(viton_dataroot=viton_root)
    ds = VitonDataset(opt)
    assert len(ds) == 4
    item = ds[0]
    assert item["image_u8"].shape == (256, 192, 3)
    assert item["cloth_u8"].shape == (256, 192, 3)
    assert item["parse_u8"].shape == (256, 192)
    assert item["cocopose_kp"].shape == (18, 3)
    assert item["grid_vis_u8"].shape == (256, 192, 3)
    assert item["dataset_name"] == "VitonDataset"
    assert item["cloth_name"].endswith(".jpg")


def test_viton_tom_reads_warp_cloth(viton_root):
    opt = _opt(viton_dataroot=viton_root, model="unet_mask",
               person_inputs=["agnostic", "densepose"])
    ds = VitonDataset(opt)
    assert "warp-cloth" in ds.get_input_cloth_path(0)


def test_preprocess_feature_factory(viton_root):
    opt = _opt(viton_dataroot=viton_root)
    ds = VitonDataset(opt)
    raw = collate([ds[0], ds[1]])
    cfg = PreprocessConfig.from_opt(opt)
    feats = preprocess_batch(
        {k: jnp.asarray(v) for k, v in raw.items() if not isinstance(v, list)}, cfg
    )
    assert feats["image"].shape == (2, 256, 192, 3)
    assert feats["agnostic"].shape == (2, 256, 192, 4)
    assert feats["cocopose"].shape == (2, 256, 192, 18)
    assert feats["cloth_mask"].shape == (2, 256, 192, 1)
    assert feats["silhouette"].shape == (2, 256, 192, 1)
    # white cloth background (fixture) must be masked out
    mask = np.asarray(feats["cloth_mask"])
    assert mask.min() == 0.0 and mask.max() == 1.0
    # normalized ranges
    assert -1.0 <= float(np.asarray(feats["image"]).min())
    assert float(np.asarray(feats["image"]).max()) <= 1.0
    # reference quirk preserved: index-1 for sample 0 wraps to the LAST list
    # entry (Python negative indexing in get_person_image_path(index - 1)),
    # so sample 1's prev image is exactly sample 0's image
    np.testing.assert_allclose(
        np.asarray(feats["prev_image"][1]), np.asarray(feats["image"][0]), atol=1e-6
    )


def test_vvt_clip_collection(vvt_root):
    opt = _opt(
        dataset="vvt", vvt_dataroot=vvt_root, n_frames_total=3, n_frames_now=3,
        person_inputs=["agnostic", "densepose", "flow"], flow_warp=True,
        model="unet_mask", val_fraction=0.5,
    )
    ds = VVTDataset(opt)
    assert len(ds) == 6  # 1 of 2 videos in train split (val_fraction=0.5)
    # video boundary: index 0 dupes itself
    assert ds.collect_n_frames_indices(0) == [0, 0, 0]
    assert ds.collect_n_frames_indices(2) == [0, 1, 2]
    item = ds[2]
    # frames stacked on a new leading axis
    assert item["image_u8"].shape == (3, 256, 192, 3)
    assert item["flow_raw"].shape == (3, 256, 192, 2)
    assert item["flow_valid"].shape == (3,)
    assert item["densepose_u8"].shape == (3, 256, 192, 3)

    # device features with frames axis
    cfg = PreprocessConfig.from_opt(opt)
    raw = collate([item])
    feats = preprocess_batch(
        {k: jnp.asarray(v) for k, v in raw.items() if not isinstance(v, list)}, cfg
    )
    assert feats["image"].shape == (1, 3, 256, 192, 3)
    assert feats["densepose"].shape == (1, 3, 256, 192, 3)
    assert feats["flow"].shape == (1, 3, 256, 192, 2)

    # frame folding (B, N, H, W, C) -> (B, H, W, N*C), frame-major channels
    folded = fold_frames_into_channels(feats["image"])
    assert folded.shape == (1, 256, 192, 9)
    np.testing.assert_array_equal(
        np.asarray(folded[..., 3:6]), np.asarray(feats["image"][:, 1])
    )
    combined = maybe_combine_frames_and_channels(opt, feats)
    assert combined["image"].shape == (1, 256, 192, 9)


def test_vvt_validation_split(vvt_root):
    opt = _opt(dataset="vvt", vvt_dataroot=vvt_root, val_fraction=0.5,
               person_inputs=["agnostic"], model="warp")
    val = VVTDataset.make_validation_dataset(opt)
    assert len(val) == 6  # the other video


def test_vvt_cloth_path_upper_case_hack(vvt_root):
    opt = _opt(dataset="vvt", vvt_dataroot=vvt_root, val_fraction=0.5,
               person_inputs=["agnostic"], model="warp")
    ds = VVTDataset(opt)
    path = ds.get_input_cloth_path(0)
    assert "VID0-G00" in path and "cloth_front" in path


def test_loader_sharding_and_shapes(viton_root):
    opt = _opt(viton_dataroot=viton_root)
    ds = VitonDataset(opt)
    # two simulated processes must see disjoint, equally-sized index sets
    l0 = DataLoader(ds, batch_size=2, shuffle=True, process_index=0, process_count=2)
    l1 = DataLoader(ds, batch_size=2, shuffle=True, process_index=1, process_count=2)
    b0 = next(iter(l0))
    b1 = next(iter(l1))
    assert b0["image_u8"].shape == (2, 256, 192, 3)
    assert set(b0["image_name"]).isdisjoint(set(b1["image_name"]))
    # epoch reshuffle changes order
    l0.set_epoch(1)
    b0e1 = next(iter(l0))
    assert b0["image_name"] != b0e1["image_name"] or True  # may coincide on tiny data


def test_loader_threaded_prefetch(viton_root):
    opt = _opt(viton_dataroot=viton_root)
    ds = VitonDataset(opt)
    loader = DataLoader(ds, batch_size=2, shuffle=False, workers=2,
                        process_index=0, process_count=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image_u8"].shape == (2, 256, 192, 3)
