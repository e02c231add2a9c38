"""Visualization grid + PNG export semantics (reference visualization.py)."""

import os.path as osp

import numpy as np
from PIL import Image

from shineon_tpu.utils.visualization import (
    get_save_paths,
    save_images,
    tensor_for_board,
    tensor_list_for_board,
)


def test_tensor_for_board_range_and_mask_rgb():
    x = np.full((1, 4, 4, 1), -1.0, np.float32)
    t = tensor_for_board(x)
    assert t.shape == (1, 4, 4, 3)  # mask repeated to RGB
    assert (t == 0.0).all()
    y = tensor_for_board(np.full((1, 4, 4, 3), 1.0, np.float32))
    assert (y == 1.0).all()


def test_grid_layout_and_fill():
    a = np.zeros((2, 4, 4, 3), np.float32)
    rows = [[a, a, a], [a]]  # ragged rows -> canvas filled with 0.5
    canvas = tensor_list_for_board(rows)
    assert canvas.shape == (2, 8, 12, 3)
    # the unfilled cells keep the 0.5 background
    assert (canvas[:, 4:, 4:] == 0.5).all()
    # filled cells are (0+1)/2 = 0.5 too for zeros... use distinct value
    b = np.ones((1, 2, 2, 3), np.float32)
    canvas = tensor_list_for_board([[b], [b, b]])
    assert canvas.shape == (1, 4, 4, 3)
    assert (canvas[0, :2, :2] == 1.0).all()
    assert (canvas[0, :2, 2:] == 0.5).all()  # empty slot


def test_save_images_skip_rules(tmp_path):
    img = np.zeros((2, 4, 4, 3), np.float32)
    names = ["a.png", "b.png"]
    # warp-mask outside VitonDataset is skipped (visualization.py:64-67)
    skip_dir = str(tmp_path / "VVTDataset" / "warp-mask")
    save_images(img, names, [skip_dir, skip_dir])
    assert not osp.exists(osp.join(skip_dir, "a.png"))
    # viton warp-mask is written
    ok_dir = str(tmp_path / "VitonDataset" / "warp-mask")
    save_images(img, names, [ok_dir, ok_dir])
    assert osp.exists(osp.join(ok_dir, "a.png"))
    # skip-if-exists: overwrite attempt leaves the original
    Image.fromarray(np.full((4, 4, 3), 255, np.uint8)).save(
        osp.join(ok_dir, "a.png")
    )
    save_images(img, names, [ok_dir, ok_dir])
    assert np.asarray(Image.open(osp.join(ok_dir, "a.png"))).max() == 255


def test_get_save_paths():
    assert get_save_paths(["/x", "/y"], ["a", "b"]) == ["/x/a", "/y/b"]
