"""Native C++ staging library: build, .flo batch reads, crop parity, fallback."""

import numpy as np
import pytest

from shineon_tpu.datasets.flow_utils import write_flow
from shineon_tpu.native import get_lib, read_flo_batch


def test_native_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("no toolchain in this environment")
    assert hasattr(lib, "read_flo_batch")


def test_flo_batch_read_and_crop(tmp_path, rng):
    flow_big = rng.randn(300, 220, 2).astype(np.float32)  # bigger than crop
    flow_small = rng.randn(100, 80, 2).astype(np.float32)  # smaller: zero-pad
    p1 = str(tmp_path / "a.flo")
    p2 = str(tmp_path / "b.flo")
    write_flow(p1, flow_big)
    write_flow(p2, flow_small)
    missing = str(tmp_path / "missing.flo")

    out, valid = read_flo_batch([p1, p2, missing], 256, 192, n_threads=2)
    assert out.shape == (3, 256, 192, 2)
    np.testing.assert_array_equal(valid, [1.0, 1.0, 0.0])

    # center-crop parity with numpy slicing
    y0, x0 = (300 - 256) // 2, (220 - 192) // 2
    np.testing.assert_array_equal(out[0], flow_big[y0:y0 + 256, x0:x0 + 192])
    # zero-padded small flow: content centered
    dy, dx = (256 - 100) // 2, (192 - 80) // 2
    np.testing.assert_array_equal(out[1, dy:dy + 100, dx:dx + 80], flow_small)
    assert (out[1, :dy] == 0).all() and (out[1, dy + 100:] == 0).all()
    # missing file -> zeros (reference fallback semantics)
    assert (out[2] == 0).all()


def test_corrupt_flo_rejected(tmp_path):
    bad = tmp_path / "bad.flo"
    bad.write_bytes(b"NOTAFLOFILE")
    out, valid = read_flo_batch([str(bad)], 64, 48)
    assert valid[0] == 0.0 and (out == 0).all()


def test_dataset_uses_native_flow_path(tmp_path, rng):
    """TryonDataset.get_flow_raw fast path returns identical arrays to the
    Python reader."""
    import argparse

    from shineon_tpu.datasets.vvt_dataset import VVTDataset
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_vvt_fixture

    root = tmp_path / "vvt"
    make_vvt_fixture(str(root), n_videos=1, frames=3)
    opt = argparse.Namespace(
        model="unet_mask", dataset="vvt", datamode="train", is_train=True,
        person_inputs=["agnostic", "densepose", "flow"], cloth_inputs=["cloth"],
        fine_height=256, fine_width=192, radius=5, val_fraction=0.0,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=True,
        vvt_dataroot=str(root), warp_cloth_dir=None, tryon_list=None,
    )
    ds = VVTDataset(opt)
    item = ds[1]
    assert item["flow_raw"].shape == (1, 256, 192, 2)
    assert item["flow_valid"][0] == 1.0
    from shineon_tpu.datasets.flow_utils import read_flow

    expected = read_flow(ds.get_person_flow_path(1))
    np.testing.assert_array_equal(item["flow_raw"][0], expected)


def test_decode_image_batch_matches_pil(tmp_path, rng):
    """Native PNG/JPEG decode (RGB + raw label) is bit-identical to PIL."""
    from PIL import Image

    from shineon_tpu.native import decode_image_batch, get_lib

    H, W = 64, 48

    def crop(arr):
        h, w = arr.shape[:2]
        y0, x0 = (h - H) // 2, (w - W) // 2
        out = np.zeros((H, W) + arr.shape[2:], arr.dtype)
        sy, dy = max(y0, 0), max(-y0, 0)
        sx, dx = max(x0, 0), max(-x0, 0)
        ch, cw = min(H - dy, h - sy), min(W - dx, w - sx)
        out[dy:dy + ch, dx:dx + cw] = arr[sy:sy + ch, sx:sx + cw]
        return out

    rgb = rng.randint(0, 255, (80, 60, 3)).astype(np.uint8)
    p_png = str(tmp_path / "x.png"); Image.fromarray(rgb).save(p_png)
    p_jpg = str(tmp_path / "x.jpg"); Image.fromarray(rgb).save(p_jpg)
    lab = rng.randint(0, 20, (80, 60)).astype(np.uint8)
    pal = Image.fromarray(lab, mode="P")
    pal.putpalette([v for c in range(256) for v in (c, 255 - c, c // 2)])
    p_lab = str(tmp_path / "lab.png"); pal.save(p_lab)
    p_gray = str(tmp_path / "gray.png"); Image.fromarray(lab, mode="L").save(p_gray)

    imgs, valid = decode_image_batch(
        [p_png, p_jpg, str(tmp_path / "nope.png")], H, W, channels=3, n_threads=2
    )
    assert valid.tolist() == [1.0, 1.0, 0.0]
    np.testing.assert_array_equal(imgs[0], crop(rgb))
    pil_jpg = np.asarray(Image.open(p_jpg).convert("RGB"), np.uint8)
    np.testing.assert_array_equal(imgs[1], crop(pil_jpg))
    np.testing.assert_array_equal(imgs[2], 0)

    # raw label values: palette indices / gray levels, never RGB-expanded
    labs, valid = decode_image_batch([p_lab, p_gray], H, W, channels=1)
    assert valid.tolist() == [1.0, 1.0]
    np.testing.assert_array_equal(labs[0, ..., 0], crop(lab))
    np.testing.assert_array_equal(labs[1, ..., 0], crop(lab))

    # upscale-pad case (source smaller than target)
    small = rng.randint(0, 255, (30, 20, 3)).astype(np.uint8)
    p_small = str(tmp_path / "s.png"); Image.fromarray(small).save(p_small)
    out, valid = decode_image_batch([p_small], H, W, channels=3)
    assert valid[0] == 1.0
    np.testing.assert_array_equal(out[0], crop(small))

    if get_lib() is None:  # record which path was exercised
        import pytest

        pytest.skip("native library unavailable; PIL fallback verified")


def test_tryon_dataset_native_decode_parity(tmp_path, rng):
    """open_image_u8 / open_label_u8 match the PIL reference path exactly."""
    import argparse

    from PIL import Image

    from shineon_tpu.datasets.vvt_dataset import VVTDataset
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_vvt_fixture

    root = tmp_path / "vvt"
    make_vvt_fixture(str(root), n_videos=1, frames=3)
    opt = argparse.Namespace(
        model="unet_mask", dataset="vvt", datamode="train", is_train=True,
        person_inputs=["agnostic", "densepose", "flow"], cloth_inputs=["cloth"],
        fine_height=256, fine_width=192, radius=5, val_fraction=0.0,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=1, n_frames_now=1, flow_warp=True,
        vvt_dataroot=str(root), warp_cloth_dir=None, tryon_list=None,
    )
    ds = VVTDataset(opt)
    img_path = ds.get_person_image_path(1)
    pil = ds.center_crop(
        np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
    )
    np.testing.assert_array_equal(ds.open_image_u8(img_path), pil)
    parse_path = ds.get_person_parsed_path(1)
    pil_parse = ds.center_crop(np.asarray(Image.open(parse_path), np.uint8))
    np.testing.assert_array_equal(ds.open_label_u8(parse_path), pil_parse)
