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
