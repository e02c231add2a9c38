"""TryonDataset: the per-sample feature factory, split host/device.

Reference: datasets/tryon_dataset.py:44-537. The reference assembles normalized
feature tensors per sample with PIL/torchvision inside dataloader workers —
explicitly flagged as a training bottleneck (tryon_dataset.py:391). The
TPU-native split:

  * HOST (this class): resolve file paths (abstract per-dataset getters, same
    API surface as the reference), decode to raw uint8/float numpy arrays,
    center-crop, and return a flat "raw sample" dict of fixed-shape arrays.
  * DEVICE (shineon_tpu.datasets.preprocess): one jitted function turns a raw
    batch into the reference's normalized feature dict (silhouette blur, head
    crop, cloth segmentation, pose stamping, masks) — fused elementwise TPU
    work instead of per-sample Python.

Missing-annotation fault tolerance matches the reference: absent densepose /
flow / prev-frame degrade to zero tensors (tryon_dataset.py:262-266, 290-296,
309-313) via validity flags consumed on device.
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from argparse import ArgumentParser
from typing import Dict, TypeVar

import numpy as np
from PIL import Image

from shineon_tpu.datasets import channels
from shineon_tpu.datasets.base_dataset import BaseDataset
from shineon_tpu.datasets.flow_utils import flow_to_image, read_flow
from shineon_tpu.utils.log import get_logger

logger = get_logger()

TryonDatasetType = TypeVar("TryonDatasetType", bound="TryonDataset")

# re-export the channel constants under the reference's class-attribute names
RGB_CHANNELS = channels.RGB_CHANNELS
MASK_CHANNELS = channels.MASK_CHANNELS
parse_num_channels = channels.parse_num_channels


class TryonDataset(BaseDataset, ABC):
    """Loads raw per-sample arrays for the try-on models."""

    RGB_CHANNELS = channels.RGB_CHANNELS
    MASK_CHANNELS = channels.MASK_CHANNELS
    COCOPOSE_CHANNELS = channels.COCOPOSE_CHANNELS
    IM_HEAD_CHANNELS = channels.IM_HEAD_CHANNELS
    SILHOUETTE_CHANNELS = channels.SILHOUETTE_CHANNELS
    AGNOSTIC_CHANNELS = channels.AGNOSTIC_CHANNELS
    CLOTH_CHANNELS = channels.CLOTH_CHANNELS
    CLOTH_MASK_CHANNELS = channels.CLOTH_MASK_CHANNELS
    DENSEPOSE_CHANNELS = channels.DENSEPOSE_CHANNELS
    FLOW_CHANNELS = channels.FLOW_CHANNELS

    @staticmethod
    def modify_commandline_options(parser: ArgumentParser, is_train: bool):
        parser.add_argument(
            "--val_fraction", type=float, default=0.01,
            help="portion of the training data split off for validation",
        )
        if not is_train:  # on test dataset, use the whole thing
            parser.set_defaults(val_fraction=0)
        parser.add_argument(
            "--cloth_mask_threshold", type=int, default=240,
            help="white-background cutoff for deriving the cloth mask: pixels "
            "brighter than this (0-255) are masked out.",
        )
        parser.add_argument(
            "--image_scale", type=float, default=1, help="first scale to this"
        )
        parser.add_argument(
            "--fine_width", type=int, default=192, help="then crop to this"
        )
        parser.add_argument(
            "--fine_height", type=int, default=256, help="then crop to this"
        )
        parser.add_argument("--radius", type=int, default=5)
        parser.add_argument(
            "--visualize_flow", action="store_true",
            help="Visualize flow for debugging (heavy).",
        )
        return parser

    def __init__(self, opt, i_am_validation: bool = False):
        super().__init__(opt)
        self.opt = opt
        self.val_fraction = opt.val_fraction
        self.cloth_mask_threshold = opt.cloth_mask_threshold
        self.datamode = opt.datamode
        self.fine_height = opt.fine_height
        self.fine_width = opt.fine_width
        self.radius = opt.radius
        self.image_names = []
        self.i_am_validation = i_am_validation
        self.load_file_paths(i_am_validation)

    @abstractmethod
    def load_file_paths(self, i_am_validation: bool = False):
        """Set self.image_names (and cloth names) per sub-dataset layout."""

    @classmethod
    def make_validation_dataset(cls, opt) -> "TryonDataset":
        return cls(opt, i_am_validation=True)

    def __len__(self) -> int:
        return len(self.image_names)

    # ---------- host decode helpers ----------

    def center_crop(self, array: np.ndarray) -> np.ndarray:
        """Center crop/pad to (fine_height, fine_width) — torchvision
        CenterCrop semantics (crop from the center; zero-pad if smaller)."""
        th, tw = self.fine_height, self.fine_width
        h, w = array.shape[:2]
        out_shape = (th, tw) + array.shape[2:]
        out = np.zeros(out_shape, array.dtype)
        y0 = (h - th) // 2
        x0 = (w - tw) // 2
        src_y0, dst_y0 = max(y0, 0), max(-y0, 0)
        src_x0, dst_x0 = max(x0, 0), max(-x0, 0)
        copy_h = min(th - dst_y0, h - src_y0)
        copy_w = min(tw - dst_x0, w - src_x0)
        out[dst_y0:dst_y0 + copy_h, dst_x0:dst_x0 + copy_w] = array[
            src_y0:src_y0 + copy_h, src_x0:src_x0 + copy_w
        ]
        return out

    def open_image_u8(self, path: str) -> np.ndarray:
        """Decode an RGB image and center-crop; (H, W, 3) uint8.

        Fast path: the native C++ decoder (libpng/libjpeg, GIL-free) so loader
        threads scale with host cores — the reference flags this host decode
        as its training bottleneck (tryon_dataset.py:391)."""
        from shineon_tpu.native import decode_image_batch, get_lib

        if get_lib() is not None:
            imgs, valid = decode_image_batch(
                [path], self.fine_height, self.fine_width, channels=3,
                n_threads=1,
            )
            if not valid[0]:
                raise FileNotFoundError(path)
            return imgs[0]
        img = Image.open(path).convert("RGB")
        return self.center_crop(np.asarray(img, np.uint8))

    def open_label_u8(self, path: str) -> np.ndarray:
        """Decode a label map (palette indices / gray levels) and center-crop;
        (H, W) uint8."""
        from shineon_tpu.native import decode_image_batch, get_lib

        if get_lib() is not None:
            maps, valid = decode_image_batch(
                [path], self.fine_height, self.fine_width, channels=1,
                n_threads=1,
            )
            if not valid[0]:
                raise FileNotFoundError(path)
            return maps[0, ..., 0]
        arr = np.asarray(Image.open(path), np.uint8)
        if arr.ndim == 3:
            arr = arr[..., 0]
        return self.center_crop(arr)

    # ---------- cloth representation (tryon_dataset.py:158-196) ----------

    def get_cloth_raw(self, index: int) -> Dict[str, np.ndarray]:
        cloth_path = self.get_input_cloth_path(index)
        return {"cloth_u8": self.open_image_u8(cloth_path)}

    @abstractmethod
    def get_input_cloth_path(self, index: int) -> str:
        """Product-image path (called by get_cloth_raw)."""

    @abstractmethod
    def get_input_cloth_name(self, index: int) -> str:
        """Determines the written output filename."""

    # ---------- person representation (tryon_dataset.py:203-367) ----------

    def get_person_raw(self, index: int) -> Dict[str, np.ndarray]:
        ret: Dict[str, np.ndarray] = {}
        ret["image_u8"] = self.open_image_u8(self.get_person_image_path(index))
        try:
            ret["prev_image_u8"] = self.open_image_u8(
                self.get_person_image_path(index - 1)
            )
            ret["prev_image_valid"] = np.float32(1.0)
        except Exception:
            ret["prev_image_u8"] = np.zeros_like(ret["image_u8"])
            ret["prev_image_valid"] = np.float32(0.0)

        ret["parse_u8"] = self.open_label_u8(self.get_person_parsed_path(index))

        if "cocopose" in self.opt.person_inputs:
            ret["cocopose_kp"] = self.get_cocopose_keypoints(index)

        if "densepose" in self.opt.person_inputs:
            try:
                ret["densepose_u8"] = self.open_image_u8(
                    self.get_person_densepose_path(index)
                )
                ret["densepose_valid"] = np.float32(1.0)
            except (FileNotFoundError, TypeError):
                ret["densepose_u8"] = np.zeros(
                    (self.fine_height, self.fine_width, 3), np.uint8
                )
                ret["densepose_valid"] = np.float32(0.0)
        return ret

    def get_cocopose_keypoints(self, index: int) -> np.ndarray:
        """COCO keypoint JSON -> (18, 3) float array; zeros (= all-invalid) when
        absent (tryon_dataset.py:369-395)."""
        pose_path = self.get_person_cocopose_path(index)
        try:
            with open(pose_path, "r") as f:
                pose_label = json.load(f)
            pose_data = np.array(
                pose_label["people"][0]["pose_keypoints"], np.float32
            ).reshape(-1, 3)
        except (FileNotFoundError, IndexError, KeyError, TypeError):
            pose_data = np.zeros((channels.COCOPOSE_CHANNELS, 3), np.float32)
        out = np.zeros((channels.COCOPOSE_CHANNELS, 3), np.float32)
        n = min(len(pose_data), channels.COCOPOSE_CHANNELS)
        out[:n] = pose_data[:n]
        return out

    def get_flow_raw(self, index: int) -> Dict[str, np.ndarray]:
        """.flo flow + optional visualization; zeros fallback
        (tryon_dataset.py:272-298).

        Fast path: the native C++ staging library (shineon_tpu/native) reads,
        validates, and center-crops the .flo payload in one pass; the
        visualize_flow debug path stays in Python (it re-reads for the
        colorized rendering)."""
        ret: Dict[str, np.ndarray] = {}
        try:
            path = self.get_person_flow_path(index)
        except (NotImplementedError, TypeError):
            path = None
        if path is not None and not self.opt.visualize_flow:
            from shineon_tpu.native import read_flo_batch

            flow, valid = read_flo_batch(
                [path], self.fine_height, self.fine_width, n_threads=1
            )
            ret["flow_raw"] = flow[0]
            ret["flow_valid"] = np.float32(valid[0])
            return ret
        try:
            flow_np = read_flow(path)
            ret["flow_raw"] = self.center_crop(flow_np.astype(np.float32))
            ret["flow_valid"] = np.float32(1.0)
            if self.opt.visualize_flow:
                ret["flow_image_u8"] = self.center_crop(flow_to_image(flow_np))
        except (FileNotFoundError, TypeError):
            ret["flow_raw"] = np.zeros(
                (self.fine_height, self.fine_width, 2), np.float32
            )
            ret["flow_valid"] = np.float32(0.0)
            if self.opt.visualize_flow:
                ret["flow_image_u8"] = np.zeros(
                    (self.fine_height, self.fine_width, 3), np.uint8
                )
        return ret

    @abstractmethod
    def get_person_image_path(self, index: int) -> str: ...

    @abstractmethod
    def get_person_image_name(self, index: int) -> str: ...

    @abstractmethod
    def get_person_cocopose_path(self, index: int) -> str: ...

    @abstractmethod
    def get_person_parsed_path(self, index: int) -> str: ...

    @abstractmethod
    def get_person_densepose_path(self, index: int) -> str: ...

    @abstractmethod
    def get_person_flow_path(self, index: int) -> str: ...

    # ---------- getitem (tryon_dataset.py:481-537) ----------

    def __getitem__(self, index: int) -> Dict:
        result: Dict = {
            "dataset_name": self.__class__.__name__,
            "cloth_name": self.get_input_cloth_name(index),
            "cloth_path": self.get_input_cloth_path(index),
            "image_name": self.get_person_image_name(index),
            "image_path": self.get_person_image_path(index),
        }
        if self.opt.model == "warp":
            result["grid_vis_u8"] = self.open_image_u8(self.grid_vis_path())
        if getattr(self.opt, "flow_warp", False) or "flow" in self.opt.person_inputs:
            result.update(self.get_flow_raw(index))
        result.update(self.get_cloth_raw(index))
        result.update(self.get_person_raw(index))
        return result

    def grid_vis_path(self) -> str:
        """The checkerboard grid image used to visualize TPS warps
        (tryon_dataset.py:483-487 opens repo-root grid.png)."""
        import os.path as osp

        here = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
        return osp.join(here, "grid.png")
