"""VVT (FW-GAN) video folder layout (reference: datasets/vvt_dataset.py:14-280)."""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob
from typing import List

from shineon_tpu.datasets.n_frames_interface import NFramesInterface
from shineon_tpu.datasets.tryon_dataset import TryonDataset
from shineon_tpu.utils.log import get_logger

logger = get_logger()


def extract_frame_substring(path: str) -> str:
    """'**frame_NNN.ext' -> 'frame_NNN' (reference vvt_dataset.py:273-280)."""
    start = path.find("frame_")
    end = path.rfind(".")
    return path[start:end]


class VVTDataset(TryonDataset, NFramesInterface):
    """Video try-on dataset: per-video frame folders, flat frame index with
    recorded video-start boundaries for clip collection."""

    @staticmethod
    def modify_commandline_options(
        parser: argparse.ArgumentParser, is_train: bool, shared: bool = False
    ):
        if not shared:
            parser = TryonDataset.modify_commandline_options(parser, is_train)
        parser = NFramesInterface.modify_commandline_options(parser, is_train)
        parser.add_argument("--vvt_dataroot", default="/data_hdd/fw_gan_vvt")
        parser.add_argument(
            "--warp_cloth_dir",
            help="Path to the GMM-generated intermediary warp-cloth folder for "
            "TOM. If not specified, looks under --vvt_dataroot.",
        )
        return parser

    @staticmethod
    def extract_video_id(image_path: str) -> str:
        """The folder immediately containing the frame file."""
        return image_path.split(os.sep)[-2]

    def __init__(self, opt, i_am_validation: bool = False):
        self.root = opt.vvt_dataroot
        self._video_start_indices = set()
        TryonDataset.__init__(self, opt, i_am_validation)
        NFramesInterface.__init__(self, opt)

    # ---------- path registration (vvt_dataset.py:56-115) ----------

    def _tryon_task_active(self) -> bool:
        """True when running the try-on task (a NEW garment on each person):
        test-time with --tryon_list (reference vvt_dataset.py:58) or
        --random_tryon (declared at reference options/test_options.py:26-29
        but never consumed there — a dead flag; this framework implements its
        advertised semantics, see load_file_paths_for_tryon_task)."""
        return not self.opt.is_train and bool(
            getattr(self.opt, "tryon_list", None)
            or getattr(self.opt, "random_tryon", False)
        )

    def load_file_paths(self, i_am_validation: bool = False):
        if self._tryon_task_active():
            self.load_file_paths_for_tryon_task()
        else:
            self.load_file_paths_for_reconstruction_task(i_am_validation)

    def load_file_paths_for_reconstruction_task(self, i_am_validation: bool):
        folder = f"{self.opt.datamode}/{self.opt.datamode}_frames"
        video_folders = sorted(glob(f"{self.root}/{folder}/*/"))
        num_videos = len(video_folders)
        validation_index = int((1 - self.val_fraction) * num_videos)
        if i_am_validation:
            start, end = validation_index, num_videos
        else:
            start, end = 0, validation_index
        self.register_videos(video_folders, start, end)

    def register_videos(self, video_folders: List[str], start: int = 0, end: int = -1):
        for video_folder in video_folders[start:end]:
            self._video_start_indices.add(len(self.image_names))
            self.image_names.extend(sorted(glob(f"{video_folder}/*.png")))

    def load_file_paths_for_tryon_task(self):
        """Try-on task: cloth<->video pairs from a CSV (vvt_dataset.py:86-105),
        or deterministic random pairs under --random_tryon."""
        self.video_ids_to_cloth_paths = {}
        video_folders = []
        for cloth_path, video_id in self._tryon_pairs():
            self.video_ids_to_cloth_paths[video_id] = cloth_path
            video_folders.append(
                osp.join(
                    self.opt.vvt_dataroot, self.opt.datamode,
                    f"{self.opt.datamode}_frames", video_id,
                )
            )
        self.register_videos(video_folders, 0, len(video_folders))

    def _tryon_pairs(self):
        """(cloth_path, video_id) pairs for the try-on task.

        With --tryon_list: the CSV rows, verbatim (reference
        vvt_dataset.py:90-105). With --random_tryon (a flag the reference
        declares at options/test_options.py:26-29 but never consumes): pair
        each test video with the product cloth of a DIFFERENT video via a
        seed-420 shuffle — deterministic across runs and processes, and no
        person re-wears their own garment (unless only one video exists)."""
        if getattr(self.opt, "tryon_list", None):
            with open(self.opt.tryon_list, "r") as f:
                return [
                    tuple(part.strip() for part in line.split(","))
                    for line in f.readlines() if line.strip()
                ]
        import numpy as np

        folder = f"{self.opt.datamode}/{self.opt.datamode}_frames"
        video_ids = [
            osp.basename(osp.normpath(p))
            for p in sorted(glob(f"{self.root}/{folder}/*/"))
        ]
        assert video_ids, f"--random_tryon found no videos under {folder}"
        cloth_root = osp.join(self.root, "clothes_person", "img")
        cloths = [
            self.find_cloth_path_under_vvt_root("cloth_front", cloth_root, vid)
            for vid in video_ids
        ]
        order = np.random.RandomState(420).permutation(len(video_ids))
        return [
            (cloths[order[(k + 1) % len(order)]], video_ids[order[k]])
            for k in range(len(order))
        ]

    # ---------- cloth paths (vvt_dataset.py:122-186) ----------

    def get_input_cloth_path(self, index: int) -> str:
        image_path = self.image_names[index]
        video_id = VVTDataset.extract_video_id(image_path)
        frame_word = extract_frame_substring(image_path)

        if self._tryon_task_active():
            if self.opt.model == "warp":
                return self.video_ids_to_cloth_paths[video_id]
            assert self.opt.warp_cloth_dir, (
                "try-on task TOM/SAMS runs need --warp_cloth_dir pointed at "
                "the stage-1 warp export (docs/2_inference.md)"
            )
            cloth_folder = osp.join(self.opt.warp_cloth_dir, video_id)
            matches = sorted(glob(f"{cloth_folder}/*{frame_word}*"))
            assert matches, (
                f"no stage-1 warp-cloth file for {frame_word!r} under "
                f"{cloth_folder}; run the warp model with the same try-on "
                f"pairing first"
            )
            return matches[0]

        if self.opt.model == "warp":
            path = osp.join(self.root, "clothes_person", "img")
            keyword = "cloth_front"
        else:
            if self.opt.warp_cloth_dir is None:
                path = osp.join(self.root, self.opt.datamode, "warp-cloth")
            else:
                path = self.opt.warp_cloth_dir
            keyword = f"cloth_front*{frame_word}"
        return self.find_cloth_path_under_vvt_root(keyword, path, video_id)

    def find_cloth_path_under_vvt_root(self, keyword, path, video_id) -> str:
        # VVT's clothes_person folders are upper-case with a trailing garment id
        # (reference notes this as a dataset-layout hack, vvt_dataset.py:150-153)
        video_id, cloth_id = video_id.upper().split("-")
        cloth_folder = osp.join(path, video_id)
        search = f"{cloth_folder}/{video_id}-{cloth_id}*{keyword}.*"
        matches = sorted(glob(search))
        if not matches:
            logger.debug(f"{search=} not found, relaxing search to any cloth term.")
            matches = sorted(glob(f"{cloth_folder}/{video_id}-{cloth_id}*cloth*"))
        assert matches, (
            f"no cloth file matches {search!r}; if this is a TOM/SAMS run, "
            f"point --warp_cloth_dir at the exported warp outputs"
        )
        return matches[0]

    def get_input_cloth_name(self, index: int) -> str:
        cloth_path = self.get_input_cloth_path(index)
        if self._tryon_task_active():
            video_id = VVTDataset.extract_video_id(self.image_names[index])
        else:
            video_id = VVTDataset.extract_video_id(cloth_path)
        base_cloth_name = osp.basename(cloth_path)
        frame_name = osp.basename(self.get_person_image_name(index))
        return osp.join(video_id, f"{base_cloth_name}.FOR.{frame_name}")

    # ---------- person/annotation paths (vvt_dataset.py:190-241) ----------

    def get_person_image_path(self, index: int) -> str:
        return self.image_names[index]

    def get_person_image_name(self, index: int) -> str:
        image_path = self.get_person_image_path(index)
        video_id = VVTDataset.extract_video_id(image_path)
        return osp.join(video_id, osp.basename(image_path))

    def get_person_parsed_path(self, index: int) -> str:
        image_path = self.get_person_image_path(index)
        folder = f"{self.opt.datamode}/{self.opt.datamode}_frames_parsing"
        vid = VVTDataset.extract_video_id(image_path)
        fname = os.path.split(image_path)[-1].replace(".png", "_label.png")
        parsed_path = osp.join(self.root, folder, vid, fname)
        if not os.path.exists(parsed_path):
            parsed_path = parsed_path.replace("_label", "")
        return parsed_path

    def get_person_cocopose_path(self, index: int) -> str:
        image_path = self.get_person_image_path(index)
        folder = f"{self.opt.datamode}/{self.opt.datamode}_frames_keypoint"
        vid = VVTDataset.extract_video_id(image_path)
        fname = os.path.split(image_path)[-1].replace(".png", "_keypoints.json")
        return osp.join(self.root, folder, vid, fname)

    def get_person_densepose_path(self, index: int) -> str:
        image_path = self.get_person_image_path(index)
        folder = f"{self.opt.datamode}/densepose"
        vid = VVTDataset.extract_video_id(image_path)
        fname = os.path.split(image_path)[-1].replace(".png", "_IUV.png")
        return osp.join(self.root, folder, vid, fname)

    def get_person_flow_path(self, index: int) -> str:
        image_path = self.get_person_image_path(index)
        image_path = image_path.replace(".png", ".flo")
        return image_path.replace(f"{self.opt.datamode}_frames", "optical_flow")

    # ---------- clip collection (vvt_dataset.py:244-259) ----------

    def collect_n_frames_indices(self, index: int) -> List[int]:
        """Walk backwards n frames, duplicating the boundary index at video
        starts."""
        indices: List[int] = []
        for i in range(index, index - self.n_frames_total, -1):
            assert i > -1, (
                f"frame walk-back reached a negative index ({i}); the "
                f"video-start bookkeeping is inconsistent"
            )
            if i in self._video_start_indices or i == 0:
                num_times = self.n_frames_total - len(indices)
                indices = [i] * num_times + indices
                break
            indices.insert(0, i)
        return indices

    @NFramesInterface.return_n_frames
    def __getitem__(self, index: int):
        return super().__getitem__(index)
