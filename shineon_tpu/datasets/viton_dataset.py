"""VITON folder layout (reference: datasets/viton_dataset.py:7-96)."""

from __future__ import annotations

import argparse
import os.path as osp

from shineon_tpu.datasets.tryon_dataset import TryonDataset


class VitonDataset(TryonDataset):
    """Original CP-VTON VITON layout driven by a pairs txt
    (``person.jpg cloth.jpg`` per line)."""

    @staticmethod
    def modify_commandline_options(
        parser: argparse.ArgumentParser, is_train: bool, shared: bool = False
    ):
        if not shared:
            parser = TryonDataset.modify_commandline_options(parser, is_train)
        parser.add_argument("--viton_dataroot", default="data")
        parser.add_argument("--data_list", default="train_pairs.txt")
        return parser

    def __init__(self, opt, i_am_validation: bool = False):
        # VITON has no i_am_validation split in the reference (viton_dataset.py:21)
        super().__init__(opt)
        self.data_list = opt.data_list
        self.data_path = osp.join(opt.viton_dataroot, opt.datamode)

    def load_file_paths(self, i_am_validation: bool = False):
        self.root = self.opt.viton_dataroot
        self.data_path = osp.join(self.opt.viton_dataroot, self.opt.datamode)
        im_names, c_names = [], []
        with open(osp.join(self.root, self.opt.data_list), "r") as f:
            for line in f.readlines():
                im_name, c_name = line.strip().split()
                im_names.append(im_name)
                c_names.append(c_name)
        self.image_names = im_names
        self.cloth_names = c_names

    # cloth
    def get_input_cloth_path(self, index: int) -> str:
        c_name = self.get_input_cloth_name(index)
        # warp stage reads product cloth; TOM reads GMM-warped cloth
        folder = "cloth" if self.opt.model == "warp" else "warp-cloth"
        return osp.join(self.data_path, folder, c_name)

    def get_input_cloth_name(self, index: int) -> str:
        return self.cloth_names[index]

    # person
    def get_person_image_name(self, index: int) -> str:
        return self.image_names[index]

    def get_person_image_path(self, index: int) -> str:
        return osp.join(self.data_path, "image", self.get_person_image_name(index))

    def get_person_parsed_path(self, index: int) -> str:
        parse_name = self.get_person_image_name(index).replace(".jpg", ".png")
        return osp.join(self.data_path, "image-parse", parse_name)

    def get_person_cocopose_path(self, index: int) -> str:
        pose_name = self.get_person_image_name(index).replace(
            ".jpg", "_keypoints.json"
        )
        return osp.join(self.data_path, "pose", pose_name)

    def get_person_flow_path(self, index: int):
        raise NotImplementedError("Image datasets don't have flow")

    def get_person_densepose_path(self, index: int):
        raise NotImplementedError("For now use cocopose on VITON")
