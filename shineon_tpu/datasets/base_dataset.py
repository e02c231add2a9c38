"""Abstract dataset base (reference: datasets/base_dataset.py:7-47).

No torch DataLoader here: datasets are plain map-style sources of numpy
"raw sample" dicts; batching/prefetch lives in shineon_tpu.datasets.loader and
the normalized feature tensors are produced on device
(shineon_tpu.datasets.preprocess).
"""

from __future__ import annotations

import argparse
from abc import ABC, abstractmethod


class BaseDataset(ABC):
    def __init__(self, opt):
        self.opt = opt

    @staticmethod
    def modify_commandline_options(parser: argparse.ArgumentParser, is_train: bool):
        return parser

    @abstractmethod
    def __len__(self) -> int:
        return 0

    @abstractmethod
    def __getitem__(self, index: int):
        pass
