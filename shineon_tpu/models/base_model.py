"""Shared model plumbing (reference: models/base_model.py:24-237).

A model owns: its flax network(s), the preprocessing config, its datasets and
loaders, and the pure step functions the Trainer jits:

  * ``init_state(rng, steps_per_epoch) -> TrainState``
  * ``make_train_step() -> (state, raw_batch) -> (state, metrics)`` (jitted,
    state donated; gradient all-reduce + global BN stats come from the data
    mesh sharding)
  * ``make_val_step() -> (state, raw_batch) -> metrics`` (eval-mode norms —
    Lightning puts the model in eval() during validation)
  * ``make_visual_step()`` -> recomputes display tensors (runs only every
    --display_count steps so the hot step stays transfer-free)
  * ``test_step(state, device_batch, host_batch)`` -> writes output PNGs with
    skip-if-exists resume semantics
"""

from __future__ import annotations

import abc
import argparse
import os.path as osp
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from shineon_tpu.datasets import find_dataset_using_name
from shineon_tpu.datasets.channels import parse_num_channels
from shineon_tpu.datasets.loader import DataLoader
from shineon_tpu.datasets.preprocess import PreprocessConfig, preprocess_batch
from shineon_tpu.utils import str2num
from shineon_tpu.utils.log import get_logger
from shineon_tpu.utils.visualization import board_add_images

logger = get_logger()


class BaseModel(abc.ABC):
    @classmethod
    def modify_commandline_options(cls, parser: argparse.ArgumentParser, is_train):
        parser.add_argument(
            "--person_inputs", nargs="+",
            help="person-derived inputs to feed the network; each adds its channel "
            "count (see TryonDataset).",
        )
        parser.add_argument(
            "--cloth_inputs", nargs="+", default=("cloth",),
            help="cloth-derived inputs to feed the network.",
        )
        parser.add_argument("--ngf", type=int, default=64)
        parser.add_argument("--self_attn", action="store_true", help="insert self-attention blocks")
        parser.add_argument(
            "--no_self_attn", action="store_false", dest="self_attn",
            help="disable self-attention blocks",
        )
        parser.add_argument(
            "--num_attn", type=int, default=2,
            help="how many U-Net levels get self-attention, counted from the bottleneck",
        )
        parser.add_argument(
            "--flow_warp", action="store_true",
            help="flow-warp the previous generated frame into the composite",
        )
        parser.add_argument(
            "--allow_random_vgg", action="store_true",
            help="Permit the VGG perceptual loss to fall back to fixed random "
            "filters when no pretrained VGG19 weights are available "
            "(SHINEON_VGG19_WEIGHTS). Without this, missing weights abort "
            "training, since the objective would silently differ from the "
            "reference's ImageNet-VGG loss.",
        )
        parser.add_argument(
            "--remat", action="store_true",
            help="Rematerialize generator activations in the backward pass "
            "(jax.checkpoint): trades recompute for HBM, enabling larger "
            "clips/batches. (TPU-native extension; no reference equivalent.)",
        )
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.n_frames_total = getattr(opt, "n_frames_total", 1)
        self.person_channels = parse_num_channels(opt.person_inputs)
        self.cloth_channels = parse_num_channels(opt.cloth_inputs)
        self.is_train = opt.is_train
        self.preprocess_config = PreprocessConfig.from_opt(opt)
        # --precision 16 -> bfloat16 compute policy (params stay f32; losses,
        # sampling grids and norm statistics stay f32). The fp16+loss-scaling
        # of the reference (options/base_options.py:34-42) is unnecessary on
        # TPU: bf16 has the same exponent range as f32.
        self.compute_dtype = (
            jnp.bfloat16 if getattr(opt, "precision", 32) == 16 else None
        )

    # ------------------------------------------------------------ hparams

    def override_hparams(self, opt) -> None:
        """Re-apply current CLI values after a checkpoint load
        (base_model.py:76-89)."""
        self.opt = opt
        self.is_train = opt.is_train
        if not self.is_train:
            ckpt_name = osp.basename(osp.normpath(opt.checkpoint)) if opt.checkpoint else "scratch"
            self.test_results_dir = osp.join(
                opt.result_dir, opt.name, ckpt_name, opt.datamode
            )

    # ------------------------------------------------------------ datasets

    def setup(self, stage: str) -> None:
        dataset_cls = find_dataset_using_name(self.opt.dataset)
        self.train_dataset = dataset_cls(self.opt)
        logger.info(
            f"main {self.opt.dataset} dataset ready "
            f"({len(self.train_dataset)} samples)"
        )
        if stage == "fit":
            self.val_dataset = self.train_dataset.make_validation_dataset(self.opt)
            logger.info(
                f"validation {self.opt.dataset} dataset ready "
                f"({len(self.val_dataset)} samples)"
            )

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self.train_dataset,
            batch_size=self.opt.batch_size,
            shuffle=not getattr(self.opt, "no_shuffle", False),
            workers=self.opt.workers,
            limit_batches=str2num(self.opt.limit_train_batches),
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_dataset,
            batch_size=self.opt.batch_size,
            shuffle=not getattr(self.opt, "no_shuffle", False),
            workers=self.opt.workers,
            limit_batches=str2num(self.opt.limit_val_batches),
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(
            self.train_dataset,
            batch_size=self.opt.batch_size,
            shuffle=False,
            workers=self.opt.workers,
            drop_last=False,
        )

    # ------------------------------------------------------------ features

    def features(self, raw_batch: Dict) -> Dict[str, jnp.ndarray]:
        """Raw device batch -> normalized feature dict, frames folded into
        channels for the frame-stacked conv models
        (maybe_combine_frames_and_channels, n_frames_interface.py:105-138)."""
        feats = preprocess_batch(raw_batch, self.preprocess_config)
        from shineon_tpu.datasets.n_frames_interface import fold_frames_into_channels

        return {
            k: fold_frames_into_channels(v) if v.ndim == 5 else v
            for k, v in feats.items()
        }

    # ------------------------------------------------------------ steps

    @abc.abstractmethod
    def init_state(self, rng, steps_per_epoch: int): ...

    @abc.abstractmethod
    def make_train_step(self): ...

    @abc.abstractmethod
    def make_val_step(self): ...

    @abc.abstractmethod
    def make_visual_step(self): ...

    def test_step(self, state, device_batch, host_batch) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------ visuals

    def visualize_from(
        self, visual_fn, state, device_batch, host_batch, board, step, tag="train"
    ) -> None:
        """Compute display tensors with the jitted visual step and write the
        reference's image-grid rows to TensorBoard."""
        visuals = visual_fn(state, device_batch)
        rows = self.visual_rows(
            {k: np.asarray(v) for k, v in visuals.items()}
        )
        board_add_images(board, tag, rows, step)

    @abc.abstractmethod
    def visual_rows(self, visuals: Dict[str, np.ndarray]) -> List[List[np.ndarray]]:
        """Rows of image tensors for the TB grid (per-model visualize())."""

    def fetch_person_visuals(self, feats: Dict, sort_fn=None) -> List:
        """RGB-visualizable person inputs (base_model.py:186-212): keep only
        tensors with <= 3 channels after remapping."""
        names = self.replace_actual_with_visual()
        if sort_fn:
            names = sort_fn(names)
        out = []
        for name in names:
            if name not in feats:
                continue
            tensor = feats[name]
            channels = tensor.shape[-1]
            if self.n_frames_total > 1 and tensor.ndim == 4:
                channels = tensor.shape[-1] // self.n_frames_total
                tensor = tensor[..., -channels:]
            if channels <= 3:
                out.append(tensor)
            else:
                logger.warning(
                    f"Tried to visualize a tensor > 3 channels: '{name}' has "
                    f"{channels=}. Skipping it."
                )
        if not out:
            raise ValueError("no <=3-channel person inputs available to visualize")
        return out

    def replace_actual_with_visual(self) -> List[str]:
        """agnostic -> silhouette+im_head, cocopose -> im_cocopose, flow ->
        flow_image (base_model.py:214-237)."""
        person_visuals = list(self.opt.person_inputs)
        if "agnostic" in person_visuals:
            i = person_visuals.index("agnostic")
            person_visuals.pop(i)
            person_visuals.insert(i, "im_head")
            person_visuals.insert(i, "silhouette")
        if "cocopose" in person_visuals:
            i = person_visuals.index("cocopose")
            person_visuals.pop(i)
            person_visuals.insert(i, "im_cocopose")
        if "flow" in person_visuals:
            i = person_visuals.index("flow")
            person_visuals.pop(i)
            if getattr(self.opt, "visualize_flow", False):
                person_visuals.insert(i, "flow_image")
        return person_visuals
