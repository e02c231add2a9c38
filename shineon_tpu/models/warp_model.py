"""WarpModel (GMM) — the geometric cloth-warping stage.

Reference: models/warp_model.py:27-152. One jitted train step fuses the whole
pipeline: on-device preprocessing -> feature extraction -> MXU correlation ->
TPS theta -> basis-matmul grid -> grid-sample warp -> L1 loss -> Adam update.
"""

from __future__ import annotations

import argparse
import os.path as osp
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.models.base_model import BaseModel
from shineon_tpu.networks.cpvton import GMM
from shineon_tpu.networks.loss import l1_loss
from shineon_tpu.ops import grid_sample
from shineon_tpu.training.optimizers import keep_decay_schedule, make_optimizer
from shineon_tpu.training.state import (
    NetState,
    TrainState,
    net_state_from_variables,
)
from shineon_tpu.utils import get_and_cat_inputs
from shineon_tpu.utils.runtime import donating_jit
from shineon_tpu.utils.visualization import get_save_paths, save_images


class WarpModel(BaseModel):
    """Geometric Matching Module."""

    @classmethod
    def modify_commandline_options(cls, parser: argparse.ArgumentParser, is_train):
        parser = argparse.ArgumentParser(parents=[parser], add_help=False)
        parser = super(WarpModel, cls).modify_commandline_options(parser, is_train)
        parser.add_argument("--grid_size", type=int, default=5)
        parser.set_defaults(person_inputs=("agnostic", "cocopose"))
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.gmm = GMM(
            fine_height=opt.fine_height,
            fine_width=opt.fine_width,
            grid_size=opt.grid_size,
            ngf=opt.ngf,
            dtype=self.compute_dtype,
        )
        self._tx = None
        self._schedule = None

    # --------------------------------------------------------------- state

    def init_state(self, rng, steps_per_epoch: int) -> TrainState:
        H, W = self.opt.fine_height, self.opt.fine_width
        person = jnp.zeros((1, H, W, self.person_channels), jnp.float32)
        cloth = jnp.zeros((1, H, W, self.cloth_channels), jnp.float32)
        variables = jax.jit(
            lambda r, p, c: self.gmm.init(r, p, c, train=False)
        )(rng, person, cloth)
        self._tx = make_optimizer(
            self.opt.lr if hasattr(self.opt, "lr") else 1e-4,
            getattr(self.opt, "keep_epochs", 5),
            getattr(self.opt, "decay_epochs", 5),
            steps_per_epoch,
            getattr(self.opt, "accumulated_batches", 1),
        )
        self._schedule = keep_decay_schedule(
            getattr(self.opt, "lr", 1e-4),
            getattr(self.opt, "keep_epochs", 5),
            getattr(self.opt, "decay_epochs", 5),
            steps_per_epoch,
        )
        return TrainState.create(
            {"gmm": net_state_from_variables(variables, self._tx)}
        )

    # --------------------------------------------------------------- steps

    def _forward_loss(self, params, stats, feats, train: bool):
        person = get_and_cat_inputs(feats, self.opt.person_inputs)
        cloth_in = get_and_cat_inputs(feats, self.opt.cloth_inputs)
        variables = {"params": params, **stats}
        if train:
            (grid, theta), new_state = self.gmm.apply(
                variables, person, cloth_in, train=True, mutable=["batch_stats"]
            )
        else:
            grid, theta = self.gmm.apply(variables, person, cloth_in, train=False)
            new_state = stats
        warped_cloth = grid_sample(feats["cloth"], grid, padding_mode="border")
        loss = l1_loss(warped_cloth, feats["im_cloth"])
        return loss, (new_state, grid, theta, warped_cloth)

    def make_train_step(self):
        tx = self._tx

        @donating_jit
        def train_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            net = state.nets["gmm"]

            def loss_fn(params):
                return self._forward_loss(params, net.stats, feats, train=True)

            (loss, (new_stats, *_)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(net.params)
            updates, new_opt = tx.update(grads, net.opt_state, net.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, net.params, updates
            )
            new_state = state.replace(
                step=state.step + 1,
                nets={
                    "gmm": NetState(
                        params=new_params, stats=new_stats, opt_state=new_opt
                    )
                },
            )
            metrics = {"loss/G": loss, "lr": self._schedule(state.step)}
            return new_state, metrics

        return train_step

    def make_val_step(self):
        @jax.jit
        def val_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            net = state.nets["gmm"]
            loss, _ = self._forward_loss(net.params, net.stats, feats, train=False)
            return {"loss/G": loss, "checkpoint_on": loss}

        return val_step

    def make_visual_step(self):
        @jax.jit
        def visual_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            net = state.nets["gmm"]
            _, (_, grid, _, warped_cloth) = self._forward_loss(
                net.params, net.stats, feats, train=False
            )
            warped_grid = grid_sample(feats["grid_vis"], grid, padding_mode="zeros")
            out = {
                "warped_cloth": warped_cloth,
                "warped_grid": warped_grid,
                "cloth": feats["cloth"],
                "im_cloth": feats["im_cloth"],
                "image": feats["image"],
            }
            for name in ("silhouette", "im_head", "im_cocopose", "densepose"):
                if name in feats:
                    out[name] = feats[name]
            return out

        return visual_step

    def visual_rows(self, v: Dict[str, np.ndarray]) -> List[List[np.ndarray]]:
        """Grid layout parity with warp_model.py:100-113."""
        person_visuals = self.fetch_person_visuals(v)
        return [
            person_visuals,
            [v["cloth"], v["warped_cloth"], v["im_cloth"]],
            [v["warped_grid"], (v["warped_cloth"] + v["image"]) * 0.5, v["image"]],
        ]

    # ---------------------------------------------------------------- test

    def test_step(self, state, device_batch, host_batch) -> None:
        """Warp the batch and export warp-cloth/ + warp-mask/ PNGs per
        sub-dataset with skip-if-exists (warp_model.py:115-152)."""
        dataset_names = host_batch["dataset_name"]
        if isinstance(dataset_names, str):
            dataset_names = [dataset_names] * len(host_batch["cloth_name"])
        c_names = host_batch["cloth_name"]
        if isinstance(c_names[0], list):  # n-frames: last frame's name
            dataset_names = [d[-1] for d in dataset_names]
            c_names = [c[-1] for c in c_names]
        warp_cloth_dirs = [
            osp.join(self.test_results_dir, d, "warp-cloth") for d in dataset_names
        ]
        warp_mask_dirs = [
            osp.join(self.test_results_dir, d, "warp-mask") for d in dataset_names
        ]
        save_paths = get_save_paths(warp_cloth_dirs, c_names)
        if all(osp.exists(s) for s in save_paths):
            return

        if not hasattr(self, "_test_fn"):
            @jax.jit
            def test_fn(state, raw_batch):
                feats = self.features(raw_batch)
                net = state.nets["gmm"]
                _, (_, grid, _, warped_cloth) = self._forward_loss(
                    net.params, net.stats, feats, train=False
                )
                warped_mask = grid_sample(
                    feats["cloth_mask"], grid, padding_mode="zeros"
                )
                return warped_cloth, warped_mask

            self._test_fn = test_fn

        warped_cloth, warped_mask = jax.device_get(
            self._test_fn(state, device_batch)
        )
        save_images(warped_cloth, c_names, warp_cloth_dirs)
        save_images(np.asarray(warped_mask) * 2 - 1, c_names, warp_mask_dirs)
