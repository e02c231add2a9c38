"""UnetMaskModel (TOM) — U-Net try-on with mask compositing + optional flow warp.

Reference: models/unet_mask_model.py:27-326. The n-frame composite loop
(unet_mask_model.py:110-133) is a static unroll over the (small, fixed)
n_frames_total with the flow warp expressed through the XLA resample2d op, so
the whole forward + loss + update is one fused jitted step.
"""

from __future__ import annotations

import argparse
import math
import os.path as osp
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.datasets.channels import RGB_CHANNELS
from shineon_tpu.models.base_model import BaseModel
from shineon_tpu.networks.cpvton import UnetGenerator
from shineon_tpu.networks.loss import VGGLoss, l1_loss
from shineon_tpu.ops import resample2d
from shineon_tpu.training.optimizers import keep_decay_schedule, make_optimizer
from shineon_tpu.training.state import (
    NetState,
    TrainState,
    net_state_from_variables,
)
from shineon_tpu.utils import get_and_cat_inputs
from shineon_tpu.utils.runtime import donating_jit
from shineon_tpu.utils.visualization import get_save_paths, save_images


class UnetMaskModel(BaseModel):
    """CP-VTON Try-On Module (TOM)."""

    @classmethod
    def modify_commandline_options(cls, parser: argparse.ArgumentParser, is_train):
        parser = argparse.ArgumentParser(parents=[parser], add_help=False)
        parser = super(UnetMaskModel, cls).modify_commandline_options(parser, is_train)
        parser.set_defaults(person_inputs=("agnostic", "densepose"))
        parser.add_argument(
            "--pen_flow_mask", type=float, default=1.0,
            help="weight of the flow-mask penalty term",
        )
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        n_frames = self.n_frames_total
        self.unet = UnetGenerator(
            input_nc=(self.person_channels + self.cloth_channels) * n_frames,
            output_nc=5 * n_frames if opt.flow_warp else 4 * n_frames,
            num_downs=6,
            num_attention=getattr(opt, "num_attn", 2),
            # conservative feature scale-up with the frame count
            # (unet_mask_model.py:55)
            ngf=int(64 * (math.log(n_frames) + 1)),
            norm="instance",
            use_self_attn=opt.self_attn,
            activation=opt.activation,
            dtype=self.compute_dtype,
        )
        # the VGG term always contributes to the TOM loss
        # (unet_mask_model.py:173-190), so real weights are required at
        # train time unless --allow_random_vgg opts out
        self.criterion_vgg = VGGLoss(
            allow_random=getattr(opt, "allow_random_vgg", False)
            or not self.is_train,
            dtype=self.compute_dtype,
        )
        self._tx = None
        self._schedule = None

    # --------------------------------------------------------------- state

    def init_state(self, rng, steps_per_epoch: int) -> TrainState:
        H, W = self.opt.fine_height, self.opt.fine_width
        n = self.n_frames_total
        x = jnp.zeros(
            (1, H, W, (self.person_channels + self.cloth_channels) * n), jnp.float32
        )
        variables = jax.jit(lambda r, a: self.unet.init(r, a, train=False))(rng, x)
        self._tx = make_optimizer(
            getattr(self.opt, "lr", 1e-4),
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
            {"unet": net_state_from_variables(variables, self._tx)}
        )

    # ------------------------------------------------------------- forward

    def forward(self, params, feats, train: bool):
        """(unet_mask_model.py:64-135): unet -> split rendered/mask/flow-mask
        -> per-frame flow-warp + tryon composite."""
        n = self.n_frames_total
        person = get_and_cat_inputs(feats, self.opt.person_inputs)
        cloth = get_and_cat_inputs(feats, self.opt.cloth_inputs)
        flows = feats.get("flow") if self.opt.flow_warp else None

        x = jnp.concatenate([person, cloth], axis=-1)
        outputs = self.unet.apply({"params": params}, x, train=train)

        boundary = 3 * n
        weight_boundary = 4 * n
        p_rendereds = jnp.tanh(outputs[..., :boundary])
        tryon_masks = jax.nn.sigmoid(outputs[..., boundary:weight_boundary])
        flow_masks = (
            jax.nn.sigmoid(outputs[..., weight_boundary:])
            if self.opt.flow_warp else None
        )

        warped_cloths = feats["cloth"]
        frames = []
        for f in range(n):
            p_rendered = p_rendereds[..., 3 * f:3 * (f + 1)]
            if flows is not None and f > 0:
                flow_f = flows[..., 2 * f:2 * (f + 1)]
                warped_by_flow = resample2d(frames[f - 1], flow_f)
                fmask = flow_masks[..., f:f + 1]
                p_rendered = (1 - fmask) * warped_by_flow + fmask * p_rendered
            tmask = tryon_masks[..., f:f + 1]
            cloth_f = warped_cloths[..., 3 * f:3 * (f + 1)]
            frames.append((1 - tmask) * p_rendered + tmask * cloth_f)
        p_tryons = jnp.concatenate(frames, axis=-1)
        return p_rendereds, tryon_masks, p_tryons, flow_masks

    def _losses(self, params, feats, train: bool):
        """(unet_mask_model.py:173-190): L1 + VGG + mask L1 over the last two
        frames + flow-mask penalty (a sum, not a mean, per the reference)."""
        n = self.n_frames_total
        p_rendereds, tryon_masks, p_tryons, flow_masks = self.forward(
            params, feats, train
        )
        im = feats["image"]
        cm = feats["cloth_mask"]

        def last(x, ch):  # channels of frame -1
            return x[..., (n - 1) * ch: n * ch]

        def prev(x, ch):  # channels of frame -2
            return x[..., (n - 2) * ch: (n - 1) * ch]

        l1_curr = l1_loss(last(p_tryons, 3), last(im, 3))
        vgg_curr = self.criterion_vgg(last(p_tryons, 3), last(im, 3))
        mask_curr = l1_loss(last(tryon_masks, 1), last(cm, 1))
        if n > 1:
            l1_prev = l1_loss(prev(p_tryons, 3), prev(im, 3))
            vgg_prev = self.criterion_vgg(prev(p_tryons, 3), prev(im, 3))
            mask_prev = l1_loss(prev(tryon_masks, 1), prev(cm, 1))
            loss_l1 = 0.5 * (l1_curr + l1_prev)
            loss_vgg = 0.5 * (vgg_curr + vgg_prev)
            loss_mask = 0.5 * (mask_curr + mask_prev)
        else:
            l1_prev = vgg_prev = mask_prev = jnp.zeros(())
            loss_l1, loss_vgg, loss_mask = l1_curr, vgg_curr, mask_curr
        loss_flow = (
            jnp.sum(flow_masks[..., n - 1:n]) if flow_masks is not None
            else jnp.zeros(())
        ) * self.opt.pen_flow_mask
        loss = loss_l1 + loss_vgg + loss_mask + loss_flow
        metrics = {
            "loss/G": loss,
            "loss/G/l1": loss_l1,
            "loss/G/vgg": loss_vgg,
            "loss/G/tryon_mask_l1": loss_mask,
            "loss/G/flow_mask_l1": loss_flow,
        }
        if n > 1:
            metrics.update({
                "loss/G/l1_prev": l1_prev, "loss/G/vgg_prev": vgg_prev,
                "loss/G/tryon_mask_prev": mask_prev, "loss/G/l1_curr": l1_curr,
                "loss/G/vgg_curr": vgg_curr, "loss/G/tryon_mask_curr": mask_curr,
            })
        outputs = (p_rendereds, tryon_masks, p_tryons, flow_masks)
        return loss, (metrics, outputs)

    # --------------------------------------------------------------- steps

    def make_train_step(self):
        tx = self._tx

        @donating_jit
        def train_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            net = state.nets["unet"]

            def loss_fn(params):
                return self._losses(params, feats, train=True)

            (loss, (metrics, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(net.params)
            updates, new_opt = tx.update(grads, net.opt_state, net.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, net.params, updates)
            new_state = state.replace(
                step=state.step + 1,
                nets={"unet": NetState(new_params, net.stats, new_opt)},
            )
            metrics["lr"] = self._schedule(state.step)
            return new_state, metrics

        return train_step

    def make_val_step(self):
        @jax.jit
        def val_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            loss, (metrics, _) = self._losses(
                state.nets["unet"].params, feats, train=False
            )
            metrics["checkpoint_on"] = loss
            return metrics

        return val_step

    def make_visual_step(self):
        n = self.n_frames_total

        @jax.jit
        def visual_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            _, (_, outputs) = self._losses(
                state.nets["unet"].params, feats, train=False
            )
            p_rendereds, tryon_masks, p_tryons, _ = outputs
            out = {
                "cloth": feats["cloth"][..., -3:],
                "cloth_mask": feats["cloth_mask"][..., -1:],
                "tryon_mask": tryon_masks[..., -1:],
                "p_rendered": p_rendereds[..., -3:],
                "p_tryon": p_tryons[..., -3:],
                "image": feats["image"][..., -3:],
                "prev_image": feats["prev_image"][..., -3:],
            }
            for name in ("silhouette", "im_head", "im_cocopose", "densepose"):
                if name in feats:
                    out[name] = feats[name]
            return out

        return visual_step

    def visual_rows(self, v: Dict[str, np.ndarray]) -> List[List[np.ndarray]]:
        """Grid layout parity with unet_mask_model.py:220-248."""
        person_visuals = self.fetch_person_visuals(v)
        return [
            person_visuals,
            [v["cloth"], v["cloth_mask"] * 2 - 1, v["tryon_mask"] * 2 - 1],
            [v["p_rendered"], v["p_tryon"], v["image"], v["prev_image"]],
        ]

    # ---------------------------------------------------------------- test

    def test_step(self, state, device_batch, host_batch) -> None:
        """Write tryon/ or reconstruction/ PNGs (unet_mask_model.py:250-282)."""
        dataset_names = host_batch["dataset_name"]
        im_names = host_batch["image_name"]
        if isinstance(dataset_names, str):
            dataset_names = [dataset_names] * len(im_names)
        if self.n_frames_total > 1 or (im_names and isinstance(im_names[0], list)):
            dataset_names = [d[-1] if isinstance(d, list) else d for d in dataset_names]
            im_names = [n[-1] for n in im_names]

        task = (
            "tryon"
            if getattr(self.opt, "tryon_list", None)
            or getattr(self.opt, "random_tryon", False)
            else "reconstruction"
        )
        try_on_dirs = [
            osp.join(self.test_results_dir, d, task) for d in dataset_names
        ]
        save_paths = get_save_paths(try_on_dirs, im_names)
        if all(osp.exists(s) for s in save_paths):
            return

        if not hasattr(self, "_test_fn"):
            @jax.jit
            def test_fn(state, raw_batch):
                feats = self.features(raw_batch)
                _, _, p_tryons, _ = self.forward(
                    state.nets["unet"].params, feats, train=False
                )
                return p_tryons[..., -RGB_CHANNELS:]

            self._test_fn = test_fn

        p_tryon = jax.device_get(self._test_fn(state, device_batch))
        save_images(p_tryon, im_names, try_on_dirs)
