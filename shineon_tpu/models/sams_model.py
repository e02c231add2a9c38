"""SamsModel — Self-Attentive MultiSPADE video GAN.

Reference: models/sams_model.py:30-449. The Lightning 3-optimizer alternation
(optimizer_idx 0/1/2, sams_model.py:147-157) becomes ONE fused jitted step:

  1. generator update: autoregressively synthesize the clip (static unroll over
     the fixed n_frames window, prev-frame ring buffer with stop_gradient on
     the generator inputs exactly like the reference's .detach() at
     sams_model.py:579), hinge adversarial (multiscale + temporal) + L1 + VGG;
  2. regenerate the clip once with the UPDATED generator under stop_gradient —
     semantically identical to the reference's two no_grad regenerations
     (sams_model.py:598-608), because G does not change between its D steps;
  3. multiscale-discriminator update; 4. temporal-discriminator update
     (fake & real concatenated through one D pass then split,
     sams_model.py:702-720).

Progressive training (--n_frames_now) starts generation at
n_frames_total - n_frames_now and zero-masks earlier frames for the temporal
discriminator (sams_model.py:214-215, 346-361); both counts are static per
run, so the unroll stays shape-static.

Deliberate deviation (documented): the reference's generator adversarial terms
feed ``pred_real`` into the criterion (sams_model.py:616-620, 651-655), whose
gradient w.r.t. the generator is zero — a variable mix-up relative to the
upstream SPADE recipe. We use ``pred_fake`` for the generator loss (standard
hinge-GAN semantics) so the adversarial objective actually trains G;
``--reference_gan_semantics`` restores the reference's exact behavior.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.datasets.channels import RGB_CHANNELS, channels_for, parse_num_channels
from shineon_tpu.datasets.preprocess import preprocess_batch
from shineon_tpu.models.base_model import BaseModel
from shineon_tpu.networks.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from shineon_tpu.networks.loss import GANLoss, VGGLoss, l1_loss
from shineon_tpu.networks.sams import SamsGenerator
from shineon_tpu.ops import resample2d
from shineon_tpu.training.optimizers import keep_decay_schedule, make_optimizer
from shineon_tpu.training.state import (
    NetState,
    TrainState,
    net_state_from_variables,
    variables_of,
)
from shineon_tpu.utils.runtime import donating_jit
from shineon_tpu.utils.visualization import get_save_paths, save_images


class SamsModel(BaseModel):
    """Self Attentive Multi-Spade GAN."""

    @classmethod
    def modify_commandline_options(cls, parser: argparse.ArgumentParser, is_train):
        parser = argparse.ArgumentParser(parents=[parser], add_help=False)
        parser = super(SamsModel, cls).modify_commandline_options(parser, is_train)
        parser.set_defaults(person_inputs=("agnostic", "densepose", "flow"))
        parser.add_argument(
            "--encoder_input", default="flow",
            help="which of the --person_inputs to use as the encoder segmap "
            "input (only 1 allowed).",
        )
        parser.set_defaults(n_frames_total=5)
        parser.set_defaults(batch_size=4)
        parser.add_argument("--wt_l1", type=float, default=1.0)
        parser.add_argument("--wt_vgg", type=float, default=1.0)
        parser.add_argument("--wt_multiscale", type=float, default=1.0)
        parser.add_argument("--wt_temporal", type=float, default=1.0)
        parser.add_argument(
            "--norm_D", type=str, default="spectralinstance",
            help="discriminator norm config string (e.g. spectralinstance)",
        )
        parser.add_argument(
            "--fast_gan_step", dest="fast_gan_step", action="store_true",
            default=False,
            help="Reuse the generator step's frames (detached) for the "
            "discriminator updates instead of regenerating with the "
            "updated generator. ~16%% faster steps; slight semantic "
            "deviation from the reference's per-optimizer regeneration "
            "(a runtime warning is logged when active).",
        )
        parser.add_argument(
            "--exact_gan_step", dest="fast_gan_step", action="store_false",
            help="[DEFAULT] Regenerate the clip with the updated generator "
            "before the discriminator updates (the reference's exact "
            "per-optimizer semantics, sams_model.py:598-608).",
        )
        from shineon_tpu import networks
        from shineon_tpu.options import gan_options

        parser = networks.modify_commandline_options(parser, is_train)
        parser = gan_options.modify_commandline_options(parser, is_train)
        return parser

    @staticmethod
    def apply_default_encoder_input(opt):
        """Default the encoder map to the first person input
        (sams_model.py:394-399)."""
        if hasattr(opt, "encoder_input") and opt.encoder_input is None:
            opt.encoder_input = opt.person_inputs[0]
        return opt

    def __init__(self, opt):
        super().__init__(opt)
        self.n_frames_now = (
            opt.n_frames_now if getattr(opt, "n_frames_now", None) else self.n_frames_total
        )
        self.inputs = list(opt.person_inputs) + list(opt.cloth_inputs)
        self.generator = SamsGenerator(
            norm_G=opt.norm_G,
            ngf_base=opt.ngf_base,
            ngf_pow_outer=opt.ngf_pow_outer,
            ngf_pow_inner=opt.ngf_pow_inner,
            ngf_pow_step=opt.ngf_pow_step,
            num_middle=opt.num_middle,
            attention_middle_indices=tuple(opt.attention_middle_indices),
            attention_decoder_indices=tuple(opt.attention_decoder_indices),
            activation=opt.activation or "relu",
            n_frames_total=self.n_frames_total,
            flow_warp=opt.flow_warp,
            encoder_input=opt.encoder_input,
            inputs=tuple(self.inputs),
            dtype=self.compute_dtype,
        )
        if self.is_train and not getattr(opt, "remat", False):
            est_pixels = opt.fine_height * opt.fine_width * opt.batch_size
            if est_pixels * self.n_frames_now >= 256 * 192 * 4 * 3:
                from shineon_tpu.utils.log import get_logger

                get_logger().warning(
                    "SAMS training at this size typically exceeds a single "
                    "16GB chip's HBM without --remat (measured 44.8G at "
                    "batch 4 x 5 frames x 256x192); consider --remat."
                )
        if self.is_train:
            # get_intermediate_features tracks --no_ganFeat_loss exactly like
            # the reference (discriminator.py:66,141)
            want_feats = not getattr(opt, "no_ganFeat_loss", False)
            self.multiscale_discriminator = MultiscaleDiscriminator(
                num_D=getattr(opt, "num_D", 2),
                ndf=getattr(opt, "ndf", 64),
                n_layers=getattr(opt, "n_layers_D", 4),
                norm_D=opt.norm_D,
                init_type=getattr(opt, "init_type", "xavier"),
                init_gain=getattr(opt, "init_variance", 0.02),
                get_intermediate_features=want_feats,
                dtype=self.compute_dtype,
            )
            enc_ch = parse_num_channels(opt.encoder_input)
            self.temporal_in_channels = self.n_frames_total * (enc_ch + RGB_CHANNELS)
            self.temporal_discriminator = NLayerDiscriminator(
                ndf=getattr(opt, "ndf", 64),
                n_layers=getattr(opt, "n_layers_D", 4),
                norm_D=opt.norm_D,
                init_type=getattr(opt, "init_type", "xavier"),
                init_gain=getattr(opt, "init_variance", 0.02),
                get_intermediate_features=want_feats,
                dtype=self.compute_dtype,
            )
            self.criterion_gan = GANLoss(getattr(opt, "gan_mode", "hinge"))
            # wt_vgg == 0 never optimizes the VGG term, so random fallback
            # filters are harmless there; otherwise require real weights
            # unless --allow_random_vgg opts out (reference loss.py:110)
            self.criterion_vgg = VGGLoss(
                allow_random=getattr(opt, "allow_random_vgg", False)
                or getattr(opt, "wt_vgg", 1.0) == 0,
                dtype=self.compute_dtype,
            )
        self._tx = {}
        self._schedules = {}

    # ------------------------------------------------------------ features

    def features(self, raw_batch: Dict) -> Dict[str, jnp.ndarray]:
        """SAMS keeps the frames axis (B, N, H, W, C) — no channel folding
        (the reference keeps 5D tensors for this model, SURVEY §2.7)."""
        return preprocess_batch(raw_batch, self.preprocess_config)

    # --------------------------------------------------------------- state

    def init_state(self, rng, steps_per_epoch: int) -> TrainState:
        opt = self.opt
        H, W = opt.fine_height, opt.fine_width
        B, N = 1, self.n_frames_total
        num_prev = max(N - 1, 1)
        enc_ch = channels_for(opt.encoder_input)
        rngs = jax.random.split(rng, 3)

        prev_frames = jnp.zeros((B, num_prev, H, W, 3)) if N > 1 else None
        prev_maps = jnp.zeros((B, num_prev, H, W, enc_ch)) if N > 1 else None
        current = {
            name: jnp.zeros((B, H, W, channels_for(name))) for name in self.inputs
        }
        # jit the inits: eagerly-executed init dispatches thousands of tiny
        # ops (a round trip each on remote-tunneled devices); one compiled
        # program initializes in seconds
        g_vars = jax.jit(self.generator.init)(
            rngs[0], prev_frames, prev_maps, current
        )

        def make_tx(lr):
            return make_optimizer(
                lr, getattr(opt, "keep_epochs", 5), getattr(opt, "decay_epochs", 5),
                steps_per_epoch, getattr(opt, "accumulated_batches", 1),
            )

        lr = getattr(opt, "lr", 1e-4)
        lr_d = getattr(opt, "lr_D", 3e-4)
        self._tx = {"generator": make_tx(lr)}
        self._schedules["lr"] = keep_decay_schedule(
            lr, getattr(opt, "keep_epochs", 5), getattr(opt, "decay_epochs", 5),
            steps_per_epoch,
        )
        nets = {
            "generator": net_state_from_variables(g_vars, self._tx["generator"])
        }
        if self.is_train:
            sem_ch = self.person_channels + self.cloth_channels
            dm_vars = jax.jit(self.multiscale_discriminator.init)(
                rngs[1], jnp.zeros((2 * B, H, W, sem_ch + RGB_CHANNELS))
            )
            dt_vars = jax.jit(self.temporal_discriminator.init)(
                rngs[2], jnp.zeros((2 * B, H, W, self.temporal_in_channels))
            )
            self._tx["d_multi"] = make_tx(lr_d)
            self._tx["d_temporal"] = make_tx(lr_d)
            nets["d_multi"] = net_state_from_variables(dm_vars, self._tx["d_multi"])
            nets["d_temporal"] = net_state_from_variables(
                dt_vars, self._tx["d_temporal"]
            )
        return TrainState.create(nets)

    # ----------------------------------------------------- frame generation

    def generate_n_frames(self, g_params, g_stats, feats, train: bool):
        """Autoregressive clip synthesis (sams_model.py:521-556) as a
        ``lax.scan`` over the active frame range — the generator body compiles
        ONCE instead of n_frames times (SURVEY §5.7's frame-loop design).

        Returns (fake_frame, labelmaps_this_frame, all_gen_frames, new_stats).
        Per-frame inputs that depend on the frame index in a shape-changing way
        (the zero-padded prev-labelmap window, sams_model.py:558-589) are
        precomputed and stacked as scan inputs; the prev-frame window is the
        reference's rotated index_select of the ring buffer — a ``jnp.roll`` by
        the traced index — detached (stop_gradient) for the generator input
        exactly like the reference's .detach().
        """
        opt = self.opt
        N = self.n_frames_total
        start_idx = N - self.n_frames_now
        labelmap = {key: feats[key] for key in self.inputs}
        enc_maps = feats[opt.encoder_input]  # (B, N, H, W, enc_ch)
        image = feats["image"]
        flows = feats.get("flow") if opt.flow_warp else None
        if not train and self.compute_dtype is not None:
            # eval serving: the conditioning maps are conv inputs read at
            # every SPADE of every frame — store them at compute precision.
            # `flows` stays f32: it feeds resample2d as pixel displacements.
            labelmap = {
                k: v.astype(self.compute_dtype) for k, v in labelmap.items()
            }
            enc_maps = enc_maps.astype(self.compute_dtype)

        if N == 1:
            current_maps = {k: v[:, 0] for k, v in labelmap.items()}
            variables = {"params": g_params, **g_stats}
            if train:
                out, new_stats = self.generator.apply(
                    variables, None, None, current_maps,
                    train=True, update_stats=True,
                    mutable=list(g_stats.keys()) or ["batch_stats"],
                )
            else:
                out, new_stats = self.generator.apply(
                    variables, None, None, current_maps, train=False
                ), g_stats
            fake = out[..., :RGB_CHANNELS]
            if opt.flow_warp:
                wmask = out[..., RGB_CHANNELS:]
                warped = resample2d(jnp.zeros_like(fake), flows[:, 0])
                fake = (1 - wmask) * warped + wmask * fake
            return fake, current_maps, fake[:, None], new_stats

        # stacked per-frame scan inputs for t in [start_idx, N)
        ts = list(range(start_idx, N))
        prev_maps_per_t = jnp.stack(
            [
                jnp.concatenate(
                    [
                        jnp.zeros_like(enc_maps[:, : (N - 1) - t]),
                        enc_maps[:, (N - 1) - t: N - 1],
                    ],
                    axis=1,
                )
                for t in ts
            ],
            axis=0,
        )  # (T, B, N-1, H, W, enc_ch)
        current_per_t = {
            k: jnp.stack([v[:, t] for t in ts], axis=0) for k, v in labelmap.items()
        }
        flows_per_t = (
            jnp.stack([flows[:, t] for t in ts], axis=0) if opt.flow_warp else None
        )
        mutable_keys = list(g_stats.keys()) or ["batch_stats"]

        def _train_apply(variables, prev_frames, prev_maps, current_maps):
            return self.generator.apply(
                variables, prev_frames, prev_maps, current_maps,
                train=True, update_stats=True, mutable=mutable_keys,
            )

        if getattr(self.opt, "remat", False):
            # rematerialize each frame's generator activations in the backward
            # pass: trades recompute FLOPs for HBM (enables bigger clips/batches)
            _train_apply = jax.checkpoint(_train_apply)

        def body(carry, xs):
            window, stats = carry  # (B, N-1, H, W, C): prev frames for THIS t
            prev_maps, current_maps, flow_t = xs
            # The reference's rotated ring-buffer window (sams_model.py:241-272,
            # buffer[(t+1)%N .. (t+N-1)%N]) equals [oldest .. newest] with
            # leading zeros for not-yet-generated frames — exactly a
            # shift-and-append carry. The static shift replaces a traced
            # jnp.roll + dynamic_update of the full (B, N, H, W, C) buffer
            # (two whole-buffer copies per frame) with one (N-1)-window shift.
            prev_frames = jax.lax.stop_gradient(window)
            variables = {"params": g_params, **stats}
            if train:
                out, new_stats = _train_apply(
                    variables, prev_frames, prev_maps, current_maps
                )
                stats = new_stats if new_stats else stats
            else:
                out = self.generator.apply(
                    variables, prev_frames, prev_maps, current_maps, train=False
                )
            fake = out[..., :RGB_CHANNELS]
            if opt.flow_warp:
                wmask = out[..., RGB_CHANNELS:]
                # reference: buffer[t-1] if t > 0 else zeros — which is the
                # window's newest slot in both cases (zero until generated)
                last_gen = window[:, -1]
                warped = resample2d(last_gen, flow_t)
                fake = (1 - wmask) * warped + wmask * fake
            window = jnp.concatenate(
                [window[:, 1:], fake[:, None].astype(window.dtype)], axis=1
            )
            return (window, stats), fake

        # eval serving carries the window at the compute precision; training
        # keeps the input dtype so the loss math is unchanged
        win_dtype = image.dtype if train else (
            self.compute_dtype or image.dtype
        )
        init_window = jnp.zeros(
            image.shape[:1] + (N - 1,) + image.shape[2:], win_dtype
        )
        # SHINEON_EVAL_SCAN_UNROLL unrolls the eval frame loop (opt-in
        # experiment knob; default ROLLED). Measured same-day at the serving
        # config (B16, 256x192, int8): full unroll is a dead-end — the
        # standalone clip got SLOWER (458.7 vs 446.7 ms) and the chained
        # bench harness OOMs (RESOURCE_EXHAUSTED) because the unrolled body
        # holds every frame's buffers live. docs/PERF_NOTES.md round 5.
        unroll = 1
        if not train:
            unroll = int(os.environ.get("SHINEON_EVAL_SCAN_UNROLL", "1"))
            unroll = max(1, min(unroll, len(ts)))
        (window, stats), fakes = jax.lax.scan(
            body, (init_window, g_stats),
            (prev_maps_per_t, current_per_t, flows_per_t),
            unroll=unroll,
        )
        fake_frame = fakes[-1]
        # all-generated buffer for the temporal D / masking: frames before
        # start_idx were never generated (zeros), then the scan outputs
        gen_frames = jnp.moveaxis(fakes, 0, 1)  # (B, T, H, W, C)
        if start_idx:
            buffer = jnp.concatenate(
                [jnp.zeros_like(gen_frames[:, :1]).repeat(start_idx, axis=1),
                 gen_frames],
                axis=1,
            )
        else:
            buffer = gen_frames
        current_maps = {k: v[:, N - 1] for k, v in labelmap.items()}
        return fake_frame, current_maps, buffer, stats

    def mask_unused_frames(self, tensor: jnp.ndarray) -> jnp.ndarray:
        """Zero the first (total - now) frames (sams_model.py:663-678)."""
        n_mask = self.n_frames_total - self.n_frames_now
        if n_mask == 0:
            return tensor
        mask = jnp.concatenate(
            [
                jnp.zeros_like(tensor[:, :n_mask]),
                jnp.ones_like(tensor[:, n_mask:]),
            ],
            axis=1,
        )
        return tensor * mask

    @staticmethod
    def _fold(x: jnp.ndarray) -> jnp.ndarray:
        """(B, N, H, W, C) -> (B, H, W, N*C)."""
        from shineon_tpu.datasets.n_frames_interface import fold_frames_into_channels

        return fold_frames_into_channels(x)

    def discriminate(self, disc, variables, sem, fake, real, update_stats=False):
        """One concatenated fake+real pass, then split
        (sams_model.py:702-720)."""
        fake_concat = jnp.concatenate([sem, fake], axis=-1)
        real_concat = jnp.concatenate([sem, real], axis=-1)
        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        if update_stats:
            out, new_vars = disc.apply(
                variables, both, update_stats=True,
                mutable=["batch_stats"],
            )
        else:
            out, new_vars = disc.apply(variables, both), None
        pred_fake, pred_real = _split_predictions(out)
        return pred_fake, pred_real, new_vars

    # --------------------------------------------------------------- losses

    def _generator_losses(self, g_params, state, feats, train: bool):
        opt = self.opt
        fake_frame, current_maps, all_frames, new_stats = self.generate_n_frames(
            g_params, state.nets["generator"].stats, feats, train
        )
        ground_truth = feats["image"][:, -1]
        sem = jnp.concatenate(
            [current_maps[k] for k in self.inputs], axis=-1
        )
        # --reference_gan_semantics reproduces the reference's variable mix-up
        # (pred_real into the G criterion, sams_model.py:616-620, 651-655);
        # the default feeds pred_fake (standard hinge-GAN, see module docstring)
        ref_semantics = getattr(opt, "reference_gan_semantics", False)
        dm = state.nets["d_multi"]
        pred_fake, pred_real, _ = self.discriminate(
            self.multiscale_discriminator, variables_of(dm), sem,
            fake_frame, ground_truth,
        )
        loss_adv_multi = self.criterion_gan(
            pred_real if ref_semantics else pred_fake, True,
            for_discriminator=False,
        ) * opt.wt_multiscale

        # temporal: whole clip, progressive-masked, frame-folded
        reals = self._fold(self.mask_unused_frames(feats["image"]))
        fakes = self._fold(all_frames)  # pre-masked by construction
        sem_t = self._fold(self.mask_unused_frames(feats[opt.encoder_input]))
        dt = state.nets["d_temporal"]
        predf_t, predr_t, _ = self.discriminate(
            self.temporal_discriminator, variables_of(dt), sem_t, fakes, reals
        )
        loss_adv_temp = self.criterion_gan(
            predr_t if ref_semantics else predf_t, True,
            for_discriminator=False,
        ) * opt.wt_temporal

        loss_l1 = l1_loss(fake_frame, ground_truth) * opt.wt_l1
        loss_vgg = self.criterion_vgg(fake_frame, ground_truth) * opt.wt_vgg
        loss_G = loss_l1 + loss_vgg + loss_adv_multi + loss_adv_temp
        metrics = {
            "loss": loss_G,
            "loss/G/adv_multiscale": loss_adv_multi,
            "loss/G/adv_temporal": loss_adv_temp,
            "loss/G/l1+vgg": loss_l1 + loss_vgg,
            "loss/G/l1": loss_l1,
            "loss/G/vgg": loss_vgg,
        }
        return loss_G, (metrics, new_stats, fake_frame, all_frames, current_maps)

    # ---------------------------------------------------------------- steps

    def make_train_step(self):
        tx = self._tx
        if getattr(self.opt, "fast_gan_step", False):
            # ADVICE r3: the approximation must announce itself — the default
            # is the reference's exact per-optimizer regeneration
            from shineon_tpu.utils.log import get_logger

            get_logger().warning(
                "--fast_gan_step active: discriminator updates reuse the "
                "pre-update generator's frames (approximation; pass "
                "--exact_gan_step for the reference's per-optimizer "
                "regeneration semantics)"
            )

        def apply_updates(net: NetState, grads, which: str, new_stats=None):
            updates, new_opt = tx[which].update(grads, net.opt_state, net.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, net.params, updates)
            return NetState(
                new_params, new_stats if new_stats is not None else net.stats, new_opt
            )

        @donating_jit
        def train_step(state: TrainState, raw_batch: Dict):
            opt = self.opt
            feats = self.features(raw_batch)

            # ---- 1. generator update
            def g_loss_fn(g_params):
                return self._generator_losses(g_params, state, feats, train=True)

            (loss_G, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.nets["generator"].params
            )
            metrics, g_stats, g_fake, g_frames, g_maps = aux
            g_net = apply_updates(
                state.nets["generator"], g_grads, "generator", new_stats=g_stats
            )

            if getattr(opt, "fast_gan_step", False):
                # reuse the G-step clip (detached) for both D updates — skips a
                # full 5-frame regeneration per step (documented approximation)
                fake_frame = jax.lax.stop_gradient(g_fake)
                all_frames = jax.lax.stop_gradient(g_frames)
                current_maps = g_maps
            else:
                # ---- 2. regenerate with the UPDATED generator, detached
                # (the reference's per-optimizer regeneration semantics,
                # sams_model.py:598-608)
                fake_frame, current_maps, all_frames, g_stats2 = (
                    self.generate_n_frames(g_net.params, g_net.stats, feats,
                                           train=True)
                )
                fake_frame = jax.lax.stop_gradient(fake_frame)
                all_frames = jax.lax.stop_gradient(all_frames)
                g_net = NetState(g_net.params, g_stats2, g_net.opt_state)

            ground_truth = feats["image"][:, -1]
            sem = jnp.concatenate([current_maps[k] for k in self.inputs], axis=-1)

            # ---- 3. multiscale D update
            def dm_loss_fn(dm_params):
                dm = state.nets["d_multi"]
                variables = {"params": dm_params, **dm.stats}
                pf, pr, new_vars = self.discriminate(
                    self.multiscale_discriminator, variables, sem, fake_frame,
                    ground_truth, update_stats=True,
                )
                loss_fake = self.criterion_gan(pf, False, True)
                loss_real = self.criterion_gan(pr, True, True)
                return (loss_fake + loss_real) / 2, (loss_real, loss_fake, new_vars)

            (loss_Dm, (dm_real, dm_fake, dm_stats)), dm_grads = jax.value_and_grad(
                dm_loss_fn, has_aux=True
            )(state.nets["d_multi"].params)
            dm_net = apply_updates(
                state.nets["d_multi"], dm_grads, "d_multi",
                new_stats=dm_stats or state.nets["d_multi"].stats,
            )

            # ---- 4. temporal D update
            reals = self._fold(self.mask_unused_frames(feats["image"]))
            fakes = self._fold(all_frames)
            sem_t = self._fold(self.mask_unused_frames(feats[opt.encoder_input]))

            def dt_loss_fn(dt_params):
                dt = state.nets["d_temporal"]
                variables = {"params": dt_params, **dt.stats}
                pf, pr, new_vars = self.discriminate(
                    self.temporal_discriminator, variables, sem_t, fakes, reals,
                    update_stats=True,
                )
                loss_fake = self.criterion_gan(pf, False, True)
                loss_real = self.criterion_gan(pr, True, True)
                return (loss_fake + loss_real) / 2, (loss_real, loss_fake, new_vars)

            (loss_Dt, (dt_real, dt_fake, dt_stats)), dt_grads = jax.value_and_grad(
                dt_loss_fn, has_aux=True
            )(state.nets["d_temporal"].params)
            dt_net = apply_updates(
                state.nets["d_temporal"], dt_grads, "d_temporal",
                new_stats=dt_stats or state.nets["d_temporal"].stats,
            )

            metrics.update({
                "loss/D/multi": loss_Dm,
                "loss/D/multi_fake": dm_fake,
                "loss/D/multi_real": dm_real,
                "loss/D/temporal": loss_Dt,
                "loss/D/temporal_fake": dt_fake,
                "loss/D/temporal_real": dt_real,
                "lr": self._schedules["lr"](state.step),
            })
            new_state = state.replace(
                step=state.step + 1,
                nets={
                    "generator": g_net, "d_multi": dm_net, "d_temporal": dt_net
                },
            )
            return new_state, metrics

        return train_step

    def make_val_step(self):
        @jax.jit
        def val_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            loss_G, (metrics, _, fake_frame, _, _) = self._generator_losses(
                state.nets["generator"].params, state, feats, train=False
            )
            ground_truth = feats["image"][:, -1]
            # checkpoint on L1+VGG only (sams_model.py:507-512)
            metrics["checkpoint_on"] = (
                l1_loss(fake_frame, ground_truth) * self.opt.wt_l1
                + self.criterion_vgg(fake_frame, ground_truth) * self.opt.wt_vgg
            )
            return metrics

        return val_step

    def make_visual_step(self):
        @jax.jit
        def visual_step(state: TrainState, raw_batch: Dict):
            feats = self.features(raw_batch)
            _, _, all_frames, _ = self.generate_n_frames(
                state.nets["generator"].params,
                state.nets["generator"].stats, feats, train=False,
            )
            out = {"all_gen_frames": all_frames, "image": feats["image"],
                   "cloth": feats["cloth"]}
            for name in ("silhouette", "im_head", "im_cocopose", "densepose",
                         "flow_image"):
                if name in feats:
                    out[name] = feats[name]
            return out

        return visual_step

    def visual_rows(self, v: Dict[str, np.ndarray]) -> List[List[np.ndarray]]:
        """One row per input type, frames unbound along the clip
        (sams_model.py:722-742)."""
        rows = []
        names = self.replace_actual_with_visual()
        for name in names:
            if name in v and v[name].ndim == 5:
                rows.append([v[name][:, i] for i in range(v[name].shape[1])])
        for key in ("cloth", "all_gen_frames", "image"):
            rows.append([v[key][:, i] for i in range(v[key].shape[1])])
        return rows

    # ----------------------------------------------------------------- test

    def test_step(self, state, device_batch, host_batch) -> None:
        """Write generated final frames. (The reference's SAMS test_step is a
        no-op, sams_model.py:487-488 — this implements the useful behavior,
        matching UnetMaskModel's export layout.)"""
        im_names = host_batch["image_name"]
        dataset_names = host_batch["dataset_name"]
        if isinstance(dataset_names, str):
            dataset_names = [dataset_names] * len(im_names)
        dataset_names = [d[-1] if isinstance(d, list) else d for d in dataset_names]
        if im_names and isinstance(im_names[0], list):
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
        if all(osp.exists(s) for s in get_save_paths(try_on_dirs, im_names)):
            return
        if not hasattr(self, "_test_fn"):
            @jax.jit
            def test_fn(state, raw_batch):
                feats = self.features(raw_batch)
                fake_frame, _, _, _ = self.generate_n_frames(
                    state.nets["generator"].params,
                    state.nets["generator"].stats, feats, train=False,
                )
                return fake_frame

            self._test_fn = test_fn
        fake = jax.device_get(self._test_fn(state, device_batch))
        save_images(fake, im_names, try_on_dirs)


def _split_predictions(pred):
    """Split the concatenated fake/real predictions (sams_model.py:745-766)."""
    if isinstance(pred, (list, tuple)):
        fake, real = [], []
        for p in pred:
            if isinstance(p, (list, tuple)):
                fake.append([t[: t.shape[0] // 2] for t in p])
                real.append([t[t.shape[0] // 2:] for t in p])
            else:
                fake.append(p[: p.shape[0] // 2])
                real.append(p[p.shape[0] // 2:])
        return fake, real
    return pred[: pred.shape[0] // 2], pred[pred.shape[0] // 2:]
