"""SAMS (Self-Attentive MultiSPADE) generator, flax/NHWC.

Reference: models/networks/sams/sams_generator.py:19-317. Encoder (plain-SPADE
resblocks + 0.5x nearest downsample over the previous generated frames,
conditioned on the prev-frame encoder labelmaps) -> Middle (``num_middle``
channel-preserving SAMS blocks conditioned on the current labelmap dict) ->
Decoder (2x nearest upsample + SAMS blocks) -> final conv to RGB (+ weight mask
when flow_warp). Network size follows the ngf_base**pow schedule; attention
placement by (possibly negative) string indices.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.datasets.channels import RGB_CHANNELS, MASK_CHANNELS, channels_for
from shineon_tpu.networks.sams.attentive_multispade import AttentiveMultiSpade
from shineon_tpu.networks.sams.multispade import MultiSpade
from shineon_tpu.networks.sams.spade import SPADE, AnySpadeResBlock, maybe_int8_conv


def _resize_nearest_scale(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """torch nn.Upsample(mode="nearest") semantics: 0.5x keeps the EVEN pixels
    (strided slice), 2x repeats each pixel."""
    if scale == 0.5:
        return x[:, ::2, ::2, :]
    if scale == 2.0:
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    B, H, W, C = x.shape
    return jax.image.resize(
        x, (B, int(H * scale), int(W * scale), C), method="nearest"
    )


class SamsGenerator(nn.Module):
    """See module docstring. Config mirrors the reference flags."""

    # architecture flags (sams_generator.py:44-104)
    norm_G: str = "spectralspadesyncbatch3x3"
    ngf_base: int = 2
    ngf_pow_outer: int = 6
    ngf_pow_inner: int = 10
    ngf_pow_step: int = 1
    num_middle: int = 3
    attention_middle_indices: Tuple[str, ...] = ()
    attention_decoder_indices: Tuple[str, ...] = ()
    activation: str = "relu"
    # data plan
    n_frames_total: int = 5
    flow_warp: bool = False
    encoder_input: str = "flow"
    inputs: Tuple[str, ...] = ("agnostic", "cloth", "densepose", "flow")
    dtype: Optional[Any] = None

    @staticmethod
    def modify_commandline_options(parser, is_train):
        from shineon_tpu.networks import add_base_network_options

        parser = add_base_network_options(parser, is_train)
        parser.add_argument("--norm_G", default="spectralspadesyncbatch3x3")
        parser.add_argument(
            "--ngf_base", type=int, default=2,
            help="feature widths are ngf_base ** pow at each stage",
        )
        parser.add_argument(
            "--ngf_power_start", "--ngf_pow_outer", dest="ngf_pow_outer",
            type=int, default=6,
            help="number of features at the outer ends = ngf_base ** ngf_pow_outer",
        )
        parser.add_argument(
            "--ngf_power_end", "--ngf_pow_inner", dest="ngf_pow_inner",
            type=int, default=10,
            help="INCLUSIVE! number of features in the middle = ngf_base ** ngf_pow_inner",
        )
        parser.add_argument(
            "--ngf_pow_step", type=int, default=1,
            help="increment the power this much between layers until >= ngf_pow_inner",
        )
        parser.add_argument(
            "--num_middle", type=int, default=3,
            help="count of width-preserving SAMS blocks between encoder and decoder",
        )
        parser.add_argument(
            "--attention_middle_indices", nargs="*", default=[],
            help="which middle blocks get self-attention (negative indices ok)",
        )
        parser.add_argument(
            "--attention_decoder_indices", nargs="*", default=[],
            help="which decoder blocks get self-attention (negative indices ok)",
        )
        return parser

    def _num_prev_frames(self) -> int:
        return max(self.n_frames_total - 1, 1)

    @nn.compact
    def __call__(
        self,
        prev_n_frames: Optional[jnp.ndarray],
        prev_n_labelmaps: Optional[jnp.ndarray],
        current_labelmap_dict: Dict[str, jnp.ndarray],
        train: bool = True,
        update_stats: bool = False,
    ) -> jnp.ndarray:
        """
        Args:
          prev_n_frames: (B, N-1, H, W, 3) previous synthesized frames (or None
            when n_frames_total == 1 — zeros are substituted).
          prev_n_labelmaps: (B, N-1, H, W, enc_ch) encoder labelmaps for those
            frames (or None).
          current_labelmap_dict: {input_name: (B, H, W, C)} for the current frame.

        Returns: (B, H, W, out_channels) for the current frame.
        """
        num_prev = self._num_prev_frames()
        in_channels = RGB_CHANNELS * num_prev
        out_channels = (
            RGB_CHANNELS + MASK_CHANNELS if self.flow_warp else RGB_CHANNELS
        )
        reference = next(iter(current_labelmap_dict.values()))
        B, H, W = reference.shape[0], reference.shape[-3], reference.shape[-2]
        enc_ch = channels_for(self.encoder_input)

        if self.n_frames_total > 1:
            x = prev_n_frames.reshape(B, num_prev, H, W, RGB_CHANNELS)
            x = jnp.moveaxis(x, 1, -2).reshape(B, H, W, in_channels)
            maps = prev_n_labelmaps.reshape(B, num_prev, H, W, enc_ch)
            enc_maps = jnp.moveaxis(maps, 1, -2).reshape(B, H, W, enc_ch * num_prev)
        else:
            x = jnp.zeros((B, H, W, in_channels), reference.dtype)
            enc_maps = jnp.zeros((B, H, W, enc_ch), reference.dtype)

        NGF_OUTER = int(self.ngf_base ** self.ngf_pow_outer)
        NGF_INNER = int(self.ngf_base ** self.ngf_pow_inner)
        pad1 = ((1, 1), (1, 1))

        block = functools.partial(
            AnySpadeResBlock,
            norm_G=self.norm_G,
            activation=self.activation,
            dtype=self.dtype,
        )
        spade_kwargs = dict(train=train, update_stats=update_stats)

        # ----- ENCODE -----
        conv_ctor = maybe_int8_conv(train)  # int8 serving covers these, too
        x = conv_ctor(NGF_OUTER, (3, 3), padding=pad1, dtype=self.dtype,
                      name="encode_conv_in")(x)
        enc_pows = list(range(self.ngf_pow_outer, self.ngf_pow_inner, self.ngf_pow_step))
        out_feat = NGF_OUTER
        for i, pow_ in enumerate(enc_pows):
            in_feat = int(self.ngf_base ** pow_)
            out_feat = int(self.ngf_base ** (pow_ + self.ngf_pow_step))
            x = block(
                fin=in_feat, fout=out_feat, spade_ctor=SPADE,
                name=f"encode_{i}",
            )(x, enc_maps, **spade_kwargs)
            x = _resize_nearest_scale(x, 0.5)
        if out_feat != NGF_INNER:  # the reference logs and patches this, too
            x = block(
                fin=out_feat, fout=NGF_INNER, spade_ctor=SPADE, name="encode_extra"
            )(x, enc_maps, **spade_kwargs)
            x = _resize_nearest_scale(x, 0.5)

        # ----- MIDDLE -----
        current = dict(current_labelmap_dict)
        for i in range(self.num_middle):
            spade_cls = _choose_spade(self.attention_middle_indices, i, self.num_middle)
            x = block(
                fin=NGF_INNER, fout=NGF_INNER, spade_ctor=spade_cls,
                name=f"middle_{i}",
            )(x, current, **spade_kwargs)

        # ----- DECODE -----
        dec_pows = list(range(self.ngf_pow_inner, self.ngf_pow_outer, -self.ngf_pow_step))
        out_feat = NGF_INNER
        for i, pow_ in enumerate(dec_pows):
            in_feat = int(self.ngf_base ** pow_)
            out_feat = int(self.ngf_base ** (pow_ - self.ngf_pow_step))
            spade_cls = _choose_spade(self.attention_decoder_indices, i, len(dec_pows))
            x = _resize_nearest_scale(x, 2.0)
            x = block(
                fin=in_feat, fout=out_feat, spade_ctor=spade_cls,
                name=f"decode_{i}",
            )(x, current, **spade_kwargs)
        if out_feat != NGF_OUTER:
            spade_cls = (
                AttentiveMultiSpade if self.attention_decoder_indices else MultiSpade
            )
            x = _resize_nearest_scale(x, 2.0)
            x = block(
                fin=out_feat, fout=NGF_OUTER, spade_ctor=spade_cls, name="decode_extra"
            )(x, current, **spade_kwargs)
        x = conv_ctor(out_channels, (3, 3), padding=pad1, dtype=self.dtype,
                      name="decode_conv_out")(x)
        if train:
            # training keeps the composite/warp/loss math in f32
            return x.astype(jnp.float32)
        # eval serving stays at the compute precision end-to-end (the frame
        # window carry, flow-warp composite, and export all handle bf16)
        return x


def _choose_spade(attn_indices: Sequence[str], i: int, total_layers: int):
    """Attention placement by positive/negative string indices
    (sams_generator.py:311-317)."""
    indices = [str(s) for s in attn_indices]
    if str(i) in indices or str(i - total_layers) in indices:
        return AttentiveMultiSpade
    return MultiSpade
