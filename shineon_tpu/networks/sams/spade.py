"""SPADE normalization + AnySpadeResBlock, flax/NHWC.

Reference: models/networks/sams/spade.py:19-192 (NVIDIA SPADE lineage). The
``config_text`` grammar (e.g. ``spadesyncbatch3x3``) is preserved: param-free
norm type + SPADE MLP kernel size. Sync-batch collapses to batch statistics
over the (globally sharded) batch — see shineon_tpu.networks.normalization.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.networks.activation import (
    get_activation_fn,
    get_resblock_activation_fn,
)
from shineon_tpu.networks.normalization import InstanceNorm, SyncBatchNorm
from shineon_tpu.ops.fused_spade import fused_multispade_modulate


def fused_spade_enabled(train: bool) -> bool:
    """Whether SPADE modulation should run through the fused Pallas kernel.

    Default OFF: in-graph XLA pipelines the SPADE conv streams at ~67% MFU
    (docs/SPADE_KERNEL_BENCH.md), which the measured bf16 kernel does not
    beat at the dominant full-resolution sites. ``SHINEON_FUSED_SPADE=1``
    opts in everywhere (kernel correctness is production-tested; on non-TPU
    backends the fused op falls back to the XLA reference formulation).
    For the int8 serving mode, the per-site winners table below
    (:func:`fused_spade_chain_enabled`) turns the kernel on automatically
    where it measures faster than the XLA int8 path.
    """
    return os.environ.get("SHINEON_FUSED_SPADE") == "1" and not train


# (H, W, C) sites where the in-kernel int8 gamma/beta path beats the XLA
# int8 serving formulation on the v5e (tools/bench_fused_spade.py --int8,
# serving batch 16, same-day A/B): 1.04-1.08x. The remaining production
# sites (256x192xC64, 64x48xC256, 16x12xC1024) measured 0.90-0.98x and stay
# on XLA. Measured on the L=4-labelmap MultiSpade chain of the production
# SamsGenerator; docs/SPADE_KERNEL_BENCH.md has the full table.
_FUSED_INT8_WIN_SITES = frozenset({
    (256, 192, 128),
    (128, 96, 128),
    (128, 96, 256),
    (64, 48, 512),
    (32, 24, 512),
    (32, 24, 1024),
})


def fused_spade_chain_enabled(train: bool, shape=None) -> bool:
    """Site-aware gate for the whole-chain fused MultiSpade kernel.

    ``SHINEON_FUSED_SPADE=1`` forces the kernel on everywhere;
    ``SHINEON_FUSED_SPADE=sites`` uses it only in the int8 serving mode at
    the isolated-measurement winner sites (``_FUSED_INT8_WIN_SITES``).
    Default: OFF. The in-kernel int8 path wins 1.04-1.08x at 6/9 production
    sites when timed in isolation, but the same-day e2e A/B measured the
    sites mode at 141.8 f/s vs 154.6 f/s without it — in-graph XLA overlaps
    the quantize/pack work with neighboring conv streams while the kernel
    launch serializes it (docs/SPADE_KERNEL_BENCH.md round-4 table)."""
    if train:
        return False
    env = os.environ.get("SHINEON_FUSED_SPADE")
    if env == "1":
        return True
    if env != "sites" or shape is None or not int8_spade_enabled(train):
        return False
    return tuple(shape) in _FUSED_INT8_WIN_SITES


def parse_spade_config(config_text: str) -> tuple[str, int]:
    """'spadesyncbatch3x3' -> ('syncbatch', 3) (reference spade.py:36-59)."""
    assert config_text.startswith("spade")
    parsed = re.search(r"spade(\D+)(\d)x\d", config_text)
    norm_type = str(parsed.group(1))
    if norm_type not in ("instance", "syncbatch", "batch"):
        raise ValueError(
            "SPADE config names an unknown param-free norm: %s" % norm_type
        )
    return norm_type, int(parsed.group(2))


def _resize_nearest(segmap: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch F.interpolate(mode="nearest") semantics: src = floor(dst * in/out)
    (jax.image.resize uses half-pixel rounding, which picks different pixels
    on downscale — parity with converted checkpoints requires torch's rule)."""
    in_h, in_w = segmap.shape[-3], segmap.shape[-2]
    if (in_h, in_w) == (h, w):
        return segmap
    rows = jnp.floor(jnp.arange(h) * (in_h / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (in_w / w)).astype(jnp.int32)
    out = jnp.take(segmap, rows, axis=-3)
    return jnp.take(out, cols, axis=-2)


class ConvParams(nn.Module):
    """Parameter holder with flax ``nn.Conv``'s exact variable tree
    ({kernel: (ks, ks, cin, cout), bias: (cout,)}, lecun-normal/zeros init)
    so SPADE can share one param set between the unfused conv path and the
    fused Pallas kernel without breaking converted checkpoints."""

    features: int
    in_features: int
    kernel_size: int = 3

    def setup(self):
        ks = self.kernel_size
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (ks, ks, self.in_features, self.features), jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def __call__(self):
        return self.kernel, self.bias


def _conv_same(v, kernel, bias, compute_dtype, feature_group_count=1):
    """nn.Conv(dtype=cd) semantics: cast inputs, SAME zero pad, NHWC."""
    ks = kernel.shape[0]
    p = ks // 2
    out = jax.lax.conv_general_dilated(
        v.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    return out + bias.astype(compute_dtype)


def int8_spade_enabled(train: bool) -> bool:
    """Quantized (weight + dynamic-activation int8) gamma/beta convs at
    serving. The SPADE modulation convs are ~85% of the generator FLOPs
    (docs/PERF_NOTES.md round-3 correction) and the v5e MXU's int8 path runs
    them 1.3-1.6x faster than bf16 (tools/probe_int8_conv.py). Opt-in:
    ``SHINEON_INT8_SPADE=1``; eval only."""
    return os.environ.get("SHINEON_INT8_SPADE") == "1" and not train


def int8_conv_profitable(ks: int, cin: int, cout: int, hw: int) -> bool:
    """Per-shape dispatch gate for the int8 serving path. Set by SAME-DAY
    E2E A/Bs, not by isolated per-shape timings — the round-5 roof census
    (tools/serving_roof_census.py) flagged ten "misgated" shapes whose
    isolated bf16 time beats int8, but flipping them regressed the real
    clip 447 -> 459 ms: in-graph their quantize elementwise fuses into
    neighboring streams for free and the int8 buffers cost HALF the HBM
    traffic, so isolated wins do not transfer (the round-4 Pallas lesson
    again). The two rules that DID survive e2e:

    * ``ks >= 3``: routing the 1x1 resblock-shortcut convs to bf16 measured
      446.7 -> 438.0 ms e2e (+2%) — K<=1024 with no spatial reuse never
      amortizes its quantize/dequant passes, in isolation AND in-graph.
    * ``min(cin, cout) >= 64`` (env ``SHINEON_INT8_MIN_CH``): the round-4
      same-day scan (SPADE-only 150.5 / gated>=128 152.0 / ungated 152.9
      f/s) and the round-5 e2e A/Bs both land within noise of each other at
      64; raising it to 128 regressed e2e.

    ``SHINEON_INT8_MIN_HW`` (default 0 = off) keeps the spatial-area gate
    available for experiments; enabling it at 768 regressed e2e despite the
    16x12 sites' isolated losses.
    """
    min_ch = int(os.environ.get("SHINEON_INT8_MIN_CH", "64"))
    min_hw = int(os.environ.get("SHINEON_INT8_MIN_HW", "0"))
    return ks >= 3 and min(cin, cout) >= min_ch and hw >= min_hw


def _conv_same_int8(v, kernel, bias, compute_dtype):
    """3x3 SAME conv with symmetric int8 quantization: per-tensor dynamic
    activation scale, per-output-channel weight scale, int32 accumulation
    on the MXU's 2x-rate int8 path, dequantized + bias at f32.

    Every platform runs real int8 operands with an int32 accumulator (XLA:CPU
    lowers integer convs exactly), so the quantized numerics are
    platform-identical by construction — no float emulation, no 2^24
    accumulator-magnitude caveat."""
    p = kernel.shape[0] // 2
    vf = v.astype(jnp.float32)
    s = jnp.max(jnp.abs(vf)) / 127.0 + 1e-30
    vq = jnp.clip(jnp.round(vf / s), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ksc = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0 + 1e-30
    kq = jnp.clip(jnp.round(kf / ksc), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        vq, kq, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s * ksc) + bias.astype(jnp.float32)
    return out.astype(compute_dtype)


class Int8Conv(nn.Module):
    """Drop-in replacement for ``nn.Conv`` (identical param tree: ``kernel``
    HWIO + optional ``bias``, lecun-normal/zeros init) whose forward runs the
    symmetric-int8 MXU path of :func:`_conv_same_int8`.

    Constructed only at serving when ``int8_spade_enabled`` — round 4 extends
    the quantized serving mode beyond the SPADE gamma/beta convs to the
    resblock/encoder/final generator convs (the remaining 1.86 TFLOP/frame-
    batch, docs/PERF_NOTES.md). Because the param names match ``nn.Conv``,
    ``nn.SpectralNorm`` wraps it transparently (the kernel this module reads
    is already spectrally normalized) and converted checkpoints load
    unchanged. SAME padding only (all generator convs are SAME).

    Dispatch gate: :func:`int8_conv_profitable` — kernel >= 3x3 and both
    channel counts >= ``SHINEON_INT8_MIN_CH`` (default 64). Thresholds are
    set by same-day E2E A/Bs (see the gate's docstring: isolated per-shape
    wins from the roof census did NOT transfer in-graph; the 1x1 exclusion
    did, 446.7 -> 438.0 ms)."""

    features: int
    kernel_size: tuple
    padding: Any = None  # accepted for signature parity; SAME is implied
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = int(self.kernel_size[0])
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (ks, ks, x.shape[-1], self.features), jnp.float32,
        )
        cd = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        hw = x.shape[-3] * x.shape[-2]
        if not int8_conv_profitable(ks, x.shape[-1], self.features, hw):
            return _conv_same(x, kernel, bias, cd)
        return _conv_same_int8(x, kernel, bias, cd)


def maybe_int8_conv(train: bool):
    """The conv constructor for the current mode: ``nn.Conv`` in training /
    full-precision serving, :class:`Int8Conv` under int8 serving."""
    return Int8Conv if int8_spade_enabled(train) else nn.Conv


class SPADE(nn.Module):
    """Param-free norm + segmap-conditioned (1+gamma, beta) modulation
    (spade.py:61-103). ``norm_nc`` inferred from the input.

    ``mode``:
      * "apply": the reference formulation, conv by conv. With ``hidden``
        provided, the mlp_shared conv is skipped (a parent MultiSpade
        computed every label's hidden map in one block-diagonal conv).
        With int8 serving enabled, gamma/beta run as one merged int8 conv.
      * "apply_fused": one fused Pallas modulation (single label).
      * "args": create the same params but return the packed per-label
        arguments ``(ab, seg, wsh, bsh, wgb, bgb)`` for a parent MultiSpade
        to batch all labels into ONE fused kernel launch.
      * "shared_params": return ``(wsh, bsh)`` for the parent's
        block-diagonal mlp_shared packing.
    """

    config_text: str = "spadeinstance3x3"
    activation: str = "relu"
    nhidden: int = 128  # hardcoded in the reference too (spade.py:68)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray, train: bool = True,
                 mode: str = "apply", hidden: Optional[jnp.ndarray] = None):
        norm_type, ks = parse_spade_config(self.config_text)
        if norm_type == "instance":
            norm = InstanceNorm(affine=False, dtype=self.dtype)
            norm_args = ()
        else:
            # batch/syncbatch: both are global-batch statistics under pjit.
            norm = SyncBatchNorm(
                use_running_average=not train, affine=False, dtype=self.dtype
            )
            norm_args = ()

        segmap = _resize_nearest(segmap, x.shape[-3], x.shape[-2]).astype(x.dtype)
        C = x.shape[-1]
        actvn = get_activation_fn(self.activation)
        wsh, bsh = ConvParams(self.nhidden, segmap.shape[-1], ks,
                              name="mlp_shared")()
        if mode == "shared_params":
            # a parent MultiSpade batches all labels' mlp_shared convs into
            # one block-diagonal conv and passes the result back as `hidden`
            return wsh, bsh
        wg, bg = ConvParams(C, self.nhidden, ks, name="mlp_gamma")()
        wb, bb = ConvParams(C, self.nhidden, ks, name="mlp_beta")()

        if mode == "apply" or ks != 3:
            normalized = norm(x, *norm_args)
            # nn.Conv dtype semantics: None promotes input with the f32 params
            cd = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
            h = hidden if hidden is not None else actvn(
                _conv_same(segmap, wsh, bsh, cd)
            )
            if int8_spade_enabled(train) and ks == 3 and int8_conv_profitable(
                ks, self.nhidden, 2 * C, x.shape[-3] * x.shape[-2]
            ):
                # one merged [gamma | beta] conv: the hidden map quantizes
                # once and the MXU runs a single wider int8 matmul
                gb = _conv_same_int8(
                    h, jnp.concatenate([wg, wb], axis=-1),
                    jnp.concatenate([bg, bb]), cd,
                )
                gamma, beta = gb[..., :C], gb[..., C:]
            else:
                gamma = _conv_same(h, wg, bg, cd)
                beta = _conv_same(h, wb, bb, cd)
            return normalized * (1.0 + gamma) + beta

        # fused paths: fold the norm into per-(label, channel) affine coeffs
        a, b = norm(x, *norm_args, return_affine=True)
        ab = jnp.concatenate(
            [jnp.broadcast_to(a, (x.shape[0], C)),
             jnp.broadcast_to(b, (x.shape[0], C))], axis=-1,
        ).astype(jnp.float32)  # (B, 2C)
        wgb = jnp.concatenate([wg, wb], axis=-1)  # (3,3,nhid,2C)
        bgb = jnp.concatenate([bg, bb], axis=-1)  # (2C,)
        if mode == "args":
            return ab, segmap, wsh, bsh, wgb, bgb
        assert mode == "apply_fused", mode
        return fused_multispade_modulate(
            x, ab[:, None, :], [segmap], [wsh], [bsh], [wgb], [bgb],
            act_name=self.activation,
            quantized=int8_spade_enabled(train),
        )


class AnySpadeResBlock(nn.Module):
    """SPADE ResNet block parameterized by the spade class (spade.py:106-192).

    ``spade_ctor(name)`` builds the normalization sub-module; the segmap
    argument is whatever that spade class consumes (tensor or dict of tensors).
    Spectral norm wraps the convs when "spectral" is in norm_G.
    """

    fin: int
    fout: int
    norm_G: str
    spade_ctor: type = SPADE  # bound via functools.partial with its kwargs
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = True, update_stats: bool = False):
        learned_shortcut = self.fin != self.fout
        fmiddle = min(self.fin, self.fout)
        spectral = "spectral" in self.norm_G
        spade_config = self.norm_G.replace("spectral", "")
        actvn = get_resblock_activation_fn(self.activation)

        def conv(h, feats, ksize, use_bias, name):
            pad = ((ksize // 2, ksize // 2),) * 2
            ctor = maybe_int8_conv(train)
            layer = ctor(feats, (ksize, ksize), padding=pad, use_bias=use_bias,
                         dtype=self.dtype, name=name)
            if spectral:
                return nn.SpectralNorm(layer)(h, update_stats=update_stats)
            return layer(h)

        def spade(name):
            return self.spade_ctor(
                config_text=spade_config, activation=self.activation,
                dtype=self.dtype, name=name,
            )

        use_fused = fused_spade_enabled(train)

        def apply_spade(name, h):
            m = spade(name)
            if use_fused and isinstance(m, SPADE):
                # plain (single-label) SPADE also runs the fused kernel;
                # MultiSpade handles its own multi-label fusion internally
                return m(h, seg, train=train, mode="apply_fused")
            return m(h, seg, train=train)

        if learned_shortcut:
            x_s = apply_spade("norm_s", x)
            x_s = conv(x_s, self.fout, 1, False, "conv_s")
        else:
            x_s = x

        dx = apply_spade("spade_0", x)
        dx = conv(actvn(dx), fmiddle, 3, True, "conv_0")
        dx = apply_spade("spade_1", dx)
        dx = conv(actvn(dx), self.fout, 3, True, "conv_1")
        return x_s + dx
