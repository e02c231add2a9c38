"""Fused MultiSPADE modulation kernel (Pallas/TPU).

The SPADE stack (reference models/networks/sams/spade.py:61-103 and
multispade.py:8-77) dominates the SAMS generator's wall-clock: per label it
runs segmap -> 3x3 conv -> 128-channel hidden map -> two 3x3 convs -> gamma,
beta -> modulate. In XLA every one of those intermediates (the 128-channel
hidden map at full activation resolution, gamma, beta) round-trips through
HBM; measured round-2, the gamma/beta conv streams are ~83% of the generator
forward and run bandwidth-bound at ~165 GB/s (docs/PERF_NOTES.md). XLA does
not fuse conv->conv chains.

This kernel keeps the whole chain resident in VMEM: for each (batch, row-tile)
grid step it computes the hidden maps for ALL labels and the per-label
gamma/beta in-register, and applies the sequential modulation

    x <- (x * a_l + b_l) * (1 + gamma_l) + beta_l        (labels in sorted order)

writing only the final result. HBM traffic per multispade drops from
~11 activation-sized tensors to ~2 (x in, y out) plus the (tiny) segmaps.

Design (v2 — all-NHWC, aligned-lane formulation):
  * the per-label segmap->hidden convs are packed into ONE block-diagonal
    conv (labels concatenated on channels; weights block-diagonal), so all
    L hidden maps come out of 3 matmuls as a single 128*L-lane tensor and
    per-label views are FREE 128-aligned lane slices;
  * 3x3 convs are decomposed as (column-tap im2col) x (3 row-tap matmuls):
    column shifts are concatenated on the LANE dim (im2col K = 3*Cin), row
    shifts are major-dim slices inside the kernel (free). The segmap im2col
    is precomputed in XLA (its lane dim is tiny and unaligned); the hidden
    im2col is built in-kernel from 128-aligned pieces;
  * the norm is pre-folded outside the kernel into per-(label, channel)
    affine coefficients a = rsqrt(var+eps), b = -mean*a (running stats at
    eval; batch/instance statistics computed by a cheap XLA reduction when
    needed), so the kernel itself is norm-agnostic;
  * the reference zero-pads the *hidden* map before the gamma/beta conv, so
    the kernel masks hidden halo positions outside the image to zero
    (act(bias) != 0);
  * gradients: custom VJP with an XLA-recompute backward over the reference
    formulation (the hot serving path is forward-only).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_multispade_modulate",
    "multispade_modulate_reference",
]

NHID = 128  # per-label hidden width (hardcoded in the reference, spade.py:68)


def _act_fn(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return jax.nn.gelu
    if name == "swish":
        return jax.nn.swish
    if name == "sine":
        return lambda v: jnp.sin(30.0 * v)
    raise ValueError(f"unsupported hidden activation: {name}")


def _make_kernel(*, TH, H, W, C, L, act_name, out_dtype, quant=False):
    act = _act_fn(act_name)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dot_i8 = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    NH_ALL = NHID * L

    def kernel(x_ref, ab_ref, segc_ref, wsh_ref, bsh_ref, wgb_ref, bgb_ref,
               *rest):
        if quant:
            sgb_ref, y_ref = rest
        else:
            (y_ref,) = rest
        r = pl.program_id(1)
        R0 = r * TH

        # ---- hidden maps, all labels at once: rows [R0-2, R0+TH+2),
        #      cols [-1, W+1) in original coordinates. The segmap COLUMN
        #      im2col is prebuilt in XLA (3 pieces; 9 pieces measured slower
        #      -- lane-unaligned concat); row taps are major-dim slices. ----
        segc = segc_ref[0, pl.ds(R0, TH + 6)]  # (TH+6, W+2, 3*Cs)
        h = dot(segc[0:TH + 4], wsh_ref[0])
        h = h + dot(segc[1:TH + 5], wsh_ref[1])
        h = h + dot(segc[2:TH + 6], wsh_ref[2])
        h = act(h + bsh_ref[0].astype(jnp.float32))
        # zero the halo: the reference zero-pads the hidden map before the
        # gamma/beta conv, and act(bias) != 0.
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (TH + 4, W + 2, 1), 0) + (R0 - 2)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TH + 4, W + 2, 1), 1) - 1
        valid = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
        h = jnp.where(valid, h, 0.0)
        # hidden maps at the compute precision (bf16 in serving, f32 when
        # the caller runs full precision) — matches nn.Conv(dtype=cd)
        h = h.astype(out_dtype)  # (TH+4, W+2, NH_ALL)

        # ---- per-label gamma/beta + sequential modulation ----
        x = x_ref[0].astype(jnp.float32)  # (TH, W, C)
        for l in range(L):
            h_l = h[:, :, NHID * l: NHID * (l + 1)]
            if quant:
                # int8 MXU path (v5e: 2x the bf16 rate). The hidden tile is
                # quantized IN-REGISTER with a per-(row-tile, label) dynamic
                # scale — finer than the XLA serving path's per-tensor scale
                # and, unlike it, costing zero extra HBM passes (the XLA
                # path re-reads the materialized hidden map for abs-max and
                # again for quantize).
                hf = h_l.astype(jnp.float32)
                s_hl = jnp.max(jnp.abs(hf)) / 127.0 + 1e-30
                h_l = jnp.clip(
                    jnp.round(hf / s_hl), -127, 127
                ).astype(jnp.int8)
            # 3x3 conv as 9 shifted matmuls; row shifts are major-dim
            # (free), column shifts are static sublane slices. (Measured
            # faster than a VMEM-scratch column-im2col; Mosaic cannot
            # lane-concat sublane-shifted pieces, so no register im2col.)
            gb = None
            for di in range(3):
                w_di = wgb_ref[l, di]  # (3*NHID, 2C), col taps on rows
                for dj in range(3):
                    tap = (dot_i8 if quant else dot)(
                        h_l[1 + di: 1 + di + TH, dj: dj + W],
                        w_di[NHID * dj: NHID * (dj + 1)],
                    )
                    gb = tap if gb is None else gb + tap
            if quant:
                # dequant: int32 accumulator x (hidden scale * per-output-
                # channel weight scale), all in-register
                gb = gb.astype(jnp.float32) * (
                    s_hl * sgb_ref[l].astype(jnp.float32)
                )
            gb = gb + bgb_ref[l].astype(jnp.float32)  # (TH, W, 2C)
            gamma = gb[:, :, :C]
            beta = gb[:, :, C:]
            a = ab_ref[0, l, :C]
            b = ab_ref[0, l, C:]
            x = (x * a + b) * (1.0 + gamma) + beta
        y_ref[0] = x.astype(out_dtype)

    return kernel


def _fused_forward(x, ab, segc, wsh, bsh, wgb, bgb, act_name, interpret,
                   sgb=None):
    """x (B,H,W,C); ab (B,L,2C) f32; segc (B,H+6,W+2,3*Cs) column-im2col'd
    packed segmaps; wsh (3, 3*Cs, L*NHID) block-diag row-tap weights;
    bsh (1, L*NHID); wgb (L, 3, 3*NHID, 2C) col-tap-folded; bgb (L, 2C).

    With ``sgb`` (L, 2C) f32 weight scales, ``wgb`` is int8 and the
    gamma/beta stage runs on the int8 MXU path (in-register per-tile
    hidden quantization)."""
    B, H, W, C = x.shape
    L = wgb.shape[0]
    TH = min(32, H)
    assert H % TH == 0, f"H={H} not divisible by tile {TH}"
    cs3 = segc.shape[-1]
    quant = sgb is not None

    kernel = _make_kernel(
        TH=TH, H=H, W=W, C=C, L=L, act_name=act_name, out_dtype=x.dtype,
        quant=quant,
    )

    in_specs = [
        pl.BlockSpec((1, TH, W, C), lambda b, r: (b, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, 2 * C), lambda b, r: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H + 6, W + 2, cs3), lambda b, r: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, cs3, L * NHID), lambda b, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L * NHID), lambda b, r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 3, 3 * NHID, 2 * C), lambda b, r: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 2 * C), lambda b, r: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, ab, segc, wsh, bsh, wgb, bgb]
    if quant:
        in_specs.append(
            pl.BlockSpec((L, 2 * C), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(sgb)

    px = H * W
    flops = 2 * 9 * B * px * (
        (cs3 // 3) * L * NHID + L * NHID * 2 * C
    )
    bytesize = jnp.dtype(x.dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * px * C * bytesize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _pack_inputs(segs_nhwc, wshs, bshs, wgbs, bgbs, cd, skip_gb=False):
    """Build the packed kernel operands from per-label NHWC/HWIO params.

    ``skip_gb=True`` (quantized dispatch) skips the full-precision wgb fold —
    the int8 path replaces it with ``_quantize_gb_weights`` output, so packing
    it would only produce a dead value (DCE'd under jit, but misleading)."""
    L = len(segs_nhwc)
    cs_list = [int(s.shape[-1]) for s in segs_nhwc]
    cs_tot = sum(cs_list)

    seg = jnp.concatenate([s.astype(cd) for s in segs_nhwc], axis=-1)
    # column-tap im2col: segc[b, r, c, dj*Cs + ch] =
    #   seg[b, r-3, (c-1)+(dj-1), ch] for r in [0, H+6), c in [0, W+2)
    #   (hidden rows [-2,H+2) need seg rows [-3,H+3); cols [-1,W+1))
    sp = jnp.pad(seg, ((0, 0), (3, 3), (2, 2), (0, 0)))
    W = seg.shape[2]
    segc = jnp.concatenate(
        [sp[:, :, dj: dj + W + 2, :] for dj in range(3)], axis=-1
    )  # (B, H+6, W+2, 3*cs_tot)

    # block-diagonal segmap->hidden weights: (3, 3, cs_tot, L*NHID)
    blocks = []
    off = 0
    for l in range(L):
        k = wshs[l].astype(cd)  # (3, 3, cs_l, NHID)
        pad_lo, pad_hi = off, cs_tot - off - cs_list[l]
        blocks.append(jnp.pad(k, ((0, 0), (0, 0), (pad_lo, pad_hi), (0, 0))))
        off += cs_list[l]
    wsh_all = jnp.concatenate(blocks, axis=-1)
    # row-tap-major, column taps folded into K: (3, 3*cs_tot, L*NHID)
    wsh = wsh_all.reshape(3, 3 * cs_tot, L * NHID)
    bsh = jnp.concatenate([b.astype(jnp.float32) for b in bshs]).reshape(1, -1)

    # per-label gamma/beta weights: (L, 3, 3*NHID, 2C)
    wgb = None
    if not skip_gb:
        wgb = jnp.stack(
            [k.astype(cd).reshape(3, 3 * NHID, k.shape[-1]) for k in wgbs]
        )
    bgb = jnp.stack([b.astype(jnp.float32) for b in bgbs])
    return segc, wsh, bsh, wgb, bgb


def _quantize_gb_weights(wgbs):
    """Symmetric per-output-channel int8 quantization of the per-label
    [gamma|beta] weights: (L, 3, 3*NHID, 2C) int8 + (L, 2C) f32 scales —
    the same weight-quantization rule as the XLA serving path
    (networks/sams/spade.py::_conv_same_int8)."""
    wgb = jnp.stack(
        [k.astype(jnp.float32).reshape(3, 3 * NHID, k.shape[-1])
         for k in wgbs]
    )
    sgb = jnp.max(jnp.abs(wgb), axis=(1, 2)) / 127.0 + 1e-30  # (L, 2C)
    wgb_q = jnp.clip(
        jnp.round(wgb / sgb[:, None, None, :]), -127, 127
    ).astype(jnp.int8)
    return wgb_q, sgb


def _conv3x3(v, kernel, bias, compute_dtype):
    """flax nn.Conv(dtype=compute_dtype) semantics: SAME zero pad, NHWC."""
    out = jax.lax.conv_general_dilated(
        v.astype(compute_dtype),
        kernel.astype(compute_dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(compute_dtype)


def multispade_modulate_reference(
    x, ab, segs_nhwc, wshs_hwio, bshs, wgbs_hwio, bgbs, act_name="relu"
):
    """Pure-XLA reference of the fused chain (same math, conv-by-conv).

    Args mirror :func:`fused_multispade_modulate` but segmaps are plain
    (B, H, W, Cs) and weights are flax HWIO (3, 3, Cin, Cout).
    """
    act = _act_fn(act_name)
    C = x.shape[-1]
    cd = x.dtype
    out = x.astype(jnp.float32)
    for l in range(len(segs_nhwc)):
        h = act(_conv3x3(segs_nhwc[l], wshs_hwio[l], bshs[l], cd)
                .astype(jnp.float32)).astype(cd)
        gb = _conv3x3(h, wgbs_hwio[l], bgbs[l], cd).astype(jnp.float32)
        gamma, beta = gb[..., :C], gb[..., C:]
        a = ab[:, l, :C].astype(jnp.float32)[:, None, None, :]
        b = ab[:, l, C:].astype(jnp.float32)[:, None, None, :]
        out = (out * a + b) * (1.0 + gamma) + beta
    return out.astype(x.dtype)


def multispade_modulate_reference_int8(
    x, ab, segs_nhwc, wshs_hwio, bshs, wgbs_hwio, bgbs, act_name="relu"
):
    """Pure-XLA int8 reference of the quantized fused chain: hidden maps at
    the compute precision, gamma/beta as a symmetric-int8 conv (per-tensor
    dynamic activation scale + per-output-channel weight scale) — the same
    serving numerics as networks/sams/spade.py::_conv_same_int8. The Pallas
    kernel's per-row-tile activation scales are strictly finer, so both sit
    within the same quantization-error envelope of the fp reference."""
    act = _act_fn(act_name)
    C = x.shape[-1]
    cd = x.dtype
    out = x.astype(jnp.float32)
    for l in range(len(segs_nhwc)):
        h = act(_conv3x3(segs_nhwc[l], wshs_hwio[l], bshs[l], cd)
                .astype(jnp.float32)).astype(cd)
        hf = h.astype(jnp.float32)
        s = jnp.max(jnp.abs(hf)) / 127.0 + 1e-30
        hq = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
        kf = wgbs_hwio[l].astype(jnp.float32)
        ksc = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0 + 1e-30
        kq = jnp.clip(jnp.round(kf / ksc), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            hq, kq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        gb = acc.astype(jnp.float32) * (s * ksc) + bgbs[l].astype(jnp.float32)
        gamma, beta = gb[..., :C], gb[..., C:]
        a = ab[:, l, :C].astype(jnp.float32)[:, None, None, :]
        b = ab[:, l, C:].astype(jnp.float32)[:, None, None, :]
        out = (out * a + b) * (1.0 + gamma) + beta
    return out.astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8)
)
def _fused_cv(x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name, quantized):
    return _dispatch(
        x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name, quantized
    )


def _dispatch(x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name,
              quantized=False):
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        ref = (multispade_modulate_reference_int8 if quantized
               else multispade_modulate_reference)
        return ref(x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name)
    # pack at the caller's precision: bf16 callers get the MXU's bf16 path,
    # f32 callers keep full precision (matches the unfused path's
    # promote(x.dtype, f32) semantics)
    cd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    segc, wsh, bsh, wgb, bgb = _pack_inputs(
        segs_nhwc, wshs, bshs, wgbs, bgbs, cd, skip_gb=quantized
    )
    sgb = None
    if quantized:
        wgb, sgb = _quantize_gb_weights(wgbs)
    return _fused_forward(
        x, ab.astype(jnp.float32), segc, wsh, bsh, wgb, bgb, act_name,
        interpret=False, sgb=sgb,
    )


def _fused_fwd(x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name, quantized):
    out = _dispatch(
        x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs, act_name, quantized
    )
    return out, (x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs)


def _fused_bwd(act_name, quantized, residuals, g):
    """XLA-recompute VJP over the reference formulation (serving is
    forward-only; the train path runs the unfused modules)."""
    x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs = residuals
    _, vjp = jax.vjp(
        lambda *a: multispade_modulate_reference(*a, act_name=act_name),
        x, ab, segs_nhwc, wshs, bshs, wgbs, bgbs,
    )
    return vjp(g)


_fused_cv.defvjp(_fused_fwd, _fused_bwd)


def fused_multispade_modulate(
    x: jnp.ndarray,
    ab: jnp.ndarray,
    segs_nhwc: Sequence[jnp.ndarray],
    wshs: Sequence[jnp.ndarray],
    bshs: Sequence[jnp.ndarray],
    wgbs: Sequence[jnp.ndarray],
    bgbs: Sequence[jnp.ndarray],
    act_name: str = "relu",
    quantized: bool = False,
) -> jnp.ndarray:
    """Apply the sequential multi-label SPADE modulation chain, fused.

    Args:
      x: (B, H, W, C) input activations.
      ab: (B, L, 2C) f32 per-label folded norm coefficients
          [a = rsqrt(var+eps), b = -mean*a], broadcast over the batch for
          batch-norm, per-sample for instance-norm.
      segs_nhwc: per label, (B, H, W, Cs) segmap ALREADY resized to x's
          resolution (torch-nearest semantics, done by the caller).
      wshs/bshs: per label, mlp_shared conv params, HWIO (3,3,Cs,128)/(128,).
      wgbs/bgbs: per label, CONCATENATED [mlp_gamma | mlp_beta] conv params,
          (3,3,128,2C)/(2C,) — gamma in the first C output channels.
      act_name: hidden activation of the SPADE MLP.
      quantized: run the gamma/beta stage (>98% of the chain's FLOPs) on
          the int8 MXU path — int8 weights (per-output-channel scales) and
          in-register per-row-tile dynamic activation quantization of the
          hidden maps. Serving only (int8 SPADE mode). CAVEAT: quantized
          outputs are platform-dependent — the TPU kernel quantizes
          activations with per-row-tile scales while the non-TPU fallback
          (``multispade_modulate_reference_int8``) uses per-tensor scales,
          so int8 numerics differ between TPU and CPU for identical inputs
          (weight quantization is identical on both).

    Returns (B, H, W, C): x modulated by every label in order.
    """
    return _fused_cv(
        x, ab, tuple(segs_nhwc), tuple(wshs), tuple(bshs), tuple(wgbs),
        tuple(bgbs), act_name, quantized,
    )
