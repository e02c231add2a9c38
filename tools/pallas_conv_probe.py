"""Probe: can a Pallas int8 3x3-conv kernel beat XLA's conv emitter at the
full-resolution serving shapes?

The round-5 roof census (docs/PERF_NOTES.md) measured the int8 serving
graph AT its per-shape conv roof — the residual 0.90x-of-A100 gap is the
XLA conv emitter's achieved rate at the FULL-RES shapes (129-186 TOPS on
`3x3x128x{128,256} @ 16x256x192`) vs the ~260-330 TOPS the SAME channel
configs reach at half resolution. This probe implements the conv as a
Pallas kernel — nine shifted (TH*W, Cin) x (Cin, Cout) int8 MXU matmuls
with int32 accumulation, manual double-buffered halo DMA over row tiles,
dequant + bias fused in-kernel — and times it against the production
`_conv_same_int8` formulation (networks/sams/spade.py:179) on the real
chip, per shape.

Numerics: BIT-EXACT vs the XLA int8 path by construction — identical
quantized operands (per-tensor dynamic activation scale, per-channel
weight scales computed outside the kernel exactly as `_conv_same_int8`
does), identical int32 accumulation, identical f32 dequant + bias.

Usage:
  SHINEON_INT8_SPADE=1 python tools/pallas_conv_probe.py [--th 16]
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from shineon_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from shineon_tpu.networks.sams.spade import _conv_same_int8  # noqa: E402
from tools.serving_roof_census import timed  # noqa: E402


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, out_ref, xbuf, sems, *, th, w,
            cin, out_dtype, variant):
    """One (batch, row-tile) grid step: DMA the (TH+2, W+2, Cin) halo slab,
    accumulate nine tap matmuls on the MXU int8 path, dequant in-register."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    n_r = pl.num_programs(1)
    step = b * n_r + r
    total = pl.num_programs(0) * n_r

    if variant == "shifted3":
        # x_hbm is the (3, B, H+2, W, Cin) stack of width-shifted quantized
        # inputs; each shift DMAs into its own 128-lane-aligned K slot of
        # ONE (th+2, W, 3*Cin) buffer — no in-kernel shifts or concats
        def shift_dmas(slot, bb, rr):
            return [
                pltpu.make_async_copy(
                    x_hbm.at[s, bb, pl.ds(rr * th, th + 2)],
                    xbuf.at[slot, :, :, pl.ds(s * cin, cin)],
                    sems.at[slot, s],
                )
                for s in range(3)
            ]

        def tile_start(slot, bb, rr):
            for d in shift_dmas(slot, bb, rr):
                d.start()

        def tile_wait(slot, bb, rr):
            for d in shift_dmas(slot, bb, rr):
                d.wait()
    else:
        def tile_start(slot, bb, rr):
            tile_dma(slot, bb, rr).start()

        def tile_wait(slot, bb, rr):
            tile_dma(slot, bb, rr).wait()

        def tile_dma(slot, bb, rr):
            # full (aligned) padded width per slab: Mosaic requires HBM slice
            # extents on the sublane dim to be 8-aligned, so W is padded to
            # Wp outside and the halo DMA slices rows only
            return pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(rr * th, th + 2)],
                xbuf.at[slot],
                sems.at[slot],
            )

    slot = jax.lax.rem(step, 2)
    nxt = step + 1

    @pl.when(step == 0)
    def _():
        tile_start(0, b, r)

    @pl.when(nxt < total)
    def _():
        tile_start(1 - slot, nxt // n_r, jax.lax.rem(nxt, n_r))

    tile_wait(slot, b, r)

    wp = xbuf.shape[2]
    if variant == "shifted3":
        # 3 dots, K = 3*Cin per dy-row, accumulation inside the MXU
        acc = None
        for dy in range(3):
            xa = xbuf[slot, dy:dy + th].reshape(th * w, 3 * cin)
            part = jax.lax.dot_general(
                xa, w_ref[dy],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = part if acc is None else acc + part
        out = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    elif variant == "taps9":
        acc = None
        for dy in range(3):
            for dx in range(3):
                xa = xbuf[slot, dy:dy + th, dx:dx + w, :].reshape(th * w, cin)
                part = jax.lax.dot_general(
                    xa, w_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part
        out = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    elif variant in ("rolledcat", "rolled9"):
        # No width halo at all: W=192 is sublane-aligned, so the
        # (th, W, Cin) -> (th*W, Cin) collapse is layout-free; the dx
        # shifts become +-1 sublane rolls on the fused row dim with the
        # row-edge columns masked to the conv's zero padding. rolledcat
        # lane-concats the 9 taps (each a full 128-lane tile) into ONE
        # K=1152 int8 dot so accumulation happens inside the MXU.
        w_idx = jax.lax.broadcasted_iota(jnp.int32, (th * w, 1), 0) % w
        taps = []
        acc = None
        for dy in range(3):
            xd = xbuf[slot, dy:dy + th].reshape(th * w, cin)
            for s in (-1, 0, 1):
                if s == 0:
                    xs = xd
                else:
                    # Mosaic's rotate is 32-bit only: pack 4 int8 lanes into
                    # int32 (axis-0 rolls are lane-agnostic), roll, unpack
                    x32 = pltpu.bitcast(xd, jnp.int32)
                    x32 = pltpu.roll(x32, (-s) % (th * w), axis=0)
                    xs = pltpu.bitcast(x32, jnp.int8)
                    edge = 0 if s == -1 else w - 1
                    xs = jnp.where(w_idx != edge, xs, 0).astype(jnp.int8)
                if variant == "rolledcat":
                    taps.append(xs)
                else:
                    part = jax.lax.dot_general(
                        xs, w_ref[dy, s + 1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = part if acc is None else acc + part
        if variant == "rolledcat":
            xcat = jnp.concatenate(taps, axis=1)  # (th*W, 9*Cin)
            acc = jax.lax.dot_general(
                xcat, w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        out = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    elif variant == "taps9bf16":
        # diagnostic: same 9-tap structure but bf16 operands / f32 acc —
        # if this matches taps9's time, Mosaic's s8xs8->s32 dot is NOT
        # using the MXU's 2x int8 rate and the kernel can't beat XLA's
        # int8 emitter
        acc = None
        for dy in range(3):
            for dx in range(3):
                xa = xbuf[slot, dy:dy + th, dx:dx + w, :].reshape(th * w, cin)
                part = jax.lax.dot_general(
                    xa.astype(jnp.bfloat16),
                    w_ref[dy, dx].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        out = acc * scale_ref[0] + bias_ref[0]
    elif variant == "mmonly":
        # diagnostic: 9 matmuls on a FIXED tap (wrong numerics) — measures
        # the achievable Mosaic int8 MXU rate with zero shift/relayout work
        xa = xbuf[slot, 1:1 + th, 1:1 + w, :].reshape(th * w, cin)
        acc = None
        for dy in range(3):
            for dx in range(3):
                part = jax.lax.dot_general(
                    xa, w_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = part if acc is None else acc + part
        out = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    else:  # merged: 3 matmuls with N=3*Cout, dx handled by output slicing
        cout = w_ref.shape[-1] // 3
        ysum = None
        for dy in range(3):
            xa = xbuf[slot, dy:dy + th].reshape(th * wp, cin)
            part = jax.lax.dot_general(
                xa, w_ref[dy],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            ysum = part if ysum is None else ysum + part
        y3 = ysum.reshape(th, wp, 3 * cout)
        acc = (y3[:, 0:w, 0:cout]
               + y3[:, 1:w + 1, cout:2 * cout]
               + y3[:, 2:w + 2, 2 * cout:3 * cout])
        out = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
    out_ref[...] = out.astype(out_dtype).reshape(1, th, w, -1)


def pallas_conv3x3_int8(v, kernel, bias, compute_dtype, th=16,
                        variant="merged"):
    """3x3 SAME conv, production int8 serving numerics, Pallas execution.

    Quantization (outside the kernel, XLA-fused into producers):
    per-tensor dynamic activation scale + per-output-channel weight scale,
    exactly `_conv_same_int8` (networks/sams/spade.py:188-194)."""
    B, H, W, Cin = v.shape
    Cout = kernel.shape[-1]
    assert H % th == 0, (H, th)
    vf = v.astype(jnp.float32)
    s = jnp.max(jnp.abs(vf)) / 127.0 + 1e-30
    vq = jnp.clip(jnp.round(vf / s), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ksc = jnp.max(jnp.abs(kf), axis=(0, 1, 2)) / 127.0 + 1e-30
    kq = jnp.clip(jnp.round(kf / ksc), -127, 127).astype(jnp.int8)
    if variant == "shifted3":
        # materialize the three width-shifted views outside (one fused XLA
        # elementwise+pad producer); the kernel then only ever does aligned
        # DMAs and aligned row collapses
        pad_w = -2
        vq = jnp.pad(vq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        vq = jnp.stack([vq[:, :, s:s + W] for s in range(3)])
    elif variant in ("rolledcat", "rolled9"):
        # height halo only — dx shifts are in-kernel rolls, and W=192 is
        # already aligned for both the HBM DMA and the row collapse
        pad_w = -2
        vq = jnp.pad(vq, ((0, 0), (1, 1), (0, 0), (0, 0)))
    else:
        pad_w = (-(W + 2)) % 8  # align the padded width for HBM DMA slicing
        vq = jnp.pad(vq, ((0, 0), (1, 1), (1, 1 + pad_w), (0, 0)))
    scale = (s * ksc).astype(jnp.float32).reshape(1, Cout)
    bias = bias.astype(jnp.float32).reshape(1, Cout)

    if variant == "merged":
        # (3, Cin, 3*Cout): for each dy, the three dx taps concatenated
        # along the output axis — one N=3*Cout matmul per dy, dx resolved
        # by shifted slicing of the int32 result
        kq = jnp.moveaxis(kq, 1, 2).reshape(3, Cin, 3 * Cout)
        w_spec = pl.BlockSpec((3, Cin, 3 * Cout), lambda b, r: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    elif variant == "rolledcat":
        # (9*Cin, Cout): im2col weight matrix, rows in (dy, dx) tap order —
        # exactly the (3, 3, Cin, Cout) row-major collapse
        kq = kq.reshape(9 * Cin, Cout)
        w_spec = pl.BlockSpec((9 * Cin, Cout), lambda b, r: (0, 0),
                              memory_space=pltpu.VMEM)
    elif variant == "shifted3":
        # (3, 3*Cin, Cout): per dy, K blocks in dx order matching the
        # per-shift 128-lane slots of the DMA buffer
        kq = kq.reshape(3, 3 * Cin, Cout)
        w_spec = pl.BlockSpec((3, 3 * Cin, Cout), lambda b, r: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((3, 3, Cin, Cout), lambda b, r: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(
        _kernel, th=th, w=W, cin=Cin, out_dtype=compute_dtype, variant=variant
    )
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            w_spec,
            pl.BlockSpec((1, Cout), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cout), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (2, th + 2, W + 2 + pad_w,
                 3 * Cin if variant == "shifted3" else Cin),
                jnp.int8,
            ),
            pltpu.SemaphoreType.DMA(
                (2, 3) if variant == "shifted3" else (2,)
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(vq, kq, scale, bias)


SHAPES = [
    # (B, H, W, Cin, Cout): the census's low-TOPS full-res rows
    (16, 256, 192, 128, 256),   # n=8, 20.0 ms of the 75.6 ms roof (186 TOPS)
    (16, 256, 192, 128, 128),   # n=7, 12.6 ms (129 TOPS)
    (16, 256, 192, 64, 128),    # 1.55 ms
    (16, 256, 192, 128, 64),    # 1.76 ms
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--th", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--variant", default="merged",
                    choices=("merged", "taps9", "mmonly", "taps9bf16",
                             "rolledcat", "rolled9", "shifted3"))
    ap.add_argument("--only", type=int, default=None,
                    help="probe only SHAPES[i]")
    args = ap.parse_args()

    print(f"platform={jax.devices()[0].platform} th={args.th} "
          f"variant={args.variant}", flush=True)
    shapes = SHAPES if args.only is None else [SHAPES[args.only]]
    for (B, H, W, Cin, Cout) in shapes:
        if Cin % 128:
            print(f"  conv 3x3x{Cin}x{Cout}: skipped (Mosaic HBM-slice lane "
                  f"alignment needs Cin % 128 == 0)")
            continue
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        v = jax.random.normal(k1, (B, H, W, Cin), jnp.float32)
        kern = jax.random.normal(k2, (3, 3, Cin, Cout), jnp.float32) * 0.05
        bias = jax.random.normal(k3, (Cout,), jnp.float32) * 0.1

        f_ref = jax.jit(lambda v, k=kern, b=bias: _conv_same_int8(
            v, k, b, jnp.bfloat16))
        f_pl = jax.jit(lambda v, k=kern, b=bias: pallas_conv3x3_int8(
            v, k, b, jnp.bfloat16, th=args.th, variant=args.variant))

        if not args.skip_check:
            # compare ON DEVICE; fetch only scalars (tunnel fetches of the
            # (16,256,192,256) outputs would take minutes). Tolerance: the
            # int32 accumulators are bit-identical by construction, but XLA
            # reassociates the f32 dequant multiply under
            # --xla_allow_excess_precision, so the bf16 outputs can differ
            # by 1 ULP (~2^-8 relative).
            mad, ref_max = jax.jit(lambda v: (
                jnp.max(jnp.abs(
                    f_ref(v).astype(jnp.float32) - f_pl(v).astype(jnp.float32)
                )),
                jnp.max(jnp.abs(f_ref(v).astype(jnp.float32))),
            ))(v)
            rel = float(mad) / max(float(ref_max), 1e-30)
            print(f"  {Cin}->{Cout}: max|d|={float(mad):.3e} "
                  f"rel={rel:.3e}")
            if rel > 2e-2:
                print("  MISMATCH — skipping timing")
                continue

        t_ref = timed(f_ref, v, iters=args.iters)
        t_pl = timed(f_pl, v, iters=args.iters)
        flops = 2.0 * B * H * W * Cout * 9 * Cin
        print(
            f"  conv 3x3x{Cin}x{Cout} @ {B}x{H}x{W}: "
            f"xla {t_ref*1e3:.3f} ms ({flops/t_ref/1e12:.1f} TOPS) | "
            f"pallas {t_pl*1e3:.3f} ms ({flops/t_pl/1e12:.1f} TOPS) | "
            f"speedup {t_ref/t_pl:.2f}x"
        )


if __name__ == "__main__":
    main()
