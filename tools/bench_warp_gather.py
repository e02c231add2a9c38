"""Microbench: bilinear-warp gather formulations on the TPU (round 4).

The serving profile (docs/PROFILE_INFER.md) shows the grid-sample corner
gather as the largest non-conv item: the (P, 2, 2, C=3) block-gather output
puts C=3 in the 128-lane minor dimension — ~2% lane utilization — and costs
~83 ms/clip at B16 256x192 (16% of e2e). This bench times semantically
equivalent formulations to find the fast one:

  block   — current production: ONE (2,2,C) block gather per output pixel
            (ops/grid_sample.py::_gather_corner_blocks)
  flatrow — flatten the padded image to (B, Hp*Wp, C) and issue FOUR
            row-gathers (slice (1, C)) with linearized corner indices;
            output (B, P, C)
  flatrow2 — TWO row-gathers of slice (1, 2*C) over a width-paired
            reshape: corners (y,x0)+(y,x0+1) are contiguous in a
            (B, Hp*Wp, C) view as one (1, 2C) slice IF x0 < Wp-1 (the +1-pad
            guarantees it); gathers the top and bottom corner pairs
  chanpix — transpose to (B*C, Hp, Wp) pixel-planes, flatten, and gather
            pixels with P in the MINOR dim: out (B*C, 4, P) via one gather
            of slice (1,) per corner with P-major indices [lane-friendly]
  onehot  — no gather at all: per-axis one-hot matmuls (MXU), P x (H+W)
            dense weights (the backward's trick run forward)

All are timed device-chained (fori_loop + scalar fetch, PERF_NOTES
methodology) and checked against the production forward.

    python tools/bench_warp_gather.py
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.ops.grid_sample import (
    _coords_and_weights,
    _gather_corner_blocks,
)


def _pad(image, padding_mode):
    kw = ({"mode": "edge"} if padding_mode == "border"
          else {"mode": "constant", "constant_values": 0})
    return jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), **kw)


def _combine(v00, v01, v10, v11, wx1, wy1, dtype):
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out.astype(dtype)


def _zeros_mask(v00, v01, v10, v11, x0, y0, W, H):
    x1, y1 = x0 + 1.0, y0 + 1.0

    def mask(v, ix, iy):
        ok = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        return jnp.where(ok[..., None], v, 0.0)

    return mask(v00, x0, y0), mask(v01, x1, y0), mask(v10, x0, y1), mask(
        v11, x1, y1)


def warp_block(image, grid, padding_mode="border", align_corners=True):
    """Production formulation (one (2,2,C) block gather)."""
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    v00, v01, v10, v11 = _gather_corner_blocks(image, x0, y0, padding_mode)
    return _combine(v00, v01, v10, v11, wx1, wy1, image.dtype)


def warp_flatrow(image, grid, padding_mode="border", align_corners=True):
    """Four (1, C) row-gathers over the flattened padded image."""
    B, H, W, C = image.shape
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    padded = _pad(image, padding_mode).reshape(B, (H + 2) * (W + 2), C)
    Wp = W + 2
    y0i = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    x0i = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    base = (y0i * Wp + x0i).reshape(B, -1)  # (B, P) linear index of corner00

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    def g(flat, idx):
        return jax.lax.gather(
            flat, idx[:, None], dnums, slice_sizes=(1, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    gv = jax.vmap(g)
    v00 = gv(padded, base).reshape(x0.shape + (C,))
    v01 = gv(padded, base + 1).reshape(x0.shape + (C,))
    v10 = gv(padded, base + Wp).reshape(x0.shape + (C,))
    v11 = gv(padded, base + Wp + 1).reshape(x0.shape + (C,))
    if padding_mode == "zeros":
        v00, v01, v10, v11 = _zeros_mask(v00, v01, v10, v11, x0, y0, W, H)
    return _combine(v00, v01, v10, v11, wx1, wy1, image.dtype)


def warp_flatrow2(image, grid, padding_mode="border", align_corners=True):
    """Two (1, 2C) row-pair gathers (corner x-pairs are contiguous)."""
    B, H, W, C = image.shape
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    padded = _pad(image, padding_mode).reshape(B, (H + 2) * (W + 2), C)
    Wp = W + 2
    y0i = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    x0i = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    base = (y0i * Wp + x0i).reshape(B, -1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def g(flat, idx):
        return jax.lax.gather(
            flat, idx[:, None], dnums, slice_sizes=(2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    gv = jax.vmap(g)  # (B, P, 2, C)
    top = gv(padded, base)
    bot = gv(padded, base + Wp)
    shape = x0.shape + (C,)
    v00 = top[:, :, 0].reshape(shape)
    v01 = top[:, :, 1].reshape(shape)
    v10 = bot[:, :, 0].reshape(shape)
    v11 = bot[:, :, 1].reshape(shape)
    if padding_mode == "zeros":
        v00, v01, v10, v11 = _zeros_mask(v00, v01, v10, v11, x0, y0, W, H)
    return _combine(v00, v01, v10, v11, wx1, wy1, image.dtype)


def warp_chanpix(image, grid, padding_mode="border", align_corners=True):
    """Channel-major single-pixel gathers: out minor dim = P (lane-friendly).

    The padded image transposes to (B*C, Np) pixel rows; four single-element
    gathers (one per corner) with shared (B, P) indices produce (B*C, P) —
    P sits in lanes at full 128 utilization.
    """
    B, H, W, C = image.shape
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    padded = _pad(image, padding_mode)  # (B, H+2, W+2, C)
    Np = (H + 2) * (W + 2)
    flat = padded.transpose(0, 3, 1, 2).reshape(B, C, Np)
    Wp = W + 2
    y0i = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    x0i = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    base = (y0i * Wp + x0i).reshape(B, -1)  # (B, P)

    def take2(flat_b, idx_b):  # (C, Np), (P,) -> (C, P)
        return jnp.take(flat_b, idx_b, axis=1)

    gv = jax.vmap(take2)
    shape = x0.shape + (C,)

    def corner(off):
        v = gv(flat, base + off)  # (B, C, P)
        return v.transpose(0, 2, 1).reshape(shape)

    v00 = corner(0)
    v01 = corner(1)
    v10 = corner(Wp)
    v11 = corner(Wp + 1)
    if padding_mode == "zeros":
        v00, v01, v10, v11 = _zeros_mask(v00, v01, v10, v11, x0, y0, W, H)
    return _combine(v00, v01, v10, v11, wx1, wy1, image.dtype)


def warp_onehot(image, grid, padding_mode="border", align_corners=True):
    """Gather-free: per-output-row one-hot matmul over source rows, then
    per-pixel x-interp via a second one-hot contraction — exactly the
    production backward's separable 2-sparse weight matrices run FORWARD
    (``_axis_weight_matrix`` handles both padding modes)."""
    from shineon_tpu.ops.grid_sample import _axis_weight_matrix

    B, H, W, C = image.shape
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    flat = lambda a: a.reshape(B, -1)  # noqa: E731
    Wy = _axis_weight_matrix(flat(y0), flat(wy1), H, padding_mode)  # (B,P,H)
    Wx = _axis_weight_matrix(flat(x0), flat(wx1), W, padding_mode)  # (B,P,W)
    rows = jnp.einsum("bph,bhwc->bpwc", Wy, image.astype(Wy.dtype))
    out = jnp.einsum("bpw,bpwc->bpc", Wx, rows)
    return out.reshape(x0.shape + (C,)).astype(image.dtype)


IMPLS = {
    "block": warp_block,
    "flatrow": warp_flatrow,
    "flatrow2": warp_flatrow2,
    "chanpix": warp_chanpix,
    "onehot": warp_onehot,
}


def time_chained(fn, image, grid, iters=20):
    """Device-chained timing: each iteration's output perturbs the next
    grid so XLA cannot elide repeats; barrier via scalar fetch."""
    f = jax.jit(fn)

    @jax.jit
    def loop(image, grid):
        def body(_, carry):
            g, acc = carry
            out = f(image, g)
            # NONLINEAR feedback: mean(out) alone is linear in the image, so
            # XLA's reassociation can collapse matmul-based warps (measured:
            # the onehot impl timed 6 ms with a linear probe, 5x its true
            # cost) — the square defeats reduce-through-dot simplification
            eps = (jnp.mean(out.astype(jnp.float32) ** 2) * 1e-12)
            return g + eps, acc + eps

        g, acc = jax.lax.fori_loop(0, iters, body, (grid, jnp.float32(0)))
        return acc

    float(loop(image, grid))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(image, grid))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--padding", default="border")
    p.add_argument("--impls", nargs="*", default=list(IMPLS))
    p.add_argument(
        "--preset", choices=["serving", "train"], default=None,
        help="serving = B16 (the benchmarked shape); train = B4 zeros-pad "
        "(the training flow-warp compositing shape, where the one-hot "
        "forward also runs but was not originally benchmarked)",
    )
    args = p.parse_args()
    if args.preset == "train":
        args.batch, args.padding = 4, "zeros"
    elif args.preset == "serving":
        args.batch, args.padding = 16, "border"

    print("device:", jax.devices()[0].device_kind)
    rng = np.random.RandomState(0)
    B, H, W, C = args.batch, args.height, args.width, args.channels
    image = jnp.asarray(rng.randn(B, H, W, C), getattr(jnp, args.dtype))
    # a realistic smooth warp field: identity + ~8px smooth displacement
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    dx = 0.06 * np.sin(3 * ys + 1) * np.cos(2 * xs)
    dy = 0.06 * np.cos(2 * ys) * np.sin(3 * xs + 2)
    grid = np.stack([xs + dx, ys + dy], -1)[None].repeat(B, 0)
    grid = jnp.asarray(grid, jnp.float32)

    ref = np.asarray(warp_block(image, grid, args.padding)).astype(np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    for name in args.impls:
        fn = functools.partial(IMPLS[name], padding_mode=args.padding)
        out = np.asarray(fn(image, grid)).astype(np.float32)
        err = np.abs(out - ref).max() / scale
        dt = time_chained(fn, image, grid)
        print(f"{name:9s} {dt*1e3:8.3f} ms  rel_err {err:.2e} "
              f"{'OK' if err < 2e-2 else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()
