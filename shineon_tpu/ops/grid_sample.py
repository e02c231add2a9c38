"""Bilinear grid sampling (the `F.grid_sample` capability) in XLA, NHWC layout.

Reference usage: models/warp_model.py:85-88 and the flownet2 Resample2d op
(SURVEY §2.9). On TPU the right implementation is an XLA gather: the four corner
reads become batched dynamic-gathers that XLA lowers to native TPU gather
instructions and fuses with the surrounding elementwise math, and reverse-mode
autodiff gives the scatter-add backward for free. (A hand-rolled Pallas gather
would serialize per-element index reads; gathers are the one op class where the
XLA lowering is already speed-of-light.)

Semantics match ``torch.nn.functional.grid_sample(..., mode="bilinear")`` with
``align_corners=False`` (the PyTorch>=1.3 default the reference runs with under
torch 1.6) for both ``padding_mode="zeros"`` and ``"border"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "resample2d"]


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] -> pixel coordinates, torch grid_sampler_unnormalize."""
    size = jnp.asarray(size, coord.dtype)
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1.0)
    return ((coord + 1.0) * size - 1.0) / 2.0


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners"))
def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinearly sample ``image`` at normalized ``grid`` locations.

    Args:
      image: (B, H, W, C) input.
      grid: (B, Hg, Wg, 2); ``grid[..., 0]`` is x (width coord), ``grid[..., 1]``
        is y, both in [-1, 1] (same convention as torch).
      padding_mode: "zeros" or "border".
      align_corners: corner-pixel convention (torch semantics).

    Returns:
      (B, Hg, Wg, C) sampled output.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = image.shape
    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)

    gx = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    gy = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    if padding_mode == "border":
        # torch clips the *source* coordinate before computing corners.
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Interpolation weights before clipping the corner indices.
    wx1 = gx - x0  # weight for x1
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    # ONE 2x2xC block gather per output pixel instead of four per-corner
    # gathers: pad the image by one pixel on each spatial side (zeros or edge
    # per the padding mode) so the block at (y0+1, x0+1) always contains the
    # four bilinear corners; far-out-of-range corners are masked afterwards
    # (zeros mode). Gathers move 4C contiguous floats per index — a 4x
    # reduction in gather dispatches, which dominate the flow-warp cost.
    pad_kwargs = (
        {"mode": "edge"} if padding_mode == "border"
        else {"mode": "constant", "constant_values": 0}
    )
    padded = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), **pad_kwargs)

    y0i = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)  # block start in padded img
    x0i = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    starts = jnp.stack(
        [y0i.reshape(B, -1), x0i.reshape(B, -1)], axis=-1
    )  # (B, P, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def gather_one(img, idx):
        return jax.lax.gather(
            img, idx, dnums, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    blocks = jax.vmap(gather_one)(padded, starts)  # (B, P, 2, 2, C)
    blocks = blocks.reshape(x0.shape + (2, 2, C))
    v00 = blocks[..., 0, 0, :]
    v01 = blocks[..., 0, 1, :]
    v10 = blocks[..., 1, 0, :]
    v11 = blocks[..., 1, 1, :]

    if padding_mode == "zeros":
        def mask(v, ix, iy):
            in_bounds = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            return jnp.where(in_bounds[..., None], v, 0.0)

        v00 = mask(v00, x0, y0)
        v01 = mask(v01, x1, y0)
        v10 = mask(v10, x0, y1)
        v11 = mask(v11, x1, y1)

    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out.astype(image.dtype)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def resample2d(
    image: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "border"
) -> jnp.ndarray:
    """Warp ``image`` by a pixel-unit optical ``flow`` field (flownet2 Resample2d).

    ``out[b, y, x] = image[b, y + flow_y, x + flow_x]`` with bilinear
    interpolation; replaces the CUDA resample2d_package op consumed at
    models/unet_mask_model.py:22,60 and models/sams_model.py:16,95 in the
    reference. Differentiable w.r.t. ``image`` (the reference treats flow as
    data, but the gather is differentiable in both arguments here).

    Args:
      image: (B, H, W, C).
      flow: (B, H, W, 2) displacement in pixels; ``flow[..., 0]`` is dx,
        ``flow[..., 1]`` is dy.
      padding_mode: boundary handling ("border" replicates edge pixels, matching
        the flownet2 kernel's coordinate clamping).
    """
    B, H, W, C = image.shape
    compute_dtype = jnp.promote_types(image.dtype, jnp.float32)
    xs = jax.lax.broadcasted_iota(compute_dtype, (H, W), 1)
    ys = jax.lax.broadcasted_iota(compute_dtype, (H, W), 0)
    gx = xs[None] + flow[..., 0].astype(compute_dtype)
    gy = ys[None] + flow[..., 1].astype(compute_dtype)
    # Re-normalize to [-1, 1] (align_corners=True maps pixel i -> -1 + 2i/(S-1)).
    nx = 2.0 * gx / (W - 1) - 1.0
    ny = 2.0 * gy / (H - 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(image, grid, padding_mode=padding_mode, align_corners=True)


def affine_grid(theta: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Affine sampling grid from 2x3 matrices (the reference's AffineGridGen,
    cpvton/warp.py:102-113 — torch F.affine_grid semantics, align_corners=False).

    Args:
      theta: (B, 2, 3) affine parameters.
    Returns: (B, height, width, 2) normalized sampling grid.
    """
    B = theta.shape[0]
    # half-pixel-centered normalized base coordinates
    xs = (jnp.arange(width, dtype=jnp.float32) * 2 + 1) / width - 1.0
    ys = (jnp.arange(height, dtype=jnp.float32) * 2 + 1) / height - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # (H*W, 3)
    grid = jnp.einsum("bij,pj->bpi", theta.astype(jnp.float32), base)
    return grid.reshape(B, height, width, 2)
