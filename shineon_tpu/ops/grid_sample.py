"""Bilinear grid sampling (the `F.grid_sample` capability) in XLA, NHWC layout.

Reference usage: models/warp_model.py:85-88 and the flownet2 Resample2d op
(SURVEY §2.9). On TPU the right implementation is an XLA gather: the four corner
reads become batched dynamic-gathers that XLA lowers to native TPU gather
instructions and fuses with the surrounding elementwise math.

The BACKWARD is where the naive lowering dies: reverse-mode autodiff of a
gather is a scatter-add, and XLA:TPU serializes scatter-add with duplicate
indices into a per-element while loop (measured: ~4.2 s/step inside the SAMS
train step at 256x192 — two thirds of the whole step, docs/PROFILE.md r2).
This module therefore defines a custom VJP:

  * d/d image — bilinear splatting is SEPARABLE: each output pixel p
    contributes to source rows via a 2-sparse weight vector Wy[p, :] and to
    source cols via Wx[p, :], so
        d_image[y, x, c] = sum_p Wy[p, y] * g[p, c] * Wx[p, x]
    which is two dense batched matmuls on the MXU (one-hot weight matrices),
    no scatter at all;
  * d/d grid — elementwise weight derivatives against the gathered corner
    values (gathers only, same as the forward).

Semantics match ``torch.nn.functional.grid_sample(..., mode="bilinear")`` with
``align_corners=False`` (the PyTorch>=1.3 default the reference runs with under
torch 1.6) for both ``padding_mode="zeros"`` and ``"border"``, including the
clipped-coordinate zero-gradient rule of the border mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "resample2d"]

# d_image adjoint: above this channel count the dense one-hot contraction
# stops being obviously cheaper than a scatter; fall back to XLA's autodiff.
_DENSE_ADJOINT_MAX_CHANNELS = 16
# d_image adjoint also materializes one-hot (B, P, H) + (B, P, W) f32 weight
# matrices; cap their combined element count (~1 GB f32) so large-resolution
# or large-batch callers fall back to XLA autodiff instead of OOMing on the
# hidden backward buffers. Production train shapes (256x192, batch<=8) stay
# well under: 8 * 49152 * (256+192) = 176e6.
_DENSE_ADJOINT_MAX_ELEMENTS = 256_000_000


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] -> pixel coordinates, torch grid_sampler_unnormalize."""
    size = jnp.asarray(size, coord.dtype)
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1.0)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _coords_and_weights(image_shape, grid, padding_mode, align_corners):
    """Shared forward/backward coordinate math. Returns the raw (pre-clip)
    coordinates, the corner bases, and the bilinear weights."""
    B, H, W, C = image_shape
    compute_dtype = jnp.promote_types(grid.dtype, jnp.float32)

    gx_raw = _unnormalize(grid[..., 0].astype(compute_dtype), W, align_corners)
    gy_raw = _unnormalize(grid[..., 1].astype(compute_dtype), H, align_corners)

    if padding_mode == "border":
        # torch clips the *source* coordinate before computing corners.
        gx = jnp.clip(gx_raw, 0.0, W - 1)
        gy = jnp.clip(gy_raw, 0.0, H - 1)
    else:
        gx, gy = gx_raw, gy_raw

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = gx - x0  # weight for x0 + 1
    wy1 = gy - y0
    return gx_raw, gy_raw, gx, gy, x0, y0, wx1, wy1


def _gather_corner_blocks(image, x0, y0, padding_mode):
    """ONE 2x2xC block gather per output pixel instead of four per-corner
    gathers: pad the image by one pixel on each spatial side (zeros or edge
    per the padding mode) so the block at (y0+1, x0+1) always contains the
    four bilinear corners; far-out-of-range corners are masked afterwards
    (zeros mode). Gathers move 4C contiguous floats per index — a 4x
    reduction in gather dispatches, which dominate the flow-warp cost."""
    B, H, W, C = image.shape
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
        x1, y1 = x0 + 1.0, y0 + 1.0

        def mask(v, ix, iy):
            in_bounds = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            return jnp.where(in_bounds[..., None], v, 0.0)

        v00 = mask(v00, x0, y0)
        v01 = mask(v01, x1, y0)
        v10 = mask(v10, x0, y1)
        v11 = mask(v11, x1, y1)
    return v00, v01, v10, v11


# Forward-formulation gate for the separable one-hot contraction: one budget
# over BOTH transient forward buffers that are live at once — the (B, P, W, C)
# f32 row-interp intermediate AND the (B, P, H) + (B, P, W) one-hot weight
# matrices — so near-cap callers can't stack ~3 GB of hidden forward buffers
# per warp. Production serving (B16, 256x192, C<=3): 453M rows + 352M weights.
_ONEHOT_FWD_MAX_ELEMENTS = 1_024_000_000  # f32 elements (~4 GB combined)


def _use_onehot_forward(image_shape, grid_shape) -> bool:
    B, H, W, C = image_shape
    P = int(grid_shape[1]) * int(grid_shape[2])
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    live = B * P * (W * C + H + W)
    return on_tpu and live <= _ONEHOT_FWD_MAX_ELEMENTS


def _grid_sample_onehot_impl(image, grid, padding_mode, align_corners):
    """Gather-free forward: the backward's separable 2-sparse splat matrices
    run FORWARD — y-interp as a (P, H) x (H, W*C) contraction, then x-interp
    as a per-pixel (W,) contraction. XLA:TPU turns the 2-sparse dots into
    large-contiguous-slice row selections; measured 3.15x faster than the
    2x2-block corner gather at the production warp shape (B16, 256x192, C3:
    6.1 vs 19.2 ms — tools/bench_warp_gather.py), whose (P, 2, 2, C=3)
    output wastes ~98% of each (8,128) tile's lanes. Numerics: f32 weights
    and accumulation — tighter than the bf16 block-gather combine."""
    B, H, W, C = image.shape
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    flat = lambda a: a.reshape(B, -1)  # noqa: E731
    Wy = _axis_weight_matrix(flat(y0), flat(wy1), H, padding_mode)  # (B,P,H)
    Wx = _axis_weight_matrix(flat(x0), flat(wx1), W, padding_mode)  # (B,P,W)
    # f32 operands kept deliberately: a bf16-operand variant of these two
    # contractions was measured e2e-NEUTRAL at the serving config (179.04 vs
    # 179.09 f/s same-day — the warp contractions hide behind neighboring
    # streams), so the tighter numerics are free. docs/PERF_NOTES.md round 5.
    rows = jnp.einsum(
        "bph,bhwc->bpwc", Wy, image.astype(Wy.dtype),
        preferred_element_type=Wy.dtype,
    )
    out = jnp.einsum(
        "bpw,bpwc->bpc", Wx, rows, preferred_element_type=Wy.dtype
    )
    return out.reshape(x0.shape + (C,)).astype(image.dtype)


def _grid_sample_impl(image, grid, padding_mode, align_corners):
    if _use_onehot_forward(image.shape, grid.shape):
        return _grid_sample_onehot_impl(
            image, grid, padding_mode, align_corners
        )
    _, _, _, _, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    v00, v01, v10, v11 = _gather_corner_blocks(image, x0, y0, padding_mode)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out.astype(image.dtype)


def _axis_weight_matrix(c0, w1, size, padding_mode):
    """Dense per-pixel splat weights over one source axis.

    Args:
      c0: (B, P) floor corner coordinate along the axis (pre-clip, float).
      w1: (B, P) bilinear weight of corner c0+1 (w0 = 1 - w1).
      size: source extent along the axis.
    Returns: (B, P, size) — 2-sparse rows, W[b, p, s] = splat weight of output
      pixel p onto source index s.
    """
    dtype = w1.dtype
    w0 = 1.0 - w1
    if padding_mode == "zeros":
        # out-of-range corners contribute nothing (forward masks them)
        in0 = (c0 >= 0) & (c0 <= size - 1)
        in1 = (c0 + 1 >= 0) & (c0 + 1 <= size - 1)
        w0 = jnp.where(in0, w0, 0.0)
        w1 = jnp.where(in1, w1, 0.0)
    i0 = jnp.clip(c0, 0, size - 1).astype(jnp.int32)
    i1 = jnp.clip(c0 + 1, 0, size - 1).astype(jnp.int32)
    # one_hot rows; where i0 == i1 (border clip at the edge) the two
    # contributions add, matching the clipped forward exactly
    eye0 = jax.nn.one_hot(i0, size, dtype=dtype)
    eye1 = jax.nn.one_hot(i1, size, dtype=dtype)
    return eye0 * w0[..., None] + eye1 * w1[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_cv(image, grid, padding_mode, align_corners):
    return _grid_sample_impl(image, grid, padding_mode, align_corners)


def _grid_sample_fwd(image, grid, padding_mode, align_corners):
    return _grid_sample_impl(image, grid, padding_mode, align_corners), (
        image, grid,
    )


def _grid_sample_bwd(padding_mode, align_corners, residuals, g):
    image, grid = residuals
    B, H, W, C = image.shape
    gx_raw, gy_raw, gx, gy, x0, y0, wx1, wy1 = _coords_and_weights(
        image.shape, grid, padding_mode, align_corners
    )
    gf = g.astype(jnp.promote_types(g.dtype, jnp.float32))
    P = int(gx.shape[-2] * gx.shape[-1]) if gx.ndim == 3 else int(gx.shape[-1])
    lead = gx.shape[:1]
    flat = lambda a: a.reshape(lead + (-1,))  # noqa: E731

    # ---- d image: separable dense splat (two MXU matmuls per channel) ----
    Wy = _axis_weight_matrix(flat(y0), flat(wy1), H, padding_mode)  # (B,P,H)
    Wx = _axis_weight_matrix(flat(x0), flat(wx1), W, padding_mode)  # (B,P,W)
    g_flat = gf.reshape(lead + (P, C))
    d_img_channels = []
    for c in range(C):  # C is static and small for warp workloads
        # (B,P,H)*(B,P,1) then contract P: (B,H,P) @ (B,P,W) -> (B,H,W)
        d_img_channels.append(
            jnp.einsum(
                "bph,bpw->bhw", Wy * g_flat[..., c:c + 1], Wx,
                preferred_element_type=jnp.float32,
            )
        )
    d_image = jnp.stack(d_img_channels, axis=-1).astype(image.dtype)

    # ---- d grid: weight derivatives against the gathered corner values ----
    v00, v01, v10, v11 = _gather_corner_blocks(image, x0, y0, padding_mode)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    # dout/dgx = wy0*(v01-v00) + wy1*(v11-v10); dout/dgy symmetric
    d_gx = jnp.sum(
        gf * (
            (v01 - v00) * wy0[..., None] + (v11 - v10) * wy1[..., None]
        ).astype(gf.dtype),
        axis=-1,
    )
    d_gy = jnp.sum(
        gf * (
            (v10 - v00) * wx0[..., None] + (v11 - v01) * wx1[..., None]
        ).astype(gf.dtype),
        axis=-1,
    )
    if padding_mode == "border":
        # clipped coordinates have zero gradient (torch border semantics)
        d_gx = jnp.where((gx_raw >= 0) & (gx_raw <= W - 1), d_gx, 0.0)
        d_gy = jnp.where((gy_raw >= 0) & (gy_raw <= H - 1), d_gy, 0.0)
    # unnormalize scale: d gx / d grid_x
    if align_corners:
        sx, sy = (W - 1) / 2.0, (H - 1) / 2.0
    else:
        sx, sy = W / 2.0, H / 2.0
    d_grid = jnp.stack([d_gx * sx, d_gy * sy], axis=-1).astype(grid.dtype)
    return d_image, d_grid


_grid_sample_cv.defvjp(_grid_sample_fwd, _grid_sample_bwd)


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
    P = int(grid.shape[1]) * int(grid.shape[2])
    adjoint_elems = B * P * (H + W)
    if (
        C <= _DENSE_ADJOINT_MAX_CHANNELS
        and adjoint_elems <= _DENSE_ADJOINT_MAX_ELEMENTS
    ):
        return _grid_sample_cv(image, grid, padding_mode, align_corners)
    return _grid_sample_impl(image, grid, padding_mode, align_corners)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def resample2d(
    image: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "border"
) -> jnp.ndarray:
    """Warp ``image`` by a pixel-unit optical ``flow`` field (flownet2 Resample2d).

    ``out[b, y, x] = image[b, y + flow_y, x + flow_x]`` with bilinear
    interpolation; replaces the CUDA resample2d_package op consumed at
    models/unet_mask_model.py:22,60 and models/sams_model.py:16,95 in the
    reference. Differentiable w.r.t. ``image`` (the reference backprops the
    temporal compositing through its CUDA op's atomicAdd backward,
    sams_model.py:234-236 — here the adjoint is the dense separable splat, see
    module docstring) and w.r.t. ``flow``.

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
