"""Correlation ops: global all-pairs correlation (GMM) and windowed cost volume
(FlowNet2-style).

Global correlation replaces ``FeatureCorrelation`` (models/networks/cpvton/
warp.py:53-67): an all-pairs channel dot product expressed as one batched
matmul — exactly the kind of large, dense contraction the MXU wants. The output
channel ordering matches the reference's transpose dance so that downstream
regression weights are interchangeable: output channel ``k`` indexes source
location ``(x_A, y_A)`` with ``k = x_A * H + y_A``.

The windowed cost volume replaces the flownet2 ``correlation_package`` CUDA
kernel (SURVEY §2.9): for every displacement (dy, dx) in a (2*max_disp+1)^2
window it computes the mean channel dot product between feature1 and the
shifted feature2. On TPU this is expressed as a shift-and-multiply sweep whose
inner product vectorizes on the VPU and fuses into one kernel under XLA; the
displacement loop is a static Python loop (compile-time unrolled, shapes fixed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["global_correlation", "cost_volume"]


@jax.jit
def global_correlation(feature_a: jnp.ndarray, feature_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation of two NHWC feature maps.

    Args:
      feature_a: (B, H, W, C) — in the GMM this is the person features.
      feature_b: (B, H, W, C) — cloth features.

    Returns:
      (B, H, W, H*W) tensor; position (h, w) of the map holds the dot products
      of feature_b[h, w] against every location of feature_a, ordered with
      channel index k = x_A * H + y_A (reference warp.py:59-66 ordering).
    """
    B, H, W, C = feature_a.shape
    # reference: A viewed as (c, w*h) after transposing H and W.
    a = feature_a.transpose(0, 2, 1, 3).reshape(B, W * H, C)  # (B, WH, C), k=x*H+y
    b = feature_b.reshape(B, H * W, C)
    corr = jnp.einsum(
        "bpc,bkc->bpk",
        b.astype(jnp.float32),
        a.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return corr.reshape(B, H, W, W * H).astype(feature_a.dtype)


@functools.partial(jax.jit, static_argnames=("max_displacement", "stride"))
def cost_volume(
    feature1: jnp.ndarray,
    feature2: jnp.ndarray,
    max_displacement: int = 4,
    stride: int = 1,
) -> jnp.ndarray:
    """Local correlation cost volume (flownet2 Correlation with kernel_size=1).

    Args:
      feature1/feature2: (B, H, W, C).
      max_displacement: window radius in pixels (flownet2 FlowNetC uses
        max_displacement=20 with stride2=2, i.e. displacements sampled every
        ``stride`` pixels).
      stride: displacement sampling stride (flownet2's stride2).

    Returns:
      (B, H, W, D*D) with D = 2*(max_displacement//stride)+1; channel order is
      row-major over (dy, dx), matching the CUDA kernel's layout. Values are the
      channel-mean of the products (the CUDA kernel divides by C).
    """
    B, H, W, C = feature1.shape
    md, s = max_displacement, stride
    offsets = range(-md, md + 1, s)
    padded2 = jnp.pad(
        feature2, ((0, 0), (md, md), (md, md), (0, 0)), mode="constant"
    )
    slices = []
    for dy in offsets:
        for dx in offsets:
            shifted = jax.lax.dynamic_slice(
                padded2, (0, md + dy, md + dx, 0), (B, H, W, C)
            )
            prod = jnp.sum(
                feature1.astype(jnp.float32) * shifted.astype(jnp.float32), axis=-1
            )
            slices.append(prod / C)
    out = jnp.stack(slices, axis=-1)
    return out.astype(feature1.dtype)
