"""Numeric parity of grid_sample / resample2d / TPS against torch oracles.

torch (CPU) is used strictly as a reference implementation to validate our
XLA ops; it is not part of the framework.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from shineon_tpu.ops import TpsGridGen, feature_l2_norm, global_correlation, grid_sample, resample2d


def _rand_image(rng, b=2, h=16, w=12, c=3):
    return rng.randn(b, h, w, c).astype(np.float32)


def _rand_grid(rng, b=2, h=16, w=12, scale=1.2):
    # include out-of-bounds coords to exercise padding
    return (rng.rand(b, h, w, 2).astype(np.float32) * 2 - 1) * scale


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(rng, padding_mode, align_corners):
    img = _rand_image(rng)
    grid = _rand_grid(rng)
    ours = grid_sample(
        jnp.asarray(img), jnp.asarray(grid),
        padding_mode=padding_mode, align_corners=align_corners,
    )
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_upsampled_grid(rng):
    # grid resolution different from image resolution (warp model uses 256x192
    # grid over feature-sized images elsewhere)
    img = _rand_image(rng, b=1, h=8, w=6, c=2)
    grid = _rand_grid(rng, b=1, h=20, w=14)
    ours = grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode="border")
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_resample2d_identity_flow(rng):
    img = _rand_image(rng)
    flow = np.zeros(img.shape[:3] + (2,), np.float32)
    out = resample2d(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), img, rtol=1e-5, atol=1e-5)


def test_resample2d_integer_shift(rng):
    img = _rand_image(rng, b=1, h=8, w=8, c=1)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample from x+1
    out = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], rtol=1e-5, atol=1e-5)
    # border padding: last column replicates edge
    np.testing.assert_allclose(out[0, :, -1, 0], img[0, :, -1, 0], rtol=1e-5, atol=1e-5)


def test_feature_l2_norm_matches_torch(rng):
    feat = rng.randn(2, 4, 5, 7).astype(np.float32)
    ours = np.asarray(feature_l2_norm(jnp.asarray(feat)))
    t = torch.from_numpy(feat).permute(0, 3, 1, 2)
    norm = torch.pow(torch.sum(torch.pow(t, 2), 1) + 1e-6, 0.5).unsqueeze(1)
    theirs = (t / norm).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_global_correlation_matches_torch(rng):
    b, c, h, w = 2, 6, 4, 3
    fa = rng.randn(b, h, w, c).astype(np.float32)
    fb = rng.randn(b, h, w, c).astype(np.float32)
    ours = np.asarray(global_correlation(jnp.asarray(fa), jnp.asarray(fb)))

    # reference FeatureCorrelation (warp.py:53-67), NCHW
    A = torch.from_numpy(fa).permute(0, 3, 1, 2)
    B_ = torch.from_numpy(fb).permute(0, 3, 1, 2)
    A2 = A.transpose(2, 3).contiguous().view(b, c, h * w)
    B2 = B_.view(b, c, h * w).transpose(1, 2)
    mul = torch.bmm(B2, A2)
    theirs = mul.view(b, h, w, h * w).transpose(2, 3).transpose(1, 2)  # (b, hw, h, w)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("grid_size", [3, 5])
def test_tps_grid_matches_reference_math(rng, grid_size):
    """Validate the one-matmul TPS against a literal numpy transcription of the
    reference formula (warp.py:191-318)."""
    out_h, out_w = 32, 24
    N = grid_size * grid_size
    theta = (rng.rand(2, 2 * N).astype(np.float32) - 0.5) * 0.2

    gen = TpsGridGen(out_h, out_w, grid_size=grid_size)
    ours = np.asarray(gen(jnp.asarray(theta)))

    # literal reference math in numpy
    from shineon_tpu.ops.tps import tps_control_points, tps_l_inverse

    P_X, P_Y = tps_control_points(grid_size)
    Li = tps_l_inverse(P_X, P_Y)
    grid_X, grid_Y = np.meshgrid(np.linspace(-1, 1, out_w), np.linspace(-1, 1, out_h))
    for b in range(theta.shape[0]):
        Q_X = theta[b, :N] + P_X
        Q_Y = theta[b, N:] + P_Y
        W_X = Li[:N, :N] @ Q_X
        W_Y = Li[:N, :N] @ Q_Y
        A_X = Li[N:, :N] @ Q_X
        A_Y = Li[N:, :N] @ Q_Y
        d2 = (grid_X[..., None] - P_X) ** 2 + (grid_Y[..., None] - P_Y) ** 2
        d2 = np.where(d2 == 0, 1.0, d2)
        U = d2 * np.log(d2)
        px = A_X[0] + A_X[1] * grid_X + A_X[2] * grid_Y + (U * W_X).sum(-1)
        py = A_Y[0] + A_Y[1] * grid_X + A_Y[2] * grid_Y + (U * W_Y).sum(-1)
        np.testing.assert_allclose(ours[b, ..., 0], px, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ours[b, ..., 1], py, rtol=1e-4, atol=1e-5)


def test_tps_zero_theta_near_identity():
    """theta=0 must reproduce (approximately) the identity sampling grid."""
    gen = TpsGridGen(64, 48, grid_size=5)
    grid = np.asarray(gen(jnp.zeros((1, 50))))
    gx, gy = np.meshgrid(np.linspace(-1, 1, 48), np.linspace(-1, 1, 64))
    np.testing.assert_allclose(grid[0, ..., 0], gx, atol=1e-4)
    np.testing.assert_allclose(grid[0, ..., 1], gy, atol=1e-4)


def test_grid_sample_custom_vjp_matches_autodiff(rng):
    """The scatter-free backward (dense separable splat for d_image, corner
    gathers for d_grid) must equal XLA autodiff of the raw gather forward in
    every mode, including out-of-range and border-clipped coordinates."""
    import jax

    from shineon_tpu.ops.grid_sample import _grid_sample_cv, _grid_sample_impl

    B, H, W, C = 2, 13, 11, 3
    Hg, Wg = 9, 7
    img = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    grid = jnp.asarray(rng.rand(B, Hg, Wg, 2).astype(np.float32) * 3 - 1.5)
    g = jnp.asarray(rng.randn(B, Hg, Wg, C).astype(np.float32))
    for pm in ("zeros", "border"):
        for ac in (False, True):
            f_ref = lambda i, gr: jnp.vdot(_grid_sample_impl(i, gr, pm, ac), g)
            f_cv = lambda i, gr: jnp.vdot(_grid_sample_cv(i, gr, pm, ac), g)
            gi_r, gg_r = jax.grad(f_ref, argnums=(0, 1))(img, grid)
            gi_c, gg_c = jax.grad(f_cv, argnums=(0, 1))(img, grid)
            np.testing.assert_allclose(np.asarray(gi_r), np.asarray(gi_c),
                                       atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gg_r), np.asarray(gg_c),
                                       atol=1e-4, rtol=1e-4)
            np.testing.assert_allclose(
                np.asarray(_grid_sample_impl(img, grid, pm, ac)),
                np.asarray(_grid_sample_cv(img, grid, pm, ac)), atol=1e-6,
            )


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_onehot_forward_matches_torch_and_grad(rng, padding_mode,
                                               align_corners):
    """The TPU serving forward (separable one-hot contraction,
    _grid_sample_onehot_impl — 3.15x the block gather on the v5e, see
    tools/bench_warp_gather.py) must match torch grid_sample exactly, and
    its autodiff d/d-image and d/d-grid must match the block-gather
    custom VJP (it is the fallback forward for C > 16 callers where the
    custom VJP is disabled)."""
    from shineon_tpu.ops.grid_sample import (
        _grid_sample_cv,
        _grid_sample_onehot_impl,
    )

    img = _rand_image(rng)
    grid = _rand_grid(rng)
    ours = _grid_sample_onehot_impl(
        jnp.asarray(img), jnp.asarray(grid), padding_mode, align_corners
    )
    theirs = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)

    import jax

    def loss_oh(i, g):
        return jnp.sum(
            _grid_sample_onehot_impl(i, g, padding_mode, align_corners)
            ** 2
        )

    def loss_cv(i, g):
        return jnp.sum(
            _grid_sample_cv(i, g, padding_mode, align_corners) ** 2
        )

    gi_oh, gg_oh = jax.grad(loss_oh, argnums=(0, 1))(
        jnp.asarray(img), jnp.asarray(grid)
    )
    gi_cv, gg_cv = jax.grad(loss_cv, argnums=(0, 1))(
        jnp.asarray(img), jnp.asarray(grid)
    )
    np.testing.assert_allclose(np.asarray(gi_oh), np.asarray(gi_cv),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gg_oh), np.asarray(gg_cv),
                               rtol=1e-4, atol=1e-4)
