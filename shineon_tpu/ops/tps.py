"""Thin-plate-spline grid generation, TPU-first.

Capability of the reference's ``TpsGridGen`` (models/networks/cpvton/warp.py:116-318)
re-derived as a single basis matmul: the per-pixel radial-basis loop of the
reference becomes

    grid' = basis @ (L^{-1} @ [Q; 0])

where ``basis`` is the precomputed (H*W, N+3) matrix [U_1..U_N, 1, X, Y] over the
output sampling grid and ``Q`` the batch of control-point targets. XLA folds the
basis into a constant, and the whole warp-field computation is one
(H*W, N+3) x (N+3, 2) matmul per sample — MXU work instead of H*W*N broadcast
tensors.

Numerics match the reference exactly, including its quirks:
  * squared point distances of exactly 0 are replaced by 1 before the
    ``d^2 log d^2`` transform (warp.py:178-180, 283-285),
  * control points come from ``np.meshgrid(axis, axis)`` with the 'xy' indexing
    the reference uses (warp.py:140-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TpsGridGen", "tps_control_points", "tps_l_inverse", "tps_basis"]


def tps_control_points(grid_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Regular control-point lattice in [-1, 1]^2 (warp.py:139-147).

    Returns (P_X, P_Y) each of shape (N,) with N = grid_size**2.
    """
    axis_coords = np.linspace(-1, 1, grid_size)
    # NB: reference assigns P_Y first from 'xy' meshgrid: P_Y varies along rows.
    P_Y, P_X = np.meshgrid(axis_coords, axis_coords)
    return P_X.reshape(-1).astype(np.float32), P_Y.reshape(-1).astype(np.float32)


def _u(dist_squared: np.ndarray) -> np.ndarray:
    """TPS radial basis U(d^2) = d^2 * log(d^2), with U(0) defined via d^2 -> 1."""
    d2 = np.where(dist_squared == 0, 1.0, dist_squared)
    return d2 * np.log(d2)


def tps_l_inverse(P_X: np.ndarray, P_Y: np.ndarray) -> np.ndarray:
    """Inverse of the TPS system matrix L (warp.py:169-189). Shape (N+3, N+3)."""
    N = P_X.shape[0]
    d2 = (P_X[:, None] - P_X[None, :]) ** 2 + (P_Y[:, None] - P_Y[None, :]) ** 2
    K = _u(d2)
    P = np.stack([np.ones(N, np.float32), P_X, P_Y], axis=1)  # (N, 3)
    L = np.zeros((N + 3, N + 3), np.float32)
    L[:N, :N] = K
    L[:N, N:] = P
    L[N:, :N] = P.T
    return np.linalg.inv(L).astype(np.float32)


def tps_basis(out_h: int, out_w: int, P_X: np.ndarray, P_Y: np.ndarray) -> np.ndarray:
    """Per-pixel basis [U_1..U_N, 1, X, Y] over the normalized sampling grid.

    The sampling grid is ``np.meshgrid(linspace(-1,1,W), linspace(-1,1,H))``
    (warp.py:127-131). Shape (H*W, N+3).
    """
    grid_X, grid_Y = np.meshgrid(
        np.linspace(-1, 1, out_w), np.linspace(-1, 1, out_h)
    )
    px = grid_X.reshape(-1, 1).astype(np.float32)  # (H*W, 1)
    py = grid_Y.reshape(-1, 1).astype(np.float32)
    d2 = (px - P_X[None, :]) ** 2 + (py - P_Y[None, :]) ** 2  # (H*W, N)
    U = _u(d2)
    ones = np.ones_like(px)
    return np.concatenate([U, ones, px, py], axis=1).astype(np.float32)


class TpsGridGen:
    """Generates a (B, H, W, 2) sampling grid from TPS parameters theta.

    theta is (B, 2N): the first N entries are X offsets of the control points,
    the last N are Y offsets, added to the base lattice (warp.py:250-253).
    The output grid feeds :func:`shineon_tpu.ops.grid_sample.grid_sample`.
    """

    def __init__(self, out_h: int = 256, out_w: int = 192, grid_size: int = 3):
        self.out_h, self.out_w, self.grid_size = out_h, out_w, grid_size
        P_X, P_Y = tps_control_points(grid_size)
        self.N = N = P_X.shape[0]
        Li = tps_l_inverse(P_X, P_Y)  # (N+3, N+3)
        # Only the first N columns of Li matter: the appended zeros of [Q; 0]
        # kill the rest (this reproduces W = Li[:N,:N] Q, A = Li[N:,:N] Q).
        self._solve = jnp.asarray(Li[:, :N])  # (N+3, N)
        # Basis ordered [U..., 1, X, Y] to match A_0 + A_1 X + A_2 Y + sum W U.
        self._basis = jnp.asarray(tps_basis(out_h, out_w, P_X, P_Y))  # (H*W, N+3)
        self._P_base = jnp.asarray(np.stack([P_X, P_Y], axis=1))  # (N, 2)

    def __call__(self, theta: jnp.ndarray) -> jnp.ndarray:
        B = theta.shape[0]
        N = self.N
        Q = theta.reshape(B, 2, N).transpose(0, 2, 1)  # (B, N, 2): [:,:,0]=X offs
        Q = Q + self._P_base[None]
        # weights: (B, N+3, 2); grid': (B, H*W, 2). These contractions are tiny
        # (N+3 <= 28) but feed sampling coordinates, so run them at full f32
        # precision even on the MXU.

        weights = jnp.einsum(
            "kn,bnd->bkd", self._solve, Q, precision=jax.lax.Precision.HIGHEST
        )
        flat = jnp.einsum(
            "pk,bkd->bpd", self._basis, weights,
            precision=jax.lax.Precision.HIGHEST,
        )
        return flat.reshape(B, self.out_h, self.out_w, 2)
