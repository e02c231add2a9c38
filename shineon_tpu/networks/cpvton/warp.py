"""GMM (Geometric Matching Module) networks, flax/NHWC.

Reference: models/networks/cpvton/warp.py — FeatureExtraction (9-36),
FeatureL2Norm (39-50), FeatureCorrelation (53-67), FeatureRegression (70-99),
TpsGridGen (116-318). The correlation and TPS math live in
:mod:`shineon_tpu.ops` as fused MXU ops; here are the learned conv stacks.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.init import kernel_init_for
from shineon_tpu.networks.normalization import SyncBatchNorm
from shineon_tpu.ops import TpsGridGen, feature_l2_norm, global_correlation

_PAD1 = ((1, 1), (1, 1))


class FeatureExtraction(nn.Module):
    """4x stride-2 conv downs (64->512, capped) + two 3x3 convs; conv-relu-norm
    ordering per the reference (warp.py:14-31)."""

    ngf: int = 64
    n_layers: int = 3
    init_gain: float = 0.02
    dtype: Optional[Any] = None  # compute dtype (bf16 policy); params stay f32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        kinit = kernel_init_for("normal", self.init_gain)

        def bn(h):
            return SyncBatchNorm(
                use_running_average=not train, init_gain=self.init_gain,
                dtype=self.dtype,
            )(h)

        h = nn.Conv(self.ngf, (4, 4), strides=(2, 2), padding=_PAD1,
                    kernel_init=kinit, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = bn(h)
        for i in range(self.n_layers):
            out_ngf = 2 ** (i + 1) * self.ngf if 2 ** i * self.ngf < 512 else 512
            h = nn.Conv(out_ngf, (4, 4), strides=(2, 2), padding=_PAD1,
                        kernel_init=kinit, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = bn(h)
        h = nn.Conv(512, (3, 3), padding=_PAD1, kernel_init=kinit, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = bn(h)
        h = nn.Conv(512, (3, 3), padding=_PAD1, kernel_init=kinit, dtype=self.dtype)(h)
        h = nn.relu(h)
        return h


class FeatureRegression(nn.Module):
    """Correlation map -> TPS parameters theta (warp.py:70-99).

    Two stride-2 convs then two 3x3 convs (conv-BN-relu), flatten, linear, tanh.
    The flatten transposes NHWC -> NCHW first so converted torch checkpoints
    drop in without permuting the dense kernel.
    """

    output_dim: int = 6
    init_gain: float = 0.02
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if x.shape[-3] < 8 or x.shape[-2] < 6:
            raise ValueError(
                "FeatureRegression needs a correlation map of at least 8x6 "
                f"(fine size >= 128x96); got spatial {x.shape[-3]}x{x.shape[-2]}. "
                "Smaller inputs collapse to zero-size activations in the "
                "stride-2 tower."
            )
        kinit = kernel_init_for("normal", self.init_gain)

        def block(h, feats, ksize, stride):
            h = nn.Conv(
                feats, (ksize, ksize), strides=(stride, stride),
                padding=_PAD1, kernel_init=kinit, dtype=self.dtype,
            )(h)
            h = SyncBatchNorm(
                use_running_average=not train, init_gain=self.init_gain,
                dtype=self.dtype,
            )(h)
            return nn.relu(h)

        h = block(x, 512, 4, 2)
        h = block(h, 256, 4, 2)
        h = block(h, 128, 3, 1)
        h = block(h, 64, 3, 1)
        B = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(B, -1)  # torch (C,H,W) flatten order
        h = nn.Dense(self.output_dim, kernel_init=kinit, dtype=self.dtype)(h)
        # theta feeds TPS sampling coordinates: keep full precision
        return jnp.tanh(h).astype(jnp.float32)


class GMM(nn.Module):
    """Full geometric matcher: person/cloth features -> correlation -> theta ->
    TPS sampling grid (reference WarpModel.forward, models/warp_model.py:63-72).
    """

    fine_height: int = 256
    fine_width: int = 192
    grid_size: int = 5
    ngf: int = 64
    dtype: Optional[Any] = None

    def setup(self):
        self.extractionA = FeatureExtraction(ngf=self.ngf, dtype=self.dtype)
        self.extractionB = FeatureExtraction(ngf=self.ngf, dtype=self.dtype)
        feat_h = self.fine_height // 16
        feat_w = self.fine_width // 16
        self.regression = FeatureRegression(
            output_dim=2 * self.grid_size ** 2, dtype=self.dtype
        )
        self._tps = TpsGridGen(self.fine_height, self.fine_width, self.grid_size)
        self._feat_hw = (feat_h, feat_w)

    def __call__(self, person: jnp.ndarray, cloth: jnp.ndarray, train: bool = True):
        feat_a = feature_l2_norm(self.extractionA(person, train=train))
        feat_b = feature_l2_norm(self.extractionB(cloth, train=train))
        corr = global_correlation(feat_a, feat_b)
        theta = self.regression(corr, train=train)
        grid = self._tps(theta)
        return grid, theta
