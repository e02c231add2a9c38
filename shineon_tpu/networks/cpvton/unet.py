"""Recursive skip-connection U-Net generator, flax/NHWC.

Reference: models/networks/cpvton/unet.py:9-211. Structure per block:
down = [act?, conv(k4 s2 p1), norm?] ; up = [act, 2x bilinear upsample,
conv(k3 s1 p1), norm]; non-outermost blocks return cat([x, model(x)], channels).
Self-attention (SAGAN) is inserted from the innermost block upward while the
``num_attention`` budget lasts, appended after the downconv and after the up
stack (unet.py:30-97).

The bilinear upsample uses half-pixel (align_corners=False) coordinates like
``torch.nn.Upsample(mode="bilinear")``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.networks.activation import get_activation_fn
from shineon_tpu.networks.attention import SelfAttention
from shineon_tpu.networks.init import kernel_init_for
from shineon_tpu.networks.normalization import InstanceNorm, SyncBatchNorm

_PAD1 = ((1, 1), (1, 1))


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, half-pixel convention (torch align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="linear")


class UnetSkipConnectionBlock(nn.Module):
    """One U-Net level (reference unet.py:103-198)."""

    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"  # "batch" | "instance"
    self_attn: bool = False
    use_dropout: bool = False
    activation: Optional[str] = None
    dtype: Optional[Any] = None

    def _norm(self, train: bool):
        if self.norm == "instance":
            return InstanceNorm(affine=False, dtype=self.dtype)
        return SyncBatchNorm(
            use_running_average=not train, init_gain=0.02, dtype=self.dtype
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        use_bias = self.norm == "instance"
        kinit = kernel_init_for("normal", 0.02)
        down_act = (
            (lambda h: nn.leaky_relu(h, negative_slope=0.2))
            if self.activation is None
            else get_activation_fn(self.activation)
        )
        up_act = (
            nn.relu if self.activation is None else get_activation_fn(self.activation)
        )

        h = x
        if not self.outermost:
            h = down_act(h)
        h = nn.Conv(
            self.inner_nc, (4, 4), strides=(2, 2), padding=_PAD1,
            use_bias=use_bias, kernel_init=kinit, dtype=self.dtype,
            name="downconv",
        )(h)
        if not self.outermost and not self.innermost:
            h = self._norm(train)(h)
        if self.self_attn:
            h = SelfAttention(dtype=self.dtype, name="down_attn")(h)

        if self.submodule is not None:
            h = self.submodule(h, train=train)

        h = up_act(h)
        h = upsample_bilinear_2x(h)
        h = nn.Conv(
            self.outer_nc, (3, 3), padding=_PAD1,
            use_bias=use_bias, kernel_init=kinit, dtype=self.dtype,
            name="upconv",
        )(h)
        h = self._norm(train)(h)
        if self.self_attn:
            h = SelfAttention(dtype=self.dtype, name="up_attn")(h)
        if self.use_dropout and not self.outermost and not self.innermost:
            h = nn.Dropout(0.5, deterministic=not train)(h)

        if self.outermost:
            return h
        return jnp.concatenate([x, h], axis=-1)


class UnetGenerator(nn.Module):
    """U-Net of ``num_downs`` levels with optional self-attention budget
    (reference unet.py:9-100)."""

    input_nc: int
    output_nc: int
    num_downs: int
    num_attention: int = 0
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    use_self_attn: bool = False
    activation: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        num_attention = self.num_attention

        def attn_on():
            return bool(self.use_self_attn) and num_attention > 0

        kwargs = dict(
            norm=self.norm, use_dropout=False, activation=self.activation,
            dtype=self.dtype,
        )
        block = UnetSkipConnectionBlock(
            self.ngf * 8, self.ngf * 8, innermost=True,
            self_attn=attn_on(), **kwargs,
        )
        num_attention -= 1
        for _ in range(self.num_downs - 5):
            block = UnetSkipConnectionBlock(
                self.ngf * 8, self.ngf * 8, submodule=block,
                self_attn=attn_on(),
                norm=self.norm, use_dropout=self.use_dropout,
                activation=self.activation, dtype=self.dtype,
            )
            num_attention -= 1
        for mult_outer, mult_inner in ((4, 8), (2, 4), (1, 2)):
            block = UnetSkipConnectionBlock(
                self.ngf * mult_outer, self.ngf * mult_inner, submodule=block,
                self_attn=attn_on(), **kwargs,
            )
            num_attention -= 1
        self.model = UnetSkipConnectionBlock(
            self.output_nc, self.ngf, input_nc=self.input_nc, submodule=block,
            outermost=True, self_attn=attn_on(), **kwargs,
        )

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return self.model(x, train=train)
