"""Normalization layers: instance/batch/sync-batch + spectral-norm conv wrapper.

Reference: models/networks/normalization.py:14-48 (``get_nonspade_norm_layer``)
and the vendored SynchronizedBatchNorm package (SURVEY §2.6).

Sync batch-norm note (the reference's 730-line subsystem): under ``pjit`` with
the batch sharded over the "data" mesh axis, a plain ``jnp.mean`` over the batch
axis IS a cross-replica reduction — GSPMD inserts the all-reduce. Under
``shard_map``/``pmap`` the explicit ``axis_name`` triggers ``lax.pmean`` of the
(sum, sum-of-squares) moments. Both paths live in :class:`SyncBatchNorm`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.networks.init import batchnorm_scale_init


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (torch
    InstanceNorm2d semantics: eps 1e-5, no running stats, affine off by default)."""

    epsilon: float = 1e-5
    affine: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_affine: bool = False):
        # x: (..., H, W, C); normalize over H, W per sample/channel.
        # statistics in f32 for stability regardless of the compute dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
        var = jnp.var(xf, axis=(-3, -2), keepdims=True)
        if return_affine:
            # folded per-(sample, channel) coefficients: norm(x) = x*a + b
            if self.affine:
                raise NotImplementedError(
                    "return_affine with affine=True is unused"
                )
            a = jax.lax.rsqrt(var + self.epsilon)
            lead = x.shape[:-3]
            return (
                jnp.broadcast_to(a, lead + (1, 1, x.shape[-1])).reshape(
                    lead + (x.shape[-1],)
                ),
                jnp.broadcast_to(-mean * a, lead + (1, 1, x.shape[-1])).reshape(
                    lead + (x.shape[-1],)
                ),
            )
        y = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(
            self.dtype or x.dtype
        )
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class _BatchNormCore(nn.Module):
    """flax.linen.BatchNorm-compatible batch norm (same variable tree:
    ``batch_stats`` {mean, var}, ``params`` {scale, bias}; same running-stat
    update ``ra = m*ra + (1-m)*batch``, biased variance) with one deliberate
    lowering difference: the normalize is AFFINE-FOLDED, ``y = x*a + b`` with
    per-channel a = rsqrt(var+eps)[*scale], b = [bias] - mean*a, and the
    output cast is the root of that expression. flax's BatchNorm subtracts
    and multiplies full tensors in f32 and casts last, so any fan-out
    materializes f32 activations — measured as full-resolution
    f32[B,256,192,C] buffers inside the SAMS generator (docs/PROFILE_INFER.md
    companion analysis); folding keeps the f32 math per-channel and in
    registers, and anything XLA materializes is bf16."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    affine: bool = True
    axis_name: Optional[str] = None
    scale_init: Any = nn.initializers.ones
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool,
                 return_affine: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (C,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (C,)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if self.axis_name is not None:
                mean, mean2 = jax.lax.pmean((mean, mean2), self.axis_name)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var

        a = jax.lax.rsqrt(var + self.epsilon)
        b = -mean * a
        if self.affine:
            scale = self.param("scale", self.scale_init, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            a = a * scale
            b = b * scale + bias
        if return_affine:
            # folded per-channel coefficients: norm(x) = x*a + b
            return a, b
        out_dtype = self.dtype or x.dtype
        # x (maybe bf16) * a (f32) promotes to f32 in-register; the cast is
        # the expression root so materialized buffers are out_dtype
        return (x * a + b).astype(out_dtype)


class SyncBatchNorm(nn.Module):
    """Batch normalization whose statistics span the full (global) batch.

    The capability of the reference's SynchronizedBatchNorm2d
    (sync_batchnorm/batchnorm.py:51-396): replica-local moments are reduced
    across the data-parallel axis every forward pass. Here that is a single
    ``axis_name`` (=> lax.pmean inside shard_map/pmap), and automatic under
    pjit-sharded batches.

    torch parity: eps 1e-5, running-stat momentum 0.1 (flax momentum 0.9),
    affine=True. The variable tree matches flax's BatchNorm (child scope
    ``BatchNorm_0``) so converted checkpoints keep loading.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    affine: bool = True
    axis_name: Optional[str] = None
    init_gain: Optional[float] = None  # if set, scale ~ N(1, gain)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 return_affine: bool = False):
        scale_init = (
            batchnorm_scale_init(self.init_gain)
            if self.init_gain is not None
            else nn.initializers.ones
        )
        ura = nn.merge_param(
            "use_running_average",
            self.use_running_average,
            use_running_average,
        )
        return _BatchNormCore(
            momentum=self.momentum,
            epsilon=self.epsilon,
            affine=self.affine,
            scale_init=scale_init,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x, ura, return_affine=return_affine)


class SpectralConv(nn.Module):
    """Conv2d with spectral normalization of the kernel (torch
    nn.utils.spectral_norm semantics: one power-iteration step per forward,
    u/v persisted as non-trainable state in the 'batch_stats' collection)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = ((0, 0), (0, 0))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
        )
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


def make_norm_layer(norm_type: str, axis_name: Optional[str] = None):
    """Resolve a non-SPADE norm config string to a constructor.

    Reference get_nonspade_norm_layer (normalization.py:14-48): the string may
    carry a "spectral" prefix (handled by the caller wrapping its conv) and one
    of {batch, sync_batch, instance, none}.

    Returns a callable (train_flag) -> norm module, or None for "none".
    """
    subnorm = norm_type[len("spectral"):] if norm_type.startswith("spectral") else norm_type
    if subnorm in ("none", ""):
        return None
    if subnorm == "batch":
        return lambda train: SyncBatchNorm(use_running_average=not train)
    if subnorm == "sync_batch":
        return lambda train: SyncBatchNorm(
            use_running_average=not train, axis_name=axis_name
        )
    if subnorm == "instance":
        return lambda train: InstanceNorm(affine=False)
    raise ValueError(f"normalization layer {subnorm} is not recognized")
