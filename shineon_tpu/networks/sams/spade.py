"""SPADE normalization + AnySpadeResBlock, flax/NHWC.

Reference: models/networks/sams/spade.py:19-192 (NVIDIA SPADE lineage). The
``config_text`` grammar (e.g. ``spadesyncbatch3x3``) is preserved: param-free
norm type + SPADE MLP kernel size. Sync-batch collapses to batch statistics
over the (globally sharded) batch — see shineon_tpu.networks.normalization.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.networks.activation import (
    get_activation_fn,
    get_resblock_activation_fn,
)
from shineon_tpu.networks.normalization import InstanceNorm, SyncBatchNorm


def parse_spade_config(config_text: str) -> tuple[str, int]:
    """'spadesyncbatch3x3' -> ('syncbatch', 3) (reference spade.py:36-59)."""
    assert config_text.startswith("spade")
    parsed = re.search(r"spade(\D+)(\d)x\d", config_text)
    norm_type = str(parsed.group(1))
    if norm_type not in ("instance", "syncbatch", "batch"):
        raise ValueError(
            "SPADE config names an unknown param-free norm: %s" % norm_type
        )
    return norm_type, int(parsed.group(2))


def _resize_nearest(segmap: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch F.interpolate(mode="nearest") semantics: src = floor(dst * in/out)
    (jax.image.resize uses half-pixel rounding, which picks different pixels
    on downscale — parity with converted checkpoints requires torch's rule)."""
    in_h, in_w = segmap.shape[-3], segmap.shape[-2]
    if (in_h, in_w) == (h, w):
        return segmap
    rows = jnp.floor(jnp.arange(h) * (in_h / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (in_w / w)).astype(jnp.int32)
    out = jnp.take(segmap, rows, axis=-3)
    return jnp.take(out, cols, axis=-2)


class SPADE(nn.Module):
    """Param-free norm + segmap-conditioned (1+gamma, beta) modulation
    (spade.py:61-103). ``norm_nc`` inferred from the input."""

    config_text: str = "spadeinstance3x3"
    activation: str = "relu"
    nhidden: int = 128  # hardcoded in the reference too (spade.py:68)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, segmap: jnp.ndarray, train: bool = True):
        norm_type, ks = parse_spade_config(self.config_text)
        if norm_type == "instance":
            normalized = InstanceNorm(affine=False, dtype=self.dtype)(x)
        else:
            # batch/syncbatch: both are global-batch statistics under pjit.
            normalized = SyncBatchNorm(
                use_running_average=not train, affine=False, dtype=self.dtype
            )(x)

        segmap = _resize_nearest(segmap, x.shape[-3], x.shape[-2]).astype(x.dtype)
        pad = ((ks // 2, ks // 2), (ks // 2, ks // 2))
        actvn = get_activation_fn(self.activation)
        h = nn.Conv(self.nhidden, (ks, ks), padding=pad, dtype=self.dtype,
                    name="mlp_shared")(segmap)
        h = actvn(h)
        gamma = nn.Conv(x.shape[-1], (ks, ks), padding=pad, dtype=self.dtype,
                        name="mlp_gamma")(h)
        beta = nn.Conv(x.shape[-1], (ks, ks), padding=pad, dtype=self.dtype,
                       name="mlp_beta")(h)
        return normalized * (1.0 + gamma) + beta


class AnySpadeResBlock(nn.Module):
    """SPADE ResNet block parameterized by the spade class (spade.py:106-192).

    ``spade_ctor(name)`` builds the normalization sub-module; the segmap
    argument is whatever that spade class consumes (tensor or dict of tensors).
    Spectral norm wraps the convs when "spectral" is in norm_G.
    """

    fin: int
    fout: int
    norm_G: str
    spade_ctor: type = SPADE  # bound via functools.partial with its kwargs
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = True, update_stats: bool = False):
        learned_shortcut = self.fin != self.fout
        fmiddle = min(self.fin, self.fout)
        spectral = "spectral" in self.norm_G
        spade_config = self.norm_G.replace("spectral", "")
        actvn = get_resblock_activation_fn(self.activation)

        def conv(h, feats, ksize, use_bias, name):
            pad = ((ksize // 2, ksize // 2),) * 2
            layer = nn.Conv(feats, (ksize, ksize), padding=pad, use_bias=use_bias,
                            dtype=self.dtype, name=name)
            if spectral:
                return nn.SpectralNorm(layer)(h, update_stats=update_stats)
            return layer(h)

        def spade(name):
            return self.spade_ctor(
                config_text=spade_config, activation=self.activation,
                dtype=self.dtype, name=name,
            )

        if learned_shortcut:
            x_s = spade("norm_s")(x, seg, train=train)
            x_s = conv(x_s, self.fout, 1, False, "conv_s")
        else:
            x_s = x

        dx = spade("spade_0")(x, seg, train=train)
        dx = conv(actvn(dx), fmiddle, 3, True, "conv_0")
        dx = spade("spade_1")(dx, seg, train=train)
        dx = conv(actvn(dx), self.fout, 3, True, "conv_1")
        return x_s + dx
