"""PatchGAN discriminators (reference: models/networks/discriminator.py:16-145).

NLayerDiscriminator: k4 conv pyramid with LeakyReLU(0.2); norm from a
``spectral``-prefixed config string (default ``spectralinstance``). Returns the
intermediate feature list (for GAN feature matching) unless disabled.

MultiscaleDiscriminator: ``num_D`` NLayer discriminators over an avg-pool
pyramid (k3 s2, count_include_pad=False).
"""

from __future__ import annotations

from typing import Any, List, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.init import kernel_init_for
from shineon_tpu.networks.normalization import InstanceNorm, SyncBatchNorm

_PAD2 = ((2, 2), (2, 2))


def _avg_pool_no_pad_count(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(x, 3, stride=2, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    summed = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))) * 9.0
    counts = nn.avg_pool(ones, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))) * 9.0
    return summed / counts


class NLayerDiscriminator(nn.Module):
    """(discriminator.py:78-145)."""

    ndf: int = 64
    n_layers: int = 4
    norm_D: str = "spectralinstance"
    init_type: str = "xavier"
    init_gain: float = 0.02
    get_intermediate_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, update_stats: bool = False
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        kinit = kernel_init_for(self.init_type, self.init_gain)
        spectral = self.norm_D.startswith("spectral")
        subnorm = self.norm_D[len("spectral"):] if spectral else self.norm_D
        kw, padw = 4, 2  # int(ceil((4-1)/2)) = 2

        def conv(h, feats, stride, name, normed):
            layer = nn.Conv(
                feats, (kw, kw), strides=(stride, stride), padding=_PAD2,
                # bias dropped when a norm follows (normalization.py:33-36)
                use_bias=not normed or subnorm == "none",
                kernel_init=kinit, dtype=self.dtype, name=name,
            )
            if spectral:
                return nn.SpectralNorm(layer)(h, update_stats=update_stats)
            return layer(h)

        def norm(h):
            if subnorm in ("none", ""):
                return h
            if subnorm == "instance":
                return InstanceNorm(affine=False, dtype=self.dtype)(h)
            if subnorm in ("batch", "sync_batch"):
                return SyncBatchNorm(
                    use_running_average=not train, dtype=self.dtype
                )(h)
            raise ValueError(f"unrecognized norm_D: {self.norm_D}")

        results = []
        nf = self.ndf
        h = conv(x, nf, 2, "conv0", normed=False)
        h = nn.leaky_relu(h, negative_slope=0.2)
        results.append(h)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            h = conv(h, nf, stride, f"conv{n}", normed=True)
            h = norm(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            results.append(h)
        h = conv(h, 1, 1, "conv_out", normed=False)
        results.append(h)
        if self.get_intermediate_features:
            return results
        return results[-1]


class MultiscaleDiscriminator(nn.Module):
    """(discriminator.py:16-74). Returns a list (one per scale) of feature
    lists (or logits when features are disabled)."""

    num_D: int = 2
    ndf: int = 64
    n_layers: int = 4
    norm_D: str = "spectralinstance"
    init_type: str = "xavier"
    init_gain: float = 0.02
    get_intermediate_features: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True, update_stats: bool = False):
        results = []
        h = x
        for i in range(self.num_D):
            out = NLayerDiscriminator(
                ndf=self.ndf,
                n_layers=self.n_layers,
                norm_D=self.norm_D,
                init_type=self.init_type,
                init_gain=self.init_gain,
                get_intermediate_features=self.get_intermediate_features,
                dtype=self.dtype,
                name=f"discriminator_{i}",
            )(h, train=train, update_stats=update_stats)
            if not self.get_intermediate_features:
                out = [out]
            results.append(out)
            h = _avg_pool_no_pad_count(h)
        return results
