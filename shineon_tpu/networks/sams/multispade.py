"""MultiSpade: N sequential SPADEs, one per labelmap, sorted key order
(reference: models/networks/sams/multispade.py:8-77; WC-Vid2Vid page 24)."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.sams.spade import SPADE

DEFAULT_KEY = "default_key"


def as_labelmap_dict(seg: Union[jnp.ndarray, Mapping[str, jnp.ndarray]]):
    if isinstance(seg, Mapping):
        return seg
    return {DEFAULT_KEY: seg}


class MultiSpade(nn.Module):
    """Applies one SPADE per labelmap sequentially, keys sorted alphabetically
    (multispade.py:59-66)."""

    config_text: str = "spadeinstance3x3"
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        labelmaps = as_labelmap_dict(seg)
        for key in sorted(labelmaps.keys()):
            x = SPADE(
                config_text=self.config_text,
                activation=self.activation,
                dtype=self.dtype,
                name=f"spade_{key}",
            )(x, labelmaps[key], train=train)
        return x
