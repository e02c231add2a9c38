"""AttentiveMultiSpade: parallel SPADEs -> channel concat -> SAGAN attention ->
1-conv reduce (reference: models/networks/sams/attentive_multispade.py:11-50)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.attention import SelfAttention
from shineon_tpu.networks.sams.multispade import as_labelmap_dict
from shineon_tpu.networks.sams.spade import (
    SPADE,
    fused_spade_enabled,
    parse_spade_config,
)


class AttentiveMultiSpade(nn.Module):
    config_text: str = "spadeinstance3x3"
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        labelmaps = as_labelmap_dict(seg)
        _, ks = parse_spade_config(self.config_text)
        # parallel (not sequential) modulations -> one fused launch per label
        mode = "apply_fused" if fused_spade_enabled(train) else "apply"
        outputs = [
            SPADE(
                config_text=self.config_text,
                activation=self.activation,
                dtype=self.dtype,
                name=f"spade_{key}",
            )(x, labelmaps[key], train=train, mode=mode)
            for key in sorted(labelmaps.keys())
        ]
        together = jnp.concatenate(outputs, axis=-1)
        attended = SelfAttention(dtype=self.dtype, name="attention_layer")(together)
        pad = ((ks // 2, ks // 2),) * 2
        out = nn.Conv(x.shape[-1], (ks, ks), padding=pad, dtype=self.dtype,
                      name="mlp_final")(attended)
        return nn.leaky_relu(out, negative_slope=0.01)
