"""AttentiveMultiSpade: parallel SPADEs -> channel concat -> SAGAN attention ->
1-conv reduce (reference: models/networks/sams/attentive_multispade.py:11-50)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.activation import get_activation_fn
from shineon_tpu.networks.attention import SelfAttention
from shineon_tpu.networks.sams.multispade import as_labelmap_dict
from shineon_tpu.networks.sams.spade import (
    SPADE,
    _conv_same,
    _resize_nearest,
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
        keys = sorted(labelmaps.keys())
        # parallel (not sequential) modulations -> one fused launch per label
        mode = "apply_fused" if fused_spade_enabled(train) else "apply"
        spades = [
            SPADE(
                config_text=self.config_text,
                activation=self.activation,
                dtype=self.dtype,
                name=f"spade_{key}",
            )
            for key in keys
        ]
        # block-diagonal mlp_shared packing (see MultiSpade — one conv
        # stream computes every label's hidden map; numerics unchanged)
        hiddens = [None] * len(keys)
        if ks == 3 and len(keys) > 1 and mode == "apply":
            shared = [
                sp(x, labelmaps[key], train=train, mode="shared_params")
                for sp, key in zip(spades, keys)
            ]
            segs = [
                _resize_nearest(
                    labelmaps[key], x.shape[-3], x.shape[-2]
                ).astype(x.dtype)
                for key in keys
            ]
            cs = [s.shape[-1] for s in segs]
            total = sum(cs)
            blocks, off = [], 0
            for (w, _), c in zip(shared, cs):
                blocks.append(
                    jnp.pad(w, ((0, 0), (0, 0), (off, total - off - c),
                                (0, 0)))
                )
                off += c
            wsh_bd = jnp.concatenate(blocks, axis=-1)
            bsh_cat = jnp.concatenate([b for _, b in shared])
            cd = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
            actvn = get_activation_fn(self.activation)
            h_all = actvn(
                _conv_same(jnp.concatenate(segs, axis=-1), wsh_bd, bsh_cat,
                           cd)
            )
            nh = shared[0][0].shape[-1]
            hiddens = [
                h_all[..., i * nh:(i + 1) * nh] for i in range(len(keys))
            ]
        outputs = [
            sp(x, labelmaps[key], train=train, mode=mode, hidden=h)
            for sp, key, h in zip(spades, keys, hiddens)
        ]
        together = jnp.concatenate(outputs, axis=-1)
        attended = SelfAttention(dtype=self.dtype, name="attention_layer")(together)
        pad = ((ks // 2, ks // 2),) * 2
        out = nn.Conv(x.shape[-1], (ks, ks), padding=pad, dtype=self.dtype,
                      name="mlp_final")(attended)
        return nn.leaky_relu(out, negative_slope=0.01)
