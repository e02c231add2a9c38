"""MultiSpade: N sequential SPADEs, one per labelmap, sorted key order
(reference: models/networks/sams/multispade.py:8-77; WC-Vid2Vid page 24)."""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Union

import os

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.activation import get_activation_fn
from shineon_tpu.networks.sams.spade import (
    SPADE,
    _conv_same,
    _resize_nearest,
    fused_spade_chain_enabled,
    fused_spade_enabled,
    int8_spade_enabled,
    parse_spade_config,
)
from shineon_tpu.ops.fused_spade import fused_multispade_modulate

DEFAULT_KEY = "default_key"


def as_labelmap_dict(seg: Union[jnp.ndarray, Mapping[str, jnp.ndarray]]):
    if isinstance(seg, Mapping):
        return seg
    return {DEFAULT_KEY: seg}


class MultiSpade(nn.Module):
    """Applies one SPADE per labelmap sequentially, keys sorted alphabetically
    (multispade.py:59-66).

    At serving the whole L-label chain (norm -> segmap MLP -> gamma/beta ->
    modulate, per label) collapses into ONE fused Pallas kernel launch
    (shineon_tpu.ops.fused_spade); each child SPADE contributes its params
    via mode="args" so the variable tree is identical either way.
    """

    config_text: str = "spadeinstance3x3"
    activation: str = "relu"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        labelmaps = as_labelmap_dict(seg)
        keys = sorted(labelmaps.keys())
        norm_type, ks = parse_spade_config(self.config_text)
        spades = [
            SPADE(
                config_text=self.config_text,
                activation=self.activation,
                dtype=self.dtype,
                name=f"spade_{key}",
            )
            for key in keys
        ]
        site = (x.shape[-3], x.shape[-2], x.shape[-1])
        if fused_spade_chain_enabled(train, site) and ks == 3:
            # Label k's norm statistics are taken from the INTERMEDIATE
            # chain value. Only running-average stats (batch/syncbatch at
            # eval) are intermediate-independent, allowing one kernel for
            # the whole chain; instance norm (per-sample stats) chains
            # per-label fused launches instead.
            if norm_type != "instance" and not train:
                per_label = [
                    spade(x, labelmaps[key], train=train, mode="args")
                    for spade, key in zip(spades, keys)
                ]
                abs_, segs, wshs, bshs, wgbs, bgbs = zip(*per_label)
                return fused_multispade_modulate(
                    x, jnp.stack(abs_, axis=1), segs, wshs, bshs, wgbs, bgbs,
                    act_name=self.activation,
                    quantized=int8_spade_enabled(train),
                )
            if fused_spade_enabled(train):
                # instance norm chains per-label fused launches — only under
                # the explicit SHINEON_FUSED_SPADE=1 override (the auto
                # winners table is measured for the whole-chain kernel)
                for spade, key in zip(spades, keys):
                    x = spade(x, labelmaps[key], train=train,
                              mode="apply_fused")
                return x

        # Grouped mlp_shared packing: the hidden maps depend only on the
        # segmaps (not the chain value), so all L labels' tiny-Cin
        # (2-4 channel) convs run as ONE feature-grouped conv — each label
        # is a group, with segmaps/kernels zero-padded to the widest label's
        # channel count (zero channels x zero kernel rows contribute exact
        # zeros, so parameters and numerics are unchanged). Measured at the
        # dominant full-res site (3x3, 4 labels x 3ch, 512 hidden out, B16,
        # v5e): grouped 1.756 ms vs the previous zero-padded block-diagonal
        # DENSE conv 2.321 ms — the dense form paid for the off-block zeros
        # as real MACs (docs/PERF_NOTES.md round 5).
        hiddens = [None] * len(keys)
        if ks == 3 and len(keys) > 1:
            shared = [
                spade(x, labelmaps[key], train=train, mode="shared_params")
                for spade, key in zip(spades, keys)
            ]
            segs = [
                _resize_nearest(
                    labelmaps[key], x.shape[-3], x.shape[-2]
                ).astype(x.dtype)
                for key in keys
            ]
            cd = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
            actvn = get_activation_fn(self.activation)
            if os.environ.get("SHINEON_GROUPED_MLP_SHARED", "0") == "1":
                cmax = max(s.shape[-1] for s in segs)
                segs_p = [
                    jnp.pad(s, ((0, 0),) * 3 + ((0, cmax - s.shape[-1]),))
                    for s in segs
                ]
                kern_p = [
                    jnp.pad(w,
                            ((0, 0), (0, 0), (0, cmax - w.shape[2]), (0, 0)))
                    for w, _ in shared
                ]
                wsh_g = jnp.concatenate(kern_p, axis=-1)  # (k,k,cmax,L*nh)
                bsh_cat = jnp.concatenate([b for _, b in shared])
                h_all = actvn(
                    _conv_same(
                        jnp.concatenate(segs_p, axis=-1), wsh_g, bsh_cat, cd,
                        feature_group_count=len(keys),
                    )
                )
            else:
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
                h_all = actvn(
                    _conv_same(jnp.concatenate(segs, axis=-1), wsh_bd,
                               bsh_cat, cd)
                )
            nh = shared[0][0].shape[-1]
            hiddens = [
                h_all[..., i * nh:(i + 1) * nh] for i in range(len(keys))
            ]
        for spade, key, h in zip(spades, keys, hiddens):
            x = spade(x, labelmaps[key], train=train, hidden=h)
        return x
