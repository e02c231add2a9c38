"""SAGAN self-attention (reference: models/networks/attention/sagan.py:5-54).

The q/k/v 1x1 convs and the (H*W)^2 attention become three matmuls + a softmax
— all MXU work under one jit. At the reference's feature resolutions
(<= 48x64 = 3072 tokens) this fits comfortably in VMEM and XLA fuses the
softmax with the surrounding contractions; no sequence sharding is needed
(SURVEY §5.7).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from shineon_tpu.networks.init import kernel_init_for

ATTENTION_TYPES = ("sagan",)


class SelfAttention(nn.Module):
    """out = gamma * (attn @ V) + x, with Q/K at C/8 channels.

    gamma starts at 0 so the block is initially the identity
    (sagan.py:26, 52-53).
    """

    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B = x.shape[0]
        H, W, C = x.shape[-3:]
        kinit = kernel_init_for(self.init_type, self.init_gain)
        q = nn.Conv(C // 8, (1, 1), kernel_init=kinit, dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(C // 8, (1, 1), kernel_init=kinit, dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(C, (1, 1), kernel_init=kinit, dtype=self.dtype, name="value_conv")(x)
        n = H * W
        q = q.reshape(B, n, C // 8)
        k = k.reshape(B, n, C // 8)
        v = v.reshape(B, n, C)
        # fused Pallas kernel on TPU (keeps the n x n attention matrix in
        # VMEM); einsum fallback elsewhere — see ops/fused_attention.py
        from shineon_tpu.ops.fused_attention import sagan_attention

        out = sagan_attention(q, k, v)
        out = out.reshape(B, H, W, C).astype(x.dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out + x
