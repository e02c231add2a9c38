"""Fused SAGAN self-attention kernel (Pallas/TPU).

The SAGAN block (reference models/networks/attention/sagan.py:29-54) computes
``softmax(Q K^T) V`` over N = H*W tokens (<= 48*64 = 3072 at the reference's
feature resolutions). A naive XLA lowering materializes the (B, N, N)
attention matrix in HBM (3072^2 f32 = 37 MB per sample) — pure HBM bandwidth
waste. This kernel tiles queries over the grid, keeps K/V resident in VMEM
(3072 x d is small), computes the scores tile in VMEM, applies an exact
row softmax, and contracts with V — the N x N matrix never leaves the chip.

Backward pass: recompute-based custom VJP in plain XLA (the same einsum math),
so the module stays trainable while the hot inference path uses the kernel.
Falls back to the einsum path automatically off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sagan_attention"]


def _attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """einsum fallback — the exact reference math (no scaling; SAGAN uses raw
    dot products)."""
    energy = jnp.einsum(
        "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(energy, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmc->bnc", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)  # (TQ, d)
    k = k_ref[...].astype(jnp.float32)  # (N, d)
    v = v_ref[...].astype(jnp.float32)  # (N, dv)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / denom
    o_ref[...] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_attention_single(q, k, v, tile_q: int):
    N, d = q.shape
    dv = v.shape[-1]
    grid = (pl.cdiv(N, tile_q),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, dv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, dv), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * N * (d + dv),
            bytes_accessed=(N * d * 2 + N * dv * 2) * 4,
            transcendentals=N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            # K/V stay resident + a (tile_q, N) scores tile; the default 16M
            # scoped budget is too small at N=3072, dv=512
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sagan_attention(q, k, v, tile_q: int = 256):
    """softmax(Q K^T) V.

    Args:
      q, k: (B, N, d) query/key projections (d = C/8 in SAGAN).
      v: (B, N, dv) value projection.
      tile_q: query tile per grid step (rounded to the token count).

    Returns (B, N, dv).
    """
    return _forward(q, k, v, tile_q)


def _forward(q, k, v, tile_q):
    on_tpu = jax.devices()[0].platform == "tpu"
    N = q.shape[-2]
    # Mosaic wants lane-aligned tiles; oddly-shaped token counts take the
    # einsum path (still fused reasonably by XLA). Below ~1k tokens the
    # (N, N) matrix is small enough that XLA's own fusion wins (measured:
    # docs/ATTENTION_BENCH.md — einsum 1.5-2x faster at N=768, kernel
    # 1.1-1.75x faster at N=3072), so the kernel only engages at large N.
    if not on_tpu or N % 128 != 0 or N < 1024:
        return _attention_reference(q, k, v)
    tq = min(tile_q, N)
    return jax.vmap(lambda a, b, c: _pallas_attention_single(a, b, c, tq))(q, k, v)


def _fwd(q, k, v, tile_q):
    return _forward(q, k, v, tile_q), (q, k, v)


def _bwd(tile_q, residuals, g):
    """Recompute-based backward in XLA (standard softmax-attention VJP)."""
    q, k, v = residuals
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    scores = jnp.einsum("bnc,bmc->bnm", qf, kf)
    attn = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bnm,bnc->bmc", attn, gf)
    dattn = jnp.einsum("bnc,bmc->bnm", gf, vf)
    # softmax VJP: dscores = attn * (dattn - sum(dattn * attn, -1, keepdims))
    dscores = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmc->bnc", dscores, kf)
    dk = jnp.einsum("bnm,bnc->bmc", dscores, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


sagan_attention.defvjp(_fwd, _bwd)
