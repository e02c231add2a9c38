"""Fused SAGAN attention: math (fallback path on CPU; the Pallas kernel itself
is exercised on real TPU via bench/verify) and custom-VJP consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.ops.fused_attention import _attention_reference, sagan_attention


def _ref_highest(q, k, v):
    scores = jnp.einsum(
        "bnc,bmc->bnm", q, k, precision=jax.lax.Precision.HIGHEST
    )
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bnm,bmc->bnc", attn, v, precision=jax.lax.Precision.HIGHEST
    )


def test_forward_matches_reference(rng):
    q = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
    out = np.asarray(sagan_attention(q, k, v))
    ref = np.asarray(_ref_highest(q, k, v))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff(rng):
    q = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 32, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 32, 16).astype(np.float32))

    def loss_fused(args):
        q, k, v = args
        return jnp.sum(sagan_attention(q, k, v) ** 2)

    def loss_ref(args):
        q, k, v = args
        return jnp.sum(_ref_highest(q, k, v) ** 2)

    gf = jax.grad(loss_fused)((q, k, v))
    gr = jax.grad(loss_ref)((q, k, v))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_einsum_fallback_used_off_tpu(rng):
    # conftest pins the CPU platform, so this exercises the fallback branch
    q = jnp.zeros((1, 100, 8))  # N not lane-aligned either
    k = jnp.zeros((1, 100, 8))
    v = jnp.zeros((1, 100, 16))
    out = sagan_attention(q, k, v)
    assert out.shape == (1, 100, 16)
    ref = _attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
