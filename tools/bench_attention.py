"""Micro-benchmark: fused Pallas SAGAN attention vs the XLA einsum lowering.

VERDICT r1 asked for committed evidence that the Pallas kernel earns its place
(SURVEY §7 "fused kernels"). Measures softmax(QK^T)V at the SAGAN block's
production shape (N = H*W tokens at the attention feature resolution,
d = C/8 query/key width, dv = C value width) on the real chip, both dtypes.

Writes docs/ATTENTION_BENCH.md and prints one JSON line per config.

Usage: python tools/bench_attention.py [--iters 50]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shineon_tpu.ops.fused_attention import (  # noqa: E402
    _attention_reference,
    sagan_attention,
)


def _time_fn(fn, args, iters: int) -> float:
    """Time `iters` applications CHAINED on device inside one jitted
    fori_loop (the carry perturbs the next query), so the measurement is
    immune to host dispatch-rate artifacts and to XLA deduplicating
    repeated identical calls."""
    q, k, v = args
    d = q.shape[-1]

    @jax.jit
    def chained(q, k, v, n):
        def body(_, carry):
            out = fn(carry, k, v)
            # data dependence the compiler can't elide: feed a vanishing
            # slice of the output back into the next query
            return carry + out[..., :d].astype(carry.dtype) * 1e-20

        final = jax.lax.fori_loop(0, n, body, q)
        # reduce to a scalar: fetching a concrete value is the only reliable
        # completion barrier through the axon tunnel (block_until_ready can
        # return before execution finishes there)
        return jnp.sum(final.astype(jnp.float32))

    float(chained(q, k, v, 1))  # compile + warm

    def timed(n):
        # min over repeats: robust to host scheduling spikes
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(q, k, v, n))
            best = min(best, time.perf_counter() - t0)
        return best

    total = timed(iters)
    overhead = timed(1)
    return max(total - overhead, 1e-9) / (iters - 1)


def bench_config(B: int, N: int, d: int, dv: int, dtype, iters: int) -> dict:
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, N, d), dtype)
    k = jax.random.normal(kk, (B, N, d), dtype)
    v = jax.random.normal(kv, (B, N, dv), dtype)

    einsum = jax.jit(_attention_reference)
    pallas = jax.jit(lambda a, b, c: sagan_attention(a, b, c))

    t_einsum = _time_fn(einsum, (q, k, v), iters)
    t_pallas = _time_fn(pallas, (q, k, v), iters)

    # correctness guard: same math. Both paths run their matmuls through the
    # MXU, whose f32 contractions default to bf16 multiply passes, so even
    # f32-in/f32-out agreement between the XLA lowering and the Pallas kernel
    # is only guaranteed at bf16 mantissa level (~2^-8 relative).
    import numpy as np

    ref = np.asarray(einsum(q, k, v), np.float32)
    got = np.asarray(pallas(q, k, v), np.float32)
    atol = 3e-2
    max_err = float(np.max(np.abs(ref - got)))
    assert max_err < atol * max(1.0, float(np.max(np.abs(ref)))), max_err

    flops = 2 * B * N * N * (d + dv)
    return {
        "shape": f"B{B} N{N} d{d} dv{dv}",
        "dtype": dtype.__name__,
        "einsum_us": round(t_einsum * 1e6, 1),
        "pallas_us": round(t_pallas * 1e6, 1),
        "speedup": round(t_einsum / t_pallas, 3),
        "pallas_tflops": round(flops / t_pallas / 1e12, 2),
        "max_abs_err": max_err,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    args = p.parse_args()

    platform = jax.devices()[0].platform
    rows = []
    # production shapes: UNet attention at 8x6..32x24 tokens (self_attn in the
    # TOM path) and the SAGAN block at 48x64; d = C/8
    for (B, N, d, dv) in [(4, 3072, 64, 512), (4, 3072, 16, 128),
                          (4, 768, 64, 512), (16, 3072, 64, 512)]:
        for dtype in (jnp.bfloat16, jnp.float32):
            r = bench_config(B, N, d, dv, dtype, args.iters)
            rows.append(r)
            print(json.dumps(r))

    lines = [
        "# Pallas fused attention vs XLA einsum (measured)",
        "",
        f"Chip: `{jax.devices()[0].device_kind}` (platform {platform}). "
        f"Regenerate: `python tools/bench_attention.py`.",
        "",
        "softmax(QK^T)V at SAGAN shapes; the Pallas kernel keeps the (N,N)",
        "scores tile in VMEM instead of round-tripping it through HBM.",
        "",
        "| shape | dtype | einsum us | pallas us | speedup | pallas TFLOP/s |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['shape']} | {r['dtype']} | {r['einsum_us']} | "
            f"{r['pallas_us']} | {r['speedup']}x | {r['pallas_tflops']} |"
        )
    out = osp.join(REPO, "docs", "ATTENTION_BENCH.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
