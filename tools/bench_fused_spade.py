"""Correctness + timing of the fused MultiSPADE kernel vs the XLA reference.

    python tools/bench_fused_spade.py            # all production resolutions
    python tools/bench_fused_spade.py --quick    # one resolution

Production SAMS sites (256x192 serving, batch 16, L=4 labels with channel
counts 4/3/3/2, nhid=128): the decoder runs C=64..1024 at resolutions
256x192 down to 16x12. Results recorded in docs/SPADE_KERNEL_BENCH.md.
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shineon_tpu.ops.fused_spade import (
    fused_multispade_modulate,
    multispade_modulate_reference,
    multispade_modulate_reference_int8,
)

CS = [4, 3, 3, 2]
NH = 128


def make_inputs(B, H, W, C, L=4, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5, dtype)
    a = 1.0 + 0.1 * rng.randn(1, L, C)
    b = 0.1 * rng.randn(1, L, C)
    ab = jnp.asarray(
        np.broadcast_to(np.concatenate([a, b], -1), (B, L, 2 * C)).astype(
            np.float32
        )
    )
    segs, wshs, bshs, wgbs, bgbs = [], [], [], [], []
    for l in range(L):
        cs = CS[l % len(CS)]
        segs.append(
            jnp.asarray(rng.randn(B, H, W, cs).astype(np.float32), dtype)
        )
        wshs.append(
            jnp.asarray(
                (rng.randn(3, 3, cs, NH) / np.sqrt(9 * cs)).astype(np.float32)
            )
        )
        bshs.append(jnp.asarray(0.1 * rng.randn(NH).astype(np.float32)))
        wgbs.append(
            jnp.asarray(
                (rng.randn(3, 3, NH, 2 * C) / np.sqrt(9 * NH)).astype(
                    np.float32
                )
            )
        )
        bgbs.append(jnp.asarray(0.05 * rng.randn(2 * C).astype(np.float32)))
    return x, ab, segs, wshs, bshs, wgbs, bgbs


def time_fn(fn, *args, iters=20):
    """Device-chained timing (docs/PERF_NOTES.md: the axon tunnel's
    block_until_ready can return early; chain iterations with a data
    dependence and barrier on a fetched scalar; min over repeats)."""

    def chained(x, *rest):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *rest)
            acc = acc + jnp.sum(out).astype(jnp.float32)
            return x + (acc * 1e-20).astype(x.dtype), acc

        _, acc = jax.lax.fori_loop(
            0, iters, body, (x, jnp.float32(0.0))
        )
        return acc

    cf = jax.jit(chained)
    float(cf(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(cf(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run_site(B, H, W, C, check=True, int8=False):
    """int8=True compares the in-kernel int8 path (VERDICT r3 item 8)
    against the XLA int8 serving formulation (per-tensor dynamic scale +
    merged [gamma|beta] int8 conv — what SHINEON_INT8_SPADE runs today)."""
    args = make_inputs(B, H, W, C)
    if int8:
        fused = jax.jit(
            functools.partial(fused_multispade_modulate, quantized=True)
        )
        ref = jax.jit(multispade_modulate_reference_int8)
    else:
        fused = jax.jit(fused_multispade_modulate)
        ref = jax.jit(multispade_modulate_reference)
    fp = jax.jit(multispade_modulate_reference)

    if check:
        of = np.asarray(fused(*args).astype(jnp.float32))
        orf = np.asarray(fp(*args).astype(jnp.float32))
        scale = max(np.abs(orf).max(), 1e-6)
        err = np.abs(of - orf).max() / scale
        ok = err < 3e-2
        status = "OK " if ok else "MISMATCH"
    else:
        err, status = float("nan"), "-"

    tf = time_fn(fused, *args)
    tr = time_fn(ref, *args)
    tag = "xla-int8" if int8 else "ref"
    print(
        f"B{B} {H}x{W} C{C}: fused {tf*1e3:7.3f} ms  {tag} {tr*1e3:7.3f} ms  "
        f"speedup {tr/tf:5.2f}x  rel_err_vs_fp {err:.2e} {status}"
    )
    return tf, tr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--int8", action="store_true",
                   help="compare in-kernel int8 vs the XLA int8 serving path")
    args = p.parse_args()
    print("device:", jax.devices()[0].device_kind)

    if args.quick:
        run_site(args.batch, 64, 48, 256, int8=args.int8)
        return
    # decoder/middle/encoder sites of the production generator
    for H, W, C in [
        (256, 192, 64),   # decode_3 spades (fin=128 handled below)
        (256, 192, 128),  # decode_3 spade_0 input width
        (128, 96, 128),
        (128, 96, 256),
        (64, 48, 256),
        (64, 48, 512),
        (32, 24, 512),
        (32, 24, 1024),
        (16, 12, 1024),   # middle blocks
    ]:
        run_site(args.batch, H, W, C, int8=args.int8)


if __name__ == "__main__":
    main()
