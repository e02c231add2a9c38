"""Probe: does XLA:TPU run int8 convolutions at the MXU int8 rate (2x bf16)?

Decides the int8 serving-mode design (VERDICT r2 item 10): if lax.conv with
int8 operands and preferred_element_type=int32 reaches ~2x the bf16 conv
rate at the SAMS hot shapes, the quantized path can be pure XLA (reusing
its conv emitters + elementwise fusion for quant/dequant) with no Pallas.

Both variants are measured production-shaped — bf16 activations in, bf16
out; the int8 variant pays its own dynamic quantize + dequantize in-graph —
and device-chained (docs/PERF_NOTES.md measurement pitfalls), so the
comparison includes identical chain overhead.

    python tools/probe_int8_conv.py
"""

import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=10):
    def chained(x):
        def body(_, carry):
            x, acc = carry
            out = fn(x)
            acc = acc + jnp.sum(out).astype(jnp.float32)
            return x + jnp.asarray(acc * 1e-20, x.dtype), acc

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))[1]

    cf = jax.jit(chained)
    float(cf(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(cf(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv(x, k, pt=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pt,
    )


DEPTH = 8  # conv-stream depth per measured block (amortizes chain overhead)


def run(B, H, W, C):
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    kf = jnp.asarray(rng.randn(3, 3, C, C) * (0.3 / C ** 0.5), jnp.bfloat16)
    kscale = jnp.max(jnp.abs(kf.astype(jnp.float32)), axis=(0, 1, 2)) / 127.0
    ki = jnp.asarray(
        jnp.clip(jnp.round(kf.astype(jnp.float32) / kscale), -127, 127),
        jnp.int8,
    )

    def bf16_stack(x):
        for _ in range(DEPTH):
            x = jax.nn.relu(conv(x, kf))
        return x

    def i8_stack(x):
        for _ in range(DEPTH):
            # dynamic per-tensor activation scale + per-channel weight scale
            s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            xq = jnp.asarray(
                jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127),
                jnp.int8,
            )
            acc = conv(xq, ki, jnp.int32)
            x = jax.nn.relu(
                (acc.astype(jnp.float32) * (s * kscale)).astype(jnp.bfloat16)
            )
        return x

    t_bf = timed(jax.jit(bf16_stack), xf) / DEPTH
    t_q = timed(jax.jit(i8_stack), xf) / DEPTH
    fl = 2 * 9 * B * H * W * C * C
    print(
        f"B{B} {H}x{W} {C}->{C} (depth-{DEPTH} stream): "
        f"bf16 {t_bf*1e3:7.3f} ms/conv ({fl/t_bf/1e12:6.1f} TF/s)"
        f"  q+int8+dq {t_q*1e3:7.3f} ms/conv ({fl/t_q/1e12:6.1f} TOP/s)"
        f"  speedup {t_bf/t_q:5.2f}x"
    )


def main():
    print("device:", jax.devices()[0].device_kind)
    for B, H, W, C in [
        (16, 256, 192, 128),   # decode_3 gamma/beta conv shape class
        (16, 256, 192, 64),    # decode_3 conv_1 / C64 class
        (16, 128, 96, 256),
        (16, 64, 48, 512),
        (16, 16, 12, 1024),    # middle conv class
    ]:
        run(B, H, W, C)


if __name__ == "__main__":
    main()
