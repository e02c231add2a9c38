"""Prototype: verify which layout ops Mosaic/TPU supports in-kernel before
committing to a fused-SPADE kernel design. Run on the real TPU:

    python tools/proto_mosaic_caps.py

Each capability is probed independently; failures print the exception type.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            try:
                fn()
                print(f"OK   {name}")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return run
    return deco


@probe("A: einsum('hwc,cd->hwd') 3D contraction in-kernel")
def probe_a():
    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    x = jnp.ones((16, 64, 32), jnp.bfloat16)
    w = jnp.ones((32, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 64, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    np.testing.assert_allclose(np.asarray(out), 32.0)


@probe("B: reshape (A*B, C) -> (A, B, C) -> (A*B, C), B%8==0")
def probe_b():
    def kernel(x_ref, o_ref):
        v = x_ref[...]
        v3 = v.reshape(8, 200, 128)
        v3 = v3 + 1.0
        o_ref[...] = v3.reshape(1600, 128)

    x = jnp.zeros((1600, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1600, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(np.asarray(out), 1.0)


@probe("B2: reshape then column-slice (A,B,C)[:, 4:196, :]")
def probe_b2():
    def kernel(x_ref, o_ref):
        v = x_ref[...].reshape(8, 200, 128)
        o_ref[...] = v[:, 4:196, :]

    x = jnp.arange(1600 * 128, dtype=jnp.float32).reshape(1600, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 192, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.arange(1600 * 128, dtype=np.float32).reshape(8, 200, 128)[:, 4:196]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("C: 2D transpose (12, N) -> (N, 12) bf16")
def probe_c():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = jnp.arange(12 * 4000, dtype=jnp.float32).astype(jnp.bfloat16)
    x = x.reshape(12, 4000)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4000, 12), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(x.astype(jnp.float32)).T,
    )


@probe("C2: 2D transpose (128, 4000) -> (4000, 128) bf16")
def probe_c2():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    x = jnp.arange(128 * 4000, dtype=jnp.float32).astype(jnp.bfloat16)
    x = x.reshape(128, 4000)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4000, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(x.astype(jnp.float32)).T,
    )


@probe("D: matmul K=12 (P, 12) @ (12, 128)")
def probe_d():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        )

    a = jnp.ones((4000, 12), jnp.bfloat16)
    b = jnp.ones((12, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4000, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    np.testing.assert_allclose(np.asarray(out), 12.0)


@probe("E: broadcast (C,) over (TH, W, C) elementwise")
def probe_e():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[...] = x_ref[...] * s_ref[0, 0, :] + 1.0

    x = jnp.ones((16, 192, 64), jnp.float32)
    s = jnp.full((1, 1, 64), 2.0, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 192, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)
    np.testing.assert_allclose(np.asarray(out), 3.0)


@probe("F: reshape lane-split (N*Cs,) -> (N, Cs), Cs=12")
def probe_f():
    def kernel(x_ref, o_ref):
        v = x_ref[0, :]
        o_ref[...] = v.reshape(400, 12)

    x = jnp.arange(4800, dtype=jnp.float32).reshape(1, 4800)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((400, 12), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    np.testing.assert_allclose(
        np.asarray(out), np.arange(4800, dtype=np.float32).reshape(400, 12)
    )


@probe("G: dynamic non-aligned sublane slice (P+4, C)[ds(k), :]")
def probe_g():
    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[...] = x_ref[pl.ds(i * 16 + 3, 16), :]

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((64, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (16, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(x)
    ref = np.concatenate(
        [
            np.arange(64 * 128, dtype=np.float32).reshape(64, 128)[3:19],
            np.arange(64 * 128, dtype=np.float32).reshape(64, 128)[19:35],
        ]
    )
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("H: 4D block, minor dims (W=192, C=64) bf16")
def probe_h():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((2, 32, 192, 64), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(2, 2),
        out_shape=jax.ShapeDtypeStruct((2, 32, 192, 64), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(
                (1, 16, 192, 64), lambda b, r: (b, r, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 16, 192, 64), lambda b, r: (b, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(x)
    np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)), 2.0)


@probe("I: dot_general (2C,NH)@(NH,P) lane-major N, K sublanes")
def probe_i():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jnp.ones((128, 12), jnp.bfloat16)  # (NH, Cs) -> used as (2C=128, K=12)
    b = jnp.ones((12, 4000), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 4000), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    np.testing.assert_allclose(np.asarray(out), 12.0)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    for name, fn in sorted(globals().items()):
        if name.startswith("probe_"):
            fn()
    sys.exit(0)


@probe("A2: contraction over MAJOR dim 'chw,cn->hwn'")
def probe_a2():
    def kernel(s_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            s_ref[...], w_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)

    s = jnp.ones((12, 20, 56), jnp.bfloat16)
    w = jnp.ones((12, 128), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((20, 56, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, w)
    np.testing.assert_allclose(np.asarray(out), 12.0)


@probe("K: static unaligned lane slice (C, H, W)[:, :, 3:51]")
def probe_k():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[:, :, 3:51]

    x = jnp.arange(12 * 20 * 56, dtype=jnp.float32).reshape(12, 20, 56)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((12, 20, 48), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = np.arange(12 * 20 * 56, dtype=np.float32).reshape(12, 20, 56)[:, :, 3:51]
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("L: dynamic unaligned SUBLANE slice on 3D (C, Hp, W2)")
def probe_l():
    def kernel(x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[...] = x_ref[:, pl.ds(i * 8 + 3, 16), :]

    x = jnp.arange(4 * 64 * 56, dtype=jnp.float32).reshape(4, 64, 56)
    out = pl.pallas_call(
        kernel,
        grid=(2,),
        out_shape=jax.ShapeDtypeStruct((2, 4, 16, 56), jnp.float32),
        in_specs=[pl.BlockSpec((4, 64, 56), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 4, 16, 56), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )(x)
    ref = np.stack([
        np.arange(4 * 64 * 56, dtype=np.float32).reshape(4, 64, 56)[:, 3:19],
        np.arange(4 * 64 * 56, dtype=np.float32).reshape(4, 64, 56)[:, 11:27],
    ])
    np.testing.assert_allclose(np.asarray(out), ref)


@probe("M: 3D einsum chain like the spade kernel (small)")
def probe_m():
    TH, W2, CS, NH, C2 = 8, 56, 3, 128, 128

    def kernel(s_ref, wsh_ref, wgb_ref, o_ref):
        i = pl.program_id(0)
        seg = s_ref[:, pl.ds(i * TH, TH + 6), :]  # (CS, TH+6, W2)
        h = None
        for di in range(3):
            for dj in range(3):
                tap = jax.lax.dot_general(
                    seg[:, di:di + TH + 4, :],  # col shift folded below
                    wsh_ref[3 * di + dj],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TH+4, W2, NH)
                # emulate dj shift with a static lane slice + pad-free add:
                h = tap if h is None else h + tap
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
        gb = None
        for di in range(3):
            tap = jax.lax.dot_general(
                h[di:di + TH, :, :], wgb_ref[di],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gb = tap if gb is None else gb + tap
        o_ref[...] = gb[None]

    s = jnp.ones((CS, 64 + 6, W2), jnp.bfloat16)
    wsh = jnp.ones((9, CS, NH), jnp.bfloat16) * 0.01
    wgb = jnp.ones((3, NH, C2), jnp.bfloat16) * 0.01
    out = pl.pallas_call(
        kernel,
        grid=(8,),
        out_shape=jax.ShapeDtypeStruct((8, TH, W2, C2), jnp.float32),
        in_specs=[
            pl.BlockSpec((CS, 70, W2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, CS, NH), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NH, C2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W2, C2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
    )(s, wsh, wgb)
    assert np.isfinite(np.asarray(out)).all()
