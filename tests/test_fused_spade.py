"""Fused MultiSPADE kernel + integration tests (CPU: interpret-mode Pallas).

Reference semantics under test: the sequential per-label chain of
models/networks/sams/spade.py:61-103 + multispade.py:59-66 (norm ->
segmap MLP -> gamma/beta convs -> modulate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shineon_tpu.ops import fused_spade as fs


def _make_case(B=2, H=16, W=24, C=64, L=3, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    cs_list = [4, 3, 2, 3][:L]
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.5, dtype)
    a = 1.0 + 0.1 * rng.randn(B, L, C)
    b = 0.1 * rng.randn(B, L, C)
    ab = jnp.asarray(np.concatenate([a, b], -1).astype(np.float32))
    segs, wshs, bshs, wgbs, bgbs = [], [], [], [], []
    for cs in cs_list:
        segs.append(jnp.asarray(rng.randn(B, H, W, cs).astype(np.float32), dtype))
        wshs.append(jnp.asarray(
            (rng.randn(3, 3, cs, fs.NHID) / np.sqrt(9 * cs)).astype(np.float32)))
        bshs.append(jnp.asarray(0.1 * rng.randn(fs.NHID).astype(np.float32)))
        wgbs.append(jnp.asarray(
            (rng.randn(3, 3, fs.NHID, 2 * C) / np.sqrt(9 * fs.NHID)).astype(
                np.float32)))
        bgbs.append(jnp.asarray(0.05 * rng.randn(2 * C).astype(np.float32)))
    return x, ab, segs, wshs, bshs, wgbs, bgbs


def test_kernel_interpret_matches_reference():
    """The Pallas kernel body (interpret mode) == conv-by-conv reference,
    including the halo masking at image borders."""
    x, ab, segs, wshs, bshs, wgbs, bgbs = _make_case()
    segc, wsh, bsh, wgb, bgb = fs._pack_inputs(
        segs, wshs, bshs, wgbs, bgbs, jnp.float32
    )
    out = fs._fused_forward(
        x, ab, segc, wsh, bsh, wgb, bgb, "relu", interpret=True
    )
    ref = fs.multispade_modulate_reference(
        x, ab, segs, wshs, bshs, wgbs, bgbs
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-4
    )


def test_kernel_interpret_single_label_tall():
    """L=1 (plain encoder SPADE) and a multi-tile height."""
    x, ab, segs, wshs, bshs, wgbs, bgbs = _make_case(B=1, H=64, W=12, C=32, L=1)
    segc, wsh, bsh, wgb, bgb = fs._pack_inputs(
        segs, wshs, bshs, wgbs, bgbs, jnp.float32
    )
    out = fs._fused_forward(
        x, ab, segc, wsh, bsh, wgb, bgb, "relu", interpret=True
    )
    ref = fs.multispade_modulate_reference(
        x, ab, segs, wshs, bshs, wgbs, bgbs
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-4
    )


def test_dispatch_cpu_fallback_and_grad():
    """On CPU the public op falls back to the reference formulation; the
    custom VJP must match autodiff of the reference."""
    x, ab, segs, wshs, bshs, wgbs, bgbs = _make_case(B=1, H=8, W=8, C=16, L=2)

    def via_fused(x, ab, w0):
        return jnp.sum(
            fs.fused_multispade_modulate(
                x, ab, segs, [w0, wshs[1]], bshs, wgbs, bgbs
            ) ** 2
        )

    def via_ref(x, ab, w0):
        return jnp.sum(
            fs.multispade_modulate_reference(
                x, ab, segs, [w0, wshs[1]], bshs, wgbs, bgbs
            ) ** 2
        )

    gf = jax.grad(via_fused, argnums=(0, 1, 2))(x, ab, wshs[0])
    gr = jax.grad(via_ref, argnums=(0, 1, 2))(x, ab, wshs[0])
    for a_, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("norm", ["spadeinstance3x3", "spadesyncbatch3x3"])
def test_multispade_fused_flag_matches_unfused(norm, monkeypatch):
    """MultiSpade with SHINEON_FUSED_SPADE=1 (CPU -> reference fallback via
    the folded-norm path) == the unfused module, with an identical param
    tree (checkpoint compatibility)."""
    from shineon_tpu.networks.sams.multispade import MultiSpade

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 12, 32).astype(np.float32))
    seg = {
        "agnostic": jnp.asarray(rng.randn(2, 16, 12, 4).astype(np.float32)),
        "flow": jnp.asarray(rng.randn(2, 16, 12, 2).astype(np.float32)),
    }
    m = MultiSpade(config_text=norm)
    variables = m.init(jax.random.PRNGKey(0), x, seg, train=True)
    # warm the running stats so eval-mode batch norm is nontrivial
    if "batch_stats" in variables:
        _, upd = m.apply(variables, x, seg, train=True,
                         mutable=["batch_stats"])
        variables = {**variables, **upd}

    monkeypatch.setenv("SHINEON_FUSED_SPADE", "0")
    out_unfused = m.apply(variables, x, seg, train=False)
    monkeypatch.setenv("SHINEON_FUSED_SPADE", "1")
    out_fused = m.apply(variables, x, seg, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_unfused), rtol=0, atol=2e-4
    )

    tree = jax.tree_util.tree_map(lambda v: v.shape, variables["params"])
    for key in ("spade_agnostic", "spade_flow"):
        assert tree[key]["mlp_shared"]["kernel"] is not None
        assert tree[key]["mlp_gamma"]["bias"] is not None


def test_int8_spade_close_to_fp(monkeypatch):
    """SHINEON_INT8_SPADE=1 quantizes the gamma/beta convs (weight +
    dynamic activation int8); outputs must stay within quantization
    tolerance of the fp path and the param tree must be unchanged."""
    from shineon_tpu.networks.sams.multispade import MultiSpade

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 12, 32).astype(np.float32))
    seg = {
        "agnostic": jnp.asarray(rng.randn(2, 16, 12, 4).astype(np.float32)),
        "flow": jnp.asarray(rng.randn(2, 16, 12, 2).astype(np.float32)),
    }
    m = MultiSpade(config_text="spadeinstance3x3")
    variables = m.init(jax.random.PRNGKey(0), x, seg, train=True)

    monkeypatch.delenv("SHINEON_INT8_SPADE", raising=False)
    out_fp = m.apply(variables, x, seg, train=False)
    monkeypatch.setenv("SHINEON_INT8_SPADE", "1")
    # the production dispatch gate (>=128ch, >=768 spatial; measured in
    # tools/serving_roof_census.py) would keep these tiny test shapes on
    # the bf16 path; lower it so the int8 numerics are exercised
    monkeypatch.setenv("SHINEON_INT8_MIN_CH", "8")
    monkeypatch.setenv("SHINEON_INT8_MIN_HW", "1")
    out_q = m.apply(variables, x, seg, train=False)
    # int8 must actually change the numerics (path taken) but stay close
    diff = np.abs(np.asarray(out_q) - np.asarray(out_fp))
    scale = np.abs(np.asarray(out_fp)).max()
    assert diff.max() > 0
    assert diff.max() / scale < 3e-2, diff.max() / scale
    # train path ignores the flag entirely
    out_train_q = m.apply(variables, x, seg, train=True,
                          mutable=["batch_stats"])[0]
    monkeypatch.delenv("SHINEON_INT8_SPADE", raising=False)
    out_train_fp = m.apply(variables, x, seg, train=True,
                           mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(out_train_q),
                                  np.asarray(out_train_fp))


def test_int8_serving_covers_resblock_and_generator_convs(monkeypatch):
    """Round 4: int8 serving extends past the SPADE gamma/beta convs to the
    spectral resblock convs and the generator's encode/decode convs — with
    an UNCHANGED param tree (Int8Conv declares nn.Conv's exact params, so
    nn.SpectralNorm wraps it transparently and converted checkpoints load)."""
    from shineon_tpu.networks.sams.spade import AnySpadeResBlock

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 16, 12, 32).astype(np.float32))
    seg = jnp.asarray(rng.randn(2, 16, 12, 4).astype(np.float32))
    m = AnySpadeResBlock(fin=32, fout=16, norm_G="spectralspadeinstance3x3")
    monkeypatch.delenv("SHINEON_INT8_SPADE", raising=False)
    variables = m.init(jax.random.PRNGKey(0), x, seg, train=True)
    tree_fp = jax.tree_util.tree_map(lambda v: v.shape, variables)

    out_fp = m.apply(variables, x, seg, train=False)
    monkeypatch.setenv("SHINEON_INT8_SPADE", "1")
    # the production dispatch gate (>=128ch, >=768 spatial) would keep these
    # tiny test convs on the bf16 path; lower it so the int8 path is
    # exercised
    monkeypatch.setenv("SHINEON_INT8_MIN_CH", "8")
    monkeypatch.setenv("SHINEON_INT8_MIN_HW", "1")
    out_q = m.apply(variables, x, seg, train=False)
    # the int8 structure must bind to the same variable tree
    tree_q = jax.tree_util.tree_map(
        lambda v: v.shape, m.init(jax.random.PRNGKey(0), x, seg, train=False)
    )
    assert tree_q == tree_fp
    diff = np.abs(np.asarray(out_q) - np.asarray(out_fp))
    scale = np.abs(np.asarray(out_fp)).max()
    assert diff.max() > 0, "int8 path not taken"
    assert diff.max() / scale < 5e-2, diff.max() / scale


def test_kernel_interpret_quantized_close_to_fp():
    """Round 4 (VERDICT item 8): the int8 in-kernel gamma/beta path
    (interpret mode) stays within quantization tolerance of the fp
    reference, and its per-row-tile activation scales track the XLA int8
    serving reference (per-tensor scales) within the same envelope."""
    x, ab, segs, wshs, bshs, wgbs, bgbs = _make_case(B=2, H=32, W=24, C=64,
                                                     L=2)
    segc, wsh, bsh, _, bgb = fs._pack_inputs(
        segs, wshs, bshs, wgbs, bgbs, jnp.float32
    )
    wgb_q, sgb = fs._quantize_gb_weights(wgbs)
    out = fs._fused_forward(
        x, ab, segc, wsh, bsh, wgb_q, bgb, "relu", interpret=True, sgb=sgb
    )
    ref_fp = fs.multispade_modulate_reference(
        x, ab, segs, wshs, bshs, wgbs, bgbs
    )
    ref_q = fs.multispade_modulate_reference_int8(
        x, ab, segs, wshs, bshs, wgbs, bgbs
    )
    scale = float(jnp.abs(ref_fp).max())
    err_kernel = float(jnp.abs(out - ref_fp).max()) / scale
    err_xla = float(jnp.abs(ref_q - ref_fp).max()) / scale
    assert err_kernel < 3e-2, err_kernel
    # the kernel's finer per-tile scales should not be materially worse
    # than the XLA path's per-tensor scale
    assert err_kernel < 2.5 * max(err_xla, 1e-4), (err_kernel, err_xla)


def test_dispatch_cpu_fallback_quantized():
    """On CPU the quantized public op falls back to the int8 XLA
    reference formulation (real int8 operands, platform-identical)."""
    x, ab, segs, wshs, bshs, wgbs, bgbs = _make_case(B=1, H=8, W=8, C=16,
                                                     L=2)
    out = fs.fused_multispade_modulate(
        x, ab, segs, wshs, bshs, wgbs, bgbs, quantized=True
    )
    ref = fs.multispade_modulate_reference_int8(
        x, ab, segs, wshs, bshs, wgbs, bgbs
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_sites_mode_gating(monkeypatch):
    """SHINEON_FUSED_SPADE routing: default OFF everywhere (the e2e A/B
    measured the sites mode 8% slower in-graph, docs/SPADE_KERNEL_BENCH.md
    round 4); '=sites' routes only the measured winner sites, int8 mode
    only; '=1' forces on; '=0' forces off."""
    from shineon_tpu.networks.sams.spade import fused_spade_chain_enabled

    win, lose = (128, 96, 128), (256, 192, 64)
    monkeypatch.delenv("SHINEON_FUSED_SPADE", raising=False)
    monkeypatch.setenv("SHINEON_INT8_SPADE", "1")
    assert not fused_spade_chain_enabled(train=False, shape=win)

    monkeypatch.setenv("SHINEON_FUSED_SPADE", "sites")
    assert fused_spade_chain_enabled(train=False, shape=win)
    assert not fused_spade_chain_enabled(train=False, shape=lose)
    assert not fused_spade_chain_enabled(train=True, shape=win)
    monkeypatch.delenv("SHINEON_INT8_SPADE")
    assert not fused_spade_chain_enabled(train=False, shape=win)

    monkeypatch.setenv("SHINEON_FUSED_SPADE", "1")
    assert fused_spade_chain_enabled(train=False, shape=lose)
    monkeypatch.setenv("SHINEON_FUSED_SPADE", "0")
    assert not fused_spade_chain_enabled(train=False, shape=win)
