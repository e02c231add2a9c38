"""Shape and behavior tests for the network layer (hermetic, CPU mesh).

Mirrors the reference's smoke tests (test/test_sams_generator.py) but with
assertions instead of IPython.embed(), plus coverage the reference lacks.
Small spatial sizes keep CPU runtime low; channel plans match production.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shineon_tpu.networks.cpvton import GMM, UnetGenerator
from shineon_tpu.networks.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from shineon_tpu.networks.loss import GANLoss, VGGLoss, l1_loss
from shineon_tpu.networks.sams import SamsGenerator
from shineon_tpu.networks.attention import SelfAttention

KEY = jax.random.PRNGKey(420)


def test_gmm_shapes():
    model = GMM(fine_height=128, fine_width=96, grid_size=5)
    person = jnp.zeros((2, 128, 96, 22))  # agnostic(4) + cocopose(18)
    cloth = jnp.zeros((2, 128, 96, 3))
    variables = model.init(KEY, person, cloth)
    (grid, theta), _ = model.apply(
        variables, person, cloth, mutable=["batch_stats"]
    )
    assert grid.shape == (2, 128, 96, 2)
    assert theta.shape == (2, 50)
    assert np.abs(np.asarray(theta)).max() <= 1.0  # tanh range


def test_gmm_feature_resolution():
    # 4 stride-2 downs: 128x96 -> 8x6 feature map, theta = 2*grid_size**2
    model = GMM(fine_height=128, fine_width=96, grid_size=3)
    person = jnp.zeros((1, 128, 96, 4))
    cloth = jnp.zeros((1, 128, 96, 3))
    variables = model.init(KEY, person, cloth)
    (grid, theta), _ = model.apply(variables, person, cloth, mutable=["batch_stats"])
    assert theta.shape == (1, 18)


@pytest.mark.parametrize("activation", [None, "gelu", "swish", "sine"])
def test_unet_generator_shapes(activation):
    model = UnetGenerator(
        input_nc=10, output_nc=4, num_downs=6, num_attention=0,
        ngf=8, norm="instance", activation=activation,
    )
    x = jnp.zeros((2, 64, 64, 10))
    variables = model.init(KEY, x)
    y = model.apply(variables, x)
    assert y.shape == (2, 64, 64, 4)


def test_unet_self_attention_param_presence():
    model = UnetGenerator(
        input_nc=4, output_nc=3, num_downs=6, num_attention=2,
        ngf=8, norm="instance", use_self_attn=True,
    )
    x = jnp.zeros((1, 64, 64, 4))
    variables = model.init(KEY, x)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {jax.tree_util.keystr(path) for path, _ in flat}
    assert any("down_attn" in n for n in names)
    # gamma starts at 0 -> attention initially identity
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)


def test_self_attention_identity_at_init():
    model = SelfAttention()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16).astype(np.float32))
    variables = model.init(KEY, x)
    y = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_nlayer_discriminator_features():
    model = NLayerDiscriminator(ndf=8, n_layers=4, norm_D="spectralinstance")
    x = jnp.zeros((2, 64, 48, 7))
    variables = model.init(KEY, x)
    feats = model.apply(variables, x)
    assert isinstance(feats, list) and len(feats) == 5  # 4 blocks + logit
    assert feats[-1].shape[-1] == 1


def test_multiscale_discriminator_scales():
    model = MultiscaleDiscriminator(num_D=2, ndf=8, n_layers=4)
    x = jnp.zeros((2, 64, 48, 7))
    variables = model.init(KEY, x)
    outs = model.apply(variables, x)
    assert len(outs) == 2
    # first k4/s2/p2 conv maps H -> H/2 + 1; the second scale sees the
    # avg-pooled (k3 s2 p1: H -> H/2) pyramid level
    assert outs[0][0].shape[1] == 64 // 2 + 1
    assert outs[1][0].shape[1] == 64 // 4 + 1


def test_spectral_norm_state_updates():
    model = NLayerDiscriminator(ndf=8, n_layers=4, norm_D="spectralinstance")
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(KEY, x)
    assert "batch_stats" in variables  # u/v power-iteration state
    _, new_state = model.apply(
        variables, x, update_stats=True, mutable=["batch_stats"]
    )
    assert jax.tree_util.tree_structure(new_state["batch_stats"]) == \
        jax.tree_util.tree_structure(variables["batch_stats"])


def test_sams_generator_forward():
    """Reference smoke test (test/test_sams_generator.py:6-26), hermetic."""
    n_frames = 3
    gen = SamsGenerator(
        ngf_base=2, ngf_pow_outer=3, ngf_pow_inner=5, ngf_pow_step=1,
        num_middle=2, n_frames_total=n_frames, flow_warp=True,
        encoder_input="flow",
        inputs=("agnostic", "cloth", "densepose", "flow"),
        attention_middle_indices=("-1",),
    )
    B, H, W = 2, 32, 24
    prev_frames = jnp.zeros((B, n_frames - 1, H, W, 3))
    prev_maps = jnp.zeros((B, n_frames - 1, H, W, 2))
    current = {
        "agnostic": jnp.zeros((B, H, W, 4)),
        "cloth": jnp.zeros((B, H, W, 3)),
        "densepose": jnp.zeros((B, H, W, 3)),
        "flow": jnp.zeros((B, H, W, 2)),
    }
    variables = gen.init(KEY, prev_frames, prev_maps, current)
    out, _ = gen.apply(
        variables, prev_frames, prev_maps, current, mutable=["batch_stats"]
    )
    assert out.shape == (B, H, W, 4)  # RGB + weight mask (flow_warp)
    # attention placement: middle index -1 -> AttentiveMultiSpade in last middle
    names = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    assert any("middle_1" in n and "attention_layer" in n for n in names)
    assert not any("middle_0" in n and "attention_layer" in n for n in names)


def test_sams_generator_single_frame():
    gen = SamsGenerator(
        ngf_base=2, ngf_pow_outer=3, ngf_pow_inner=4, num_middle=1,
        n_frames_total=1, flow_warp=False, encoder_input="agnostic",
        inputs=("agnostic", "cloth"),
    )
    B, H, W = 1, 16, 16
    current = {
        "agnostic": jnp.zeros((B, H, W, 4)),
        "cloth": jnp.zeros((B, H, W, 3)),
    }
    variables = gen.init(KEY, None, None, current)
    out, _ = gen.apply(variables, None, None, current, mutable=["batch_stats"])
    assert out.shape == (B, H, W, 3)


def test_gan_loss_modes():
    logits = jnp.asarray([[2.0, -1.0]])
    hinge = GANLoss("hinge")
    # D hinge on real: -mean(min(x-1,0)) = -((1+(-2))/2)... x=[2,-1]: min(1,0)=0, min(-2,0)=-2 -> 1.0
    assert float(hinge(logits, True, True)) == pytest.approx(1.0)
    assert float(hinge(logits, False, True)) == pytest.approx(1.5)
    assert float(hinge(logits, True, False)) == pytest.approx(-0.5)
    ls = GANLoss("ls")
    assert float(ls(logits, True, True)) == pytest.approx(((2 - 1) ** 2 + 4) / 2)
    w = GANLoss("w")
    assert float(w(logits, True, True)) == pytest.approx(-0.5)
    # multiscale nested lists: average over scales using last feature
    nested = [[jnp.ones((1, 2)), logits], [logits]]
    assert float(hinge(nested, True, False)) == pytest.approx((-0.5 + -0.5) / 2)


def test_vgg_loss_runs_and_is_zero_on_identical():
    loss = VGGLoss()
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 48, 3).astype(np.float32))
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-6)
    y = jnp.zeros_like(x)
    assert float(loss(x, y)) > 0.0


def test_l1_loss():
    assert float(l1_loss(jnp.ones((2, 2)), jnp.zeros((2, 2)))) == 1.0
