"""SAMS generator checkpoint conversion: torch oracle (reference layer plan,
spectral norm + SPADE/MultiSpade/AttentiveMultiSpade) -> converted flax
generator must match the forward output."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tools.convert_lightning_checkpoint import convert_sams_generator_state_dict

# compile-dominated mesh/oracle tests: run with `pytest -m heavy`
pytestmark = pytest.mark.heavy

SN = tnn.utils.spectral_norm


class TSpade(tnn.Module):
    """Reference SPADE plan (sams/spade.py:61-103), syncbatch == BatchNorm at
    eval."""

    def __init__(self, norm_nc, label_nc):
        super().__init__()
        self.param_free_norm = tnn.BatchNorm2d(norm_nc, affine=False)
        self.mlp_shared = tnn.Sequential(
            tnn.Conv2d(label_nc, 128, 3, padding=1), tnn.ReLU()
        )
        self.mlp_gamma = tnn.Conv2d(128, norm_nc, 3, padding=1)
        self.mlp_beta = tnn.Conv2d(128, norm_nc, 3, padding=1)

    def forward(self, x, segmap):
        normalized = self.param_free_norm(x)
        segmap = F.interpolate(segmap, size=x.shape[2:], mode="nearest")
        actv = self.mlp_shared(segmap)
        return normalized * (1 + self.mlp_gamma(actv)) + self.mlp_beta(actv)


class TMultiSpade(tnn.Module):
    def __init__(self, norm_nc, label_channels):
        super().__init__()
        self.spade_layers = tnn.ModuleDict({
            key: TSpade(norm_nc, nc) for key, nc in label_channels.items()
        })

    def forward(self, x, label_dict):
        for key, seg in sorted(label_dict.items()):
            x = self.spade_layers[key](x, seg)
        return x


class TSelfAttention(tnn.Module):
    def __init__(self, in_dim):
        super().__init__()
        self.query_conv = tnn.Conv2d(in_dim, in_dim // 8, 1)
        self.key_conv = tnn.Conv2d(in_dim, in_dim // 8, 1)
        self.value_conv = tnn.Conv2d(in_dim, in_dim, 1)
        self.gamma = tnn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, w, h = x.shape
        q = self.query_conv(x).view(b, -1, w * h).permute(0, 2, 1)
        k = self.key_conv(x).view(b, -1, w * h)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)
        v = self.value_conv(x).view(b, -1, w * h)
        out = torch.bmm(v, attn.permute(0, 2, 1)).view(b, c, w, h)
        return self.gamma * out + x


class TAttentiveMultiSpade(TMultiSpade):
    def __init__(self, norm_nc, label_channels):
        super().__init__(norm_nc, label_channels)
        n = len(label_channels)
        self.attention_layer = TSelfAttention(norm_nc * n)
        self.mlp_final = tnn.Sequential(
            tnn.Conv2d(norm_nc * n, norm_nc, 3, padding=1), tnn.LeakyReLU()
        )

    def forward(self, x, label_dict):
        outs = [
            self.spade_layers[key](x, seg)
            for key, seg in sorted(label_dict.items())
        ]
        return self.mlp_final(self.attention_layer(torch.cat(outs, 1)))


class TResBlock(tnn.Module):
    """AnySpadeResBlock plan (sams/spade.py:106-192), spectral convs."""

    def __init__(self, fin, fout, spade_factory):
        super().__init__()
        fmiddle = min(fin, fout)
        self.learned_shortcut = fin != fout
        self.conv_0 = SN(tnn.Conv2d(fin, fmiddle, 3, padding=1))
        self.conv_1 = SN(tnn.Conv2d(fmiddle, fout, 3, padding=1))
        if self.learned_shortcut:
            self.conv_s = SN(tnn.Conv2d(fin, fout, 1, bias=False))
            self.norm_s = spade_factory(fin)
        self.spade_0 = spade_factory(fin)
        self.spade_1 = spade_factory(fmiddle)
        self.actvn = tnn.LeakyReLU(0.2)

    def forward(self, x, seg):
        x_s = self.conv_s(self.norm_s(x, seg)) if self.learned_shortcut else x
        dx = self.conv_0(self.actvn(self.spade_0(x, seg)))
        dx = self.conv_1(self.actvn(self.spade_1(dx, seg)))
        return x_s + dx


class TSamsGen(tnn.Module):
    """Reference SamsGenerator plan (sams_generator.py:106-291), tiny config:
    ngf_base=2, pow 3..5, num_middle=1, attention on the last middle."""

    def __init__(self, in_channels, enc_label_nc, label_channels, out_channels):
        super().__init__()
        NGF_OUTER, NGF_INNER = 8, 32
        enc = [tnn.Conv2d(in_channels, NGF_OUTER, 3, padding=1)]
        for fin, fout in ((8, 16), (16, 32)):
            enc += [
                TResBlock(fin, fout, lambda nc: TSpade(nc, enc_label_nc)),
                tnn.Upsample(scale_factor=0.5),
            ]
        self.encode_layers = tnn.ModuleList(enc)
        self.middle_layers = tnn.ModuleList([
            TResBlock(32, 32, lambda nc: TAttentiveMultiSpade(nc, label_channels)),
        ])
        dec = []
        for fin, fout in ((32, 16), (16, 8)):
            dec += [
                tnn.Upsample(scale_factor=2),
                TResBlock(fin, fout, lambda nc: TMultiSpade(nc, label_channels)),
            ]
        dec.append(tnn.Conv2d(NGF_OUTER, out_channels, 3, padding=1))
        self.decode_layers = tnn.ModuleList(dec)

    def forward(self, prev_frames, prev_maps, current):
        x = prev_frames
        for layer in self.encode_layers:
            x = layer(x, prev_maps) if isinstance(layer, TResBlock) else layer(x)
        for layer in self.middle_layers:
            x = layer(x, current)
        for layer in self.decode_layers:
            x = layer(x, current) if isinstance(layer, TResBlock) else layer(x)
        return x


def test_sams_generator_conversion_parity(rng):
    torch.manual_seed(11)
    n_frames, B, H, W = 3, 2, 32, 24
    label_channels = {"agnostic": 4, "cloth": 3, "densepose": 3, "flow": 2}
    enc_nc = 2 * (n_frames - 1)  # flow channels x prev frames
    tmodel = TSamsGen(3 * (n_frames - 1), enc_nc, label_channels, 4).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
        # the reference re-initializes with gain 0.02 (base_network.py:43-78);
        # torch's default kaiming init makes the SPADE (1+gamma) products
        # explode multiplicatively through the resblock stack, so shrink all
        # conv weights to keep the oracle numerically testable
        for name, p in tmodel.named_parameters():
            if "weight" in name and p.dim() == 4:
                p.mul_(0.1)

    prev_frames = rng.randn(B, 3 * (n_frames - 1), H, W).astype(np.float32)
    prev_maps = rng.randn(B, enc_nc, H, W).astype(np.float32)
    current = {
        k: rng.randn(B, c, H, W).astype(np.float32)
        for k, c in label_channels.items()
    }
    # warm up the spectral-norm power iteration (training forwards update
    # u/v in place); a real trained checkpoint arrives converged like this
    tmodel.train()
    with torch.no_grad():
        for _ in range(30):
            tmodel(
                torch.from_numpy(prev_frames), torch.from_numpy(prev_maps),
                {k: torch.from_numpy(v) for k, v in current.items()},
            )
    tmodel.eval()
    with torch.no_grad():
        out_t = tmodel(
            torch.from_numpy(prev_frames), torch.from_numpy(prev_maps),
            {k: torch.from_numpy(v) for k, v in current.items()},
        ).numpy()

    sd = {f"generator.{k}": v for k, v in tmodel.state_dict().items()}
    variables = convert_sams_generator_state_dict(
        sd, ngf_base=2, ngf_pow_outer=3, ngf_pow_inner=5, ngf_pow_step=1
    )
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    from shineon_tpu.networks.sams import SamsGenerator

    jmodel = SamsGenerator(
        ngf_base=2, ngf_pow_outer=3, ngf_pow_inner=5, ngf_pow_step=1,
        num_middle=1, n_frames_total=n_frames, flow_warp=True,
        encoder_input="flow", inputs=tuple(sorted(label_channels)),
        attention_middle_indices=("0",),
    )
    # NHWC inputs with the frames axis the flax generator expects
    pf = jnp.asarray(
        prev_frames.reshape(B, n_frames - 1, 3, H, W).transpose(0, 1, 3, 4, 2)
    )
    pm = jnp.asarray(
        prev_maps.reshape(B, n_frames - 1, 2, H, W).transpose(0, 1, 3, 4, 2)
    )
    cur = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in current.items()
    }
    out_j = jmodel.apply(variables, pf, pm, cur, train=False)
    # tolerance: flax SpectralNorm refines sigma by one extra power step from
    # the converted u; with warmed-up u the residual is O(1e-3) relative
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=2e-2, atol=2e-3
    )
