"""Cross-framework forward parity: a torch GMM with the reference layer plan,
converted to flax, must produce the same theta/grid.

This is the strongest correctness check in the suite: it verifies the conv
padding, BatchNorm eps/running-stat semantics, the correlation channel
ordering, the NCHW-order flatten, and the converter itself — end to end.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tools.convert_lightning_checkpoint import convert_warp_state_dict


class _TorchFeatureExtraction(tnn.Module):
    """The reference FeatureExtraction layer plan (cpvton/warp.py:14-31):
    a .model Sequential, like the reference class."""

    def __init__(self, input_nc, ngf=64):
        super().__init__()
        layers = [tnn.Conv2d(input_nc, ngf, 4, 2, 1), tnn.ReLU(True),
                  tnn.BatchNorm2d(ngf)]
        channels = [(ngf, ngf * 2), (ngf * 2, ngf * 4), (ngf * 4, ngf * 8)]
        for cin, cout in channels:
            cout = min(cout, 512)
            layers += [tnn.Conv2d(min(cin, 512), cout, 4, 2, 1), tnn.ReLU(True),
                       tnn.BatchNorm2d(cout)]
        layers += [tnn.Conv2d(512, 512, 3, 1, 1), tnn.ReLU(True),
                   tnn.BatchNorm2d(512)]
        layers += [tnn.Conv2d(512, 512, 3, 1, 1), tnn.ReLU(True)]
        self.model = tnn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class _TorchRegression(tnn.Module):
    def __init__(self, input_nc, output_dim):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(input_nc, 512, 4, 2, 1), tnn.BatchNorm2d(512), tnn.ReLU(True),
            tnn.Conv2d(512, 256, 4, 2, 1), tnn.BatchNorm2d(256), tnn.ReLU(True),
            tnn.Conv2d(256, 128, 3, 1, 1), tnn.BatchNorm2d(128), tnn.ReLU(True),
            tnn.Conv2d(128, 64, 3, 1, 1), tnn.BatchNorm2d(64), tnn.ReLU(True),
        )
        self.linear = None  # sized by the caller once spatial dims are known

    def forward(self, x):
        h = self.conv(x)
        h = h.reshape(h.shape[0], -1)
        return torch.tanh(self.linear(h))


class _TorchGMM(tnn.Module):
    """Reference WarpModel network graph in torch (as a parity oracle)."""

    def __init__(self, person_nc, cloth_nc, fine_h, fine_w, grid_size):
        super().__init__()
        self.extractionA = _TorchFeatureExtraction(person_nc)
        self.extractionB = _TorchFeatureExtraction(cloth_nc)
        feat_h, feat_w = fine_h // 16, fine_w // 16
        corr_nc = feat_h * feat_w
        self.regression = _TorchRegression(corr_nc, 0)
        reg_h, reg_w = feat_h // 4, feat_w // 4
        self.regression.linear = tnn.Linear(64 * reg_h * reg_w, 2 * grid_size ** 2)

    def forward(self, person, cloth):
        a = self.extractionA(person)
        b = self.extractionB(cloth)

        def l2norm(f):
            norm = torch.pow(torch.sum(torch.pow(f, 2), 1) + 1e-6, 0.5).unsqueeze(1)
            return f / norm

        a, b = l2norm(a), l2norm(b)
        bs, c, h, w = a.shape
        a2 = a.transpose(2, 3).contiguous().view(bs, c, h * w)
        b2 = b.view(bs, c, h * w).transpose(1, 2)
        corr = torch.bmm(b2, a2).view(bs, h, w, h * w).transpose(2, 3).transpose(1, 2)
        return self.regression(corr)


def test_gmm_forward_parity_via_converted_checkpoint(rng):
    torch.manual_seed(420)
    H, W, gs = 128, 96, 3
    person_nc, cloth_nc = 4, 3
    tmodel = _TorchGMM(person_nc, cloth_nc, H, W, gs).eval()
    # randomize running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    person = rng.randn(2, person_nc, H, W).astype(np.float32)
    cloth = rng.randn(2, cloth_nc, H, W).astype(np.float32)
    with torch.no_grad():
        theta_t = tmodel(torch.from_numpy(person), torch.from_numpy(cloth)).numpy()

    variables = convert_warp_state_dict(tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    from shineon_tpu.networks.cpvton import GMM

    jmodel = GMM(fine_height=H, fine_width=W, grid_size=gs)
    (grid, theta_j) = jmodel.apply(
        variables,
        jnp.asarray(person.transpose(0, 2, 3, 1)),
        jnp.asarray(cloth.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(theta_j), theta_t, rtol=1e-3, atol=2e-4)

    # and the TPS grid agrees with the reference formula for that theta
    from shineon_tpu.ops import TpsGridGen

    gen = TpsGridGen(H, W, grid_size=gs)
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(gen(jnp.asarray(theta_t))), atol=1e-4
    )


# ---------------------------------------------------------------- U-Net (TOM)

class _TorchSelfAttention(tnn.Module):
    """SAGAN block with the reference layer names (attention/sagan.py:5-54)."""

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


class _TorchUnetBlock(tnn.Module):
    """Reference UnetSkipConnectionBlock layer plan (cpvton/unet.py:103-198),
    instance-norm variant."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False, self_attn=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=True)
        down_act = tnn.LeakyReLU(0.2, True)
        up_act = tnn.ReLU(True)
        upsample = tnn.Upsample(scale_factor=2, mode="bilinear")

        def upconv(cin, cout):
            return tnn.Conv2d(cin, cout, 3, 1, 1, bias=True)

        norm = tnn.InstanceNorm2d(outer_nc, affine=False)
        if outermost:
            down = [downconv]
            up = [up_act, upsample, upconv(inner_nc * 2, outer_nc), norm]
        elif innermost:
            down = [down_act, downconv]
            up = [up_act, upsample, upconv(inner_nc, outer_nc), norm]
        else:
            down = [down_act, downconv, tnn.InstanceNorm2d(inner_nc, affine=False)]
            up = [up_act, upsample, upconv(inner_nc * 2, outer_nc), norm]
        if self_attn:
            down.append(_TorchSelfAttention(inner_nc))
            up.append(_TorchSelfAttention(outer_nc))
        mid = [submodule] if submodule is not None else []
        self.model = tnn.Sequential(*(down + mid + up))

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


def _torch_unet(input_nc, output_nc, num_downs, num_attention, ngf):
    na = num_attention
    block = _TorchUnetBlock(ngf * 8, ngf * 8, innermost=True, self_attn=na > 0)
    na -= 1
    for _ in range(num_downs - 5):
        block = _TorchUnetBlock(ngf * 8, ngf * 8, submodule=block, self_attn=na > 0)
        na -= 1
    for mo, mi in ((4, 8), (2, 4), (1, 2)):
        block = _TorchUnetBlock(ngf * mo, ngf * mi, submodule=block, self_attn=na > 0)
        na -= 1
    outer = _TorchUnetBlock(output_nc, ngf, input_nc=input_nc, submodule=block,
                            outermost=True, self_attn=na > 0)

    class _Wrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.model = outer

        def forward(self, x):
            return self.model(x)

    return _Wrap()


def test_unet_forward_parity_via_converted_checkpoint(rng):
    from tools.convert_lightning_checkpoint import convert_unet_state_dict

    torch.manual_seed(7)
    tmodel = _torch_unet(input_nc=7, output_nc=4, num_downs=6,
                         num_attention=2, ngf=8).eval()
    x = rng.randn(2, 7, 64, 64).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x)).numpy()

    sd = {f"unet.{k}": v for k, v in tmodel.state_dict().items()}
    variables = convert_unet_state_dict(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    from shineon_tpu.networks.cpvton import UnetGenerator

    jmodel = UnetGenerator(input_nc=7, output_nc=4, num_downs=6,
                           num_attention=2, ngf=8, norm="instance",
                           use_self_attn=True)
    out_j = jmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
