"""FlowNet2 golden-activation tests against a torch oracle.

The oracle replicates the flownet2-pytorch graph (module names, Sequential
nesting, bias placement) so its ``state_dict()`` has EXACTLY the key layout of
the published ``FlowNet2_checkpoint.pth.tar``. Weights are random; the
converter maps them by name, and the flax forward must reproduce the torch
forward numerically. This covers, with real activations rather than kernel
round-trips:

  * torch Conv2d padding semantics at every (k, s) the stack uses
  * the ConvTranspose2d (k4, s2, p1) tap alignment / kernel flip
  * bias=False on the upsampled_flow* layers (converter zero-fill)
  * the correlation cost volume inside FlowNetC (441ch, stride-2 window)
  * the SD branch's div_flow scaling and the fusion input assembly
    (reference models/flownet.py:18-59 consumes exactly this stack)
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

# compile-dominated mesh/oracle tests: run with `pytest -m heavy`
pytestmark = pytest.mark.heavy

# ------------------------------------------------------- torch oracle pieces


def tconv(in_ch, out_ch, k=3, s=1):
    return tnn.Sequential(
        tnn.Conv2d(in_ch, out_ch, k, s, (k - 1) // 2, bias=True),
        tnn.LeakyReLU(0.1),
    )


def tdeconv(in_ch, out_ch):
    return tnn.Sequential(
        tnn.ConvTranspose2d(in_ch, out_ch, 4, 2, 1, bias=True),
        tnn.LeakyReLU(0.1),
    )


def ticonv(in_ch, out_ch):
    # flownet2-pytorch i_conv: Sequential(Conv2d) with NO activation
    return tnn.Sequential(tnn.Conv2d(in_ch, out_ch, 3, 1, 1, bias=True))


def tpredict(in_ch):
    return tnn.Conv2d(in_ch, 2, 3, 1, 1, bias=True)


def tupflow():
    return tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)


class TorchRefinement(tnn.Module):
    """The shared C/S decoder tail (attributes live on the parent module in
    flownet2-pytorch; this mixin adds them with the right names)."""

    def add_refinement(self):
        self.deconv5 = tdeconv(1024, 512)
        self.deconv4 = tdeconv(1026, 256)
        self.deconv3 = tdeconv(770, 128)
        self.deconv2 = tdeconv(386, 64)
        self.predict_flow6 = tpredict(1024)
        self.predict_flow5 = tpredict(1026)
        self.predict_flow4 = tpredict(770)
        self.predict_flow3 = tpredict(386)
        self.predict_flow2 = tpredict(194)
        self.upsampled_flow6_to_5 = tupflow()
        self.upsampled_flow5_to_4 = tupflow()
        self.upsampled_flow4_to_3 = tupflow()
        self.upsampled_flow3_to_2 = tupflow()

    def refine(self, c2, c3, c4, c5, c6):
        flow6 = self.predict_flow6(c6)
        up6 = self.upsampled_flow6_to_5(flow6)
        d5 = self.deconv5(c6)
        cat5 = torch.cat([c5, d5, up6], 1)
        flow5 = self.predict_flow5(cat5)
        up5 = self.upsampled_flow5_to_4(flow5)
        d4 = self.deconv4(cat5)
        cat4 = torch.cat([c4, d4, up5], 1)
        flow4 = self.predict_flow4(cat4)
        up4 = self.upsampled_flow4_to_3(flow4)
        d3 = self.deconv3(cat4)
        cat3 = torch.cat([c3, d3, up4], 1)
        flow3 = self.predict_flow3(cat3)
        up3 = self.upsampled_flow3_to_2(flow3)
        d2 = self.deconv2(cat3)
        cat2 = torch.cat([c2, d2, up3], 1)
        return self.predict_flow2(cat2)


class TorchFlowNetS(TorchRefinement):
    def __init__(self, in_ch=12):
        super().__init__()
        self.conv1 = tconv(in_ch, 64, 7, 2)
        self.conv2 = tconv(64, 128, 5, 2)
        self.conv3 = tconv(128, 256, 5, 2)
        self.conv3_1 = tconv(256, 256)
        self.conv4 = tconv(256, 512, 3, 2)
        self.conv4_1 = tconv(512, 512)
        self.conv5 = tconv(512, 512, 3, 2)
        self.conv5_1 = tconv(512, 512)
        self.conv6 = tconv(512, 1024, 3, 2)
        self.conv6_1 = tconv(1024, 1024)
        self.add_refinement()

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3_1 = self.conv3_1(self.conv3(c2))
        c4_1 = self.conv4_1(self.conv4(c3_1))
        c5_1 = self.conv5_1(self.conv5(c4_1))
        c6_1 = self.conv6_1(self.conv6(c5_1))
        return self.refine(c2, c3_1, c4_1, c5_1, c6_1)


def torch_cost_volume(f1, f2, max_disp=20, stride=2):
    """NCHW mirror of shineon's cost_volume (channel-mean dot products over a
    (2*md/s+1)^2 displacement window, zero padding)."""
    B, C, H, W = f1.shape
    padded = F.pad(f2, (max_disp,) * 4)
    outs = []
    for dy in range(-max_disp, max_disp + 1, stride):
        for dx in range(-max_disp, max_disp + 1, stride):
            shifted = padded[:, :, max_disp + dy:max_disp + dy + H,
                             max_disp + dx:max_disp + dx + W]
            outs.append((f1 * shifted).mean(1))
    return torch.stack(outs, 1)


class TorchFlowNetC(TorchRefinement):
    def __init__(self):
        super().__init__()
        self.conv1 = tconv(3, 64, 7, 2)
        self.conv2 = tconv(64, 128, 5, 2)
        self.conv3 = tconv(128, 256, 5, 2)
        self.conv_redir = tconv(256, 32, 1, 1)
        self.conv3_1 = tconv(473, 256)
        self.conv4 = tconv(256, 512, 3, 2)
        self.conv4_1 = tconv(512, 512)
        self.conv5 = tconv(512, 512, 3, 2)
        self.conv5_1 = tconv(512, 512)
        self.conv6 = tconv(512, 1024, 3, 2)
        self.conv6_1 = tconv(1024, 1024)
        self.add_refinement()

    def forward(self, x1, x2):
        a1 = self.conv1(x1)
        b1 = self.conv2(a1)
        c1 = self.conv3(b1)
        a2 = self.conv1(x2)
        b2 = self.conv2(a2)
        c2_ = self.conv3(b2)
        corr = F.leaky_relu(torch_cost_volume(c1, c2_), 0.1)
        redir = self.conv_redir(c1)
        h = torch.cat([redir, corr], 1)
        c3_1 = self.conv3_1(h)
        c4_1 = self.conv4_1(self.conv4(c3_1))
        c5_1 = self.conv5_1(self.conv5(c4_1))
        c6_1 = self.conv6_1(self.conv6(c5_1))
        return self.refine(b1, c3_1, c4_1, c5_1, c6_1)


class TorchFlowNetSD(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = tconv(6, 64)
        self.conv1 = tconv(64, 64, 3, 2)
        self.conv1_1 = tconv(64, 128)
        self.conv2 = tconv(128, 128, 3, 2)
        self.conv2_1 = tconv(128, 128)
        self.conv3 = tconv(128, 256, 3, 2)
        self.conv3_1 = tconv(256, 256)
        self.conv4 = tconv(256, 512, 3, 2)
        self.conv4_1 = tconv(512, 512)
        self.conv5 = tconv(512, 512, 3, 2)
        self.conv5_1 = tconv(512, 512)
        self.conv6 = tconv(512, 1024, 3, 2)
        self.conv6_1 = tconv(1024, 1024)
        self.deconv5 = tdeconv(1024, 512)
        self.deconv4 = tdeconv(1026, 256)
        self.deconv3 = tdeconv(770, 128)
        self.deconv2 = tdeconv(386, 64)
        self.inter_conv5 = ticonv(1026, 512)
        self.inter_conv4 = ticonv(770, 256)
        self.inter_conv3 = ticonv(386, 128)
        self.inter_conv2 = ticonv(194, 64)
        self.predict_flow6 = tpredict(1024)
        self.predict_flow5 = tpredict(512)
        self.predict_flow4 = tpredict(256)
        self.predict_flow3 = tpredict(128)
        self.predict_flow2 = tpredict(64)
        self.upsampled_flow6_to_5 = tupflow()
        self.upsampled_flow5_to_4 = tupflow()
        self.upsampled_flow4_to_3 = tupflow()
        self.upsampled_flow3_to_2 = tupflow()

    def forward(self, x):
        c0 = self.conv0(x)
        c1_1 = self.conv1_1(self.conv1(c0))
        c2_1 = self.conv2_1(self.conv2(c1_1))
        c3_1 = self.conv3_1(self.conv3(c2_1))
        c4_1 = self.conv4_1(self.conv4(c3_1))
        c5_1 = self.conv5_1(self.conv5(c4_1))
        c6_1 = self.conv6_1(self.conv6(c5_1))
        flow6 = self.predict_flow6(c6_1)
        up6 = self.upsampled_flow6_to_5(flow6)
        cat5 = torch.cat([c5_1, self.deconv5(c6_1), up6], 1)
        i5 = self.inter_conv5(cat5)
        flow5 = self.predict_flow5(i5)
        up5 = self.upsampled_flow5_to_4(flow5)
        cat4 = torch.cat([c4_1, self.deconv4(cat5), up5], 1)
        i4 = self.inter_conv4(cat4)
        flow4 = self.predict_flow4(i4)
        up4 = self.upsampled_flow4_to_3(flow4)
        cat3 = torch.cat([c3_1, self.deconv3(cat4), up4], 1)
        i3 = self.inter_conv3(cat3)
        flow3 = self.predict_flow3(i3)
        up3 = self.upsampled_flow3_to_2(flow3)
        cat2 = torch.cat([c2_1, self.deconv2(cat3), up3], 1)
        i2 = self.inter_conv2(cat2)
        return self.predict_flow2(i2)


class TorchFlowNetFusion(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = tconv(11, 64)
        self.conv1 = tconv(64, 64, 3, 2)
        self.conv1_1 = tconv(64, 128)
        self.conv2 = tconv(128, 128, 3, 2)
        self.conv2_1 = tconv(128, 128)
        self.deconv1 = tdeconv(128, 32)
        self.deconv0 = tdeconv(162, 16)
        self.inter_conv1 = ticonv(162, 32)
        self.inter_conv0 = ticonv(82, 16)
        self.predict_flow2 = tpredict(128)
        self.predict_flow1 = tpredict(32)
        self.predict_flow0 = tpredict(16)
        self.upsampled_flow2_to_1 = tupflow()
        self.upsampled_flow1_to_0 = tupflow()

    def forward(self, x):
        c0 = self.conv0(x)
        c1_1 = self.conv1_1(self.conv1(c0))
        c2_1 = self.conv2_1(self.conv2(c1_1))
        flow2 = self.predict_flow2(c2_1)
        up2 = self.upsampled_flow2_to_1(flow2)
        cat1 = torch.cat([c1_1, self.deconv1(c2_1), up2], 1)
        i1 = self.inter_conv1(cat1)
        flow1 = self.predict_flow1(i1)
        up1 = self.upsampled_flow1_to_0(flow1)
        cat0 = torch.cat([c0, self.deconv0(cat1), up1], 1)
        i0 = self.inter_conv0(cat0)
        return self.predict_flow0(i0)


def torch_resample2d(im, flow):
    """Mirror of shineon resample2d: pixel-unit flow warp, bilinear, border
    padding, align_corners=True."""
    B, C, H, W = im.shape
    ys, xs = torch.meshgrid(
        torch.arange(H, dtype=im.dtype), torch.arange(W, dtype=im.dtype),
        indexing="ij",
    )
    gx = xs[None] + flow[:, 0]
    gy = ys[None] + flow[:, 1]
    nx = 2.0 * gx / (W - 1) - 1.0
    ny = 2.0 * gy / (H - 1) - 1.0
    grid = torch.stack([nx, ny], -1)
    return F.grid_sample(
        im, grid, mode="bilinear", padding_mode="border", align_corners=True
    )


class TorchFlowNet2(tnn.Module):
    """The CSS + SD + fusion stack with the checkpoint's submodule names."""

    def __init__(self, div_flow=20.0, rgb_max=255.0):
        super().__init__()
        self.div_flow, self.rgb_max = div_flow, rgb_max
        self.flownetc = TorchFlowNetC()
        self.flownets_1 = TorchFlowNetS()
        self.flownets_2 = TorchFlowNetS()
        self.flownets_d = TorchFlowNetSD()
        self.flownetfusion = TorchFlowNetFusion()

    @staticmethod
    def _up4(x):
        return F.interpolate(x, scale_factor=4, mode="bilinear",
                             align_corners=False)

    def forward(self, im1, im2):
        both = torch.stack([im1, im2], 2)  # (B, 3, 2, H, W)
        rgb_mean = both.reshape(*both.shape[:2], -1).mean(-1)[..., None, None]
        x1 = (im1 - rgb_mean) / self.rgb_max
        x2 = (im2 - rgb_mean) / self.rgb_max

        flowc = self._up4(self.flownetc(x1, x2) * self.div_flow)
        warped1 = torch_resample2d(x2, flowc)
        diff1 = (x1 - warped1).norm(dim=1, keepdim=True)
        s1_in = torch.cat([x1, x2, warped1, flowc / self.div_flow, diff1], 1)
        flows1 = self._up4(self.flownets_1(s1_in) * self.div_flow)

        warped2 = torch_resample2d(x2, flows1)
        diff2 = (x1 - warped2).norm(dim=1, keepdim=True)
        s2_in = torch.cat([x1, x2, warped2, flows1 / self.div_flow, diff2], 1)
        flow_css = self._up4(self.flownets_2(s2_in) * self.div_flow)

        flow_sd = self._up4(self.flownets_d(torch.cat([x1, x2], 1))) / self.div_flow
        norm_sd = flow_sd.norm(dim=1, keepdim=True)
        norm_css = flow_css.norm(dim=1, keepdim=True)
        warped_sd = torch_resample2d(x2, flow_sd)
        warped_css = torch_resample2d(x2, flow_css)
        diff_sd = (x1 - warped_sd).norm(dim=1, keepdim=True)
        diff_css = (x1 - warped_css).norm(dim=1, keepdim=True)
        fuse_in = torch.cat(
            [x1, flow_sd, flow_css, norm_sd, norm_css, diff_sd, diff_css], 1
        )
        return self.flownetfusion(fuse_in)


# -------------------------------------------------------------------- tests


def _convert(prefix, torch_module):
    from shineon_tpu.networks.flownet.flownet2 import (
        convert_torch_flownet2_state_dict,
    )

    sd = {
        f"{prefix}.{k}": v.detach().numpy()
        for k, v in torch_module.state_dict().items()
    }
    return convert_torch_flownet2_state_dict(sd)


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def rng_m():
    return np.random.RandomState(1234)


def test_deconv_tap_alignment(rng_m):
    """ConvTranspose2d(k4, s2, p1) torch vs converted flax, isolated."""
    from shineon_tpu.networks.flownet.flownet2 import (
        convert_torch_flownet2_state_dict,
    )
    import flax.linen as nn

    torch.manual_seed(0)
    t = tnn.ConvTranspose2d(6, 4, 4, 2, 1, bias=True)
    sd = {
        "flownets_d.deconv2.0.weight": t.weight.detach().numpy(),
        "flownets_d.deconv2.0.bias": t.bias.detach().numpy(),
    }
    params = convert_torch_flownet2_state_dict(sd)["params"]["flownets_d"]["deconv2"]
    x = rng_m.randn(2, 10, 12, 6).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(t(torch.from_numpy(_nchw(x))).numpy())
    got = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="SAME").apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_flownets_golden(rng_m):
    from shineon_tpu.networks.flownet import FlowNetS

    torch.manual_seed(1)
    oracle = TorchFlowNetS()
    variables = _convert("flownets_1", oracle)
    params = {"params": variables["params"]["flownets1"]}
    x = (rng_m.randn(1, 64, 64, 12) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(oracle(torch.from_numpy(_nchw(x))).numpy())
    got = np.asarray(FlowNetS().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_flownetc_golden_with_correlation(rng_m):
    from shineon_tpu.networks.flownet import FlowNetC

    torch.manual_seed(2)
    oracle = TorchFlowNetC()
    variables = _convert("flownetc", oracle)
    params = {"params": variables["params"]["flownetc"]}
    x1 = (rng_m.randn(1, 128, 64, 3) * 0.5).astype(np.float32)
    x2 = (rng_m.randn(1, 128, 64, 3) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(
            oracle(torch.from_numpy(_nchw(x1)), torch.from_numpy(_nchw(x2))).numpy()
        )
    got = np.asarray(FlowNetC().apply(params, jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_flownetsd_golden(rng_m):
    from shineon_tpu.networks.flownet import FlowNetSD

    torch.manual_seed(3)
    oracle = TorchFlowNetSD()
    variables = _convert("flownets_d", oracle)
    params = {"params": variables["params"]["flownets_d"]}
    x = (rng_m.randn(1, 64, 64, 6) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(oracle(torch.from_numpy(_nchw(x))).numpy())
    got = np.asarray(FlowNetSD().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_flownetfusion_golden(rng_m):
    from shineon_tpu.networks.flownet import FlowNetFusion

    torch.manual_seed(4)
    oracle = TorchFlowNetFusion()
    variables = _convert("flownetfusion", oracle)
    params = {"params": variables["params"]["flownetfusion"]}
    x = (rng_m.randn(1, 64, 64, 11) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(oracle(torch.from_numpy(_nchw(x))).numpy())
    got = np.asarray(FlowNetFusion().apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_flownet2_full_stack_golden(rng_m):
    """End-to-end: random-weight torch FlowNet2 (checkpoint key layout) vs the
    converted flax stack on the same uint8 frames — covers the div_flow
    scalings, fusion input order, and rgb-mean normalization."""
    from shineon_tpu.networks.flownet import FlowNet2
    from shineon_tpu.networks.flownet.flownet2 import (
        convert_torch_flownet2_state_dict,
    )

    torch.manual_seed(5)
    oracle = TorchFlowNet2()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_torch_flownet2_state_dict(sd)

    im1 = rng_m.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
    im2 = rng_m.randint(0, 255, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(
            oracle(
                torch.from_numpy(_nchw(im1)), torch.from_numpy(_nchw(im2))
            ).numpy()
        )
    got = np.asarray(FlowNet2().apply(variables, jnp.asarray(im1), jnp.asarray(im2)))
    assert got.shape == want.shape
    # several resampling/upsampling stages compound rounding; demand tight
    # agreement in absolute units of the flow values
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
