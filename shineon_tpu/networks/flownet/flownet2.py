"""FlowNet2 optical-flow estimator (inference), flax/NHWC.

The reference consumes FlowNet2 from a CUDA git submodule to pre-compute .flo
flow annotations (models/flownet.py:18-59, SURVEY §2.9). This is a TPU-native
rebuild of the published FlowNet2 architecture (Ilg et al., CVPR 2017 — the
CSS stack + SD branch + fusion net):

  * the CUDA ``correlation_package`` cost volume is
    :func:`shineon_tpu.ops.correlation.cost_volume` (max_displacement 20,
    stride 2 -> 441 channels) — a shift-and-reduce sweep XLA fuses on the VPU;
  * the CUDA ``resample2d_package`` warp is the XLA gather
    :func:`shineon_tpu.ops.grid_sample.resample2d`;
  * ``channelnorm_package`` is a channel L2 norm
    (:func:`shineon_tpu.ops.image_ops.channel_norm`).

All sub-networks follow the flownet2 layer plan (conv names kept) so a torch
checkpoint converts by name via :func:`convert_torch_flownet2_state_dict`.
Inference-only: batch-norm-free variant (the released checkpoints), LeakyReLU
0.1 activations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from shineon_tpu.ops.correlation import cost_volume
from shineon_tpu.ops.grid_sample import resample2d
from shineon_tpu.ops.image_ops import channel_norm

_lrelu = lambda x: nn.leaky_relu(x, negative_slope=0.1)  # noqa: E731


def _conv(features, k, s, name):
    pad = ((k // 2, k // 2), (k // 2, k // 2))
    return nn.Conv(features, (k, k), strides=(s, s), padding=pad, name=name)


def _deconv(features, name):
    # torch ConvTranspose2d(k4, s2, p1) doubles the spatial size; flax's
    # equivalent is padding="SAME" (out = in * stride). Tap alignment is
    # golden-tested against a torch oracle in
    # tests/test_flownet_golden.py::test_deconv_tap_alignment.
    return nn.ConvTranspose(
        features, (4, 4), strides=(2, 2), padding="SAME", name=name
    )


def _predict_flow(name):
    return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), use_bias=True, name=name)


def _upsample_flow(name):
    return nn.ConvTranspose(
        2, (4, 4), strides=(2, 2), padding="SAME", use_bias=True, name=name
    )


def _crop_like(x, ref):
    return x[:, : ref.shape[1], : ref.shape[2], :]


class _Refinement(nn.Module):
    """Shared FlowNetC/S decoder: predict flow at /64..

    channels: skip feature channels at levels 5,4,3,2 fed from the encoder.
    Returns the finest flow (at 1/4 input resolution).
    """

    @nn.compact
    def __call__(self, c2, c3, c4, c5, c6):
        flow6 = _predict_flow("predict_flow6")(c6)
        up6 = _upsample_flow("upsampled_flow6_to_5")(flow6)
        d5 = _lrelu(_deconv(512, "deconv5")(c6))
        cat5 = jnp.concatenate([c5, _crop_like(d5, c5), _crop_like(up6, c5)], -1)

        flow5 = _predict_flow("predict_flow5")(cat5)
        up5 = _upsample_flow("upsampled_flow5_to_4")(flow5)
        d4 = _lrelu(_deconv(256, "deconv4")(cat5))
        cat4 = jnp.concatenate([c4, _crop_like(d4, c4), _crop_like(up5, c4)], -1)

        flow4 = _predict_flow("predict_flow4")(cat4)
        up4 = _upsample_flow("upsampled_flow4_to_3")(flow4)
        d3 = _lrelu(_deconv(128, "deconv3")(cat4))
        cat3 = jnp.concatenate([c3, _crop_like(d3, c3), _crop_like(up4, c3)], -1)

        flow3 = _predict_flow("predict_flow3")(cat3)
        up3 = _upsample_flow("upsampled_flow3_to_2")(flow3)
        d2 = _lrelu(_deconv(64, "deconv2")(cat3))
        cat2 = jnp.concatenate([c2, _crop_like(d2, c2), _crop_like(up3, c2)], -1)

        return _predict_flow("predict_flow2")(cat2)


class FlowNetC(nn.Module):
    """Siamese towers + cost volume (max_disp 20, stride 2 -> 441ch)."""

    max_displacement: int = 20
    corr_stride: int = 2

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        # shared weights between the two towers (flownet2 applies one set of
        # conv1..conv3 to both images)
        conv1 = _conv(64, 7, 2, "conv1")
        conv2 = _conv(128, 5, 2, "conv2")
        conv3 = _conv(256, 5, 2, "conv3")

        a1 = _lrelu(conv1(x1)); b1 = _lrelu(conv2(a1)); c1 = _lrelu(conv3(b1))
        a2 = _lrelu(conv1(x2)); b2 = _lrelu(conv2(a2)); c2_ = _lrelu(conv3(b2))

        corr = _lrelu(
            cost_volume(c1, c2_, self.max_displacement, self.corr_stride)
        )
        redir = _lrelu(_conv(32, 1, 1, "conv_redir")(c1))
        h = jnp.concatenate([redir, corr], axis=-1)  # 32 + 441 = 473

        c3_1 = _lrelu(_conv(256, 3, 1, "conv3_1")(h))
        c4 = _lrelu(_conv(512, 3, 2, "conv4")(c3_1))
        c4_1 = _lrelu(_conv(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(_conv(512, 3, 2, "conv5")(c4_1))
        c5_1 = _lrelu(_conv(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(_conv(1024, 3, 2, "conv6")(c5_1))
        c6_1 = _lrelu(_conv(1024, 3, 1, "conv6_1")(c6))

        return _Refinement(name="refine")(b1, c3_1, c4_1, c5_1, c6_1)


class FlowNetS(nn.Module):
    """Plain encoder on a channel-concatenated input (12ch in the CSS stack)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = _lrelu(_conv(64, 7, 2, "conv1")(x))
        c2 = _lrelu(_conv(128, 5, 2, "conv2")(c1))
        c3 = _lrelu(_conv(256, 5, 2, "conv3")(c2))
        c3_1 = _lrelu(_conv(256, 3, 1, "conv3_1")(c3))
        c4 = _lrelu(_conv(512, 3, 2, "conv4")(c3_1))
        c4_1 = _lrelu(_conv(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(_conv(512, 3, 2, "conv5")(c4_1))
        c5_1 = _lrelu(_conv(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(_conv(1024, 3, 2, "conv6")(c5_1))
        c6_1 = _lrelu(_conv(1024, 3, 1, "conv6_1")(c6))
        return _Refinement(name="refine")(c2, c3_1, c4_1, c5_1, c6_1)


class FlowNetSD(nn.Module):
    """Small-displacement branch: stride-1 conv0 + interconv decoder."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c0 = _lrelu(_conv(64, 3, 1, "conv0")(x))
        c1 = _lrelu(_conv(64, 3, 2, "conv1")(c0))
        c1_1 = _lrelu(_conv(128, 3, 1, "conv1_1")(c1))
        c2 = _lrelu(_conv(128, 3, 2, "conv2")(c1_1))
        c2_1 = _lrelu(_conv(128, 3, 1, "conv2_1")(c2))
        c3 = _lrelu(_conv(256, 3, 2, "conv3")(c2_1))
        c3_1 = _lrelu(_conv(256, 3, 1, "conv3_1")(c3))
        c4 = _lrelu(_conv(512, 3, 2, "conv4")(c3_1))
        c4_1 = _lrelu(_conv(512, 3, 1, "conv4_1")(c4))
        c5 = _lrelu(_conv(512, 3, 2, "conv5")(c4_1))
        c5_1 = _lrelu(_conv(512, 3, 1, "conv5_1")(c5))
        c6 = _lrelu(_conv(1024, 3, 2, "conv6")(c5_1))
        c6_1 = _lrelu(_conv(1024, 3, 1, "conv6_1")(c6))

        flow6 = _predict_flow("predict_flow6")(c6_1)
        up6 = _upsample_flow("upsampled_flow6_to_5")(flow6)
        d5 = _lrelu(_deconv(512, "deconv5")(c6_1))
        cat5 = jnp.concatenate([c5_1, _crop_like(d5, c5_1), _crop_like(up6, c5_1)], -1)
        i5 = _conv(512, 3, 1, "inter_conv5")(cat5)

        flow5 = _predict_flow("predict_flow5")(i5)
        up5 = _upsample_flow("upsampled_flow5_to_4")(flow5)
        d4 = _lrelu(_deconv(256, "deconv4")(cat5))
        cat4 = jnp.concatenate([c4_1, _crop_like(d4, c4_1), _crop_like(up5, c4_1)], -1)
        i4 = _conv(256, 3, 1, "inter_conv4")(cat4)

        flow4 = _predict_flow("predict_flow4")(i4)
        up4 = _upsample_flow("upsampled_flow4_to_3")(flow4)
        d3 = _lrelu(_deconv(128, "deconv3")(cat4))
        cat3 = jnp.concatenate([c3_1, _crop_like(d3, c3_1), _crop_like(up4, c3_1)], -1)
        i3 = _conv(128, 3, 1, "inter_conv3")(cat3)

        flow3 = _predict_flow("predict_flow3")(i3)
        up3 = _upsample_flow("upsampled_flow3_to_2")(flow3)
        d2 = _lrelu(_deconv(64, "deconv2")(cat3))
        cat2 = jnp.concatenate([c2_1, _crop_like(d2, c2_1), _crop_like(up3, c2_1)], -1)
        i2 = _conv(64, 3, 1, "inter_conv2")(cat2)
        return _predict_flow("predict_flow2")(i2)


class FlowNetFusion(nn.Module):
    """Fuses the CSS and SD flows at full resolution (11-channel input)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c0 = _lrelu(_conv(64, 3, 1, "conv0")(x))
        c1 = _lrelu(_conv(64, 3, 2, "conv1")(c0))
        c1_1 = _lrelu(_conv(128, 3, 1, "conv1_1")(c1))
        c2 = _lrelu(_conv(128, 3, 2, "conv2")(c1_1))
        c2_1 = _lrelu(_conv(128, 3, 1, "conv2_1")(c2))

        flow2 = _predict_flow("predict_flow2")(c2_1)
        up2 = _upsample_flow("upsampled_flow2_to_1")(flow2)
        d1 = _lrelu(_deconv(32, "deconv1")(c2_1))
        cat1 = jnp.concatenate([c1_1, _crop_like(d1, c1_1), _crop_like(up2, c1_1)], -1)
        i1 = _conv(32, 3, 1, "inter_conv1")(cat1)

        flow1 = _predict_flow("predict_flow1")(i1)
        up1 = _upsample_flow("upsampled_flow1_to_0")(flow1)
        d0 = _lrelu(_deconv(16, "deconv0")(cat1))
        cat0 = jnp.concatenate([c0, _crop_like(d0, c0), _crop_like(up1, c0)], -1)
        i0 = _conv(16, 3, 1, "inter_conv0")(cat0)
        return _predict_flow("predict_flow0")(i0)


def _upsample_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), method="linear")


class FlowNet2(nn.Module):
    """Stacked C -> S -> S with SD branch and fusion (inference graph).

    Input: two uint8/float RGB images (B, H, W, 3), H and W multiples of 64.
    Output: (B, H, W, 2) flow in pixels.
    """

    div_flow: float = 20.0
    rgb_max: float = 255.0

    @nn.compact
    def __call__(self, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
        # per-pair mean normalization (flownet2's rgb_mean over both frames)
        both = jnp.stack([im1, im2], axis=1).astype(jnp.float32)
        rgb_mean = jnp.mean(both, axis=(1, 2, 3), keepdims=True)
        x1 = (im1 - rgb_mean[:, 0]) / self.rgb_max
        x2 = (im2 - rgb_mean[:, 0]) / self.rgb_max

        # --- C
        flowc2 = FlowNetC(name="flownetc")(x1, x2)
        flowc = _upsample_bilinear(flowc2 * self.div_flow, 4)

        # --- S1
        warped1 = resample2d(x2, flowc)
        diff1 = channel_norm(x1 - warped1)
        s1_in = jnp.concatenate(
            [x1, x2, warped1, flowc / self.div_flow, diff1], axis=-1
        )  # 3+3+3+2+1 = 12
        flows1_2 = FlowNetS(name="flownets1")(s1_in)
        flows1 = _upsample_bilinear(flows1_2 * self.div_flow, 4)

        # --- S2
        warped2 = resample2d(x2, flows1)
        diff2 = channel_norm(x1 - warped2)
        s2_in = jnp.concatenate(
            [x1, x2, warped2, flows1 / self.div_flow, diff2], axis=-1
        )
        flows2_2 = FlowNetS(name="flownets2")(s2_in)
        flow_css = _upsample_bilinear(flows2_2 * self.div_flow, 4)

        # --- SD branch
        sd_in = jnp.concatenate([x1, x2], axis=-1)
        flowsd_2 = FlowNetSD(name="flownets_d")(sd_in)
        # flownet2-pytorch upsamples the SD flow divided by div_flow (the SD
        # net is trained on small displacements); golden-tested end-to-end in
        # tests/test_flownet_golden.py::test_flownet2_full_stack_golden
        flow_sd = _upsample_bilinear(flowsd_2, 4) / self.div_flow

        # --- fusion
        norm_sd = channel_norm(flow_sd)
        norm_css = channel_norm(flow_css)
        warped_sd = resample2d(x2, flow_sd)
        warped_css = resample2d(x2, flow_css)
        diff_sd = channel_norm(x1 - warped_sd)
        diff_css = channel_norm(x1 - warped_css)
        fuse_in = jnp.concatenate(
            [x1, flow_sd, flow_css, norm_sd, norm_css, diff_sd, diff_css],
            axis=-1,
        )  # 3+2+2+1+1+1+1 = 11
        return FlowNetFusion(name="flownetfusion")(fuse_in)


def convert_torch_flownet2_state_dict(state_dict) -> dict:
    """Best-effort name-mapped conversion of a flownet2-pytorch FlowNet2
    checkpoint (``FlowNet2_checkpoint.pth.tar``'s ``state_dict``) to this
    module's flax params. Conv kernels OIHW -> HWIO; ConvTranspose kernels
    OIHW -> HWIO with flipped spatial taps (torch ConvTranspose2d correlates
    with flipped kernels relative to XLA's conv_transpose).

    torch sub-module names: flownetc.*, flownets_1.*, flownets_2.*,
    flownets_d.*, flownetfusion.*; layers inside are Sequential(conv, lrelu)
    so weights live at e.g. ``flownetc.conv1.0.weight``.

    Validation: tests/test_flownet_golden.py rebuilds the torch graph with the
    checkpoint's exact key layout and asserts forward parity of every
    sub-network AND the full stack against this conversion. To validate the
    real NVIDIA checkpoint offline::

        import torch
        sd = torch.load("FlowNet2_checkpoint.pth.tar",
                        map_location="cpu")["state_dict"]
        variables = convert_torch_flownet2_state_dict(sd)
        # run FlowNet2().apply(variables, im1, im2) on a Sintel pair and
        # compare EPE against the published torch output for the same pair.
    """
    import numpy as np

    def conv_kernel(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def deconv_kernel(w):
        # torch ConvTranspose2d weight: (in, out, kh, kw)
        w = np.asarray(w)[:, :, ::-1, ::-1]
        return np.transpose(w, (2, 3, 0, 1))

    name_map = {
        "flownetc": "flownetc", "flownets_1": "flownets1",
        "flownets_2": "flownets2", "flownets_d": "flownets_d",
        "flownetfusion": "flownetfusion",
    }
    refinement_layers = {
        "predict_flow6", "predict_flow5", "predict_flow4", "predict_flow3",
        "predict_flow2", "deconv5", "deconv4", "deconv3", "deconv2",
        "upsampled_flow6_to_5", "upsampled_flow5_to_4",
        "upsampled_flow4_to_3", "upsampled_flow3_to_2",
    }
    params: dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] not in name_map:
            continue
        net = name_map[parts[0]]
        layer = parts[1]
        leaf = parts[-1]
        scope = params.setdefault(net, {})
        # FlowNetC/S keep the shared decoder under a "refine" scope
        if net in ("flownetc", "flownets1", "flownets2") and layer in refinement_layers:
            scope = scope.setdefault("refine", {})
        entry = scope.setdefault(layer, {})
        is_deconv = layer.startswith("deconv") or layer.startswith("upsampled")
        if leaf == "weight":
            entry["kernel"] = deconv_kernel(value) if is_deconv else conv_kernel(value)
        elif leaf == "bias":
            entry["bias"] = np.asarray(value)

    # bias=False layers in the torch graph (e.g. the upsampled_flow*
    # ConvTranspose2d's) have no bias entry; the flax modules expect one, so
    # fill zeros (mathematically identical)
    def fill_missing_bias(tree):
        for value in tree.values():
            if "kernel" in value:
                if "bias" not in value:
                    value["bias"] = np.zeros(
                        (value["kernel"].shape[-1],), np.float32
                    )
            else:
                fill_missing_bias(value)

    fill_missing_bias(params)
    return {"params": params}
