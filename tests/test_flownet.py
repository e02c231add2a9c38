"""FlowNet2 stack: shapes, cost volume, offline .flo generation, converter."""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from shineon_tpu.ops.correlation import cost_volume


def test_cost_volume_shape_and_values(rng):
    f1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    cv = np.asarray(cost_volume(f1, f2, max_displacement=2, stride=1))
    assert cv.shape == (1, 8, 8, 25)
    # center channel (dy=dx=0) is mean over channels of f1*f2
    center = 25 // 2
    expected = (np.asarray(f1) * np.asarray(f2)).mean(-1)
    np.testing.assert_allclose(cv[..., center], expected, rtol=1e-5, atol=1e-6)
    # shifted channel: dy=0, dx=+1 compares f1[x] with f2[x+1]
    ch = 2 * 5 + 3  # row dy=0, col dx=+1
    expected = (np.asarray(f1)[:, :, :-1] * np.asarray(f2)[:, :, 1:]).mean(-1)
    np.testing.assert_allclose(cv[:, :, :-1, ch], expected, rtol=1e-5, atol=1e-6)


def test_flownetc_correlation_channels():
    from shineon_tpu.networks.flownet import FlowNetC

    net = FlowNetC()
    x = jnp.zeros((1, 128, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, x)
    flow2 = net.apply(variables, x, x)
    assert flow2.shape == (1, 32, 16, 2)  # 1/4 resolution


def test_flownet2_full_stack_shapes():
    from shineon_tpu.networks.flownet import FlowNet2

    net = FlowNet2()
    im = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), im, im)
    flow = net.apply(variables, im, im)
    assert flow.shape == (1, 64, 64, 2)


def test_flownet_wrapper_and_flo_generation(tmp_path, rng):
    """Offline flow annotation generation on a synthetic video folder."""
    from PIL import Image

    from shineon_tpu.models.flownet import FlowNet, generate_flow_annotations
    from shineon_tpu.datasets.flow_utils import read_flow

    frames_root = tmp_path / "frames"
    for t in range(3):
        vdir = frames_root / "vid0"
        os.makedirs(vdir, exist_ok=True)
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        ).save(vdir / f"frame_{t:03d}.png")

    n = generate_flow_annotations(str(frames_root), str(tmp_path / "flow"))
    assert n == 2
    flow = read_flow(str(tmp_path / "flow" / "vid0" / "frame_000.flo"))
    assert flow.shape == (64, 64, 2)
    assert np.isfinite(flow).all()

    # confidence mask comes back in [0, 1]
    net = FlowNet()
    im = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    f, conf = net(im, im)
    assert f.shape == (1, 64, 64, 2) and conf.shape == (1, 64, 64, 1)
    assert set(np.unique(conf)).issubset({0.0, 1.0})


def test_flownet2_torch_converter_structure():
    """The name-mapped converter must cover every flax param leaf."""
    from shineon_tpu.networks.flownet import FlowNet2
    from shineon_tpu.networks.flownet.flownet2 import (
        convert_torch_flownet2_state_dict,
    )

    net = FlowNet2()
    im = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), im, im)

    # build a fake torch state dict with the flownet2-pytorch naming
    fake = {}

    def walk(tree, scopes):
        for key, value in tree.items():
            if key in ("kernel", "bias"):
                continue
            sub = value
            yield from walk(sub, scopes + [key]) if not (
                "kernel" in sub or "bias" in sub
            ) else [(scopes + [key], sub)]

    torch_names = {
        "flownetc": "flownetc", "flownets1": "flownets_1",
        "flownets2": "flownets_2", "flownets_d": "flownets_d",
        "flownetfusion": "flownetfusion",
    }
    for net_name, subtree in variables["params"].items():
        tname = torch_names[net_name]
        flat = subtree if "refine" not in subtree else {
            **{k: v for k, v in subtree.items() if k != "refine"},
            **subtree["refine"],
        }
        for layer, leaves in flat.items():
            k = np.asarray(leaves["kernel"])
            if layer.startswith("deconv") or layer.startswith("upsampled"):
                # flax HWIO <- torch (in, out, kh, kw) flipped
                w = np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1]
            else:
                # flax HWIO <- torch OIHW
                w = np.transpose(k, (3, 2, 0, 1))
            fake[f"{tname}.{layer}.weight"] = torch.from_numpy(w.copy())
            if "bias" in leaves:
                fake[f"{tname}.{layer}.bias"] = torch.from_numpy(
                    np.asarray(leaves["bias"]).copy()
                )

    converted = convert_torch_flownet2_state_dict(fake)
    # every leaf present with matching shapes
    orig_leaves = jax.tree_util.tree_leaves_with_path(variables["params"])
    conv_tree = converted["params"]
    for path, leaf in orig_leaves:
        node = conv_tree
        for p in path:
            node = node[p.key]
        assert np.asarray(node).shape == np.asarray(leaf).shape, path
    # round-trip: converted kernels equal the originals
    for path, leaf in orig_leaves:
        node = conv_tree
        for p in path:
            node = node[p.key]
        np.testing.assert_allclose(np.asarray(node), np.asarray(leaf), atol=0)


def test_bf16_policy_forward():
    """--precision 16 runs the GMM in bfloat16 with f32 params and f32 theta."""
    import argparse

    from shineon_tpu.networks.cpvton import GMM

    model = GMM(fine_height=128, fine_width=96, grid_size=3, dtype=jnp.bfloat16)
    person = jnp.zeros((1, 128, 96, 4))
    cloth = jnp.zeros((1, 128, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), person, cloth)
    # params stay f32
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    (grid, theta), _ = model.apply(variables, person, cloth, mutable=["batch_stats"])
    assert theta.dtype == jnp.float32  # sampling coordinates kept full precision
    assert grid.dtype == jnp.float32
