"""VGG19 perceptual-loss weight handling:

  * missing pretrained weights HARD-FAIL unless explicitly allowed
    (reference trains against ImageNet VGG19, loss.py:110 — random filters
    silently change the objective)
  * torch-state-dict -> flax conversion produces numerically identical
    slice features (torch oracle built layer-for-layer like
    torchvision.models.vgg19().features)
  * .npz save / env-var load round-trip feeds VGGLoss
"""

import os

import numpy as np
import pytest
import torch
import torch.nn as nn

# vgg19 'features' config (torchvision cfg 'E'): conv channel widths with 'M'
# maxpools between stages
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
# Sequential indices of the relus ending each VGGLoss slice
# (relu1_1, relu2_1, relu3_1, relu4_1, relu5_1)
_TAPS = (1, 6, 11, 20, 29)


def _torch_vgg19_features(seed=0):
    torch.manual_seed(seed)
    layers, in_ch = [], 3
    for v in _VGG19_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            in_ch = v
    return nn.Sequential(*layers)


def test_missing_weights_raise(monkeypatch):
    from shineon_tpu.networks.vgg import MissingVgg19WeightsError, load_vgg19_params

    monkeypatch.delenv("SHINEON_VGG19_WEIGHTS", raising=False)
    monkeypatch.delenv("SHINEON_ALLOW_RANDOM_VGG", raising=False)
    with pytest.raises(MissingVgg19WeightsError):
        load_vgg19_params()
    # explicit opt-in works (both spellings)
    assert load_vgg19_params(allow_random=True)["params"]
    monkeypatch.setenv("SHINEON_ALLOW_RANDOM_VGG", "1")
    assert load_vgg19_params()["params"]


def test_training_model_requires_weights(monkeypatch, tmp_path):
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from test_train_e2e import _sams_opt_tiny

    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.networks.vgg import MissingVgg19WeightsError

    monkeypatch.delenv("SHINEON_VGG19_WEIGHTS", raising=False)
    monkeypatch.delenv("SHINEON_ALLOW_RANDOM_VGG", raising=False)
    with pytest.raises(MissingVgg19WeightsError):
        SamsModel(_sams_opt_tiny())
    # --allow_random_vgg unblocks it; wt_vgg == 0 also needs no weights
    SamsModel(_sams_opt_tiny(allow_random_vgg=True))
    SamsModel(_sams_opt_tiny(wt_vgg=0.0))


def test_torch_conversion_feature_parity():
    """Converted random torch weights must reproduce every slice activation."""
    from shineon_tpu.networks.vgg import Vgg19Features, convert_torch_vgg19_state_dict

    oracle = _torch_vgg19_features()
    state_dict = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_torch_vgg19_state_dict(state_dict)

    rng = np.random.RandomState(420)
    x = rng.rand(2, 64, 48, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        h = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = []
        for i, layer in enumerate(oracle):
            h = layer(h)
            if i in _TAPS:
                want.append(np.transpose(h.numpy(), (0, 2, 3, 1)))
            if i == _TAPS[-1]:
                break

    got = Vgg19Features().apply(variables, x)
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-4)


def test_npz_roundtrip_feeds_vggloss(monkeypatch, tmp_path):
    import jax.numpy as jnp

    from shineon_tpu.networks.loss import VGGLoss
    from shineon_tpu.networks.vgg import (
        convert_torch_vgg19_state_dict,
        load_vgg19_params,
        save_vgg19_params,
    )

    oracle = _torch_vgg19_features(seed=1)
    state_dict = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    variables = convert_torch_vgg19_state_dict(state_dict)
    path = str(tmp_path / "vgg19.npz")
    save_vgg19_params(variables, path)

    monkeypatch.setenv("SHINEON_VGG19_WEIGHTS", path)
    loaded = load_vgg19_params()
    for scope, leaves in variables["params"].items():
        for leaf, arr in leaves.items():
            np.testing.assert_array_equal(loaded["params"][scope][leaf], arr)

    loss = VGGLoss()  # no allow_random needed: weights are present
    x = jnp.zeros((1, 32, 32, 3))
    assert float(loss(x, x)) == 0.0
    assert float(loss(x, x + 0.5)) > 0.0


def test_convert_vgg19_cli(tmp_path, monkeypatch):
    """tools/convert_vgg19.py end-to-end on a saved torch checkpoint."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), os.pardir))
    from tools.convert_vgg19 import convert

    oracle = _torch_vgg19_features(seed=2)
    src = str(tmp_path / "vgg19.pth")
    torch.save(oracle.state_dict(), src)
    dst = str(tmp_path / "vgg19.npz")
    convert(src, dst)
    assert os.path.exists(dst)
    flat = np.load(dst)
    assert len(flat.files) == 13 * 2  # 13 convs x (kernel, bias)
