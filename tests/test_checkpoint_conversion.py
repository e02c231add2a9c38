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
