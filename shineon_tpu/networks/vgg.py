"""VGG19 feature extractor for the perceptual loss, flax/NHWC.

Reference: models/networks/vgg.py:6-36 — torchvision VGG19 ``features`` split
into five slices ending at relu1_1, relu2_1, relu3_1, relu4_1, relu5_1.

Pretrained weights: convert a torch VGG19 ``state_dict`` (.pth) with
``tools/convert_vgg19.py`` (wrapping :func:`convert_torch_vgg19_state_dict`)
and point the ``SHINEON_VGG19_WEIGHTS`` env var at the resulting ``.npz``.
Missing weights RAISE unless random filters are explicitly opted into
(``--allow_random_vgg`` / ``SHINEON_ALLOW_RANDOM_VGG=1``), because the
reference's perceptual objective is the ImageNet VGG19 (loss.py:110).

Like the reference (loss.py:106-122), inputs are the raw [-1, 1] images with no
ImageNet renormalization.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv channel plan, grouped by slice
# (conv layers per slice; maxpool positions implied between groups below).
_SLICE_PLAN: Sequence[Sequence[int]] = (
    (64,),            # slice1: conv1_1             -> relu1_1
    (64, 128),        # slice2: conv1_2 pool conv2_1 -> relu2_1
    (128, 256),       # slice3: conv2_2 pool conv3_1 -> relu3_1
    (256, 256, 256, 512),  # slice4: conv3_2..conv3_4 pool conv4_1 -> relu4_1
    (512, 512, 512, 512),  # slice5: conv4_2..conv4_4 pool conv5_1 -> relu5_1
)
# whether a 2x2 maxpool precedes the LAST conv of the slice
_POOL_BEFORE_LAST = (False, True, True, True, True)


class Vgg19Features(nn.Module):
    """Returns the 5 relu activations used by VGGLoss."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        idx = 0
        for slice_i, (plan, pool_last) in enumerate(zip(_SLICE_PLAN, _POOL_BEFORE_LAST)):
            for j, feats in enumerate(plan):
                if pool_last and j == len(plan) - 1:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(
                    feats, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name=f"conv{idx}"
                )(x)
                x = nn.relu(x)
                idx += 1
            outs.append(x)
        return outs


def convert_torch_vgg19_state_dict(state_dict) -> dict:
    """torch vgg19 ``features`` state_dict -> flax params for Vgg19Features.

    Accepts either torchvision's full-model keys (``features.0.weight``) or the
    bare features module (``0.weight``). Conv kernels OIHW -> HWIO.
    """
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28]
    params = {}
    for new_i, torch_i in enumerate(conv_indices):
        for prefix in (f"features.{torch_i}.", f"{torch_i}."):
            wkey, bkey = prefix + "weight", prefix + "bias"
            if wkey in state_dict:
                w = np.asarray(state_dict[wkey])
                b = np.asarray(state_dict[bkey])
                params[f"conv{new_i}"] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),
                    "bias": b,
                }
                break
        else:
            raise KeyError(f"missing vgg19 conv {torch_i} in state_dict")
    return {"params": params}


class MissingVgg19WeightsError(RuntimeError):
    pass


def vgg19_weights_path() -> str:
    """Path of the converted ImageNet VGG19 weights, or '' if unavailable."""
    path = os.environ.get("SHINEON_VGG19_WEIGHTS", "")
    return path if path and os.path.exists(path) else ""


def load_vgg19_params(rng_seed: int = 420, allow_random: bool = False):
    """Load converted weights from $SHINEON_VGG19_WEIGHTS (.npz of the flax
    params tree).

    Missing weights are a HARD ERROR unless ``allow_random`` (or the env var
    ``SHINEON_ALLOW_RANDOM_VGG=1``) opts into the deterministic random-filter
    fallback: the reference's perceptual loss is the ImageNet VGG19
    (loss.py:110), and silently training against random filters optimizes a
    different objective.
    """
    import jax

    path = vgg19_weights_path()
    if path:
        flat = np.load(path)
        params = {}
        for key in flat.files:
            scope, leaf = key.rsplit("/", 1)
            params.setdefault(scope, {})[leaf] = flat[key]
        return {"params": params}
    allow_random = allow_random or os.environ.get(
        "SHINEON_ALLOW_RANDOM_VGG", ""
    ) not in ("", "0")
    if not allow_random:
        raise MissingVgg19WeightsError(
            "No pretrained VGG19 weights found. Convert the torchvision "
            "checkpoint with tools/convert_vgg19.py and point "
            "SHINEON_VGG19_WEIGHTS at the .npz, or pass --allow_random_vgg "
            "(env SHINEON_ALLOW_RANDOM_VGG=1) to knowingly train against "
            "fixed random filters."
        )
    from shineon_tpu.utils.log import get_logger

    get_logger().warning(
        "VGG19 perceptual loss is using RANDOM (seed-%d) filters — results "
        "will differ from the reference's ImageNet-VGG objective." % rng_seed
    )
    model = Vgg19Features()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(rng_seed), dummy)


def save_vgg19_params(variables: dict, path: str) -> None:
    flat = {
        f"{scope}/{leaf}": np.asarray(arr)
        for scope, leaves in variables["params"].items()
        for leaf, arr in leaves.items()
    }
    np.savez(path, **flat)
