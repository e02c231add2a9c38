"""Convert a torch VGG19 checkpoint to the flax .npz the perceptual loss loads.

The reference's VGGLoss builds ``torchvision.models.vgg19(pretrained=True)``
(reference models/networks/vgg.py:6-36, loss.py:110). To reproduce its
objective here:

  1. on any machine with torchvision's cache, save the state dict::

       import torch, torchvision
       sd = torchvision.models.vgg19(weights="IMAGENET1K_V1").state_dict()
       torch.save(sd, "vgg19.pth")

  2. convert it (this script)::

       python tools/convert_vgg19.py vgg19.pth vgg19_imagenet.npz

  3. export ``SHINEON_VGG19_WEIGHTS=/path/to/vgg19_imagenet.npz`` before
     training. Missing weights abort training unless --allow_random_vgg.

Accepts full-model keys (``features.0.weight``), bare features-module keys
(``0.weight``), and wrapper dicts with a ``state_dict`` entry.
"""

from __future__ import annotations

import argparse


def convert(src: str, dst: str) -> None:
    import torch

    from shineon_tpu.networks.vgg import (
        Vgg19Features,
        convert_torch_vgg19_state_dict,
        save_vgg19_params,
    )

    state_dict = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(state_dict, dict) and "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    state_dict = {k: v.numpy() for k, v in state_dict.items() if hasattr(v, "numpy")}
    variables = convert_torch_vgg19_state_dict(state_dict)
    save_vgg19_params(variables, dst)

    # shape sanity: the converted tree must initialize Vgg19Features exactly
    import jax
    import jax.numpy as jnp

    ref = Vgg19Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables)
    assert ref_shapes == got_shapes, (ref_shapes, got_shapes)
    print(f"wrote {dst}")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("src", help="torch .pth state dict (vgg19)")
    parser.add_argument("dst", help="output .npz path")
    args = parser.parse_args()
    convert(args.src, args.dst)


if __name__ == "__main__":
    main()
