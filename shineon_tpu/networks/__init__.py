"""Network registry + shared option groups (reference: models/networks/__init__.py)."""

from __future__ import annotations

import argparse

from shineon_tpu.networks.attention import ATTENTION_TYPES, SelfAttention  # noqa: F401
from shineon_tpu.networks.discriminator import (  # noqa: F401
    MultiscaleDiscriminator,
    NLayerDiscriminator,
)
from shineon_tpu.networks.loss import GANLoss, VGGLoss, l1_loss  # noqa: F401
from shineon_tpu.utils import find_class_in_module


def find_network_using_name(target_network_name: str, filename: str):
    target_class_name = target_network_name + filename
    module_name = "shineon_tpu.networks." + filename
    return find_class_in_module(target_class_name, module_name)


def add_base_network_options(parser: argparse.ArgumentParser, is_train: bool):
    """--init_type/--init_variance (reference base_network.py:15-29)."""
    parser.add_argument(
        "--init_type",
        type=str,
        default="xavier",
        help="weight init scheme: normal, xavier, xavier_uniform, kaiming, or orthogonal",
    )
    parser.add_argument(
        "--init_variance",
        type=float,
        default=0.02,
        help="gain/std of the weight init distribution",
    )
    return parser


def add_discriminator_options(parser: argparse.ArgumentParser, is_train: bool):
    """Multiscale + NLayer D options (discriminator.py:18-34, 80-88)."""
    parser.add_argument(
        "--netD_subarch", type=str, default="n_layer",
        help="conv depth of each PatchGAN discriminator",
    )
    parser.add_argument(
        "--num_D", type=int, default=2,
        help="discriminator count in the multiscale pyramid",
    )
    parser.add_argument(
        "--n_layers_D", type=int, default=4, help="# layers in each discriminator"
    )
    parser.add_argument(
        "--ndf", type=int, default=64, help="num discriminator features"
    )
    return parser


def modify_commandline_options(parser: argparse.ArgumentParser, is_train: bool):
    """Pull SamsGenerator + discriminator options (reference networks/__init__.py:23-34)."""
    from shineon_tpu.networks.sams.sams_generator import SamsGenerator

    parser = SamsGenerator.modify_commandline_options(parser, is_train)
    if is_train:
        parser = add_discriminator_options(parser, is_train)
    return parser


def count_parameters(params) -> int:
    """Total parameter count (BaseNetwork.print_network capability,
    base_network.py:31-40)."""
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def print_network(name: str, params) -> None:
    print(
        "Network [%s] was created. Total number of parameters: %.1f million."
        % (name, count_parameters(params) / 1e6)
    )


def define_D(name: str, opt, **kwargs):
    """Build a discriminator by name (reference networks/__init__.py:47-49)."""
    cls = find_network_using_name(name, "discriminator")
    return cls(
        num_D=getattr(opt, "num_D", 2),
        ndf=getattr(opt, "ndf", 64),
        n_layers=getattr(opt, "n_layers_D", 4),
        norm_D=getattr(opt, "norm_D", "spectralinstance"),
        init_type=getattr(opt, "init_type", "xavier"),
        init_gain=getattr(opt, "init_variance", 0.02),
        **kwargs,
    ) if name == "multiscale" else cls(
        ndf=getattr(opt, "ndf", 64),
        n_layers=getattr(opt, "n_layers_D", 4),
        norm_D=getattr(opt, "norm_D", "spectralinstance"),
        init_type=getattr(opt, "init_type", "xavier"),
        init_gain=getattr(opt, "init_variance", 0.02),
        **kwargs,
    )
