"""GAN training flags (reference: options/gan_options.py:6-25)."""

from __future__ import annotations

import argparse


def modify_commandline_options(parser: argparse.ArgumentParser, is_train: bool):
    from shineon_tpu.networks.loss import GANLoss

    if is_train:
        parser.add_argument(
            "--gan_mode", default="hinge", choices=GANLoss.AVAILABLE_MODES
        )
        parser.add_argument(
            "--lr_D",
            type=float,
            default=3e-4,
            help="Learning rate for Discriminators (TTUR; Heusel et al. 2017)",
        )
        parser.add_argument(
            "--no_ganFeat_loss",
            action="store_true",
            help="Disable GAN feature matching in loss.",
        )
    return parser
