"""Test/inference flags (reference: options/test_options.py:5-32)."""

from __future__ import annotations

import argparse

from shineon_tpu.options.base_options import BaseOptions


class TestOptions(BaseOptions):
    def initialize(self, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser = BaseOptions.initialize(self, parser)
        parser.set_defaults(datamode="test")
        parser.add_argument(
            "--no_shuffle", action="store_true", default=True,
            help="don't shuffle input data (always on at test time)",
        )
        self.is_train = False
        parser.add_argument(
            "--result_dir",
            type=str,
            default="test_results",
            help="directory to write exported test outputs into",
        )
        parser.add_argument(
            "--tryon_list",
            help="Use a CSV file to specify what cloth should go on each person. "
            "The CSV should have two columns: CLOTH_PATH and PERSON_ID.",
        )
        parser.add_argument(
            "--random_tryon",
            help="Randomly choose cloth-person pairs for try-on.",
            action="store_true",
        )
        parser.add_argument(
            "--allow_random_init",
            action="store_true",
            help="explicitly allow test.py to run WITHOUT --checkpoint "
            "(exports noise frames from a random init; useful only for "
            "pipeline smoke tests). Without this flag, test.py refuses to "
            "evaluate an un-restored model (reference train.py:39-45 "
            "requires a checkpoint to test).",
        )
        parser.add_argument(
            "--int8_spade",
            action="store_true",
            help="serve the SPADE gamma/beta convs quantized (weight + "
            "dynamic-activation int8 on the MXU's 2x int8 path; 138->165 "
            "f/s measured, quality-neutral on the QA loop — PARITY_E2E.md). "
            "Equivalent to SHINEON_INT8_SPADE=1.",
        )
        return parser
