"""Base CLI option surface — flag-for-flag parity with the reference.

Reference: options/base_options.py:18-265. The same three-phase dynamic parse is
kept: base flags -> the chosen model class extends the parser -> the chosen
dataset class extends the parser -> final parse. Models/datasets can also change
defaults of shared flags via ``parser.set_defaults``.

TPU mapping of the hardware flags:
  --gpu_ids            comma list of local device indices. When passed
                       explicitly, the Trainer restricts its data mesh to those
                       devices (reference train.py:76-85); left at the default
                       it uses all of jax.devices().
  --distributed_backend  kept for parity; "ddp" selects the data-parallel Mesh
                       (the only mode the reference supports: SURVEY §2.10).
  --precision {16,32}  16 -> bfloat16 compute policy (no loss scaling needed on
                       TPU), 32 -> float32.
"""

from __future__ import annotations

import argparse
import os
import sys

from shineon_tpu.utils.log import get_logger

# True iff a previous parse() in this process set SHINEON_INT8_SPADE — lets
# parse() clear its own setting without clobbering an external export.
_INT8_ENV_OWNED = False

logger = get_logger()


class BaseOptions:
    def __init__(self):
        self.initialized = False
        self.is_train = None

    def initialize(self, parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser.add_argument("--name", default="unnamed_experiment")
        # compute
        parser.add_argument(
            "--distributed_backend",
            default="ddp",
            help="how to do distributed multi-device training (parity flag; maps to "
            "a data-parallel jax.sharding.Mesh)",
        )
        parser.add_argument(
            "--gpu_ids",
            default="0",
            help="comma list of accelerator device indices to train on; when "
            "given explicitly it restricts the data mesh, otherwise every "
            "local device is used",
        )
        parser.add_argument(
            "-j", "--num_workers", "--workers", dest="workers", type=int, default=4
        )
        parser.add_argument("-b", "--batch_size", type=int, default=8)
        parser.add_argument("--activation", choices=("relu", "gelu", "swish", "sine"))
        parser.add_argument(
            "-fp",
            "--precision",
            type=int,
            dest="precision",
            help="16 -> bfloat16 compute, 32 -> float32 compute",
            choices=(16, 32),
            default=16,
        )
        # data
        parser.add_argument(
            "--dataset", choices=("viton", "viton_vvt_mpv", "vvt", "mpv"), default="vvt"
        )
        parser.add_argument("--datamode", default="train")
        parser.add_argument(
            "--model",
            help="model to run: 'warp' (synonym 'gmm'), 'unet_mask' "
            "(synonyms 'tom', 'unet'), or 'sams'.",
        )
        parser.add_argument(
            "--datacap",
            "--datacap_train",
            "--limit_train_batches",
            dest="limit_train_batches",
            default="1.0",
            help="limits the train loader to this many batches (int) or fraction (float)",
        )
        parser.add_argument(
            "--datacap_val",
            "--limit_val_batches",
            dest="limit_val_batches",
            default="1.0",
            help="limits the val loader to this many batches (int) or fraction (float)",
        )
        # logging
        parser.add_argument(
            "--experiments_dir",
            default="experiments",
            help="root directory for experiment logs and checkpoints",
        )
        parser.add_argument(
            "--checkpoint",
            type=str,
            default="",
            help="checkpoint path to initialize/resume from",
        )
        parser.add_argument(
            "--display_count",
            type=int,
            help="TensorBoard logging cadence, in steps",
            default=200,
        )
        parser.add_argument(
            "--loglevel",
            choices=("debug", "info", "warning", "error", "critical"),
            default="info",
            help="console logging verbosity",
        )
        # debug
        parser.add_argument(
            "--fast_dev_run", action="store_true", help="single-batch smoke run of the full pipeline",
        )
        self.initialized = True
        return parser

    def gather_options(self, argv=None) -> argparse.Namespace:
        """Three-phase parse (reference: options/base_options.py:112-141)."""
        import shineon_tpu.datasets as datasets
        import shineon_tpu.models as models

        parser = argparse.ArgumentParser(
            formatter_class=argparse.ArgumentDefaultsHelpFormatter
        )
        parser = self.initialize(parser)

        opt, _ = parser.parse_known_args(argv)

        BaseOptions.apply_model_synonyms(opt)
        model_option_setter = models.get_option_setter(opt.model)
        parser = model_option_setter(parser, self.is_train)
        opt, _ = parser.parse_known_args(argv)  # parse again with new defaults

        dataset_option_setter = datasets.get_option_setter(opt.dataset)
        parser = dataset_option_setter(parser, self.is_train)

        self.parser = parser
        return parser.parse_args(argv)

    def print_options(self, opt: argparse.Namespace) -> None:
        """Echo options, marking non-default values (reference: options/base_options.py:143-167)."""
        message = ""
        message += "----------------- Options ---------------\n"
        for k, v in sorted(vars(opt).items()):
            comment = ""
            default = self.parser.get_default(k)
            if v != default:
                comment = "\t[default: %s]" % str(default)
            message += "{:>25}: {:<30}{}\n".format(str(k), str(v), comment)
        message += "----------------- End -------------------"
        print(message)
        self.options_formatted_str = message

    def parse(self, argv=None) -> argparse.Namespace:
        opt = self.gather_options(argv)
        opt.is_train = self.is_train

        interactive = argv is None
        effective_argv = sys.argv[1:] if argv is None else argv
        opt.gpu_ids_explicit = "--gpu_ids" in effective_argv
        BaseOptions.apply_ask_unnamed_experiment(opt, interactive=interactive)
        BaseOptions.apply_model_synonyms(opt)
        BaseOptions.apply_gpu_ids(opt)
        BaseOptions.apply_val_check_ge_train_batch(opt)
        BaseOptions.apply_sort_inputs(opt)

        from shineon_tpu.datasets.n_frames_interface import NFramesInterface

        NFramesInterface.apply_n_frames_now_default_total(opt)
        from shineon_tpu.models.sams_model import SamsModel

        SamsModel.apply_default_encoder_input(opt)

        # The quantized-serving switch is read at trace time by
        # shineon_tpu.networks.sams.spade.int8_spade_enabled. parse() only
        # ever clears a value a previous parse() set (tracked by the module
        # sentinel), so an externally exported SHINEON_INT8_SPADE survives —
        # but repeated parses in one process can't leak the flag (ADVICE r3).
        global _INT8_ENV_OWNED
        if getattr(opt, "int8_spade", False):
            os.environ["SHINEON_INT8_SPADE"] = "1"
            _INT8_ENV_OWNED = True
        elif _INT8_ENV_OWNED:
            os.environ.pop("SHINEON_INT8_SPADE", None)
            _INT8_ENV_OWNED = False

        self.print_options(opt)
        self.opt = opt
        return self.opt

    @staticmethod
    def apply_ask_unnamed_experiment(opt, interactive=True):
        """Interactive experiment-name prompt (reference: options/base_options.py:194-206)."""
        if "--name" not in sys.argv or not interactive:
            if not interactive:
                return
            if not sys.stdin.isatty():
                return
            print(
                "\nNo --name was given for this experiment. Enter one now, or "
                "press enter to keep the default (pass --name NAME to skip "
                "this prompt)."
            )
            new_name = input(f"experiment name [{opt.name}]: ")
            print()
            if new_name:
                opt.name = new_name
                print(f"Using experiment name: {opt.name}")

    @staticmethod
    def apply_gpu_ids(opt):
        str_ids = str(opt.gpu_ids).split(",")
        opt.gpu_ids = [int(s) for s in str_ids if s != "" and int(s) >= 0]

    @staticmethod
    def apply_model_synonyms(opt):
        """gmm -> warp, tom/unet -> unet_mask (reference: options/base_options.py:223-234)."""
        opt.model = opt.model.lower()
        before = opt.model
        if opt.model == "gmm":
            opt.model = "warp"
        elif opt.model in ("tom", "unet"):
            opt.model = "unet_mask"
        if before != opt.model:
            print(f"--model {before} is a synonym; running --model {opt.model}")

    @staticmethod
    def apply_sort_inputs(opt):
        opt.person_inputs = sorted(opt.person_inputs)
        opt.cloth_inputs = sorted(opt.cloth_inputs)

    @staticmethod
    def apply_val_check_ge_train_batch(opt):
        """Clamp val_check_interval to limit_train_batches (reference: options/base_options.py:249-265)."""
        if hasattr(opt, "val_check_interval"):
            if opt.fast_dev_run:
                opt.val_check_interval = 1
                return
            from shineon_tpu.utils import str2num

            val_check_interval = str2num(opt.val_check_interval)
            limit_train_batches = str2num(opt.limit_train_batches)
            if (
                isinstance(val_check_interval, int)
                and isinstance(limit_train_batches, int)
                and val_check_interval > limit_train_batches
            ):
                opt.val_check_interval = opt.limit_train_batches


def namespace_from_defaults(model: str, dataset: str, is_train: bool = True, **overrides):
    """Build a fully-populated options Namespace programmatically (for tests/library
    use) by running the same three-phase parser with an explicit argv."""
    from shineon_tpu.options.test_options import TestOptions
    from shineon_tpu.options.train_options import TrainOptions

    argv = ["--model", model, "--dataset", dataset, "--name", "test"]
    for key, value in overrides.items():
        if isinstance(value, bool):
            if value:
                argv.append(f"--{key}")
            continue
        argv.append(f"--{key}")
        if isinstance(value, (list, tuple)):
            argv.extend(str(v) for v in value)
        else:
            argv.append(str(value))
    options_obj = TrainOptions() if is_train else TestOptions()
    return options_obj.parse(argv)
