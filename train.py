"""Train driver (reference: train.py:32-145) — same CLI surface.

    python train.py --model {warp,unet_mask,sams} --dataset {viton,vvt,mpv,...}

Builds the options, instantiates the model (fresh or from checkpoint), builds
the Trainer over the device mesh, runs fit/test with checkpoint-on-interrupt.
"""

from __future__ import annotations

import logging

from shineon_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from shineon_tpu.models import find_model_using_name
from shineon_tpu.options.test_options import TestOptions
from shineon_tpu.options.train_options import TrainOptions
from shineon_tpu.training.loop import Trainer
from shineon_tpu.utils.log import setup_custom_logger

logger = setup_custom_logger("logger")


def main(train: bool = True, argv=None):
    options_obj = TrainOptions() if train else TestOptions()
    opt = options_obj.parse(argv)
    logger.setLevel(getattr(logging, opt.loglevel.upper()))

    if (
        not train
        and not opt.checkpoint
        and not getattr(opt, "allow_random_init", False)
    ):
        # The reference refuses to test without a checkpoint
        # (train.py:39-45); silently exporting noise frames from a random
        # init is a silent failure mode. --allow_random_init opts into it
        # explicitly (pipeline smoke tests).
        raise SystemExit(
            "test.py needs --checkpoint (no model to evaluate); pass "
            "--allow_random_init to export from a random initialization anyway"
        )

    model_class = find_model_using_name(opt.model)
    model = model_class(opt)
    resume_state = None
    if opt.checkpoint:
        from shineon_tpu.training.checkpointing import load_checkpoint

        template = model.init_state(__import__("jax").random.PRNGKey(420), 1)
        resume_state = load_checkpoint(opt.checkpoint, template)
        logger.info(
            f"RESUMED {model_class.__name__} from checkpoint: {opt.checkpoint}"
        )
    else:
        logger.info(f"INITIALIZED new {model_class.__name__}")
    model.override_hparams(opt)

    trainer = Trainer(opt)
    if train:
        trainer.fit(model, resume_state=resume_state)
    else:
        print("Testing........")
        print(opt)
        model.setup("test")
        state = resume_state
        if state is None:
            logger.warning(
                "testing a RANDOMLY INITIALIZED model (--allow_random_init)"
            )
            state = model.init_state(__import__("jax").random.PRNGKey(420), 1)
        trainer.test(model, state)

    logger.info(f"Finished {opt.model}, named {opt.name}!")


if __name__ == "__main__":
    main(train=True)
