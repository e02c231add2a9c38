"""Orbax checkpointing with the reference's writer set (SURVEY §5.4):

  * top-k (5) on the validation loss        (ModelCheckpoint save_top_k=5)
  * every --save_count steps + FINAL        (CheckpointEveryNSteps)
  * named interrupt saves                   (save_on_interrupt, train.py:121-141)
  * the option namespace stored alongside   (hparams-in-ckpt + override_hparams)

Layout: {experiments_dir}/{name}/checkpoints/{topk,steps}/<step>/ plus
named/<name>/ for interrupt/final saves, and hparams.json.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from shineon_tpu.utils.log import get_logger

logger = get_logger()


def _to_jsonable(value):
    try:
        json.dumps(value)
        return value
    except TypeError:
        return str(value)


class CheckpointKeeper:
    def __init__(self, root: str, save_count: int = 10000, top_k: int = 5):
        self.root = osp.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.save_count = save_count
        self._topk = ocp.CheckpointManager(
            osp.join(self.root, "topk"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=top_k,
                best_fn=lambda metrics: metrics["checkpoint_on"],
                best_mode="min",
            ),
        )
        self._steps = ocp.CheckpointManager(
            osp.join(self.root, "steps"),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        self._named = ocp.StandardCheckpointer()

    def write_hparams(self, opt) -> None:
        payload = {k: _to_jsonable(v) for k, v in sorted(vars(opt).items())}
        with open(osp.join(self.root, "hparams.json"), "w") as f:
            json.dump(payload, f, indent=2)

    def save_validation(self, step: int, state, checkpoint_on: float) -> None:
        """Top-k writer, keyed on the model's declared val loss
        (e.g. warp: EvalResult(checkpoint_on=loss), warp_model.py:95)."""
        self._topk.save(
            int(step),
            args=ocp.args.StandardSave(state),
            metrics={"checkpoint_on": float(checkpoint_on)},
        )

    def maybe_save_step(self, step: int, state) -> bool:
        if step > 0 and step % self.save_count == 0:
            self._steps.save(int(step), args=ocp.args.StandardSave(state))
            logger.info(f"Saved N-step checkpoint at {step}")
            return True
        return False

    def save_named(self, name: str, state) -> str:
        path = osp.join(self.root, "named", name)
        if osp.exists(path):
            import shutil

            shutil.rmtree(path)
        self._named.save(path, state)
        self._named.wait_until_finished()
        return path

    def save_final(self, state, step: int) -> str:
        return self.save_named(f"FINAL_step={int(step)}", state)

    def wait(self) -> None:
        self._topk.wait_until_finished()
        self._steps.wait_until_finished()
        self._named.wait_until_finished()


def save_checkpoint(path: str, state) -> None:
    """Bare single-checkpoint save (reference cpvton/__init__.py:6-23 parity)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(path), state)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, abstract_state: Optional[Any] = None):
    """Restore a checkpoint saved by any writer above. ``abstract_state`` (a
    pytree of ShapeDtypeStructs or a template state) restores typed arrays;
    None restores raw arrays."""
    path = osp.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if abstract_state is None:
        return ckptr.restore(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, abstract_state)
    return ckptr.restore(path, abstract)


def load_hparams(checkpoint_path: str) -> Optional[Dict]:
    """Walk up from a checkpoint path to find the stored hparams.json."""
    path = osp.abspath(checkpoint_path)
    for _ in range(5):
        candidate = osp.join(path, "hparams.json")
        if osp.exists(candidate):
            with open(candidate) as f:
                return json.load(f)
        path = osp.dirname(path)
    return None
