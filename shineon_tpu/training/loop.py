"""Explicit train/test loop — the Lightning Trainer capability, TPU-native.

Reference behaviors reproduced (train.py:52-141, SURVEY §2.1/§5.3/§5.4):
  * fit: epoch loop of jitted, donated train steps over the data mesh;
    validation every --val_check_interval (int = batches, float = fraction of
    an epoch); visualization every --display_count steps; checkpoint top-5 on
    the val loss, every --save_count steps, FINAL at the end
  * crash resilience: SIGINT and any exception save
    interrupted_by_<Name> checkpoints before exiting
  * --fast_dev_run: one train batch + one val batch, val every step
  * --limit_train_batches/--limit_val_batches datacaps
  * profiler: per-step wall timing summary (the reference passes
    profiler=True to Lightning); optional jax.profiler trace via
    --trace_dir-style env SHINEON_TRACE_DIR
"""

from __future__ import annotations

import os
import os.path as osp
import signal
import time
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from shineon_tpu.datasets.loader import DataLoader
from shineon_tpu.parallel.mesh import make_mesh, shard_batch
from shineon_tpu.training.checkpointing import CheckpointKeeper
from shineon_tpu.utils import str2num
from shineon_tpu.utils.log import get_logger

logger = get_logger()


class Trainer:
    def __init__(self, opt, mesh=None):
        self.opt = opt
        if mesh is None:
            # use the largest device count that divides the per-process batch
            # (the batch axis must shard evenly over the data mesh)
            import jax as _jax

            devices = _jax.devices()
            # Honor an explicitly-passed --gpu_ids as a device selector, like
            # the reference restricts training to the listed GPUs
            # (reference train.py:76-85). The default value keeps the
            # TPU-native behavior of using every local device.
            gpu_ids = getattr(opt, "gpu_ids", None)
            if getattr(opt, "gpu_ids_explicit", False) and gpu_ids:
                missing = [i for i in gpu_ids if i >= len(devices)]
                if missing:
                    logger.warning(
                        f"--gpu_ids {gpu_ids} requests device indices beyond "
                        f"the {len(devices)} available; ignoring {missing}."
                    )
                selected = [devices[i] for i in gpu_ids if i < len(devices)]
                if selected:
                    devices = selected
            usable = len(devices)
            batch = getattr(opt, "batch_size", 1)
            while usable > 1 and batch % usable != 0:
                usable -= 1
            if usable != len(devices):
                logger.warning(
                    f"batch_size {batch} not divisible by {len(devices)} "
                    f"devices; using a {usable}-device data mesh."
                )
            mesh = make_mesh(devices[:usable])
        self.mesh = mesh
        self.experiment_dir = osp.join(opt.experiments_dir, opt.name)
        os.makedirs(self.experiment_dir, exist_ok=True)
        self.board = self._make_board()
        self.keeper: Optional[CheckpointKeeper] = None
        self.global_step = 0
        self._step_times = []

    def _make_board(self):
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir=osp.join(self.experiment_dir, "tb"))

    # ------------------------------------------------------------------ fit

    def fit(self, model, resume_state=None):
        opt = self.opt
        model.setup("fit")
        train_loader: DataLoader = model.train_dataloader()
        val_loader: DataLoader = model.val_dataloader()
        steps_per_epoch = max(len(train_loader), 1)

        state = model.init_state(
            jax.random.PRNGKey(420), steps_per_epoch  # seed parity: train.py:29
        )
        if resume_state is not None:
            state = resume_state
            self.global_step = int(jax.device_get(state.step))
        train_step = model.make_train_step()
        val_step = model.make_val_step()
        visual_fn = model.make_visual_step()

        self.keeper = CheckpointKeeper(
            osp.join(self.experiment_dir, "checkpoints"), save_count=opt.save_count
        )
        self.keeper.write_hparams(opt)
        self.board.add_text("hparams", _format_hparams(opt))

        # val cadence (train_options.py:19-27; 0 handled as every step)
        vci = str2num(opt.val_check_interval)
        if isinstance(vci, float):
            val_every = max(int(vci * steps_per_epoch), 1)
        else:
            val_every = max(int(vci), 1)
        max_epochs = opt.keep_epochs + opt.decay_epochs
        if opt.fast_dev_run:
            max_epochs, val_every = 1, 1

        state = self._install_interrupt_handler(lambda: state)

        trace_dir = os.environ.get("SHINEON_TRACE_DIR")
        try:
            for epoch in range(max_epochs):
                train_loader.set_epoch(epoch)
                for batch in train_loader:
                    device_batch = shard_batch(batch, self.mesh)
                    t0 = time.perf_counter()
                    if trace_dir and self.global_step == 8:
                        jax.profiler.start_trace(trace_dir)
                    state, metrics = train_step(state, device_batch)
                    if self.global_step % opt.display_count == 0:
                        # sync point only when we log
                        metrics = jax.device_get(metrics)
                        self._log_scalars(metrics, prefix="")
                        model.visualize_from(
                            visual_fn, state, device_batch, batch, self.board,
                            self.global_step, tag="train",
                        )
                        jax.block_until_ready(state.step)
                    self._step_times.append(time.perf_counter() - t0)
                    if trace_dir and self.global_step == 12:
                        jax.profiler.stop_trace()
                    self.global_step += 1

                    if self.global_step % val_every == 0:
                        self._run_validation(
                            model, val_step, visual_fn, state, val_loader
                        )
                    self.keeper.maybe_save_step(self.global_step, state)
                    if opt.fast_dev_run:
                        break
                if opt.fast_dev_run:
                    break
            self.keeper.save_final(state, self.global_step)
            self._report_profile()
        except KeyboardInterrupt:
            self._save_interrupt(state, "Ctrl-C")
            raise
        except Exception as exc:  # parity: train.py:61-66
            logger.warning(f"Caught a {type(exc)}!")
            self._save_interrupt(state, exc.__class__.__name__)
            raise
        finally:
            self.board.flush()
            if self.keeper is not None:
                self.keeper.wait()
        return state

    def _run_validation(self, model, val_step, visual_fn, state, val_loader):
        opt = self.opt
        losses = defaultdict(list)
        # --limit_val_batches is already applied by the loader itself
        # (DataLoader(limit_batches=...), base_model.py::val_dataloader), so
        # len(val_loader) is the capped count — do NOT re-apply it here.
        nb = 1 if opt.fast_dev_run else len(val_loader)
        last_batches = (None, None)
        for i, batch in enumerate(val_loader):
            if i >= nb:
                break
            device_batch = shard_batch(batch, self.mesh)
            metrics = jax.device_get(val_step(state, device_batch))
            for k, v in metrics.items():
                losses[k].append(float(v))
            last_batches = (device_batch, batch)
        means = {k: float(np.mean(v)) for k, v in losses.items()}
        self._log_scalars(means, prefix="val_")
        checkpoint_on = means.get("checkpoint_on", means.get("loss", 0.0))
        if self.keeper is not None:
            self.keeper.save_validation(self.global_step, state, checkpoint_on)
        # visualize the last val batch (base_model.py:155-163)
        if last_batches[0] is not None:
            model.visualize_from(
                visual_fn, state, last_batches[0], last_batches[1], self.board,
                self.global_step, tag="validation",
            )

    # ----------------------------------------------------------------- test

    def test(self, model, state):
        model.setup("test")
        test_loader = model.test_dataloader()
        batch_size = getattr(self.opt, "batch_size", 1)
        for batch in test_loader:
            # The test loader keeps the ragged final batch (drop_last=False,
            # base_model.py::test_dataloader). Pad the device arrays up to the
            # static batch size so the mesh sharding and the jitted test fn
            # see one shape; host-side names stay unpadded, so the per-name
            # writes in test_step never touch the pad rows.
            device_batch = shard_batch(
                _pad_ragged_batch(batch, batch_size), self.mesh
            )
            model.test_step(state, device_batch, batch)
        logger.info("test pass complete")

    # -------------------------------------------------------------- helpers

    def _log_scalars(self, metrics: dict, prefix: str = ""):
        for key, value in metrics.items():
            if key == "checkpoint_on":
                continue
            self.board.add_scalar(f"{prefix}{key}", float(value), self.global_step)

    def _install_interrupt_handler(self, get_state):
        def handler(signum, frame):
            try:
                self._save_interrupt(get_state(), "Ctrl-C")
            finally:
                raise SystemExit(1)

        try:
            signal.signal(signal.SIGINT, handler)
        except ValueError:
            pass  # not the main thread (tests)
        return get_state()

    def _save_interrupt(self, state, name: str):
        if self.keeper is None:
            logger.warning(
                "Nothing to checkpoint: the keeper was never created "
                "(training has not started)."
            )
            return
        path = self.keeper.save_named(f"interrupted_by_{name}", state)
        logger.warning(
            f"Training stopped prematurely. Saved checkpoint to: {path}"
        )

    def _report_profile(self):
        """Per-step timing summary (stands in for Lightning profiler=True)."""
        if len(self._step_times) <= 2:
            return
        times = np.asarray(self._step_times[2:])  # drop compile steps
        logger.info(
            "profiler | steps=%d mean=%.1fms p50=%.1fms p95=%.1fms"
            % (
                len(times), 1e3 * times.mean(),
                1e3 * np.percentile(times, 50), 1e3 * np.percentile(times, 95),
            )
        )


def _pad_ragged_batch(batch: dict, batch_size: int) -> dict:
    """Pad numpy leaves along axis 0 to ``batch_size`` by repeating the last
    sample. Non-array leaves (name lists) are returned as-is."""
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim >= 1:
            short = batch_size - value.shape[0]
            if short > 0:
                pad = np.repeat(value[-1:], short, axis=0)
                value = np.concatenate([value, pad], axis=0)
        out[key] = value
    return out


def _format_hparams(opt) -> str:
    lines = [f"{k}: {v}" for k, v in sorted(vars(opt).items())]
    return "\n".join(lines)
