"""Video n-frames mixin (reference: datasets/n_frames_interface.py:12-138).

``return_n_frames`` turns one index into an n-frame clip by calling the wrapped
``__getitem__`` per collected index and stacking arrays along a new leading
frames axis (numpy stand-in for the reference's default_collate).
``maybe_combine_frames_and_channels`` folds (B, N, H, W, C) -> (B, H, W, N*C)
for the frame-stacked conv models — channel blocks ordered per frame exactly
like the reference's NCHW view(b, n*c, h, w).
"""

from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from argparse import ArgumentParser
from typing import Dict, List

import numpy as np


class NFramesInterface(ABC):
    @staticmethod
    def modify_commandline_options(parser: ArgumentParser, is_train: bool):
        parser.add_argument(
            "--n_frames_total", type=int, default=1, metavar="N",
            help="Total number of frames to load at once (1 for images).",
        )
        parser.add_argument(
            "--n_frames_now", type=int, default=None, metavar="N",
            help="Progressive video training: train on the last n_frames_now "
            "frames of the clip, masking earlier ones to zero.",
        )
        return parser

    @staticmethod
    def apply_n_frames_now_default_total(opt):
        if getattr(opt, "n_frames_now", None) is None and hasattr(opt, "n_frames_total"):
            opt.n_frames_now = opt.n_frames_total
        return opt

    def __init__(self, opt):
        self.n_frames_total = opt.n_frames_total
        self.n_frames_now = opt.n_frames_now
        assert self.n_frames_total >= 1, "--n_frames_total must be a positive integer"
        assert self.n_frames_now <= self.n_frames_total, (
            f"{opt.n_frames_now} > {opt.n_frames_total}"
        )

    @abstractmethod
    def collect_n_frames_indices(self, index: int) -> List[int]:
        """Indices of the clip ending at `index`."""

    @staticmethod
    def return_n_frames(getitem_func):
        @functools.wraps(getitem_func)
        def wrapper(self, index):
            if not isinstance(self, NFramesInterface):
                raise ValueError(
                    "Can only use this decorator in subclasses of NFramesInterface"
                )
            indices = self.collect_n_frames_indices(index)
            assert len(indices) == self.n_frames_total, (
                f"{len(indices)=} doesn't match {self.n_frames_total=}"
            )
            frames = [getitem_func(self, i) for i in indices]
            return collate_frames(frames)

        return wrapper


def collate_frames(frames: List[Dict]) -> Dict:
    """Stack a list of per-frame sample dicts along a new leading frames axis;
    non-array entries become lists (default_collate semantics)."""
    out: Dict = {}
    for key in frames[0]:
        vals = [f[key] for f in frames]
        if isinstance(vals[0], str):
            out[key] = vals
            continue
        if isinstance(vals[0], np.ndarray) or isinstance(
            vals[0], (np.floating, np.integer, float, int)
        ):
            out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
        else:
            out[key] = vals
    return out


def maybe_combine_frames_and_channels(opt, inputs: Dict, has_batch_dim: bool = True):
    """Fold the frames axis into channels (reference n_frames_interface.py:105-138).

    NHWC: (B, N, H, W, C) -> (B, H, W, N*C); without batch dim:
    (N, H, W, C) -> (H, W, N*C). Non-array sequence entries are unpacked when
    n_frames_total == 1.
    """
    if not hasattr(opt, "n_frames_total"):
        return inputs

    base = 4 if has_batch_dim else 3

    def maybe_combine(value):
        if hasattr(value, "ndim") and hasattr(value, "reshape"):
            if value.ndim == base + 1:
                return fold_frames_into_channels(value)
            return value
        if isinstance(value, (list, tuple)) and not isinstance(value, str):
            if opt.n_frames_total == 1:
                return value[0]
        return value

    return {k: maybe_combine(v) for k, v in inputs.items()}


def fold_frames_into_channels(value):
    """(..., N, H, W, C) -> (..., H, W, N*C), jnp or numpy."""
    import jax.numpy as jnp

    xp = np if isinstance(value, np.ndarray) else jnp
    nd = value.ndim
    value = xp.moveaxis(value, nd - 4, nd - 2)
    return value.reshape(value.shape[:-2] + (-1,))
