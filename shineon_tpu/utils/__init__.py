"""Small shared helpers (reference: util/__init__.py:8-66)."""

from __future__ import annotations

import importlib
from typing import Dict, Iterable, List, Sequence, Tuple, Union

import jax.numpy as jnp


def find_class_in_module(target_cls_name: str, module: str):
    """Case/underscore-insensitive class lookup inside a module.

    Reference: util/__init__.py:8-24.
    """
    target_cls_name = target_cls_name.replace("_", "").lower()
    clslib = importlib.import_module(module)
    for name, clsobj in clslib.__dict__.items():
        if name.lower() == target_cls_name:
            return clsobj
    raise ImportError(
        f"module {module} defines no class whose lowercased, "
        f"underscore-free name equals {target_cls_name!r}"
    )


def str2num(s: Union[str, int, float]) -> Union[int, float]:
    """Parse a CLI string as int if possible, else float (reference: util/__init__.py:27-31)."""
    if isinstance(s, (int, float)):
        return s
    try:
        return int(s)
    except ValueError:
        return float(s)


def get_prev_data_zero_bounded(data: Union[List, Tuple], end_idx: int, num_frames: int):
    """Window of the `num_frames` items ending before `end_idx`, duping item 0 at the
    left boundary (reference: util/__init__.py:52-60)."""
    start_idx = end_idx - num_frames + 1
    prev_n_data = data[max(0, start_idx): end_idx]
    if not isinstance(prev_n_data, (list, tuple)):
        prev_n_data = [prev_n_data]
    if start_idx < 0:
        prev_n_data = [data[0] for _ in range(abs(start_idx))] + list(prev_n_data)
    return prev_n_data


def get_and_cat_inputs(batch: Dict[str, jnp.ndarray], names: Iterable[str]) -> jnp.ndarray:
    """Channel-concatenate named entries of a batch dict.

    NHWC version of reference util/__init__.py:64-66 (which cats on dim 1 of NCHW);
    here the channel axis is the trailing one.
    """
    return jnp.concatenate([batch[name] for name in names], axis=-1)
