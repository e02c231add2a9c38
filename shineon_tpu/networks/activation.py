"""Selectable activations (reference: models/networks/activation.py:4-18 and the
per-module ``_get_activation_fn`` switches)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sine(x):
    """SIREN activation sin(30 x) (reference activation.py:8-10)."""
    return jnp.sin(30.0 * x)


def swish(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu_02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def get_activation_fn(activation: str):
    """relu/gelu/swish/sine switch (reference cpvton/unet.py:201-211)."""
    table = {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "swish": swish,
        "sine": sine,
    }
    if activation not in table:
        raise RuntimeError(
            f"activation must be one of relu/gelu/swish/sine; got {activation!r}"
        )
    return table[activation]


def get_resblock_activation_fn(activation: str):
    """AnySpadeResBlock's switch maps 'relu' to LeakyReLU(0.2)
    (reference sams/spade.py:183-192)."""
    if activation == "relu":
        return leaky_relu_02
    return get_activation_fn(activation)
