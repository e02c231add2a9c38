"""Weight-init schemes with reference parity.

Reference: models/networks/base_network.py:43-78 (SPADE-family init with
selectable type + gain) and models/networks/__init__.py:54-96 (CP-VTON-style
free functions: conv/linear weights ~ N(0, 0.02), BatchNorm scale ~ N(1, 0.02)).

Torch-gain conventions are reproduced on flax's HWIO kernels (fan_in/fan_out
are the same numbers either layout). Conv/linear biases: torch's CP-VTON init
leaves biases at the torch default (uniform +-1/sqrt(fan_in)); we use zeros,
which is the standard JAX choice and identical in expectation — noted here
because it is the one deliberate init deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kernel_init_for", "batchnorm_scale_init", "INIT_TYPES"]

INIT_TYPES = ("normal", "xavier", "xavier_uniform", "kaiming", "orthogonal", "none")


def _fans(shape):
    """fan_in/fan_out for an HWIO conv kernel or (in, out) dense kernel."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def kernel_init_for(init_type: str = "normal", gain: float = 0.02):
    """Return a flax kernel_init reproducing the torch init of the same name.

    normal         -> N(0, gain)                      (init.normal_(..., 0, gain))
    xavier         -> N(0, gain * sqrt(2/(fi+fo)))    (init.xavier_normal_(gain))
    xavier_uniform -> U(+-sqrt(6/(fi+fo)))            (gain=1.0 in the reference)
    kaiming        -> N(0, sqrt(2/fan_in))            (kaiming_normal_, a=0, fan_in)
    orthogonal     -> gain-scaled orthogonal
    none           -> framework default (lecun_normal, torch's reset_parameters
                      analog for "use the default")
    """
    if init_type == "normal":
        def init(key, shape, dtype=jnp.float32):
            return gain * jax.random.normal(key, shape, dtype)
        return init
    if init_type == "xavier":
        def init(key, shape, dtype=jnp.float32):
            fi, fo = _fans(shape)
            std = gain * np.sqrt(2.0 / (fi + fo))
            return std * jax.random.normal(key, shape, dtype)
        return init
    if init_type == "xavier_uniform":
        def init(key, shape, dtype=jnp.float32):
            fi, fo = _fans(shape)
            lim = np.sqrt(6.0 / (fi + fo))
            return jax.random.uniform(key, shape, dtype, -lim, lim)
        return init
    if init_type == "kaiming":
        def init(key, shape, dtype=jnp.float32):
            fi, _ = _fans(shape)
            std = np.sqrt(2.0 / fi)
            return std * jax.random.normal(key, shape, dtype)
        return init
    if init_type == "orthogonal":
        base = jax.nn.initializers.orthogonal(scale=gain)
        return base
    if init_type == "none":
        return jax.nn.initializers.lecun_normal()
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


def batchnorm_scale_init(gain: float = 0.02):
    """BatchNorm scale ~ N(1, gain) (reference base_network.py:46-48)."""
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + gain * jax.random.normal(key, shape, dtype)
    return init
