"""TPU compute ops: warping, correlation, TPS, on-device preprocessing."""

from shineon_tpu.ops.correlation import cost_volume, global_correlation  # noqa: F401
from shineon_tpu.ops.grid_sample import grid_sample, resample2d  # noqa: F401
from shineon_tpu.ops.tps import TpsGridGen  # noqa: F401
from shineon_tpu.ops import image_ops  # noqa: F401


def feature_l2_norm(feature, eps: float = 1e-6):
    """Channelwise L2 normalization (reference cpvton/warp.py:39-50).

    NHWC: normalizes over the trailing channel axis with the reference's
    sqrt(sum + eps) placement.
    """
    import jax.numpy as jnp

    norm = jnp.power(
        jnp.sum(jnp.power(feature, 2), axis=-1, keepdims=True) + eps, 0.5
    )
    return feature / norm
