"""On-device image preprocessing ops (the TryonDataset feature factory, jitted).

The reference computes these per-sample with PIL/torchvision on CPU dataloader
workers (datasets/tryon_dataset.py) — flagged there as a training bottleneck
(tryon_dataset.py:391). Here each op is a vectorized jnp function over whole
batches so the feature assembly runs inside the jitted train step on TPU.

All ops consume raw host-decoded arrays (uint8 images / label maps, float
keypoints) and produce the reference's normalized [-1, 1] feature tensors in
NHWC layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# LIP 20-class human-parse labels (reference: datasets/tryon_dataset.py:21-41).
LIP_BACKGROUND = 0
LIP_HAT = 1
LIP_HAIR = 2
LIP_GLOVE = 3
LIP_SUNGLASSES = 4
LIP_UPPER_CLOTHES = 5
LIP_DRESS = 6
LIP_COAT = 7
LIP_SOCKS = 8
LIP_PANTS = 9
LIP_JUMPSUITS = 10
LIP_SCARF = 11
LIP_SKIRT = 12
LIP_FACE = 13
LIP_LEFT_ARM = 14
LIP_RIGHT_ARM = 15
LIP_LEFT_LEG = 16
LIP_RIGHT_LEG = 17
LIP_LEFT_SHOE = 18
LIP_RIGHT_SHOE = 19

# Labels contributing to the "head" crop (reference: tryon_dataset.py:323-344 —
# despite the name it includes socks/pants/scarf/skirt/legs/shoes).
HEAD_LABELS = (
    LIP_HAT, LIP_HAIR, LIP_SUNGLASSES, LIP_FACE, LIP_SOCKS, LIP_PANTS,
    LIP_SCARF, LIP_SKIRT, LIP_LEFT_LEG, LIP_RIGHT_LEG, LIP_LEFT_SHOE,
    LIP_RIGHT_SHOE,
)
# Labels forming the worn-cloth segment (reference: datasets/util.py:6-22).
CLOTH_LABELS = (LIP_UPPER_CLOTHES, LIP_DRESS, LIP_COAT)

__all__ = [
    "normalize_rgb", "denormalize_to_uint8", "cloth_mask_from_image",
    "body_silhouette", "head_crop", "segment_cloths_from_image",
    "pose_keypoint_heatmaps", "normalize_flow", "channel_norm",
]


def normalize_rgb(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float [-1,1] (ToTensor + Normalize(0.5, 0.5))."""
    return img_u8.astype(jnp.float32) / 127.5 - 1.0


def denormalize_to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8, matching visualization.py:74-76 save path."""
    return jnp.round(jnp.clip((img + 1.0) * 0.5 * 255.0, 0, 255)).astype(jnp.uint8)


def cloth_mask_from_image(
    cloth_u8: jnp.ndarray, threshold: int = 240, reference_quirk: bool = False
) -> jnp.ndarray:
    """Threshold-derived single-channel cloth mask in [0, 1].

    Intended semantics (flag help at tryon_dataset.py:75-81): white background
    pixels (>= threshold on the red channel) are 0, the rest 1.

    ``reference_quirk=True`` reproduces the literal reference computation
    (tryon_dataset.py:169-177), which compares the *normalized* [-1,1] tensor
    against the 0-255 threshold and therefore always yields an all-ones mask.

    Args:
      cloth_u8: (..., H, W, 3) uint8 cloth image.
    Returns:
      (..., H, W, 1) float mask.
    """
    if reference_quirk:
        normed = normalize_rgb(cloth_u8[..., :1])
        return jnp.where(normed >= threshold, 0.0, 1.0)
    return jnp.where(
        cloth_u8[..., :1].astype(jnp.float32) >= threshold, 0.0, 1.0
    )


@functools.partial(jax.jit, static_argnames=("fine_height", "fine_width"))
def body_silhouette(
    parse: jnp.ndarray, fine_height: int = 256, fine_width: int = 192
) -> jnp.ndarray:
    """Blurry body silhouette: 16x bilinear down, then back up, in [-1, 1].

    Reference: tryon_dataset.py:346-367 — (parse > 0) * 255 as uint8, PIL
    BILINEAR resize to (W/16, H/16) then to (W, H), then normalized. The PIL
    downscale is antialiased, which ``jax.image.resize(..., antialias=True)``
    reproduces.

    Args:
      parse: (..., H, W) integer label map.
    Returns:
      (..., H, W, 1) float in [-1, 1].
    """
    shape = parse.shape
    small = (fine_height // 16, fine_width // 16)
    sil = (parse > 0).astype(jnp.float32) * 255.0
    sil = jnp.round(sil)  # uint8 quantization parity (no-op for 0/255)
    down = jax.image.resize(
        sil, shape[:-2] + small, method="linear", antialias=True
    )
    # PIL stores the intermediate as uint8; round-trip that quantization.
    down = jnp.clip(jnp.round(down), 0.0, 255.0)
    up = jax.image.resize(
        down, shape, method="linear", antialias=True
    )
    up = jnp.clip(jnp.round(up), 0.0, 255.0)
    return (up / 127.5 - 1.0)[..., None]


def head_crop(image: jnp.ndarray, parse: jnp.ndarray) -> jnp.ndarray:
    """Isolated head(+extremities): im * mask - (1 - mask), in [-1, 1].

    Reference: tryon_dataset.py:323-344; background fills with -1.

    Args:
      image: (..., H, W, 3) normalized [-1, 1] person image.
      parse: (..., H, W) integer label map.
    """
    mask = jnp.zeros(parse.shape, jnp.float32)
    for label in HEAD_LABELS:
        mask = mask + (parse == label).astype(jnp.float32)
    mask = mask[..., None]
    return image * mask - (1.0 - mask)


def segment_cloths_from_image(image: jnp.ndarray, parse: jnp.ndarray) -> jnp.ndarray:
    """Worn-cloth pixels cropped from the person image, background filled with +1.

    Reference: datasets/util.py:6-22.
    """
    mask = jnp.zeros(parse.shape, jnp.float32)
    for label in CLOTH_LABELS:
        mask = mask + (parse == label).astype(jnp.float32)
    mask = mask[..., None]
    return image * mask + (1.0 - mask)


@functools.partial(
    jax.jit, static_argnames=("fine_height", "fine_width", "radius")
)
def pose_keypoint_heatmaps(
    keypoints: jnp.ndarray,
    fine_height: int = 256,
    fine_width: int = 192,
    radius: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """COCO keypoints -> 18-channel square-stamp heatmaps + 1-channel visualization.

    The reference rasterizes each joint as a filled (2r+1)-pixel square with PIL
    ImageDraw (tryon_dataset.py:369-448), noted there as "very expensive,
    significantly slows down training". Here the stamps are a vectorized
    box-containment test, one fused elementwise kernel on TPU. Values are -1
    (background) / +1 (stamp), like the normalized PIL rendering. Joints with
    x <= 1 or y <= 1 are skipped (same validity rule, tryon_dataset.py:424).

    (The reference has an ordering quirk — it snapshots each per-joint map into
    the tensor *before* drawing the rectangle (tryon_dataset.py:404-421), so its
    pose_map channels end up constant; the stamped visualization is what feeds
    `im_cocopose`. We implement the intended stamped heatmaps for both.)

    Args:
      keypoints: (..., K, 3) array of (x, y, confidence) in pixel coords; K=18.
    Returns:
      pose_map: (..., H, W, K) in {-1, +1};
      im_cocopose: (..., H, W, 1) union of the stamps, in {-1, +1}.
    """
    x = keypoints[..., 0]  # (..., K)
    y = keypoints[..., 1]
    valid = (x > 1) & (y > 1)
    px = jax.lax.broadcasted_iota(jnp.float32, (fine_height, fine_width), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (fine_height, fine_width), 0)
    # PIL draws the rectangle (x-r, y-r, x+r, y+r) over integer pixels p with
    # floor(x-r) <= p <= floor(x+r) (coordinates truncated via int()).
    x0 = jnp.floor(x - radius)
    x1 = jnp.floor(x + radius)
    y0 = jnp.floor(y - radius)
    y1 = jnp.floor(y + radius)
    bc = x.shape  # (..., K)
    px = px.reshape((1,) * len(bc) + (fine_height, fine_width))
    py = py.reshape((1,) * len(bc) + (fine_height, fine_width))
    inside = (
        (px >= x0[..., None, None])
        & (px <= x1[..., None, None])
        & (py >= y0[..., None, None])
        & (py <= y1[..., None, None])
        & valid[..., None, None]
    )  # (..., K, H, W)
    stamps = jnp.where(inside, 1.0, -1.0)
    pose_map = jnp.moveaxis(stamps, -3, -1)  # (..., H, W, K)
    vis = jnp.where(jnp.any(inside, axis=-3), 1.0, -1.0)[..., None]
    return pose_map, vis


def normalize_flow(flow: jnp.ndarray) -> jnp.ndarray:
    """Affine flow normalization (x - 0.5) / 0.5 (reference tryon_dataset.py:121,289)."""
    return flow * 2.0 - 1.0


def channel_norm(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Per-pixel L2 norm across channels (flownet2 ChannelNorm, SURVEY §2.9)."""
    return jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + eps)
