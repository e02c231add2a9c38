"""On-device (jitted) feature factory: raw host arrays -> model feature dict.

The device half of the reference's TryonDataset.__getitem__
(datasets/tryon_dataset.py:203-537): every PIL/torchvision transform becomes a
vectorized jnp op over the whole (possibly frame-stacked) batch, fusing into
the train step under jit. Keys/shapes mirror the reference's batch dict with
NHWC layout and frames as a leading per-sample axis.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from shineon_tpu.datasets import channels
from shineon_tpu.ops import image_ops


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Static (hashable) preprocessing plan derived from the options."""

    fine_height: int = 256
    fine_width: int = 192
    radius: int = 5
    cloth_mask_threshold: int = 240
    person_inputs: Tuple[str, ...] = ("agnostic", "cocopose")
    cloth_inputs: Tuple[str, ...] = ("cloth",)
    visualize_flow: bool = False
    # reproduce the reference's literal (all-ones) cloth mask computation
    cloth_mask_reference_quirk: bool = False

    @classmethod
    def from_opt(cls, opt) -> "PreprocessConfig":
        return cls(
            fine_height=opt.fine_height,
            fine_width=opt.fine_width,
            radius=opt.radius,
            cloth_mask_threshold=opt.cloth_mask_threshold,
            person_inputs=tuple(opt.person_inputs),
            cloth_inputs=tuple(opt.cloth_inputs),
            visualize_flow=bool(getattr(opt, "visualize_flow", False)),
        )


def preprocess_batch(raw: Dict[str, jnp.ndarray], config: PreprocessConfig):
    """Raw uint8/float batch -> normalized feature dict.

    Works with any leading dims (B,...) or (B, N_frames, ...): all ops are
    written over trailing (H, W, C)/(K, 3) axes.

    Produced keys (as applicable): cloth, cloth_mask, image, prev_image,
    silhouette, im_head, im_cloth, agnostic, cocopose, im_cocopose, densepose,
    flow, flow_image, grid_vis.
    """
    cfg = config
    out: Dict[str, jnp.ndarray] = {}

    image = image_ops.normalize_rgb(raw["image_u8"])
    out["image"] = image
    prev = image_ops.normalize_rgb(raw["prev_image_u8"])
    # missing prev frame -> zeros in normalized space (tryon_dataset.py:262-266)
    pv = raw["prev_image_valid"]
    out["prev_image"] = prev * pv[..., None, None, None]

    cloth = image_ops.normalize_rgb(raw["cloth_u8"])
    out["cloth"] = cloth
    out["cloth_mask"] = image_ops.cloth_mask_from_image(
        raw["cloth_u8"], cfg.cloth_mask_threshold,
        reference_quirk=cfg.cloth_mask_reference_quirk,
    )

    parse = raw["parse_u8"]
    silhouette = image_ops.body_silhouette(parse, cfg.fine_height, cfg.fine_width)
    im_head = image_ops.head_crop(image, parse)
    im_cloth = image_ops.segment_cloths_from_image(image, parse)
    out["silhouette"] = silhouette
    out["im_head"] = im_head
    out["im_cloth"] = im_cloth

    if "agnostic" in cfg.person_inputs:
        # [silhouette, im_head] channel order (tryon_dataset.py:225-228)
        out["agnostic"] = jnp.concatenate([silhouette, im_head], axis=-1)

    if "cocopose" in cfg.person_inputs:
        pose_map, vis = image_ops.pose_keypoint_heatmaps(
            raw["cocopose_kp"], cfg.fine_height, cfg.fine_width, cfg.radius
        )
        out["cocopose"] = pose_map
        out["im_cocopose"] = vis

    if "densepose" in cfg.person_inputs:
        dp = image_ops.normalize_rgb(raw["densepose_u8"])
        dv = raw["densepose_valid"]
        # missing densepose -> zeros (tryon_dataset.py:309-313)
        out["densepose"] = dp * dv[..., None, None, None]

    if "flow_raw" in raw:
        fv = raw["flow_valid"]
        flow = image_ops.normalize_flow(raw["flow_raw"])
        # missing flow -> zeros WITHOUT normalization (tryon_dataset.py:290-296)
        out["flow"] = flow * fv[..., None, None, None]
        if cfg.visualize_flow and "flow_image_u8" in raw:
            out["flow_image"] = image_ops.normalize_rgb(raw["flow_image_u8"])

    if "grid_vis_u8" in raw:
        out["grid_vis"] = image_ops.normalize_rgb(raw["grid_vis_u8"])

    return out


def raw_sample_spec(config: PreprocessConfig, model: str, flow: bool):
    """Shapes/dtypes of one raw sample (no batch/frames dims) — used to build
    zero-filled feed structures and for loader collation checks."""
    H, W = config.fine_height, config.fine_width
    spec = {
        "image_u8": ((H, W, 3), jnp.uint8),
        "prev_image_u8": ((H, W, 3), jnp.uint8),
        "prev_image_valid": ((), jnp.float32),
        "cloth_u8": ((H, W, 3), jnp.uint8),
        "parse_u8": ((H, W), jnp.uint8),
    }
    if "cocopose" in config.person_inputs:
        spec["cocopose_kp"] = ((channels.COCOPOSE_CHANNELS, 3), jnp.float32)
    if "densepose" in config.person_inputs:
        spec["densepose_u8"] = ((H, W, 3), jnp.uint8)
        spec["densepose_valid"] = ((), jnp.float32)
    if flow or "flow" in config.person_inputs:
        spec["flow_raw"] = ((H, W, 2), jnp.float32)
        spec["flow_valid"] = ((), jnp.float32)
        if config.visualize_flow:
            spec["flow_image_u8"] = ((H, W, 3), jnp.uint8)
    if model == "warp":
        spec["grid_vis_u8"] = ((H, W, 3), jnp.uint8)
    return spec
