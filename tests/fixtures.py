"""Hermetic synthetic dataset fixtures (SURVEY §4: 'make them hermetic
(synthetic fixture folders)'). Builds miniature VITON / VVT / MPV trees with
procedurally generated images, parse maps, keypoints, densepose, and .flo flow.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np
from PIL import Image

from shineon_tpu.datasets.flow_utils import write_flow

H, W = 256, 192


def _box(h, w, y0, y1, x0, x1):
    """Scale a 256x192-reference box to an (h, w) canvas."""
    return (
        slice(y0 * h // H, y1 * h // H),
        slice(x0 * w // W, x1 * w // W),
    )


def _person_image(rng, torso_color=None, h=H, w=W) -> np.ndarray:
    img = np.full((h, w, 3), 230, np.uint8)
    color = rng.randint(40, 200, 3) if torso_color is None else torso_color
    img[_box(h, w, 40, 220, 60, 130)] = color  # torso blob
    img[_box(h, w, 20, 48, 80, 110)] = (200, 170, 150)  # head
    return img


def _parse_map(rng, h=H, w=W) -> np.ndarray:
    parse = np.zeros((h, w), np.uint8)
    parse[_box(h, w, 40, 220, 60, 130)] = 5  # upper clothes
    parse[_box(h, w, 20, 48, 80, 110)] = 13  # face
    parse[_box(h, w, 48, 60, 85, 105)] = 2  # hair-ish
    parse[_box(h, w, 180, 220, 60, 130)] = 9  # pants
    return parse


def _cloth_image(rng, color=None, h=H, w=W) -> np.ndarray:
    img = np.full((h, w, 3), 255, np.uint8)  # white background
    img[_box(h, w, 60, 200, 50, 140)] = (
        rng.randint(30, 220, 3) if color is None else color
    )
    return img


def _keypoints(rng, h=H, w=W) -> dict:
    kp = []
    margin_x, margin_y = max(w // 20, 2), max(h // 26, 2)
    for _ in range(18):
        kp.extend([
            float(rng.randint(margin_x, w - margin_x)),
            float(rng.randint(margin_y, h - margin_y)), 1.0,
        ])
    return {"people": [{"pose_keypoints": kp}]}


def make_viton_fixture(root: str, n: int = 4, datamode: str = "train", seed: int = 0):
    """VITON tree: {root}/{datamode}/{cloth,warp-cloth,image,image-parse,pose}
    + {root}/{datamode}_pairs.txt ('person.jpg cloth.jpg' per line)."""
    rng = np.random.RandomState(seed)
    base = osp.join(root, datamode)
    for sub in ("cloth", "warp-cloth", "image", "image-parse", "pose"):
        os.makedirs(osp.join(base, sub), exist_ok=True)
    pairs = []
    for i in range(n):
        im_name, c_name = f"person_{i}.jpg", f"cloth_{i}.jpg"
        Image.fromarray(_person_image(rng)).save(osp.join(base, "image", im_name))
        cloth = _cloth_image(rng)
        Image.fromarray(cloth).save(osp.join(base, "cloth", c_name))
        Image.fromarray(cloth).save(osp.join(base, "warp-cloth", c_name))
        Image.fromarray(_parse_map(rng)).save(
            osp.join(base, "image-parse", im_name.replace(".jpg", ".png"))
        )
        with open(
            osp.join(base, "pose", im_name.replace(".jpg", "_keypoints.json")), "w"
        ) as f:
            json.dump(_keypoints(rng), f)
        pairs.append(f"{im_name} {c_name}")
    list_name = f"{datamode}_pairs.txt"
    with open(osp.join(root, list_name), "w") as f:
        f.write("\n".join(pairs) + "\n")
    return list_name


def make_vvt_fixture(
    root: str, n_videos: int = 2, frames: int = 6, datamode: str = "train",
    seed: int = 0, with_flow: bool = True, with_densepose: bool = True,
    height: int = H, width: int = W,
):
    """VVT tree (vvt_dataset.py layout): video frame folders + parsing/
    keypoint/densepose/optical_flow annotation folders + clothes_person."""
    rng = np.random.RandomState(seed)
    for v in range(n_videos):
        vid = f"vid{v}-g0{v}"
        fdir = osp.join(root, datamode, f"{datamode}_frames", vid)
        pdir = osp.join(root, datamode, f"{datamode}_frames_parsing", vid)
        kdir = osp.join(root, datamode, f"{datamode}_frames_keypoint", vid)
        ddir = osp.join(root, datamode, "densepose", vid)
        odir = osp.join(root, datamode, "optical_flow", vid)
        cdir = osp.join(root, "clothes_person", "img", vid.upper().split("-")[0])
        for d in (fdir, pdir, kdir, ddir, odir, cdir):
            os.makedirs(d, exist_ok=True)
        up_vid, up_g = vid.upper().split("-")
        # one garment color per video, worn by the person in every frame —
        # the reconstruction task (cloth == what the person wears) must be
        # satisfiable for overfit/quality tests to converge
        cloth_color = rng.randint(30, 220, 3)
        h, w = height, width
        Image.fromarray(_cloth_image(rng, cloth_color, h, w)).save(
            osp.join(cdir, f"{up_vid}-{up_g}=cloth_front.jpg")
        )
        # per-frame GMM-warped cloths for the TOM stage
        wdir = osp.join(root, datamode, "warp-cloth", up_vid)
        os.makedirs(wdir, exist_ok=True)
        for t in range(frames):
            Image.fromarray(_cloth_image(rng, cloth_color, h, w)).save(
                osp.join(wdir, f"{up_vid}-{up_g}=cloth_front_frame_{t:03d}.png")
            )
        for t in range(frames):
            name = f"frame_{t:03d}"
            Image.fromarray(_person_image(rng, cloth_color, h, w)).save(
                osp.join(fdir, f"{name}.png")
            )
            Image.fromarray(_parse_map(rng, h, w)).save(
                osp.join(pdir, f"{name}_label.png")
            )
            with open(osp.join(kdir, f"{name}_keypoints.json"), "w") as f:
                json.dump(_keypoints(rng, h, w), f)
            if with_densepose:
                Image.fromarray(
                    rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
                ).save(osp.join(ddir, f"{name}_IUV.png"))
            if with_flow:
                write_flow(
                    osp.join(odir, f"{name}.flo"),
                    rng.randn(h, w, 2).astype(np.float32),
                )


def make_mpv_fixture(root: str, n: int = 2, seed: int = 0):
    """MPV tree: all/ all_parsing/ all_person_clothes_keypoints/ + list txt."""
    rng = np.random.RandomState(seed)
    for sub in ("all", "warp-cloth", "all_parsing", "all_person_clothes_keypoints"):
        os.makedirs(osp.join(root, sub), exist_ok=True)
    lines = []
    for i in range(n):
        p1, p2, cloth = f"pA_{i}.jpg", f"pB_{i}.jpg", f"c_{i}.jpg"
        for p in (p1, p2):
            Image.fromarray(_person_image(rng)).save(osp.join(root, "all", p))
            Image.fromarray(_parse_map(rng)).save(
                osp.join(root, "all_parsing", p.replace(".jpg", ".png"))
            )
            with open(
                osp.join(
                    root, "all_person_clothes_keypoints",
                    p.replace(".jpg", "_keypoints.json"),
                ), "w",
            ) as f:
                json.dump(_keypoints(rng), f)
        c_img = _cloth_image(rng)
        Image.fromarray(c_img).save(osp.join(root, "all", cloth))
        Image.fromarray(c_img).save(osp.join(root, "warp-cloth", cloth))
        lines.append(f"{p1} {p2} {cloth} 0")
    with open(osp.join(root, "all_poseA_poseB_clothes_0607.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
