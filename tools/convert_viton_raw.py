"""Resize raw VITON data to the training resolution (the capability of the
reference's MATLAB converter convert_data.m:1-30: cloth/cloth-mask/image/
image-parse folders -> 256x192, pose keypoints rescaled).

Usage:
  python tools/convert_viton_raw.py --src viton_raw/train --dst data/train \
      --height 256 --width 192
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
from glob import glob

import numpy as np
from PIL import Image


def _resize_folder(src: str, dst: str, size, resample, suffix="*"):
    os.makedirs(dst, exist_ok=True)
    n = 0
    for path in sorted(glob(osp.join(src, suffix))):
        img = Image.open(path)
        img = img.resize(size, resample)
        img.save(osp.join(dst, osp.basename(path)))
        n += 1
    return n


def _rescale_pose_folder(src: str, dst: str, sx: float, sy: float):
    os.makedirs(dst, exist_ok=True)
    n = 0
    for path in sorted(glob(osp.join(src, "*.json"))):
        with open(path) as f:
            label = json.load(f)
        for person in label.get("people", []):
            kp = np.array(person.get("pose_keypoints", []), np.float64).reshape(-1, 3)
            kp[:, 0] *= sx
            kp[:, 1] *= sy
            person["pose_keypoints"] = kp.reshape(-1).tolist()
        with open(osp.join(dst, osp.basename(path)), "w") as f:
            json.dump(label, f)
        n += 1
    return n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True, help="raw VITON split folder")
    parser.add_argument("--dst", required=True)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=192)
    args = parser.parse_args()
    size = (args.width, args.height)

    # probe source resolution for keypoint rescaling
    sample = sorted(glob(osp.join(args.src, "image", "*")))
    sx = sy = 1.0
    if sample:
        with Image.open(sample[0]) as im:
            sx, sy = args.width / im.width, args.height / im.height

    for folder, resample in (
        ("cloth", Image.BILINEAR),
        ("cloth-mask", Image.NEAREST),
        ("image", Image.BILINEAR),
        ("image-parse", Image.NEAREST),  # label maps must not interpolate
    ):
        src = osp.join(args.src, folder)
        if osp.isdir(src):
            n = _resize_folder(src, osp.join(args.dst, folder), size, resample)
            print(f"{folder}: {n} files -> {size}")
    pose_src = osp.join(args.src, "pose")
    if osp.isdir(pose_src):
        n = _rescale_pose_folder(pose_src, osp.join(args.dst, "pose"), sx, sy)
        print(f"pose: {n} keypoint files rescaled (x{sx:.3f}, x{sy:.3f})")


if __name__ == "__main__":
    main()
