"""Dataset download helper (reference: data_download.py:33-54).

The reference fetches the resized VITON tarball from a Google Drive link. This
environment has no egress, so the script documents the expected layouts and
verifies a local copy instead of downloading.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

EXPECTED = {
    "viton": ["{root}/train/image", "{root}/train/cloth", "{root}/train/image-parse",
              "{root}/train/pose", "{root}/train_pairs.txt"],
    "vvt": ["{root}/train/train_frames", "{root}/train/train_frames_parsing",
            "{root}/train/train_frames_keypoint", "{root}/clothes_person/img"],
    "mpv": ["{root}/all", "{root}/all_parsing", "{root}/all_poseA_poseB_clothes_0607.txt"],
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", choices=sorted(EXPECTED), default="viton")
    parser.add_argument("--root", required=True, help="local dataset root to verify")
    args = parser.parse_args()

    missing = [
        p.format(root=args.root)
        for p in EXPECTED[args.dataset]
        if not osp.exists(p.format(root=args.root))
    ]
    if missing:
        print(f"{args.dataset} layout INCOMPLETE under {args.root}; missing:")
        for m in missing:
            print("  -", m)
        print(
            "\nObtain the dataset from its original distribution (VITON resize "
            "tarball / FW-GAN VVT / MPV) and extract it to the paths above."
        )
        sys.exit(1)
    print(f"{args.dataset} layout OK under {args.root}")


if __name__ == "__main__":
    main()
