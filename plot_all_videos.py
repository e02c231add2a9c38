"""Single-experiment SSIM/PSNR sweep over all generated videos -> CSV
(reference: plot_all_videos.py:57-124)."""

from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
import pandas as pd
from PIL import Image

from shineon_tpu.utils.metrics import peak_signal_noise_ratio as psnr
from shineon_tpu.utils.metrics import structural_similarity as ssim


def argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-t", "--ground_truth_dir_path", "--truth", type=str, required=True
    )
    parser.add_argument("-g", "--generated_dir_path", type=str, required=True)
    parser.add_argument("--experiment", type=str, default="1")
    parser.add_argument("--result", type=str, default="metrics_out")
    return parser.parse_args()


def main():
    args = argparser()
    os.makedirs(args.result, exist_ok=True)
    rows = []
    for video_folder in sorted(os.listdir(args.generated_dir_path)):
        vdir = osp.join(args.generated_dir_path, video_folder)
        if not osp.isdir(vdir):
            continue
        for image_file in sorted(os.listdir(vdir)):
            gt_path = osp.join(args.ground_truth_dir_path, video_folder, image_file)
            g_path = osp.join(vdir, image_file)
            if not osp.exists(gt_path):
                continue
            gt = np.asarray(Image.open(gt_path).convert("RGB"))
            g = np.asarray(Image.open(g_path).convert("RGB"))
            data_range = float(g.max()) - float(g.min())
            rows.append(
                (
                    osp.join(video_folder, image_file),
                    ssim(gt, g, data_range=data_range, multichannel=True),
                    psnr(gt, g, data_range=data_range),
                )
            )
    df = pd.DataFrame(rows, columns=["file_path", "ssim", "psnr"])
    out_csv = osp.join(args.result, f"{args.experiment}_all_videos_metrics.csv")
    df.to_csv(out_csv, index=False)
    print(
        f"frames={len(df)} ssim={df['ssim'].mean():.4f} "
        f"psnr={df['psnr'].mean():.2f} -> {out_csv}"
    )


if __name__ == "__main__":
    main()
