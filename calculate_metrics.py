"""Offline SSIM/PSNR comparison of generated result folders vs ground truth.

Same CLI and outputs as the reference calculate_metrics.py:14-144: walks the
generated video folders of two experiments, computes per-frame SSIM/PSNR
against ground-truth frames with ``data_range = generated.max() -
generated.min()``, writes a side-by-side comparison MP4, a per-video CSV, and
SSIM/PSNR plots. skimage/cv2 calls are replaced by the native implementations
in shineon_tpu.utils.metrics + imageio/PIL.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob

import numpy as np
from PIL import Image

from shineon_tpu.utils.metrics import peak_signal_noise_ratio as psnr
from shineon_tpu.utils.metrics import structural_similarity as ssim


def argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-t", "--ground_truth_dir_path", "--truth", type=str,
        default="data/fw_gan_vvt/train/train_frames",
    )
    parser.add_argument("-g1", "--generated_dir_path_1", type=str, required=True)
    parser.add_argument("-g2", "--generated_dir_path_2", type=str, default=None)
    parser.add_argument("--experiment_one", type=str, default="1")
    parser.add_argument("--experiment_two", type=str, default="2")
    parser.add_argument("--result", type=str, default="metrics_out")
    parser.add_argument("--no_video", action="store_true",
                        help="skip writing comparison MP4s")
    return parser.parse_args()


def _imread(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"))


def _write_video(path: str, frames: list, fps: int = 20):
    try:
        import imageio

        imageio.mimwrite(path, frames, fps=fps)
    except Exception as exc:  # pragma: no cover
        print(f"skipping video write ({exc})")


def main():
    args = argparser()
    os.makedirs(args.result, exist_ok=True)
    gen2 = args.generated_dir_path_2 or args.generated_dir_path_1

    all_rows = []
    video_folders = sorted(os.listdir(args.generated_dir_path_1))
    assert video_folders, f"no videos under {args.generated_dir_path_1}"
    for video_folder in video_folders:
        frames_for_video = []
        rows = []
        images = sorted(
            os.listdir(osp.join(args.generated_dir_path_1, video_folder))
        )
        for i, image_file in enumerate(images):
            gt_path = osp.join(args.ground_truth_dir_path, video_folder, image_file)
            g1_path = osp.join(args.generated_dir_path_1, video_folder, image_file)
            g2_path = osp.join(gen2, video_folder, image_file)
            if not (osp.exists(gt_path) and osp.exists(g1_path) and osp.exists(g2_path)):
                continue
            gt = _imread(gt_path)
            g1 = _imread(g1_path)
            g2 = _imread(g2_path)
            ssims = [
                ssim(gt, g, data_range=float(g.max()) - float(g.min()),
                     multichannel=True)
                for g in (g1, g2)
            ]
            psnrs = [
                psnr(gt, g, data_range=float(g.max()) - float(g.min()))
                for g in (g1, g2)
            ]
            rows.append((osp.join(video_folder, image_file), *ssims, *psnrs))
            if not args.no_video:
                frames_for_video.append(
                    np.concatenate([gt, g1, g2], axis=1).astype(np.uint8)
                )
        if not rows:
            continue
        all_rows.extend(rows)
        # per-video CSV
        import pandas as pd

        df = pd.DataFrame(
            rows,
            columns=[
                "file_path", "ssim_truth_generated_1", "ssim_truth_generated_2",
                "psnr_truth_generated_1", "psnr_truth_generated_2",
            ],
        )
        df.to_csv(
            osp.join(
                args.result,
                f"{args.experiment_one}_{args.experiment_two}_{video_folder}"
                "_metrics_output.csv",
            ),
            index=False,
        )
        if frames_for_video and not args.no_video:
            _write_video(
                osp.join(
                    args.result,
                    f"compare_{args.experiment_one}_{args.experiment_two}_"
                    f"{video_folder}.mp4",
                ),
                frames_for_video,
            )
        _plot(args, df, video_folder)

    if all_rows:
        arr = np.asarray([r[1:] for r in all_rows], np.float64)
        print(
            f"frames={len(all_rows)} "
            f"ssim_1={arr[:, 0].mean():.4f} ssim_2={arr[:, 1].mean():.4f} "
            f"psnr_1={arr[:, 2].mean():.2f} psnr_2={arr[:, 3].mean():.2f}"
        )


def _plot(args, df, video_folder):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    figs, axs = plt.subplots(2)
    plt.suptitle(f"{video_folder} Plot")
    idx = range(len(df))
    axs[0].plot(idx, df["ssim_truth_generated_1"], label="ssim_truth_generated_1", color="b")
    axs[0].plot(idx, df["ssim_truth_generated_2"], label="ssim_truth_generated_2", color="g")
    axs[1].plot(idx, df["psnr_truth_generated_1"], label="psnr_truth_generated_1", color="r")
    axs[1].plot(idx, df["psnr_truth_generated_2"], label="psnr_truth_generated_2", color="y")
    axs[0].legend()
    axs[1].legend()
    plt.xlabel("# of Frames")
    plt.savefig(
        osp.join(
            args.result,
            f"{args.experiment_one}_{args.experiment_two}_{video_folder}_plot.png",
        )
    )
    plt.close()


if __name__ == "__main__":
    main()
