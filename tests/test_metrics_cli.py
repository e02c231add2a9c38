"""calculate_metrics.py / plot_all_videos.py end-to-end on synthetic folders."""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _make_video_folders(root, n_frames=3, seed=0):
    rng = np.random.RandomState(seed)
    for sub in ("gt", "gen1", "gen2"):
        vdir = osp.join(root, sub, "vid0")
        os.makedirs(vdir, exist_ok=True)
    for t in range(n_frames):
        base = rng.randint(0, 255, (64, 48, 3)).astype(np.uint8)
        noisy = np.clip(
            base.astype(int) + rng.randint(-20, 20, base.shape), 0, 255
        ).astype(np.uint8)
        for sub, img in (("gt", base), ("gen1", noisy), ("gen2", base)):
            Image.fromarray(img).save(
                osp.join(root, sub, "vid0", f"frame_{t:03d}.png")
            )


def test_calculate_metrics_cli(tmp_path):
    _make_video_folders(str(tmp_path))
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "calculate_metrics.py"),
         "-t", str(tmp_path / "gt"),
         "-g1", str(tmp_path / "gen1"),
         "-g2", str(tmp_path / "gen2"),
         "--result", str(tmp_path / "out"), "--no_video"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ssim_1=" in out.stdout
    csvs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".csv")]
    assert csvs
    # gen2 == gt -> perfect scores in the summary
    import re

    m = re.search(r"ssim_2=([\d.]+)", out.stdout)
    assert float(m.group(1)) == 1.0


def test_plot_all_videos_cli(tmp_path):
    _make_video_folders(str(tmp_path))
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "plot_all_videos.py"),
         "-t", str(tmp_path / "gt"), "-g", str(tmp_path / "gen1"),
         "--result", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "frames=3" in out.stdout
