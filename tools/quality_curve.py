"""SSIM/PSNR convergence curve for the hermetic SAMS quality loop
(VERDICT r2 item 6: evidence past the single 210-step point).

Runs the proven tiny-SAMS overfit config (tests/test_e2e_quality.py) at
increasing epoch counts — training is seeded and the fixture identical, so
each run is a prefix of the same trajectory — and scores every export with
the offline metrics CLI. Curve recorded in PARITY_E2E.md.

    python tools/quality_curve.py --epochs 35 100 250
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.e2e_quality import run_e2e  # noqa: E402

TINY_SAMS = {
    "ngf_pow_outer": 3, "ngf_pow_inner": 5, "num_middle": 1,
    "ndf": 8, "n_layers_D": 3, "wt_vgg": 0.0,
    "wt_multiscale": 0.3, "wt_temporal": 0.3,
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, nargs="*", default=[35, 100, 250])
    p.add_argument("--workdir", default=None)
    args = p.parse_args()

    curve = []
    for ep in args.epochs:
        r = run_e2e(
            model_name="sams", fine_height=32, fine_width=24, n_frames=3,
            frames_per_video=12, batch_size=4, epochs=ep, lr=1e-3,
            workdir=None if args.workdir is None
            else osp.join(args.workdir, f"ep{ep}"),
            arch_overrides=dict(TINY_SAMS),
        )
        point = {
            "epochs": ep, "steps": r["train_steps"],
            "ssim": r["ssim_trained"], "psnr": r["psnr_trained"],
            "ssim_init": r["ssim_init"],
        }
        print(json.dumps(point), flush=True)
        curve.append(point)
    print(json.dumps({"curve": curve}))


if __name__ == "__main__":
    main()
