"""The reference's whole QA loop, hermetically: train -> test.py-style export
-> calculate_metrics.py, asserting trained exports score materially better
SSIM/PSNR than the step-0 exports (reference calculate_metrics.py:64-144,
docs/2_inference.md:9-56).

Tiny configs keep this CPU-runnable; tools/e2e_quality.py runs the same chain
at production size on the real chip (numbers in PARITY_E2E.md).
"""

import os.path as osp
import sys

import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools.e2e_quality import run_e2e  # noqa: E402


@pytest.mark.slow
def test_tom_train_improves_exported_metrics(tmp_path):
    # L1-on-tanh luminance converges by constant Adam drift (sign gradients),
    # so the overfit needs enough steps x lr to cover the [-1,1] range
    r = run_e2e(
        model_name="unet_mask", fine_height=64, fine_width=64, n_frames=1,
        frames_per_video=12, batch_size=4, epochs=50, lr=3e-3,
        workdir=str(tmp_path),
        arch_overrides={"ngf": 8, "num_attn": 0, "self_attn": False},
    )
    assert r["frames_scored"] == 12
    # training must materially improve the exported frames
    assert r["ssim_trained"] > r["ssim_init"] + 0.1, r
    assert r["psnr_trained"] > r["psnr_init"] + 1.0, r


@pytest.mark.slow
def test_sams_train_improves_exported_metrics(tmp_path):
    # the SAMS generator's output is unbounded (faithful to the reference:
    # sams_generator.py ends in a raw conv, no tanh), so an overfit smoke
    # needs a tame lr and downweighted adversarial terms — at high lr the
    # untrained hinge discriminators reward amplitude explosion
    # proven config (PARITY_E2E.md): 210 steps reach SSIM 0.334 / PSNR 14.4
    # from 0.001 / 4.8 at init
    r = run_e2e(
        model_name="sams", fine_height=32, fine_width=24, n_frames=3,
        frames_per_video=12, batch_size=4, epochs=35, lr=1e-3,
        workdir=str(tmp_path),
        arch_overrides={
            "ngf_pow_outer": 3, "ngf_pow_inner": 5, "num_middle": 1,
            "ndf": 8, "n_layers_D": 3, "wt_vgg": 0.0,
            "wt_multiscale": 0.3, "wt_temporal": 0.3,
        },
        # the int8 serving mode must preserve the trained export's quality
        extra_export_envs={"int8": {"SHINEON_INT8_SPADE": "1"}},
    )
    assert r["frames_scored"] == 12
    assert r["ssim_trained"] > r["ssim_init"] + 0.1, r
    assert r["psnr_trained"] > r["psnr_init"] + 1.0, r
    # quantized serving within quantization tolerance of the fp export
    assert abs(r["ssim_int8"] - r["ssim_trained"]) < 0.02, r
    assert abs(r["psnr_int8"] - r["psnr_trained"]) < 1.0, r
