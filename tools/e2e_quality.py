"""Hermetic train -> export -> SSIM/PSNR quality loop (the reference's whole
QA cycle: train.py -> test.py -> folders -> calculate_metrics.py, cf.
/root/reference/calculate_metrics.py:64-144 and docs/2_inference.md:9-56).

Builds a synthetic VVT fixture, exports reconstruction frames with the model
at init, trains it with the real Trainer, exports again with the trained
weights, then scores both exports against the ground-truth frames with the
``calculate_metrics.py`` CLI. Training must materially improve SSIM/PSNR of
the exported frames for the run to count as a pass.

Used two ways:
  * ``tests/test_e2e_quality.py`` runs tiny configs on the CPU mesh;
  * ``python tools/e2e_quality.py --model sams`` runs a bigger config on the
    real chip and prints the JSON that PARITY_E2E.md records.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import re
import subprocess
import sys
import tempfile

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, osp.join(REPO, "tests"))


def _namespace(**kw) -> argparse.Namespace:
    """A fully-populated options namespace for VVT training/eval without CLI
    parsing (mirrors what TrainOptions/TestOptions.parse() would produce)."""
    base = dict(
        model="sams", dataset="vvt", datamode="train", is_train=True,
        person_inputs=["agnostic", "densepose", "flow"], cloth_inputs=["cloth"],
        fine_height=256, fine_width=192, radius=5, val_fraction=0.1,
        cloth_mask_threshold=240, visualize_flow=False, image_scale=1,
        n_frames_total=3, n_frames_now=3, flow_warp=True,
        encoder_input="flow", activation="relu",
        norm_G="spectralspadesyncbatch3x3", ngf_base=2, ngf_pow_outer=6,
        ngf_pow_inner=10, ngf_pow_step=1, num_middle=3,
        attention_middle_indices=(), attention_decoder_indices=(),
        init_type="xavier", init_variance=0.02,
        num_D=2, ndf=64, n_layers_D=4, norm_D="spectralinstance",
        gan_mode="hinge", lr=1e-4, lr_D=3e-4, no_ganFeat_loss=False,
        wt_l1=1.0, wt_vgg=1.0, wt_multiscale=1.0, wt_temporal=1.0,
        keep_epochs=5, decay_epochs=5, accumulated_batches=1,
        batch_size=4, workers=0, no_shuffle=False,
        limit_train_batches="1.0", limit_val_batches="1.0",
        ngf=64, self_attn=False, num_attn=2, precision=32,
        tryon_list=None, random_tryon=False, warp_cloth_dir=None,
        pen_flow_mask=0.25,
        display_count=1000000, save_count=1000000,
        checkpoint="", fast_dev_run=False, loglevel="warning",
        val_check_interval="1.0", data_list="train_pairs.txt",
        # no pretrained VGG19 in the hermetic environment; the perceptual
        # term falls back to the documented deterministic random filters
        allow_random_vgg=True,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _crop_gt(src: str, dst: str, width: int, height: int) -> None:
    """Center-crop the ground-truth frame tree to the run's --fine size —
    the SAME transform the data pipeline applies (the reference center-crops,
    never resizes: tryon_dataset.py:84-111 'then crop to this'). Identity at
    the production 256x192."""
    import numpy as np
    from PIL import Image

    for vid in sorted(os.listdir(src)):
        os.makedirs(osp.join(dst, vid), exist_ok=True)
        for f in sorted(os.listdir(osp.join(src, vid))):
            arr = np.asarray(Image.open(osp.join(src, vid, f)).convert("RGB"))
            y0 = max((arr.shape[0] - height) // 2, 0)
            x0 = max((arr.shape[1] - width) // 2, 0)
            Image.fromarray(arr[y0:y0 + height, x0:x0 + width]).save(
                osp.join(dst, vid, f)
            )


def _export(model_cls, opt_kw, state, result_dir: str) -> str:
    """Run the Trainer.test export path and return the reconstruction dir."""
    from shineon_tpu.training.loop import Trainer

    eval_opt = _namespace(**{
        **opt_kw, "is_train": False, "datamode": "test", "no_shuffle": True,
        "result_dir": result_dir, "name": "e2e", "checkpoint": "",
    })
    model = model_cls(eval_opt)
    model.override_hparams(eval_opt)
    model.setup("test")
    Trainer(eval_opt).test(model, state)
    recon = glob.glob(osp.join(result_dir, "e2e", "*", "test", "*",
                               "reconstruction"))
    assert recon, f"no reconstruction export under {result_dir}"
    return recon[0]


def run_e2e(
    model_name: str = "sams",
    fine_height: int = 256,
    fine_width: int = 192,
    n_frames: int = 3,
    frames_per_video: int = 24,
    batch_size: int = 4,
    epochs: int = 16,
    lr: float = 2e-4,
    workdir: str | None = None,
    arch_overrides: dict | None = None,
    extra_export_envs: dict | None = None,
    precision: int = 32,
) -> dict:
    """Returns {'ssim_init','ssim_trained','psnr_init','psnr_trained',...}.

    ``extra_export_envs``: {variant_name: {ENV: value}} — after the trained
    export, re-export the SAME trained state under each env (e.g. the int8
    serving mode) and report ``ssim_<variant>``/``psnr_<variant>``."""
    from fixtures import make_vvt_fixture

    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.models.unet_mask_model import UnetMaskModel
    from shineon_tpu.training.loop import Trainer

    workdir = workdir or tempfile.mkdtemp(prefix="shineon_e2e_")
    data_root = osp.join(workdir, "vvt")
    if not osp.isdir(osp.join(data_root, "train")):
        # identical content in train/ and test/ (same seed): overfitting the
        # train clips must show up in the test export's metrics. Two videos:
        # the video-level val split assigns vid0 to train / test-main and
        # vid1 to validation (load_file_paths_for_reconstruction_task).
        # Frames are written at the run's --fine size: the pipeline
        # center-crops (never resizes, like the reference), so same-size
        # fixtures keep the full scene structure at tiny test resolutions.
        make_vvt_fixture(data_root, n_videos=2, frames=frames_per_video,
                         datamode="train", seed=7,
                         height=fine_height, width=fine_width)
        make_vvt_fixture(data_root, n_videos=2, frames=frames_per_video,
                         datamode="test", seed=7,
                         height=fine_height, width=fine_width)

    arch = dict(arch_overrides or {})
    if model_name == "sams":
        model_cls = SamsModel
    elif model_name == "unet_mask":
        model_cls = UnetMaskModel
        arch.setdefault("person_inputs", ["agnostic", "densepose"])
        arch.setdefault("n_frames_total", 1)
        arch.setdefault("n_frames_now", 1)
        arch.setdefault("flow_warp", False)
    else:
        raise ValueError(model_name)

    opt_kw = dict(
        model=model_name, vvt_dataroot=data_root,
        fine_height=fine_height, fine_width=fine_width,
        n_frames_total=n_frames, n_frames_now=n_frames,
        batch_size=batch_size, lr=lr, precision=precision,
        keep_epochs=epochs, decay_epochs=epochs,
        experiments_dir=osp.join(workdir, "exp"),
        name="e2e",
        # this is an overfit harness: skip mid-run validation so Orbax top-k
        # saves don't dominate the wall clock (save_final still runs)
        val_check_interval="1000000",
    )
    opt_kw.update(arch)  # model-family defaults / caller overrides win

    # ---- export at init (seed 420 = the Trainer's own init seed)
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon TPU plugin force-prepends itself to jax_platforms
        # regardless of the env var; pin the config so CPU runs stay on CPU
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    train_opt = _namespace(**opt_kw)
    model = model_cls(train_opt)
    model.setup("fit")
    steps_per_epoch = max(len(model.train_dataloader()), 1)
    state0 = model.init_state(jax.random.PRNGKey(420), steps_per_epoch)
    init_dir = _export(model_cls, opt_kw, state0, osp.join(workdir, "results_init"))
    # free the init state's device buffers (params + 3 optimizer states)
    # before the train step allocates its peak — at the production
    # 256x192x5 config the 16G chip has no slack for dead copies
    del state0
    import gc

    gc.collect()

    # ---- train
    trainer = Trainer(train_opt)
    state = trainer.fit(model)
    steps = int(jax.device_get(state.step))

    # ---- export trained
    trained_dir = _export(
        model_cls, opt_kw, state, osp.join(workdir, "results_trained")
    )

    # ---- optional serving-mode variants of the trained export
    variant_dirs = {}
    for vname, env in (extra_export_envs or {}).items():
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            variant_dirs[vname] = _export(
                model_cls, opt_kw, state,
                osp.join(workdir, f"results_{vname}"),
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # ---- score the exports with the offline metrics CLI
    gt = osp.join(workdir, "gt_cropped")
    _crop_gt(osp.join(data_root, "test", "test_frames"), gt,
             fine_width, fine_height)

    def _score(dir1, name1, dir2, name2, outdir):
        out = subprocess.run(
            [sys.executable, osp.join(REPO, "calculate_metrics.py"),
             "-t", gt, "-g1", dir1, "-g2", dir2,
             "--experiment_one", name1, "--experiment_two", name2,
             "--result", outdir, "--no_video"],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        assert out.returncode == 0, out.stderr[-4000:]
        # psnr may legitimately read -inf: an UNTRAINED production-size
        # autoregressive clip explodes to non-finite frames (the export
        # clamps to black), which is exactly what the init-baseline column
        # records at 256x192 (round-5 production curve)
        num = r"(-?[\d.]+|-?inf|nan)"
        m = re.search(
            rf"frames=(\d+) ssim_1={num} ssim_2={num} "
            rf"psnr_1={num} psnr_2={num}",
            out.stdout,
        )
        assert m, f"metrics summary not found in: {out.stdout!r}"
        return m

    m = _score(init_dir, "init", trained_dir, "trained",
               osp.join(workdir, "metrics_out"))
    extra = {}
    for vname, vdir in variant_dirs.items():
        mv = _score(trained_dir, "trained", vdir, vname,
                    osp.join(workdir, f"metrics_{vname}"))
        extra[f"ssim_{vname}"] = float(mv.group(3))
        extra[f"psnr_{vname}"] = float(mv.group(5))
    return extra | {
        "model": model_name,
        "frames_scored": int(m.group(1)),
        "train_steps": steps,
        "resolution": f"{fine_width}x{fine_height}",
        "ssim_init": float(m.group(2)),
        "ssim_trained": float(m.group(3)),
        "psnr_init": float(m.group(4)),
        "psnr_trained": float(m.group(5)),
        "workdir": workdir,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["sams", "unet_mask"], default="sams")
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--frames", type=int, default=24,
                   help="frames in the fixture video")
    p.add_argument("--n_frames", type=int, default=3, help="clip length")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=16,
                   help="keep epochs (= decay epochs)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--workdir", default=None)
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()
    arch = {"remat": True} if args.remat else {}
    result = run_e2e(
        model_name=args.model, fine_height=args.height, fine_width=args.width,
        n_frames=args.n_frames, frames_per_video=args.frames,
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        workdir=args.workdir, arch_overrides=arch,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
