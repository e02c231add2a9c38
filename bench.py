"""End-to-end video try-on benchmark: inference + training frames/sec/chip, MFU.

Driver mode (no flags) prints ONE JSON line whose primary metric is the full
per-clip inference pipeline at the reference's production configuration
(192x256, 5-frame clips, SAMS defaults with flow warping): on-device
preprocessing -> GMM warp (grid + cloth warp) -> SAMS autoregressive 5-frame
generation. Extra fields report the SAMS 3-optimizer *training* step
(production config, batch 4, --remat) and the model-FLOPs utilization of both,
computed from XLA cost analysis against the chip's peak.

Methodology notes:
  * inference iterations are CHAINED on device inside one jitted
    ``lax.fori_loop`` whose carry feeds the next iteration's input, so the
    measurement is immune to async-dispatch artifacts and to XLA eliminating
    repeated identical work;
  * generation runs the true serving configuration — eval-mode normalization
    with running statistics (train-mode stat reductions cost a measured 28%
    of device time, docs/PROFILE_INFER.md). The running stats are warmed with
    three train-mode rollouts first, because at random init they are
    meaningless and the autoregressive clip overflows (same behavior as the
    torch reference before training); with trained weights the warm-up is a
    no-op;
  * the training measurement chains steps through the donated TrainState
    (step i+1 consumes step i's params), which serializes steps for free.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md:
"Throughput (frames/sec): none published"); vs_baseline = ours / an A100
PyTorch estimate DERIVED from measurements (docs/BASELINE_DERIVATION.md,
tools/baseline_a100_derivation.py: production-size eager-torch mirror timed
on the local host, projected to A100 by measured compute/bandwidth/launch
bounds). 1.0 = chip-for-chip parity with the reference stack on an A100,
on a chip with 0.53x the HBM bandwidth; the ">5x" north-star bar is carried
as vs_bar_5x (see the derivation's roofline section for why that bar exceeds
the v5e's own physical roofline on this bandwidth-bound workload).

Other modes:
  python bench.py --profile   # jax.profiler trace -> docs/PROFILE.md top ops
  python bench.py --flops     # print the raw cost-analysis numbers
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import jax

from shineon_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _raw_batch, _sams_opt
from shineon_tpu.training.state import NetState

REPO = osp.dirname(osp.abspath(__file__))

# The measured-derived A100 PyTorch estimate (docs/BASELINE_DERIVATION.md,
# regenerate with tools/baseline_a100_derivation.py): eager reference
# pipeline projected to an A100 via its measured op stream (bandwidth bound
# binds at 202 f/s). vs_baseline = ours / this (1.0 = chip-for-chip parity
# with the reference stack on an A100 — on a chip with 0.53x the HBM
# bandwidth); the ">5x" north-star bar is reported alongside as vs_bar_5x
# and, per the derivation's roofline section, exceeds the v5e's own
# bandwidth roofline for this workload.
A100_TORCH_EST_FPS = 202.4
# Training-side A100 estimate (docs/BASELINE_TRAIN_DERIVATION.md, regenerate
# with tools/baseline_a100_train_derivation.py): the reference's 3-optimizer
# fp16-AMP step composed from production-size eager component measurements
# (compute ceiling binds). train_vs_baseline = reference-exact train fps /
# this.
A100_TORCH_TRAIN_EST_FPS = 35.43
TARGET_BAR_FPS = 5 * A100_TORCH_EST_FPS
BATCH = 16  # serving batch: throughput saturates ~batch 8 on v5e
ITERS = 8
REPEATS = 3  # independent timing repeats; headline = median (min/max in JSON)
TRAIN_BATCH = 4  # the reference SAMS production batch (sams_model.py:38-40)
TRAIN_STEPS = 8

# bf16 peak FLOPs/s by device kind (vendor specs) for the MFU estimate
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for name, peak in PEAK_FLOPS.items():
        if kind.startswith(name):
            return peak
    return None


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _analytic_generator_flops(batch: int, h: int = 256, w: int = 192) -> float:
    """Op-by-op FLOP count of one SamsGenerator forward at the production
    config (ngf_base 2, pows 6..10, num_middle 3, 4 labelmaps of 4/3/3/2
    channels, encoder labelmap 8ch). XLA's cost_analysis undercounts the
    conv FLOPs ~4.6x through the AOT path (docs/PERF_NOTES.md round-3
    correction), so MFU is reported against this count."""
    NH = 128

    def conv(px, cin, cout, k):
        return 2.0 * k * k * cin * cout * px

    def spade(px, C, labels):
        return sum(
            conv(px, cs, NH, 3) + 2 * conv(px, NH, C, 3) for cs in labels
        )

    cur, enc_seg = [4, 3, 3, 2], [8]
    px = [batch * (h >> s) * (w >> s) for s in range(5)]  # full..16x12
    total = conv(px[0], 12, 64, 3) + conv(px[0], 64, 4, 3)
    widths = [64, 128, 256, 512, 1024]
    for i in range(4):  # encoder blocks (before each downsample)
        fin, fout = widths[i], widths[i + 1]
        total += 2 * spade(px[i], fin, enc_seg) + spade(px[i], fin, enc_seg)
        total += (conv(px[i], fin, fin, 3) + conv(px[i], fin, fout, 3)
                  + conv(px[i], fin, fout, 1))
    for _ in range(3):  # middle blocks at 16x12
        total += 2 * spade(px[4], 1024, cur) + 2 * conv(px[4], 1024, 1024, 3)
    for i in range(4):  # decoder blocks (after each upsample)
        fin, fout = widths[4 - i], widths[3 - i]
        p = px[3 - i]
        total += 2 * spade(p, fin, cur) + spade(p, fout, cur)
        total += (conv(p, fin, fout, 3) + conv(p, fout, fout, 3)
                  + conv(p, fin, fout, 1))
    return total


# --------------------------------------------------------------- inference


def build_inference(batch_size: int):
    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.models.warp_model import WarpModel
    from shineon_tpu.ops import grid_sample

    sams_opt = _sams_opt(is_train=False, batch_size=batch_size)
    sams = SamsModel(sams_opt)
    sams_state = sams.init_state(jax.random.PRNGKey(420), 1)

    # VVT provides densepose annotations; the warp stage conditions on
    # agnostic + densepose (matching the channels the SAMS features carry)
    warp_opt = _sams_opt(
        is_train=False, model="warp", person_inputs=["agnostic", "densepose"],
        flow_warp=False, grid_size=5, batch_size=batch_size,
    )
    warp = WarpModel(warp_opt)
    warp_state = warp.init_state(jax.random.PRNGKey(7), 1)

    def one_clip(warp_nets, sams_nets, batch):
        feats = sams.features(batch)
        person = jnp.concatenate(
            [feats["agnostic"][:, -1], feats["densepose"][:, -1]], axis=-1
        )
        cloth_in = feats["cloth"][:, -1]
        gmm_vars = {"params": warp_nets["gmm"].params, **warp_nets["gmm"].stats}
        grid, _ = warp.gmm.apply(gmm_vars, person, cloth_in, train=False)
        warped = grid_sample(cloth_in, grid, padding_mode="border")
        feats = dict(feats)
        feats["cloth"] = feats["cloth"].at[:, -1].set(warped)
        _, _, all_frames, _ = sams.generate_n_frames(
            sams_nets["generator"].params, sams_nets["generator"].stats,
            feats, train=False,  # eval norms: running stats, warmed below
        )
        return all_frames

    raw = _raw_batch(sams_opt, batch=batch_size)
    device_batch = {k: jnp.asarray(v) for k, v in raw.items()}

    # Serving runs eval-mode normalization (running statistics -> no stat
    # reduction passes, measured 28% of device time in train-mode norms;
    # docs/PROFILE_INFER.md). At random init the running stats are meaningless
    # and the autoregressive clip overflows, so warm them with train-mode
    # rollouts first (with trained weights this warm-up is a no-op).
    feats = jax.jit(sams.features)(device_batch)
    g = sams_state.nets["generator"]
    params, stats = g.params, g.stats
    warm = jax.jit(
        lambda p, s, f: sams.generate_n_frames(p, s, f, train=True)[3]
    )
    for _ in range(3):
        stats = warm(params, stats, feats) or stats
    sams_state = sams_state.replace(
        nets={**sams_state.nets, "generator": NetState(params, stats, g.opt_state)}
    )

    n_frames = sams_opt.n_frames_total
    return one_clip, warp_state, sams_state, device_batch, n_frames


def measure_inference(profile_dir: str | None = None) -> dict:
    one_clip, warp_state, sams_state, device_batch, n_frames = build_inference(
        BATCH
    )

    @jax.jit
    def chained(warp_nets, sams_nets, batch, iters):
        def body(i, acc):
            b = dict(batch)
            # make each iteration's input depend on the previous output so the
            # loop cannot be collapsed or reordered
            b["flow_raw"] = batch["flow_raw"] + (acc * 1e-12).astype(jnp.float32)
            frames = one_clip(warp_nets, sams_nets, b)
            return jnp.mean(frames).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    # compile + warm up with a 1-iteration call
    v = float(chained(warp_state.nets, sams_state.nets, device_batch, 1))
    assert np.isfinite(v), f"pipeline produced {v}"

    # dispersion protocol (VERDICT r4 weak #1): REPEATS independent
    # measurements; the headline is the MEDIAN, with min/max carried in the
    # JSON so a single reading is never mistaken for a distribution (the
    # tunnel drifts ~9% cross-day; within-run spread is what this bounds).
    per_iters = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chained(warp_state.nets, sams_state.nets, device_batch, ITERS))
        total = time.perf_counter() - t0
        # subtract the single-iteration dispatch+fetch overhead
        t0 = time.perf_counter()
        float(chained(warp_state.nets, sams_state.nets, device_batch, 1))
        overhead = time.perf_counter() - t0
        per_iters.append(max((total - overhead) / (ITERS - 1), 1e-9))
    per_iter = float(np.median(per_iters))
    fps = BATCH * n_frames / per_iter
    fps_all = sorted(BATCH * n_frames / np.asarray(per_iters))

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        float(chained(warp_state.nets, sams_state.nets, device_batch, 2))
        jax.profiler.stop_trace()

    # model FLOPs of one clip for the MFU estimate. cost_analysis through
    # the AOT path undercounts conv FLOPs ~4.6x (PERF_NOTES round-3
    # correction), so MFU uses the analytic generator count (a lower bound:
    # warp/flow/preprocess FLOPs are excluded).
    clip_flops_costan = _flops_of(
        jax.jit(one_clip).lower(
            warp_state.nets, sams_state.nets, device_batch
        ).compile()
    )
    clip_flops = n_frames * _analytic_generator_flops(BATCH)
    peak = _peak_flops()
    mfu = round(clip_flops / per_iter / peak, 4) if peak else None
    return {
        "infer_fps": fps, "infer_clip_s": per_iter, "infer_mfu": mfu,
        "infer_fps_min": float(fps_all[0]), "infer_fps_max": float(fps_all[-1]),
        "infer_repeats": len(fps_all),
        "infer_clip_flops": clip_flops,
        "infer_clip_flops_cost_analysis": clip_flops_costan,
    }


# ---------------------------------------------------------------- training


def build_train(batch_size: int, **opt_kw):
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt(is_train=True, batch_size=batch_size, remat=True, **opt_kw)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(420), steps_per_epoch=1000)
    step = model.make_train_step()
    raw = _raw_batch(opt, batch=batch_size)
    device_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    return model, state, step, device_batch, opt.n_frames_total


def _time_train_steps(step, state, batch, repeats: int = REPEATS) -> float:
    """Median over independent timing windows of TRAIN_STEPS chained steps.

    Each window closes with an explicit scalar FETCH (float of the loss):
    on the axon tunnel ``jax.block_until_ready`` returns immediately
    (measured 0.07 ms for a 750 ms program), so only a value fetch
    guarantees the timed window covers real device execution."""
    state, metrics = step(state, batch)  # compile + first step
    float(jax.device_get(metrics["loss"]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(TRAIN_STEPS):
            state, metrics = step(state, batch)
        loss = float(jax.device_get(metrics["loss"]))
        times.append((time.perf_counter() - t0) / TRAIN_STEPS)
    assert np.isfinite(loss), f"train step produced loss={loss}"
    return float(np.median(times))


def measure_train(profile_dir: str | None = None) -> dict:
    # HEADLINE: the reference-exact per-optimizer regeneration step
    # (--exact_gan_step, the CLI default) — VERDICT r4 weak #6 asked for the
    # exact semantics to lead. --fast_gan_step (the G-step clip, detached,
    # feeds both D updates; the documented production recommendation) is
    # reported alongside as the annotated fast variant.
    model, state, step, batch, n_frames = build_train(
        TRAIN_BATCH, fast_gan_step=False
    )
    train_flops_costan = _flops_of(jax.jit(step).lower(state, batch).compile())
    dt = _time_train_steps(step, state, batch)

    if profile_dir:  # trace 2 steps only: keeps the xplane file small
        state, metrics = step(state, batch)
        float(jax.device_get(metrics["loss"]))  # fetch = real barrier on axon
        jax.profiler.start_trace(profile_dir)
        for _ in range(2):
            state, metrics = step(state, batch)
        float(jax.device_get(metrics["loss"]))
        jax.profiler.stop_trace()

    peak = _peak_flops()
    # analytic generator-only lower bound (cost_analysis undercounts convs;
    # see PERF_NOTES round-3 correction): fwd + remat'd backward ~= 4x the
    # clip forward, +1x for the exact step's D-pass regeneration.
    # Discriminators/VGG/TTUR passes are excluded -> true MFU is higher.
    clip_fwd = n_frames * _analytic_generator_flops(TRAIN_BATCH)
    train_flops = 5.0 * clip_fwd
    mfu = round(train_flops / dt / peak, 4) if peak else None

    # --fast_gan_step variant (approximation: D updates reuse the pre-update
    # generator's frames)
    _, f_state, f_step, f_batch, _ = build_train(
        TRAIN_BATCH, fast_gan_step=True
    )
    f_dt = _time_train_steps(f_step, f_state, f_batch)

    return {
        "train_fps": TRAIN_BATCH * n_frames / dt,
        "train_step_s": dt,
        "train_mfu": mfu,
        "train_step_flops": train_flops,
        "train_step_flops_cost_analysis": train_flops_costan,
        "train_fast_gan_fps": TRAIN_BATCH * n_frames / f_dt,
    }


# ----------------------------------------------------------------- profile


def write_profile(
    trace_dir: str,
    step_s: float,
    out_file: str = "PROFILE.md",
    header: str | None = None,
) -> None:
    """Parse the xplane trace and write docs/<out_file> (top ops by time)."""
    import glob

    from jax.profiler import ProfileData

    paths = sorted(glob.glob(osp.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane.pb found under", trace_dir, file=sys.stderr)
        return
    data = ProfileData.from_file(paths[-1])
    totals: dict[str, float] = {}
    for plane in data.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for event in line.events:
                name = event.name
                dur = event.duration_ns
                totals[name] = totals.get(name, 0.0) + dur
    if not totals:  # fall back: aggregate every device-plane line
        for plane in data.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                for event in line.events:
                    totals[event.name] = (
                        totals.get(event.name, 0.0) + event.duration_ns
                    )
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:15]
    total_ns = sum(totals.values()) or 1.0
    if header is None:
        header = (
            "# SAMS train-step device profile (measured)\n\n"
            f"Chip: `{jax.devices()[0].device_kind}`. jax.profiler trace over "
            f"2 production train steps "
            f"(batch {TRAIN_BATCH}, 256x192, 5 frames, --remat); "
            f"step time {step_s*1e3:.0f} ms. "
            "Regenerate: `python bench.py --profile`."
        )
    lines = [
        header,
        "",
        "| op | total ms | % of device time |",
        "|---|---|---|",
    ]
    for name, ns in top:
        lines.append(
            f"| `{name[:80]}` | {ns/1e6:.2f} | {100*ns/total_ns:.1f}% |"
        )
    out = osp.join(REPO, "docs", out_file)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}", file=sys.stderr)


# -------------------------------------------------------------------- main


def run_with_retries(argv: list[str]) -> int:
    """Re-exec this script as ``--inner`` subprocesses until one prints a
    parseable result JSON line, with backoff between attempts.

    Why a subprocess: JAX initializes its backend once per process, so a
    failed/hung TPU-tunnel init (``RuntimeError: Unable to initialize backend
    'axon': UNAVAILABLE`` — the exact failure that voided BENCH_r03.json)
    cannot be retried in-process. Each attempt gets a fresh process, a hard
    wall-clock timeout (the tunnel has been observed to HANG >120 s in
    ``jax.devices()``), and any failure mode — init error, hang, crash,
    garbage output — is survived by the next attempt."""
    import subprocess

    attempts = int(os.environ.get("SHINEON_BENCH_ATTEMPTS", "4"))
    timeout_s = float(os.environ.get("SHINEON_BENCH_ATTEMPT_TIMEOUT", "2700"))
    backoffs = [
        float(x)
        for x in os.environ.get("SHINEON_BENCH_BACKOFFS", "30,60,120").split(",")
    ]
    inner = os.environ.get("SHINEON_BENCH_INNER_CMD")  # test hook
    cmd = (
        [sys.executable, "-c", inner]
        if inner
        else [sys.executable, osp.abspath(__file__), "--inner", *argv]
    )
    last_err = ""
    for attempt in range(attempts):
        if attempt:
            delay = backoffs[min(attempt - 1, len(backoffs) - 1)]
            print(f"bench attempt {attempt} failed; retrying in {delay:.0f}s",
                  file=sys.stderr)
            time.sleep(delay)
        try:
            proc = subprocess.run(
                cmd, stdout=subprocess.PIPE, timeout=timeout_s, text=True
            )  # stderr passes through live
        except subprocess.TimeoutExpired:
            last_err = f"attempt timed out after {timeout_s:.0f}s"
            print(last_err, file=sys.stderr)
            continue
        for line in reversed((proc.stdout or "").strip().splitlines()):
            try:
                parsed = json.loads(line)
            except ValueError:
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                print(line)
                return 0
        last_err = f"attempt exited rc={proc.returncode} without a result line"
        print(last_err, file=sys.stderr)
    print(f"bench failed after {attempts} attempts: {last_err}", file=sys.stderr)
    return 1


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--profile", action="store_true",
                   help="trace train steps and write docs/PROFILE.md")
    p.add_argument("--flops", action="store_true",
                   help="print raw cost-analysis numbers and exit")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--inner", action="store_true",
                   help="run the measurement in THIS process (no retry "
                   "wrapper); the default invocation re-execs itself with "
                   "--inner under a backoff loop")
    args = p.parse_args()

    if not args.inner:
        fwd = [a for a in sys.argv[1:] if a != "--inner"]
        sys.exit(run_with_retries(fwd))

    # Bench serving configuration: int8 gamma/beta SPADE convs (the MXU's
    # 2x-rate int8 path; 138.4 -> 165 f/s measured). Quality-neutral on the
    # hermetic QA loop: trained export SSIM 0.3315/PSNR 14.32 (fp) vs
    # 0.3303/14.29 (int8) — tests/test_e2e_quality.py, PARITY_E2E.md. On the
    # CLI this is opt-in (--int8_spade); override here with
    # SHINEON_INT8_SPADE=0 for full-precision serving. Set inside the inner
    # process only, so importing bench never mutates the caller's env.
    os.environ.setdefault("SHINEON_INT8_SPADE", "1")

    if args.flops:
        one_clip, warp_state, sams_state, batch, _ = build_inference(1)
        comp = jax.jit(one_clip).lower(
            warp_state.nets, sams_state.nets, batch
        ).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(json.dumps({
            "gen_clip_flops_b1": ca.get("flops"),
            "gen_clip_bytes_b1": ca.get("bytes accessed"),
        }))
        return

    infer_profile_dir = None
    if args.profile:
        import tempfile

        infer_profile_dir = tempfile.mkdtemp(prefix="shineon_trace_inf_")

    def _retry(fn, *fargs):
        # the axon tunnel occasionally surfaces a transient
        # "INTERNAL: TPU backend error" (JaxRuntimeError) or a plain
        # RuntimeError from backend init; one in-process retry rides out the
        # former, the --inner re-exec wrapper handles everything else
        try:
            return fn(*fargs)
        except (jax.errors.JaxRuntimeError, RuntimeError) as e:
            print(f"transient backend error, retrying: {e}", file=sys.stderr)
            return fn(*fargs)

    result = _retry(measure_inference, infer_profile_dir)
    if args.profile:
        write_profile(
            infer_profile_dir,
            result["infer_clip_s"],
            out_file="PROFILE_INFER.md",
            header=(
                "# Inference-pipeline device profile (measured)\n\n"
                f"Chip: `{jax.devices()[0].device_kind}`. jax.profiler trace "
                f"over 2 chained preprocess->warp->generate clips "
                f"(batch {BATCH}, 256x192, 5 frames); "
                f"clip time {result['infer_clip_s']*1e3:.0f} ms. "
                "Regenerate: `python bench.py --profile`."
            ),
        )

    train = {}
    if not args.skip_train:
        profile_dir = None
        if args.profile:
            import tempfile

            profile_dir = tempfile.mkdtemp(prefix="shineon_trace_")
        train = _retry(measure_train, profile_dir)
        if args.profile:
            write_profile(profile_dir, train["train_step_s"])

    fps = result["infer_fps"]
    line = {
        "metric": "vvt_video_tryon_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_TORCH_EST_FPS, 3),
        # schema note (round 3): since round 2, vs_baseline = fps / the
        # measured-derived A100-PyTorch estimate (202.4 f/s,
        # docs/BASELINE_DERIVATION.md). Round 1 divided by an unsourced
        # number; cross-round comparisons must use this definition.
        "baseline_def": f"a100_torch_est_{A100_TORCH_EST_FPS}",
        "vs_bar_5x": round(fps / TARGET_BAR_FPS, 3),
        "infer_mfu": result["infer_mfu"],
        # dispersion over REPEATS independent measurements (value = median)
        "value_min": round(result["infer_fps_min"], 2),
        "value_max": round(result["infer_fps_max"], 2),
        "repeats": result["infer_repeats"],
    }
    if train:
        line.update({
            # reference-exact per-optimizer GAN semantics (the CLI default)
            "train_frames_per_sec_per_chip": round(train["train_fps"], 2),
            "train_vs_baseline": round(
                train["train_fps"] / A100_TORCH_TRAIN_EST_FPS, 3
            ),
            "train_baseline_def": (
                f"a100_torch_train_est_{A100_TORCH_TRAIN_EST_FPS}"
            ),
            "train_step_ms": round(train["train_step_s"] * 1e3, 1),
            "train_mfu": train["train_mfu"],
            # --fast_gan_step approximation (documented production option)
            "train_fast_gan_frames_per_sec_per_chip": round(
                train["train_fast_gan_fps"], 2
            ),
        })
    print(json.dumps(line))


if __name__ == "__main__":
    main()
