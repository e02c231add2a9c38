"""Stage-level timing of the serving pipeline at the benchmark config.

The xplane trace buries everything inside two whole-clip `while` fusions
(docs/PROFILE_INFER.md), so the clip is decomposed here by timing each
stage in its own on-device `lax.fori_loop` with a single scalar fetch —
the SAME protocol as bench.py. Per-dispatch timing with
`jax.block_until_ready` is NOT usable on the axon tunnel: block_until_ready
returns immediately there (measured 0.07 ms for a 750 ms program), so any
host-side per-call timing reads dispatch latency, not device time.

Stages:
  features     on-device preprocess (uint8 decode/normalize/labelmaps)
  gmm_warp     GMM nets + TPS grid + cloth grid-sample
  gen_frame    ONE generator frame-batch forward (the scan body's apply)
  gen_scan     generate_n_frames eval scan (5 frames)
  one_clip     the full chained stage (= what bench.py times)

Derived: scan overhead = gen_scan - 5*gen_frame (flow-warp compositing,
window carry, stacking); pipeline glue = one_clip - features - gmm - scan.
Stage sums can exceed the fused clip when XLA overlaps stages in the whole
graph — the deltas are still the right ranking signal for optimization.

Usage: python tools/profile_serving_stages.py [--batch 16] [--iters 20]
Prints one JSON line; run on the real TPU (serving numbers meaningless on CPU).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from shineon_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _tree_mean(out) -> jnp.ndarray:
    """Scalar that depends on EVERY leaf so XLA cannot DCE any stage output."""
    leaves = jax.tree_util.tree_leaves(out)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.mean(leaf.astype(jnp.float32))
    return acc


def _measure(chained, args, iters: int) -> float:
    """Seconds per iteration: slope between a short and a 4x-longer
    fori_loop window, median of 3 (the tunnel's ~25 ms round-trip carries
    multi-ms jitter, so single-window overhead subtraction can read ~0 for
    fast stages — the roof-census lesson)."""
    v = float(chained(*args, 1))
    assert np.isfinite(v), v
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args, iters))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(*args, 4 * iters))
        t_long = time.perf_counter() - t0
        diffs.append(max(t_long - t_short, 1e-9) / (3 * iters))
    return float(np.median(diffs))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import bench
    from shineon_tpu.models.sams_model import SamsModel
    from shineon_tpu.models.warp_model import WarpModel
    from shineon_tpu.ops import grid_sample
    from __graft_entry__ import _sams_opt

    batch = args.batch or bench.BATCH
    one_clip, warp_state, sams_state, device_batch, n_frames = (
        bench.build_inference(batch)
    )
    sams_opt = _sams_opt(is_train=False, batch_size=batch)
    sams = SamsModel(sams_opt)
    warp_opt = _sams_opt(
        is_train=False, model="warp", person_inputs=["agnostic", "densepose"],
        flow_warp=False, grid_size=5, batch_size=batch,
    )
    warp = WarpModel(warp_opt)

    warp_nets, sams_nets = warp_state.nets, sams_state.nets
    g = sams_nets["generator"]

    def _perturbed(batch_dict, acc):
        b = dict(batch_dict)
        b["flow_raw"] = batch_dict["flow_raw"] + (acc * 1e-12).astype(
            jnp.float32
        )
        return b

    @jax.jit
    def feat_chain(batch, iters):
        def body(i, acc):
            return _tree_mean(sams.features(_perturbed(batch, acc)))

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    feats = jax.jit(sams.features)(device_batch)

    @jax.jit
    def gmm_chain(warp_nets, feats, iters):
        def body(i, acc):
            person = jnp.concatenate(
                [feats["agnostic"][:, -1], feats["densepose"][:, -1]], axis=-1
            )
            cloth_in = feats["cloth"][:, -1] + (acc * 1e-12).astype(
                feats["cloth"].dtype
            )
            gmm_vars = {
                "params": warp_nets["gmm"].params, **warp_nets["gmm"].stats
            }
            grid, _ = warp.gmm.apply(gmm_vars, person, cloth_in, train=False)
            warped = grid_sample(cloth_in, grid, padding_mode="border")
            return _tree_mean(warped)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def scan_chain(params, stats, feats, iters):
        def body(i, acc):
            f = dict(feats)
            f["flow"] = feats["flow"] + (acc * 1e-12).astype(
                feats["flow"].dtype
            )
            frames = sams.generate_n_frames(params, stats, f, train=False)[2]
            return _tree_mean(frames)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    # one scan-body generator apply at representative eval inputs
    cd = sams.compute_dtype or jnp.float32
    N = sams.n_frames_total
    img = feats["image"]
    prev_frames0 = jnp.zeros(img.shape[:1] + (N - 1,) + img.shape[2:], cd)
    enc_maps = feats[sams_opt.encoder_input].astype(cd)
    prev_maps = enc_maps[:, : N - 1]
    current_maps = {k: feats[k][:, -1].astype(cd) for k in sams.inputs}

    @jax.jit
    def frame_chain(params, stats, prev_frames, prev_maps, current_maps,
                    iters):
        def body(i, acc):
            pf = prev_frames + (acc * 1e-12).astype(prev_frames.dtype)
            variables = {"params": params, **stats}
            out = sams.generator.apply(
                variables, pf, prev_maps, current_maps, train=False
            )
            return _tree_mean(out)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def clip_chain(warp_nets, sams_nets, batch, iters):
        def body(i, acc):
            frames = one_clip(warp_nets, sams_nets, _perturbed(batch, acc))
            return _tree_mean(frames)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    half = max(args.iters // 2, 5)
    t = {
        "features_ms": _measure(feat_chain, (device_batch,), args.iters),
        "gmm_warp_ms": _measure(gmm_chain, (warp_nets, feats), args.iters),
        "gen_frame_ms": _measure(
            frame_chain,
            (g.params, g.stats, prev_frames0, prev_maps, current_maps),
            args.iters,
        ),
        "gen_scan_ms": _measure(scan_chain, (g.params, g.stats, feats), half),
        "one_clip_ms": _measure(
            clip_chain, (warp_nets, sams_nets, device_batch), half
        ),
    }
    t = {k: round(v * 1e3, 2) for k, v in t.items()}
    t["scan_minus_5xframe_ms"] = round(
        t["gen_scan_ms"] - n_frames * t["gen_frame_ms"], 2
    )
    t["clip_minus_stages_ms"] = round(
        t["one_clip_ms"] - t["features_ms"] - t["gmm_warp_ms"]
        - t["gen_scan_ms"], 2
    )
    t["clip_fps"] = round(batch * n_frames / (t["one_clip_ms"] / 1e3), 2)
    t["device"] = jax.devices()[0].device_kind
    t["batch"] = batch
    print(json.dumps(t))


if __name__ == "__main__":
    main()
