"""Per-lever attribution of the SAMS train-step wall clock (VERDICT r3
item 6: push 21.6 -> >=30 f/s or record a measured dead end).

Measures the production train step (batch 4, 256x192, 5-frame clips,
--remat, precision 16) under ablations that isolate each candidate lever:

  * exact          — the CLI-default reference-exact per-optimizer step
  * fast           — --fast_gan_step (reuse the G clip for both D updates)
  * no_vgg         — wt_vgg=0 (isolates the VGG fwd+bwd cost)
  * f32_vgg        — VGG at f32 (the pre-round-4 behavior; the round-4
                     default runs VGG at the compute policy = bf16)
  * num_D_1        — temporal D weight 0 AND its update skipped is not a
                     semantics-preserving option, so instead: num_D=1
                     (halves the multiscale D pyramid) to size D cost

Prints one JSON line per config; paste the table into docs/PERF_NOTES.md.

    python tools/bench_train_ablate.py            # all ablations
    python tools/bench_train_ablate.py --configs exact fast
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import numpy as np


def measure(step, state, batch, steps=8):
    state, metrics = step(state, batch)  # compile + first step
    float(jax.device_get(metrics["loss"]))  # fetch: the only real barrier
    # on the axon tunnel (block_until_ready returns before execution ends)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = state
        for _ in range(steps):
            s, metrics = step(s, batch)
        loss = float(jax.device_get(metrics["loss"]))
        best = min(best, (time.perf_counter() - t0) / steps)
    assert np.isfinite(loss), loss
    return best


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", nargs="*", default=None)
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    from bench import TRAIN_BATCH, build_train

    configs = {
        "exact": {},
        "fast": {"fast_gan_step": True},
        "no_vgg": {"wt_vgg": 0.0},
        "f32_vgg": {},  # patched below
        "num_D_1": {"num_D": 1},
    }
    names = args.configs or list(configs)
    unknown = [n for n in names if n not in configs]
    if unknown:
        p.error(
            f"unknown --configs {unknown}; available: {sorted(configs)}"
        )
    print("device:", jax.devices()[0].device_kind)
    results = {}
    for name in names:
        kw = configs[name]
        model, state, step, batch, n_frames = build_train(TRAIN_BATCH, **kw)
        if name == "f32_vgg":
            # pre-round-4 behavior: VGG outside the compute policy
            from shineon_tpu.networks.loss import VGGLoss

            model.criterion_vgg = VGGLoss(
                variables=model.criterion_vgg.variables, dtype=None
            )
            step = model.make_train_step()
        dt = measure(step, state, batch, steps=args.steps)
        fps = TRAIN_BATCH * n_frames / dt
        results[name] = {"step_s": round(dt, 4), "fps": round(fps, 2)}
        print(json.dumps({"config": name, **results[name]}), flush=True)
    print(json.dumps({"ablation": results}))


if __name__ == "__main__":
    main()
