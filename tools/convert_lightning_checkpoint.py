"""Convert a reference PyTorch-Lightning checkpoint to ShineOn-TPU state.

Reference checkpoints (.ckpt, SURVEY §5.4 — e.g. the published Google-Drive
weights, docs/2_inference.md:3-5) store a torch ``state_dict`` whose module
names follow the reference model classes. This tool maps them onto the flax
parameter/stat trees of the corresponding ShineOn-TPU model and writes an
Orbax checkpoint loadable with ``--checkpoint``.

Currently implemented: WarpModel (GMM). Layout notes:
  * torch conv kernels OIHW -> flax HWIO;
  * BatchNorm weight/bias -> scale/bias params; running_mean/var -> batch_stats;
  * FeatureRegression's dense layer needs no permutation because the flax
    model flattens NHWC -> NCHW-order before the matmul (warp.py there).

Usage:
  python tools/convert_lightning_checkpoint.py --model warp \
      --ckpt gmm.ckpt --out converted/gmm
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _conv(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(np.asarray(sd[prefix + ".weight"]), (2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def _feature_extraction(sd, torch_prefix: str):
    """Reference FeatureExtraction Sequential plan (cpvton/warp.py:14-31):
    convs at indices 0,3,6,9,12,15; BNs at 2,5,8,11,14."""
    conv_idx = [0, 3, 6, 9, 12, 15]
    bn_idx = [2, 5, 8, 11, 14]
    params: Dict = {}
    stats: Dict = {}
    for i, t in enumerate(conv_idx):
        params[f"Conv_{i}"] = _conv(sd, f"{torch_prefix}.model.{t}")
    for i, t in enumerate(bn_idx):
        p, s = _bn(sd, f"{torch_prefix}.model.{t}")
        params[f"SyncBatchNorm_{i}"] = {"BatchNorm_0": p}
        stats[f"SyncBatchNorm_{i}"] = {"BatchNorm_0": s}
    return params, stats


def _feature_regression(sd, torch_prefix: str):
    """conv Sequential: convs at 0,3,6,9; BNs at 1,4,7,10; then .linear
    (cpvton/warp.py:70-99)."""
    params: Dict = {}
    stats: Dict = {}
    for i, t in enumerate([0, 3, 6, 9]):
        params[f"Conv_{i}"] = _conv(sd, f"{torch_prefix}.conv.{t}")
    for i, t in enumerate([1, 4, 7, 10]):
        p, s = _bn(sd, f"{torch_prefix}.conv.{t}")
        params[f"SyncBatchNorm_{i}"] = {"BatchNorm_0": p}
        stats[f"SyncBatchNorm_{i}"] = {"BatchNorm_0": s}
    w = np.asarray(sd[f"{torch_prefix}.linear.weight"])  # (out, in)
    params["Dense_0"] = {
        "kernel": w.T,
        "bias": np.asarray(sd[f"{torch_prefix}.linear.bias"]),
    }
    return params, stats


def convert_warp_state_dict(state_dict) -> Dict:
    """Reference WarpModel state_dict -> {'params': ..., 'batch_stats': ...}
    for shineon_tpu.networks.cpvton.GMM."""
    params: Dict = {}
    stats: Dict = {}
    for member in ("extractionA", "extractionB"):
        p, s = _feature_extraction(state_dict, member)
        params[member] = p
        stats[member] = s
    p, s = _feature_regression(state_dict, "regression")
    params["regression"] = p
    stats["regression"] = s
    return {"params": params, "batch_stats": stats}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=("warp",), required=True)
    parser.add_argument("--ckpt", required=True, help="Lightning .ckpt path")
    parser.add_argument("--out", required=True, help="output Orbax dir")
    args = parser.parse_args()

    import torch

    payload = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    state_dict = {k: v for k, v in state_dict.items()}

    if args.model == "warp":
        variables = convert_warp_state_dict(state_dict)
    else:
        raise NotImplementedError(args.model)

    from shineon_tpu.training.checkpointing import save_checkpoint

    save_checkpoint(args.out, variables)
    hparams = payload.get("hparams", payload.get("hyper_parameters"))
    print(f"converted {args.model} -> {args.out}")
    if hparams:
        print("stored train hparams:", {
            k: hparams[k] for k in sorted(hparams)
            if isinstance(hparams.get(k), (int, float, str))
        })


if __name__ == "__main__":
    main()
