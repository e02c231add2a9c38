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




def _collect_block_children(sd, prefix: str):
    """Classify the children of one UnetSkipConnectionBlock Sequential.

    Returns an ordered list of (kind, torch_prefix) with kind in
    {conv, norm, attn, submodule} — norm only appears for the batch-norm
    variant (InstanceNorm2d affine=False has no parameters)."""
    import re

    indices = {}
    pat = re.compile(re.escape(prefix) + r"\.model\.(\d+)(\.|$)")
    for key in sd:
        m = pat.match(key)
        if m:
            indices.setdefault(int(m.group(1)), []).append(key)
    children = []
    for i in sorted(indices):
        keys = indices[i]
        base = f"{prefix}.model.{i}"
        if any(k.startswith(base + ".model.") for k in keys):
            children.append(("submodule", base))
        elif any(k.startswith(base + ".query_conv") for k in keys):
            children.append(("attn", base))
        elif any(k == base + ".running_mean" for k in keys):
            children.append(("norm", base))
        elif any(k == base + ".weight" for k in keys):
            children.append(("conv", base))
    return children


def _attn_params(sd, prefix: str):
    out = {}
    for name in ("query_conv", "key_conv", "value_conv"):
        out[name] = _conv(sd, f"{prefix}.{name}")
    out["gamma"] = np.asarray(sd[prefix + ".gamma"]).reshape(1)
    return out


def convert_unet_block(sd, torch_prefix: str):
    """Recursively convert one UnetSkipConnectionBlock (cpvton/unet.py:103-198).

    Sequential order inside a block: downconv [, downnorm][, down_attn]
    [, submodule], then upconv [, upnorm][, up_attn] — activations/upsamples
    carry no parameters and are invisible in the state_dict."""
    children = _collect_block_children(sd, torch_prefix)
    params = {}
    stats = {}
    conv_seen = 0
    norm_seen = 0
    before_upconv = True
    for kind, base in children:
        if kind == "conv":
            conv_seen += 1
            if conv_seen == 1:
                params["downconv"] = _conv(sd, base)
            else:
                params["upconv"] = _conv(sd, base)
                before_upconv = False
        elif kind == "attn":
            name = "down_attn" if before_upconv and conv_seen == 1 else "up_attn"
            params[name] = _attn_params(sd, base)
        elif kind == "norm":
            p, s = _bn(sd, base)
            params[f"SyncBatchNorm_{norm_seen}"] = {"BatchNorm_0": p}
            stats[f"SyncBatchNorm_{norm_seen}"] = {"BatchNorm_0": s}
            norm_seen += 1
        elif kind == "submodule":
            sub_p, sub_s = convert_unet_block(sd, base)
            params["submodule"] = sub_p
            if sub_s:
                stats["submodule"] = sub_s
            before_upconv = False
    return params, stats


def convert_unet_state_dict(state_dict, torch_prefix: str = "unet") -> Dict:
    """Reference UnetGenerator state_dict (TOM: instance norm) -> flax
    variables for shineon_tpu.networks.cpvton.UnetGenerator."""
    params, stats = convert_unet_block(state_dict, f"{torch_prefix}.model")
    out = {"params": {"model": params}}
    if stats:
        out["batch_stats"] = {"model": stats}
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", choices=("warp", "unet_mask"), required=True)
    parser.add_argument("--ckpt", required=True, help="Lightning .ckpt path")
    parser.add_argument("--out", required=True, help="output Orbax dir")
    args = parser.parse_args()

    import torch

    payload = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    state_dict = {k: v for k, v in state_dict.items()}

    if args.model == "warp":
        variables = convert_warp_state_dict(state_dict)
    elif args.model == "unet_mask":
        variables = convert_unet_state_dict(state_dict)
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
