"""Convert a reference PyTorch-Lightning checkpoint to ShineOn-TPU state.

Reference checkpoints (.ckpt, SURVEY §5.4 — e.g. the published Google-Drive
weights, docs/2_inference.md:3-5) store a torch ``state_dict`` whose module
names follow the reference model classes. This tool maps them onto the flax
parameter/stat trees of the corresponding ShineOn-TPU model and writes an
Orbax checkpoint loadable with ``--checkpoint``.

Implemented: WarpModel (GMM), UnetMaskModel (TOM), SamsModel (generator).
Layout notes:
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
    parser.add_argument("--model", choices=("warp", "unet_mask", "sams"), required=True)
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
    elif args.model == "sams":
        # generator only — discriminators are training-time machinery; pass
        # the architecture powers if the run changed them from the defaults
        hp = payload.get("hparams", payload.get("hyper_parameters")) or {}
        variables = convert_sams_generator_state_dict(
            state_dict,
            ngf_base=int(hp.get("ngf_base", 2)),
            ngf_pow_outer=int(hp.get("ngf_pow_outer", 6)),
            ngf_pow_inner=int(hp.get("ngf_pow_inner", 10)),
            ngf_pow_step=int(hp.get("ngf_pow_step", 1)),
        )
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


# ------------------------------------------------------------- SAMS generator

def _spectral_conv(sd, prefix: str, has_bias: bool = True):
    """torch spectral_norm conv -> (params, (sigma, u)).

    torch stores weight_orig/weight_u/weight_v (left/right singular-vector
    power-iteration state); flax SpectralNorm stores u (shape (1, out)) and
    RECOMPUTES sigma with one power step from it at every call, so we carry
    kernel = weight_orig plus torch's converged u. With a trained checkpoint
    the one extra power step changes sigma negligibly (documented tolerance in
    the parity test)."""
    w = np.asarray(sd[prefix + ".weight_orig"])
    u = np.asarray(sd[prefix + ".weight_u"])  # (out_channels,)
    v = np.asarray(sd[prefix + ".weight_v"])
    mat = w.reshape(w.shape[0], -1)
    sigma = float(u @ (mat @ v))
    params = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if has_bias and prefix + ".bias" in sd:
        params["bias"] = np.asarray(sd[prefix + ".bias"])
    return params, (sigma, u.reshape(1, -1).astype(np.float32))


def _spade(sd, torch_prefix: str):
    """One SPADE (sams/spade.py:61-103): param-free norm running stats +
    mlp_shared/gamma/beta convs. Returns (params, stats)."""
    params = {
        "mlp_shared": _conv(sd, f"{torch_prefix}.mlp_shared.0"),
        "mlp_gamma": _conv(sd, f"{torch_prefix}.mlp_gamma"),
        "mlp_beta": _conv(sd, f"{torch_prefix}.mlp_beta"),
    }
    stats = {}
    rm = f"{torch_prefix}.param_free_norm.running_mean"
    if rm in sd:
        stats["SyncBatchNorm_0"] = {"BatchNorm_0": {
            "mean": np.asarray(sd[rm]),
            "var": np.asarray(sd[f"{torch_prefix}.param_free_norm.running_var"]),
        }}
    return params, stats


def _spade_stack(sd, torch_prefix: str):
    """SPADE / MultiSpade / AttentiveMultiSpade by key signature."""
    params, stats = {}, {}
    if f"{torch_prefix}.mlp_shared.0.weight" in sd:  # plain SPADE
        return _spade(sd, torch_prefix)
    # MultiSpade / AttentiveMultiSpade: spade_layers.<key>
    keys = sorted({
        k.split(".")[len(torch_prefix.split(".")) + 1]
        for k in sd
        if k.startswith(torch_prefix + ".spade_layers.")
    })
    for key in keys:
        p, s = _spade(sd, f"{torch_prefix}.spade_layers.{key}")
        params[f"spade_{key}"] = p
        if s:
            stats[f"spade_{key}"] = s
    if f"{torch_prefix}.attention_layer.query_conv.weight" in sd:
        params["attention_layer"] = _attn_params(sd, f"{torch_prefix}.attention_layer")
        params["mlp_final"] = _conv(sd, f"{torch_prefix}.mlp_final.0")
    return params, stats


def _spade_resblock(sd, torch_prefix: str):
    """AnySpadeResBlock (sams/spade.py:106-192). SpectralNorm stat entries are
    ordered shortcut-first to match the flax call order."""
    params, stats = {}, {}
    learned_shortcut = f"{torch_prefix}.conv_s.weight_orig" in sd
    sn_entries = []
    if learned_shortcut:
        p, sn = _spectral_conv(sd, f"{torch_prefix}.conv_s", has_bias=False)
        params["conv_s"] = p
        sn_entries.append(("conv_s", sn))
        sp, ss = _spade_stack(sd, f"{torch_prefix}.norm_s")
        params["norm_s"] = sp
        if ss:
            stats["norm_s"] = ss
    for conv in ("conv_0", "conv_1"):
        if f"{torch_prefix}.{conv}.weight_orig" in sd:
            p, sn = _spectral_conv(sd, f"{torch_prefix}.{conv}")
            sn_entries.append((conv, sn))
        else:  # non-spectral norm_G
            p = _conv(sd, f"{torch_prefix}.{conv}")
        params[conv] = p
    for spade in ("spade_0", "spade_1"):
        sp, ss = _spade_stack(sd, f"{torch_prefix}.{spade}")
        params[spade] = sp
        if ss:
            stats[spade] = ss
    for i, (conv, (sigma, u)) in enumerate(sn_entries):
        stats[f"SpectralNorm_{i}"] = {
            f"{conv}/kernel/sigma": np.asarray(sigma, np.float32),
            f"{conv}/kernel/u": u,
        }
    return params, stats


def convert_sams_generator_state_dict(
    state_dict, torch_prefix: str = "generator",
    ngf_base: int = 2, ngf_pow_outer: int = 6, ngf_pow_inner: int = 10,
    ngf_pow_step: int = 1,
) -> Dict:
    """Reference SamsGenerator state_dict -> flax variables.

    torch layer lists (sams_generator.py:133-212): encode_layers =
    [Conv2d] + [resblock, Upsample]*; middle_layers = [resblock]*;
    decode_layers = [Upsample, resblock]* + [Conv2d]."""
    import re

    params: Dict = {}
    stats: Dict = {}

    def block_indices(list_name):
        idx = set()
        pat = re.compile(
            re.escape(f"{torch_prefix}.{list_name}.") + r"(\d+)\.")
        for k in state_dict:
            m = pat.match(k)
            if m:
                idx.add(int(m.group(1)))
        return sorted(idx)

    enc_count = len(range(ngf_pow_outer, ngf_pow_inner, ngf_pow_step))
    pows_end = ngf_pow_outer + enc_count * ngf_pow_step
    has_extra = int(ngf_base ** pows_end) != int(ngf_base ** ngf_pow_inner)

    # encoder: index 0 = input conv, resblocks at 1, 3, 5, ...
    enc_idx = block_indices("encode_layers")
    params["encode_conv_in"] = _conv(state_dict, f"{torch_prefix}.encode_layers.0")
    res_positions = [i for i in enc_idx if i != 0]
    for n, i in enumerate(res_positions):
        name = "encode_extra" if (has_extra and n == len(res_positions) - 1) \
            else f"encode_{n}"
        p, s = _spade_resblock(state_dict, f"{torch_prefix}.encode_layers.{i}")
        params[name] = p
        if s:
            stats[name] = s

    for n, i in enumerate(block_indices("middle_layers")):
        p, s = _spade_resblock(state_dict, f"{torch_prefix}.middle_layers.{i}")
        params[f"middle_{n}"] = p
        if s:
            stats[f"middle_{n}"] = s

    dec_idx = block_indices("decode_layers")
    out_conv_i = max(dec_idx)
    res_positions = [i for i in dec_idx if i != out_conv_i]
    for n, i in enumerate(res_positions):
        name = "decode_extra" if (has_extra and n == len(res_positions) - 1) \
            else f"decode_{n}"
        p, s = _spade_resblock(state_dict, f"{torch_prefix}.decode_layers.{i}")
        params[name] = p
        if s:
            stats[name] = s
    params["decode_conv_out"] = _conv(
        state_dict, f"{torch_prefix}.decode_layers.{out_conv_i}"
    )
    return {"params": params, "batch_stats": stats}
