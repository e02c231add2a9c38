"""Independent FLOP census of the SamsGenerator forward from lowered HLO.

VERDICT r3 (weak #2): the MFU story moved 6x on accounting between rounds, so
``bench.py::_analytic_generator_flops`` needs an INDEPENDENT cross-check
before "near the compute roofline" is trusted. This tool does not share a
line of arithmetic with the analytic count: it lowers the actual generator
forward with jax.jit(...).lower(), walks the StableHLO module text, and sums
FLOPs per `stablehlo.convolution` / `stablehlo.dot_general` op from the
tensor types XLA itself will compile — every conv the model really runs, at
the shapes it really runs them, enumerated rather than derived.

    python tools/flop_census.py [--batch 16]

Prints a per-shape table and the total, then compares against the analytic
count and exits nonzero if they disagree by more than 10%.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import re
import sys
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# default: census the full-precision serving graph (what the analytic count
# models); --int8 switches to the int8 serving graph (main() re-sets this
# before the model is built — the env is read at trace time)
os.environ["SHINEON_INT8_SPADE"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

CONV_RE = re.compile(
    r"stablehlo\.convolution\(.*?\)"
    r".*?:\s*\(tensor<([0-9x]+)x([a-z0-9]+)>,\s*tensor<([0-9x]+)x[a-z0-9]+>\)"
    r"\s*->\s*tensor<([0-9x]+)x[a-z0-9]+>",
    re.DOTALL,
)
def _dims(s: str) -> list[int]:
    return [int(d) for d in s.split("x")]


def census(hlo_text: str):
    """Sum convolution FLOPs from StableHLO text; returns (total, by_shape).

    dot_general ops (spectral-norm power-iteration matvecs) are excluded:
    they are O(C^2) per layer vs the convs' O(H*W*C^2) — five orders of
    magnitude below the table's resolution. The analytic count excludes
    them too, so the comparison is like-for-like."""
    total = 0.0
    by_shape: dict[str, list] = defaultdict(lambda: [0, 0.0])
    for m in CONV_RE.finditer(hlo_text):
        lhs = _dims(m.group(1))
        dtype = m.group(2)
        ker = _dims(m.group(3))
        out = _dims(m.group(4))
        # jax lowers NHWC convs with kernel [kh, kw, cin/g, cout] (HWIO);
        # MACs per output element = kh * kw * cin_per_group
        out_elems = float(np.prod(out))
        macs = float(np.prod(ker[:-1]))  # kh * kw * cin_per_group
        fl = 2.0 * out_elems * macs
        total += fl
        key = (
            f"conv {'x'.join(map(str, ker))} -> "
            f"{'x'.join(map(str, out))} [{dtype}]"
        )
        by_shape[key][0] += 1
        by_shape[key][1] += fl
    return total, by_shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=None,
                    help="optionally append the table to this markdown file")
    ap.add_argument("--int8", action="store_true",
                    help="census the int8 serving graph (the bench default) "
                    "instead of the fp graph; skips the analytic comparison "
                    "(the analytic count models the fp formulation)")
    ap.add_argument("--json", default=None,
                    help="write the full per-shape table as JSON (consumed "
                    "by tools/serving_roof_census.py)")
    args = ap.parse_args()

    if args.int8:
        os.environ["SHINEON_INT8_SPADE"] = "1"

    from __graft_entry__ import _raw_batch, _sams_opt
    from shineon_tpu.models.sams_model import SamsModel

    opt = _sams_opt(is_train=False, batch_size=args.batch)
    model = SamsModel(opt)
    state = model.init_state(jax.random.PRNGKey(420), 1)
    raw = _raw_batch(opt, batch=args.batch)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    feats = jax.jit(model.features)(batch)

    gen = state.nets["generator"]

    # the generator is exercised through generate_n_frames; lower that and
    # divide by n_frames for the per-forward number
    def clip(params, stats, feats):
        return model.generate_n_frames(params, stats, feats, train=False)[2]

    lowered = jax.jit(clip).lower(gen.params, gen.stats, feats)
    text = lowered.as_text()
    total, by_shape = census(text)
    n = opt.n_frames_total
    # the frame loop is a lax.scan -> ONE stablehlo.while whose body text
    # appears once, so the census total IS the per-forward count (verified:
    # e.g. 16 instances of the 3x3x128x128 full-res conv = decode_3's
    # 2 spades x 4 labels x [gamma, beta] per single forward)
    per_fwd = total

    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from bench import _analytic_generator_flops

    analytic = _analytic_generator_flops(args.batch)

    rows = sorted(by_shape.items(), key=lambda kv: -kv[1][1])
    if args.json:
        import json as _json

        payload = [
            {"shape": key, "count": cnt, "flops": fl}
            for key, (cnt, fl) in rows
        ]
        with open(args.json, "w") as f:
            _json.dump({"batch": args.batch,
                        "int8": bool(args.int8),
                        "total_flops": per_fwd,
                        "convs": payload}, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)
    lines = [
        f"HLO census of generate_n_frames (batch {args.batch}, "
        f"{n}-frame scan whose body lowers once, "
        f"{'int8' if args.int8 else 'fp'} serving graph):",
        "",
        "| op shape | count/forward | TFLOP |",
        "|---|---|---|",
    ]
    for key, (cnt, fl) in rows[:20]:
        lines.append(f"| `{key}` | {cnt} | {fl/1e12:.3f} |")
    lines += [
        "",
        f"- per generator forward (scan body + prologue): "
        f"{per_fwd/1e12:.2f} TFLOP",
        f"- analytic count (bench._analytic_generator_flops): "
        f"{analytic/1e12:.2f} TFLOP",
        f"- ratio census/analytic: {per_fwd/analytic:.3f}",
    ]
    report = "\n".join(lines)
    print(report)
    if args.out:
        with open(args.out, "a") as f:
            f.write("\n" + report + "\n")
    if args.int8:
        # the analytic count models the fp formulation; the int8 graph merges
        # [gamma|beta] convs (same FLOPs) but the census is informational here
        sys.exit(0)
    ok = abs(per_fwd / analytic - 1.0) < 0.10
    print("AGREE within 10%" if ok else "DISAGREE by >10%")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
