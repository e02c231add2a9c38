"""Host input-pipeline scaling: real VVT dataset + DataLoader throughput
vs the chip's serving demand (VERDICT r2 item 9).

Builds a synthetic VVT fixture at production resolution, then measures the
REAL host pipeline (native PNG batch decode -> crop -> per-frame feature
assembly -> collate) at 1/2/4/8 loader workers. The number that matters is
frames/sec vs the device's serving rate (bench.py `infer_fps`).

    python tools/bench_input_pipeline.py [--frames 24] [--videos 4]

Results are recorded in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--videos", type=int, default=4)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n_frames", type=int, default=5)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=192)
    p.add_argument("--workers", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from fixtures import make_vvt_fixture

    from shineon_tpu.datasets import find_dataset_using_name
    from shineon_tpu.datasets.loader import DataLoader
    from __graft_entry__ import _sams_opt

    root = tempfile.mkdtemp(prefix="shineon_pipe_")
    data_root = osp.join(root, "vvt")
    make_vvt_fixture(data_root, n_videos=args.videos, frames=args.frames,
                     datamode="train", seed=0,
                     height=args.height, width=args.width)

    opt = _sams_opt(
        vvt_dataroot=data_root, fine_height=args.height,
        fine_width=args.width, n_frames_total=args.n_frames,
        n_frames_now=args.n_frames, batch_size=args.batch,
    )
    ds_cls = find_dataset_using_name("vvt")
    dataset = ds_cls(opt)
    print(f"dataset: {len(dataset)} samples x {args.n_frames} frames, "
          f"batch {args.batch}")

    for workers in args.workers:
        loader = DataLoader(
            dataset, batch_size=args.batch, shuffle=True, workers=workers,
            drop_last=True, process_index=0, process_count=1,
        )
        nb = len(loader)
        # warm one epoch (page cache, lazy inits)
        for _ in loader:
            pass
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            n = 0
            for batch in loader:
                n += 1
            dt = time.perf_counter() - t0
            best = min(best, dt / max(n, 1))
        fps = args.batch * args.n_frames / best
        print(f"workers={workers}: {best*1e3:7.1f} ms/batch -> "
              f"{fps:7.1f} frames/sec host throughput")


if __name__ == "__main__":
    main()
