"""Dataset download helper (reference: data_download.py:33-54).

The reference fetches the resized VITON tarball from a Google Drive share and
unpacks it into ``data/``. This script does the same when invoked with
``--download`` (requires network egress; the tarball is the VITON-resize
distribution the reference pins by Drive file id), and can verify a local
copy's layout for any of the supported datasets either way — the verification
is what the hermetic test environment exercises.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import os.path as osp
import re
import shutil
import sys
import tarfile

# the reference's pinned Google Drive file id for viton_resize.tar.gz
VITON_DRIVE_ID = "1MxCUvKxejnwWnoZ-KoCyMCXo3TLhRuTo"

EXPECTED = {
    "viton": ["{root}/train/image", "{root}/train/cloth", "{root}/train/image-parse",
              "{root}/train/pose", "{root}/train_pairs.txt"],
    "vvt": ["{root}/train/train_frames", "{root}/train/train_frames_parsing",
            "{root}/train/train_frames_keypoint", "{root}/clothes_person/img"],
    "mpv": ["{root}/all", "{root}/all_parsing", "{root}/all_poseA_poseB_clothes_0607.txt"],
}


def _stream_to_file(response, filename: str) -> None:
    total = response.headers.get("content-length")
    with open(filename, "wb") as f:
        if total is None:
            f.write(response.content)
            return
        done, total = 0, int(total)
        for chunk in response.iter_content(
            chunk_size=max(total // 1000, 1024 * 1024)
        ):
            done += len(chunk)
            f.write(chunk)
            bar = int(50 * done / total)
            sys.stdout.write("\r[{}{}]".format("#" * bar, "." * (50 - bar)))
            sys.stdout.flush()
    sys.stdout.write("\n")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_viton(root: str, sha256: str | None = None) -> None:
    """Fetch + unpack the VITON resize tarball into ``root`` (train/ test/)."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - env without requests
        raise SystemExit(
            "downloading needs the 'requests' package and network egress; "
            f"unavailable here ({e}). Obtain viton_resize.tar.gz out of band "
            "and extract train/ test/ under the dataset root."
        )

    url = f"https://drive.google.com/uc?export=download&confirm=CONFIRM&id={VITON_DRIVE_ID}"
    probe = requests.get(url)
    codes = re.findall("confirm=(.{4})", probe.text)
    if codes:
        url = url.replace("CONFIRM", codes[0])
    os.makedirs(root, exist_ok=True)
    tar_path = osp.join(root, "viton_resize.tar.gz")
    print("[*] Downloading VITON resize tarball...")
    _stream_to_file(requests.get(url, stream=True, cookies=probe.cookies), tar_path)

    if sha256 is not None:
        actual = _sha256(tar_path)
        if actual != sha256.lower():
            os.remove(tar_path)
            raise SystemExit(
                f"tarball checksum mismatch: expected {sha256}, got {actual}"
            )
    else:
        print(
            f"[!] no --sha256 pin given; downloaded tarball hashes to "
            f"{_sha256(tar_path)} — pass it next time to verify"
        )

    print("[*] Extracting...")
    # filter="data" rejects absolute paths / ".." traversal / device nodes in
    # a tampered tarball (tarfile extraction filter, Python >= 3.12 semantics)
    tarfile.open(tar_path).extractall(path=root, filter="data")
    for split in ("test", "train"):
        src = osp.join(root, "viton_resize", split)
        dst = osp.join(root, split)
        if osp.isdir(src) and not osp.exists(dst):
            shutil.move(src, dst)
    if osp.isdir(osp.join(root, "viton_resize")):
        os.rmdir(osp.join(root, "viton_resize"))
    os.remove(tar_path)


def verify(dataset: str, root: str) -> int:
    missing = [
        p.format(root=root)
        for p in EXPECTED[dataset]
        if not osp.exists(p.format(root=root))
    ]
    if missing:
        print(f"{dataset} layout INCOMPLETE under {root}; missing:")
        for m in missing:
            print("  -", m)
        print(
            "\nObtain the dataset from its original distribution (VITON resize "
            "tarball / FW-GAN VVT / MPV) and extract it to the paths above."
        )
        return 1
    print(f"{dataset} layout OK under {root}")
    return 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", choices=sorted(EXPECTED), default="viton")
    parser.add_argument("--root", required=True, help="dataset root")
    parser.add_argument(
        "--download", action="store_true",
        help="fetch the VITON resize tarball into --root first "
             "(viton only; needs network egress)",
    )
    parser.add_argument(
        "--sha256", default=None,
        help="pin the tarball's sha256; the download aborts on mismatch",
    )
    args = parser.parse_args()

    if args.download:
        if args.dataset != "viton":
            raise SystemExit(
                "only the VITON tarball has a pinned public link; VVT and MPV "
                "must be obtained from their original distributions"
            )
        download_viton(args.root, sha256=args.sha256)
    sys.exit(verify(args.dataset, args.root))


if __name__ == "__main__":
    main()
