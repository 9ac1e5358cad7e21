#!/usr/bin/env python
"""Fetch (or validate) the reference's trained checkpoints + demo data.

The reference distributes its trained weights and CityFlow demo data as a Google
Drive folder (reference README.md:56-60):

    https://drive.google.com/open?id=1MRuA12odExKqBiMcYJAl2QSFAhggfaCu

Drive folders cannot be fetched with plain HTTP (the folder listing requires the
Drive API or an interactive session), so this script:

1. checks connectivity and, when a direct `--file-id` is given, downloads that
   single file via the public `uc?export=download` endpoint (pure urllib — no
   gdown dependency);
2. otherwise prints the exact offline procedure (gdown one-liner on any
   connected machine + the expected on-disk layout);
3. with `--check`, validates an existing checkpoints directory against the
   layout the model-zoo loader expects (run_test.py:54-87 /
   pipeline/checkpoint._convert_reference_model_zoo) and reports what is
   present, missing, and already-converted.

Once the files are in place, the fidelity sign-off is one command:

    python tools/ssim_signoff.py <video_dir> <kpoints_dir> <checkpoints_dir> \
        --reference-results <dir-of-reference-pngs> --select-ids <id> --frame-id <n>
"""
from __future__ import annotations

import argparse
import sys
import urllib.error
import urllib.request
from pathlib import Path

DRIVE_FOLDER_ID = "1MRuA12odExKqBiMcYJAl2QSFAhggfaCu"

# run_test.py:54-87 + inpaint_utils.py:14 — the files load_reference_model_zoo reads.
EXPECTED_FILES = [
    ("cads/model.pth", "VGG19 CAD classifier head"),
    ("kpoints/hourglass.pth", "2-stack hourglass keypoint net"),
    ("icn/256_synth/gnet_00020.pth", "ICN (Warp&Learn) generator"),
    ("vunet/256/vunet.pth", "VUNet generator"),
    ("inpainting/EdgeModel_gen.pth", "EdgeConnect edge generator"),
    ("inpainting/InpaintingModel_gen.pth", "EdgeConnect inpaint generator"),
    ("inpainting/config.yml", "EdgeConnect config"),
]
OPTIONAL_FILES = [
    ("maskrcnn/maskrcnn.pth", "torchvision Mask R-CNN state dict (optional)"),
]


def check_layout(root: Path) -> int:
    missing = []
    print(f"Checking checkpoint layout under {root}:")
    for rel, desc in EXPECTED_FILES:
        p = root / rel
        status = "OK " if p.exists() else "MISSING"
        if not p.exists():
            missing.append(rel)
        print(f"  [{status:>7}] {rel:45s} {desc}")
    for rel, desc in OPTIONAL_FILES:
        p = root / rel
        print(f"  [{'OK ' if p.exists() else 'absent ':>7}] {rel:45s} {desc}")
    conv = root / ".converted_zoo"
    print(f"  converted-zoo cache: {'present' if conv.exists() else 'not yet built'}")
    if missing:
        print(f"\n{len(missing)} required file(s) missing.")
        return 1
    print("\nAll required checkpoint files present.")
    return 0


def download_file(file_id: str, dest: Path, timeout: float = 30.0) -> int:
    url = f"https://drive.google.com/uc?export=download&id={file_id}"
    print(f"Fetching {url} -> {dest}")
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            dest.parent.mkdir(parents=True, exist_ok=True)
            with open(dest, "wb") as f:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
        print(f"Wrote {dest} ({dest.stat().st_size} bytes)")
        return 0
    except (urllib.error.URLError, OSError, TimeoutError) as exc:
        print(f"Download failed ({exc}).", file=sys.stderr)
        return 1


def print_offline_procedure(dest: Path) -> None:
    print(
        f"""
This environment appears to be offline (or the Drive folder needs the API).
On any connected machine:

    pip install gdown
    gdown --folder https://drive.google.com/drive/folders/{DRIVE_FOLDER_ID} -O fusg_data

then copy `fusg_data/checkpoints` to: {dest}
(plus `fusg_data/pascal_cads` and a CityFlow `<video_dir>` for the demo).

Validate with:   python tools/fetch_checkpoints.py {dest} --check
Sign off SSIM:   python tools/ssim_signoff.py <video_dir> <kpoints_dir> {dest} \\
                     --reference-results <reference ./results dir> \\
                     --select-ids <vehicle id> --frame-id <frame>
"""
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("dest", type=Path, help="checkpoints directory")
    p.add_argument("--check", action="store_true",
                   help="only validate an existing layout")
    p.add_argument("--file-id", type=str, default=None,
                   help="download one Drive file id to dest (expects dest to be "
                        "the full target file path in that case)")
    args = p.parse_args(argv)

    if args.check:
        return check_layout(args.dest)
    if args.file_id:
        return download_file(args.file_id, args.dest)

    # Probe connectivity with a tiny request before advising.
    try:
        urllib.request.urlopen("https://drive.google.com", timeout=5).read(64)
        online = True
    except Exception:
        online = False
    if not online:
        print_offline_procedure(args.dest)
        return 1
    print(
        "Connected — but Drive folder listings need the Drive API; use gdown for "
        "the folder, or --file-id for individual files:"
    )
    print_offline_procedure(args.dest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
