"""Zenodo dataset downloads (reference scripts/download_datasets.py):
GIRAFE record 13773163; BAGLS record 3377544 (training.zip/test.zip/_readme.md
only, auto-extract).  NOTE: the build environment has zero egress — this
script is the user-facing tool for real deployments.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
import zipfile
from pathlib import Path

GIRAFE_RECORD = "13773163"
BAGLS_RECORD = "3377544"
BAGLS_KEEP = {"training.zip", "test.zip", "_readme.md"}


def _record_files(record: str) -> list[dict]:
    url = f"https://zenodo.org/api/records/{record}"
    with urllib.request.urlopen(url) as r:
        return json.load(r)["files"]


def _download(url: str, dest: Path) -> None:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        print(f"  exists: {dest}")
        return
    print(f"  downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)


def download_girafe(out_dir: Path) -> None:
    for f in _record_files(GIRAFE_RECORD):
        _download(f["links"]["self"], out_dir / f["key"])


def download_bagls(out_dir: Path) -> None:
    for f in _record_files(BAGLS_RECORD):
        if f["key"] not in BAGLS_KEEP:
            continue
        dest = out_dir / f["key"]
        _download(f["links"]["self"], dest)
        if dest.suffix == ".zip":
            target = out_dir / dest.stem
            if not target.exists():
                print(f"  extracting {dest}")
                with zipfile.ZipFile(dest) as z:
                    z.extractall(target)


def main() -> None:
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("dataset", choices=["girafe", "bagls", "all"])
    p.add_argument("--output-dir", default="data")
    args = p.parse_args()
    out = Path(args.output_dir)
    try:
        if args.dataset in ("girafe", "all"):
            download_girafe(out / "GIRAFE")
        if args.dataset in ("bagls", "all"):
            download_bagls(out / "BAGLS")
    except OSError as e:
        print(f"download failed (no network?): {e}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
