"""Shared dataset fetcher driven by the catalog manifest.

Parity target: the reference ships ~60 dataset dirs, each with a
``run.sh`` that wgets preprocessed data from a public bucket and a
``data_process.sh`` for raw conversion (/root/reference/datasets/
readme.md).  Here ONE fetcher serves every dataset from
``manifest.py``:

    python datasets/fetch.py --dataset criteo            # download+extract
    python datasets/fetch.py --dataset criteo --synth    # offline fallback
    python datasets/fetch.py --list

Downloads land in ``datasets/<name>/raw/``; archives are extracted; a
``train/``+``test/`` layout is created when the filenames imply one.
``--synth`` generates schema-correct synthetic data via
``datasets/synthesize.py`` for the datasets it knows — the offline path
for egress-less environments (documented in each run.sh).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tarfile
import urllib.request
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from manifest import MANIFEST  # noqa: E402


def download(url: str, dest: str) -> str:
    os.makedirs(dest, exist_ok=True)
    name = url.rstrip("/").rsplit("/", 1)[-1]
    out = os.path.join(dest, name)
    if os.path.exists(out):
        print(f"have {name}")
        return out
    print(f"fetching {url}")
    tmp = out + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, out)
    return out


def extract(path: str, dest: str) -> None:
    if path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path) as t:
            t.extractall(dest, filter="data")
    elif path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest)
    elif path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as src, open(path[:-3], "wb") as out:
            shutil.copyfileobj(src, out)


def layout_train_test(raw_dir: str, base: str) -> None:
    """Move files whose names imply a split into train/ and test/."""
    for root, _dirs, files in os.walk(raw_dir):
        for f in files:
            low = f.lower()
            sub = None
            if "train" in low:
                sub = "train"
            elif "test" in low or "valid" in low:
                sub = "test"
            if sub:
                os.makedirs(os.path.join(base, sub), exist_ok=True)
                shutil.copy2(
                    os.path.join(root, f), os.path.join(base, sub, f)
                )


def fetch(name: str) -> int:
    entry = MANIFEST.get(name)
    if entry is None:
        print(f"unknown dataset {name!r}; --list shows the catalog")
        return 2
    if not entry["urls"]:
        print(
            f"{name}: no public mirror in the manifest (the reference's "
            "run.sh builds it locally — see its ref_scripts: "
            f"{entry['ref_scripts']}); use --synth for schema-correct "
            "synthetic data"
        )
        return 1
    base = os.path.join(HERE, name)
    raw = os.path.join(base, "raw")
    for url in entry["urls"]:
        try:
            path = download(url, raw)
        except Exception as e:
            print(f"download failed ({e}); this environment may have no "
                  "egress — use --synth for synthetic data")
            return 1
        extract(path, raw)
    layout_train_test(raw, base)
    print(f"{name}: ready under {base}")
    return 0


def synth(name: str) -> int:
    from synthesize import synthesize_dataset  # noqa: E402

    return synthesize_dataset(name, os.path.join(HERE, name))


def main(argv=None):
    p = argparse.ArgumentParser(description="dataset fetcher")
    p.add_argument("--dataset")
    p.add_argument("--list", action="store_true")
    p.add_argument("--synth", action="store_true",
                   help="generate schema-correct synthetic data instead")
    args = p.parse_args(argv)
    if args.list or not args.dataset:
        for k, v in MANIFEST.items():
            tag = f"{len(v['urls'])} url(s)" if v["urls"] else "local-build"
            print(f"{k:32s} {tag}")
        return 0
    if args.synth:
        return synth(args.dataset)
    return fetch(args.dataset)


if __name__ == "__main__":
    sys.exit(main())
