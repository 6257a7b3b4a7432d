"""Pack an ImageFolder dataset into the uint8 streaming cache.

Usage: python scripts/pack.py --src .e2e_data --out .e2e_data_packed \
           [--px 256] [--splits train validation]
See lemevit_tpu/data/packed.py for format + tradeoffs.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--px", type=int, default=256)
    ap.add_argument("--splits", nargs="*",
                    default=["train", "validation"])
    args = ap.parse_args()

    from lemevit_tpu.data.packed import pack_folder

    for split in args.splits:
        src = os.path.join(args.src, split)
        if not os.path.isdir(src):
            print(f"skip {split}: {src} not found")
            continue
        meta = pack_folder(src, os.path.join(args.out, split), px=args.px)
        print(split, meta["n"], "samples @", meta["px"], "px")


if __name__ == "__main__":
    main()
