"""Input-pipeline throughput benchmark (host decode + augment).

The model side of the bench is device-bound; this measures whether
data/loader.py (PIL decode in Python threads) can FEED it. Synthesizes a
JPEG ImageFolder at --size px (ImageNet train JPEGs average ~400-500 px),
then measures end-to-end Loader throughput (decode -> RRC -> flip ->
RandAugment -> collate) and the decode-only floor, at several thread
counts. Targets (one v5e chip, bs 256): each variant's model img/s —
the pipeline must at least match the slowest consumer it feeds.

Writes LOADERBENCH.json at the repo root; exits nonzero on failure.
"""
import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def make_dataset(root, n_images, size, quality=85):
    rng = np.random.RandomState(0)
    cls = os.path.join(root, "class0")
    os.makedirs(cls, exist_ok=True)
    # one random payload re-encoded n times (decode cost is content-
    # independent at fixed size/quality); unique files to defeat caching
    arr = rng.randint(0, 256, (size, size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    payload = buf.getvalue()
    for i in range(n_images):
        with open(os.path.join(cls, f"img_{i:05d}.jpg"), "wb") as f:
            f.write(payload)
    return root


def bench(loader, min_batches=4, min_seconds=3.0):
    t0 = time.perf_counter()
    seen = 0
    batches = 0
    while time.perf_counter() - t0 < min_seconds or batches < min_batches:
        got = False
        for batch in loader:
            seen += batch["image"].shape[0]
            batches += 1
            got = True
            if (time.perf_counter() - t0 >= min_seconds
                    and batches >= min_batches):
                break
        if not got:
            break
    dt = time.perf_counter() - t0
    return seen / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=4096)
    ap.add_argument("--size", type=int, default=480)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--threads", type=int, nargs="*", default=[1, 4])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "LOADERBENCH.json"))
    args = ap.parse_args()

    from lemevit_tpu.data.datasets import ImageFolderDataset
    from lemevit_tpu.data.loader import create_loader
    from lemevit_tpu.data.transforms import (build_eval_transform,
                                             build_native_eval_transform,
                                             build_native_train_transform,
                                             build_train_transform)

    results = {"img_px": args.size, "batch_size": args.batch_size,
               "n_images": args.n_images, "host_cores": os.cpu_count(),
               "targets_img_s": {"lemevit_tiny": 6261, "lemevit_small": 4409,
                                 "lemevit_base": 2949}}
    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, args.n_images, args.size)
        for name, tf in [
                ("train_aug", build_train_transform(224)),
                ("train_noaa", build_train_transform(224,
                                                     auto_augment=None)),
                ("eval", build_eval_transform(224)),
                ("native_train_aug", build_native_train_transform(224)),
                ("native_train_noaa",
                 build_native_train_transform(224, auto_augment=None)),
                ("native_eval", build_native_eval_transform(224))]:
            ds = ImageFolderDataset(root, transform=tf)
            per_threads = {}
            for nt in args.threads:
                loader = create_loader(ds, args.batch_size,
                                       is_training=True, num_threads=nt)
                per_threads[nt] = round(bench(loader), 1)
            results[name] = per_threads
            print(name, json.dumps(per_threads), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
