"""End-to-end DATA-FED throughput on the chip (VERDICT r3 item 1).

Every BENCH/TRAINBENCH number is synthetic-tensor-fed; this harness runs the
real CLIs with the loader in the loop against the on-disk JPEG corpus
(scripts/make_corpus.py) and records loader-fed img/s next to the synthetic
ceiling, per variant. The reference's contract is the prefetching DataLoader
feeding the hot loop (/root/reference/main.py:395-448).

Usage:  python scripts/make_corpus.py   # once
        python scripts/e2ebench.py [--quick]
Writes E2EBENCH.json.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DATA = ".e2e_data"
OUT = "/tmp/e2e_runs"


def loader_rate(pipeline: str, workers: int, n_batches: int = 8,
                batch_size: int = 256, train: bool = True) -> float:
    """Host-only loader throughput (no device work)."""
    from lemevit_tpu.data import create_dataset, create_loader
    from lemevit_tpu.data import transforms as T

    if pipeline == "pil":
        tf = (T.build_train_transform(224) if train
              else T.build_eval_transform(224))
    elif pipeline == "native":
        tf = (T.build_native_train_transform(224) if train
              else T.build_native_eval_transform(224))
    elif pipeline == "packed":
        from lemevit_tpu.data.packed import PackedDataset
        ds = PackedDataset(os.path.join(
            DATA + "_packed", "train" if train else "validation"))
        loader = create_loader(ds, batch_size, is_training=train,
                               num_threads=workers)
        return _drain(loader, n_batches, batch_size)
    ds = create_dataset("imagefolder", DATA,
                        split="train" if train else "validation",
                        transform=tf)
    loader = create_loader(ds, batch_size, is_training=train,
                           num_threads=workers)
    return _drain(loader, n_batches, batch_size)


def _drain(loader, n_batches: int, batch_size: int) -> float:
    it = iter(loader)
    next(it)  # warm (thread spin-up, file cache)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        try:
            b = next(it)
        except StopIteration:
            break
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt if n else 0.0


def train_fed(model: str, extra: list, tag: str, epochs: int = 3,
              batch_size: int = 256) -> dict:
    """Run cli.train.train() against the corpus; steady-state epoch img/s
    (last epoch; epoch 0 pays jit compile)."""
    from lemevit_tpu.cli.train import build_parser, train
    from lemevit_tpu.utils.parser import parse_args_with_config

    out = os.path.join(OUT, tag)
    shutil.rmtree(out, ignore_errors=True)
    argv = ["--data-dir", DATA, "--num-classes", "16",
            "--model", model, "--batch-size", str(batch_size),
            "--epochs", str(epochs), "--eval-interval", "99",
            "--no-auto-resume", "--output", out, "--experiment", "run",
            "--log-interval", "1000"] + extra
    args, _ = parse_args_with_config(build_parser(), argv)
    train(args)
    rows = list(csv.DictReader(open(os.path.join(out, "run",
                                                 "summary.csv"))))
    n_imgs = (2400 // batch_size) * batch_size
    per_epoch = [n_imgs / float(r["epoch_time_s"]) for r in rows]
    return {"epochs_img_s": [round(v, 1) for v in per_epoch],
            "steady_img_s": round(per_epoch[-1], 1)}


def validate_fed(model: str, extra: list) -> float:
    from lemevit_tpu.cli.validate import build_parser, validate
    from lemevit_tpu.utils.parser import parse_args_with_config

    argv = ["--data-dir", DATA, "--num-classes", "16", "--model", model,
            "--batch-size", "256"] + extra
    args, _ = parse_args_with_config(build_parser(), argv)
    res = validate(args)   # first batches pay compile; run twice, take 2nd
    res = validate(args)
    return float(res["samples_per_sec"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-loader", action="store_true")
    ap.add_argument("--models", nargs="*",
                    default=["lemevit_tiny", "lemevit_base"])
    args = ap.parse_args()

    res = {"host_cores": os.cpu_count(),
           "corpus": {"train": 2400, "val": 512, "px": "384-640 jpeg"}}

    if not args.skip_loader:
        lw = {}
        for pipe in ["pil", "native", "packed"]:
            try:
                lw[pipe] = {w: round(loader_rate(pipe, w), 1)
                            for w in ([1] if args.quick else [1, 2])}
            except Exception as e:  # packed may not exist yet
                lw[pipe] = f"unavailable: {e}"
        res["loader_only_train_img_s"] = lw
        print("loader-only:", json.dumps(lw), flush=True)

    import jax
    res["backend"] = jax.default_backend()

    for model in args.models:
        m = {}
        # synthetic ceiling (loader out of the loop, same CLI/step code)
        m["synthetic"] = train_fed(
            model, ["--synthetic", "--steps-per-epoch",
                    str(2400 // 256)], f"{model}_synth")
        print(model, "synthetic:", m["synthetic"], flush=True)
        for tag, extra in [
            ("native_w1", ["--workers", "1"]),
            ("packed_w1", ["--workers", "1", "--packed-data",
                           DATA + "_packed"]),
        ]:
            try:
                m[tag] = train_fed(model, extra, f"{model}_{tag}")
                print(model, tag, m[tag], flush=True)
            except SystemExit as e:
                m[tag] = f"unavailable: {e}"
            except Exception as e:
                m[tag] = f"unavailable: {type(e).__name__}: {e}"
                print(model, tag, "FAILED", e, flush=True)
        for vtag, vextra in [("validate_img_s", []),
                             ("validate_packed_img_s",
                              ["--packed-data", DATA + "_packed"])]:
            try:
                m[vtag] = round(validate_fed(model, vextra), 1)
            except Exception as e:
                m[vtag] = f"unavailable: {type(e).__name__}: {e}"
        res[model] = m

    with open("E2EBENCH.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
