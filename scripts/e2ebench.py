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


def train_fed(model: str, extra: list, tag: str, epochs: int = 5,
              batch_size: int = 256) -> dict:
    """Run cli.train.train() against the corpus. steady_img_s = MEDIAN of
    the post-warmup epochs (epoch 0 pays jit compile and cold page cache);
    the single best epoch is reported separately as best_epoch_img_s —
    quoting the max as "steady" overstated throughput by up to 20%
    (advisor r4)."""
    import statistics

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
    post_warm = per_epoch[1:] or per_epoch
    return {"epochs_img_s": [round(v, 1) for v in per_epoch],
            "steady_img_s": round(statistics.median(post_warm), 1),
            "best_epoch_img_s": round(max(per_epoch), 1)}


def device_ceiling(model: str, batch_size: int = 256, reps: int = 12
                   ) -> float:
    """Pure-device train-step rate on a RESIDENT batch (no loader, no
    H2D): the ceiling the data plane is judged against (TRAINBENCH
    methodology, incl. the same normalize-on-device)."""
    import jax
    import jax.numpy as jnp

    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.train import (build_lr_schedule, build_optimizer,
                                   create_train_state, make_train_step)

    mdl = create_model(model, num_classes=16, dtype=jnp.bfloat16)
    sched = build_lr_schedule(steps_per_epoch=10, epochs=2)
    tx = build_optimizer(sched)
    state = create_train_state(mdl, jax.random.PRNGKey(0),
                               (batch_size, 224, 224, 3), tx,
                               ema_decay=0.996)
    base_step = make_train_step(label_smoothing=0.1)

    def step(state, img_u8, label, rng):
        return base_step(state, {"image": normalize(img_u8),
                                 "label": jax.nn.one_hot(label, 16)}, rng)

    step = jax.jit(step, donate_argnums=(0,))
    img = jnp.zeros((batch_size, 224, 224, 3), jnp.uint8)
    lab = jnp.zeros((batch_size,), jnp.int32)
    rng = jax.random.PRNGKey(1)
    state, m = step(state, img, lab, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, img, lab, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch_size * reps / dt


def h2d_rate(mb: int = 38, reps: int = 8) -> float:
    """Host->device copy rate in MB/s (the uint8 batch crossing)."""
    import jax
    import numpy as np

    buf = np.zeros((mb, 1024, 1024), np.uint8)
    jax.device_put(buf).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(buf).block_until_ready()
    return mb * reps / (time.perf_counter() - t0)


def device_aug_ms(batch_size: int = 256, reps: int = 10) -> float:
    """Device-side RRC+flip+RandAugment cost per 256px packed batch."""
    import jax
    import jax.numpy as jnp

    from lemevit_tpu.data.device_aug import make_train_aug

    aug = jax.jit(make_train_aug(224))
    x = jnp.zeros((batch_size, 256, 256, 3), jnp.uint8)
    float(aug(jax.random.PRNGKey(0), x).sum())
    t0 = time.perf_counter()
    for i in range(reps):
        y = aug(jax.random.PRNGKey(i), x)
    float(y.sum())
    return (time.perf_counter() - t0) / reps * 1000.0


def validate_fed(model: str, extra: list) -> float:
    from lemevit_tpu.cli.validate import build_parser, validate
    from lemevit_tpu.utils.parser import parse_args_with_config

    argv = ["--data-dir", DATA, "--num-classes", "16", "--model", model,
            "--batch-size", "256", "--passes", "6"] + extra
    args, _ = parse_args_with_config(build_parser(), argv)
    res = validate(args)   # warmup pass runs inside validate pre-timer
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

    def dump():   # incremental: a killed run still leaves partial data
        with open("E2EBENCH.json", "w") as fh:
            json.dump(res, fh, indent=1)

    if not args.skip_loader:
        # Warm the page cache explicitly so every pipeline is measured
        # against the same (warm) IO state: the r4 run's packed w2=6601
        # vs w1=2419 "superlinear scaling" on a 1-core box was the first
        # run paying cold cache, not threading.
        for root in [DATA, DATA + "_packed"]:
            for dirpath, _, names in os.walk(root):
                for n in names:
                    try:
                        with open(os.path.join(dirpath, n), "rb") as fh:
                            while fh.read(1 << 22):
                                pass
                    except OSError:
                        pass
        lw = {}
        for pipe in ["pil", "native", "packed"]:
            try:
                lw[pipe] = {w: round(loader_rate(pipe, w), 1)
                            for w in ([1] if args.quick else [1, 2])}
            except Exception as e:  # packed may not exist yet
                lw[pipe] = f"unavailable: {e}"
        lw["methodology"] = ("page cache pre-warmed (corpus fits in RAM); "
                             f"host has {os.cpu_count()} core(s), so w>1 "
                             "numbers measure thread overhead, not scaling")
        res["loader_only_train_img_s"] = lw
        dump()
        print("loader-only:", json.dumps(lw), flush=True)

    import jax
    res["backend"] = jax.default_backend()
    res["h2d_MBps"] = round(h2d_rate(), 1)
    res["device_aug_ms_per_256batch"] = round(device_aug_ms(), 2)
    dump()
    print("h2d", res["h2d_MBps"], "MB/s; device aug",
          res["device_aug_ms_per_256batch"], "ms", flush=True)

    for model in args.models:
        m = {}
        res[model] = m
        m["device_ceiling_img_s"] = round(device_ceiling(model), 1)
        dump()
        print(model, "ceiling:", m["device_ceiling_img_s"], flush=True)
        for tag, extra in [
            ("native_w1", ["--workers", "1"]),
            ("packed_w1", ["--workers", "1", "--packed-data",
                           DATA + "_packed"]),
        ]:
            try:
                m[tag] = train_fed(model, extra, f"{model}_{tag}")
                dump()
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
                dump()
            except Exception as e:
                m[vtag] = f"unavailable: {type(e).__name__}: {e}"
        res[model] = m

    with open("E2EBENCH.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
