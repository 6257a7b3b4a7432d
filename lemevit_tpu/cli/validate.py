"""Standalone evaluation CLI (the reference validate.py contract:
model + checkpoint -> top-1/top-5/loss, csv/json results, --result JSON to
stdout; /root/reference/validate.py:167-503).

Usage:
  python -m lemevit_tpu.cli.validate --model lemevit_tiny \
      --data-dir /data/imagenet --dataset imagefolder \
      --checkpoint weights.pth --batch-size 256
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lemevit_tpu validation")
    p.add_argument("--model", default="lemevit_tiny")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--data-dir", default="")
    p.add_argument("--dataset", default="imagefolder")
    p.add_argument("--split", default="validation")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--crop-pct", type=float, default=0.9)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--native-decode", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="C++ decode+center-crop plane; default ON when "
                        "native/libleme_data.so builds")
    p.add_argument("--packed-data", default="",
                   help="packed uint8 cache dir (scripts/pack.py); "
                        "center-crop runs on device")
    p.add_argument("--bf16", action="store_true", default=None)
    p.add_argument("--results-file", default="")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data smoke mode")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--passes", type=int, default=1,
                   help="iterate the val set N times (steady-state "
                        "throughput measurement on small sets; metrics "
                        "are still per-sample-correct)")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation: average logits with the "
                        "horizontal flip (reference --tta equivalent)")
    p.add_argument("--real-labels", default="",
                   help="real.json for ImageNet-ReaL re-scoring "
                        "(reference validate.py:292-295)")
    p.add_argument("--bulk", default="",
                   help="directory/glob of checkpoints to validate in "
                        "sequence (reference bulk mode :427-471)")
    return p


def validate(args) -> dict:
    import jax
    import jax.numpy as jnp

    from lemevit_tpu.data import build_eval_transform, create_dataset, \
        create_loader
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.train.checkpoint import load_pretrained
    from lemevit_tpu.train.steps import eval_metrics

    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    model = create_model(args.model, num_classes=args.num_classes,
                         dtype=jnp.bfloat16 if bf16 else jnp.float32)

    if args.checkpoint:
        variables = load_pretrained(model, args.checkpoint,
                                    use_ema=args.use_ema)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.img_size, args.img_size, 3), jnp.float32))

    packed = bool(args.packed_data)
    if args.synthetic:
        dataset = create_dataset("synthetic", num_samples=4 * args.batch_size,
                                 image_size=args.img_size,
                                 num_classes=args.num_classes)
    elif packed:
        from lemevit_tpu.data.packed import PackedDataset
        dataset = PackedDataset(os.path.join(args.packed_data, args.split))
    else:
        native = args.native_decode
        if native is None:
            from lemevit_tpu.data import native_decode as nd
            native = nd.available()
        if native:
            from lemevit_tpu.data.transforms import \
                build_native_eval_transform
            eval_tf = build_native_eval_transform(args.img_size,
                                                  args.crop_pct)
        else:
            eval_tf = build_eval_transform(args.img_size, args.crop_pct)
        dataset = create_dataset(
            args.dataset, args.data_dir, split=args.split,
            transform=eval_tf)
    loader = create_loader(dataset, args.batch_size, is_training=False,
                           num_threads=args.workers)

    @jax.jit
    def step(variables, images_u8, labels):
        if packed:
            from lemevit_tpu.data.device_aug import center_crop
            # honour --crop-pct on the packed px square: resize to
            # img_size/crop_pct (the eval-transform contract) before the
            # center crop, instead of silently cropping at px/img_size
            target = int(args.img_size / args.crop_pct)  # floor, like
            # transforms.center_crop_resize scale_size
            if target != images_u8.shape[1]:
                images_u8 = jax.image.resize(
                    images_u8.astype(jnp.float32),
                    (images_u8.shape[0], target, target, 3),
                    method="bicubic")
                images_u8 = jnp.clip(jnp.round(images_u8), 0, 255)
            images_u8 = center_crop(images_u8, args.img_size)
        images = normalize(images_u8)
        logits = model.apply(variables, images, train=False)
        if args.tta:
            logits = logits + model.apply(variables, images[:, :, ::-1],
                                          train=False)
            logits = logits / 2.0
        top5 = jax.lax.top_k(logits, 5)[1]
        return eval_metrics(logits, labels), top5

    real = None
    if args.real_labels:
        with open(args.real_labels) as f:
            raw = json.load(f)
        # real.json is indexed by the flat-sorted val filename order
        # (ILSVRC2012_val_%08d.JPEG), NOT the class-dir-major order the
        # ImageFolder dataset iterates in -- key by basename like timm's
        # RealLabelsImagenet and look each sample up by its own filename.
        if isinstance(raw, dict):
            real = raw
        else:
            real = {f"ILSVRC2012_val_{i + 1:08d}.JPEG": labels
                    for i, labels in enumerate(raw)}
        sample_paths = [p for p, _ in getattr(dataset, "samples", [])]
        if not sample_paths:
            raise ValueError(
                "--real-labels needs a dataset exposing .samples paths "
                f"(got {type(dataset).__name__})")
    real_correct = 0
    real_count = 0
    sample_idx = 0

    totals = {"loss_sum": 0.0, "top1_sum": 0.0, "top5_sum": 0.0, "count": 0}
    # warmup/compile outside the timed loop (reference validate.py:322-327)
    wpx = dataset.px if packed else args.img_size
    jax.block_until_ready(step(
        variables, np.zeros((args.batch_size, wpx, wpx, 3), np.uint8),
        np.zeros((args.batch_size,), np.int32))[0]["count"])
    t0 = time.perf_counter()
    n_batches = 0

    def repeated(ld):
        for _ in range(max(1, args.passes)):
            yield from ld

    def padded(raw):
        for batch in raw:
            n = batch["image"].shape[0]
            if n != args.batch_size:  # pad ragged tail: static shapes
                pad = args.batch_size - n
                batch["image"] = np.concatenate(
                    [batch["image"], np.zeros_like(batch["image"][:pad])])
                batch["label"] = np.concatenate(
                    [batch["label"], np.full(pad, -1, np.int32)])
            batch["n"] = n
            yield batch

    # background H2D + deferred metric readback: per-batch float() would
    # fence the pipeline on every step (one round trip each through the
    # device link); instead device scalars accumulate in a small deque
    # and are read back at the end
    from lemevit_tpu.data.loader import DevicePrefetcher
    put = jax.device_put
    pending = []
    dp_it = DevicePrefetcher(padded(repeated(loader)),
                             lambda v: put(v) if hasattr(
                                 v, "shape") else v)
    for batch in dp_it:
        n = int(batch.pop("n"))
        m, top5 = step(variables, batch["image"], batch["label"])
        pending.append((m, n))
        if real is not None:
            top1 = np.asarray(top5)[:n, 0]
            for p in top1:
                name = os.path.basename(sample_paths[sample_idx]) \
                    if sample_idx < len(sample_paths) else ""
                ok = real.get(name, [])
                if ok:  # ReaL skips images with no acceptable label
                    real_correct += int(p in ok)
                    real_count += 1
                sample_idx += 1
        n_batches += 1
        if args.max_batches and n_batches >= args.max_batches:
            break
    dp_it.close()
    for m, n in pending:
        # padded rows (label -1) one-hot to all-zeros, so loss_sum already
        # equals the sum over real rows; top-k can't match -1 either
        totals["loss_sum"] += float(m["loss_sum"])
        totals["top1_sum"] += float(m["top1_sum"])
        totals["top5_sum"] += float(m["top5_sum"])
        totals["count"] += n
    dt = time.perf_counter() - t0

    cnt = max(totals["count"], 1)
    results = {
        "model": args.model,
        "top1": round(100.0 * totals["top1_sum"] / cnt, 4),
        "top5": round(100.0 * totals["top5_sum"] / cnt, 4),
        "loss": round(totals["loss_sum"] / cnt, 4),
        "img_size": args.img_size,
        "crop_pct": args.crop_pct,
        "samples_per_sec": round(cnt / dt, 2),
    }
    if real is not None and real_count:
        results["real_top1"] = round(100.0 * real_correct / real_count, 4)
    return results


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.bulk:
        import glob
        paths = sorted(glob.glob(args.bulk)) or sorted(
            os.path.join(args.bulk, p) for p in os.listdir(args.bulk))
        all_results = []
        for p in paths:
            args.checkpoint = p
            r = validate(args)
            r["checkpoint"] = p
            all_results.append(r)
            print(json.dumps(r))
        best = max(all_results, key=lambda r: r["top1"])
        print(f"--result\n{json.dumps(best, indent=2)}")
        if args.results_file:
            with open(args.results_file, "w") as f:
                json.dump(all_results, f, indent=2)
        return best
    results = validate(args)
    if args.results_file:
        with open(args.results_file, "w") as f:
            json.dump(results, f, indent=2)
    print(f"--result\n{json.dumps(results, indent=2)}")
    return results


if __name__ == "__main__":
    main()
