"""Semantic-segmentation training / evaluation CLI (UperNet on LeMeViT).

Reference contract (semantic_segmentation/configs/...): UPerHead + aux FCN
(weight 0.4) on the stage-3 feature, AdamW, poly LR, crop+flip+photometric
train pipeline, slide inference (512^2 crop / 384 stride), metrics
mIoU / OA / mF1. Data layout: {root}/{split}/images/*.png and
{root}/{split}/labels/*.png (int masks).

Smoke: python -m lemevit_tpu.cli.train_seg --synthetic --iters 4
"""
from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemevit_tpu segmentation")
    p.add_argument("--data-dir", default="")
    p.add_argument("--backbone", default="lemevit_tiny")
    p.add_argument("--num-classes", type=int, default=6)  # Potsdam
    p.add_argument("--crop-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--iters", type=int, default=80000)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--min-lr", type=float, default=0.0)
    p.add_argument("--warmup-iters", type=int, default=1500)
    p.add_argument("--warmup-ratio", type=float, default=1e-6)
    p.add_argument("--ignore-index", type=int, default=None,
                   help="label value excluded from loss and metrics "
                        "(reference Potsdam recipe: num_classes 5, "
                        "ignore_index 5 — mmseg avg_non_ignore CE)")
    p.add_argument("--aux-weight", type=float, default=0.4)
    p.add_argument("--channels", type=int, default=512)
    p.add_argument("--eval-interval", type=int, default=8000)
    p.add_argument("--eval-stride", type=int, default=384)
    p.add_argument("--output", default="./output/seg")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--initial-checkpoint", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--bf16", action="store_true", default=None)
    return p


class SegDataset:
    """{split}/images/*.png + {split}/labels/*.png paired dataset with
    scale-jitter (0.5-2.0) random crop, flip, photometric jitter."""

    def __init__(self, root, split, crop, num_classes, train=True,
                 ignore_index=None):
        from PIL import Image  # noqa: F401
        self.img_dir = os.path.join(root, split, "images")
        self.lbl_dir = os.path.join(root, split, "labels")
        self.names = sorted(os.listdir(self.img_dir))
        self.crop = crop
        self.train = train
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        from PIL import Image, ImageEnhance
        img = Image.open(os.path.join(self.img_dir, self.names[i]))
        img = img.convert("RGB")
        lbl = Image.open(os.path.join(self.lbl_dir, self.names[i]))
        if self.train:
            scale = random.uniform(0.5, 2.0)
            w, h = img.size
            nw, nh = max(int(w * scale), self.crop), max(int(h * scale),
                                                         self.crop)
            img = img.resize((nw, nh), Image.BILINEAR)
            lbl = lbl.resize((nw, nh), Image.NEAREST)
            x0 = random.randint(0, nw - self.crop)
            y0 = random.randint(0, nh - self.crop)
            box = (x0, y0, x0 + self.crop, y0 + self.crop)
            img, lbl = img.crop(box), lbl.crop(box)
            if random.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                lbl = lbl.transpose(Image.FLIP_LEFT_RIGHT)
            for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                        ImageEnhance.Color):
                if random.random() < 0.5:
                    img = enh(img).enhance(random.uniform(0.7, 1.3))
        arr = np.asarray(img, np.uint8)
        mask = np.asarray(lbl, np.int32)
        if mask.ndim == 3:
            mask = mask[..., 0].astype(np.int32)
        if self.ignore_index is not None:
            # out-of-range labels fold into the ignored bucket
            mask = np.where((mask >= 0) & (mask < self.num_classes),
                            mask, self.ignore_index)
            return arr, mask
        return arr, np.clip(mask, 0, self.num_classes - 1)


class _SyntheticSeg:
    def __init__(self, n, size, num_classes):
        self.n, self.size, self.nc = n, size, num_classes

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        img = rng.randint(0, 256, (self.size, self.size, 3), np.uint8)
        mask = rng.randint(0, self.nc, (self.size, self.size)).astype(
            np.int32)
        return img, mask


def _collate(samples):
    imgs, masks = zip(*samples)
    return {"image": np.stack(imgs), "mask": np.stack(masks)}


def seg_metrics(conf: np.ndarray) -> dict:
    """mIoU / OA / mF1 from a confusion matrix (rows=gt, cols=pred)."""
    tp = np.diag(conf).astype(np.float64)
    gt = conf.sum(1).astype(np.float64)
    pd = conf.sum(0).astype(np.float64)
    iou = tp / np.maximum(gt + pd - tp, 1e-9)
    f1 = 2 * tp / np.maximum(gt + pd, 1e-9)
    return {"mIoU": float(iou.mean() * 100),
            "OA": float(tp.sum() / max(conf.sum(), 1e-9) * 100),
            "mF1": float(f1.mean() * 100)}


def main(argv=None):
    from lemevit_tpu.utils.parser import parse_args_with_config
    args, args_text = parse_args_with_config(build_parser(), argv)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "args.yaml"), "w") as f:
        f.write(args_text)

    import jax
    import jax.numpy as jnp
    import optax

    from lemevit_tpu.data import create_loader
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import UperNet, slide_inference
    from lemevit_tpu.train.checkpoint import load_pretrained, save_checkpoint
    from lemevit_tpu.train.state import TrainState
    from lemevit_tpu.utils.logging import setup_logging

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logging(os.path.join(args.output, "train.log"))
    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    if args.synthetic:
        train_ds = _SyntheticSeg(4 * args.batch_size, args.crop_size,
                                 args.num_classes)
        val_ds = _SyntheticSeg(args.batch_size, args.crop_size,
                               args.num_classes)
    else:
        train_ds = SegDataset(args.data_dir, "train", args.crop_size,
                              args.num_classes, train=True,
                              ignore_index=args.ignore_index)
        val_ds = SegDataset(args.data_dir, "val", args.crop_size,
                            args.num_classes, train=False,
                            ignore_index=args.ignore_index)
    loader = create_loader(train_ds, args.batch_size, is_training=True,
                           num_threads=args.workers, collate_fn=_collate)

    backbone = create_model(args.backbone, features_only=True, dtype=dtype)
    model = UperNet(backbone=backbone, num_classes=args.num_classes,
                    channels=args.channels, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.crop_size, args.crop_size, 3))
    variables = model.init(rng, dummy, with_aux=True)
    if args.initial_checkpoint:
        bb = load_pretrained(backbone, args.initial_checkpoint)
        params = dict(variables["params"])
        params["backbone"] = bb["params"]
        stats = dict(variables.get("batch_stats", {}))
        if bb.get("batch_stats"):
            stats["backbone"] = bb["batch_stats"]
        variables = {"params": params, "batch_stats": stats}

    from lemevit_tpu.train.optim import warmup_poly_schedule
    sched = warmup_poly_schedule(args.lr, args.iters, power=1.0,
                                 min_lr=args.min_lr,
                                 warmup_iters=args.warmup_iters,
                                 warmup_ratio=args.warmup_ratio)
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       apply_fn=model.apply, tx=tx)

    def loss_fn(params, batch_stats, batch):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize(batch["image"]), train=True, with_aux=True,
            mutable=["batch_stats"])
        logits, aux = out
        def ce(lg):
            logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
            oh = jax.nn.one_hot(batch["mask"], args.num_classes)
            pix = -(oh * logp).sum(-1)
            if args.ignore_index is None:
                return pix.mean()
            valid = (batch["mask"] != args.ignore_index).astype(jnp.float32)
            return (pix * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        loss = ce(logits) + args.aux_weight * ce(aux)
        return loss, mut.get("batch_stats", {})

    @jax.jit
    def train_step(state, batch):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, stats), loss

    @jax.jit
    def infer(state, images_u8):
        v = {"params": state.params, "batch_stats": state.batch_stats}
        def apply_crop(crop):
            return model.apply(v, crop, train=False)
        return slide_inference(apply_crop, normalize(images_u8),
                               args.num_classes, crop_size=args.crop_size,
                               stride=args.eval_stride).argmax(-1)

    def evaluate(state):
        conf = np.zeros((args.num_classes, args.num_classes), np.int64)
        for i in range(len(val_ds)):
            img, mask = val_ds[i]
            pred = np.asarray(infer(state, jnp.asarray(img)[None]))[0]
            m, p = mask.reshape(-1), pred.reshape(-1)
            if args.ignore_index is not None:
                keep = m != args.ignore_index
                m, p = m[keep], p[keep]
            idx = m * args.num_classes + p
            conf += np.bincount(
                idx, minlength=args.num_classes ** 2).reshape(
                args.num_classes, args.num_classes)
        return seg_metrics(conf)

    it = iter(loader)
    for step_i in range(args.iters):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, loss = train_step(state, batch)
        if step_i % 50 == 0:
            logger.info("iter %d loss %.4f", step_i, float(loss))
        if (step_i + 1) % args.eval_interval == 0 or step_i == args.iters - 1:
            metrics = evaluate(state)
            logger.info("iter %d eval %s", step_i, json.dumps(
                {k: round(v, 2) for k, v in metrics.items()}))
            save_checkpoint(os.path.join(args.output, "checkpoints"), state,
                            metric=metrics["mIoU"])
    return {"final_metrics": metrics, "steps": int(state.step)}


if __name__ == "__main__":
    main()
