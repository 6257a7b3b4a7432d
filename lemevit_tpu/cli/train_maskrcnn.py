"""Mask R-CNN instance-segmentation training / evaluation CLI.

The TPU-native counterpart of the reference's COCO config
(object_detection/configs/mask_rcnn/lemevit_small_mask_rcnn_r50_fpn_1x_coco.py,
trained there through mmdet tools): MaskRCNN + mask_rcnn_loss, AdamW 1x,
box mAP@0.5 + mask mAP@[.5:.95] evaluation.

Smoke: python -m lemevit_tpu.cli.train_maskrcnn --synthetic --epochs 1
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemevit_tpu mask r-cnn")
    p.add_argument("--data-dir", default="", help="COCO root")
    p.add_argument("--train-split", default="train2017")
    p.add_argument("--val-split", default="val2017")
    p.add_argument("--backbone", default="lemevit_small")
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--sched", default="cosine", choices=["cosine", "step"])
    p.add_argument("--decay-milestones", type=float, nargs="*",
                   default=[8, 11])
    p.add_argument("--decay-rate", type=float, default=0.1)
    p.add_argument("--warmup-iters", type=int, default=500)
    p.add_argument("--warmup-ratio", type=float, default=1e-3)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--num-proposals", type=int, default=128)
    p.add_argument("--max-boxes", type=int, default=32)
    p.add_argument("--fpn-channels", type=int, default=256)
    p.add_argument("--output", default="./output/maskrcnn")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--initial-checkpoint", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=0)
    p.add_argument("--eval-samples", type=int, default=0,
                   help="cap val images per eval (0 = all)")
    p.add_argument("--bf16", action="store_true", default=None)
    return p


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
    from lemevit_tpu.data.coco import (COCODataset, SyntheticInstanceSeg,
                                       instance_collate, paste_masks)
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks.map_eval import evaluate_map, evaluate_mask_map
    from lemevit_tpu.tasks.mask_rcnn import MaskRCNN, mask_rcnn_loss
    from lemevit_tpu.train.checkpoint import load_pretrained, save_checkpoint
    from lemevit_tpu.train.state import TrainState
    from lemevit_tpu.utils.logging import setup_logging

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logging(os.path.join(args.output, "train.log"))
    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    collate = lambda s: instance_collate(s, max_boxes=args.max_boxes)
    if args.synthetic:
        train_ds = SyntheticInstanceSeg(4 * args.batch_size, args.img_size,
                                        args.num_classes)
        val_ds = SyntheticInstanceSeg(2 * args.batch_size, args.img_size,
                                      args.num_classes)
    else:
        train_ds = COCODataset(args.data_dir, args.train_split,
                               img_size=args.img_size)
        val_ds = COCODataset(args.data_dir, args.val_split,
                             img_size=args.img_size)
    train_loader = create_loader(train_ds, args.batch_size,
                                 is_training=True,
                                 num_threads=args.workers,
                                 collate_fn=collate)
    steps_per_epoch = args.steps_per_epoch or max(len(train_loader), 1)

    backbone = create_model(args.backbone, features_only=True, dtype=dtype)
    det = MaskRCNN(backbone=backbone, num_classes=args.num_classes,
                   fpn_channels=args.fpn_channels,
                   num_proposals=args.num_proposals, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = det.init(rng, dummy)
    if args.initial_checkpoint:
        bb = load_pretrained(backbone, args.initial_checkpoint)
        params = dict(variables["params"])
        params["backbone"] = bb["params"]
        stats = dict(variables.get("batch_stats", {}))
        if bb.get("batch_stats"):
            stats["backbone"] = bb["batch_stats"]
        variables = {"params": params, "batch_stats": stats}

    total = args.epochs * steps_per_epoch
    if args.sched == "step":
        from lemevit_tpu.train.optim import mm_step_schedule
        sched = mm_step_schedule(args.lr, steps_per_epoch,
                                 milestones=args.decay_milestones,
                                 gamma=args.decay_rate,
                                 warmup_iters=args.warmup_iters,
                                 warmup_ratio=args.warmup_ratio)
    else:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(total // 20, 1), max(total, 2))
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    if args.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad), tx)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       apply_fn=det.apply, tx=tx)

    def loss_fn(params, batch_stats, batch):
        out, mut = det.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize(batch["image"]), train=True, mutable=["batch_stats"])
        total, parts = mask_rcnn_loss(
            out, batch["gt_boxes"], batch["gt_labels"], batch["gt_masks"],
            batch["gt_valid"], num_classes=args.num_classes)
        return total, (parts, mut.get("batch_stats", {}))

    @jax.jit
    def train_step(state, batch):
        (loss, (parts, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, stats), loss, parts

    @jax.jit
    def predict(state, images_u8):
        v = {"params": state.params, "batch_stats": state.batch_stats}
        return det.apply(v, normalize(images_u8), train=False)

    def evaluate(state):
        dets_box, dets_mask, gts_box, gts_mask = {}, {}, {}, {}
        n = len(val_ds)
        if args.eval_samples:
            n = min(n, args.eval_samples)
        for i in range(n):
            img, boxes, labels, masks = val_ds[i]
            out = predict(state, jnp.asarray(img)[None])
            keep = np.asarray(out["keep"])[0]
            b = np.asarray(out["boxes"])[0][keep]
            sc = np.asarray(out["scores"])[0][keep]
            lb = np.asarray(out["labels"])[0][keep]
            mk = np.asarray(out["masks"])[0][keep]  # (K, 2r, 2r, C)
            pasted = paste_masks(b, mk, img.shape[:2], labels=lb)
            key = str(i)
            dets_box[key] = {"boxes": b, "scores": sc, "labels": lb}
            dets_mask[key] = {"masks": pasted, "scores": sc, "labels": lb}
            gts_box[key] = {"boxes": boxes, "labels": labels}
            gts_mask[key] = {"masks": masks, "labels": labels}
        m = evaluate_map(dets_box, gts_box, args.num_classes)
        mm = evaluate_mask_map(dets_mask, gts_mask, args.num_classes)
        return {"mAP": m["mAP"], **mm}

    best = -1.0
    metrics = {"mAP": 0.0, "mask_mAP": 0.0}
    for epoch in range(args.epochs):
        train_loader.set_epoch(epoch)
        it = iter(train_loader)
        for si in range(steps_per_epoch):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, loss, parts = train_step(state, batch)
        metrics = evaluate(state)
        logger.info("epoch %d loss %.4f %s", epoch, float(loss),
                    json.dumps({k: round(float(v), 4)
                                for k, v in {**parts, **metrics}.items()}))
        if metrics["mask_mAP"] > best:
            best = metrics["mask_mAP"]
            save_checkpoint(os.path.join(args.output, "checkpoints"), state,
                            metric=metrics["mask_mAP"])
    return {"best_mask_mAP": best, "metrics": metrics,
            "steps": int(state.step)}


if __name__ == "__main__":
    main()
