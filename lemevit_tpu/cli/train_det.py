"""Oriented object detection training / evaluation CLI.

The reference's detection vertical trains through external OBBDetection
tools (scripts/train_od.sh); this is the standalone TPU-native equivalent:
OrientedRCNN + detection_loss, AdamW 1x schedule, rotated-NMS inference,
VOC-style mAP, DOTA submission dump.

Smoke: python -m lemevit_tpu.cli.train_det --synthetic --epochs 1
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemevit_tpu detection")
    p.add_argument("--data-dir", default="")
    p.add_argument("--backbone", default="lemevit_small")
    p.add_argument("--num-classes", type=int, default=15)
    p.add_argument("--img-size", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--sched", default="cosine", choices=["cosine", "step"],
                   help="'step' = the reference's mmcv schedule of record "
                        "(schedule_1x/2x/3x: epoch milestones + iteration "
                        "warmup)")
    p.add_argument("--decay-milestones", type=float, nargs="*",
                   default=[8, 11])
    p.add_argument("--decay-rate", type=float, default=0.1)
    p.add_argument("--warmup-iters", type=int, default=500)
    p.add_argument("--warmup-ratio", type=float, default=1e-3)
    p.add_argument("--clip-grad", type=float, default=None,
                   help="global-norm gradient clip (reference "
                        "optimizer_config grad_clip max_norm=35)")
    p.add_argument("--num-proposals", type=int, default=256)
    p.add_argument("--rpn-nms-pre", type=int, default=512,
                   help="per-level pre-NMS top-k in the RPN (reference "
                        "OBBDetection config: 2000; default scaled down "
                        "to keep the padded rotated-IoU matrices "
                        "TPU-friendly — A/B'd in tests/test_detection_"
                        "train.py::test_rpn_nms_pre_map_ab)")
    p.add_argument("--max-boxes", type=int, default=64)
    p.add_argument("--fpn-channels", type=int, default=256)
    p.add_argument("--output", default="./output/det")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--initial-checkpoint", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=0)
    p.add_argument("--format-only", action="store_true",
                   help="dump DOTA submission instead of computing mAP")
    p.add_argument("--bf16", action="store_true", default=None)
    # original-size images: tile on the fly (img_split equivalent) and
    # merge per-tile detections back to original coordinates at eval
    p.add_argument("--tile", action="store_true",
                   help="data-dir holds ORIGINAL-size DOTA; tile on the "
                        "fly and merge detections across tiles")
    p.add_argument("--tile-size", type=int, default=1024)
    p.add_argument("--tile-gap", type=int, default=200)
    p.add_argument("--tile-iof", type=float, default=0.7)
    p.add_argument("--merge-iou", type=float, default=0.1)
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
    from lemevit_tpu.data.detection import (DOTADataset, SyntheticDetection,
                                            detection_collate)
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import OrientedRCNN
    from lemevit_tpu.tasks.detection_train import detection_loss
    from lemevit_tpu.tasks.dota import write_dota_submission
    from lemevit_tpu.tasks.map_eval import evaluate_map
    from lemevit_tpu.train.checkpoint import load_pretrained, save_checkpoint
    from lemevit_tpu.train.state import TrainState
    from lemevit_tpu.utils.logging import setup_logging

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logging(os.path.join(args.output, "train.log"))
    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    collate = lambda s: detection_collate(s, max_boxes=args.max_boxes)
    if args.synthetic:
        train_ds = SyntheticDetection(4 * args.batch_size, args.img_size,
                                      args.num_classes)
        val_ds = SyntheticDetection(2 * args.batch_size, args.img_size,
                                    args.num_classes)
    elif args.tile:
        from lemevit_tpu.data.dota_split import TiledDOTADataset
        train_ds = TiledDOTADataset(args.data_dir, "train",
                                    size=args.tile_size, gap=args.tile_gap,
                                    iof_thr=args.tile_iof)
        val_ds = TiledDOTADataset(args.data_dir, "val",
                                  size=args.tile_size, gap=args.tile_gap,
                                  iof_thr=args.tile_iof, keep_empty=True)
        args.img_size = args.tile_size
    else:
        train_ds = DOTADataset(args.data_dir, "train")
        val_ds = DOTADataset(args.data_dir, "val")
    train_loader = create_loader(train_ds, args.batch_size,
                                 is_training=True,
                                 num_threads=args.workers,
                                 collate_fn=collate)
    steps_per_epoch = args.steps_per_epoch or max(len(train_loader), 1)

    backbone = create_model(args.backbone, features_only=True, dtype=dtype)
    det = OrientedRCNN(backbone=backbone, num_classes=args.num_classes,
                       fpn_channels=args.fpn_channels,
                       num_proposals=args.num_proposals,
                       rpn_nms_pre=args.rpn_nms_pre, dtype=dtype)
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
        total, parts = detection_loss(
            out, batch["gt_obbs"], batch["gt_labels"], batch["gt_mask"],
            num_classes=args.num_classes)
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
        dets, gts = {}, {}
        tile_entries = []
        for i in range(len(val_ds)):
            img, obbs, labels = val_ds[i]
            out = predict(state, jnp.asarray(img)[None])
            keep = np.asarray(out["keep"])[0]
            det = {"boxes": np.asarray(out["boxes"])[0][keep],
                   "scores": np.asarray(out["scores"])[0][keep],
                   "labels": np.asarray(out["labels"])[0][keep]}
            if args.tile:
                tile_entries.append((val_ds.names[i], det["boxes"],
                                     det["scores"], det["labels"]))
            else:
                dets[str(i)] = det
                gts[str(i)] = {"boxes": obbs, "labels": labels}
        if args.tile:
            # shift to original coords + cross-tile rotated NMS, then
            # score against original-image GT
            from lemevit_tpu.data.dota_split import merge_tile_detections
            dets = merge_tile_detections(tile_entries,
                                         iou_thr=args.merge_iou)
            gts = val_ds.original_gts()
            for stem in gts:
                dets.setdefault(stem, {
                    "boxes": np.zeros((0, 5), np.float32),
                    "scores": np.zeros((0,), np.float32),
                    "labels": np.zeros((0,), np.int32)})
        if args.format_only:
            write_dota_submission(os.path.join(args.output, "submission"),
                                  dets)
            return {"mAP": -1.0}
        return evaluate_map(dets, gts, args.num_classes)

    best = -1.0
    metrics = {"mAP": 0.0}
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
                                for k, v in parts.items()}
                               | {"mAP": round(metrics["mAP"], 4)}))
        if metrics["mAP"] > best:
            best = metrics["mAP"]
            save_checkpoint(os.path.join(args.output, "checkpoints"), state,
                            metric=metrics["mAP"])
    return {"best_mAP": best, "steps": int(state.step)}


if __name__ == "__main__":
    main()
