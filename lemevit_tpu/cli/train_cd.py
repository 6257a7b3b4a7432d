"""Change-detection training / evaluation CLI.

Reference contract (change_detection/{train,eval}.py): BIT head over a
Siamese LeMeViT backbone, AdamW lr 2.4e-4 with linear decay, CE or hybrid
(focal+dice) loss, per-epoch P/R/F1 on the validation set, best-checkpoint
on metric improvement; eval accumulates a confusion matrix.

Usage:
  python -m lemevit_tpu.cli.train_cd --data-dir /data/CDD --epochs 100
  python -m lemevit_tpu.cli.train_cd --synthetic --epochs 1   # smoke
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="lemevit_tpu change detection")
    p.add_argument("--data-dir", default="")
    p.add_argument("--backbone", default="lemevit_small")
    p.add_argument("--head", default="bit",
                   choices=["bit", "snunet", "snunet_conc", "siamunet_diff"])
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=2.4e-4)
    p.add_argument("--loss", default="ce", choices=["ce", "hybrid"])
    p.add_argument("--dec-depth", type=int, default=8)
    p.add_argument("--token-len", type=int, default=4)
    p.add_argument("--output", default="./output/cd")
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--initial-checkpoint", default="",
                   help="pretrained backbone (torch .pth or orbax)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=0)
    p.add_argument("--eval-only", default="",
                   help="checkpoint to evaluate (skips training)")
    p.add_argument("--bf16", action="store_true", default=None)
    return p


class _SyntheticCD:
    def __init__(self, n, size):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        a = rng.randint(0, 256, (self.size, self.size, 3), np.uint8)
        b = a.copy()
        mask = np.zeros((self.size, self.size), np.uint8)
        if i % 2:  # half the samples have a changed square
            s = self.size // 4
            b[:s, :s] = rng.randint(0, 256, (s, s, 3), np.uint8)
            mask[:s, :s] = 1
        return (a, b), mask


def _collate(samples):
    pairs, masks = zip(*samples)
    a = np.stack([np.asarray(p[0], np.uint8) for p in pairs])
    b = np.stack([np.asarray(p[1], np.uint8) for p in pairs])
    m = np.stack([(np.asarray(mm) > 127).astype(np.int32)
                  if np.asarray(mm).max() > 1 else np.asarray(mm, np.int32)
                  for mm in masks])
    return {"a": a, "b": b, "mask": m}


def prf1(tp, fp, fn) -> Dict[str, float]:
    p = tp / max(tp + fp, 1e-9)
    r = tp / max(tp + fn, 1e-9)
    f1 = 2 * p * r / max(p + r, 1e-9)
    return {"precision": p, "recall": r, "f1": f1}


def main(argv=None):
    from lemevit_tpu.utils.parser import parse_args_with_config
    args, args_text = parse_args_with_config(build_parser(), argv)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "args.yaml"), "w") as f:
        f.write(args_text)

    import jax
    import jax.numpy as jnp
    import optax

    from lemevit_tpu.data import CDPairDataset, create_loader
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.ops.losses import hybrid_loss, softmax_focal_loss
    from lemevit_tpu.tasks import BITChangeDetector
    from lemevit_tpu.tasks.snunet import (SiamNestedUNetConc, SiamUnetDiff,
                                          SNUNetECAM)
    from lemevit_tpu.train.checkpoint import load_pretrained, save_checkpoint
    from lemevit_tpu.train.state import TrainState
    from lemevit_tpu.utils.logging import setup_logging

    os.makedirs(args.output, exist_ok=True)
    logger = setup_logging(os.path.join(args.output, "train.log"))
    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    dtype = jnp.bfloat16 if bf16 else jnp.float32

    if args.synthetic:
        train_ds = _SyntheticCD(4 * args.batch_size, args.patch_size)
        val_ds = _SyntheticCD(2 * args.batch_size, args.patch_size)
    else:
        train_ds = CDPairDataset(args.data_dir, "train")
        val_ds = CDPairDataset(args.data_dir, "val")
    train_loader = create_loader(train_ds, args.batch_size, is_training=True,
                                 num_threads=args.workers,
                                 collate_fn=_collate)
    val_loader = create_loader(val_ds, args.batch_size, is_training=False,
                               num_threads=args.workers, collate_fn=_collate)
    steps_per_epoch = args.steps_per_epoch or max(len(train_loader), 1)

    if args.head == "bit":
        backbone = create_model(args.backbone, features_only=True,
                                dtype=dtype)
        model = BITChangeDetector(backbone=backbone,
                                  dec_depth=args.dec_depth,
                                  token_len=args.token_len, dtype=dtype)
    elif args.head == "snunet_conc":
        model = SiamNestedUNetConc(dtype=dtype)
    elif args.head == "siamunet_diff":
        model = SiamUnetDiff(dtype=dtype)
    else:
        model = SNUNetECAM(dtype=dtype)

    # note: CD pairs are NOT mean/std normalized in the reference
    # (transforms.py:211-231) — only /255; we match that via normalize with
    # zero mean / unit std.
    def norm(u8):
        return u8.astype(dtype) / jnp.asarray(255.0, dtype)

    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, args.patch_size, args.patch_size, 3))
    variables = model.init(rng, dummy, dummy)
    if args.initial_checkpoint and args.head == "bit":
        bb_vars = load_pretrained(backbone, args.initial_checkpoint)
        params = dict(variables["params"])
        params["backbone"] = bb_vars["params"]
        variables = {**variables, "params": params}

    total_steps = args.epochs * steps_per_epoch
    sched = optax.linear_schedule(args.lr, 0.0, max(total_steps, 1))
    tx = optax.adamw(sched, weight_decay=0.01)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), apply_fn=model.apply, tx=tx)

    has_bn = bool(jax.tree.leaves(state.batch_stats))
    has_dropout = args.head == "siamunet_diff"

    def loss_fn(params, batch_stats, batch, step):
        v = {"params": params}
        if has_bn:
            v["batch_stats"] = batch_stats
        rngs = ({"dropout": jax.random.fold_in(jax.random.PRNGKey(17), step)}
                if has_dropout else None)
        out = model.apply(v, norm(batch["a"]), norm(batch["b"]), train=True,
                          mutable=["batch_stats"] if has_bn else [],
                          rngs=rngs)
        logits, mut = out if has_bn else (out, {})
        # deep-supervision heads return a tuple of logits; the reference's
        # hybrid_loss sums over the tuple (utils/losses.py:14), and CE runs
        # per-output too
        tup = logits if isinstance(logits, tuple) else (logits,)
        nchw = [lg.transpose(0, 3, 1, 2) for lg in tup]
        if args.loss == "hybrid":
            loss = hybrid_loss(nchw, batch["mask"])
        else:
            loss = sum(softmax_focal_loss(lg, batch["mask"], gamma=0.0)
                       for lg in nchw)
        return loss, mut.get("batch_stats", {})

    @jax.jit
    def train_step(state, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        state = state.apply_gradients(
            grads, new_stats if has_bn else state.batch_stats)
        return state, loss

    @jax.jit
    def eval_step(state, batch):
        v = {"params": state.params}
        if has_bn:
            v["batch_stats"] = state.batch_stats
        logits = model.apply(v, norm(batch["a"]), norm(batch["b"]),
                             train=False)
        if isinstance(logits, tuple):  # deep supervision: score the last
            logits = logits[-1]
        pred = logits.argmax(-1)
        gt = batch["mask"]
        tp = ((pred == 1) & (gt == 1)).sum()
        fp = ((pred == 1) & (gt == 0)).sum()
        fn = ((pred == 0) & (gt == 1)).sum()
        return tp, fp, fn

    def evaluate(state):
        tot = np.zeros(3, np.int64)
        for batch in val_loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            tp, fp, fn = eval_step(state, batch)
            tot += np.array([int(tp), int(fp), int(fn)])
        return prf1(*tot)

    if args.eval_only:
        from lemevit_tpu.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(args.eval_only, state)
        metrics = evaluate(state)
        print(json.dumps(metrics, indent=2))
        return metrics

    best_f1 = -1.0
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
            state, loss = train_step(state, batch)
        metrics = evaluate(state)
        logger.info("epoch %d loss %.4f %s", epoch, float(loss),
                    json.dumps({k: round(v, 4) for k, v in metrics.items()}))
        if metrics["f1"] > best_f1:
            best_f1 = metrics["f1"]
            save_checkpoint(os.path.join(args.output, "checkpoints"), state,
                            metric=metrics["f1"])
    logger.info("best F1 %.4f", best_f1)
    return {"best_f1": best_f1}


if __name__ == "__main__":
    main()
