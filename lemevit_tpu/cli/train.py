"""Training CLI — the reference main.py contract, TPU-native.

Replaces the torchrun + timm stack (/root/reference/main.py:80-650):
  - two-stage YAML+argparse config (utils/parser.py)
  - pjit train step over a ("data","model") mesh; gradient psum implicit
  - bf16 compute, optax AdamW + warmup-cosine with linear LR/batch scaling
  - mixup/cutmix + random-erasing on device, label smoothing
  - EMA, per-stage remat, orbax checkpoints (top-k by eval metric),
    auto-resume, summary.csv, args.yaml reproducibility dump

Usage:
  python -m lemevit_tpu.cli.train --config configs/lemevit_tiny.yaml \
      --data-dir /data/imagenet --output ./runs/tiny
Smoke mode (synthetic data, 2 epochs x 4 steps):
  python -m lemevit_tpu.cli.train --synthetic --epochs 2 --steps-per-epoch 4
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lemevit_tpu training")
    # data
    p.add_argument("--data-dir", default="")
    p.add_argument("--dataset", default="imagefolder")
    p.add_argument("--train-split", default="train")
    p.add_argument("--val-split", default="validation")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--crop-pct", type=float, default=0.9)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--worker-procs", type=int, default=0,
                   help="decode in N forked worker processes instead of "
                        "threads (GIL-free input pipeline; see "
                        "scripts/loaderbench.py)")
    p.add_argument("--native-decode", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="C++ JPEG/PNG decode+crop plane (GIL released: "
                        "thread workers scale across cores; falls back to "
                        "PIL per-image for other formats). Default: ON "
                        "when native/libleme_data.so builds and "
                        "--aug-splits is off (PIL path only).")
    p.add_argument("--packed-data", default="",
                   help="packed uint8 cache dir (scripts/pack.py / "
                        "lemevit_tpu.data.packed): host streams raw "
                        "samples by memmap, ALL augmentation (RRC, flip, "
                        "RandAugment) runs on device inside the jit step")
    p.add_argument("--synthetic", action="store_true")
    # model
    p.add_argument("--model", default="lemevit_tiny")
    p.add_argument("--attn-backend", default="auto",
                   choices=["auto", "pallas", "xla"],
                   help="attention/block kernel dispatch: 'xla' bypasses "
                        "the fused Pallas kernels (escape hatch if a "
                        "toolchain bump breaks a kernel)")
    p.add_argument("--drop-path", type=float, default=0.15)
    p.add_argument("--remat-stages", type=int, nargs="*", default=[])
    p.add_argument("--bf16", action="store_true", default=None)
    p.add_argument("--initial-checkpoint", default="")
    # optimization
    p.add_argument("--batch-size", type=int, default=128,
                   help="per-process batch size")
    p.add_argument("--grad-accum-steps", type=int, default=1)
    p.add_argument("--opt", default="adamw",
                   choices=["adamw", "adam", "sgd", "momentum", "nesterov",
                            "rmsprop", "rmsproptf", "lamb", "adagrad"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--sched", default="cosine",
                   choices=["cosine", "step", "multistep", "poly",
                            "constant", "plateau"])
    p.add_argument("--decay-epochs", type=float, default=90)
    p.add_argument("--decay-rate", type=float, default=0.1)
    p.add_argument("--decay-milestones", type=float, nargs="*", default=[])
    p.add_argument("--sched-power", type=float, default=1.0)
    p.add_argument("--patience-epochs", type=int, default=10,
                   help="plateau schedule: epochs without eval-metric "
                        "improvement before the LR decays by --decay-rate")
    p.add_argument("--lr-base", type=float, default=5e-4)
    p.add_argument("--lr-base-size", type=int, default=512)
    p.add_argument("--lr-base-scale", default="linear",
                   choices=["linear", "sqrt", "none"])
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-5)
    p.add_argument("--epochs", type=int, default=280)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--aa", default="rand-m9-mstd0.5-inc1")
    p.add_argument("--hflip", type=float, default=0.5)
    p.add_argument("--scale", type=float, nargs=2, default=[0.08, 1.0],
                   help="RandomResizedCrop scale range (timm --scale)")
    # AugMix / JSD recipe (reference main.py:369-393,451-471):
    # --aug-splits 3 --jsd-loss --aa augmix-m3-w3
    p.add_argument("--aug-splits", type=int, default=0,
                   help=">1 enables aug splits: split 0 clean, the rest "
                        "augmented, with per-split BN statistics")
    p.add_argument("--jsd-loss", action="store_true",
                   help="JSD consistency loss across aug splits")
    p.add_argument("--jsd-alpha", type=float, default=12.0)
    p.add_argument("--model-ema", action="store_true", default=True)
    p.add_argument("--model-ema-decay", type=float, default=0.996)
    # infra
    p.add_argument("--mesh-model-axis", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", default="./output")
    p.add_argument("--experiment", default="")
    p.add_argument("--checkpoint-hist", type=int, default=3)
    p.add_argument("--recovery-interval", type=int, default=0,
                   help="save a rolling mid-epoch recovery checkpoint "
                        "every N steps (0 = off)")
    p.add_argument("--resume", default="")
    p.add_argument("--no-auto-resume", action="store_true")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--summary", action="store_true",
                   help="print per-module param table + analytic GMACs")
    p.add_argument("--eval-interval", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="override (mainly for synthetic smoke runs)")
    return p


def main(argv=None):
    from lemevit_tpu.utils.parser import parse_args_with_config

    args, args_text = parse_args_with_config(build_parser(), argv)
    return train(args, args_text)


class _SplitViews:
    """Synthetic-path stand-in for build_augsplit_transform: replicates each
    sample into (S, H, W, 3) views so the JSD/split-BN path smoke-runs."""

    def __init__(self, ds, num_splits):
        self.ds, self.num_splits = ds, num_splits

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        img, label = self.ds[i]
        return np.stack([img] * self.num_splits), label


def train(args, args_text: str = ""):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lemevit_tpu.data import (build_eval_transform, build_train_transform,
                                  create_dataset, create_loader)
    from lemevit_tpu.data.mixup import mixup_cutmix, normalize, random_erasing
    from lemevit_tpu.models import create_model
    from lemevit_tpu.parallel import MeshConfig, build_mesh, shard_params
    from lemevit_tpu.train import (build_lr_schedule, build_optimizer,
                                   create_train_state, make_train_step)
    from lemevit_tpu.train.checkpoint import (auto_resume, load_pretrained,
                                              restore_checkpoint,
                                              save_checkpoint, save_recovery)
    from lemevit_tpu.train.steps import cross_entropy_loss, eval_metrics
    from lemevit_tpu.utils.logging import setup_logging
    from lemevit_tpu.utils.meters import MetricTracker

    out_dir = os.path.join(args.output, args.experiment or args.model)
    os.makedirs(out_dir, exist_ok=True)
    logger = setup_logging(os.path.join(out_dir, "train.log"))
    if args_text:
        with open(os.path.join(out_dir, "args.yaml"), "w") as f:
            f.write(args_text)

    on_tpu = jax.default_backend() == "tpu"
    bf16 = args.bf16 if args.bf16 is not None else on_tpu
    n_dev = len(jax.devices())
    mesh = build_mesh(MeshConfig(model=args.mesh_model_axis))
    global_batch = args.batch_size * mesh.shape["data"] \
        * args.grad_accum_steps
    logger.info("devices=%d mesh=%s global_batch=%d",
                n_dev, dict(mesh.shape), global_batch)

    # ---------------- data
    aug_splits = args.aug_splits if args.aug_splits > 1 else 0
    if aug_splits:
        if args.mixup > 0 or args.cutmix > 0:
            logger.info("aug-splits: disabling mixup/cutmix (JSD path "
                        "takes hard targets, as in the reference)")
            args.mixup = args.cutmix = 0.0
    device_aug_fn = None  # packed path: ALL aug inside the jit step
    if args.synthetic:
        train_ds = create_dataset("synthetic", num_samples=global_batch * 8,
                                  image_size=args.img_size,
                                  num_classes=args.num_classes)
        val_ds = create_dataset("synthetic", num_samples=global_batch * 2,
                                image_size=args.img_size,
                                num_classes=args.num_classes)
        if aug_splits:
            train_ds = _SplitViews(train_ds, aug_splits)
    elif args.packed_data:
        if aug_splits:
            raise SystemExit("--packed-data does not support --aug-splits "
                             "(AugMix/JSD runs on the host PIL pipeline)")
        from lemevit_tpu.data.device_aug import make_train_aug
        from lemevit_tpu.data.packed import PackedDataset
        train_ds = PackedDataset(
            os.path.join(args.packed_data, args.train_split))
        val_ds = PackedDataset(
            os.path.join(args.packed_data, args.val_split))
        device_aug_fn = make_train_aug(
            args.img_size, hflip=args.hflip, auto_augment=args.aa,
            scale=tuple(args.scale))
        logger.info("packed data plane: %d/%d samples @ %dpx, device aug",
                    len(train_ds), len(val_ds), train_ds.px)
    else:
        native = args.native_decode
        if native is None:
            from lemevit_tpu.data import native_decode as nd
            native = nd.available() and not aug_splits
            if native:
                logger.info("native decode plane ON (auto; "
                            "--no-native-decode to disable)")
        args.native_decode = native
        if aug_splits:
            from lemevit_tpu.data.transforms import build_augsplit_transform
            train_tf = build_augsplit_transform(
                args.img_size, hflip=args.hflip, auto_augment=args.aa,
                num_splits=aug_splits)
        elif args.native_decode:
            from lemevit_tpu.data.transforms import \
                build_native_train_transform
            train_tf = build_native_train_transform(
                args.img_size, hflip=args.hflip, auto_augment=args.aa,
                scale=tuple(args.scale))
        else:
            train_tf = build_train_transform(
                args.img_size, hflip=args.hflip, auto_augment=args.aa,
                scale=tuple(args.scale))
        if args.native_decode:
            from lemevit_tpu.data.transforms import \
                build_native_eval_transform
            eval_tf = build_native_eval_transform(args.img_size,
                                                  args.crop_pct)
        else:
            eval_tf = build_eval_transform(args.img_size, args.crop_pct)
        train_ds = create_dataset(
            args.dataset, args.data_dir, split=args.train_split,
            transform=train_tf)
        val_ds = create_dataset(
            args.dataset, args.data_dir, split=args.val_split,
            transform=eval_tf)
    # multi-host: each process loads its shard of every batch
    device_batch = args.batch_size * mesh.shape["data"]
    proc, nproc = jax.process_index(), jax.process_count()
    train_spec = val_spec = None
    if args.worker_procs and not args.synthetic:
        # picklable dataset specs let worker processes SPAWN (fresh
        # interpreters, no fork of the JAX-initialized parent)
        from lemevit_tpu.data.spawn import spec_for_split
        train_spec = spec_for_split(args, args.train_split, True, aug_splits)
        val_spec = spec_for_split(args, args.val_split, False)
    train_loader = create_loader(train_ds, device_batch // nproc,
                                 is_training=True, num_threads=args.workers,
                                 num_procs=args.worker_procs,
                                 dataset_spec=train_spec,
                                 seed=args.seed, rank=proc, world_size=nproc)
    val_loader = create_loader(val_ds, device_batch // nproc,
                               is_training=False, num_threads=args.workers,
                               num_procs=args.worker_procs,
                               dataset_spec=val_spec,
                               rank=proc, world_size=nproc)
    steps_per_epoch = args.steps_per_epoch or max(len(train_loader), 1)

    # ---------------- model/optimizer/state
    model = create_model(
        args.model, num_classes=args.num_classes,
        drop_path_rate=args.drop_path,
        remat_stages=tuple(args.remat_stages),
        attn_backend=args.attn_backend,
        dtype=jnp.bfloat16 if bf16 else jnp.float32)
    sched = build_lr_schedule(
        base_lr=args.lr_base, global_batch_size=global_batch,
        steps_per_epoch=steps_per_epoch, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, warmup_lr=args.warmup_lr,
        min_lr=args.min_lr, scaling=args.lr_base_scale,
        sched=args.sched, decay_epochs=args.decay_epochs,
        decay_rate=args.decay_rate,
        decay_milestones=tuple(args.decay_milestones),
        power=args.sched_power)
    tx = build_optimizer(sched, weight_decay=args.weight_decay,
                         clip_grad=args.clip_grad,
                         grad_accum_steps=args.grad_accum_steps,
                         opt=args.opt, momentum=args.momentum,
                         plateau=args.sched == "plateau")
    plateau_ctl = None
    if args.sched == "plateau":
        from lemevit_tpu.train.optim import PlateauController
        plateau_ctl = PlateauController(decay_rate=args.decay_rate,
                                        patience=args.patience_epochs)

    with mesh:
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed),
            (2, args.img_size, args.img_size, 3), tx,
            ema_decay=args.model_ema_decay if args.model_ema else 0.0)
        if args.summary:
            from lemevit_tpu.utils.profiling import cost_analysis, \
                model_summary
            logger.info("\n%s", model_summary(model, state.variables))
            try:
                c = cost_analysis(
                    lambda v, xx: model.apply(v, xx, train=False),
                    state.variables,
                    jnp.zeros((1, args.img_size, args.img_size, 3)))
                logger.info("analytic GMACs/image: %.2f", c["gmacs"])
            except Exception:  # noqa: BLE001
                pass
        if args.initial_checkpoint:
            variables = load_pretrained(model, args.initial_checkpoint)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, variables["params"]),
                batch_stats=jax.tree.map(
                    jnp.asarray, variables.get("batch_stats", {})))
        ckpt_dir = os.path.join(out_dir, "checkpoints")
        if aug_splits:
            from lemevit_tpu.train.steps import (make_jsd_train_step,
                                                 stack_batch_stats,
                                                 unstack_batch_stats)
            # per-split BN statistics: leading (S,) axis on batch_stats.
            # Stack BEFORE restore: checkpoints saved during an
            # --aug-splits run hold stacked (S,C) BN leaves, and the
            # orbax restore target must match them.
            leaves = jax.tree.leaves(state.batch_stats)
            if leaves and leaves[0].ndim == 1:
                state = state.replace(batch_stats=stack_batch_stats(
                    state.batch_stats, aug_splits))
            base_train_step = make_jsd_train_step(aug_splits,
                                                  jsd_alpha=args.jsd_alpha)
        else:
            base_train_step = make_train_step(label_smoothing=0.0)
        if args.resume:
            state = restore_checkpoint(args.resume, state)
        elif not args.no_auto_resume:
            state, resumed = auto_resume(ckpt_dir, state)
            if resumed:
                logger.info("auto-resumed at step %d", int(state.step))
        # place the full state on the mesh (replicated), then overlay the
        # tensor-parallel layouts; mixed committed placements break jit
        state = jax.device_put(state, NamedSharding(mesh, P()))
        if mesh.shape.get("model", 1) > 1:
            state = state.replace(params=shard_params(state.params, mesh))

        batch_sharding = NamedSharding(mesh, P("data"))

        def full_train_step(state, batch, rng):
            aug_rng, step_rng = jax.random.split(
                jax.random.fold_in(rng, state.step))
            if device_aug_fn is not None:
                # packed path: RRC + flip + RandAugment on device
                images = normalize(device_aug_fn(
                    jax.random.fold_in(aug_rng, 2), batch["image"]))
            else:
                images = normalize(batch["image"])
            if aug_splits:
                # (B, S, H, W, C) u8 -> (S, B, H, W, C); erasing per view
                images = jnp.swapaxes(images, 0, 1)
                if args.reprob > 0:
                    s, b = images.shape[:2]
                    flat = images.reshape((s * b,) + images.shape[2:])
                    flat = random_erasing(jax.random.fold_in(aug_rng, 1),
                                          flat, prob=args.reprob)
                    images = flat.reshape(images.shape)
                targets = jax.nn.one_hot(batch["label"], args.num_classes)
                if args.smoothing:
                    targets = (targets * (1 - args.smoothing)
                               + args.smoothing / args.num_classes)
                return base_train_step(
                    state, {"image": images, "label": targets}, step_rng)
            if args.reprob > 0:
                images = random_erasing(
                    jax.random.fold_in(aug_rng, 1), images, prob=args.reprob)
            if args.mixup > 0 or args.cutmix > 0:
                images, targets = mixup_cutmix(
                    aug_rng, images, batch["label"], args.num_classes,
                    mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                    prob=args.mixup_prob, label_smoothing=args.smoothing)
            else:
                targets = jax.nn.one_hot(batch["label"], args.num_classes)
                if args.smoothing:
                    targets = (targets * (1 - args.smoothing)
                               + args.smoothing / args.num_classes)
            return base_train_step(
                state, {"image": images, "label": targets}, step_rng)

        train_step = jax.jit(full_train_step, donate_argnums=(0,))

        def _eval_vars(variables):
            if aug_splits:  # eval on the clean split's BN statistics
                return {"params": variables["params"],
                        "batch_stats": unstack_batch_stats(
                            variables.get("batch_stats", {}))}
            return variables

        @jax.jit
        def val_step(variables, images_u8, labels):
            if device_aug_fn is not None:
                from lemevit_tpu.data.device_aug import center_crop
                images_u8 = center_crop(images_u8, args.img_size)
            logits = model.apply(_eval_vars(variables), normalize(images_u8),
                                 train=False)
            return eval_metrics(logits, labels)

        from lemevit_tpu.utils.events import EventWriter
        events = EventWriter(out_dir, enabled=jax.process_index() == 0)
        rng = jax.random.PRNGKey(args.seed + 1)
        summary_path = os.path.join(out_dir, "summary.csv")
        best_top1 = -1.0
        start_epoch = int(state.step) // steps_per_epoch
        # mid-epoch (recovery) resume: skip the steps this epoch already ran
        resume_skip = int(state.step) % steps_per_epoch
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            tracker = MetricTracker()
            t_ep = time.perf_counter()
            first_step = resume_skip if epoch == start_epoch else 0
            # resume consumes the batches the crashed run WOULD have seen
            # (skip without decode; same seeded per-epoch permutation)
            it = (train_loader.iter_batches(first_step)
                  if first_step and hasattr(train_loader, "iter_batches")
                  else iter(train_loader))
            # H2D in a background thread (data/loader.DevicePrefetcher):
            # a blocking device_put overlaps the device step instead of
            # serializing with it. Measured on the axon tunnel the 38 MB
            # uint8 batch copy, not the grad step, was the training
            # bottleneck (E2EBENCH.json h2d_MBps).
            from lemevit_tpu.data.loader import DevicePrefetcher
            put = ((lambda v: jax.make_array_from_process_local_data(
                        batch_sharding, v)) if nproc > 1
                   else (lambda v: jax.device_put(v, batch_sharding)))
            dp_it = DevicePrefetcher(it, put, depth=2)
            for step_i in range(first_step, steps_per_epoch):
                try:
                    batch = next(dp_it)
                except StopIteration:
                    it = iter(train_loader)
                    dp_it = DevicePrefetcher(it, put, depth=2)
                    batch = next(dp_it)
                state, metrics = train_step(state, batch, rng)
                if (args.recovery_interval
                        and (step_i + 1) % args.recovery_interval == 0
                        and jax.process_index() == 0):
                    save_recovery(ckpt_dir, state)
                if step_i % args.log_interval == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["lr"] = float(sched(int(state.step))) * (
                        plateau_ctl.scale if plateau_ctl else 1.0)
                    tracker.update(m)
                    events.log(int(state.step), m)
                    logger.info(
                        "epoch %d step %d/%d loss %.4f gnorm %.2f lr %.2e",
                        epoch, step_i, steps_per_epoch, m["loss"],
                        m["grad_norm"], m["lr"])
            dp_it.close()  # don't leave a blocked thread pinning device batches
            epoch_time = time.perf_counter() - t_ep

            eval_stats = {}
            if (epoch + 1) % args.eval_interval == 0:
                for tag, variables in [
                        ("", state.variables),
                        ("ema_", state.ema_variables
                         if state.ema_params is not None else None)]:
                    if variables is None:
                        continue
                    tot = {"top1_sum": 0.0, "top5_sum": 0.0, "count": 0}
                    # val batches are per-process shards (device_batch/nproc),
                    # like train batches; skip only the ragged tail, and
                    # assemble the global array under multi-host.
                    local_batch = device_batch // nproc
                    for batch in val_loader:
                        if batch["image"].shape[0] != local_batch:
                            continue
                        if nproc > 1:
                            batch = {
                                k: jax.make_array_from_process_local_data(
                                    batch_sharding, v)
                                for k, v in batch.items()}
                        m = val_step(variables, batch["image"],
                                     batch["label"])
                        tot["top1_sum"] += float(m["top1_sum"])
                        tot["top5_sum"] += float(m["top5_sum"])
                        tot["count"] += int(m["count"])
                    if tot["count"]:
                        eval_stats[f"{tag}top1"] = (
                            100 * tot["top1_sum"] / tot["count"])
                        eval_stats[f"{tag}top5"] = (
                            100 * tot["top5_sum"] / tot["count"])
                logger.info("epoch %d eval %s", epoch, json.dumps(
                    {k: round(v, 3) for k, v in eval_stats.items()}))

            metric = max(eval_stats.get("top1", -1.0),
                         eval_stats.get("ema_top1", -1.0))
            if plateau_ctl is not None and eval_stats:
                from lemevit_tpu.train.optim import set_plateau_scale
                new_scale = plateau_ctl.update(metric)
                state = state.replace(opt_state=set_plateau_scale(
                    state.opt_state, new_scale))
                if new_scale < 1.0:
                    logger.info("plateau LR scale %.2e", new_scale)
            save_checkpoint(ckpt_dir, state, metric=metric,
                            max_history=args.checkpoint_hist)
            best_top1 = max(best_top1, metric)

            # Fixed field set regardless of eval cadence (reference
            # contract: update_summary, /root/reference/main.py:619-629).
            # DictWriter fieldnames from the first row's keys dropped the
            # eval columns whenever epoch 0 had no eval (--eval-interval>1),
            # leaving later eval rows headerless and DictReader-invisible.
            row = {"epoch": epoch,
                   "train_loss": tracker.summary().get("loss", float("nan")),
                   "epoch_time_s": round(epoch_time, 1), **{
                       k: round(v, 4) for k, v in eval_stats.items()}}
            fields = ["epoch", "train_loss", "epoch_time_s",
                      "top1", "top5", "ema_top1", "ema_top5"]
            write_header = not os.path.exists(summary_path)
            with open(summary_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=fields, restval="",
                                   extrasaction="ignore")
                if write_header:
                    w.writeheader()
                w.writerow(row)

        logger.info("done; best top1 %.3f", best_top1)
        return {"best_top1": best_top1, "steps": int(state.step)}


if __name__ == "__main__":
    main()
