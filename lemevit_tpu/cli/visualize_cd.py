"""Dump change-detection predictions as PNGs (the reference's
change_detection/visualization.py surface).

Usage:
  python -m lemevit_tpu.cli.visualize_cd --checkpoint runs/cd/checkpoints/checkpoint-100 \
      --data-dir /data/CDD --split test --out ./vis
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--backbone", default="lemevit_small")
    p.add_argument("--patch-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="./vis")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lemevit_tpu.data import CDPairDataset, create_loader
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import BITChangeDetector
    from lemevit_tpu.cli.train_cd import _collate
    from lemevit_tpu.train import build_optimizer, create_train_state
    from lemevit_tpu.train.checkpoint import restore_checkpoint
    from lemevit_tpu.train.state import TrainState

    backbone = create_model(args.backbone, features_only=True)
    model = BITChangeDetector(backbone=backbone)
    dummy = jnp.zeros((1, args.patch_size, args.patch_size, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    tx = build_optimizer(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       apply_fn=model.apply, tx=tx)
    state = restore_checkpoint(args.checkpoint, state)

    ds = CDPairDataset(args.data_dir, args.split)
    loader = create_loader(ds, args.batch_size, is_training=False,
                           collate_fn=_collate)

    @jax.jit
    def predict(state, a, b):
        v = {"params": state.params}
        if jax.tree.leaves(state.batch_stats):
            v["batch_stats"] = state.batch_stats
        logits = model.apply(v, a.astype(jnp.float32) / 255.0,
                             b.astype(jnp.float32) / 255.0, train=False)
        return logits.argmax(-1)

    os.makedirs(args.out, exist_ok=True)
    idx = 0
    for batch in loader:
        pred = np.asarray(predict(state, jnp.asarray(batch["a"]),
                                  jnp.asarray(batch["b"])))
        for i in range(pred.shape[0]):
            name = ds.names[idx] if idx < len(ds.names) else f"{idx}.png"
            Image.fromarray((pred[i] * 255).astype(np.uint8)).save(
                os.path.join(args.out, name))
            idx += 1
            if args.limit and idx >= args.limit:
                return
    print(f"wrote {idx} masks to {args.out}")


if __name__ == "__main__":
    main()
