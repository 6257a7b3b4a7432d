"""On-chip compile gate + timed step for the downstream task verticals.

Every r4 chip artifact (BENCH/TRAINBENCH/E2EBENCH) was classification-only
at 224^2; the seg/det/CD runtimes were CPU-tested but their config-of-
record shapes — UperNet-base 512^2 (stage-1 N=16384), Oriented R-CNN
1024^2 (N=65536, rpn_nms_pre 2000), BIT 256^2 — had never met the real
TPU compiler, the exact scoped-VMEM/Mosaic failure class that sank
round 2 at base-224 (VERDICT r4 missing #1). This builds each vertical's
EXACT cli train graph (same model ctor args, same loss) at the
config-of-record batch/resolution, AOT-compiles it on the current
backend, then (unless --compile-only) runs timed steps.

Reference workloads: semantic_segmentation/configs/_base_/models/
upernet_lemevit_tiny.py:52 (slide 512/384), object_detection/configs/obb/
oriented_rcnn/faster_rcnn_orpn_lemevit_small_rsp_fpn_1x_dota10.py:14-84,
change_detection/train.py:60-70.

Usage:  python scripts/taskbench.py [--tasks seg det cd] [--compile-only]
Writes TASKBENCH.json; exits nonzero if any task fails (gate semantics,
like scripts/trainbench.py).
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _state_for(model, variables, lr=1e-3):
    import optax

    from lemevit_tpu.train.state import TrainState
    tx = optax.adamw(lr, weight_decay=0.05)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]),
                      apply_fn=model.apply, tx=tx)


def build_seg(backend="auto"):
    """UperNet-base @ 512^2, batch 10 — configs/seg/upernet_lemevit_base_
    512x512_80k_potsdam.yaml; graph identical to cli/train_seg.py."""
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import UperNet

    num_classes, ignore_index, crop, batch = 5, 5, 512, 10
    backbone = create_model("lemevit_base", features_only=True,
                            dtype=jnp.bfloat16, attn_backend=backend)
    model = UperNet(backbone=backbone, num_classes=num_classes,
                    channels=512, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, crop, crop, 3)), with_aux=True)
    state = _state_for(model, variables)

    def loss_fn(params, batch_stats, batch):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize(batch["image"]), train=True, with_aux=True,
            mutable=["batch_stats"])
        logits, aux = out

        def ce(lg):
            logp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
            oh = jax.nn.one_hot(batch["mask"], num_classes)
            pix = -(oh * logp).sum(-1)
            valid = (batch["mask"] != ignore_index).astype(jnp.float32)
            return (pix * valid).sum() / jnp.maximum(valid.sum(), 1.0)

        return ce(logits) + 0.4 * ce(aux), mut.get("batch_stats", {})

    def step(state, batch):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, stats), loss

    batch = {"image": jnp.zeros((batch, crop, crop, 3), jnp.uint8),
             "mask": jnp.zeros((batch, crop, crop), jnp.int32)}
    return step, state, batch


def build_det(backend="auto"):
    """Oriented R-CNN small @ 1024^2, batch 8, rpn_nms_pre 2000 —
    configs/det/oriented_rcnn_lemevit_small_fpn_1x_dota10.yaml; graph
    identical to cli/train_det.py."""
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import OrientedRCNN
    from lemevit_tpu.tasks.detection_train import detection_loss

    num_classes, img, batch, max_boxes = 15, 1024, 8, 64
    backbone = create_model("lemevit_small", features_only=True,
                            dtype=jnp.bfloat16, attn_backend=backend)
    det = OrientedRCNN(backbone=backbone, num_classes=num_classes,
                       fpn_channels=256, num_proposals=256,
                       rpn_nms_pre=2000, dtype=jnp.bfloat16)
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, img, img, 3)))
    state = _state_for(det, variables)

    def loss_fn(params, batch_stats, batch):
        out, mut = det.apply(
            {"params": params, "batch_stats": batch_stats},
            normalize(batch["image"]), train=True, mutable=["batch_stats"])
        total, parts = detection_loss(
            out, batch["gt_obbs"], batch["gt_labels"], batch["gt_mask"],
            num_classes=num_classes)
        return total, (parts, mut.get("batch_stats", {}))

    def step(state, batch):
        (loss, (parts, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, stats), loss

    gt = jnp.tile(jnp.asarray([[100., 100., 40., 20., 0.3]]),
                  (batch, max_boxes, 1))
    batch = {"image": jnp.zeros((batch, img, img, 3), jnp.uint8),
             "gt_obbs": gt,
             "gt_labels": jnp.zeros((batch, max_boxes), jnp.int32),
             "gt_mask": jnp.ones((batch, max_boxes), bool)}
    return step, state, batch


def build_cd(backend="auto"):
    """BIT-small @ 256^2, batch 16 — configs/cd/bit_lemevit_small_cdd.yaml;
    graph identical to cli/train_cd.py (loss ce)."""
    from lemevit_tpu.models import create_model
    from lemevit_tpu.ops.losses import softmax_focal_loss
    from lemevit_tpu.tasks import BITChangeDetector

    patch, batch = 256, 16
    backbone = create_model("lemevit_small", features_only=True,
                            dtype=jnp.bfloat16, attn_backend=backend)
    model = BITChangeDetector(backbone=backbone, dec_depth=8, token_len=4,
                              dtype=jnp.bfloat16)
    dummy = jnp.zeros((1, patch, patch, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    state = _state_for(model, variables)

    def norm(u8):
        return u8.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)

    def loss_fn(params, batch_stats, batch):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          norm(batch["a"]), norm(batch["b"]), train=True,
                          mutable=["batch_stats"])
        logits, mut = out
        nchw = logits.transpose(0, 3, 1, 2)
        loss = softmax_focal_loss(nchw, batch["mask"], gamma=0.0)
        return loss, mut.get("batch_stats", {})

    def step(state, batch):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch)
        return state.apply_gradients(grads, stats), loss

    batch = {"a": jnp.zeros((batch, patch, patch, 3), jnp.uint8),
             "b": jnp.zeros((batch, patch, patch, 3), jnp.uint8),
             "mask": jnp.zeros((batch, patch, patch), jnp.int32)}
    return step, state, batch


BUILDERS = {"seg": build_seg, "det": build_det, "cd": build_cd}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", default=["seg", "det", "cd"])
    ap.add_argument("--compile-only", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--attn-backend", default="auto",
                    help="backbone attention backend (auto/pallas/xla)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    results = {"backend": jax.default_backend(),
               "attn_backend": args.attn_backend, "failed": []}
    for task in args.tasks:
        entry = {}
        results[task] = entry
        try:
            step, state, batch = BUILDERS[task](args.attn_backend)
            jstep = jax.jit(step, donate_argnums=(0,))
            t0 = time.perf_counter()
            compiled = jstep.lower(state, batch).compile()
            entry["compile_s"] = round(time.perf_counter() - t0, 1)
            entry["compile_ok"] = True
            print(f"{task}: compiled in {entry['compile_s']}s", flush=True)
            if not args.compile_only:
                state, loss = compiled(state, batch)
                float(loss)  # warm
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    state, loss = compiled(state, batch)
                float(loss)
                dt = (time.perf_counter() - t0) / args.reps
                n = jax.tree.leaves(batch)[0].shape[0]
                entry["step_ms"] = round(dt * 1000.0, 2)
                entry["img_per_sec"] = round(n / dt, 1)
                print(f"{task}: {entry['step_ms']} ms/step "
                      f"({entry['img_per_sec']} img/s)", flush=True)
        except Exception as e:
            entry["compile_ok"] = False
            entry["error"] = f"{type(e).__name__}: {e}"
            results["failed"].append(task)
            traceback.print_exc()

    out = args.out or os.path.join(os.path.dirname(__file__), "..",
                                   "TASKBENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    sys.exit(1 if results["failed"] else 0)


if __name__ == "__main__":
    main()
