"""Detection training: anchor assignment, sampling, RPN + ROI losses.

Static-shape (XLA-friendly) equivalents of the mm-style training machinery
the reference gets from its external OBBDetection install (MaxIoUAssigner,
RandomSampler, delta coders, smooth-L1/CE losses — cf. the config at
object_detection/configs/obb/oriented_rcnn/
faster_rcnn_orpn_lemevit_small_rsp_fpn_1x_dota10.py:14-84):
  - ground-truth arrays are padded to a fixed K_gt with a validity mask
  - assignment produces per-anchor labels {-1 ignore, 0 neg, 1 pos}
  - "sampling" is a soft cap: per-anchor weights normalized to the target
    pos/neg counts (deterministic, differentiable-friendly, no dynamic
    shapes) — the fixed-budget analogue of mm's RandomSampler
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lemevit_tpu.ops.boxes import box_iou
from lemevit_tpu.tasks.detection import encode_obb_deltas


def obb_to_aabb(obbs: jax.Array) -> jax.Array:
    """(K,5) rotated -> (K,4) xyxy outer box."""
    from lemevit_tpu.ops.rotated import obb_to_corners
    corners = obb_to_corners(obbs)  # (K,4,2)
    lt = corners.min(axis=-2)
    rb = corners.max(axis=-2)
    return jnp.concatenate([lt, rb], axis=-1)


def canonicalize_obb(obbs: jax.Array) -> jax.Array:
    """Rotate the (w,h,theta) parametrization into theta in (-pi/2, pi/2)
    (swapping w/h when needed) — same box, unique representation."""
    cx, cy, w, h, t = (obbs[..., i] for i in range(5))
    t = jnp.arctan2(jnp.sin(t), jnp.cos(t))          # (-pi, pi]
    flip = jnp.abs(t) > jnp.pi / 2
    t = jnp.where(flip, t - jnp.sign(t) * jnp.pi, t)  # rotate by pi: same box
    quarter = t > jnp.pi / 4
    # optional: keep as-is; w/h swap only at |t|>pi/2 which the pi-rotation
    # already resolved (rectangles are pi-symmetric)
    del quarter, flip
    return jnp.stack([cx, cy, w, h, t], -1)


def encode_midpoint_offset(anchors: jax.Array, gt_obbs: jax.Array
                           ) -> jax.Array:
    """RPN regression targets: (dx,dy,dw,dh,da,db) from xywh anchors to
    rotated gts — exact inverse of detection.decode_midpoint_offset.
    (da,db) = center->right-edge-midpoint vector / external box dims."""
    gt_obbs = canonicalize_obb(gt_obbs)
    aabb = obb_to_aabb(gt_obbs)
    gx = (aabb[:, 0] + aabb[:, 2]) / 2
    gy = (aabb[:, 1] + aabb[:, 3]) / 2
    gw = jnp.maximum(aabb[:, 2] - aabb[:, 0], 1e-3)
    gh = jnp.maximum(aabb[:, 3] - aabb[:, 1], 1e-3)
    w, t = gt_obbs[:, 2], gt_obbs[:, 4]
    da = (w / 2) * jnp.cos(t) / gw - 0.5   # 0 == axis-aligned external box
    db = (w / 2) * jnp.sin(t) / gh
    ax, ay, aw, ah = (anchors[:, i] for i in range(4))
    dx = (gx - ax) / jnp.maximum(aw, 1e-3)
    dy = (gy - ay) / jnp.maximum(ah, 1e-3)
    dw = jnp.log(gw / jnp.maximum(aw, 1e-3))
    dh = jnp.log(gh / jnp.maximum(ah, 1e-3))
    return jnp.stack([dx, dy, dw, dh, da, db], -1)


def max_iou_assign(anchors_xyxy: jax.Array, gt_xyxy: jax.Array,
                   gt_mask: jax.Array, pos_thr: float = 0.7,
                   neg_thr: float = 0.3) -> Tuple[jax.Array, jax.Array]:
    """MaxIoUAssigner: per-anchor (labels {-1,0,1}, assigned gt index).
    Every valid gt also claims its best anchor (mm's low-quality match)."""
    iou = box_iou(anchors_xyxy, gt_xyxy)            # (A, K)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = iou.argmax(axis=1)
    best_iou = iou.max(axis=1)
    labels = jnp.where(best_iou >= pos_thr, 1,
                       jnp.where((best_iou < neg_thr) & (best_iou >= 0), 0,
                                 -1))
    # force-match each gt's argmax anchor as positive
    gt_best_anchor = iou.argmax(axis=0)             # (K,)
    gt_best_iou = iou.max(axis=0)
    claim = gt_mask & (gt_best_iou > 1e-3)
    labels = labels.at[gt_best_anchor].set(
        jnp.where(claim, 1, labels[gt_best_anchor]))
    best_gt = best_gt.at[gt_best_anchor].set(
        jnp.where(claim, jnp.arange(gt_xyxy.shape[0]), best_gt[gt_best_anchor]))
    return labels, best_gt


def sample_weights(labels: jax.Array, num: int = 256,
                   pos_fraction: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Fixed-budget sampling as per-anchor weights: positives weighted
    num_pos_target/num_pos (capped at 1), negatives likewise; returns
    (cls_weights, reg_weights) summing to ~num."""
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    n_pos = pos.sum()
    n_neg = neg.sum()
    want_pos = jnp.minimum(num * pos_fraction, n_pos)
    want_neg = jnp.minimum(num - want_pos, n_neg)
    w_pos = jnp.where(n_pos > 0, want_pos / jnp.maximum(n_pos, 1.0), 0.0)
    w_neg = jnp.where(n_neg > 0, want_neg / jnp.maximum(n_neg, 1.0), 0.0)
    cls_w = pos * w_pos + neg * w_neg
    return cls_w, pos * w_pos


def smooth_l1(pred: jax.Array, target: jax.Array,
              beta: float = 1.0 / 9.0) -> jax.Array:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def rpn_loss(scores: jax.Array, deltas: jax.Array, anchors: jax.Array,
             gt_obbs: jax.Array, gt_mask: jax.Array,
             num_samples: int = 256) -> Dict[str, jax.Array]:
    """Single-image RPN loss. scores (A,), deltas (A,6), anchors (A,4) xywh,
    gt_obbs (K,5) padded + gt_mask (K,)."""
    anchors_xyxy = jnp.concatenate(
        [anchors[:, :2] - anchors[:, 2:] / 2,
         anchors[:, :2] + anchors[:, 2:] / 2], -1)
    gt_xyxy = obb_to_aabb(gt_obbs)
    labels, assigned = max_iou_assign(anchors_xyxy, gt_xyxy, gt_mask)
    cls_w, reg_w = sample_weights(labels, num_samples)

    cls_target = (labels == 1).astype(jnp.float32)
    p = jax.nn.log_sigmoid(scores)
    np_ = jax.nn.log_sigmoid(-scores)
    bce = -(cls_target * p + (1 - cls_target) * np_)
    cls_loss = (bce * cls_w).sum() / jnp.maximum(cls_w.sum(), 1.0)

    targets = encode_midpoint_offset(anchors, gt_obbs[assigned])
    reg = (smooth_l1(deltas, targets).sum(-1) * reg_w)
    reg_loss = reg.sum() / jnp.maximum(reg_w.sum(), 1.0)
    return {"rpn_cls": cls_loss, "rpn_reg": reg_loss}


def roi_loss(cls_logits: jax.Array, reg: jax.Array, rois: jax.Array,
             gt_obbs: jax.Array, gt_labels: jax.Array, gt_mask: jax.Array,
             num_classes: int, pos_thr: float = 0.5,
             num_samples: int = 128) -> Dict[str, jax.Array]:
    """Single-image ROI-head loss. rois (R,5) rotated proposals;
    cls_logits (R, C+1) with background = last column; reg (R,5)."""
    from lemevit_tpu.ops.rotated import box_iou_rotated
    iou = box_iou_rotated(rois, gt_obbs)
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_gt = iou.argmax(axis=1)
    best_iou = iou.max(axis=1)
    labels01 = jnp.where(best_iou >= pos_thr, 1,
                         jnp.where(best_iou >= 0, 0, -1))
    cls_w, reg_w = sample_weights(labels01, num_samples, pos_fraction=0.25)

    cls_target = jnp.where(labels01 == 1, gt_labels[best_gt], num_classes)
    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), -1)
    ce = -jnp.take_along_axis(logp, cls_target[:, None], axis=1)[:, 0]
    cls_loss = (ce * cls_w).sum() / jnp.maximum(cls_w.sum(), 1.0)

    reg_targets = encode_obb_deltas(rois, gt_obbs[best_gt])
    reg_l = smooth_l1(reg, reg_targets).sum(-1)
    reg_loss = (reg_l * reg_w).sum() / jnp.maximum(reg_w.sum(), 1.0)
    return {"roi_cls": cls_loss, "roi_reg": reg_loss}


def detection_loss(train_out: Dict[str, jax.Array], gt_obbs: jax.Array,
                   gt_labels: jax.Array, gt_mask: jax.Array,
                   num_classes: int) -> Tuple[jax.Array, Dict]:
    """Batched Oriented R-CNN loss from OrientedRCNN's train outputs.
    gt_obbs (B,K,5), gt_labels (B,K), gt_mask (B,K)."""
    b = gt_obbs.shape[0]
    k = train_out["proposals"].shape[1]

    rpn = jax.vmap(
        lambda s, d, go, gm: rpn_loss(s, d, train_out["anchors"], go, gm)
    )(train_out["rpn_scores"], train_out["rpn_deltas"], gt_obbs, gt_mask)

    rois = train_out["rois"].reshape(b, k, 6)[..., 1:]
    roi = jax.vmap(
        lambda c, r, ro, go, gl, gm: roi_loss(c, r, ro, go, gl, gm,
                                              num_classes)
    )(train_out["roi_cls"], train_out["roi_reg"], rois, gt_obbs, gt_labels,
      gt_mask)

    parts = {kk: v.mean() for kk, v in {**rpn, **roi}.items()}
    total = sum(parts.values())
    return total, parts
