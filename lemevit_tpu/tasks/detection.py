"""Oriented object detection: FPN neck + Oriented RPN + rotated ROI head.

Capability-parity surface for the reference's OBBDetection overlay
(object_detection/configs/obb/oriented_rcnn/...py:14-84): LeMeViT pyramid ->
FPN (5 outs) -> OrientedRPNHead (midpoint-offset boxes) -> rotated ROI align
-> box head with (dx,dy,dw,dh,dtheta) regression, class scores, rotated NMS.

This is a from-scratch functional detector designed for XLA static shapes:
fixed proposal counts (top-k + padded NMS masks), batched rotated ROI align,
no dynamic tensors anywhere.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.core.layers import torch_conv_init, trunc_normal_init
from lemevit_tpu.ops.roi import roi_align_rotated
from lemevit_tpu.ops.rotated import obb_nms
from lemevit_tpu.tasks.upernet import resize

Dtype = Any


class FPN(nn.Module):
    """Feature pyramid network neck: laterals + top-down + extra level."""

    out_channels: int = 256
    num_outs: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> List[jax.Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=torch_conv_init(), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize(laterals[i], (h, w),
                                                       method="nearest")
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=torch_conv_init(), name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        while len(outs) < self.num_outs:
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
        return outs


class OrientedRPNHead(nn.Module):
    """RPN predicting midpoint-offset oriented boxes: per anchor
    (dx, dy, dw, dh, da, db) + objectness (the Oriented R-CNN encoding)."""

    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        cls_scores, bbox_preds = [], []
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, kernel_init=torch_conv_init(),
                       name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), dtype=jnp.float32,
                           name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 6, (1, 1), dtype=jnp.float32,
                           name="rpn_reg")
        for f in feats:
            h = nn.relu(conv(f))
            cls_scores.append(cls_conv(h))
            bbox_preds.append(reg_conv(h))
        return cls_scores, bbox_preds


def make_anchors(shapes: Sequence[Tuple[int, int]],
                 strides: Sequence[int],
                 scale: float = 8.0,
                 ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> List[jax.Array]:
    """Per-level anchor grids (H*W*A, 4) xywh (axis-aligned bases)."""
    out = []
    for (h, w), s in zip(shapes, strides):
        ws = jnp.asarray([s * scale * (r ** -0.5) for r in ratios])
        hs = jnp.asarray([s * scale * (r ** 0.5) for r in ratios])
        cx = (jnp.arange(w) + 0.5) * s
        cy = (jnp.arange(h) + 0.5) * s
        cyy, cxx = jnp.meshgrid(cy, cx, indexing="ij")
        centers = jnp.stack([cxx, cyy], -1).reshape(-1, 1, 2)
        sizes = jnp.stack([ws, hs], -1)[None]  # (1,A,2)
        anchors = jnp.concatenate(
            [jnp.broadcast_to(centers, (h * w, len(ratios), 2)),
             jnp.broadcast_to(sizes, (h * w, len(ratios), 2))], -1)
        out.append(anchors.reshape(-1, 4))
    return out


def decode_midpoint_offset(anchors: jax.Array, deltas: jax.Array
                           ) -> jax.Array:
    """Midpoint-offset decoding -> rotated boxes (cx,cy,w,h,theta).

    anchors (N,4) xywh; deltas (N,6) = (dx,dy,dw,dh,da,db): the first four
    decode the external (axis-aligned) box like a standard coder; (da, db)
    is the center->right-edge-midpoint vector of the oriented box,
    normalized by the external box dims — the same 6-number
    external-box-plus-midpoint-offset family as Oriented R-CNN's coder, but
    exactly invertible for any theta in (-pi/2, pi/2) (see
    detection_train.encode_midpoint_offset for the inverse).
    """
    ax, ay, aw, ah = (anchors[:, i] for i in range(4))
    dx, dy, dw, dh, da, db = (deltas[:, i] for i in range(6))
    gx = ax + dx * aw
    gy = ay + dy * ah
    gw = aw * jnp.exp(jnp.clip(dw, -4, 4))
    gh = ah * jnp.exp(jnp.clip(dh, -4, 4))
    # zero deltas decode to the axis-aligned external box itself
    vx = (0.5 + jnp.clip(da, -0.45, 0.25)) * gw  # right-edge midpoint vec
    vy = jnp.clip(db, -0.75, 0.75) * gh
    w_r = 2 * jnp.sqrt(vx * vx + vy * vy)
    theta = jnp.arctan2(vy, jnp.maximum(vx, 1e-6))
    # external height = w|sin t| + h cos t  ->  recover h
    cos_t = jnp.maximum(jnp.cos(theta), 1e-3)
    h_r = jnp.maximum((gh - w_r * jnp.abs(jnp.sin(theta))) / cos_t, 1e-3)
    return jnp.stack([gx, gy, w_r, h_r, theta], -1)


def encode_obb_deltas(rois: jax.Array, gts: jax.Array) -> jax.Array:
    """Deltas (dx,dy,dw,dh,dtheta) from rotated rois to rotated gts, in the
    roi frame (standard rotated-box coder)."""
    cos_t = jnp.cos(rois[:, 4])
    sin_t = jnp.sin(rois[:, 4])
    dx_g = gts[:, 0] - rois[:, 0]
    dy_g = gts[:, 1] - rois[:, 1]
    dx = (cos_t * dx_g + sin_t * dy_g) / jnp.maximum(rois[:, 2], 1e-3)
    dy = (-sin_t * dx_g + cos_t * dy_g) / jnp.maximum(rois[:, 3], 1e-3)
    dw = jnp.log(jnp.maximum(gts[:, 2], 1e-3)
                 / jnp.maximum(rois[:, 2], 1e-3))
    dh = jnp.log(jnp.maximum(gts[:, 3], 1e-3)
                 / jnp.maximum(rois[:, 3], 1e-3))
    dt = (gts[:, 4] - rois[:, 4])
    dt = jnp.arctan2(jnp.sin(dt), jnp.cos(dt))  # wrap to (-pi, pi]
    return jnp.stack([dx, dy, dw, dh, dt], -1)


def decode_obb_deltas(rois: jax.Array, deltas: jax.Array) -> jax.Array:
    cos_t = jnp.cos(rois[:, 4])
    sin_t = jnp.sin(rois[:, 4])
    gx = (rois[:, 0] + rois[:, 2] * deltas[:, 0] * cos_t
          - rois[:, 3] * deltas[:, 1] * sin_t)
    gy = (rois[:, 1] + rois[:, 2] * deltas[:, 0] * sin_t
          + rois[:, 3] * deltas[:, 1] * cos_t)
    gw = rois[:, 2] * jnp.exp(jnp.clip(deltas[:, 2], -4, 4))
    gh = rois[:, 3] * jnp.exp(jnp.clip(deltas[:, 3], -4, 4))
    gt = rois[:, 4] + deltas[:, 4]
    return jnp.stack([gx, gy, gw, gh, gt], -1)


def multilevel_roi_align_rotated(pyramid, rois: jax.Array,
                                 output_size, strides,
                                 canonical_scale: float = 224.0) -> jax.Array:
    """FPN-level-assigned rotated ROI align (masked per-level pooling, same
    scheme as ops.roi.multilevel_roi_align). rois (K,6)."""
    areas = jnp.maximum(rois[:, 3] * rois[:, 4], 1e-6)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-8)) + 2
    lvl = jnp.clip(lvl, 0, len(pyramid) - 1).astype(jnp.int32)
    out = None
    for i, (feat, s) in enumerate(zip(pyramid, strides)):
        pooled = roi_align_rotated(feat, rois, output_size,
                                   spatial_scale=1.0 / s)
        sel = (lvl == i)[:, None, None, None].astype(pooled.dtype)
        out = pooled * sel if out is None else out + pooled * sel
    return out


def select_proposals(cls_scores: Sequence[jax.Array],
                     bbox_preds: Sequence[jax.Array],
                     anchors: Sequence[jax.Array],
                     num_proposals: int,
                     nms_pre: int = 512,
                     nms_thr: Optional[float] = 0.8) -> jax.Array:
    """RPN proposal selection with static shapes: per-level nms_pre top-k
    -> decode -> padded rotated NMS within each level -> global top-K.

    Matches OBBDetection's RPN contract (nms_across_levels=False,
    nms_pre/nms_thr/max_num; reference config
    faster_rcnn_orpn_lemevit_small_rsp_fpn_1x_dota10.py train/test_cfg rpn).
    Suppressed rows keep their slot with score -inf so every shape is
    static. nms_thr=None skips NMS (raw top-k). Returns (B, K, 5) rotated
    proposals."""
    b = cls_scores[0].shape[0]
    lvl_scores, lvl_boxes = [], []
    for s_lvl, p_lvl, a_lvl in zip(cls_scores, bbox_preds, anchors):
        sc = s_lvl.reshape(b, -1)
        dl = p_lvl.reshape(b, -1, 6)
        kl = min(nms_pre, sc.shape[1])
        topv, topi = jax.lax.top_k(sc, kl)
        dec = jax.vmap(lambda d, i, a=a_lvl: decode_midpoint_offset(
            a[i], d[i]))(dl, topi)
        if nms_thr is not None:
            keep = jax.vmap(lambda bx, v, t=nms_thr: obb_nms(bx, v, t))(
                dec, topv)
            topv = jnp.where(keep, topv, -jnp.inf)
        lvl_scores.append(topv)
        lvl_boxes.append(dec)
    cat_scores = jnp.concatenate(lvl_scores, axis=1)
    cat_boxes = jnp.concatenate(lvl_boxes, axis=1)
    if cat_scores.shape[1] < num_proposals:
        # fewer candidates than requested proposals: pad with -inf slots
        # (static output shape; padded rows mirror suppressed rows)
        pad = num_proposals - cat_scores.shape[1]
        cat_scores = jnp.pad(cat_scores, ((0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        cat_boxes = jnp.pad(cat_boxes, ((0, 0), (0, pad), (0, 0)))
    _, sel = jax.lax.top_k(cat_scores, num_proposals)
    return jnp.take_along_axis(cat_boxes, sel[..., None], axis=1)


class OBBRoIHead(nn.Module):
    """Rotated ROI head: multi-level roi_align_rotated -> 2 FC ->
    cls + obb regression."""

    num_classes: int
    fc_channels: int = 1024
    roi_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid, rois: jax.Array, strides):
        pooled = multilevel_roi_align_rotated(
            pyramid, rois, (self.roi_size, self.roi_size), strides)
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             kernel_init=trunc_normal_init(), name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             kernel_init=trunc_normal_init(), name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                       name="cls")(x)
        reg = nn.Dense(5, dtype=jnp.float32, name="reg")(x)
        return cls, reg


class OrientedRCNN(nn.Module):
    """Two-stage oriented detector with static shapes throughout.

    Inference: returns (boxes (K,5), scores (K,), labels (K,), keep mask).
    K = num_proposals is fixed; invalid rows have score 0.
    """

    backbone: nn.Module
    num_classes: int = 15          # DOTA-1.0
    fpn_channels: int = 256
    num_proposals: int = 256
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    score_thr: float = 0.05
    nms_iou: float = 0.1
    # RPN proposal selection (OBBDetection rpn train/test_cfg contract:
    # per-level nms_pre top-k -> decode -> rotated NMS within each level
    # (nms_across_levels=False) -> global max_num; reference config
    # faster_rcnn_orpn_lemevit_small_rsp_fpn_1x_dota10.py train/test_cfg
    # rpn nms_pre=2000, nms_thr=0.8). nms_pre is scaled down by default to
    # keep the padded rotated-IoU matrices TPU-friendly.
    rpn_nms_pre: int = 512
    rpn_nms_thr: float = 0.8
    rpn_nms: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, *, train: bool = False):
        b = images.shape[0]
        feats = self.backbone(images, train=train)
        pyramid = FPN(self.fpn_channels, num_outs=len(self.strides),
                      dtype=self.dtype, name="neck")(feats)
        cls_scores, bbox_preds = OrientedRPNHead(
            self.fpn_channels, dtype=self.dtype, name="rpn")(pyramid)

        shapes = [f.shape[1:3] for f in pyramid]
        anchors = make_anchors(shapes, self.strides)

        # flatten all levels
        all_scores = jnp.concatenate(
            [s.reshape(b, -1) for s in cls_scores], axis=1)
        all_deltas = jnp.concatenate(
            [p.reshape(b, -1, 6) for p in bbox_preds], axis=1)
        all_anchors = jnp.concatenate(anchors, axis=0)

        k = self.num_proposals
        proposals = select_proposals(
            cls_scores, bbox_preds, anchors, k,
            nms_pre=self.rpn_nms_pre,
            nms_thr=self.rpn_nms_thr if self.rpn_nms else None)

        rois = jnp.concatenate([
            jnp.repeat(jnp.arange(b, dtype=jnp.float32)[:, None, None], k,
                       axis=1),
            proposals], axis=-1).reshape(b * k, 6)
        cls, reg = OBBRoIHead(self.num_classes, dtype=self.dtype,
                              name="roi_head")(
            pyramid[:4], rois, self.strides[:4])

        boxes = decode_obb_deltas(rois[:, 1:], reg).reshape(b, k, 5)
        scores = jax.nn.softmax(cls, axis=-1).reshape(
            b, k, self.num_classes + 1)
        if train:
            return {"rpn_scores": all_scores, "rpn_deltas": all_deltas,
                    "anchors": all_anchors, "proposals": proposals,
                    "roi_cls": cls.reshape(b, k, -1),
                    "roi_reg": reg.reshape(b, k, 5), "rois": rois}
        # per-image post-processing: best class, threshold, rotated NMS
        best_scores = scores[..., :-1].max(-1)
        labels = scores[..., :-1].argmax(-1)
        keep = jax.vmap(lambda bx, sc: obb_nms(bx, sc, self.nms_iou))(
            boxes, best_scores)
        keep = keep & (best_scores > self.score_thr)
        return {"boxes": boxes, "scores": best_scores * keep,
                "labels": labels, "keep": keep}
