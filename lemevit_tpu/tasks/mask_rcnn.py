"""Mask R-CNN: axis-aligned two-stage detector + instance mask head.

Capability parity with the reference's COCO instance-segmentation config
(object_detection/configs/mask_rcnn/lemevit_small_mask_rcnn_r50_fpn_1x_coco.py):
LeMeViT pyramid -> FPN -> RPN (xywh deltas) -> ROI align -> box head
(cls + reg) + mask head (4 convs -> upsample -> per-class masks).
Static shapes throughout (fixed proposal counts, padded gt).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.core.layers import torch_conv_init, trunc_normal_init
from lemevit_tpu.ops.boxes import batched_nms, box_iou
from lemevit_tpu.ops.roi import multilevel_roi_align, roi_align
from lemevit_tpu.tasks.detection import FPN, make_anchors
from lemevit_tpu.tasks.detection_train import (max_iou_assign, sample_weights,
                                               smooth_l1)
from lemevit_tpu.tasks.upernet import resize

Dtype = Any


def encode_boxes(anchors_xywh: jax.Array, gt_xyxy: jax.Array) -> jax.Array:
    """Standard delta coder: (dx, dy, dw, dh)."""
    gx = (gt_xyxy[:, 0] + gt_xyxy[:, 2]) / 2
    gy = (gt_xyxy[:, 1] + gt_xyxy[:, 3]) / 2
    gw = jnp.maximum(gt_xyxy[:, 2] - gt_xyxy[:, 0], 1e-3)
    gh = jnp.maximum(gt_xyxy[:, 3] - gt_xyxy[:, 1], 1e-3)
    ax, ay, aw, ah = (anchors_xywh[:, i] for i in range(4))
    return jnp.stack([
        (gx - ax) / jnp.maximum(aw, 1e-3),
        (gy - ay) / jnp.maximum(ah, 1e-3),
        jnp.log(gw / jnp.maximum(aw, 1e-3)),
        jnp.log(gh / jnp.maximum(ah, 1e-3))], -1)


def decode_boxes(anchors_xywh: jax.Array, deltas: jax.Array) -> jax.Array:
    """Inverse of encode_boxes -> xyxy."""
    ax, ay, aw, ah = (anchors_xywh[:, i] for i in range(4))
    cx = ax + deltas[:, 0] * aw
    cy = ay + deltas[:, 1] * ah
    w = aw * jnp.exp(jnp.clip(deltas[:, 2], -4, 4))
    h = ah * jnp.exp(jnp.clip(deltas[:, 3], -4, 4))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, kernel_init=torch_conv_init(),
                       name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), dtype=jnp.float32,
                           name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1), dtype=jnp.float32,
                           name="rpn_reg")
        scores, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            scores.append(cls_conv(h))
            deltas.append(reg_conv(h))
        return scores, deltas


class BoxHead(nn.Module):
    num_classes: int
    fc_channels: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             kernel_init=trunc_normal_init(), name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                             kernel_init=trunc_normal_init(), name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                       name="cls")(x)
        reg = nn.Dense(4, dtype=jnp.float32, name="reg")(x)
        return cls, reg


class MaskHead(nn.Module):
    num_classes: int
    channels: int = 256
    num_convs: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                dtype=self.dtype,
                                kernel_init=torch_conv_init(),
                                name=f"conv{i}")(x))
        # 2x upsample deconv
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upsample")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                       name="mask")(x)


class MaskRCNN(nn.Module):
    """Static-shape Mask R-CNN over a features_only backbone.

    Inference returns fixed-size arrays: boxes (B,K,4), scores, labels,
    keep mask, masks (B,K,2*roi,2*roi,num_classes).
    """

    backbone: nn.Module
    num_classes: int = 80
    fpn_channels: int = 256
    num_proposals: int = 128
    roi_size: int = 7
    mask_roi_size: int = 14
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    score_thr: float = 0.05
    nms_iou: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        b = images.shape[0]
        feats = self.backbone(images, train=train)
        pyramid = FPN(self.fpn_channels, num_outs=len(self.strides),
                      dtype=self.dtype, name="neck")(feats)
        scores, deltas = RPNHead(self.fpn_channels, dtype=self.dtype,
                                 name="rpn")(pyramid)
        shapes = [f.shape[1:3] for f in pyramid]
        anchors = jnp.concatenate(make_anchors(shapes, self.strides), axis=0)
        all_scores = jnp.concatenate([s.reshape(b, -1) for s in scores], 1)
        all_deltas = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in deltas], 1)

        k = self.num_proposals
        topv, topi = jax.lax.top_k(all_scores, k)
        proposals = jax.vmap(
            lambda dl, idx: decode_boxes(anchors[idx], dl[idx]))(
            all_deltas, topi)  # (B,K,4) xyxy

        rois = jnp.concatenate([
            jnp.repeat(jnp.arange(b, dtype=jnp.float32)[:, None, None], k,
                       axis=1),
            proposals], axis=-1).reshape(b * k, 5)
        pooled = multilevel_roi_align(
            pyramid[:4], rois, (self.roi_size, self.roi_size),
            self.strides[:4], aligned=True)
        cls, reg = BoxHead(self.num_classes, dtype=self.dtype,
                           name="box_head")(pooled)
        boxes = decode_boxes(_xyxy_to_xywh(rois[:, 1:]), reg).reshape(
            b, k, 4)
        probs = jax.nn.softmax(cls, -1).reshape(b, k, self.num_classes + 1)

        mask_pooled = multilevel_roi_align(
            pyramid[:4], rois, (self.mask_roi_size, self.mask_roi_size),
            self.strides[:4], aligned=True)
        masks = MaskHead(self.num_classes, dtype=self.dtype,
                         name="mask_head")(mask_pooled)
        masks = masks.reshape(b, k, *masks.shape[1:])

        if train:
            return {"rpn_scores": all_scores, "rpn_deltas": all_deltas,
                    "anchors": anchors, "proposals": proposals,
                    "roi_cls": cls.reshape(b, k, -1),
                    "roi_reg": reg.reshape(b, k, 4),
                    "masks": masks, "rois": rois}
        best = probs[..., :-1].max(-1)
        labels = probs[..., :-1].argmax(-1)
        keep = jax.vmap(
            lambda bx, sc, lb: batched_nms(bx, sc, lb, self.nms_iou))(
            boxes, best, labels)
        keep = keep & (best > self.score_thr)
        return {"boxes": boxes, "scores": best * keep, "labels": labels,
                "keep": keep, "masks": jax.nn.sigmoid(masks)}


def _xyxy_to_xywh(xyxy):
    return jnp.stack([
        (xyxy[:, 0] + xyxy[:, 2]) / 2, (xyxy[:, 1] + xyxy[:, 3]) / 2,
        jnp.maximum(xyxy[:, 2] - xyxy[:, 0], 1e-3),
        jnp.maximum(xyxy[:, 3] - xyxy[:, 1], 1e-3)], -1)


def mask_rcnn_loss(out: Dict[str, jax.Array], gt_boxes: jax.Array,
                   gt_labels: jax.Array, gt_masks: jax.Array,
                   gt_mask_valid: jax.Array, num_classes: int
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batched loss. gt_boxes (B,K,4) xyxy padded; gt_labels (B,K);
    gt_masks (B,K,Hm,Wm) binary (full-image resolution or pre-resized);
    gt_mask_valid (B,K)."""
    b, k, _ = out["proposals"].shape
    anchors = out["anchors"]
    anchors_xyxy = jnp.concatenate(
        [anchors[:, :2] - anchors[:, 2:] / 2,
         anchors[:, :2] + anchors[:, 2:] / 2], -1)

    def single(scores, deltas, props, roi_cls, roi_reg, masks, gtb, gtl,
               gtm, gtv):
        labels01, assigned = max_iou_assign(anchors_xyxy, gtb, gtv,
                                            pos_thr=0.7, neg_thr=0.3)
        cls_w, reg_w = sample_weights(labels01, 256)
        tgt = (labels01 == 1).astype(jnp.float32)
        p = jax.nn.log_sigmoid(scores)
        np_ = jax.nn.log_sigmoid(-scores)
        rpn_cls = ((-(tgt * p + (1 - tgt) * np_)) * cls_w).sum() / \
            jnp.maximum(cls_w.sum(), 1.0)
        rpn_tgt = encode_boxes(anchors, gtb[assigned])
        rpn_reg = (smooth_l1(deltas, rpn_tgt).sum(-1) * reg_w).sum() / \
            jnp.maximum(reg_w.sum(), 1.0)

        iou = box_iou(props, gtb)
        iou = jnp.where(gtv[None, :], iou, -1.0)
        best_gt = iou.argmax(1)
        best_iou = iou.max(1)
        roi01 = jnp.where(best_iou >= 0.5, 1,
                          jnp.where(best_iou >= 0, 0, -1))
        rcls_w, rreg_w = sample_weights(roi01, 128, pos_fraction=0.25)
        cls_tgt = jnp.where(roi01 == 1, gtl[best_gt], num_classes)
        logp = jax.nn.log_softmax(roi_cls.astype(jnp.float32), -1)
        roi_ce = (-jnp.take_along_axis(logp, cls_tgt[:, None], 1)[:, 0]
                  * rcls_w).sum() / jnp.maximum(rcls_w.sum(), 1.0)
        reg_tgt = encode_boxes(_xyxy_to_xywh(props), gtb[best_gt])
        roi_l1 = (smooth_l1(roi_reg, reg_tgt).sum(-1) * rreg_w).sum() / \
            jnp.maximum(rreg_w.sum(), 1.0)

        # mask loss: gt mask cropped to each positive proposal via roi_align
        hm, wm = gtm.shape[1:3]
        ms = masks.shape[1]
        crop_rois = jnp.concatenate(
            [jnp.arange(k, dtype=jnp.float32)[:, None], props], -1)
        gt_per_roi = gtm[best_gt][..., None].astype(jnp.float32)  # (K,Hm,Wm,1)
        crops = roi_align(gt_per_roi, crop_rois, (ms, ms),
                          aligned=True)[..., 0]
        sel = jnp.take_along_axis(
            masks, cls_tgt[:, None, None, None].clip(0, num_classes - 1),
            axis=-1)[..., 0]
        bce = jnp.maximum(sel, 0) - sel * (crops > 0.5) + jnp.log1p(
            jnp.exp(-jnp.abs(sel)))
        mask_l = (bce.mean(axis=(1, 2)) * rreg_w).sum() / \
            jnp.maximum(rreg_w.sum(), 1.0)
        return rpn_cls, rpn_reg, roi_ce, roi_l1, mask_l

    parts = jax.vmap(single)(
        out["rpn_scores"], out["rpn_deltas"], out["proposals"],
        out["roi_cls"], out["roi_reg"], out["masks"],
        gt_boxes, gt_labels, gt_masks, gt_mask_valid)
    names = ["rpn_cls", "rpn_reg", "roi_cls", "roi_reg", "mask"]
    d = {n: p.mean() for n, p in zip(names, parts)}
    return sum(d.values()), d
