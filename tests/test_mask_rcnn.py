"""Mask R-CNN tests: box coder roundtrip, forward shapes, end-to-end loss
gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu.models import create_model
from lemevit_tpu.tasks.mask_rcnn import (MaskRCNN, decode_boxes,
                                         encode_boxes, mask_rcnn_loss)


def test_box_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.stack([rng.uniform(20, 80, 10), rng.uniform(20, 80, 10),
                        rng.uniform(8, 30, 10), rng.uniform(8, 30, 10)],
                       -1).astype(np.float32)
    gt = np.stack([rng.uniform(10, 40, 10), rng.uniform(10, 40, 10),
                   rng.uniform(50, 90, 10), rng.uniform(50, 90, 10)],
                  -1).astype(np.float32)
    deltas = encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    rec = decode_boxes(jnp.asarray(anchors), deltas)
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def _model():
    return MaskRCNN(backbone=create_model("lemevit_micro",
                                          features_only=True),
                    num_classes=5, fpn_channels=16, num_proposals=8,
                    roi_size=4, mask_roi_size=4)


def test_forward_shapes():
    det = _model()
    x = jnp.zeros((1, 64, 64, 3))
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 8, 8, 5)  # 2x upsampled roi
    assert out["keep"].dtype == bool


def test_loss_gradients():
    det = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = det.init(jax.random.PRNGKey(1), x)
    gt_boxes = jnp.array([[[10., 10., 30., 30.], [40., 40., 60., 56.]]])
    gt_labels = jnp.array([[1, 3]])
    gt_masks = jnp.zeros((1, 2, 64, 64)).at[0, 0, 10:30, 10:30].set(1)
    gt_masks = gt_masks.at[0, 1, 40:56, 40:60].set(1)
    gt_valid = jnp.array([[True, True]])

    def loss_fn(params):
        out, _ = det.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            x, train=True, mutable=["batch_stats"])
        total, parts = mask_rcnn_loss(out, gt_boxes, gt_labels, gt_masks,
                                      gt_valid, num_classes=5)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        v["params"])
    assert np.isfinite(float(total))
    assert set(parts) == {"rpn_cls", "rpn_reg", "roi_cls", "roi_reg", "mask"}
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
