"""Task head tests: UperNet shapes + slide inference, BIT CD, Oriented RCNN,
box coder roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu.models import create_model


def _backbone():
    return create_model("lemevit_micro", features_only=True)


def test_upernet_shapes():
    from lemevit_tpu.tasks import UperNet
    model = UperNet(backbone=_backbone(), num_classes=6, channels=32,
                    aux_channels=16)
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, with_aux=True)
    logits, aux = model.apply(v, x, with_aux=True)
    assert logits.shape == (1, 64, 64, 6)
    assert aux.shape == (1, 64, 64, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_slide_inference_matches_single_window():
    from lemevit_tpu.tasks import slide_inference

    def apply_fn(crop):
        # deterministic "logits": mean pixel value per position
        return jnp.tile(crop.mean(-1, keepdims=True), (1, 1, 1, 3))

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    # crop == image: slide must equal direct apply
    out = slide_inference(apply_fn, x, 3, crop_size=64, stride=48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(apply_fn(x)),
                               atol=1e-6)
    # overlapping windows still average to the same values for this fn
    out2 = slide_inference(apply_fn, x, 3, crop_size=48, stride=32)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(apply_fn(x)),
                               atol=1e-5)


def test_bit_change_detector():
    from lemevit_tpu.tasks import BITChangeDetector
    model = BITChangeDetector(backbone=_backbone(), dec_depth=2,
                              num_classes=2)
    a = jnp.zeros((2, 64, 64, 3))
    b = jnp.ones((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(v, a, b)
    assert out.shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()
    # changed vs unchanged pairs must produce different logits
    # (note: identical inputs do NOT give constant maps — the token
    # positional embedding distinguishes the two temporal halves, matching
    # the reference BIT design)
    out_same = np.asarray(model.apply(v, a, a))
    assert not np.allclose(out_same, np.asarray(out), atol=1e-4)


def test_obb_coder_roundtrip():
    from lemevit_tpu.tasks import decode_obb_deltas, encode_obb_deltas
    rng = np.random.RandomState(0)
    rois = np.stack([
        rng.uniform(10, 90, 8), rng.uniform(10, 90, 8),
        rng.uniform(4, 20, 8), rng.uniform(4, 20, 8),
        rng.uniform(-1.2, 1.2, 8)], -1).astype(np.float32)
    gts = rois + rng.uniform(-2, 2, rois.shape).astype(np.float32) * \
        np.array([1, 1, 1, 1, 0.1], np.float32)
    gts[:, 2:4] = np.abs(gts[:, 2:4]) + 1.0
    deltas = encode_obb_deltas(jnp.asarray(rois), jnp.asarray(gts))
    rec = decode_obb_deltas(jnp.asarray(rois), deltas)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-3)


def test_midpoint_offset_decode_axis_aligned():
    from lemevit_tpu.tasks import decode_midpoint_offset
    anchors = jnp.array([[50., 50., 20., 10.]])
    deltas = jnp.zeros((1, 6))
    out = np.asarray(decode_midpoint_offset(anchors, deltas))[0]
    # zero deltas -> the anchor box, theta 0
    np.testing.assert_allclose(out, [50, 50, 20, 10, 0], atol=1e-5)


def test_oriented_rcnn_forward():
    from lemevit_tpu.tasks import OrientedRCNN
    det = OrientedRCNN(backbone=_backbone(), num_classes=4,
                       fpn_channels=32, num_proposals=16, rpn_nms_pre=32)
    x = jnp.zeros((1, 64, 64, 3))
    v = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(v, x)
    assert out["boxes"].shape == (1, 16, 5)
    assert out["scores"].shape == (1, 16)
    assert out["labels"].shape == (1, 16)
    train_out, _ = det.apply(v, x, train=True, mutable=["batch_stats"])
    assert train_out["roi_cls"].shape == (1, 16, 5)
