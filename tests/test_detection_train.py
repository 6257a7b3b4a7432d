"""Detection-training machinery tests: coders, assigner, sampler, losses,
end-to-end gradient step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu.tasks import detection_train as dt
from lemevit_tpu.tasks.detection import decode_midpoint_offset


def test_midpoint_offset_coder_roundtrip_axis_aligned():
    # axis-aligned gt: encode then decode must recover it
    anchors = jnp.array([[50., 50., 16., 16.]])
    gt = jnp.array([[52., 48., 20., 10., 0.0]])
    deltas = dt.encode_midpoint_offset(anchors, gt)
    rec = decode_midpoint_offset(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec[0, :4]), [52, 48, 20, 10],
                               atol=1e-4)
    assert abs(float(rec[0, 4])) < 1e-4


def test_midpoint_offset_coder_roundtrip_rotated():
    anchors = jnp.array([[50., 50., 16., 16.], [30., 40., 8., 24.]])
    gt = jnp.array([[50., 50., 20., 10., 0.4],
                    [32., 38., 12., 6., -1.1]])
    deltas = dt.encode_midpoint_offset(anchors, gt)
    rec = np.asarray(decode_midpoint_offset(anchors, deltas))
    np.testing.assert_allclose(rec[0], [50, 50, 20, 10, 0.4], atol=1e-3)
    # second gt has |theta| > pi/2 after canonicalization? -1.1 stays;
    # exact roundtrip within clip range
    np.testing.assert_allclose(rec[1], [32, 38, 12, 6, -1.1], atol=1e-3)


def test_obb_to_aabb():
    obb = jnp.array([[10., 10., 4., 2., np.pi / 2]])
    aabb = np.asarray(dt.obb_to_aabb(obb))[0]
    np.testing.assert_allclose(aabb, [9, 8, 11, 12], atol=1e-5)


def test_assigner():
    anchors = jnp.array([[0., 0., 10., 10.], [0., 0., 1., 1.],
                         [100., 100., 110., 110.]])
    gts = jnp.array([[0., 0., 10., 10.], [200., 200., 210., 210.]])
    mask = jnp.array([True, False])
    labels, assigned = dt.max_iou_assign(anchors, gts, mask)
    assert int(labels[0]) == 1 and int(assigned[0]) == 0
    assert int(labels[2]) == 0  # far anchor negative
    # padded gt never assigns positives
    assert not bool((assigned[labels == 1] == 1).any())


def test_sample_weights_budget():
    labels = jnp.array([1] * 10 + [0] * 1000 + [-1] * 5)
    cls_w, reg_w = dt.sample_weights(labels, num=256, pos_fraction=0.5)
    assert float(cls_w.sum()) == pytest.approx(10 + 246, rel=1e-5)
    assert float(reg_w.sum()) == pytest.approx(10, rel=1e-5)
    assert float(cls_w[-1]) == 0.0  # ignored anchors excluded


def test_smooth_l1():
    x = jnp.array([0.0, 0.05, 1.0])
    t = jnp.zeros(3)
    out = np.asarray(dt.smooth_l1(x, t, beta=1 / 9))
    assert out[0] == 0
    assert out[1] == pytest.approx(0.5 * 0.05 ** 2 / (1 / 9))
    assert out[2] == pytest.approx(1.0 - 0.5 / 9)


def test_detection_loss_end_to_end_grad():
    from lemevit_tpu.models import create_model
    from lemevit_tpu.tasks import OrientedRCNN
    det = OrientedRCNN(backbone=create_model("lemevit_micro",
                                             features_only=True),
                       num_classes=3, fpn_channels=16, num_proposals=8,
                       rpn_nms_pre=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = det.init(jax.random.PRNGKey(1), x)
    gt_obbs = jnp.array([[[32., 32., 20., 10., 0.2],
                          [10., 10., 8., 8., 0.0]]])
    gt_labels = jnp.array([[0, 2]])
    gt_mask = jnp.array([[True, True]])

    def loss_fn(params):
        out, _ = det.apply({"params": params,
                            "batch_stats": v.get("batch_stats", {})},
                           x, train=True, mutable=["batch_stats"])
        total, parts = dt.detection_loss(out, gt_obbs, gt_labels, gt_mask,
                                         num_classes=3)
        return total, parts

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        v["params"])
    assert np.isfinite(float(total))
    assert set(parts) == {"rpn_cls", "rpn_reg", "roi_cls", "roi_reg"}
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_select_proposals_rpn_nms_suppresses_same_level_overlaps():
    from lemevit_tpu.ops.rotated import box_iou_rotated
    from lemevit_tpu.tasks.detection import select_proposals

    # one level, 1x1 spatial grid of 6 anchors at the same spot: raw top-k
    # would return 6 near-identical boxes; NMS at 0.8 must keep ~1
    rng = np.random.default_rng(0)
    b, a = 1, 6
    anchors = [jnp.tile(jnp.array([[50., 50., 20., 20.]]), (a, 1))]
    scores = [jnp.asarray(rng.uniform(1, 2, (b, 1, 1, a)), jnp.float32)]
    # tiny delta jitter -> nearly coincident decoded boxes
    deltas = [jnp.asarray(rng.uniform(-0.01, 0.01, (b, 1, 1, a * 6)),
                          jnp.float32)]

    sel = select_proposals(scores, deltas, anchors, num_proposals=4,
                           nms_pre=6, nms_thr=0.8)
    assert sel.shape == (1, 4, 5)
    iou = np.asarray(box_iou_rotated(sel[0], sel[0]))
    off = iou[~np.eye(4, dtype=bool)]
    # survivors must not overlap above the NMS threshold... but with only
    # ~1 real survivor the rest are -inf-score fillers (duplicates of
    # suppressed rows). Verify against the no-NMS selection instead:
    raw = select_proposals(scores, deltas, anchors, num_proposals=4,
                           nms_pre=6, nms_thr=None)
    iou_raw = np.asarray(box_iou_rotated(raw[0], raw[0]))
    off_raw = iou_raw[~np.eye(4, dtype=bool)]
    assert off_raw.min() > 0.8          # raw top-k keeps heavy overlaps
    # with NMS, the top-1 slot is the max-score box and every *other*
    # distinct survivor (if any) overlaps it <= thr; since all 6 overlap,
    # only one distinct box survives -> selection is that box repeated
    assert np.allclose(np.asarray(sel[0, 0]), np.asarray(raw[0, 0]),
                       atol=1e-5)


def test_select_proposals_two_levels_distinct_boxes():
    from lemevit_tpu.tasks.detection import select_proposals

    # two levels with well-separated boxes: NMS must keep both, and the
    # global top-k must order by score across levels
    anchors = [jnp.array([[20., 20., 10., 10.]]),
               jnp.array([[80., 80., 30., 30.]])]
    scores = [jnp.full((1, 1, 1, 1), 1.0), jnp.full((1, 1, 1, 1), 3.0)]
    deltas = [jnp.zeros((1, 1, 1, 6)), jnp.zeros((1, 1, 1, 6))]
    sel = np.asarray(select_proposals(scores, deltas, anchors, 2,
                                      nms_pre=4, nms_thr=0.8))
    # higher-score level-2 box first
    np.testing.assert_allclose(sel[0, 0, :2], [80, 80], atol=1e-3)
    np.testing.assert_allclose(sel[0, 1, :2], [20, 20], atol=1e-3)


def test_rpn_nms_pre_map_ab():
    """A/B of the rpn_nms_pre contract (reference OBBDetection config:
    nms_pre=2000; our TPU default 512): with more GT-aligned peaks than
    the smaller top-k admits, nms_pre=2000 recovers full proposal recall
    while 512 caps it. Measured on this fixture: recall 512/700 = 0.731
    at nms_pre=512 vs 1.0 at 2000 (delta +0.269 when the scene has >512
    salient objects per level; typical DOTA tiles hold far fewer, which
    is why 512 is an acceptable default — but the knob is exposed as
    --rpn-nms-pre on cli/train_det.py for parity runs)."""
    from lemevit_tpu.tasks.detection import select_proposals

    n_gt = 700
    side = 40                      # 1600 anchor positions, 1 anchor each
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.arange(side) * 25.0 + 12.0,
                         np.arange(side) * 25.0 + 12.0)
    centers = np.stack([xs.ravel(), ys.ravel()], -1)
    anchors = [jnp.asarray(np.concatenate(
        [centers, np.full((side * side, 2), 8.0)], -1), jnp.float32)]
    scores = np.full((1, side, side, 1), -5.0, np.float32)
    gt_idx = rng.choice(side * side, n_gt, replace=False)
    scores.reshape(-1)[gt_idx] = rng.uniform(5.0, 6.0, n_gt)
    scores = [jnp.asarray(scores)]
    deltas = [jnp.zeros((1, side, side, 6), jnp.float32)]

    def recall(nms_pre):
        sel = np.asarray(select_proposals(
            scores, deltas, anchors, num_proposals=1024,
            nms_pre=nms_pre, nms_thr=0.8))[0]
        gt_centers = centers[gt_idx]
        hit = 0
        sel_xy = {(round(float(x), 1), round(float(y), 1))
                  for x, y in sel[:, :2]}
        for cx, cy in gt_centers:
            if (round(cx, 1), round(cy, 1)) in sel_xy:
                hit += 1
        return hit / n_gt

    r512 = recall(512)
    r2000 = recall(2000)
    assert r2000 >= 0.999, r2000
    assert abs(r512 - 512 / n_gt) < 0.01, r512
    assert r2000 > r512
