"""Ops pack tests: NMS/IoU vs numpy oracles, rotated geometry vs analytic
cases, ROI align vs direct interpolation + gradcheck, corner pool, losses,
ORN rotation identities."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu import ops


# ------------------------------------------------------------------ boxes

def _np_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter) > thr:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 40
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 30 + 2
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        keep = np.where(np.asarray(
            ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)))[0]
        ref = _np_nms(boxes, scores, 0.5)
        assert sorted(keep.tolist()) == ref


def test_box_iou_simple():
    a = jnp.array([[0., 0., 2., 2.]])
    b = jnp.array([[1., 1., 3., 3.], [0., 0., 2., 2.], [4., 4., 5., 5.]])
    iou = np.asarray(ops.box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-6)
    iof = np.asarray(ops.box_iou(a, b, mode="iof"))[0]
    np.testing.assert_allclose(iof, [0.25, 1.0, 0.0], atol=1e-6)


def test_batched_nms_classes_dont_suppress():
    boxes = jnp.array([[0., 0., 10., 10.], [1., 1., 10., 10.]])
    scores = jnp.array([0.9, 0.8])
    # same class: second suppressed
    keep = np.asarray(ops.batched_nms(boxes, scores, jnp.array([0, 0]), 0.5))
    assert keep.tolist() == [True, False]
    # different class: both kept
    keep = np.asarray(ops.batched_nms(boxes, scores, jnp.array([0, 1]), 0.5))
    assert keep.tolist() == [True, True]


def test_soft_nms_decays_overlaps():
    boxes = jnp.array([[0., 0., 10., 10.], [1., 1., 10., 10.],
                       [50., 50., 60., 60.]])
    scores = jnp.array([0.9, 0.8, 0.7])
    out = np.asarray(ops.soft_nms(boxes, scores, method="gaussian"))
    assert out[0] == pytest.approx(0.9)
    assert out[1] < 0.8  # decayed
    assert out[2] == pytest.approx(0.7, abs=1e-5)  # far box untouched


# ------------------------------------------------------------------ rotated

def test_rotated_iou_axis_aligned_matches():
    # theta=0 boxes must agree with axis-aligned IoU
    # a: center (1,1) 2x2 -> [0,2]x[0,2]; b: center (1.5,1.5) -> [.5,2.5]^2
    # inter 1.5^2=2.25, union 8-2.25=5.75
    a5 = jnp.array([[1., 1., 2., 2., 0.]])
    b5 = jnp.array([[1.5, 1.5, 2., 2., 0.], [10., 10., 1., 1., 0.]])
    got = np.asarray(ops.box_iou_rotated(a5, b5))[0]
    np.testing.assert_allclose(got, [2.25 / 5.75, 0.0], atol=1e-5)


def test_rotated_iou_90_deg_invariance():
    a = jnp.array([[0., 0., 4., 2., 0.]])
    b = jnp.array([[0., 0., 2., 4., np.pi / 2]])  # same rectangle rotated
    got = float(ops.box_iou_rotated(a, b)[0, 0])
    assert got == pytest.approx(1.0, abs=1e-5)


def test_rotated_iou_45_deg_analytic():
    # unit square vs itself rotated 45°: intersection is a regular octagon
    # with area 8*(sqrt(2)-1)^2... known value: 2*(sqrt(2)-1) ≈ 0.8284
    a = jnp.array([[0., 0., 1., 1., 0.]])
    b = jnp.array([[0., 0., 1., 1., np.pi / 4]])
    inter_expected = 2 * (np.sqrt(2) - 1)
    iou_expected = inter_expected / (2 - inter_expected)
    got = float(ops.box_iou_rotated(a, b)[0, 0])
    assert got == pytest.approx(iou_expected, abs=1e-4)


def test_obb_nms_and_poly_nms():
    boxes = jnp.array([
        [5., 5., 4., 2., 0.3],
        [5.1, 5., 4., 2., 0.3],   # near-duplicate
        [20., 20., 4., 2., 1.0],
    ])
    scores = jnp.array([0.9, 0.85, 0.5])
    keep = np.asarray(ops.obb_nms(boxes, scores, 0.1))
    assert keep.tolist() == [True, False, True]

    polys = ops.obb_to_corners(boxes).reshape(3, 8)
    keepp = np.asarray(ops.poly_nms(polys, scores, 0.1))
    assert keepp.tolist() == [True, False, True]


def test_convex_sort_orders_ccw():
    pts = jnp.array([[[1., 0.], [0., 1.], [-1., 0.], [0., -1.], [9., 9.]]])
    mask = jnp.array([[True, True, True, True, False]])
    idx = np.asarray(ops.convex_sort(pts, mask))[0]
    assert idx[-1] == -1
    ordered = pts[0][idx[:4]]
    # consecutive cross products all positive => CCW convex order
    o = np.asarray(ordered)
    for i in range(4):
        v1 = o[(i + 1) % 4] - o[i]
        v2 = o[(i + 2) % 4] - o[(i + 1) % 4]
        assert np.cross(v1, v2) > 0


# ------------------------------------------------------------------ roi

def test_roi_align_constant_map():
    # constant feature map -> every output value equals the constant
    feat = jnp.full((1, 16, 16, 3), 5.0)
    rois = jnp.array([[0., 2., 2., 10., 10.]])
    out = ops.roi_align(feat, rois, (7, 7), sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_linear_gradient_map():
    # f(x,y) = x: bilinear sampling is exact for linear functions
    w = 16
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (w, w))
    feat = xs[None, :, :, None]
    rois = jnp.array([[0., 2., 2., 10., 10.]])
    out = ops.roi_align(feat, rois, (4, 4), sampling_ratio=4, aligned=True)
    # bin centers along x: 2 + (j+0.5)*2; aligned (half-pixel) convention
    # samples value x - 0.5 on this map (pixel j sits at coord j + 0.5)
    expected = np.array([2 + (j + 0.5) * 2 - 0.5 for j in range(4)])
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 0], expected,
                               atol=1e-4)


def test_roi_align_gradcheck():
    from jax.test_util import check_grads
    feat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
    rois = jnp.array([[0., 1., 1., 6., 6.]])
    check_grads(lambda f: ops.roi_align(f, rois, (3, 3)).sum(),
                (feat,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_roi_align_rotated_zero_angle_matches_aligned():
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    # xyxy roi (2,2)-(10,10) == rotated roi centered (6,6), w=h=8, theta=0
    out1 = ops.roi_align(feat, jnp.array([[0., 2., 2., 10., 10.]]), (4, 4),
                         sampling_ratio=2, aligned=True)
    out2 = ops.roi_align_rotated(
        feat, jnp.array([[0., 6., 6., 8., 8., 0.]]), (4, 4),
        sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_roi_pool_max():
    feat = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(9.0)
    rois = jnp.array([[0., 0., 0., 7., 7.]])
    out, argmax = ops.roi_pool(feat, rois, (2, 2))
    assert float(np.asarray(out).max()) == 9.0
    assert (np.asarray(argmax) >= -1).all()


def test_point_sample_center():
    feat = jnp.arange(16.0).reshape(1, 4, 4, 1)
    pts = jnp.array([[[0.5, 0.5]]])  # center
    out = float(ops.point_sample(feat, pts)[0, 0, 0])
    assert out == pytest.approx(7.5)  # avg of 5,6,9,10


# ------------------------------------------------------------------ pooling

def test_corner_pool_directions():
    x = jnp.zeros((1, 4, 4, 1)).at[0, 1, 2, 0].set(3.0)
    top = np.asarray(ops.top_pool(x))[0, :, :, 0]
    assert top[0, 2] == 3.0 and top[1, 2] == 3.0 and top[2, 2] == 0.0
    bottom = np.asarray(ops.bottom_pool(x))[0, :, :, 0]
    assert bottom[3, 2] == 3.0 and bottom[0, 2] == 0.0
    left = np.asarray(ops.left_pool(x))[0, :, :, 0]
    assert left[1, 0] == 3.0
    right = np.asarray(ops.right_pool(x))[0, :, :, 0]
    assert right[1, 3] == 3.0


def test_masked_conv():
    from lemevit_tpu.ops.pooling import masked_conv2d
    x = jnp.ones((1, 6, 6, 2))
    k = jnp.ones((3, 3, 2, 4))
    mask = jnp.zeros((1, 6, 6)).at[0, 2, 2].set(1.0)
    out = masked_conv2d(x, mask, k)
    assert float(out[0, 2, 2, 0]) == 18.0
    assert float(np.abs(np.asarray(out)).sum()) == 18.0 * 4


# ------------------------------------------------------------------ losses

def test_sigmoid_focal_matches_manual():
    logits = jnp.array([[2.0, -1.0], [0.5, 0.5]])
    targets = jnp.array([0, 1])
    got = float(ops.sigmoid_focal_loss(logits, targets, gamma=2.0,
                                       alpha=0.25, reduction="sum"))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    t = np.eye(2)[np.asarray(targets)]
    pt = p * t + (1 - p) * (1 - t)
    w = 0.25 * t + 0.75 * (1 - t)
    ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    expected = (w * (1 - pt) ** 2 * ce).sum()
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_dice_perfect_prediction_near_zero():
    logits = jnp.stack([jnp.full((4, 4), -20.0), jnp.full((4, 4), 20.0)])[None]
    targets = jnp.ones((1, 4, 4), jnp.int32)
    assert float(ops.dice_loss(logits, targets)) < 0.05
    assert float(ops.jaccard_loss(logits, targets)) < 0.1
    assert float(ops.hybrid_loss(logits, targets)) < 0.1


def test_focal_gamma0_is_ce():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 3))
    targets = jnp.array([0, 1, 2, 1])
    got = float(ops.softmax_focal_loss(logits, targets, gamma=0.0))
    logp = jax.nn.log_softmax(logits)
    expected = float(-logp[jnp.arange(4), targets].mean())
    assert got == pytest.approx(expected, rel=1e-6)


# ------------------------------------------------------------------ orn

def test_arf_shapes_and_identity_rotation():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 8, 3, 3))
    out = ops.active_rotating_filter(w, n_rot=8)
    assert out.shape == (32, 16, 3, 3)
    # rotation r=0 must be the unrotated filter
    w0 = np.asarray(w[0]).reshape(2 * 8, 3, 3)
    np.testing.assert_allclose(np.asarray(out[0]), w0, atol=1e-6)


def test_rie_max_over_orientations():
    x = jnp.arange(16.0).reshape(1, 1, 1, 16)
    out = ops.rotation_invariant_encoding(x, n_orient=8)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [7.0, 15.0])


def test_multilevel_roi_align_selects_levels():
    from lemevit_tpu.ops.roi import multilevel_roi_align
    # two constant pyramids with distinct values: small roi -> level 0,
    # huge roi -> deeper level
    pyr = [jnp.full((1, 64 // s, 64 // s, 2), float(i))
           for i, s in enumerate([4, 8, 16, 32])]
    rois = jnp.array([[0., 8., 8., 24., 24.],    # 16px -> level 0
                      [0., 2., 2., 62., 62.]])   # 60px -> level 1
    out = ops.multilevel_roi_align(pyr, rois, (2, 2), [4, 8, 16, 32],
                                   canonical_scale=64.0)
    assert float(out[0].mean()) == pytest.approx(0.0, abs=1e-6)
    assert float(out[1].mean()) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.fast
def test_quad_inter_area_lanes_matches_scalar():
    """The structure-of-arrays all-pairs quad intersection (the det-scale
    layout fix) must match the scalar Sutherland-Hodgman exactly."""
    import numpy as np

    from lemevit_tpu.ops import rotated as R
    rng = np.random.RandomState(0)
    n, m = 13, 17
    a = np.stack([rng.uniform(0, 50, n), rng.uniform(0, 50, n),
                  rng.uniform(2, 20, n), rng.uniform(2, 20, n),
                  rng.uniform(-2, 2, n)], -1).astype(np.float32)
    b = np.stack([rng.uniform(0, 50, m), rng.uniform(0, 50, m),
                  rng.uniform(2, 20, m), rng.uniform(2, 20, m),
                  rng.uniform(-2, 2, m)], -1).astype(np.float32)
    # identical pairs too (full-overlap path)
    b[:5] = a[:5]
    ca = R.obb_to_corners(jnp.asarray(a))
    cb = R.obb_to_corners(jnp.asarray(b))
    lanes = np.asarray(R._quad_inter_area_lanes(ca, cb))
    scalar = np.asarray(jax.vmap(lambda qa: jax.vmap(
        lambda qb: R.quad_intersection_area(qa, qb))(cb))(ca))
    np.testing.assert_allclose(lanes, scalar, rtol=1e-4, atol=1e-3)


@pytest.mark.fast
def test_roi_align_chunked_matches_direct():
    """The checkpointed chunked roi path (K > 256) must equal the direct
    path, values and grads."""
    import numpy as np

    from lemevit_tpu.ops import roi as R
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    k = 300  # > k_small, not a multiple of the chunk (tests padding)
    rois = np.stack([rng.randint(0, 2, k).astype(np.float32),
                     rng.uniform(0, 10, k), rng.uniform(0, 10, k),
                     rng.uniform(11, 15, k), rng.uniform(11, 15, k)], -1)
    rois = jnp.asarray(rois, jnp.float32)
    direct = R._roi_align_impl(feat, rois, (3, 3), 1.0, 2, True)
    chunked = R.roi_align(feat, rois, (3, 3), aligned=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                               atol=1e-5)
    g1 = jax.grad(lambda f: R.roi_align(f, rois, (3, 3),
                                        aligned=True).sum())(feat)
    g2 = jax.grad(lambda f: R._roi_align_impl(f, rois, (3, 3), 1.0, 2,
                                              True).sum())(feat)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    rrois = jnp.concatenate([rois[:, :1],
                             jnp.asarray(rng.uniform(4, 12, (k, 2))),
                             jnp.asarray(rng.uniform(2, 6, (k, 2))),
                             jnp.asarray(rng.uniform(-1, 1, (k, 1)))], -1)
    d = R._roi_align_rotated_impl(feat, rrois, (3, 3), 1.0, 2, True, False)
    c = R.roi_align_rotated(feat, rrois, (3, 3))
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=1e-5)
