"""Native C++ host ops: build, load, and cross-check against the JAX ops."""
import numpy as np
import pytest

import jax.numpy as jnp

from lemevit_tpu.ops import native
from lemevit_tpu import ops as jops


pytestmark = [pytest.mark.skipif(not native.available(),
                                 reason="native lib unavailable (no g++)"),
              pytest.mark.fast]


def test_version():
    assert "leme_ops" in native.version()


def test_native_nms_matches_jax():
    rng = np.random.RandomState(0)
    for _ in range(3):
        n = 50
        xy = rng.rand(n, 2) * 60
        wh = rng.rand(n, 2) * 25 + 2
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        got = native.nms(boxes, scores, 0.5)
        ref = np.asarray(jops.nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.5))
        np.testing.assert_array_equal(got, ref)


def test_native_rotated_iou_matches_jax():
    rng = np.random.RandomState(1)
    a = np.stack([rng.uniform(20, 80, 12), rng.uniform(20, 80, 12),
                  rng.uniform(5, 30, 12), rng.uniform(5, 30, 12),
                  rng.uniform(-1.5, 1.5, 12)], -1).astype(np.float32)
    b = a[::-1].copy()
    got = native.box_iou_rotated(a, b)
    ref = np.asarray(jops.box_iou_rotated(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_native_obb_nms_matches_jax():
    rng = np.random.RandomState(2)
    boxes = np.stack([rng.uniform(20, 60, 30), rng.uniform(20, 60, 30),
                      rng.uniform(5, 25, 30), rng.uniform(5, 25, 30),
                      rng.uniform(-1.5, 1.5, 30)], -1).astype(np.float32)
    scores = rng.rand(30).astype(np.float32)
    got = native.obb_nms(boxes, scores, 0.2)
    ref = np.asarray(jops.obb_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.2))
    np.testing.assert_array_equal(got, ref)


def test_native_soft_nms_decays():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = native.soft_nms(boxes, scores, method="gaussian")
    assert out[0] == pytest.approx(0.9)
    assert out[1] < 0.8
    assert out[2] == pytest.approx(0.7, abs=1e-5)


def test_soft_nms_jax_matches_native_on_reordering_inputs():
    """Dense overlapping boxes make decay reorder the running max; the JAX
    path must re-select it like the C++ twin (true soft-NMS), not walk the
    initial score order."""
    rng = np.random.RandomState(3)
    for seed in range(4):
        rng = np.random.RandomState(seed)
        n = 40
        xy = rng.rand(n, 2) * 15  # crowded: heavy overlap
        wh = rng.rand(n, 2) * 20 + 5
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        for method in ("linear", "gaussian"):
            got = np.asarray(jops.soft_nms(
                jnp.asarray(boxes), jnp.asarray(scores), method=method))
            ref = native.soft_nms(boxes, scores, method=method)
            np.testing.assert_allclose(got, ref, atol=1e-5,
                                       err_msg=f"seed={seed} {method}")
