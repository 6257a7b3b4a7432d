"""Fixpoint (parallel) greedy NMS == sequential greedy NMS.

The greedy_keep rewrite (ops/boxes.py) replaces the N-step sequential walk
with a suppression-DAG fixpoint — these tests pin exact equivalence against
a straight Python transcription of greedy NMS, including adversarial
suppression chains (worst-case convergence depth) and tie/degenerate cases.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lemevit_tpu.ops.boxes import box_iou, greedy_keep, nms
from lemevit_tpu.ops.rotated import box_iou_rotated, obb_nms


def seq_greedy(iou: np.ndarray, valid: np.ndarray, thr: float
               ) -> np.ndarray:
    """Reference: sequential greedy over score-sorted order."""
    n = iou.shape[0]
    keep = np.zeros(n, bool)
    for i in range(n):
        if not valid[i]:
            continue
        keep[i] = not any(keep[j] and iou[j, i] > thr for j in range(i))
    return keep


def _rand_boxes(rng, n, span=100.0, wh=30.0):
    xy = rng.rand(n, 2) * span
    s = rng.rand(n, 2) * wh + 1
    return np.concatenate([xy, xy + s], -1).astype(np.float32)


@pytest.mark.fast
@pytest.mark.parametrize("n,seed", [(1, 0), (16, 1), (200, 2), (512, 3)])
def test_fixpoint_matches_sequential_axis_aligned(n, seed):
    rng = np.random.RandomState(seed)
    boxes = _rand_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    thr = 0.3
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), thr))
    order = np.argsort(-scores)
    iou = np.asarray(box_iou(jnp.asarray(boxes[order]),
                             jnp.asarray(boxes[order])))
    ref_sorted = seq_greedy(iou, np.ones(n, bool), thr)
    ref = np.zeros(n, bool)
    ref[order] = ref_sorted
    np.testing.assert_array_equal(keep, ref)


@pytest.mark.fast
def test_fixpoint_chain_worst_case():
    """A suppression chain a0>a1>...>a_k where greedy keeps the EVEN links:
    the naive one-shot parallel mask would kill every non-first link."""
    k = 60
    boxes = np.stack([
        np.array([i * 10.0, 0.0, i * 10.0 + 18.0, 10.0]) for i in range(k)
    ]).astype(np.float32)          # each overlaps only its neighbours
    scores = np.linspace(1.0, 0.5, k).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.2))
    assert keep.tolist() == [i % 2 == 0 for i in range(k)]


@pytest.mark.fast
def test_fixpoint_all_identical_and_disjoint():
    b = np.array([[0, 0, 10, 10]] * 8, np.float32)
    s = np.arange(8, 0, -1).astype(np.float32)
    keep = np.asarray(nms(jnp.asarray(b), jnp.asarray(s), 0.5))
    assert keep.sum() == 1 and keep[0]
    b2 = _rand_boxes(np.random.RandomState(0), 8, span=1e6, wh=2.0)
    keep2 = np.asarray(nms(jnp.asarray(b2), jnp.asarray(
        np.ones(8, np.float32)), 0.5))
    assert keep2.all()


@pytest.mark.fast
@pytest.mark.parametrize("n,seed", [(64, 0), (300, 4)])
def test_fixpoint_matches_sequential_rotated(n, seed):
    rng = np.random.RandomState(seed)
    boxes = np.stack([
        rng.rand(n) * 80, rng.rand(n) * 80,
        rng.rand(n) * 25 + 2, rng.rand(n) * 25 + 2,
        (rng.rand(n) - 0.5) * np.pi,
    ], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    thr = 0.2
    keep = np.asarray(obb_nms(jnp.asarray(boxes), jnp.asarray(scores), thr))
    order = np.argsort(-scores)
    iou = np.asarray(box_iou_rotated(jnp.asarray(boxes[order]),
                                     jnp.asarray(boxes[order])))
    ref_sorted = seq_greedy(iou, np.ones(n, bool), thr)
    ref = np.zeros(n, bool)
    ref[order] = ref_sorted
    np.testing.assert_array_equal(keep, ref)


@pytest.mark.fast
def test_blocked_sup_matrix_equals_direct():
    from lemevit_tpu.ops.boxes import blocked_sup_matrix
    rng = np.random.RandomState(0)
    b = jnp.asarray(_rand_boxes(rng, 130))
    direct = np.asarray(box_iou(b, b) > 0.3)
    blocked = np.asarray(blocked_sup_matrix(box_iou, b, 0.3, block=32))
    np.testing.assert_array_equal(direct, blocked)


@pytest.mark.fast
def test_greedy_keep_empty_and_invalid():
    sup = jnp.zeros((4, 4), bool)
    valid = jnp.zeros((4,), bool)
    assert not np.asarray(greedy_keep(sup, valid)).any()
