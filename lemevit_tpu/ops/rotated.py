"""Rotated-box geometry: IoU, NMS, polygon NMS, convex sort.

TPU-native replacement for the reference's rotated geometry pack
(object_detection/mmdet/ops/{box_iou_rotated,nms_rotated,convex}, ~1.8k LoC
C++/CUDA built on dynamic-count Sutherland-Hodgman clipping +
convex hulls). XLA needs static shapes, so the same geometry is expressed as
fixed-size masked computation: a convex quad clipped by 4 half-planes has at
most 8 vertices, so every polygon lives in an (8,2) buffer with a validity
mask, and compaction is a stable argsort on the mask — the trick the
reference itself uses in its pure-torch aligned path
(box_iou_rotated_wrapper.py:112-159).

Boxes are (cx, cy, w, h, theta[rad]); polygons are (8,) flat xy quads.
Everything is vmap-able and differentiable (areas are polynomial in coords).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

MAXV = 8  # max vertices of quad ∩ quad


def obb_to_corners(boxes: jax.Array) -> jax.Array:
    """(..., 5) -> (..., 4, 2) corner points (CCW for theta=0)."""
    cx, cy, w, h, t = (boxes[..., i] for i in range(5))
    dx = jnp.stack([w / 2, w / 2, -w / 2, -w / 2], -1)
    dy = jnp.stack([-h / 2, h / 2, h / 2, -h / 2], -1)
    cos_t = jnp.cos(t)[..., None]
    sin_t = jnp.sin(t)[..., None]
    x = cx[..., None] + dx * cos_t - dy * sin_t
    y = cy[..., None] + dx * sin_t + dy * cos_t
    return jnp.stack([x, y], -1)


def _compact(pts: jax.Array, valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stable-move valid points to the front. pts (V,2), valid (V,)."""
    order = jnp.argsort(~valid, stable=True)
    return pts[order], valid[order]


def _clip_halfplane(poly: jax.Array, n: jax.Array, a: jax.Array,
                    b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Clip polygon (MAXV,2), n valid verts, by the half-plane left of edge
    a->b. Returns (new poly (MAXV,2), new count)."""
    idx = jnp.arange(MAXV)
    cur = poly
    nxt = poly[(idx + 1) % jnp.maximum(n, 1)]
    edge = b - a

    def side(p):  # >=0: inside (left of a->b)
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    s_cur = side(cur)
    s_nxt = side(nxt)
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12), denom)
    inter = cur + t[:, None] * (nxt - cur)

    active = idx < n
    # per input edge: emit cur (if inside), emit intersection (if crossing)
    emit1 = cur
    emit1_ok = active & in_cur
    emit2 = inter
    emit2_ok = active & (in_cur ^ in_nxt)
    pts = jnp.stack([emit1, emit2], axis=1).reshape(2 * MAXV, 2)
    ok = jnp.stack([emit1_ok, emit2_ok], axis=1).reshape(2 * MAXV)
    pts, ok = _compact(pts, ok)
    return pts[:MAXV], jnp.minimum(ok.sum(), MAXV)


def _poly_area(poly: jax.Array, n: jax.Array) -> jax.Array:
    """Shoelace area of the first n vertices of (MAXV,2)."""
    idx = jnp.arange(MAXV)
    nxt = poly[(idx + 1) % jnp.maximum(n, 1)]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    cross = jnp.where(idx < n, cross, 0.0)
    return jnp.abs(cross.sum()) / 2.0


def quad_intersection_area(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Intersection area of two convex quads, each (4,2)."""
    # ensure CCW orientation (shoelace sign)
    def ccw(q):
        x, y = q[:, 0], q[:, 1]
        s = jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
        return jnp.where(s < 0, q[::-1], q)

    q1 = ccw(q1)
    q2 = ccw(q2)
    poly = jnp.zeros((MAXV, 2)).at[:4].set(q1)
    n = jnp.asarray(4, jnp.int32)

    def body(i, carry):
        poly, n = carry
        a = q2[i]
        b = q2[(i + 1) % 4]
        return _clip_halfplane(poly, n, a, b)

    poly, n = jax.lax.fori_loop(0, 4, body, (poly, n))
    return jnp.where(n >= 3, _poly_area(poly, n), 0.0)


def box_iou_rotated(a: jax.Array, b: jax.Array, mode: str = "iou",
                    aligned: bool = False, eps: float = 1e-6) -> jax.Array:
    """Rotated IoU. a (N,5), b (M,5) -> (N,M); aligned=True -> (N,) pairwise.
    mode 'iof' = intersection over a's area."""
    ca = obb_to_corners(a)
    cb = obb_to_corners(b)
    area_a = a[:, 2] * a[:, 3]
    area_b = b[:, 2] * b[:, 3]
    if aligned:
        inter = jax.vmap(quad_intersection_area)(ca, cb)
        union = area_a if mode == "iof" else area_a + area_b - inter
        return inter / jnp.maximum(union, eps)
    inter = jax.vmap(lambda qa: jax.vmap(
        lambda qb: quad_intersection_area(qa, qb))(cb))(ca)
    if mode == "iof":
        union = area_a[:, None]
    else:
        union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, eps)


def obb_overlaps(a, b, mode: str = "iou", aligned: bool = False):
    """Alias matching the reference wrapper name."""
    return box_iou_rotated(a, b, mode=mode, aligned=aligned)


def obb_nms(boxes: jax.Array, scores: jax.Array,
            iou_threshold: float = 0.1,
            min_size: float = 1e-2) -> jax.Array:
    """Greedy NMS on rotated boxes (N,5). Tiny boxes (w or h < min_size) are
    dropped up front (reference nms_rotated_wrapper.py:33-39). Returns keep
    mask (N,)."""
    from lemevit_tpu.ops.boxes import blocked_sup_matrix, greedy_keep

    n = boxes.shape[0]
    big = (boxes[:, 2] >= min_size) & (boxes[:, 3] >= min_size)
    order = jnp.argsort(-jnp.where(big, scores, -jnp.inf))
    b = boxes[order]
    valid = big[order]
    sup = blocked_sup_matrix(box_iou_rotated, b, iou_threshold)
    keep_sorted = greedy_keep(sup, valid)
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def poly_iou(p1: jax.Array, p2: jax.Array, eps: float = 1e-6) -> jax.Array:
    """IoU of two convex quads given as flat (8,) xy polygons."""
    q1 = p1.reshape(4, 2)
    q2 = p2.reshape(4, 2)
    inter = quad_intersection_area(q1, q2)
    a1 = _poly_area(jnp.zeros((MAXV, 2)).at[:4].set(q1), jnp.asarray(4))
    a2 = _poly_area(jnp.zeros((MAXV, 2)).at[:4].set(q2), jnp.asarray(4))
    return inter / jnp.maximum(a1 + a2 - inter, eps)


def poly_nms(polys: jax.Array, scores: jax.Array,
             iou_threshold: float = 0.1) -> jax.Array:
    """Greedy NMS on flat (N,8) convex quads. Returns keep mask (N,)."""
    from lemevit_tpu.ops.boxes import blocked_sup_matrix, greedy_keep

    n = polys.shape[0]
    order = jnp.argsort(-scores)
    p = polys[order]

    def pair_iou(pa, pb):
        return jax.vmap(lambda a: jax.vmap(
            lambda b: poly_iou(a, b))(pb))(pa)

    sup = blocked_sup_matrix(pair_iou, p, iou_threshold)
    keep_sorted = greedy_keep(sup, jnp.ones((n,), bool))
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def arb_batched_nms(boxes_or_polys: jax.Array, scores: jax.Array,
                    idxs: jax.Array, iou_threshold: float = 0.1) -> jax.Array:
    """Class-aware rotated/poly NMS via center-offset trick."""
    if boxes_or_polys.shape[-1] == 5:
        span = boxes_or_polys[:, :2].max() + boxes_or_polys[:, 2:4].max() + 1
        off = idxs.astype(boxes_or_polys.dtype)[:, None] * span
        shifted = boxes_or_polys.at[:, :2].add(off)
        return obb_nms(shifted, scores, iou_threshold)
    span = boxes_or_polys.max() + 1
    off = idxs.astype(boxes_or_polys.dtype)[:, None] * span
    return poly_nms(boxes_or_polys + off, scores, iou_threshold)


def convex_sort(pts: jax.Array, masks: jax.Array) -> jax.Array:
    """Sort candidate intersection points into convex-polygon (CCW) order
    around the centroid of the valid points; invalid points go last with
    index -1. pts (B,N,2), masks (B,N) -> indices (B,N), int32.

    Equivalent surface to the reference's convex_ext.convex_sort
    (object_detection/mmdet/ops/convex), used by the pure-tensor rotated
    overlap path.
    """
    def one(p, m):
        cnt = jnp.maximum(m.sum(), 1)
        centroid = (p * m[:, None]).sum(0) / cnt
        d = p - centroid
        ang = jnp.arctan2(d[:, 1], d[:, 0])
        key = jnp.where(m, ang, jnp.inf)
        order = jnp.argsort(key)
        return jnp.where(jnp.arange(p.shape[0]) < m.sum(), order, -1)

    return jax.vmap(one)(pts, masks).astype(jnp.int32)
