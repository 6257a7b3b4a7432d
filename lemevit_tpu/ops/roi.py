"""ROI ops: roi_align (v1 + aligned/v2), roi_align_rotated, roi_pool,
point_sample — gather + bilinear interpolation, fully differentiable
(gather's VJP is scatter-add, so no hand-written backward kernels).

Replaces the reference CUDA pack (object_detection/mmdet/ops/roi_align
1192 LoC, roi_align_rotated 1105 LoC, roi_pool 342 LoC). Feature maps are
NHWC; rois follow the mm conventions:
  roi_align:  (K,5)  [batch_idx, x1, y1, x2, y2]   in image coords
  rotated:    (K,6)  [batch_idx, cx, cy, w, h, theta(rad)]
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, bidx: jax.Array,
                     y: jax.Array, x: jax.Array) -> jax.Array:
    """Sample feat (B,H,W,C) at float coords y/x (any shape S, paired with
    integer batch indices bidx broadcastable to S). Out-of-range samples
    contribute zero (matching roi_align border handling). Returns (S..., C).
    """
    b, h, w, c = feat.shape
    valid = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yy, xx):
        flat = feat.reshape(b * h * w, c)
        lin = (bidx * h + yy) * w + xx
        return flat[lin.reshape(-1)].reshape(*yy.shape, c)

    out = (g(y0, x0) * (hy * hx)[..., None] + g(y0, x1) * (hy * lx)[..., None]
           + g(y1, x0) * (ly * hx)[..., None] + g(y1, x1) * (ly * lx)[..., None])
    return out * valid[..., None]


# rois per chunk in the checkpointed lax.map: keeps the four live bilinear
# tap buffers (chunk, ph, pw, ns, ns, C) bounded. At det-train scale
# (K=2048, 7x7 bins, ns=2, C=256) the unchunked graph held 16 x 392 MB
# f32 tap temps as autodiff residuals — 6.3 GB of the r5 det HBM OOM.
_ROI_CHUNK = 256


def _roi_chunked(impl, rois: jax.Array, k_small: int = 256):
    """Run per-roi sampler ``impl`` over checkpointed roi chunks; the
    backward recomputes each chunk's gathers instead of storing them."""
    k = rois.shape[0]
    if k <= k_small:
        return impl(rois)
    pad = (-k) % _ROI_CHUNK
    rp = jnp.pad(rois, ((0, pad), (0, 0)))
    chunks = rp.reshape(-1, _ROI_CHUNK, rois.shape[1])
    out = jax.lax.map(jax.checkpoint(impl), chunks)
    out = out.reshape((k + pad,) + out.shape[2:])
    return out[:k]


def roi_align(feat: jax.Array, rois: jax.Array, output_size: Tuple[int, int],
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = False) -> jax.Array:
    """ROI align on NHWC features. aligned=True is the v2/detectron2
    half-pixel convention. Returns (K, ph, pw, C)."""
    return _roi_chunked(
        lambda r: _roi_align_impl(feat, r, output_size, spatial_scale,
                                  sampling_ratio, aligned), rois)


def _roi_align_impl(feat, rois, output_size, spatial_scale,
                    sampling_ratio, aligned):
    ph, pw = output_size
    ns = max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0
    bidx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    rw = x2 - x1
    rh = y2 - y1
    if not aligned:  # v1 clamps degenerate rois to size 1
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bin_h = rh / ph
    bin_w = rw / pw
    # sample grid: (K, ph, ns) y coords and (K, pw, ns) x coords
    iy = (jnp.arange(ph)[None, :, None]
          + (jnp.arange(ns)[None, None, :] + 0.5) / ns)
    ix = (jnp.arange(pw)[None, :, None]
          + (jnp.arange(ns)[None, None, :] + 0.5) / ns)
    ys = y1[:, None, None] + iy * bin_h[:, None, None]   # (K,ph,ns)
    xs = x1[:, None, None] + ix * bin_w[:, None, None]   # (K,pw,ns)
    yy = ys[:, :, None, :, None]                          # (K,ph,1,ns,1)
    xx = xs[:, None, :, None, :]                          # (K,1,pw,1,ns)
    yy, xx = jnp.broadcast_arrays(yy, xx)
    bb = bidx[:, None, None, None, None]
    samples = _bilinear_gather(feat, jnp.broadcast_to(bb, yy.shape), yy, xx)
    return samples.mean(axis=(3, 4))


def roi_align_rotated(feat: jax.Array, rois: jax.Array,
                      output_size: Tuple[int, int],
                      spatial_scale: float = 1.0, sampling_ratio: int = 2,
                      aligned: bool = True, clockwise: bool = False
                      ) -> jax.Array:
    """ROI align on rotated rois (batch_idx,cx,cy,w,h,theta). The sample grid
    is the axis-aligned grid rotated by theta around the roi center."""
    return _roi_chunked(
        lambda r: _roi_align_rotated_impl(feat, r, output_size,
                                          spatial_scale, sampling_ratio,
                                          aligned, clockwise), rois)


def _roi_align_rotated_impl(feat, rois, output_size, spatial_scale,
                            sampling_ratio, aligned, clockwise):
    ph, pw = output_size
    ns = max(sampling_ratio, 1)
    bidx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale
    cy = rois[:, 2] * spatial_scale
    rw = rois[:, 3] * spatial_scale
    rh = rois[:, 4] * spatial_scale
    theta = rois[:, 5]
    if clockwise:
        theta = -theta
    if aligned:  # half-pixel convention: image coord -> pixel-index coord
        cx = cx - 0.5
        cy = cy - 0.5
    bin_h = rh / ph
    bin_w = rw / pw
    iy = (jnp.arange(ph)[None, :, None]
          + (jnp.arange(ns)[None, None, :] + 0.5) / ns)  # (1,ph,ns)
    ix = (jnp.arange(pw)[None, :, None]
          + (jnp.arange(ns)[None, None, :] + 0.5) / ns)
    # local coords centered on the roi
    ly = iy * bin_h[:, None, None] - rh[:, None, None] / 2  # (K,ph,ns)
    lx = ix * bin_w[:, None, None] - rw[:, None, None] / 2  # (K,pw,ns)
    lyy = ly[:, :, None, :, None]
    lxx = lx[:, None, :, None, :]
    lyy, lxx = jnp.broadcast_arrays(lyy, lxx)
    cos_t = jnp.cos(theta)[:, None, None, None, None]
    sin_t = jnp.sin(theta)[:, None, None, None, None]
    gx = lxx * cos_t - lyy * sin_t + cx[:, None, None, None, None]
    gy = lxx * sin_t + lyy * cos_t + cy[:, None, None, None, None]
    bb = jnp.broadcast_to(bidx[:, None, None, None, None], gy.shape)
    samples = _bilinear_gather(feat, bb, gy, gx)
    return samples.mean(axis=(3, 4))


def roi_pool(feat: jax.Array, rois: jax.Array, output_size: Tuple[int, int],
             spatial_scale: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """Quantized max ROI pooling. Returns (out (K,ph,pw,C), argmax linear
    spatial indices (K,ph,pw,C), -1 for empty bins)."""
    ph, pw = output_size
    b, h, w, c = feat.shape
    bidx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    rw = jnp.maximum(x2 - x1 + 1, 1)
    rh = jnp.maximum(y2 - y1 + 1, 1)

    # per-bin integer ranges, evaluated on a fixed grid of max bin size
    # (H, W are static; bins can't exceed the feature map)
    ys = jnp.arange(h)
    xs = jnp.arange(w)

    def one_roi(bi, xx1, yy1, hh, ww):
        # bin boundaries (ph+1,), (pw+1,)
        by = yy1 + (jnp.arange(ph + 1) * hh) // ph
        bx = xx1 + (jnp.arange(pw + 1) * ww) // pw
        in_y = (ys[None, :] >= jnp.clip(by[:-1, None], 0, h)) & \
               (ys[None, :] < jnp.clip(jnp.maximum(by[1:, None],
                                                   by[:-1, None] + 1), 0, h))
        in_x = (xs[None, :] >= jnp.clip(bx[:-1, None], 0, w)) & \
               (xs[None, :] < jnp.clip(jnp.maximum(bx[1:, None],
                                                   bx[:-1, None] + 1), 0, w))
        fmap = feat[bi]  # (H,W,C)
        # mask (ph,H) x (pw,W) -> (ph,pw,H,W)
        m = in_y[:, None, :, None] & in_x[None, :, None, :]
        vals = jnp.where(m[..., None], fmap[None, None], -jnp.inf)
        flat = vals.reshape(ph, pw, h * w, c)
        arg = jnp.argmax(flat, axis=2)
        out = jnp.max(flat, axis=2)
        empty = ~m.any(axis=(2, 3))
        out = jnp.where(empty[..., None], 0.0, out)
        arg = jnp.where(empty[..., None], -1, arg)
        return out, arg

    return jax.vmap(one_roi)(bidx, x1, y1, rh, rw)


def multilevel_roi_align(pyramid, rois: jax.Array,
                         output_size: Tuple[int, int],
                         strides, sampling_ratio: int = 2,
                         aligned: bool = True,
                         canonical_scale: float = 224.0) -> jax.Array:
    """FPN-style multi-level ROI align with static shapes.

    Each roi is assigned to level l = floor(l0 + log2(sqrt(area)/224))
    (FPN paper eq. 1). XLA-friendly: pool from EVERY level and select by
    the assignment mask — 4 small gathers instead of dynamic partitioning.
    rois: (K, 5) [batch_idx, x1, y1, x2, y2] in image coords.
    """
    areas = jnp.maximum((rois[:, 3] - rois[:, 1])
                        * (rois[:, 4] - rois[:, 2]), 1e-6)
    lvl = jnp.floor(jnp.log2(jnp.sqrt(areas) / canonical_scale + 1e-8)) + 2
    lvl = jnp.clip(lvl, 0, len(pyramid) - 1).astype(jnp.int32)
    out = None
    for i, (feat, s) in enumerate(zip(pyramid, strides)):
        pooled = roi_align(feat, rois, output_size,
                           spatial_scale=1.0 / s,
                           sampling_ratio=sampling_ratio, aligned=aligned)
        sel = (lvl == i)[:, None, None, None].astype(pooled.dtype)
        out = pooled * sel if out is None else out + pooled * sel
    return out


def point_sample(feat: jax.Array, points: jax.Array,
                 align_corners: bool = False) -> jax.Array:
    """grid_sample-style point sampling. feat (B,H,W,C); points (B,P,2) in
    [0,1] (x,y) normalized coords. Returns (B,P,C)."""
    b, h, w, c = feat.shape
    x = points[..., 0]
    y = points[..., 1]
    if align_corners:
        gx = x * (w - 1)
        gy = y * (h - 1)
    else:
        gx = x * w - 0.5
        gy = y * h - 0.5
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], gx.shape)
    return _bilinear_gather(feat, bidx, gy, gx)
