"""Oriented Response Networks ops.

Replaces the reference's orn CUDA pack (object_detection/mmdet/ops/orn,
~700 LoC): ActiveRotatingFilter rotates conv filters across nOrientation
discrete angles — a *static* index permutation of the (k,k,nOrientation)
filter cells, so on TPU it is a precomputed gather folded into the conv
weight reshape (no custom kernel, exact gradients via the gather transpose).
RotationInvariantEncoding is a max over the orientation axis.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _arf_indices(kernel_size: int, n_orient: int, n_rot: int) -> np.ndarray:
    """indices[r, o, i, j] = (o', i', j') source cell for rotation r.

    Rotating a filter by angle a maps spatial cell via inverse rotation and
    shifts the orientation channels cyclically by o_shift = r * n_orient/n_rot.
    Spatial rotation uses nearest-neighbour on the kxk grid (exact for 90°
    multiples, the standard ORN 4/8-orientation setting).
    """
    k = kernel_size
    out = np.zeros((n_rot, n_orient, k, k, 3), np.int32)
    c = (k - 1) / 2.0
    for r in range(n_rot):
        ang = 2 * np.pi * r / n_rot
        cos_a, sin_a = np.cos(ang), np.sin(ang)
        o_shift = r * n_orient // n_rot
        for o in range(n_orient):
            src_o = (o - o_shift) % n_orient
            for i in range(k):
                for j in range(k):
                    # inverse-rotate output cell (i,j) to find source cell
                    y, x = i - c, j - c
                    sx = cos_a * x + sin_a * y
                    sy = -sin_a * x + cos_a * y
                    si = int(round(sy + c))
                    sj = int(round(sx + c))
                    si = min(max(si, 0), k - 1)
                    sj = min(max(sj, 0), k - 1)
                    out[r, o, i, j] = (src_o, si, sj)
    return out


def active_rotating_filter(weight: jax.Array, n_rot: int = 8) -> jax.Array:
    """Materialize rotated copies of an orientation-aware filter bank.

    weight: (Cout, Cin, nOrientation, k, k) canonical filters.
    Returns (Cout * n_rot, Cin * nOrientation, k, k): rotation r of output
    channel c lives at row c * n_rot + r (the ORN layout).
    """
    cout, cin, n_orient, k, _ = weight.shape
    idx = jnp.asarray(_arf_indices(k, n_orient, n_rot))  # (R,O,k,k,3)
    o_idx, i_idx, j_idx = idx[..., 0], idx[..., 1], idx[..., 2]
    # gather: rotated[r, :, :, o, i, j] = weight[:, :, o', i', j']
    rotated = weight[:, :, o_idx, i_idx, j_idx]  # (Cout,Cin,R,O,k,k)
    rotated = rotated.transpose(0, 2, 1, 3, 4, 5)  # (Cout,R,Cin,O,k,k)
    return rotated.reshape(cout * n_rot, cin * n_orient, k, k)


def orconv2d(x: jax.Array, weight: jax.Array, bias=None, stride: int = 1,
             padding: int = 1, n_rot: int = 8) -> jax.Array:
    """Oriented-response conv on NHWC input whose channel axis is
    (Cin * nOrientation). weight: (Cout, Cin, nOrientation, k, k)."""
    w = active_rotating_filter(weight, n_rot)  # (Cout*R, Cin*O, k, k)
    w = w.transpose(2, 3, 1, 0)  # HWIO
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + jnp.repeat(bias, n_rot)
    return out


def rotation_invariant_encoding(x: jax.Array, n_orient: int) -> jax.Array:
    """Max-pool over the orientation sub-axis: (..., C*nOrient) -> (..., C).
    (RIE: the reference's RotationInvariantEncoding CUDA op.)"""
    shape = x.shape
    x = x.reshape(*shape[:-1], shape[-1] // n_orient, n_orient)
    return x.max(axis=-1)


def rotation_invariant_pooling(x: jax.Array, n_orient: int = 8) -> jax.Array:
    """RIP module: orientation max over NHWC channels."""
    return rotation_invariant_encoding(x, n_orient)
