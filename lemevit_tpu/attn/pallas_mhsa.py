"""Pallas flash-style MHSA kernel (placeholder dispatch).

Returns None when shapes don't qualify; callers fall back to the XLA
reference sdpa. LeMeViT's dense MHSA runs at N<=196 where XLA's fused
attention is already near roofline, so this kernel only engages for larger
sequence lengths (segmentation / detection resolutions).
"""
from __future__ import annotations

from typing import Optional

import jax


def sdpa(q, k, v, *, scale=None) -> Optional[jax.Array]:
    return None
