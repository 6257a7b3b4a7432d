"""Fused Pallas TPU kernel for Dual Cross-Attention (placeholder dispatch).

The fused kernel computes both DCA directions while reading the large
N-length tensors from HBM once:
  x_out = softmax(q1 @ k2^T * scale_x) @ v2      (row-softmax over M=16 cols)
  c_out = softmax(q2 @ k1^T * scale_c) @ v1      (online softmax over N cols)

Inputs/outputs use the (B, N, H, d) layout. Returns None when the shapes
don't qualify, signalling the caller to fall back to the XLA reference path
(lemevit_tpu.attn.reference.sdpa_bnhd).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax

_ENABLED = True


def dca(q1, k1, v1, q2, k2, v2, *, scale_x: float, scale_c: float
        ) -> Optional[Tuple[jax.Array, jax.Array]]:
    # Kernel lands in a later milestone; fall back to XLA for now.
    return None
