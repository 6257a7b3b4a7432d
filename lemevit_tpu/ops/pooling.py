"""Corner pooling and masked conv — XLA-idiomatic equivalents of the
reference's native ops.

corner_pool (object_detection/mmdet/ops/corner_pool, 369 LoC C++): directional
max-scan == reverse cumulative max == one lax.cummax call (fused, O(HW), grads
for free). masked_conv (290 LoC CUDA masked im2col): dense conv + mask
multiply — on TPU the dense conv is faster than any gather-based sparse path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def corner_pool(x: jax.Array, direction: str) -> jax.Array:
    """Directional max pooling on NHWC maps.

    'top': each pixel takes the max over itself..bottom of its column
    (i.e. reverse cummax along H); 'bottom': cummax along H; 'left': reverse
    cummax along W; 'right': cummax along W.
    """
    axis, reverse = {
        "top": (1, True),
        "bottom": (1, False),
        "left": (2, True),
        "right": (2, False),
    }[direction]
    return lax.cummax(x, axis=axis, reverse=reverse)


def top_pool(x):
    return corner_pool(x, "top")


def bottom_pool(x):
    return corner_pool(x, "bottom")


def left_pool(x):
    return corner_pool(x, "left")


def right_pool(x):
    return corner_pool(x, "right")


def masked_conv2d(x: jax.Array, mask: jax.Array, kernel: jax.Array,
                  bias=None, stride: int = 1, padding: int = 1) -> jax.Array:
    """Conv evaluated only at masked output positions (zeros elsewhere).

    x: NHWC, mask: (N,H',W') or (N,H',W',1) over *output* positions,
    kernel: HWIO.
    """
    out = lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    if mask.ndim == 3:
        mask = mask[..., None]
    return out * mask.astype(out.dtype)
