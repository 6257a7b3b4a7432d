"""BIT change-detection head (Bitemporal Image Transformer) + SNUNet-style
alternative, TPU-native.

Capability parity with the reference's vendored BIT_CD stack
(change_detection/models/networks.py:444-576):
  Siamese shared backbone -> conv_pred to 32ch -> semantic tokenizer
  (softmax spatial attention, token_len tokens/image) -> shared token
  transformer encoder (depth 1) -> per-image transformer decoder (depth 8,
  pixels cross-attend tokens) -> |f1 - f2| -> upsample -> 2-layer conv
  classifier. The transformer internals here are standard pre-norm blocks
  (original implementation), not a port of the vendored einsum code.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lemevit_tpu.core.layers import trunc_normal_init
from lemevit_tpu.tasks.upernet import ConvModule, resize

Dtype = Any


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_tokens, kv_tokens=None):
        """Self-attention when kv_tokens is None, else cross-attention
        (q_tokens attend to kv_tokens)."""
        kv = q_tokens if kv_tokens is None else kv_tokens
        h = self.num_heads
        d = self.dim // h
        qn = nn.LayerNorm(dtype=self.dtype, name="norm_q")(q_tokens)
        kn = qn if kv_tokens is None else nn.LayerNorm(
            dtype=self.dtype, name="norm_kv")(kv)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q",
                     kernel_init=trunc_normal_init())(qn)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k",
                     kernel_init=trunc_normal_init())(kn)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v",
                     kernel_init=trunc_normal_init())(kn)

        def heads(t):
            b, n, c = t.shape
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", heads(q), heads(k),
                          preferred_element_type=jnp.float32) * (d ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), heads(v))
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj",
                       kernel_init=trunc_normal_init())(out)
        x = q_tokens + out
        y = nn.LayerNorm(dtype=self.dtype, name="norm_mlp")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1", kernel_init=trunc_normal_init())(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2",
                     kernel_init=trunc_normal_init())(y)
        return x + y


class BITHead(nn.Module):
    """Bitemporal image transformer on a pair of backbone feature maps."""

    dim: int = 32
    token_len: int = 4
    enc_depth: int = 1
    dec_depth: int = 8
    num_heads: int = 8
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv_pred = nn.Conv(self.dim, (3, 3), padding=1,
                                 dtype=self.dtype, name="conv_pred")
        self.tokenizer_conv = nn.Conv(self.token_len, (1, 1),
                                      dtype=self.dtype, name="tokenizer")
        self.encoder = [TransformerBlock(self.dim, self.num_heads,
                                         dtype=self.dtype, name=f"enc{i}")
                        for i in range(self.enc_depth)]
        self.decoder = [TransformerBlock(self.dim, self.num_heads,
                                         dtype=self.dtype, name=f"dec{i}")
                        for i in range(self.dec_depth)]
        self.pos_embed = self.param(
            "pos_embed", trunc_normal_init(), (1, 2 * self.token_len,
                                               self.dim))
        self.cls1 = nn.Conv(self.dim, (3, 3), padding=1, dtype=jnp.float32,
                            name="cls1")
        self.cls2 = nn.Conv(self.num_classes, (3, 3), padding=1,
                            dtype=jnp.float32, name="cls2")

    def _tokenize(self, f):
        """Semantic tokens via softmax spatial attention
        (ref networks.py:496-504)."""
        b, h, w, c = f.shape
        attn = self.tokenizer_conv(f).reshape(b, h * w, self.token_len)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
        tokens = jnp.einsum("bnl,bnc->blc", attn.astype(f.dtype),
                            f.reshape(b, h * w, c))
        return tokens

    def _refine(self, f, tokens):
        """Pixels cross-attend to tokens (transformer decoder)."""
        b, h, w, c = f.shape
        pix = f.reshape(b, h * w, c)
        for blk in self.decoder:
            pix = blk(pix, tokens)
        return pix.reshape(b, h, w, c)

    def __call__(self, f1, f2, out_size, *, train: bool = False):
        f1 = self.conv_pred(f1)
        f2 = self.conv_pred(f2)
        t1 = self._tokenize(f1)
        t2 = self._tokenize(f2)
        tokens = jnp.concatenate([t1, t2], axis=1) + self.pos_embed
        for blk in self.encoder:
            tokens = blk(tokens)
        t1, t2 = jnp.split(tokens, 2, axis=1)
        f1 = self._refine(f1, t1)
        f2 = self._refine(f2, t2)
        diff = jnp.abs(f1 - f2)
        diff = resize(diff.astype(jnp.float32), out_size)
        x = nn.relu(self.cls1(diff))
        return self.cls2(x)


class BITChangeDetector(nn.Module):
    """Siamese shared-weight backbone + BIT head. Returns per-pixel change
    logits (B, H, W, num_classes). feature_index selects the pyramid level
    (default stage-3 map as in the reference, networks.py:413-441)."""

    backbone: nn.Module
    feature_index: int = 2
    dim: int = 32
    token_len: int = 4
    enc_depth: int = 1
    dec_depth: int = 8
    num_classes: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img1, img2, *, train: bool = False):
        h, w = img1.shape[1:3]
        # Siamese: same module applied twice shares weights in linen
        backbone = self.backbone
        f1 = backbone(img1, train=train)[self.feature_index]
        f2 = backbone(img2, train=train)[self.feature_index]
        # upsample 2x before the head (ref: networks.py:426-435)
        f1 = resize(f1, (f1.shape[1] * 2, f1.shape[2] * 2))
        f2 = resize(f2, (f2.shape[1] * 2, f2.shape[2] * 2))
        head = BITHead(self.dim, self.token_len, self.enc_depth,
                       self.dec_depth, num_classes=self.num_classes,
                       dtype=self.dtype, name="bit_head")
        return head(f1, f2, (h, w), train=train)
