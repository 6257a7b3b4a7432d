"""LeMeViT backbone, TPU-native (flax/NHWC), single source of truth.

One implementation replaces the reference's four per-vertical forks
(/root/reference/models/lemevit.py + clones under semantic_segmentation/,
object_detection/, change_detection/): set ``features_only=True`` to get the
stride-4/8/16/32 feature pyramid instead of classification logits.

Architecture parity notes (reference file:line cited; code is original JAX):
  - 5-stage hierarchy; stem = two 3x3 s2 conv+BN (+GELU) -> H/4 (:698-704).
  - Stage-i downsample = 3x3 s2 conv+BN, but Identity when the *previous*
    stage is "C" (stages 0 and 1 share H/4 resolution) (:710-720).
  - Learnable meta tokens (queries_len x embed_dim[0], std-normal init :726);
    per-stage meta-token MLP downsample (:728-745).
  - LeMeBlock: depthwise-conv position embedding (CPE :509-512), shared
    LayerNorms and a single MLP applied to BOTH the image-token and
    meta-token branches (:554-577), optional layer-scale, DropPath; three
    forward forms dispatched on attn_type (:542-660).
  - Head: BatchNorm(x) + LayerNorm(c), spatial-mean(x) + token-mean(c),
    summed, then Linear (:773-836).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lemevit_tpu.attn.modules import (
    CrossAttention,
    DualCrossAttention,
    DualCrossAttentionV2,
    StandardAttention,
)
from lemevit_tpu.core.layers import (
    ConvBN,
    ConvStem,
    DropPath,
    DWConv,
    MetaTokenDownsample,
    Mlp,
    trunc_normal_init,
)

Dtype = Any

# Fused-kernel CPE placement, measured per stage shape (attn_type, N, dim)
# on v5e @ bs256/224^2 (r5 sweep, scripts + /tmp logs -> ROADMAP.md):
# in-kernel CPE (masked VPU shifts inside the fused block) saves an HBM
# round-trip of x but costs VPU passes every step. The round-trip is worth
# it at base's dims; at tiny's C=64/128 D stages the VPU cost dominates
# (external: tiny 9126 -> 10142 img/s) and at small's S stages likewise
# (6289 -> 6510). Shapes listed here run the CPE as an external XLA dwconv;
# everything else keeps in-kernel CPE. PB_D_CPE / PB_S_CPE = 0/1 force
# external/in-kernel globally for A/B (unset -> this table).
_CPE_EXTERNAL_SHAPES = frozenset({
    # tiny / tiny_v2 / small_v2 D-type stages (dims 64/128)
    ("D", 3136, 64), ("D", 784, 128),
    ("D2", 3136, 64), ("D2", 784, 128),
    # small S-type stages
    ("S", 196, 320), ("S", 49, 384),
})


def _cpe_in_kernel(attn_type: str, n: int, dim: int, env: str) -> bool:
    import os
    v = os.environ.get(env)
    if v == "0":
        return False
    if v == "1":
        return True
    return (attn_type, n, dim) not in _CPE_EXTERNAL_SHAPES


class LeMeBlock(nn.Module):
    """One LeMeViT transformer block.

    The MLP, the two LayerNorms, and (when used) the layer-scale gammas are
    *shared* between the image-token branch (x) and the meta-token branch (c)
    — a deliberate architecture choice in the reference (:554-577), not a bug.
    """

    dim: int
    num_heads: int
    attn_type: str  # "C" | "D" | "D2" | "S"
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    layer_scale_init_value: float = -1.0
    cpe_ks: int = 3
    pre_norm: bool = True
    mlp_dwconv: bool = False
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"

    def setup(self):
        if self.cpe_ks > 0:
            self.pos_embed = DWConv(self.dim, kernel_size=self.cpe_ks,
                                    dtype=self.dtype, name="pos_embed")
        self.norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        kw = dict(dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                  backend=self.attn_backend)
        if self.attn_type == "D":
            self.attn = DualCrossAttention(**kw, name="attn")
        elif self.attn_type == "D2":
            self.attn = DualCrossAttentionV2(**kw, name="attn")
        elif self.attn_type == "C":
            self.attn = CrossAttention(**kw, name="attn")
        elif self.attn_type in ("S", None):
            self.attn = StandardAttention(**kw, name="attn")
        else:
            raise ValueError(f"unknown attn_type {self.attn_type!r}")
        self.mlp = Mlp(self.dim, int(self.mlp_ratio * self.dim),
                       use_dwconv=self.mlp_dwconv, dtype=self.dtype, name="mlp")
        self.drop_path_mod = DropPath(self.drop_path, name="drop_path")
        self.use_layer_scale = self.layer_scale_init_value > 0
        if self.use_layer_scale:
            init = nn.initializers.constant(self.layer_scale_init_value)
            self.gamma1 = self.param("gamma1", init, (1, 1, self.dim))
            self.gamma2 = self.param("gamma2", init, (1, 1, self.dim))

    def _cpe(self, x):
        if self.cpe_ks > 0:
            return x + self.pos_embed(x)
        return x

    def _dp(self, t, deterministic):
        return self.drop_path_mod(t, deterministic=deterministic)

    def _g1(self, t):
        return self.gamma1 * t if self.use_layer_scale else t

    def _g2(self, t):
        return self.gamma2 * t if self.use_layer_scale else t

    def _residual_update(self, t, attn_out, hw, deterministic):
        """attn residual + mlp residual on one token stream (pre/post-norm)."""
        if self.pre_norm:
            t = t + self._dp(self._g1(attn_out), deterministic)
            t = t + self._dp(self._g2(self.mlp(self.norm2(t), hw)),
                             deterministic)
        else:
            t = self.norm1(t + self._dp(self._g1(attn_out), deterministic))
            t = self.norm2(t + self._dp(self._g2(self.mlp(t, hw)),
                                        deterministic))
        return t

    def __call__(self, x, c, deterministic: bool = True):
        b, h, w, ch = x.shape
        hw = (h, w)
        if not deterministic:
            fused = self._try_fused_train(x.reshape(b, h * w, ch), c, w)
            if fused is not None:
                return fused[0].reshape(b, h, w, ch), fused[1]
        if self.attn_type in ("D", "D2"):
            # CPE placement per measured shape table (_CPE_EXTERNAL_SHAPES;
            # PB_D_CPE=0/1 forces external/in-kernel globally)
            fused = self._try_fused_dca(x.reshape(b, h * w, ch), c,
                                        deterministic, w, with_cpe=True)
            if fused is None:
                x = self._cpe(x)
                fused = self._try_fused_dca(x.reshape(b, h * w, ch), c,
                                            deterministic, w,
                                            with_cpe=False)
            if fused is not None:
                x, c = fused[0].reshape(b, h, w, ch), fused[1]
            else:
                x = x.reshape(b, h * w, ch)
                if self.pre_norm:
                    ax, ac = self.attn(self.norm1(x), self.norm1(c))
                else:
                    ax, ac = self.attn(x, c)
                x = self._residual_update(x, ax, hw, deterministic)
                c = self._residual_update(c, ac, None, deterministic)
                x = x.reshape(b, h, w, ch)
        elif self.attn_type == "C":
            # x passes through unchanged (ref :584-613: x restored after CPE);
            # CPE-shifted tokens feed the attention's k/v only. CPE fuses
            # in-kernel when possible (PB_C_CPE=0 forces external dwconv).
            c_fused = self._try_fused_c(x.reshape(b, h * w, ch), c,
                                        deterministic, w, with_cpe=True)
            if c_fused is not None:
                c = c_fused
                return x, c
            xt = self._cpe(x).reshape(b, h * w, ch)
            c_fused = self._try_fused_c(xt, c, deterministic, w,
                                        with_cpe=False)
            if c_fused is not None:
                c = c_fused
            else:
                if self.pre_norm:
                    ac = self.attn(self.norm1(xt), self.norm1(c))
                else:
                    ac = self.attn(xt, c)
                c = self._residual_update(c, ac, None, deterministic)
        else:  # "S": self-attention applied separately to x AND c,
            # with the same (shared) attention + MLP weights (ref :615-650).
            # CPE placement per measured shape table (_CPE_EXTERNAL_SHAPES;
            # PB_S_CPE=0/1 forces external/in-kernel globally).
            fused = self._try_fused_s(x.reshape(b, h * w, ch), c,
                                      deterministic, w, with_cpe=True)
            if fused is None:
                x = self._cpe(x)
                fused = self._try_fused_s(x.reshape(b, h * w, ch), c,
                                          deterministic, w, with_cpe=False)
            if fused is not None:
                x, c = fused[0].reshape(b, h, w, ch), fused[1]
            else:
                x = x.reshape(b, h * w, ch)
                ax = self.attn(self.norm1(x)) if self.pre_norm \
                    else self.attn(x)
                x = self._residual_update(x, ax, hw, deterministic)
                ac = self.attn(self.norm1(c)) if self.pre_norm \
                    else self.attn(c)
                c = self._residual_update(c, ac, None, deterministic)
                x = x.reshape(b, h, w, ch)
        return x, c

    def _dp_scales(self, b):
        """Per-sample DropPath branch scales (keep_mask / keep_prob), four
        independent draws (attn-x, mlp-x, attn-c, mlp-c) matching the
        unfused path's four DropPath applications."""
        if self.drop_path == 0.0:
            ones = jnp.ones((b,), jnp.float32)
            return (ones, ones, ones, ones)
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        masks = jax.random.bernoulli(rng, keep, (4, b))
        return tuple(masks[i].astype(jnp.float32) / keep for i in range(4))

    def _try_fused_train(self, x, c, img_w):
        """Fused TRAINING step (fwd + custom-VJP backward kernels) for S
        and D blocks. Exact per-sample DropPath; LN affines folded into
        the matmul weights OUTSIDE the kernel so their grads chain through
        XLA autodiff. Returns None to fall back to the XLA composition
        (C blocks, unsupported shapes, or stage-1-scale D backward that
        exceeds the VMEM budget)."""
        if self.attn_type not in ("S", "D", "D2", "C") \
                or not self._fusable(True, x.shape[1]):
            return None
        import os
        from lemevit_tpu.attn import pallas_block, pallas_train
        from lemevit_tpu.attn import reference as aref
        try:
            v = self.variables["params"]
            dt = self.dtype
            # CPE placement for TRAINING: external XLA dwconv by default —
            # the in-kernel CPE costs the fused BACKWARD ~6x what XLA's
            # autodiff pays (train_kbench on v5e, base stage1: grad 30.3
            # ms/block external vs 36.5 in-kernel vs 40.7 unfused).
            # PB_TRAIN_CPE=fused restores the in-kernel placement. Also
            # lets non-3x3 CPE sizes use the fused train path.
            ext_cpe = (os.environ.get("PB_TRAIN_CPE", "ext") != "fused"
                       and self.cpe_ks > 0)
            if ext_cpe:
                cpe = None
                b_, n_, ch_ = x.shape
                xt = self._cpe(
                    x.reshape(b_, n_ // img_w, img_w, ch_)
                ).reshape(b_, n_, ch_)
            else:
                cpe = self._cpe_weights(v)
                xt = x
            dp = self._dp_scales(x.shape[0])
            if self.attn_type == "C":
                # x passes through unchanged (k/v-side grads still flow)
                wq_f, bq_f = pallas_block._fold_ln(
                    v["norm1"]["scale"], v["norm1"]["bias"],
                    v["attn"]["q"]["kernel"].astype(dt),
                    v["attn"]["q"]["bias"].astype(dt))
                wkv_f, bkv_f = pallas_block._fold_ln(
                    v["norm1"]["scale"], v["norm1"]["bias"],
                    v["attn"]["kv"]["kernel"].astype(dt),
                    v["attn"]["kv"]["bias"].astype(dt))
                w1_f, b1_f = pallas_block._fold_ln(
                    v["norm2"]["scale"], v["norm2"]["bias"],
                    v["mlp"]["fc1"]["kernel"].astype(dt),
                    v["mlp"]["fc1"]["bias"].astype(dt))
                params = (wq_f, bq_f, wkv_f, bkv_f,
                          v["attn"]["proj"]["kernel"].astype(dt),
                          v["attn"]["proj"]["bias"].astype(dt),
                          w1_f, b1_f,
                          v["mlp"]["fc2"]["kernel"].astype(dt),
                          v["mlp"]["fc2"]["bias"].astype(dt))
                c_new = pallas_train.c_block_train(
                    xt, c, params, dp, num_heads=self.num_heads,
                    cpe=cpe, img_w=img_w)
                if c_new is None:
                    return None
                return x, c_new
            if self.attn_type == "S":
                wqkv_f, bqkv_f = pallas_block._fold_ln(
                    v["norm1"]["scale"], v["norm1"]["bias"],
                    v["attn"]["qkv"]["kernel"].astype(dt),
                    v["attn"]["qkv"]["bias"].astype(dt))
                w1_f, b1_f = pallas_block._fold_ln(
                    v["norm2"]["scale"], v["norm2"]["bias"],
                    v["mlp"]["fc1"]["kernel"].astype(dt),
                    v["mlp"]["fc1"]["bias"].astype(dt))
                params = (wqkv_f, bqkv_f,
                          v["attn"]["proj"]["kernel"].astype(dt),
                          v["attn"]["proj"]["bias"].astype(dt),
                          w1_f, b1_f,
                          v["mlp"]["fc2"]["kernel"].astype(dt),
                          v["mlp"]["fc2"]["bias"].astype(dt))
                return pallas_train.s_block_train(
                    xt, c, params, dp, num_heads=self.num_heads,
                    cpe=cpe, img_w=img_w)
            scale_x, scale_c = aref.dca_scales(x.shape[1], c.shape[1],
                                               x.shape[2])
            if self.attn_type == "D2":
                wqkv1, bqkv1, wqkv2, bqkv2 = self._d2_as_dca_weights(v, dt)
            else:
                wqkv1 = v["attn"]["qkv1"]["kernel"].astype(dt)
                bqkv1 = v["attn"]["qkv1"]["bias"].astype(dt)
                wqkv2 = v["attn"]["qkv2"]["kernel"].astype(dt)
                bqkv2 = v["attn"]["qkv2"]["bias"].astype(dt)
            wq1_f, bq1_f = pallas_block._fold_ln(
                v["norm1"]["scale"], v["norm1"]["bias"], wqkv1, bqkv1)
            wq2_f, bq2_f = pallas_block._fold_ln(
                v["norm1"]["scale"], v["norm1"]["bias"], wqkv2, bqkv2)
            w1_f, b1_f = pallas_block._fold_ln(
                v["norm2"]["scale"], v["norm2"]["bias"],
                v["mlp"]["fc1"]["kernel"].astype(dt),
                v["mlp"]["fc1"]["bias"].astype(dt))
            params = (wq1_f, bq1_f, wq2_f, bq2_f,
                      v["attn"]["proj_x"]["kernel"].astype(dt),
                      v["attn"]["proj_x"]["bias"].astype(dt),
                      v["attn"]["proj_c"]["kernel"].astype(dt),
                      v["attn"]["proj_c"]["bias"].astype(dt),
                      w1_f, b1_f,
                      v["mlp"]["fc2"]["kernel"].astype(dt),
                      v["mlp"]["fc2"]["bias"].astype(dt))
            return pallas_train.dca_block_train(
                xt, c, params, dp, num_heads=self.num_heads,
                scale_x=scale_x, scale_c=scale_c, cpe=cpe, img_w=img_w)
        except (KeyError, TypeError, LookupError):
            return None

    def _d2_as_dca_weights(self, v, dt):
        """D2 -> DCA weight permutation: the v2 attention (ref
        models/lemevit.py:326-423: q,v1 from x; k,v2 from c; shared q/k
        both directions) maps onto the general DCA kernel with
        q1=q, k1=q, v1=v1 and q2=k, k2=k, v2=v2 — so build effective
        qkv kernels [Wq|Wq|Wv1] / [Wk|Wk|Wv2] OUTSIDE the kernel.
        Autodiff chains the duplication (dWq = dQ-cols + dK-cols), which
        is what lets the same custom-VJP train kernel serve D2."""
        ch = v["attn"]["qv1"]["kernel"].shape[0]
        wqv1 = v["attn"]["qv1"]["kernel"].astype(dt)
        bqv1 = v["attn"]["qv1"]["bias"].astype(dt)
        wkv2 = v["attn"]["kv2"]["kernel"].astype(dt)
        bkv2 = v["attn"]["kv2"]["bias"].astype(dt)
        wq, wv1 = wqv1[:, :ch], wqv1[:, ch:]
        bq, bv1 = bqv1[:ch], bqv1[ch:]
        wk, wv2 = wkv2[:, :ch], wkv2[:, ch:]
        bk, bv2 = bkv2[:ch], bkv2[ch:]
        return (jnp.concatenate([wq, wq, wv1], axis=1),
                jnp.concatenate([bq, bq, bv1]),
                jnp.concatenate([wk, wk, wv2], axis=1),
                jnp.concatenate([bk, bk, bv2]))

    def _cpe_weights(self, v):
        """(9,C) taps + (C,) bias for the fused kernels, or None when
        cpe_ks == 0. Raises LookupError for kernel sizes the fused path
        doesn't support (caller falls back)."""
        if self.cpe_ks == 0:
            return None
        if self.cpe_ks != 3:
            raise LookupError("fused CPE supports 3x3 only")
        k = v["pos_embed"]["dwconv"]["kernel"]  # (3,3,1,C)
        taps = k.reshape(9, k.shape[-1]).astype(self.dtype)
        bias = v["pos_embed"]["dwconv"]["bias"].astype(self.dtype)
        return (taps, bias)

    def _fusable(self, deterministic, n=None):
        import os
        from lemevit_tpu.attn.modules import _use_pallas
        # Token-count cap: the fused whole-block kernels have compiled and
        # been benchmarked up to n=3136 (224^2 stage 1). At seg/det scales
        # (512^2 -> n=16384) the Mosaic lowering HANGS the compiler (r5:
        # UperNet-base 512^2 compiled in 70 s with the XLA backbone vs
        # >51 min, killed, with the fused path) — beyond the proven scale,
        # fall back to the XLA composition (which routes big-N S blocks to
        # the chunked SDPA). PB_MAX_FUSED_N overrides.
        max_n = int(os.environ.get("PB_MAX_FUSED_N", "3136"))
        if n is not None and n > max_n:
            return False
        return (deterministic and self.pre_norm and not self.use_layer_scale
                and not self.mlp_dwconv and not self.is_initializing()
                and _use_pallas(self.attn_backend))

    def _try_fused_dca(self, x, c, deterministic, img_w, with_cpe=False):
        """Whole-block fused D-type kernel (inference). With ``with_cpe``
        x must be PRE-CPE and the 3x3 position embedding runs in-kernel
        (PB_D_CPE=0 forces the external-dwconv path)."""
        if self.attn_type not in ("D", "D2") \
                or not self._fusable(deterministic, x.shape[1]):
            return None
        import os
        from lemevit_tpu.attn import pallas_block
        from lemevit_tpu.attn import reference as aref
        try:
            v = self.variables["params"]
            dt = self.dtype
            if with_cpe:
                if not _cpe_in_kernel(self.attn_type, x.shape[1],
                                      x.shape[2], "PB_D_CPE"):
                    return None
                cpe = self._cpe_weights(v)  # LookupError -> fallback
            else:
                cpe = None
            scale_x, scale_c = aref.dca_scales(x.shape[1], c.shape[1],
                                               x.shape[2])
            if self.attn_type == "D2":
                wqkv1, bqkv1, wqkv2, bqkv2 = self._d2_as_dca_weights(v, dt)
            else:
                wqkv1 = v["attn"]["qkv1"]["kernel"].astype(dt)
                bqkv1 = v["attn"]["qkv1"]["bias"].astype(dt)
                wqkv2 = v["attn"]["qkv2"]["kernel"].astype(dt)
                bqkv2 = v["attn"]["qkv2"]["bias"].astype(dt)
            params = (
                v["norm1"]["scale"], v["norm1"]["bias"],
                wqkv1, bqkv1, wqkv2, bqkv2,
                v["attn"]["proj_x"]["kernel"].astype(dt),
                v["attn"]["proj_x"]["bias"].astype(dt),
                v["attn"]["proj_c"]["kernel"].astype(dt),
                v["attn"]["proj_c"]["bias"].astype(dt),
                v["norm2"]["scale"], v["norm2"]["bias"],
                v["mlp"]["fc1"]["kernel"].astype(dt),
                v["mlp"]["fc1"]["bias"].astype(dt),
                v["mlp"]["fc2"]["kernel"].astype(dt),
                v["mlp"]["fc2"]["bias"].astype(dt),
            )
            return pallas_block.dca_block(
                x, c, params, num_heads=self.num_heads,
                scale_x=scale_x, scale_c=scale_c, cpe=cpe, img_w=img_w)
        except (KeyError, TypeError, LookupError):
            return None

    def _try_fused_c(self, xt, c, deterministic, img_w, with_cpe=False):
        """Fused C-type kernel: x streams HBM once and is never written.
        With ``with_cpe`` xt must be PRE-CPE and the 3x3 position
        embedding runs in-kernel on the k/v side only (PB_C_CPE=0 forces
        the external-dwconv path)."""
        if self.attn_type != "C" \
                or not self._fusable(deterministic, xt.shape[1]):
            return None
        import os
        from lemevit_tpu.attn import pallas_block
        try:
            v = self.variables["params"]
            dt = self.dtype
            if with_cpe:
                # default OFF: for the C block the external dwconv wins
                # (2946 vs 2918 img/s on base/v5e) — the kernel only reads
                # x for k/v, so in-kernel CPE adds VPU passes to every
                # step without saving a round-trip of the x OUTPUT
                if os.environ.get("PB_C_CPE", "0") == "0":
                    return None
                cpe = self._cpe_weights(v)  # LookupError -> fallback
            else:
                cpe = None
            params = (
                v["norm1"]["scale"], v["norm1"]["bias"],
                v["attn"]["q"]["kernel"].astype(dt),
                v["attn"]["q"]["bias"].astype(dt),
                v["attn"]["kv"]["kernel"].astype(dt),
                v["attn"]["kv"]["bias"].astype(dt),
                v["attn"]["proj"]["kernel"].astype(dt),
                v["attn"]["proj"]["bias"].astype(dt),
                v["norm2"]["scale"], v["norm2"]["bias"],
                v["mlp"]["fc1"]["kernel"].astype(dt),
                v["mlp"]["fc1"]["bias"].astype(dt),
                v["mlp"]["fc2"]["kernel"].astype(dt),
                v["mlp"]["fc2"]["bias"].astype(dt),
            )
            return pallas_block.c_block(xt, c, params,
                                        num_heads=self.num_heads,
                                        cpe=cpe, img_w=img_w)
        except (KeyError, TypeError, LookupError):
            return None

    def _try_fused_s(self, x, c, deterministic, img_w, with_cpe=False):
        """Whole-block fused Pallas kernel (inference): reads x from HBM
        once instead of ~16 times. With ``with_cpe`` x must be PRE-CPE and
        the 3x3 position embedding runs in-kernel (masked shifts), saving
        the per-block XLA dwconv launch + an HBM round-trip of x
        (PB_S_CPE=0 forces the external-dwconv path). Only on the pre-norm,
        no-layer-scale, deterministic path; numerics match the composition
        (tested)."""
        if not self._fusable(deterministic, x.shape[1]):
            return None
        try:
            import os
            from lemevit_tpu.attn import pallas_block
            v = self.variables["params"]
            dt = self.dtype
            if with_cpe:
                if not _cpe_in_kernel("S", x.shape[1], x.shape[2],
                                      "PB_S_CPE"):
                    return None
                cpe = self._cpe_weights(v)  # LookupError -> fallback
            else:
                cpe = None
            params = (
                v["norm1"]["scale"], v["norm1"]["bias"],
                v["attn"]["qkv"]["kernel"].astype(dt),
                v["attn"]["qkv"]["bias"].astype(dt),
                v["attn"]["proj"]["kernel"].astype(dt),
                v["attn"]["proj"]["bias"].astype(dt),
                v["norm2"]["scale"], v["norm2"]["bias"],
                v["mlp"]["fc1"]["kernel"].astype(dt),
                v["mlp"]["fc1"]["bias"].astype(dt),
                v["mlp"]["fc2"]["kernel"].astype(dt),
                v["mlp"]["fc2"]["bias"].astype(dt),
            )
            return pallas_block.s_block(x, c, params,
                                        num_heads=self.num_heads,
                                        cpe=cpe, img_w=img_w)
        except (KeyError, TypeError, LookupError):
            return None


class LeMeViT(nn.Module):
    """Hierarchical vision transformer with learnable meta tokens.

    Inputs are NHWC images. With ``features_only=False`` returns logits
    (B, num_classes); with ``features_only=True`` returns the NHWC feature
    pyramid [stage1..stage4] at strides 4/8/16/32 (what the seg/det/CD heads
    consume — replaces the reference's three backbone forks).
    """

    depth: Sequence[int] = (2, 3, 4, 8, 3)
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: Sequence[int] = (64, 64, 128, 320, 512)
    head_dim: int = 64
    mlp_ratios: Sequence[float] = (4, 4, 4, 4, 4)
    drop_path_rate: float = 0.0
    attn_type: Sequence[str] = ("C", "D", "D", "S", "S")
    queries_len: int = 128
    cpe_ks: int = 3
    pre_norm: bool = True
    mlp_dwconv: bool = False
    layer_scale_init_value: float = -1.0
    features_only: bool = False
    out_indices: Sequence[int] = (1, 2, 3, 4)
    remat_stages: Sequence[int] = ()
    dtype: Dtype = jnp.float32
    attn_backend: str = "auto"
    bn_axis_name: Optional[str] = None  # e.g. "data" for SyncBN
    freeze_bn: bool = False  # BN uses running stats even in train mode
    # (detection fine-tuning, ref object_detection fork :833-842);
    # param freezing (frozen_stages) is an optimizer-mask concern — see
    # train/optim.py::build_optimizer(frozen_prefixes=...)

    @property
    def num_stages(self) -> int:
        return len(self.attn_type)

    def setup(self):
        dims = list(self.embed_dim)
        # --- downsample layers (patch embeddings) ---
        layers = [ConvStem(dims[0], dtype=self.dtype,
                           axis_name=self.bn_axis_name, name="stem")]
        for i in range(self.num_stages - 1):
            if self.attn_type[i] == "C":
                layers.append(None)  # identity: "C" stage keeps resolution
            else:
                layers.append(ConvBN(dims[i + 1], dtype=self.dtype,
                                     axis_name=self.bn_axis_name,
                                     name=f"downsample{i + 1}"))
        self.downsample_layers = layers

        # --- meta tokens + per-stage channel projection ---
        self.meta_tokens = self.param(
            "meta_tokens", nn.initializers.normal(stddev=1.0),
            (self.queries_len, dims[0]))
        mtd = [MetaTokenDownsample(dims[0], dims[0], dtype=self.dtype,
                                   name="meta_downsample0")]
        for i in range(self.num_stages - 1):
            mtd.append(MetaTokenDownsample(dims[i], dims[i + 1],
                                           dtype=self.dtype,
                                           name=f"meta_downsample{i + 1}"))
        self.meta_token_downsample = mtd

        # --- stages of blocks with linspace drop-path ---
        nheads = [d // self.head_dim for d in dims]
        total = sum(self.depth)
        dp_rates = np.linspace(0.0, self.drop_path_rate, total).tolist()
        stages = []
        cur = 0
        for i in range(self.num_stages):
            block_cls = LeMeBlock
            if i in self.remat_stages:
                # argnum 3 == `deterministic` (0 is self); must stay static
                block_cls = nn.remat(LeMeBlock, static_argnums=(3,),
                                     prevent_cse=False)
            blocks = [
                block_cls(
                    dim=dims[i],
                    num_heads=nheads[i],
                    attn_type=self.attn_type[i],
                    mlp_ratio=self.mlp_ratios[i],
                    drop_path=dp_rates[cur + j],
                    layer_scale_init_value=self.layer_scale_init_value,
                    cpe_ks=self.cpe_ks,
                    pre_norm=self.pre_norm,
                    mlp_dwconv=self.mlp_dwconv,
                    dtype=self.dtype,
                    attn_backend=self.attn_backend,
                    name=f"stage{i}_block{j}",
                )
                for j in range(self.depth[i])
            ]
            stages.append(blocks)
            cur += self.depth[i]
        self.stages = stages

        if not self.features_only:
            self.norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, name="norm")
            self.norm_c = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name="norm_c")
            if self.num_classes > 0:
                self.head = nn.Dense(self.num_classes,
                                     kernel_init=trunc_normal_init(),
                                     bias_init=nn.initializers.zeros_init(),
                                     dtype=jnp.float32, name="head")

    def _try_s_stage(self, i, x, c, train):
        """Whole-STAGE fused S path (inference): one pallas_call runs the
        stage's every block — per-block weights stream through VMEM
        double-buffered while the activations stay resident across block
        steps (x crossed HBM once per BLOCK before; stage 3 of base is 18
        blocks re-reading a 38 MB tensor). OPT-IN via PB_S_STAGE=1:
        measured SLOWER than the per-block chain on the current
        toolchain (v5e: 2.9-8x per step; Mosaic appears not to overlap
        the streamed-weight fetches across the scratch-carried chain) —
        kept as the A/B lever for toolchain upgrades. Returns (x, c) or
        None."""
        import os
        blocks = self.stages[i]
        if (train or self.attn_type[i] != "S" or len(blocks) < 2
                or os.environ.get("PB_S_STAGE", "0") != "1"
                or self.is_mutable_collection("intermediates")):
            return None
        from lemevit_tpu.attn import pallas_block
        try:
            b, h, w, ch = x.shape
            if not blocks[0]._fusable(True, h * w):
                return None
            dt = self.dtype
            params_list, cpes = [], []
            for j in range(len(blocks)):
                v = self.variables["params"][f"stage{i}_block{j}"]
                params_list.append(
                    (v["norm1"]["scale"], v["norm1"]["bias"],
                     v["attn"]["qkv"]["kernel"].astype(dt),
                     v["attn"]["qkv"]["bias"].astype(dt),
                     v["attn"]["proj"]["kernel"].astype(dt),
                     v["attn"]["proj"]["bias"].astype(dt),
                     v["norm2"]["scale"], v["norm2"]["bias"],
                     v["mlp"]["fc1"]["kernel"].astype(dt),
                     v["mlp"]["fc1"]["bias"].astype(dt),
                     v["mlp"]["fc2"]["kernel"].astype(dt),
                     v["mlp"]["fc2"]["bias"].astype(dt)))
                cpes.append(blocks[j]._cpe_weights(v))
            if any(cp is None for cp in cpes):
                if not all(cp is None for cp in cpes):
                    return None
                cpes = None
            out = pallas_block.s_stage(
                x.reshape(b, h * w, ch), c, params_list,
                num_heads=ch // self.head_dim, cpes=cpes, img_w=w)
            if out is None:
                return None
            return out[0].reshape(b, h, w, ch), out[1]
        except (KeyError, TypeError, LookupError, AttributeError):
            return None

    def __call__(self, x, *, train: bool = False):
        b = x.shape[0]
        x = x.astype(self.dtype)
        c = jnp.broadcast_to(self.meta_tokens.astype(self.dtype)[None],
                             (b,) + self.meta_tokens.shape)
        feats = []
        bn_train = train and not self.freeze_bn
        for i in range(self.num_stages):
            ds = self.downsample_layers[i]
            if ds is not None:
                x = ds(x, train=bn_train)
            c = self.meta_token_downsample[i](c)
            staged = self._try_s_stage(i, x, c, train)
            if staged is not None:
                x, c = staged
            else:
                for block in self.stages[i]:
                    # no-op unless 'intermediates' is mutable
                    # (visualization)
                    self.sow("intermediates", "block_inputs", (x, c))
                    x, c = block(x, c, not train)
            if self.features_only and i in self.out_indices:
                feats.append(x)
        if self.features_only:
            return feats

        # classification head: BN over channels of the NHWC map, LN over c
        x = self.norm(x, use_running_average=not train)
        c = self.norm_c(c)
        x = x.mean(axis=(1, 2))  # spatial mean  (ref :825)
        c = c.mean(axis=1)       # token mean    (ref :826)
        x = (x + c).astype(jnp.float32)
        if self.num_classes > 0:
            x = self.head(x)
        return x
