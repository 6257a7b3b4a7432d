"""Device-side train augmentation: the whole aug stack inside the jit step.

TPU-first answer to the reference's DataLoader-worker augmentation
(/root/reference/main.py:395-448 + timm create_loader): with the packed
uint8 cache (data/packed.py) the host only streams raw fixed-size samples
by memmap; RandomResizedCrop, horizontal flip, and RandAugment
(rand-m9-mstd0.5-inc1, the recipe of record in configs/lemevit.yaml) all
run ON THE CHIP, vectorized over the batch, fused by XLA into the train
step. A 1-core host that decodes ~150 JPEG img/s can then feed a chip
consuming thousands img/s, because its data-plane work drops to a memcpy.

Semantics follow this repo's PIL implementations (data/transforms.py
RA_OPS — themselves the timm policy), with documented deviations:
  - geometric warps (rotate/shear/translate) sample bilinear, not bicubic,
    and the resize kernels are jax.image cubic, not PIL's; augmentation is
    a distribution, not a numerics contract, so op-level tests compare
    against PIL with loose tolerances.
  - RandomResizedCrop samples the same (scale, ratio, 10-try) distribution
    but from the PACKED image (short-side-resized, center-cropped square),
    so crops near the long-image edges are unreachable and small crops are
    upsampled from pack_px resolution — the standard FFCV-style tradeoff.

Every op is fixed-shape and branchless (per-image op choice is realized by
computing each elementwise candidate on the warped image and selecting),
which is exactly what XLA wants: one fused elementwise pipeline + one
gather-based warp + one sort-based equalize per RandAugment layer.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# ------------------------------------------------------------------ warp


def _affine_warp(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """PIL-convention affine: output (x,y) samples input at
    (a x + b y + c, d x + e y + f); bilinear, fill 0 outside (PIL default
    fill for transform/rotate as used by transforms.py RA ops)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    a, b, c, d, e, f = [mat[i] for i in range(6)]
    # PIL applies the matrix in the pixel-center frame (+0.5 in, -0.5 out)
    xin = a * (xs + 0.5) + b * (ys + 0.5) + c - 0.5
    yin = d * (xs + 0.5) + e * (ys + 0.5) + f - 0.5
    x0 = jnp.floor(xin)
    y0 = jnp.floor(yin)
    wx = (xin - x0)[..., None]
    wy = (yin - y0)[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return img[yc, xc] * valid[..., None]

    out = ((1 - wx) * (1 - wy) * tap(y0, x0)
           + wx * (1 - wy) * tap(y0, x0 + 1)
           + (1 - wx) * wy * tap(y0 + 1, x0)
           + wx * wy * tap(y0 + 1, x0 + 1))
    return out


# ------------------------------------------------- elementwise RA ops
# Magnitude mappings mirror data/transforms.py (mag in [0, 10], level 9
# nominal). All take/return float32 images in [0, 255].


def _gray(img):
    # PIL L-mode weights
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _autocontrast(img, _mag, _u):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(img, _mag, _u):
    """PIL ImageOps.equalize: per channel, lut[i] = (step//2 +
    cumsum_{j<i} h[j]) // step with step = (N - count(last nonzero
    bin)) // 255; identity when step == 0.

    Histogram from a stride-4 pixel sample (4x4-subsampled, so the sort
    is 16x smaller): full-resolution sort measured ~485 ms/256-batch on
    v5e (augbench r4) and dominated the whole aug pipeline; a
    histogram is already a sample statistic, so the LUT from a 1/16
    sample is visually indistinguishable (op-parity test keeps a
    slightly looser tolerance). A compare-and-reduce histogram was
    tried and measured ~3x slower than even the full sort."""
    h, w = img.shape[0], img.shape[1]

    def one_channel(ch):
        pix_s = jnp.round(ch[::4, ::4].reshape(-1)).astype(jnp.int32)
        n = pix_s.shape[0]
        srt = jnp.sort(pix_s)
        edges = jnp.searchsorted(srt, jnp.arange(257), side="left")
        hist = (edges[1:] - edges[:-1]).astype(jnp.int32)  # (256,)
        nonzero = hist > 0
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (n - hist[last_idx]) // 255
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(hist)[:-1]])
        lut = jnp.where(step > 0, (step // 2 + cum) //
                        jnp.maximum(step, 1), jnp.arange(256))
        # LUT applied as a one-hot bf16 contraction, NOT a gather: the
        # (H,W)-indexed 256-table gather measured 323 ms/256-batch on
        # v5e while this einsum runs at the ~28 ms HBM floor. Exact:
        # one-hot rows have a single 1 and LUT integers 0..255 are
        # bf16-representable.
        lutb = jnp.clip(lut, 0, 255).astype(jnp.bfloat16)
        pix = jnp.clip(jnp.round(ch), 0.0, 255.0)
        oh = (pix[..., None] == jnp.arange(256, dtype=jnp.float32)
              ).astype(jnp.bfloat16)
        return jnp.einsum("hwk,k->hw", oh, lutb).astype(jnp.float32)

    return jnp.stack([one_channel(img[..., c]) for c in range(3)], axis=-1)


def _invert(img, _mag, _u):
    return 255.0 - img


def _posterize(img, mag, _u):
    bits = jnp.maximum(1, 8 - (mag / 9.0 * 4).astype(jnp.int32))
    mask = (0xFF << (8 - bits)) & 0xFF
    return jnp.bitwise_and(jnp.round(img).astype(jnp.int32), mask) \
        .astype(jnp.float32)


def _solarize(img, mag, _u):
    # int() truncation matches transforms._solarize's PIL threshold
    thr = jnp.maximum(0.0, jnp.trunc(256.0 - mag / 9.0 * 256.0))
    return jnp.where(img >= thr, 255.0 - img, img)


def _solarize_add(img, mag, _u):
    add = jnp.floor(mag / 9.0 * 110.0)
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def _enhance_factor(mag, u):
    sign = jnp.where(u < 0.5, 1.0, -1.0)
    return jnp.maximum(0.1, 1.0 + (mag / 9.0) * 0.9 * sign)


def _color(img, mag, u):
    v = _enhance_factor(mag, u)
    g = _gray(img)
    return g + v * (img - g)


def _contrast(img, mag, u):
    v = _enhance_factor(mag, u)
    # PIL Contrast: blend with the mean of the grayscale image (+0.5 round)
    mean = jnp.floor(_gray(img).mean() + 0.5)
    return mean + v * (img - mean)


def _brightness(img, mag, u):
    return _enhance_factor(mag, u) * img


def _sharpness(img, mag, u):
    v = _enhance_factor(mag, u)
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13; border rows/cols
    # stay un-filtered (PIL computes the interior only)
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    sm = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
          + p[1:-1, :-2] + 5.0 * p[1:-1, 1:-1] + p[1:-1, 2:]
          + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 13.0
    interior = jnp.zeros(img.shape[:2], bool).at[1:-1, 1:-1].set(True)
    sm = jnp.where(interior[..., None], sm, img)
    return sm + v * (img - sm)


_EW_OPS = [_autocontrast, _equalize, _invert, _posterize, _solarize,
           _solarize_add, _color, _contrast, _brightness, _sharpness]
_N_GEO = 5   # rotate, shear x/y, translate x/y
_N_OPS = _N_GEO + len(_EW_OPS)   # 15, the full rand-inc1 policy


def _geo_matrix(choice, mag, u_sign, h, w):
    """Affine matrix for the geometric ops; identity when ``choice`` is an
    elementwise op. choice codes: 0 rotate, 1 shear-x, 2 shear-y,
    3 translate-x, 4 translate-y, >=5 elementwise."""
    sign = jnp.where(u_sign < 0.5, 1.0, -1.0)
    ident = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])

    deg = mag / 9.0 * 30.0 * sign
    rad = deg * (math.pi / 180.0)
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    # PIL rotate(deg) builds the output->input matrix from -deg about the
    # center: [cos, -sin, *, sin, cos, *] (counterclockwise content spin)
    rot = jnp.array([cos, -sin, cx - cos * cx + sin * cy,
                     sin, cos, cy - sin * cx - cos * cy])

    sv = mag / 9.0 * 0.3 * sign
    shx = jnp.array([1.0, sv, 0.0, 0.0, 1.0, 0.0])
    shy = jnp.array([1.0, 0.0, 0.0, sv, 1.0, 0.0])

    tx = jnp.floor(mag / 9.0 * 0.45 * sign * w)
    ty = jnp.floor(mag / 9.0 * 0.45 * sign * h)
    trx = jnp.array([1.0, 0.0, tx, 0.0, 1.0, 0.0])
    try_ = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, ty])

    mats = jnp.stack([rot, shx, shy, trx, try_])
    geo = mats[jnp.clip(choice, 0, _N_GEO - 1)]
    return jnp.where(choice < _N_GEO, geo, ident)


def _static_geo_mat(op: int, sign: float, magnitude: float,
                    h: int, w: int):
    """One geometric op as a PYTHON-float matrix at a STATIC magnitude.
    Static matrices let XLA constant-fold the warp's gather indices into
    fast slice/interp code — a warp with per-image TRACED parameters
    measured 757 ms/256-batch on v5e (augbench r4) vs ~13 ms
    constant-folded."""
    if op == 0:
        rad = magnitude / 9.0 * 30.0 * sign * math.pi / 180.0
        cx, cy = w / 2.0, h / 2.0
        cos, sin = math.cos(rad), math.sin(rad)
        return (cos, -sin, cx - cos * cx + sin * cy,
                sin, cos, cy - sin * cx - cos * cy)
    sv = magnitude / 9.0 * 0.3 * sign
    if op == 1:
        return (1.0, sv, 0.0, 0.0, 1.0, 0.0)
    if op == 2:
        return (1.0, 0.0, 0.0, sv, 1.0, 0.0)
    if op == 3:
        return (1.0, 0.0, float(int(magnitude / 9.0 * 0.45 * sign * w)),
                0.0, 1.0, 0.0)
    return (1.0, 0.0, 0.0, 0.0, 1.0,
            float(int(magnitude / 9.0 * 0.45 * sign * h)))


def _balanced_split(total: int, parts: int):
    base, rem = divmod(total, parts)
    return [base + (1 if i < rem else 0) for i in range(parts)]


# (sign, magnitude offset in units of mag_std) sub-variants per geo op:
# 3 quantized jitter levels x 2 signs. The +-1 levels approximate the
# gaussian mstd jitter (mean exact, std ~0.82*mstd) while keeping every
# warp matrix a compile-time constant (advisor r4: the nominal-only
# matrices dropped magnitude diversity from 5 of 15 ops).
_GEO_VARIANTS = [(s, lv) for lv in (-1.0, 0.0, 1.0) for s in (1.0, -1.0)]


# Warp-fusion economics on v5e (measured r5): an XLA warp fusion costs
# ~2.2 ms nearly FLAT in batch size (gather positions vectorize over the
# batch dim, so a 3-image slice costs about what an 85-image slice does),
# while pad+slice copies cost ~0.1 ms inside the fused layer. Per-image
# candidate selection (r4) paid 10 warps x all images = 130 ms/layer;
# naive per-(op,sign,level) slices paid 30 fusions x 2.2 = 70 ms; a
# single merged per-slot gather table was WORSE (163 ms: gathers whose
# indices vary across the batch dim lose the batch vectorization, whether
# the indices are literal constants or traced). The landed design pays
# exactly THREE warp fusions per level:
#   - rotate/shear-x/shear-y: one fusion per (op, level); the NEGATIVE
#     sign rides the positive-sign matrix by mirror conjugation
#     (flip(warp_M(flip(img))) == warp_{FMF}(img), and F.rot(t).F =
#     rot(-t), F.shear(s).F = shear(-s) — exact, including the PIL
#     half-pixel frame, because array reversal IS the pixel-center
#     mirror x -> W - x).
#   - translate x/y: offsets are integral by construction -> exact
#     pad+slice copies, one per (level, sign).


def _warp_pm(sl: jnp.ndarray, op: int, lvl: float, n_pos: int,
             h: int, w: int) -> jnp.ndarray:
    """Warp slice ``sl`` with geo op (0 rotate, 1 shear-x, 2 shear-y) at
    static magnitude lvl: the first n_pos images get sign +1, the rest
    sign -1 via mirror conjugation, all in ONE fusion."""
    flip_ax = 1 if op == 2 else 2   # shear-y mirrors rows, others cols
    flip = lambda t: jnp.flip(t, axis=flip_ax)
    mat = jnp.asarray(_static_geo_mat(op, 1.0, lvl, h, w))
    merged = jnp.concatenate([sl[:n_pos], flip(sl[n_pos:])], axis=0)
    warped = jax.vmap(lambda im: _affine_warp(im, mat))(merged)
    return jnp.concatenate([warped[:n_pos], flip(warped[n_pos:])], axis=0)


def _translate_px(sl: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Integer translate with zero fill — exactly _affine_warp with the
    translate matrix (whose offset is integral by construction), as a
    pad+slice copy instead of a 2.2 ms gather fusion. Matrix convention:
    out(x) samples in(x + shift), so positive shift pulls content toward
    the origin."""
    if shift == 0:
        return sl
    size = sl.shape[axis]
    pad = [(0, 0)] * sl.ndim
    pad[axis] = (0, shift) if shift > 0 else (-shift, 0)
    padded = jnp.pad(sl, pad)
    lo = shift if shift > 0 else 0
    return jax.lax.slice_in_dim(padded, lo, lo + size, axis=axis)


def _ra_layer_batch(key, imgs, magnitude, mag_std):
    """One RandAugment layer over the whole batch, TPU-style.

    Instead of realizing all 15 candidate ops per image and selecting
    (the r4 design: 10 constant-folded warps + 10 elementwise ops PER
    IMAGE = 272 ms/256-batch inside the train step), the batch is
    randomly permuted and partitioned into near-equal static slices, one
    per op (geo ops further split across _GEO_VARIANTS); each op runs
    only on its own slice and the inverse permutation restores order.
    Total compute = ~1 op per image instead of 15.

    Distribution note: this is STRATIFIED op assignment — each batch
    carries ~B/15 applications of every op and the per-image marginal
    stays uniform (any image lands in any slice with equal probability
    via the permutation), but op counts no longer fluctuate like iid
    draws, and the `B % 15` remainder gives the first ops one extra slot
    (relative bias <= 1/(B//15); <0.4% for B=256). Augmentation is a
    distribution, not a numerics contract; elementwise magnitudes keep
    the full per-image gaussian jitter."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    k_perm, k_mag, k_sign = jax.random.split(key, 3)
    perm = jax.random.permutation(k_perm, b)
    x = imgs[perm]
    mags = jnp.clip(magnitude + mag_std * jax.random.normal(k_mag, (b,)),
                    0.0, 10.0)
    u_signs = jax.random.uniform(k_sign, (b,))

    counts = _balanced_split(b, _N_OPS)
    outs = []
    start = 0
    for op_i in range(_N_GEO):
        count = counts[op_i]
        if count == 0:
            continue
        # sub-variant sizes in _GEO_VARIANTS order: (+,-1),(-,-1),(+,0),...
        sub6 = _balanced_split(count, len(_GEO_VARIANTS))
        for lv_i, lv in enumerate((-1.0, 0.0, 1.0)):
            n_pos, n_neg = sub6[2 * lv_i], sub6[2 * lv_i + 1]
            tot = n_pos + n_neg
            if tot == 0:
                continue
            lvl = min(10.0, max(0.0, float(magnitude) + float(mag_std) * lv))
            sl = x[start:start + tot]
            if op_i < 3:   # rotate / shear-x / shear-y: flip-merged warp
                outs.append(_warp_pm(sl, op_i, lvl, n_pos, h, w))
            else:          # translate x / y: exact integer pad+slice
                axis = 2 if op_i == 3 else 1
                dim = w if op_i == 3 else h
                shift = int(lvl / 9.0 * 0.45 * dim)
                pieces = []
                if n_pos:
                    pieces.append(_translate_px(sl[:n_pos], shift, axis))
                if n_neg:
                    pieces.append(_translate_px(sl[n_pos:], -shift, axis))
                outs.append(pieces[0] if len(pieces) == 1
                            else jnp.concatenate(pieces, axis=0))
            start += tot
    for op_i in range(_N_GEO, _N_OPS):
        count = counts[op_i]
        if count == 0:
            continue
        op = _EW_OPS[op_i - _N_GEO]
        outs.append(jax.vmap(op)(x[start:start + count],
                                 mags[start:start + count],
                                 u_signs[start:start + count]))
        start += count
    y = jnp.clip(jnp.concatenate(outs, axis=0), 0.0, 255.0)
    return y[jnp.argsort(perm)]


# ------------------------------------------------------------------ RRC


def _rrc_one(key, img, out_px, scale, ratio, method):
    """RandomResizedCrop with the 10-try (scale, log-ratio) sampling of
    transforms.random_resized_crop, resolved branchlessly; resample via
    scale_and_translate (cubic ~ PIL bicubic)."""
    s = img.shape[0]  # packed images are square (S, S, 3)
    k_area, k_ratio, k_xy = jax.random.split(key, 3)
    areas = s * s * jax.random.uniform(k_area, (10,), minval=scale[0],
                                       maxval=scale[1])
    aspects = jnp.exp(jax.random.uniform(
        k_ratio, (10,), minval=math.log(ratio[0]),
        maxval=math.log(ratio[1])))
    cws = jnp.round(jnp.sqrt(areas * aspects))
    chs = jnp.round(jnp.sqrt(areas / aspects))
    valid = (cws > 0) & (cws <= s) & (chs > 0) & (chs <= s)
    first = jnp.argmax(valid)  # first True, or 0 if none
    any_valid = valid.any()
    cw = jnp.where(any_valid, cws[first], float(s))
    ch = jnp.where(any_valid, chs[first], float(s))
    u, v = jax.random.uniform(k_xy, (2,))
    x0 = jnp.floor(u * (s - cw + 1))
    y0 = jnp.floor(v * (s - ch + 1))
    sx = out_px / cw
    sy = out_px / ch
    return jax.image.scale_and_translate(
        img, (out_px, out_px, 3), (0, 1),
        jnp.stack([sy, sx]), jnp.stack([-y0 * sy, -x0 * sx]),
        method=method)


# ----------------------------------------------------------- pipelines


def parse_rand_augment(aa: Optional[str]) -> Optional[dict]:
    """timm aa string -> dict(num_ops, magnitude, mag_std) — the same
    token grammar as transforms.build_aug_policy's rand branch. None for
    no-aug; ValueError for policies with no device implementation."""
    if not aa:
        return None
    if not aa.startswith("rand"):
        raise ValueError(
            f"device-side aug supports rand-* policies only, got {aa!r} "
            "(use the host PIL pipeline for augmix/--aug-splits)")
    mag, mag_std, num_ops = 9.0, 0.5, 2
    for tok in aa.split("-")[1:]:
        if tok.startswith("mstd"):
            mag_std = float(tok[4:])
        elif tok.startswith("m"):
            mag = float(tok[1:])
        elif tok.startswith("n"):
            num_ops = int(tok[1:])
    return {"num_ops": num_ops, "magnitude": mag, "mag_std": mag_std}


def make_train_aug(img_size: int = 224, hflip: float = 0.5,
                   auto_augment: Optional[str] = "rand-m9-mstd0.5-inc1",
                   scale: Tuple[float, float] = (0.08, 1.0),
                   ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                   method: str = "cubic") -> Callable:
    """Returns aug_fn(rng, images_u8 (B,S,S,3)) -> float32 (B,H,W,3) in
    [0,255]: RRC + hflip + RandAugment, all on device, vmapped."""
    ra = parse_rand_augment(auto_augment)

    def one(key, img_u8):
        img = img_u8.astype(jnp.float32)
        k_crop, k_flip = jax.random.split(key)
        img = _rrc_one(k_crop, img, img_size, scale, ratio, method)
        if hflip > 0:
            img = jnp.where(jax.random.uniform(k_flip) < hflip,
                            img[:, ::-1], img)
        return jnp.clip(img, 0.0, 255.0)

    @functools.partial(jax.named_call, name="device_aug")
    def aug_fn(rng, images_u8):
        keys = jax.random.split(rng, images_u8.shape[0])
        imgs = jax.vmap(one)(keys, images_u8)
        if ra is not None:
            k_ra = jax.random.fold_in(rng, 0x5A)
            for i in range(ra["num_ops"]):
                imgs = _ra_layer_batch(jax.random.fold_in(k_ra, i), imgs,
                                       ra["magnitude"], ra["mag_std"])
        return imgs

    return aug_fn


def center_crop(images: jnp.ndarray, out_px: int) -> jnp.ndarray:
    """Eval-path crop from packed squares (pack at >= out/crop_pct px for
    reference-equivalent eval framing)."""
    s = images.shape[1]
    if s < out_px:
        raise ValueError(f"packed px {s} < crop {out_px}")
    y0 = (s - out_px) // 2
    return images[:, y0:y0 + out_px, y0:y0 + out_px, :]
