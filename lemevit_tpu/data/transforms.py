"""Host-side image transforms (PIL/numpy), device-side normalization.

Replaces the timm ``create_loader`` transform stack the reference delegates
to (/root/reference/main.py:399-428 + configs/lemevit.yaml: RRC + hflip +
RandAugment rand-m9-mstd0.5-inc1, bicubic, eval center-crop 0.9).

Design split (TPU-first): host does decode + geometric crop/flip + uint8
RandAugment; the batch crosses to device as uint8 NHWC, and normalization /
mixup / random-erasing run inside the jitted step (see mixup.py) so they fuse
with the model's first conv and the host never touches float pixels.
"""
from __future__ import annotations

import math
import random
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# ------------------------------------------------------------- geometric

def random_resized_crop(img: Image.Image, size: int,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                        rng: Optional[random.Random] = None) -> Image.Image:
    rng = rng or random
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.randint(0, w - cw)
            y0 = rng.randint(0, h - ch)
            return img.resize((size, size), Image.BICUBIC,
                              box=(x0, y0, x0 + cw, y0 + ch))
    # fallback: center crop
    return center_crop_resize(img, size, crop_pct=1.0)


def center_crop_resize(img: Image.Image, size: int,
                       crop_pct: float = 0.9) -> Image.Image:
    w, h = img.size
    scale_size = int(math.floor(size / crop_pct))
    short = min(w, h)
    nw, nh = int(round(w * scale_size / short)), int(round(h * scale_size / short))
    img = img.resize((nw, nh), Image.BICUBIC)
    x0 = (nw - size) // 2
    y0 = (nh - size) // 2
    return img.crop((x0, y0, x0 + size, y0 + size))


# ------------------------------------------------------------- randaugment

def _autocontrast(img, _):
    return ImageOps.autocontrast(img)


def _equalize(img, _):
    return ImageOps.equalize(img)


def _invert(img, _):
    return ImageOps.invert(img)


def _rotate(img, mag):
    deg = mag / 9.0 * 30.0
    return img.rotate(deg if random.random() < 0.5 else -deg,
                      resample=Image.BICUBIC)


def _posterize(img, mag):
    bits = max(1, 8 - int(mag / 9.0 * 4))
    return ImageOps.posterize(img, bits)


def _solarize(img, mag):
    thr = int(256 - mag / 9.0 * 256)
    return ImageOps.solarize(img, max(0, thr))


def _solarize_add(img, mag):
    add = int(mag / 9.0 * 110)
    arr = np.asarray(img).astype(np.int16)
    arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _enhance(cls):
    def fn(img, mag):
        # "inc1" style: magnitude raises enhancement symmetrically around 1
        v = 1.0 + (mag / 9.0) * 0.9 * (1 if random.random() < 0.5 else -1)
        return cls(img).enhance(max(0.1, v))
    return fn


def _shear(axis):
    def fn(img, mag):
        v = mag / 9.0 * 0.3 * (1 if random.random() < 0.5 else -1)
        mat = (1, v, 0, 0, 1, 0) if axis == "x" else (1, 0, 0, v, 1, 0)
        return img.transform(img.size, Image.AFFINE, mat,
                             resample=Image.BICUBIC)
    return fn


def _translate(axis):
    def fn(img, mag):
        frac = mag / 9.0 * 0.45 * (1 if random.random() < 0.5 else -1)
        px = int(frac * (img.size[0] if axis == "x" else img.size[1]))
        mat = (1, 0, px, 0, 1, 0) if axis == "x" else (1, 0, 0, 0, 1, px)
        return img.transform(img.size, Image.AFFINE, mat,
                             resample=Image.BICUBIC)
    return fn


RA_OPS = [
    _autocontrast, _equalize, _invert, _rotate, _posterize, _solarize,
    _solarize_add,
    _enhance(ImageEnhance.Color), _enhance(ImageEnhance.Contrast),
    _enhance(ImageEnhance.Brightness), _enhance(ImageEnhance.Sharpness),
    _shear("x"), _shear("y"), _translate("x"), _translate("y"),
]

# AugMix op set (Hendrycks et al.): geometric + histogram ops only — no
# color/contrast/brightness/sharpness, which overlap ImageNet-C corruptions
AUGMIX_OPS = [
    _autocontrast, _equalize, _rotate, _posterize, _solarize,
    _shear("x"), _shear("y"), _translate("x"), _translate("y"),
]


class AugMix:
    """AugMix: mix `width` random op chains with Dirichlet weights, then
    blend with the source image by a Beta-sampled factor (timm aa string
    'augmix-m{M}-w{W}-d{D}', reference main.py --aa + --aug-splits path)."""

    def __init__(self, magnitude: float = 3.0, width: int = 3,
                 depth: int = -1, alpha: float = 1.0):
        self.magnitude = magnitude
        self.width = width
        self.depth = depth
        self.alpha = alpha

    def __call__(self, img: Image.Image) -> Image.Image:
        ws = np.random.dirichlet([self.alpha] * self.width)
        m = float(np.random.beta(self.alpha, self.alpha))
        base = np.asarray(img, np.float32)
        mixed = np.zeros_like(base)
        for i in range(self.width):
            depth = self.depth if self.depth > 0 else random.randint(1, 3)
            aug = img
            for op in random.choices(AUGMIX_OPS, k=depth):
                aug = op(aug, self.magnitude)
            mixed += ws[i] * np.asarray(aug, np.float32)
        out = (1 - m) * base + m * mixed
        return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


def build_aug_policy(auto_augment: Optional[str]):
    """Parse a timm-style aa string into a PIL->PIL augmentation callable:
    'rand-m9-mstd0.5-inc1' -> RandAugment, 'augmix-m3-w3[-dD]' -> AugMix,
    None/'' -> None."""
    if not auto_augment:
        return None
    if auto_augment.startswith("augmix"):
        mag, width, depth = 3.0, 3, -1
        for tok in auto_augment.split("-")[1:]:
            if tok.startswith("mstd"):
                pass  # accepted for timm-string compatibility; AugMix
                #       magnitude jitter is not implemented (timm's
                #       'augmix-m5-mstd0.5' form must not crash)
            elif tok.startswith("m"):
                mag = float(tok[1:])
            elif tok.startswith("w"):
                width = int(tok[1:])
            elif tok.startswith("d"):
                depth = int(tok[1:])
        return AugMix(magnitude=mag, width=width, depth=depth)
    if auto_augment.startswith("rand"):
        mag, mag_std, num_ops = 9.0, 0.5, 2
        for tok in auto_augment.split("-")[1:]:
            if tok.startswith("mstd"):
                mag_std = float(tok[4:])
            elif tok.startswith("m"):
                mag = float(tok[1:])
            elif tok.startswith("n"):
                num_ops = int(tok[1:])
        return RandAugment(num_ops=num_ops, magnitude=mag, mag_std=mag_std)
    raise ValueError(f"unknown auto_augment policy {auto_augment!r}")


class RandAugment:
    """rand-m{M}-mstd{S}-inc1 policy: N random ops at gaussian-jittered
    magnitude (timm's default recipe, config key ``aa`` in the reference)."""

    def __init__(self, num_ops: int = 2, magnitude: float = 9.0,
                 mag_std: float = 0.5):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.mag_std = mag_std

    def __call__(self, img: Image.Image) -> Image.Image:
        for op in random.choices(RA_OPS, k=self.num_ops):
            mag = self.magnitude
            if self.mag_std > 0:
                mag = random.gauss(mag, self.mag_std)
            mag = min(max(mag, 0.0), 10.0)
            img = op(img, mag)
        return img


# ------------------------------------------------------------- pipelines

def build_train_transform(img_size: int = 224, hflip: float = 0.5,
                          auto_augment: Optional[str] = "rand-m9-mstd0.5-inc1",
                          scale=(0.08, 1.0)) -> Callable:
    ra = build_aug_policy(auto_augment)

    def transform(img: Image.Image) -> np.ndarray:
        img = random_resized_crop(img, img_size, scale=scale)
        if hflip > 0 and random.random() < hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if ra is not None:
            img = ra(img)
        return np.asarray(img, dtype=np.uint8)

    return transform


def build_augsplit_transform(img_size: int = 224, hflip: float = 0.5,
                             auto_augment: str = "augmix-m3-w3",
                             num_splits: int = 3,
                             scale=(0.08, 1.0)) -> Callable:
    """timm AugMixDataset semantics (reference main.py:369-393): one base
    crop/flip per sample, then num_splits versions — split 0 CLEAN, splits
    1.. augmented — stacked to (S, H, W, 3) u8. Pairs with the JSD loss and
    per-split BatchNorm statistics."""
    aug = build_aug_policy(auto_augment)

    def transform(img: Image.Image) -> np.ndarray:
        img = random_resized_crop(img, img_size, scale=scale)
        if hflip > 0 and random.random() < hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        views = [np.asarray(img, np.uint8)]
        for _ in range(num_splits - 1):
            views.append(np.asarray(aug(img) if aug else img, np.uint8))
        return np.stack(views)

    return transform


def build_native_train_transform(img_size: int = 224, hflip: float = 0.5,
                                 auto_augment: Optional[str] =
                                 "rand-m9-mstd0.5-inc1",
                                 scale=(0.08, 1.0)) -> Callable:
    """GIL-free train pipeline: JPEG decode + RRC + flip run in C++
    (native/libleme_data.so, GIL released for the whole call) so thread
    producers scale across cores; RandAugment (if configured) runs on the
    already-cropped img_size image. The transform advertises
    ``wants_encoded`` — datasets hand it raw bytes and it falls back to
    the PIL path for non-JPEG/CMYK bytes or a missing .so."""
    import io

    from lemevit_tpu.data import native_decode as nd

    ra = build_aug_policy(auto_augment)
    pil_path = build_train_transform(img_size, hflip, auto_augment, scale)

    def transform(data) -> np.ndarray:
        if isinstance(data, (bytes, bytearray, memoryview)):
            data = bytes(data)
            size = nd.jpeg_size(data)
            if size is not None:
                box = nd.rrc_box(*size, scale=scale)
                flip = hflip > 0 and random.random() < hflip
                arr = nd.decode_crop(data, box, (img_size, img_size), flip)
                if arr is not None:
                    if ra is not None:
                        arr = np.asarray(ra(Image.fromarray(arr)), np.uint8)
                    return arr
            data = Image.open(io.BytesIO(data)).convert("RGB")
        return pil_path(data)

    transform.wants_encoded = True
    return transform


def build_native_eval_transform(img_size: int = 224,
                                crop_pct: float = 0.9) -> Callable:
    """Native twin of build_eval_transform (center-crop formulated as
    crop-then-resize; see native_decode.center_box)."""
    import io

    from lemevit_tpu.data import native_decode as nd

    pil_path = build_eval_transform(img_size, crop_pct)

    def transform(data) -> np.ndarray:
        if isinstance(data, (bytes, bytearray, memoryview)):
            data = bytes(data)
            size = nd.jpeg_size(data)
            if size is not None:
                box = nd.center_box(*size, img_size, crop_pct)
                arr = nd.decode_crop(data, box, (img_size, img_size))
                if arr is not None:
                    return arr
            data = Image.open(io.BytesIO(data)).convert("RGB")
        return pil_path(data)

    transform.wants_encoded = True
    return transform


def build_eval_transform(img_size: int = 224,
                         crop_pct: float = 0.9) -> Callable:
    def transform(img: Image.Image) -> np.ndarray:
        return np.asarray(center_crop_resize(img, img_size, crop_pct),
                          dtype=np.uint8)

    return transform
