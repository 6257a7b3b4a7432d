"""Native decode plane (native/libleme_data.so) vs the PIL path.

The C++ plane must (a) track PIL's crop-then-bicubic-resample closely on
JPEG sources, (b) fall back to PIL for anything it can't handle, and
(c) plug into datasets through the wants_encoded transform protocol.
"""
import io

import numpy as np
import pytest
from PIL import Image

from lemevit_tpu.data import native_decode as nd

pytestmark = pytest.mark.fast

HAS_NATIVE = nd.available()
needs_native = pytest.mark.skipif(not HAS_NATIVE,
                                  reason="libleme_data.so unavailable")


def _smooth_image(w, h, seed=0):
    """Low-frequency random image (JPEG-friendly: decode differences stay
    small, so the comparison tests the RESAMPLER, not JPEG ringing)."""
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (h // 16 + 2, w // 16 + 2, 3), np.uint8)
    img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
    return img


def _jpeg_bytes(img, quality=95):
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@needs_native
def test_jpeg_size():
    data = _jpeg_bytes(_smooth_image(321, 203))
    assert nd.jpeg_size(data) == (321, 203)
    assert nd.jpeg_size(b"not a jpeg") is None


@needs_native
def test_decode_crop_matches_pil():
    img = _smooth_image(400, 300)
    data = _jpeg_bytes(img)
    box = (37.0, 22.0, 256.0, 192.0)
    out = nd.decode_crop(data, box, (224, 224))
    assert out is not None and out.shape == (224, 224, 3)
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (224, 224), Image.BICUBIC,
            box=(box[0], box[1], box[0] + box[2], box[1] + box[3])),
        np.uint8)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) <= 12, np.percentile(diff, 99)


@needs_native
def test_decode_crop_dct_scaled_path():
    """Large source + small target engages libjpeg DCT scaling (decode at
    1/2..1/8); output must still track PIL within a looser tolerance."""
    img = _smooth_image(1600, 1200, seed=1)
    data = _jpeg_bytes(img)
    box = (64.0, 40.0, 1408.0, 1056.0)  # crop/denom >= 224 up to denom=4
    out = nd.decode_crop(data, box, (224, 224))
    assert out is not None
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (224, 224), Image.BICUBIC,
            box=(box[0], box[1], box[0] + box[2], box[1] + box[3])),
        np.uint8)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 4.0, diff.mean()


@needs_native
def test_decode_crop_hflip():
    data = _jpeg_bytes(_smooth_image(256, 256, seed=2))
    box = (0.0, 0.0, 256.0, 256.0)
    plain = nd.decode_crop(data, box, (128, 128), hflip=False)
    flipped = nd.decode_crop(data, box, (128, 128), hflip=True)
    np.testing.assert_array_equal(flipped, plain[:, ::-1])


@needs_native
def test_decode_grayscale_jpeg():
    img = _smooth_image(200, 150, seed=3).convert("L")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    out = nd.decode_crop(buf.getvalue(), (0, 0, 200, 150), (96, 96))
    assert out is not None and out.shape == (96, 96, 3)
    # gray -> RGB: channels identical
    assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 1


def test_native_train_transform_unknown_format_fallback():
    """Bytes neither codec understands route through the PIL path."""
    from lemevit_tpu.data.transforms import build_native_train_transform
    img = _smooth_image(100, 100, seed=4)
    buf = io.BytesIO()
    img.save(buf, "BMP")
    tf = build_native_train_transform(64, hflip=0.0, auto_augment=None)
    assert getattr(tf, "wants_encoded", False)
    out = tf(buf.getvalue())
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


@needs_native
def test_png_decode_crop_matches_pil():
    """PNG (lossless) decodes must track PIL's crop+bicubic closely —
    only resampler differences remain, no codec noise."""
    img = _smooth_image(300, 220, seed=8)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    data = buf.getvalue()
    assert nd.image_size(data) == (300, 220)
    box = (15.0, 10.0, 256.0, 192.0)
    out = nd.decode_crop(data, box, (128, 128))
    assert out is not None and out.shape == (128, 128, 3)
    ref = np.asarray(
        img.resize((128, 128), Image.BICUBIC,
                   box=(box[0], box[1], box[0] + box[2], box[1] + box[3])),
        np.uint8)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 1.5, diff.mean()


@needs_native
def test_png_rgba_and_gray_decode():
    """Palette/alpha/gray PNGs all land as RGB u8 via libpng's
    format conversion."""
    rgba = _smooth_image(64, 64, seed=9).convert("RGBA")
    gray = _smooth_image(64, 64, seed=10).convert("L")
    for img in (rgba, gray):
        buf = io.BytesIO()
        img.save(buf, "PNG")
        out = nd.decode_crop(buf.getvalue(), (0, 0, 64, 64), (32, 32))
        assert out is not None and out.shape == (32, 32, 3)


@needs_native
def test_native_eval_transform_center_box():
    from lemevit_tpu.data.transforms import (build_eval_transform,
                                             build_native_eval_transform)
    img = _smooth_image(480, 360, seed=5)
    data = _jpeg_bytes(img)
    out = build_native_eval_transform(224, crop_pct=0.9)(data)
    ref = build_eval_transform(224, crop_pct=0.9)(
        Image.open(io.BytesIO(data)).convert("RGB"))
    assert out.shape == ref.shape == (224, 224, 3)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    # resize-then-crop vs crop-then-resize: same geometry, different
    # boundary sampling — central agreement is the contract
    assert diff[16:-16, 16:-16].mean() < 6.0, diff[16:-16, 16:-16].mean()


def test_dataset_wants_encoded_protocol(tmp_path):
    from lemevit_tpu.data.datasets import ImageFolderDataset
    cls = tmp_path / "catA"
    cls.mkdir()
    _smooth_image(80, 60, seed=6).save(cls / "a.jpg", quality=95)

    seen = {}

    def probe(data):
        seen["type"] = type(data)
        return np.zeros((8, 8, 3), np.uint8)

    probe.wants_encoded = True
    ds = ImageFolderDataset(str(tmp_path), transform=probe)
    img, label = ds[0]
    assert seen["type"] is bytes
    assert img.shape == (8, 8, 3) and label == 0


@needs_native
def test_rrc_box_distribution_matches_pil_math():
    """rrc_box and transforms.random_resized_crop draw from the same
    sampler: identical seeds give identical crop geometry."""
    import random as _random

    r1 = _random.Random(123)
    box = nd.rrc_box(400, 300, rng=r1)
    from lemevit_tpu.data.transforms import random_resized_crop
    img = Image.new("RGB", (400, 300))
    r2 = _random.Random(123)
    # reproduce the accepted-candidate loop manually
    out = random_resized_crop(img, 32, rng=r2)
    assert out.size == (32, 32)
    assert 0 <= box[0] <= 400 - box[2] and 0 <= box[1] <= 300 - box[3]
