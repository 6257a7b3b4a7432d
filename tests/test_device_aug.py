"""Device-side augmentation (data/device_aug.py) vs the PIL reference ops
(data/transforms.py — themselves the timm rand-m9-mstd0.5-inc1 policy,
reference configs/lemevit.yaml `aa`), plus the packed cache + spawn loader.

Augmentation is a distribution, not a numerics contract: op tests compare
the device op against the PIL op at matched magnitude with loose pixel
tolerances (resample kernels differ for warps)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from lemevit_tpu.data import device_aug as da


def _img(seed=0, size=64):
    rng = np.random.RandomState(seed)
    # smooth-ish structured image: gradients + noise (histogram not flat)
    yy, xx = np.mgrid[0:size, 0:size] / size
    base = np.stack([xx * 255, yy * 200 + 30, (xx + yy) * 120], -1)
    arr = np.clip(base + rng.normal(0, 20, base.shape), 0, 255)
    return arr.astype(np.uint8)


def _mad(a, b):
    return float(np.abs(np.asarray(a, np.float32)
                        - np.asarray(b, np.float32)).mean())


@pytest.mark.fast
@pytest.mark.parametrize("name,dev_fn,pil_fn,tol", [
    ("invert", lambda x, m, u: da._invert(x, m, u),
     lambda im, m: ImageOps.invert(im), 0.5),
    ("autocontrast", lambda x, m, u: da._autocontrast(x, m, u),
     lambda im, m: ImageOps.autocontrast(im), 1.5),
    # equalize builds its LUT from a stride-4 histogram sample (see
    # device_aug._equalize) — parity is tested separately at realistic
    # resolution in test_equalize_sampled_histogram_matches_pil
    ("posterize", lambda x, m, u: da._posterize(x, m, u),
     lambda im, m: ImageOps.posterize(im, max(1, 8 - int(m / 9.0 * 4))),
     0.5),
    ("solarize", lambda x, m, u: da._solarize(x, m, u),
     lambda im, m: ImageOps.solarize(im, max(0, int(256 - m / 9.0 * 256))),
     0.5),
    ("color+", lambda x, m, u: da._color(x, m, u),
     lambda im, m: ImageEnhance.Color(im).enhance(1 + m / 9.0 * 0.9), 2.0),
    ("brightness+", lambda x, m, u: da._brightness(x, m, u),
     lambda im, m: ImageEnhance.Brightness(im).enhance(1 + m / 9.0 * 0.9),
     1.0),
    ("contrast+", lambda x, m, u: da._contrast(x, m, u),
     lambda im, m: ImageEnhance.Contrast(im).enhance(1 + m / 9.0 * 0.9),
     2.0),
    ("sharpness+", lambda x, m, u: da._sharpness(x, m, u),
     lambda im, m: ImageEnhance.Sharpness(im).enhance(1 + m / 9.0 * 0.9),
     2.5),
])
def test_elementwise_ops_match_pil(name, dev_fn, pil_fn, tol):
    arr = _img()
    mag = 7.0
    dev = np.clip(np.asarray(
        dev_fn(jnp.asarray(arr, jnp.float32), jnp.float32(mag),
               jnp.float32(0.25))), 0, 255)  # u=0.25 -> positive enhance
    pil = pil_fn(Image.fromarray(arr), mag)
    assert _mad(dev, pil) < tol, f"{name}: MAD {_mad(dev, pil)}"


@pytest.mark.fast
def test_equalize_sampled_histogram_matches_pil():
    """The stride-4 LUT is a sample estimate of PIL's full histogram:
    measured MAD ~6 at 224^2 (3136 samples) and ~2.4 at 448^2 — a ~2%
    brightness-mapping jitter on an op drawn 1/15 of the time, fine for
    an augmentation distribution. This pins the bound so a future
    regression (wrong LUT math) is caught while sampling noise passes."""
    for px, tol in ((224, 7.5), (448, 3.5)):
        arr = _img(0, px)
        dev = np.clip(np.asarray(
            da._equalize(jnp.asarray(arr, jnp.float32), 9.0, 0.5)),
            0, 255)
        pil = ImageOps.equalize(Image.fromarray(arr))
        assert _mad(dev, pil) < tol, (px, _mad(dev, pil))


@pytest.mark.fast
def test_solarize_add_matches_numpy_reference():
    arr = _img(3)
    mag = 9.0
    add = int(mag / 9.0 * 110)
    ref = np.where(arr < 128, np.clip(arr.astype(np.int16) + add, 0, 255),
                   arr)
    dev = da._solarize_add(jnp.asarray(arr, jnp.float32),
                           jnp.float32(mag), 0.0)
    assert _mad(dev, ref) < 0.5


@pytest.mark.fast
def test_affine_translate_matches_pil():
    arr = _img(1)
    px = 7
    dev = da._affine_warp(jnp.asarray(arr, jnp.float32),
                          jnp.array([1.0, 0.0, px, 0.0, 1.0, 0.0]))
    pil = Image.fromarray(arr).transform(
        (64, 64), Image.AFFINE, (1, 0, px, 0, 1, 0),
        resample=Image.BILINEAR)
    assert _mad(dev, pil) < 1.0


@pytest.mark.fast
def test_affine_rotate_direction_matches_pil():
    arr = _img(2)
    # _geo_matrix choice 0 = rotate; deg = mag/9*30. Compare against PIL
    # at the same angle (interior only: border taps differ by fill)
    mag = 6.0
    mat = da._geo_matrix(jnp.int32(0), jnp.float32(mag), jnp.float32(0.0),
                         64, 64)
    dev = np.asarray(da._affine_warp(jnp.asarray(arr, jnp.float32), mat))
    pil = np.asarray(Image.fromarray(arr).rotate(
        mag / 9.0 * 30.0, resample=Image.BILINEAR))
    assert _mad(dev[12:-12, 12:-12], pil[12:-12, 12:-12]) < 2.0


@pytest.mark.fast
def test_rrc_covers_scale_range_and_shapes():
    aug = da.make_train_aug(32, hflip=0.5, auto_augment=None,
                            scale=(0.2, 1.0))
    x = np.broadcast_to(_img(0, 48)[None], (16, 48, 48, 3))
    out = jax.jit(aug)(jax.random.PRNGKey(0), jnp.asarray(x))
    assert out.shape == (16, 32, 32, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 255
    # different images got different crops
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


@pytest.mark.fast
def test_full_pipeline_jits_and_is_deterministic():
    aug = da.make_train_aug(32, auto_augment="rand-m9-mstd0.5-inc1")
    x = np.stack([_img(i, 40) for i in range(8)])
    f = jax.jit(aug)
    a = f(jax.random.PRNGKey(7), jnp.asarray(x))
    b = f(jax.random.PRNGKey(7), jnp.asarray(x))
    c = f(jax.random.PRNGKey(8), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.fast
def test_center_crop_device():
    x = jnp.asarray(np.stack([_img(i, 48) for i in range(2)]))
    out = da.center_crop(x, 32)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(x[:, 8:40, 8:40]))


@pytest.mark.fast
def test_parse_rand_augment():
    cfg = da.parse_rand_augment("rand-m7-mstd0.3-n3-inc1")
    assert cfg == {"num_ops": 3, "magnitude": 7.0, "mag_std": 0.3}
    assert da.parse_rand_augment(None) is None
    with pytest.raises(ValueError):
        da.parse_rand_augment("augmix-m3")


# ------------------------------------------------------------- packed


def _mk_folder(root, n_cls=2, per=3, px=40):
    for c in range(n_cls):
        d = os.path.join(root, "train", f"cls{c}")
        os.makedirs(d)
        for i in range(per):
            Image.fromarray(_img(c * 10 + i, px)).save(
                os.path.join(d, f"{i}.jpg"), quality=92)


@pytest.mark.fast
def test_pack_and_read_roundtrip(tmp_path):
    from lemevit_tpu.data.packed import PackedDataset, pack_folder
    _mk_folder(str(tmp_path))
    meta = pack_folder(os.path.join(tmp_path, "train"),
                       os.path.join(tmp_path, "packed"), px=32,
                       log_every=0)
    assert meta["n"] == 6 and meta["px"] == 32
    ds = PackedDataset(os.path.join(tmp_path, "packed"))
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert label == 0 and ds[5][1] == 1
    # content sanity: packed sample resembles a center-crop resize
    src = np.asarray(Image.open(
        os.path.join(tmp_path, "train", "cls0", "0.jpg")).resize(
            (32, 32), Image.BICUBIC), np.uint8)
    assert _mad(img, src) < 30  # same scene, different resampler


@pytest.mark.fast
def test_packed_dataset_pickles(tmp_path):
    import pickle

    from lemevit_tpu.data.packed import PackedDataset, pack_folder
    _mk_folder(str(tmp_path))
    pack_folder(os.path.join(tmp_path, "train"),
                os.path.join(tmp_path, "packed"), px=32, log_every=0)
    ds = PackedDataset(os.path.join(tmp_path, "packed"))
    _ = ds[0]
    ds2 = pickle.loads(pickle.dumps(ds))
    np.testing.assert_array_equal(ds2[3][0], ds[3][0])


def test_spawn_worker_loader_matches_threads(tmp_path):
    """Spawn-based worker processes (DatasetSpec path) deliver the same
    batches as the thread path — and never fork the JAX-initialized
    parent."""
    from lemevit_tpu.data.loader import Loader
    from lemevit_tpu.data.packed import pack_folder
    from lemevit_tpu.data.spawn import DatasetSpec
    _mk_folder(str(tmp_path))
    pack_folder(os.path.join(tmp_path, "train"),
                os.path.join(tmp_path, "packed"), px=32, log_every=0)
    spec = DatasetSpec("lemevit_tpu.data.packed:PackedDataset",
                       {"root": os.path.join(tmp_path, "packed")})
    ds = spec.build()
    kw = dict(batch_size=2, shuffle=True, drop_last=True, seed=3)
    ref = list(Loader(ds, num_threads=2, **kw))
    spawned = list(Loader(ds, num_procs=2, dataset_spec=spec, **kw))
    assert len(ref) == len(spawned) == 3
    for a, b in zip(ref, spawned):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


@pytest.mark.fast
@pytest.mark.parametrize("op", [0, 1, 2])
def test_warp_pm_matches_affine_warp_both_signs(op):
    """The flip-merged warp (_warp_pm) must reproduce _affine_warp with
    the +matrix for the positive half and the -matrix for the negative
    half (mirror conjugation is exact in the PIL half-pixel frame)."""
    import numpy as np
    h = w = 48
    arrs = np.stack([_img(i, h) for i in range(4)]).astype(np.float32)
    lvl = 8.5
    out = np.asarray(da._warp_pm(jnp.asarray(arrs), op, lvl, 2, h, w))
    for g in range(4):
        sign = 1.0 if g < 2 else -1.0
        ref = np.asarray(da._affine_warp(
            jnp.asarray(arrs[g]),
            jnp.asarray(da._static_geo_mat(op, sign, lvl, h, w))))
        np.testing.assert_allclose(out[g], ref, atol=1e-2,
                                   err_msg=f"op={op} g={g}")


@pytest.mark.fast
@pytest.mark.parametrize("op,sign", [(3, 1.0), (3, -1.0),
                                     (4, 1.0), (4, -1.0)])
def test_translate_px_matches_affine_warp(op, sign):
    import numpy as np
    h = w = 48
    arr = _img(2, h).astype(np.float32)
    lvl = 9.0
    ref = np.asarray(da._affine_warp(
        jnp.asarray(arr),
        jnp.asarray(da._static_geo_mat(op, sign, lvl, h, w))))
    dim = w if op == 3 else h
    shift = int(sign) * int(lvl / 9.0 * 0.45 * dim)
    axis = 2 if op == 3 else 1
    out = np.asarray(da._translate_px(jnp.asarray(arr)[None],
                                      shift, axis))[0]
    np.testing.assert_allclose(out, ref, atol=1e-3)
