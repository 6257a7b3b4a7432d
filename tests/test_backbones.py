"""ResNet backbone + DOTA submission writer tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_resnet18_pyramid():
    from lemevit_tpu.models.resnet import resnet18
    m = resnet18()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_resnet50_channels():
    from lemevit_tpu.models.resnet import resnet50
    m = resnet50()
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert feats[-1].shape[-1] == 2048


def test_resnet_with_bit_head():
    from lemevit_tpu.models.resnet import resnet18
    from lemevit_tpu.tasks import BITChangeDetector
    model = BITChangeDetector(backbone=resnet18(), dec_depth=1)
    a = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), a, a)
    out = model.apply(v, a, a)
    assert out.shape == (1, 64, 64, 2)


def test_dota_submission(tmp_path):
    from lemevit_tpu.tasks.dota import (DOTA10_CLASSES, obb_to_poly_np,
                                        write_dota_submission)
    boxes = np.array([[50, 50, 20, 10, 0.0], [10, 10, 4, 4, 0.5]])
    dets = {"P0001": {"boxes": boxes,
                      "scores": np.array([0.9, 0.01]),
                      "labels": np.array([0, 3])}}
    paths = write_dota_submission(str(tmp_path), dets)
    assert len(paths) == len(DOTA10_CLASSES)
    plane = open(os.path.join(tmp_path, "Task1_plane.txt")).read().strip()
    assert plane.startswith("P0001 0.9000")
    # low-score detection filtered
    gtf = open(os.path.join(
        tmp_path, "Task1_ground-track-field.txt")).read().strip()
    assert gtf == ""
    # polygon corners of the axis-aligned box
    poly = obb_to_poly_np(boxes[:1])[0]
    assert sorted(poly[::2]) == [40, 40, 60, 60]
    assert sorted(poly[1::2]) == [45, 45, 55, 55]


def test_swin_tiny_pyramid():
    from lemevit_tpu.models.swin import swin_tiny
    m = swin_tiny()
    x = jnp.zeros((1, 56, 56, 3))  # exercises window=7 exactly
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 14, 14, 96), (1, 7, 7, 192), (1, 4, 4, 384), (1, 2, 2, 768)]


def test_swin_shifted_windows_and_padding():
    from lemevit_tpu.models.swin import swin_tiny
    m = swin_tiny(window_size=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 24, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert np.isfinite(np.asarray(feats[-1])).all()
