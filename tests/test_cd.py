"""Change-detection pipeline tests: SNUNet head + CD train CLI smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_snunet_shapes():
    from lemevit_tpu.tasks.snunet import SNUNetECAM
    m = SNUNetECAM(base_channels=8, num_classes=2)
    a = jnp.zeros((1, 32, 32, 3))
    b = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), a, b)
    out = m.apply(v, a, b)
    assert out.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_cd_cli_smoke(tmp_path):
    from lemevit_tpu.cli.train_cd import main
    res = main([
        "--synthetic", "--backbone", "lemevit_micro", "--patch-size", "32",
        "--batch-size", "2", "--epochs", "1", "--steps-per-epoch", "2",
        "--dec-depth", "1", "--output", str(tmp_path), "--workers", "1",
    ])
    assert 0.0 <= res["best_f1"] <= 1.0


def test_cd_prf1():
    from lemevit_tpu.cli.train_cd import prf1
    m = prf1(tp=8, fp=2, fn=2)
    assert m["precision"] == pytest.approx(0.8)
    assert m["recall"] == pytest.approx(0.8)
    assert m["f1"] == pytest.approx(0.8)
