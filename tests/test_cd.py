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


def test_snunet_conc_shapes_and_channel_contract():
    """Siam_NestedUNet_Conc parity (reference Models.py:226-314): 5-tuple
    of full-res logits, and the first decoder column's conv takes
    filters[i]*2 + filters[i+1] input channels (B-branch-only upsample)."""
    from lemevit_tpu.tasks.snunet import SiamNestedUNetConc
    m = SiamNestedUNetConc(base_channels=8, num_classes=2)
    a = jnp.zeros((1, 32, 32, 3))
    b = jnp.ones((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), a, b)
    outs = m.apply(v, a, b)
    assert isinstance(outs, tuple) and len(outs) == 5
    for o in outs:
        assert o.shape == (1, 32, 32, 2)
        assert np.isfinite(np.asarray(o)).all()
    # conv0_1 equivalent: in_ch = 8*2 + 16 = 32 (not 8*2 + 2*16)
    k = v["params"]["dec0_1"]["conv0"]["kernel"]
    assert k.shape[2] == 8 * 2 + 16, k.shape


def test_siamunet_diff_shapes():
    """SiamUnet_diff (reference siamunet_dif.py): 1-tuple of full-res
    logits from the |enc1 - enc2| skip decoder."""
    from lemevit_tpu.tasks.snunet import SiamUnetDiff
    m = SiamUnetDiff(base_channels=8, num_classes=2)
    a = jnp.zeros((2, 32, 32, 3))
    b = jnp.ones((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), a, b)
    (out,) = m.apply(v, a, b)
    assert out.shape == (2, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()
    # identical inputs => |diff| skips are 0, logits must match a==b case
    same = m.apply(v, a, a)[0]
    assert np.isfinite(np.asarray(same)).all()


@pytest.mark.parametrize("head", ["snunet_conc", "siamunet_diff"])
def test_cd_cli_alt_heads_smoke(head, tmp_path):
    from lemevit_tpu.cli.train_cd import main
    res = main([
        "--synthetic", "--head", head, "--patch-size", "32",
        "--batch-size", "2", "--epochs", "1", "--steps-per-epoch", "2",
        "--loss", "hybrid", "--output", str(tmp_path), "--workers", "1",
    ])
    assert 0.0 <= res["best_f1"] <= 1.0


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
