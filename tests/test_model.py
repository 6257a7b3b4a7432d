"""Model structure tests: shapes, parameter counts vs the published reference
numbers, feature-pyramid mode, and attention-variant coverage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lemevit_tpu.models import create_model, variant_config, FEATURE_CHANNELS


def _init(model, shape=(1, 224, 224, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return variables, x


def _param_count(variables):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))


# Published parameter counts (M) from /root/reference/README.md:85-87 and the
# registry configs. Tolerance 1%: torch counts BN running stats separately.
PARAM_COUNTS_M = {
    "lemevit_tiny": 8.64,
    "lemevit_small": 16.40,
    "lemevit_base": 53.10,
}


@pytest.mark.parametrize("name", ["lemevit_tiny", "lemevit_small"])
def test_logits_shape(name):
    model = create_model(name, num_classes=1000)
    variables, x = _init(model, (1, 64, 64, 3))
    out = model.apply(variables, x)
    assert out.shape == (1, 1000)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name,expected_m", sorted(PARAM_COUNTS_M.items()))
def test_param_count_parity(name, expected_m):
    model = create_model(name, num_classes=1000)
    # eval_shape: parameter shapes without any compute
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
    count_m = _param_count(variables) / 1e6
    assert count_m == pytest.approx(expected_m, rel=0.01), (
        f"{name}: {count_m:.3f}M params vs published {expected_m}M")


def test_features_only_pyramid():
    model = create_model("lemevit_tiny", features_only=True)
    variables, x = _init(model, (1, 64, 64, 3))
    feats = model.apply(variables, x)
    chans = FEATURE_CHANNELS["lemevit_tiny"]
    assert len(feats) == 4
    strides = [4, 8, 16, 32]
    for f, ch, s in zip(feats, chans, strides):
        assert f.shape == (1, 64 // s, 64 // s, ch)


@pytest.mark.parametrize("name", ["lemevit_tiny_v2", "vit_tiny"])
def test_variant_forward(name):
    model = create_model(name, num_classes=10)
    variables, x = _init(model, (2, 64, 64, 3))
    out = model.apply(variables, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_updates_batch_stats():
    model = create_model("lemevit_tiny", num_classes=10, drop_path_rate=0.1)
    variables, x = _init(model, (2, 64, 64, 3))
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert out.shape == (2, 10)
    # running means must move away from init zeros
    leaves = jax.tree.leaves(mutated["batch_stats"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_stage0_image_tokens_unchanged():
    """'C' block must leave image tokens untouched (ref lemevit.py:584-613)."""
    from lemevit_tpu.models.lemevit import LeMeBlock
    blk = LeMeBlock(dim=32, num_heads=2, attn_type="C")
    xb = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    cb = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    v = blk.init(jax.random.PRNGKey(2), xb, cb)
    x_out, c_out = blk.apply(v, xb, cb)
    np.testing.assert_array_equal(np.asarray(x_out), np.asarray(xb))
    assert not np.allclose(np.asarray(c_out), np.asarray(cb))


def test_remat_stage_matches_plain():
    kw = dict(num_classes=10)
    m1 = create_model("lemevit_tiny", **kw)
    m2 = create_model("lemevit_tiny", remat_stages=(3,), **kw)
    v1, x = _init(m1, (1, 64, 64, 3))
    out1 = m1.apply(v1, x)
    out2 = m2.apply(v1, x)  # same params, remat must be numerically identical
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.fast
def test_golden_logits_regression():
    """Fixed-seed micro model must reproduce committed golden logits —
    guards against accidental numerics drift in any layer."""
    import os
    golden = np.load(os.path.join(os.path.dirname(__file__),
                                  "golden_micro_logits.npy"))
    model = create_model("lemevit_micro", num_classes=7)
    x = jax.random.normal(jax.random.PRNGKey(42), (2, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(7), x)
    out = np.asarray(model.apply(v, x))
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("attn_type", ["S", "D", "C"])
def test_post_norm_and_layer_scale_paths(attn_type):
    """The pre_norm=False and layer-scale variants must run and differ from
    the default path (they exist for config parity; no released variant
    uses them)."""
    from lemevit_tpu.models.lemevit import LeMeBlock
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    base = LeMeBlock(dim=32, num_heads=2, attn_type=attn_type,
                     attn_backend="xla")
    v = base.init(jax.random.PRNGKey(2), x, c)
    out_pre = base.apply(v, x, c)

    post = LeMeBlock(dim=32, num_heads=2, attn_type=attn_type,
                     pre_norm=False, attn_backend="xla")
    vp = post.init(jax.random.PRNGKey(2), x, c)
    out_post = post.apply(vp, x, c)
    assert not np.allclose(np.asarray(out_post[1]), np.asarray(out_pre[1]))

    ls = LeMeBlock(dim=32, num_heads=2, attn_type=attn_type,
                   layer_scale_init_value=1e-2, attn_backend="xla")
    vl = ls.init(jax.random.PRNGKey(2), x, c)
    assert "gamma1" in vl["params"]
    out_ls = ls.apply(vl, x, c)
    assert np.isfinite(np.asarray(out_ls[1])).all()


def test_mlp_dwconv_variant():
    """mlp_dwconv=True applies a depthwise conv inside the image-token MLP
    (no released variant uses it; the meta branch cannot, matching the
    reference which would also fail there)."""
    from lemevit_tpu.core.layers import Mlp
    mlp = Mlp(16, 32, use_dwconv=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 16))
    v = mlp.init(jax.random.PRNGKey(1), x, (8, 8))
    out = mlp.apply(v, x, (8, 8))
    assert out.shape == (1, 64, 16)
