"""Plugin layer tests: ContextBlock, NonLocal2D, GeneralizedAttention,
NAS-FPN cells, registry."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu.ops import (ContextBlock, GeneralizedAttention,
                             GlobalPoolingCell, NonLocal2D, SumCell,
                             build_plugin_layer)

pytestmark = pytest.mark.fast


def _run(mod, *args, **kwargs):
    v = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    return mod.apply(v, *args, **kwargs)


def test_context_block_shapes_and_identity_at_init():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    out = _run(ContextBlock(16, fusion_types=("channel_add",)), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = _run(ContextBlock(16, pooling_type="avg",
                             fusion_types=("channel_add", "channel_mul")), x)
    assert out2.shape == x.shape


def test_nonlocal_residual_at_init():
    # conv_out is zero-init -> block is identity at init (standard NL trick)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 6, 8))
    out = _run(NonLocal2D(8), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    out2 = _run(NonLocal2D(8, mode="dot_product", sub_sample=True), x)
    assert out2.shape == x.shape


def test_generalized_attention():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 18))
    out = _run(GeneralizedAttention(18, num_heads=3, kv_stride=2), x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_merge_cells():
    a = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 8))
    b = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 8))
    out = _run(SumCell(8), a, b)
    assert out.shape == (1, 8, 8, 8)
    out2 = _run(GlobalPoolingCell(8), a, b, (4, 4))
    assert out2.shape == (1, 4, 4, 8)


def test_plugin_registry():
    name, mod = build_plugin_layer(dict(type="ContextBlock", in_channels=8))
    assert name == "contextblock"
    x = jnp.ones((1, 4, 4, 8))
    assert _run(mod, x).shape == x.shape
    with pytest.raises(KeyError):
        build_plugin_layer(dict(type="NopeBlock"))
