"""Pallas kernel tests (interpret mode on CPU) vs the XLA reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lemevit_tpu.attn import pallas_dca
from lemevit_tpu.attn import reference as ref


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_dca, "_INTERPRET", True)


def _make(b=2, n=256, m=16, h=2, d=32, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    mk = lambda k, nn: jax.random.normal(k, (b, nn, h, d), dtype)
    return (mk(ks[0], n), mk(ks[1], n), mk(ks[2], n),
            mk(ks[3], m), mk(ks[4], m), mk(ks[5], m))


def test_dca_matches_xla_fp32():
    q1, k1, v1, q2, k2, v2 = _make()
    sx, sc = ref.dca_scales(256, 16, 64)
    out = pallas_dca.dca(q1, k1, v1, q2, k2, v2, scale_x=sx, scale_c=sc)
    assert out is not None
    xo, co = out
    xr = ref.sdpa_bnhd(q1, k2, v2, scale=sx)
    cr = ref.sdpa_bnhd(q2, k1, v1, scale=sc)
    np.testing.assert_allclose(np.asarray(xo), np.asarray(xr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(co), np.asarray(cr),
                               rtol=1e-5, atol=1e-5)


def test_dca_multi_tile_online_softmax():
    # N = 512 -> 2+ tiles: exercises the online accumulation path
    q1, k1, v1, q2, k2, v2 = _make(n=512, seed=3)
    sx, sc = ref.dca_scales(512, 16, 64)
    xo, co = pallas_dca.dca(q1, k1, v1, q2, k2, v2, scale_x=sx, scale_c=sc)
    cr = ref.sdpa_bnhd(q2, k1, v1, scale=sc)
    np.testing.assert_allclose(np.asarray(co), np.asarray(cr),
                               rtol=1e-5, atol=1e-5)


def test_dca_bf16_tolerance():
    q1, k1, v1, q2, k2, v2 = _make(dtype=jnp.bfloat16, seed=1)
    sx, sc = ref.dca_scales(256, 16, 64)
    xo, co = pallas_dca.dca(q1, k1, v1, q2, k2, v2, scale_x=sx, scale_c=sc)
    xr = ref.sdpa_bnhd(q1, k2, v2, scale=sx)
    np.testing.assert_allclose(
        np.asarray(xo, np.float32), np.asarray(xr, np.float32),
        rtol=2e-2, atol=2e-2)


def test_dca_grad_matches_xla():
    q1, k1, v1, q2, k2, v2 = _make(n=128, seed=2)
    sx, sc = ref.dca_scales(128, 16, 64)

    def loss_pallas(*args):
        xo, co = pallas_dca.dca(*args, scale_x=sx, scale_c=sc)
        return (xo ** 2).sum() + (co ** 2).sum()

    def loss_xla(q1, k1, v1, q2, k2, v2):
        xo = ref.sdpa_bnhd(q1, k2, v2, scale=sx)
        co = ref.sdpa_bnhd(q2, k1, v1, scale=sc)
        return (xo ** 2).sum() + (co ** 2).sum()

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(
        q1, k1, v1, q2, k2, v2)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(
        q1, k1, v1, q2, k2, v2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dca_rejects_bad_shapes():
    q1, k1, v1, q2, k2, v2 = _make(n=200)  # 200 not tileable
    assert pallas_dca.dca(q1, k1, v1, q2, k2, v2,
                          scale_x=0.1, scale_c=0.1) is None
