"""fp32 numerics parity: flax model + converter vs the pure-torch oracle.

This is the test that guards "reproduce reference checkpoints" (BASELINE.json
north star): a reference-named torch state_dict is converted with
models/convert.py and must produce identical logits (fp32 tolerance) to a
direct torch-functional evaluation of the same weights.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lemevit_tpu.models import LeMeViT
from lemevit_tpu.models.convert import flax_to_torch, torch_to_flax

from tests import torch_oracle

pytestmark = pytest.mark.fast


MICRO_CFG = dict(
    depth=(1, 1, 1, 2, 1),
    embed_dim=(16, 16, 32, 32, 64),
    head_dim=8,
    mlp_ratios=(2, 2, 2, 2, 2),
    attn_type=("C", "D", "D", "S", "S"),
    queries_len=4,
    num_classes=7,
)

MICRO_CFG_D2 = dict(
    depth=(1, 1, 1, 1, 1),
    embed_dim=(16, 16, 32, 32, 64),
    head_dim=8,
    mlp_ratios=(2, 2, 2, 2, 2),
    attn_type=("C", "D2", "D2", "S", "S"),
    queries_len=4,
    num_classes=5,
)


def _run_parity(cfg, img=32, batch=2, features_only=False):
    sd = torch_oracle.make_state_dict(cfg, seed=3)
    x_np = np.random.RandomState(0).rand(batch, img, img, 3).astype(np.float32)

    with torch.no_grad():
        ref = torch_oracle.forward(
            sd, cfg, torch.from_numpy(x_np).permute(0, 3, 1, 2),
            features_only=features_only)

    model = LeMeViT(**cfg, attn_backend="xla", features_only=features_only)
    variables = torch_to_flax(sd, model)
    variables = jax.tree.map(jnp.asarray, variables)
    out = model.apply(variables, jnp.asarray(x_np))

    if features_only:
        assert len(out) == len(ref)
        for o, r in zip(out, ref):
            r = r.permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC
            np.testing.assert_allclose(np.asarray(o), r, rtol=2e-4, atol=2e-4)
    else:
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_full_model_parity_cdss():
    _run_parity(MICRO_CFG)


def test_full_model_parity_d2():
    _run_parity(MICRO_CFG_D2)


def test_feature_pyramid_parity():
    cfg = dict(MICRO_CFG)
    del cfg["num_classes"]
    cfg["num_classes"] = 0
    _run_parity(cfg, features_only=True)


def test_converter_roundtrip():
    cfg = MICRO_CFG
    sd = torch_oracle.make_state_dict(cfg, seed=5)
    model = LeMeViT(**cfg)
    variables = torch_to_flax(sd, model)
    sd2 = flax_to_torch(variables, model)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k].numpy(), rtol=0, atol=0,
                                   err_msg=k)


def test_prefix_stripping():
    from lemevit_tpu.models.convert import strip_prefixes
    sd = {"model": {"module.head.weight": 1, "backbone.norm.bias": 2}}
    out = strip_prefixes(sd)
    assert out == {"head.weight": 1, "norm.bias": 2}
    # checkpoints carrying both plain and EMA weights must yield the plain
    # ones (reference loader order; --use-ema re-wraps explicitly)
    both = {"state_dict": {"w": "plain"}, "state_dict_ema": {"w": "ema"}}
    assert strip_prefixes(both) == {"w": "plain"}
