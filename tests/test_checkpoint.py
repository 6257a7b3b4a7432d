"""Checkpoint tests: orbax save/restore roundtrip, top-k retention,
auto-resume, torch .pth ingestion via load_pretrained."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lemevit_tpu.models import create_model
from lemevit_tpu.train import build_optimizer, create_train_state
from lemevit_tpu.train.checkpoint import (auto_resume, latest_checkpoint,
                                          load_pretrained,
                                          restore_checkpoint,
                                          save_checkpoint)

from tests import torch_oracle

pytestmark = pytest.mark.fast


def _state(seed=0):
    model = create_model("lemevit_micro", num_classes=3)
    tx = build_optimizer(1e-3)
    return create_train_state(model, jax.random.PRNGKey(seed),
                              (1, 32, 32, 3), tx, ema_decay=0.99)


def test_save_restore_roundtrip(tmp_path):
    state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = save_checkpoint(str(tmp_path), state, metric=0.5)
    assert os.path.isdir(path)
    fresh = _state(seed=1)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.ema_params),
                    jax.tree.leaves(restored.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_topk_retention_and_auto_resume(tmp_path):
    state = _state()
    for step, metric in [(1, 0.1), (2, 0.9), (3, 0.5), (4, 0.2)]:
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        save_checkpoint(str(tmp_path), state, metric=metric, max_history=2)
    kept = sorted(d for d in os.listdir(tmp_path)
                  if d.startswith("checkpoint-"))
    assert kept == ["checkpoint-2", "checkpoint-3"]  # top-2 by metric
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-3")
    fresh = _state(seed=2)
    restored, ok = auto_resume(str(tmp_path), fresh)
    assert ok and int(restored.step) == 3
    # no checkpoints -> no-op
    _, ok2 = auto_resume(str(tmp_path / "empty"), fresh)
    assert not ok2


def test_load_pretrained_torch_file(tmp_path):
    cfg = dict(depth=(1, 1, 1, 1, 1), embed_dim=(16, 16, 32, 32, 32),
               head_dim=8, mlp_ratios=(2, 2, 2, 2, 2),
               attn_type=("C", "D", "D", "S", "S"), queries_len=4,
               num_classes=3)
    sd = torch_oracle.make_state_dict(cfg, seed=7)
    # wrap the way timm checkpoints are stored, with module. prefixes
    ckpt = {"state_dict": {f"module.{k}": v for k, v in sd.items()},
            "epoch": 12}
    path = tmp_path / "weights.pth"
    torch.save(ckpt, str(path))

    from lemevit_tpu.models.lemevit import LeMeViT
    model = LeMeViT(**cfg)
    variables = load_pretrained(model, str(path))
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ref = torch_oracle.forward(
            sd, cfg, torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-4, atol=2e-4)
