"""Checkpointing: orbax for native state, torch .pth ingestion via the
converter, rolling top-k retention.

Replaces timm CheckpointSaver + resume_checkpoint + auto_load_model
(/root/reference/main.py:298-309,491-501, utils/__init__.py:374-434):
  - save_checkpoint(dir, state, step, metric): orbax save + keep best-k
  - restore / auto_resume: newest checkpoint-* dir wins
  - load_pretrained: torch .pth/.tar (any of model|state_dict|state_dict_ema
    keys, module./backbone. prefixes) or a native orbax dir or .npz
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    HAS_ORBAX = True
except ImportError:  # pragma: no cover
    HAS_ORBAX = False


def _ckpt_name(step: int) -> str:
    return f"checkpoint-{step}"


def save_checkpoint(ckpt_dir: str, state, *, metric: Optional[float] = None,
                    max_history: int = 3) -> str:
    """Save {params, batch_stats, opt_state, ema_params, step} + metadata."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    path = os.path.join(ckpt_dir, _ckpt_name(step))
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)
        ckptr.wait_until_finished()
    else:  # fallback: flat npz
        flat = jax.tree_util.tree_flatten_with_path(payload)[0]
        np.savez(path + ".npz", **{
            jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    meta_path = os.path.join(ckpt_dir, "checkpoints.json")
    meta = []
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.append({"step": step, "metric": metric, "path": path})
    # retain top-k by metric (fall back to recency)
    keyfn = (lambda m: (m["metric"] if m["metric"] is not None else -1e30,
                        m["step"]))
    keep = sorted(meta, key=keyfn, reverse=True)[:max_history]
    for m in meta:
        if m not in keep and os.path.exists(m["path"]):
            shutil.rmtree(m["path"], ignore_errors=True)
    with open(meta_path, "w") as f:
        json.dump(keep, f, indent=1)
    return path


def save_recovery(ckpt_dir: str, state) -> str:
    """Mid-epoch recovery checkpoint: ONE rolling slot, overwritten each
    save (reference engine.py:160-162 --recovery-interval semantics) —
    cheap enough to write every N steps without growing the directory."""
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    path = os.path.join(ckpt_dir, "recovery")
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if HAS_ORBAX:
        tmp = path + ".tmp"
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(tmp), payload, force=True)
        ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
    else:  # pragma: no cover - orbax is baked into the image
        flat = jax.tree_util.tree_flatten_with_path(payload)[0]
        np.savez(path + ".npz", **{
            jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
    with open(os.path.join(ckpt_dir, "recovery.json"), "w") as f:
        json.dump({"step": step}, f)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best[1] if best else None


def restore_checkpoint(path: str, state):
    """Restore a TrainState from an orbax checkpoint dir."""
    if not HAS_ORBAX:
        raise RuntimeError("orbax unavailable")
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.ema_params is not None:
        target["ema_params"] = state.ema_params
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        ema_params=restored.get("ema_params", state.ema_params),
    )


def auto_resume(ckpt_dir: str, state):
    """Resume from the newest of: epoch checkpoints and the mid-epoch
    recovery slot (whichever has the larger step)."""
    path = latest_checkpoint(ckpt_dir)
    best_step = -1
    if path is not None:
        best_step = int(re.search(r"checkpoint-(\d+)$", path).group(1))
    rec_meta = os.path.join(ckpt_dir, "recovery.json")
    rec_path = os.path.join(ckpt_dir, "recovery")
    if os.path.exists(rec_meta) and os.path.isdir(rec_path):
        with open(rec_meta) as f:
            rec_step = int(json.load(f)["step"])
        if rec_step > best_step:
            path, best_step = rec_path, rec_step
    if path is None:
        return state, False
    return restore_checkpoint(path, state), True


def load_pretrained(model, path: str, use_ema: bool = False
                    ) -> Dict[str, Any]:
    """Load pretrained weights for ``model`` from a torch .pth/.pth.tar
    (converted on the fly) or an orbax checkpoint dir. Returns variables
    {'params':..., 'batch_stats':...}."""
    from lemevit_tpu.models.convert import strip_prefixes, torch_to_flax

    if os.path.isdir(path):  # orbax
        if not HAS_ORBAX:
            raise RuntimeError("orbax unavailable")
        import jax.numpy as jnp
        ex = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32))
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path),
            {"params": ex["params"],
             "batch_stats": ex.get("batch_stats", {})})
        return restored
    # torch checkpoint
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if use_ema and isinstance(ckpt, dict) and "state_dict_ema" in ckpt:
        ckpt = {"state_dict": ckpt["state_dict_ema"]}
    sd = strip_prefixes(ckpt if isinstance(ckpt, dict) else ckpt.state_dict())
    return torch_to_flax(sd, model)
