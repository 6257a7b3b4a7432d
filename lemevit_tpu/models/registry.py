"""Model registry + factory functions (timm-style names).

Variant hyperparameters mirror /root/reference/models/lemevit.py:845-1023:
tiny (:846), small (:876), base (:906), small_v2 (:936), tiny_v2 (:966),
vit_tiny (:997). All released variants use 16 meta tokens and head_dim 32.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from lemevit_tpu.models.lemevit import LeMeViT

_REGISTRY: Dict[str, Callable[..., LeMeViT]] = {}

_VARIANT_CFGS: Dict[str, Dict[str, Any]] = {
    "lemevit_tiny": dict(
        depth=(1, 2, 2, 8, 2), embed_dim=(64, 64, 128, 192, 320),
        head_dim=32, mlp_ratios=(4, 4, 4, 4, 4),
        attn_type=("C", "D", "D", "S", "S"), queries_len=16),
    "lemevit_small": dict(
        depth=(1, 2, 2, 6, 2), embed_dim=(96, 96, 192, 320, 384),
        head_dim=32, mlp_ratios=(4, 4, 4, 4, 4),
        attn_type=("C", "D", "D", "S", "S"), queries_len=16),
    "lemevit_base": dict(
        depth=(2, 4, 4, 18, 4), embed_dim=(96, 96, 192, 384, 512),
        head_dim=32, mlp_ratios=(4, 4, 4, 4, 4),
        attn_type=("C", "D", "D", "S", "S"), queries_len=16),
    "lemevit_small_v2": dict(
        depth=(1, 2, 2, 8, 2), embed_dim=(64, 64, 128, 256, 512),
        head_dim=32, mlp_ratios=(3, 3, 3, 3, 3),
        attn_type=("C", "D", "D", "S", "S"), queries_len=16),
    "lemevit_tiny_v2": dict(
        depth=(2, 2, 2, 4, 2), embed_dim=(96, 96, 192, 320, 384),
        head_dim=32, mlp_ratios=(4, 4, 4, 4, 4),
        attn_type=("C", "D2", "D2", "S", "S"), queries_len=16),
    "vit_tiny": dict(
        depth=(2, 2, 4, 2), embed_dim=(96, 192, 320, 384),
        head_dim=32, mlp_ratios=(4, 4, 4, 4),
        attn_type=("S", "S", "S", "S"), queries_len=16),
    # test/smoke-only micro config (not a reference variant)
    "lemevit_micro": dict(
        depth=(1, 1, 1, 1, 1), embed_dim=(16, 16, 32, 32, 32),
        head_dim=8, mlp_ratios=(2, 2, 2, 2, 2),
        attn_type=("C", "D", "D", "S", "S"), queries_len=4),
}

# feature-pyramid channels consumed by downstream heads (stages 1..4)
FEATURE_CHANNELS = {
    name: tuple(cfg["embed_dim"][1:])
    for name, cfg in _VARIANT_CFGS.items()
}


def register_model(fn):
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models():
    return sorted(_REGISTRY)


def variant_config(name: str) -> Dict[str, Any]:
    if name not in _VARIANT_CFGS:
        raise KeyError(f"unknown model {name!r}; known: {list_models()}")
    return dict(_VARIANT_CFGS[name])


def create_model(name: str, **kwargs) -> LeMeViT:
    """timm-style entry point: create_model('lemevit_tiny', num_classes=1000)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {list_models()}")
    return _REGISTRY[name](**kwargs)


def _make(name: str, **kwargs) -> LeMeViT:
    cfg = variant_config(name)
    cfg.update(kwargs)
    return LeMeViT(**cfg)


@register_model
def lemevit_tiny(**kwargs) -> LeMeViT:
    return _make("lemevit_tiny", **kwargs)


@register_model
def lemevit_small(**kwargs) -> LeMeViT:
    return _make("lemevit_small", **kwargs)


@register_model
def lemevit_base(**kwargs) -> LeMeViT:
    return _make("lemevit_base", **kwargs)


@register_model
def lemevit_small_v2(**kwargs) -> LeMeViT:
    return _make("lemevit_small_v2", **kwargs)


@register_model
def lemevit_tiny_v2(**kwargs) -> LeMeViT:
    return _make("lemevit_tiny_v2", **kwargs)


@register_model
def vit_tiny(**kwargs) -> LeMeViT:
    return _make("vit_tiny", **kwargs)


@register_model
def lemevit_micro(**kwargs) -> LeMeViT:
    return _make("lemevit_micro", **kwargs)


# alternative backbones (CD vertical choices: resnet / swin / lemevit,
# cf. change_detection/models/networks.py:331-371)

@register_model
def resnet18(**kwargs):
    from lemevit_tpu.models.resnet import resnet18 as f
    return f(**kwargs)


@register_model
def resnet34(**kwargs):
    from lemevit_tpu.models.resnet import resnet34 as f
    return f(**kwargs)


@register_model
def resnet50(**kwargs):
    from lemevit_tpu.models.resnet import resnet50 as f
    return f(**kwargs)


@register_model
def swin_tiny(**kwargs):
    from lemevit_tpu.models.swin import swin_tiny as f
    return f(**kwargs)
