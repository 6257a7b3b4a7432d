"""PyTorch-checkpoint <-> flax parameter conversion for LeMeViT.

The reference trains with timm and stores checkpoints as dicts with any of
``model | state_dict | state_dict_ema`` keys and optional ``module.`` /
``backbone.`` prefixes (handled identically to
/root/reference/semantic_segmentation/mmseg/models/backbones/lemevit.py:850-872).

Torch parameter naming (from /root/reference/models/lemevit.py):
  downsample_layers.0.{0,1,3,4}.*   stem conv/bn/conv/bn
  downsample_layers.i.{0,1}.*       stage-i conv/bn (absent for Identity)
  meta_tokens
  meta_token_downsample.i.{0,1,3,4}.*  linear/ln/linear/ln
  stages.i.j.pos_embed.{weight,bias}
  stages.i.j.norm1|norm2.{weight,bias}
  stages.i.j.attn.{qkv|qkv1|qkv2|qv1|kv2|q|kv|proj|proj_x|proj_c}.*
  stages.i.j.mlp.{0,3}.{weight,bias}
  stages.i.j.gamma1|gamma2          (layer-scale variants only)
  norm.* (BatchNorm2d)  norm_c.* (LayerNorm)  head.*

Layout transforms: conv OIHW -> HWIO; linear (out,in) -> (in,out).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np


def _t(w):  # torch tensor / numpy -> numpy
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _conv(w):
    return np.transpose(_t(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _dwconv(w):
    # torch depthwise: (C, 1, kh, kw) -> flax grouped conv HWIO: (kh, kw, 1, C)
    return np.transpose(_t(w), (2, 3, 1, 0))


def _lin(w):
    return np.transpose(_t(w), (1, 0))  # (out,in) -> (in,out)


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Unwrap {model|state_dict|state_dict_ema} containers and strip
    module./backbone. prefixes.

    Container preference order matches the reference loaders (state_dict
    first): a checkpoint holding both plain and EMA weights yields the plain
    ones unless the caller explicitly re-wraps the EMA weights (see
    ``load_pretrained(use_ema=True)``)."""
    for key in ("state_dict", "state_dict_ema", "model"):
        if key in sd and isinstance(sd[key], Mapping):
            sd = sd[key]
            break
    out = {}
    for k, v in sd.items():
        for pref in ("module.", "backbone."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def _set(tree: Dict, path: Sequence[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_to_flax(state_dict: Mapping[str, Any], model) -> Dict[str, Dict]:
    """Convert a reference torch state_dict to {'params':..., 'batch_stats':...}
    for ``model`` (a lemevit_tpu LeMeViT instance)."""
    sd = strip_prefixes(state_dict)
    params: Dict = {}
    stats: Dict = {}
    attn_types = list(model.attn_type)
    num_stages = len(attn_types)

    def bn(src: str, dst: Sequence[str]):
        _set(params, list(dst) + ["scale"], _t(sd[f"{src}.weight"]))
        _set(params, list(dst) + ["bias"], _t(sd[f"{src}.bias"]))
        _set(stats, list(dst) + ["mean"], _t(sd[f"{src}.running_mean"]))
        _set(stats, list(dst) + ["var"], _t(sd[f"{src}.running_var"]))

    def conv(src: str, dst: Sequence[str], depthwise=False):
        w = _dwconv(sd[f"{src}.weight"]) if depthwise else _conv(sd[f"{src}.weight"])
        _set(params, list(dst) + ["kernel"], w)
        if f"{src}.bias" in sd:
            _set(params, list(dst) + ["bias"], _t(sd[f"{src}.bias"]))

    def lin(src: str, dst: Sequence[str]):
        _set(params, list(dst) + ["kernel"], _lin(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(params, list(dst) + ["bias"], _t(sd[f"{src}.bias"]))

    def ln(src: str, dst: Sequence[str]):
        _set(params, list(dst) + ["scale"], _t(sd[f"{src}.weight"]))
        _set(params, list(dst) + ["bias"], _t(sd[f"{src}.bias"]))

    # stem
    conv("downsample_layers.0.0", ["stem", "conv1", "conv"])
    bn("downsample_layers.0.1", ["stem", "conv1", "bn"])
    conv("downsample_layers.0.3", ["stem", "conv2", "conv"])
    bn("downsample_layers.0.4", ["stem", "conv2", "bn"])
    # stage downsamples (Identity after a "C" stage -> no torch params)
    for i in range(1, num_stages):
        if attn_types[i - 1] == "C":
            continue
        conv(f"downsample_layers.{i}.0", [f"downsample{i}", "conv"])
        bn(f"downsample_layers.{i}.1", [f"downsample{i}", "bn"])

    params["meta_tokens"] = _t(sd["meta_tokens"])
    for i in range(num_stages):
        base = f"meta_token_downsample.{i}"
        dst = f"meta_downsample{i}"
        lin(f"{base}.0", [dst, "fc1"])
        ln(f"{base}.1", [dst, "ln1"])
        lin(f"{base}.3", [dst, "fc2"])
        ln(f"{base}.4", [dst, "ln2"])

    attn_keys = {
        "S": ["qkv", "proj"],
        "C": ["q", "kv", "proj"],
        "D": ["qkv1", "qkv2", "proj_x", "proj_c"],
        "D2": ["qv1", "kv2", "proj_x", "proj_c"],
    }
    for i in range(num_stages):
        for j in range(model.depth[i]):
            tsrc = f"stages.{i}.{j}"
            blk = f"stage{i}_block{j}"
            if f"{tsrc}.pos_embed.weight" in sd:
                conv(f"{tsrc}.pos_embed", [blk, "pos_embed", "dwconv"],
                     depthwise=True)
            ln(f"{tsrc}.norm1", [blk, "norm1"])
            ln(f"{tsrc}.norm2", [blk, "norm2"])
            for ak in attn_keys[attn_types[i]]:
                lin(f"{tsrc}.attn.{ak}", [blk, "attn", ak])
            lin(f"{tsrc}.mlp.0", [blk, "mlp", "fc1"])
            lin(f"{tsrc}.mlp.3", [blk, "mlp", "fc2"])
            for g in ("gamma1", "gamma2"):
                if f"{tsrc}.{g}" in sd:
                    _set(params, [blk, g], _t(sd[f"{tsrc}.{g}"]))

    if not model.features_only:
        if "norm.weight" in sd:
            bn("norm", ["norm"])
            ln("norm_c", ["norm_c"])
        if "head.weight" in sd and model.num_classes > 0:
            lin("head", ["head"])

    return {"params": params, "batch_stats": stats}


def flax_to_torch(variables: Mapping[str, Any], model) -> Dict[str, np.ndarray]:
    """Export flax variables to a reference-named torch-layout state_dict
    (numpy arrays; caller may wrap in torch tensors)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    attn_types = list(model.attn_type)
    num_stages = len(attn_types)

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    def put_conv(dst, path, depthwise=False):
        w = get(params, path + ["kernel"])
        sd[f"{dst}.weight"] = np.transpose(w, (3, 2, 0, 1))
        if "bias" in _subtree(params, path):
            sd[f"{dst}.bias"] = get(params, path + ["bias"])

    def _subtree(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    def put_bn(dst, path):
        sd[f"{dst}.weight"] = get(params, path + ["scale"])
        sd[f"{dst}.bias"] = get(params, path + ["bias"])
        sd[f"{dst}.running_mean"] = get(stats, path + ["mean"])
        sd[f"{dst}.running_var"] = get(stats, path + ["var"])

    def put_lin(dst, path):
        sd[f"{dst}.weight"] = np.transpose(get(params, path + ["kernel"]))
        sd[f"{dst}.bias"] = get(params, path + ["bias"])

    def put_ln(dst, path):
        sd[f"{dst}.weight"] = get(params, path + ["scale"])
        sd[f"{dst}.bias"] = get(params, path + ["bias"])

    put_conv("downsample_layers.0.0", ["stem", "conv1", "conv"])
    put_bn("downsample_layers.0.1", ["stem", "conv1", "bn"])
    put_conv("downsample_layers.0.3", ["stem", "conv2", "conv"])
    put_bn("downsample_layers.0.4", ["stem", "conv2", "bn"])
    for i in range(1, num_stages):
        if attn_types[i - 1] == "C":
            continue
        put_conv(f"downsample_layers.{i}.0", [f"downsample{i}", "conv"])
        put_bn(f"downsample_layers.{i}.1", [f"downsample{i}", "bn"])

    sd["meta_tokens"] = np.asarray(params["meta_tokens"])
    for i in range(num_stages):
        dst = f"meta_token_downsample.{i}"
        src = f"meta_downsample{i}"
        put_lin(f"{dst}.0", [src, "fc1"])
        put_ln(f"{dst}.1", [src, "ln1"])
        put_lin(f"{dst}.3", [src, "fc2"])
        put_ln(f"{dst}.4", [src, "ln2"])

    attn_keys = {
        "S": ["qkv", "proj"],
        "C": ["q", "kv", "proj"],
        "D": ["qkv1", "qkv2", "proj_x", "proj_c"],
        "D2": ["qv1", "kv2", "proj_x", "proj_c"],
    }
    for i in range(num_stages):
        for j in range(model.depth[i]):
            tdst = f"stages.{i}.{j}"
            blk = params[f"stage{i}_block{j}"]
            if "pos_embed" in blk:
                put_conv(f"{tdst}.pos_embed",
                         [f"stage{i}_block{j}", "pos_embed", "dwconv"],
                         depthwise=True)
            put_ln(f"{tdst}.norm1", [f"stage{i}_block{j}", "norm1"])
            put_ln(f"{tdst}.norm2", [f"stage{i}_block{j}", "norm2"])
            for ak in attn_keys[attn_types[i]]:
                put_lin(f"{tdst}.attn.{ak}", [f"stage{i}_block{j}", "attn", ak])
            put_lin(f"{tdst}.mlp.0", [f"stage{i}_block{j}", "mlp", "fc1"])
            put_lin(f"{tdst}.mlp.3", [f"stage{i}_block{j}", "mlp", "fc2"])
            for g in ("gamma1", "gamma2"):
                if g in blk:
                    sd[f"{tdst}.{g}"] = np.asarray(blk[g])

    if not model.features_only and "norm" in params:
        put_bn("norm", ["norm"])
        put_ln("norm_c", ["norm_c"])
        if "head" in params:
            put_lin("head", ["head"])
    return sd
