"""Pure-functional torch oracle for LeMeViT numerics.

Interprets a reference-named state_dict directly with torch.nn.functional —
no nn.Module graph — to produce ground-truth outputs for parity tests of the
flax model + checkpoint converter. Written from the architecture semantics
(documented in SURVEY.md §2.1 with /root/reference/models/lemevit.py line
citations); this is an independent test fixture, not a copy of the reference.

Eval-mode only (BN running stats, no dropout/droppath).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence

import torch
import torch.nn.functional as F


# ---------------------------------------------------------------- primitives

def _lin(sd, p, x):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias"))


def _ln(sd, p, x, eps):
    return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"], sd[f"{p}.bias"],
                        eps)


def _conv_bn(sd, pc, pb, x, stride, groups=1):
    x = F.conv2d(x, sd[f"{pc}.weight"], sd.get(f"{pc}.bias"),
                 stride=stride, padding=1, groups=groups)
    x = F.batch_norm(x, sd[f"{pb}.running_mean"], sd[f"{pb}.running_var"],
                     sd[f"{pb}.weight"], sd[f"{pb}.bias"], training=False,
                     eps=1e-5)
    return x


def _sdpa(q, k, v, scale):
    attn = (q @ k.transpose(-1, -2)) * scale
    return attn.softmax(dim=-1) @ v


def _heads(t, h):
    b, n, c = t.shape
    return t.reshape(b, n, h, c // h).permute(0, 2, 1, 3)


def _unheads(t):
    b, h, n, d = t.shape
    return t.permute(0, 2, 1, 3).reshape(b, n, h * d)


# ---------------------------------------------------------------- attention

def _attn(sd, p, attn_type, x, c, num_heads):
    """x: (B,N,C) tokens, c: (B,M,C). Returns (x_delta_or_None, c_delta)."""
    C = (x if x is not None else c).shape[-1]
    hd = C // num_heads
    if attn_type == "S":
        t = x
        qkv = _lin(sd, f"{p}.qkv", t)
        q, k, v = (_heads(u, num_heads) for u in qkv.chunk(3, dim=-1))
        out = _unheads(_sdpa(q, k, v, hd ** -0.5))
        return _lin(sd, f"{p}.proj", out), None
    if attn_type == "C":
        q = _heads(_lin(sd, f"{p}.q", c), num_heads)
        kv = _lin(sd, f"{p}.kv", x)
        k, v = (_heads(u, num_heads) for u in kv.chunk(2, dim=-1))
        out = _unheads(_sdpa(q, k, v, hd ** -0.5))
        return None, _lin(sd, f"{p}.proj", out)
    N, M = x.shape[1], c.shape[1]
    scale_x = math.log(M, N) * C ** -0.5
    scale_c = C ** -0.5
    if attn_type == "D":
        qkv1 = _lin(sd, f"{p}.qkv1", x)
        q1, k1, v1 = (_heads(u, num_heads) for u in qkv1.chunk(3, dim=-1))
        qkv2 = _lin(sd, f"{p}.qkv2", c)
        q2, k2, v2 = (_heads(u, num_heads) for u in qkv2.chunk(3, dim=-1))
        xo = _unheads(_sdpa(q1, k2, v2, scale_x))
        co = _unheads(_sdpa(q2, k1, v1, scale_c))
    else:  # D2
        qv1 = _lin(sd, f"{p}.qv1", x)
        q, v1 = (_heads(u, num_heads) for u in qv1.chunk(2, dim=-1))
        kv2 = _lin(sd, f"{p}.kv2", c)
        k, v2 = (_heads(u, num_heads) for u in kv2.chunk(2, dim=-1))
        xo = _unheads(_sdpa(q, k, v2, scale_x))
        co = _unheads(_sdpa(k, q, v1, scale_c))
    return _lin(sd, f"{p}.proj_x", xo), _lin(sd, f"{p}.proj_c", co)


# ---------------------------------------------------------------- block

def _mlp(sd, p, t):
    return _lin(sd, f"{p}.3", F.gelu(_lin(sd, f"{p}.0", t)))


def _block(sd, p, attn_type, x, c, num_heads):
    """x: NCHW map, c: (B,M,C). Pre-norm, no layer-scale, eval mode."""
    B, C, H, W = x.shape
    dim = C
    xt = x + F.conv2d(x, sd[f"{p}.pos_embed.weight"],
                      sd[f"{p}.pos_embed.bias"], padding=1, groups=dim)
    xt = xt.flatten(2).transpose(1, 2)  # (B,N,C)
    n1 = lambda t: _ln(sd, f"{p}.norm1", t, 1e-6)
    n2 = lambda t: _ln(sd, f"{p}.norm2", t, 1e-6)
    if attn_type in ("D", "D2"):
        ax, ac = _attn(sd, f"{p}.attn", attn_type, n1(xt), n1(c), num_heads)
        xt = xt + ax
        xt = xt + _mlp(sd, f"{p}.mlp", n2(xt))
        c = c + ac
        c = c + _mlp(sd, f"{p}.mlp", n2(c))
        x = xt.transpose(1, 2).reshape(B, C, H, W)
    elif attn_type == "C":
        _, ac = _attn(sd, f"{p}.attn", "C", n1(xt), n1(c), num_heads)
        c = c + ac
        c = c + _mlp(sd, f"{p}.mlp", n2(c))
        # x returned unchanged (pre-CPE input)
    else:  # "S"
        ax, _ = _attn(sd, f"{p}.attn", "S", n1(xt), None, num_heads)
        xt = xt + ax
        xt = xt + _mlp(sd, f"{p}.mlp", n2(xt))
        ac, _ = _attn(sd, f"{p}.attn", "S", n1(c), None, num_heads)
        c = c + ac
        c = c + _mlp(sd, f"{p}.mlp", n2(c))
        x = xt.transpose(1, 2).reshape(B, C, H, W)
    return x, c


# ---------------------------------------------------------------- model

def forward(sd: Dict[str, torch.Tensor], cfg: dict, x: torch.Tensor,
            features_only: bool = False):
    """Full eval-mode forward. x: NCHW float32. cfg keys: depth, embed_dim,
    head_dim, attn_type, queries_len, num_classes."""
    depth, dims = cfg["depth"], cfg["embed_dim"]
    attn_types = cfg["attn_type"]
    nheads = [d // cfg["head_dim"] for d in dims]
    B = x.shape[0]
    c = sd["meta_tokens"].unsqueeze(0).expand(B, -1, -1)
    feats = []
    for i in range(len(attn_types)):
        if i == 0:
            x = _conv_bn(sd, "downsample_layers.0.0", "downsample_layers.0.1",
                         x, 2)
            x = F.gelu(x)
            x = _conv_bn(sd, "downsample_layers.0.3", "downsample_layers.0.4",
                         x, 2)
        elif attn_types[i - 1] != "C":
            x = _conv_bn(sd, f"downsample_layers.{i}.0",
                         f"downsample_layers.{i}.1", x, 2)
        mp = f"meta_token_downsample.{i}"
        c = _ln(sd, f"{mp}.1", _lin(sd, f"{mp}.0", c), 1e-5)
        c = _ln(sd, f"{mp}.4", _lin(sd, f"{mp}.3", F.gelu(c)), 1e-5)
        for j in range(depth[i]):
            x, c = _block(sd, f"stages.{i}.{j}", attn_types[i], x, c,
                          nheads[i])
        if features_only and i > 0:
            feats.append(x)
    if features_only:
        return feats
    x = F.batch_norm(x, sd["norm.running_mean"], sd["norm.running_var"],
                     sd["norm.weight"], sd["norm.bias"], training=False,
                     eps=1e-5)
    c = _ln(sd, "norm_c", c, 1e-5)
    pooled = x.flatten(2).mean(-1) + c.mean(1)
    return _lin(sd, "head", pooled)


# ---------------------------------------------------------------- fixtures

def make_state_dict(cfg: dict, seed: int = 0) -> Dict[str, torch.Tensor]:
    """Random reference-named state_dict for cfg (eval-mode keys only)."""
    g = torch.Generator().manual_seed(seed)
    sd: Dict[str, torch.Tensor] = {}

    def t(*shape, scale=0.1):
        return torch.randn(*shape, generator=g) * scale

    def add_conv(p, cin, cout, k=3, groups=1):
        sd[f"{p}.weight"] = t(cout, cin // groups, k, k)
        sd[f"{p}.bias"] = t(cout)

    def add_bn(p, ch):
        sd[f"{p}.weight"] = 1.0 + t(ch)
        sd[f"{p}.bias"] = t(ch)
        sd[f"{p}.running_mean"] = t(ch)
        sd[f"{p}.running_var"] = (1.0 + t(ch)).abs() + 0.1

    def add_lin(p, cin, cout):
        sd[f"{p}.weight"] = t(cout, cin)
        sd[f"{p}.bias"] = t(cout)

    def add_ln(p, ch):
        sd[f"{p}.weight"] = 1.0 + t(ch)
        sd[f"{p}.bias"] = t(ch)

    depth, dims = cfg["depth"], cfg["embed_dim"]
    attn_types = cfg["attn_type"]
    mlp_ratios = cfg.get("mlp_ratios", [4] * len(dims))
    add_conv("downsample_layers.0.0", 3, dims[0] // 2)
    add_bn("downsample_layers.0.1", dims[0] // 2)
    add_conv("downsample_layers.0.3", dims[0] // 2, dims[0])
    add_bn("downsample_layers.0.4", dims[0])
    for i in range(1, len(attn_types)):
        if attn_types[i - 1] == "C":
            continue
        add_conv(f"downsample_layers.{i}.0", dims[i - 1], dims[i])
        add_bn(f"downsample_layers.{i}.1", dims[i])

    sd["meta_tokens"] = t(cfg["queries_len"], dims[0], scale=1.0)
    for i in range(len(attn_types)):
        din = dims[i - 1] if i > 0 else dims[0]
        p = f"meta_token_downsample.{i}"
        add_lin(f"{p}.0", din, din * 4)
        add_ln(f"{p}.1", din * 4)
        add_lin(f"{p}.3", din * 4, dims[i])
        add_ln(f"{p}.4", dims[i])

    for i, at in enumerate(attn_types):
        for j in range(depth[i]):
            p = f"stages.{i}.{j}"
            d = dims[i]
            add_conv(f"{p}.pos_embed", d, d, groups=d)
            add_ln(f"{p}.norm1", d)
            add_ln(f"{p}.norm2", d)
            a = f"{p}.attn"
            if at == "S":
                add_lin(f"{a}.qkv", d, 3 * d)
                add_lin(f"{a}.proj", d, d)
            elif at == "C":
                add_lin(f"{a}.q", d, d)
                add_lin(f"{a}.kv", d, 2 * d)
                add_lin(f"{a}.proj", d, d)
            elif at == "D":
                add_lin(f"{a}.qkv1", d, 3 * d)
                add_lin(f"{a}.qkv2", d, 3 * d)
                add_lin(f"{a}.proj_x", d, d)
                add_lin(f"{a}.proj_c", d, d)
            else:  # D2
                add_lin(f"{a}.qv1", d, 2 * d)
                add_lin(f"{a}.kv2", d, 2 * d)
                add_lin(f"{a}.proj_x", d, d)
                add_lin(f"{a}.proj_c", d, d)
            hidden = int(mlp_ratios[i] * d)
            add_lin(f"{p}.mlp.0", d, hidden)
            add_lin(f"{p}.mlp.3", hidden, d)

    add_bn("norm", dims[-1])
    add_ln("norm_c", dims[-1])
    add_lin("head", dims[-1], cfg["num_classes"])
    return sd
