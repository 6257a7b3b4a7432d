"""Attention-map visualization (the reference vis.ipynb surface).

Computes the Dual Cross-Attention map of a chosen stage/block — how each of
the 16 meta tokens attends over image positions (the c<-x direction), and
how image positions attend over meta tokens — by re-running the block's
attention math with the trained projections, then saves per-token heatmap
PNGs.

Usage:
  python -m lemevit_tpu.cli.visualize_attn --image cat.jpg \
      --checkpoint weights.pth --model lemevit_tiny --stage 1 --block 0 \
      --out ./attn_vis
"""
from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--model", default="lemevit_tiny")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--stage", type=int, default=1, help="a 'D' stage (1/2)")
    p.add_argument("--block", type=int, default=0)
    p.add_argument("--out", default="./attn_vis")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from lemevit_tpu.attn import reference as ref
    from lemevit_tpu.data.mixup import normalize
    from lemevit_tpu.data.transforms import build_eval_transform
    from lemevit_tpu.models import create_model, variant_config
    from lemevit_tpu.train.checkpoint import load_pretrained

    cfg = variant_config(args.model)
    if cfg["attn_type"][args.stage] not in ("D", "D2"):
        raise SystemExit(f"stage {args.stage} is "
                         f"{cfg['attn_type'][args.stage]!r}, pick a D stage")

    model = create_model(args.model, num_classes=1000, attn_backend="xla")
    img = Image.open(args.image).convert("RGB")
    x_u8 = build_eval_transform(args.img_size, crop_pct=1.0)(img)
    x = normalize(jnp.asarray(x_u8)[None])

    if args.checkpoint:
        variables = load_pretrained(model, args.checkpoint)
        variables = jax.tree.map(jnp.asarray, variables)
    else:
        variables = model.init(jax.random.PRNGKey(0), x)

    # capture the block's (x, c) inputs via the model's sow probe
    blk_name = f"stage{args.stage}_block{args.block}"
    flat_idx = sum(cfg["depth"][:args.stage]) + args.block
    _, state = model.apply(variables, x, train=False,
                           mutable=["intermediates"])
    x_in, c_in = state["intermediates"]["block_inputs"][flat_idx]

    b, h, w, ch = x_in.shape
    heads = ch // cfg["head_dim"]
    par = variables["params"][blk_name]
    # CPE + pre-norm exactly as the block does
    from lemevit_tpu.models.lemevit import LeMeBlock
    blk = LeMeBlock(dim=ch, num_heads=heads,
                    attn_type=cfg["attn_type"][args.stage],
                    attn_backend="xla")
    bv = {"params": par}
    # reproject q/k with the block's weights
    def ln(t, pp):
        mu = t.mean(-1, keepdims=True)
        var = ((t - mu) ** 2).mean(-1, keepdims=True)
        return ((t - mu) / jnp.sqrt(var + 1e-6)) * pp["scale"] + pp["bias"]

    # CPE
    k = par["pos_embed"]["dwconv"]["kernel"]
    bsp = par["pos_embed"]["dwconv"]["bias"]
    xt = x_in + jax.lax.conv_general_dilated(
        x_in, k, (1, 1), [(1, 1), (1, 1)], feature_group_count=ch,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bsp
    xt = xt.reshape(b, h * w, ch)
    xn = ln(xt, par["norm1"])
    cn = ln(c_in, par["norm1"])
    qk = "qkv1" if cfg["attn_type"][args.stage] == "D" else "qv1"
    kk = "qkv2" if cfg["attn_type"][args.stage] == "D" else "kv2"
    qkv1 = xn @ par["attn"][qk]["kernel"] + par["attn"][qk]["bias"]
    qkv2 = cn @ par["attn"][kk]["kernel"] + par["attn"][kk]["bias"]
    q1 = qkv1[..., :ch].reshape(b, h * w, heads, -1)
    k1 = qkv1[..., ch:2 * ch].reshape(b, h * w, heads, -1)
    q2 = qkv2[..., :ch].reshape(b, -1, heads, cfg["head_dim"])
    k2 = qkv2[..., ch:2 * ch].reshape(b, -1, heads, cfg["head_dim"])
    m = c_in.shape[1]
    sx, sc = ref.dca_scales(h * w, m, ch)

    # c <- x map: (heads, M, N); x <- c map: (heads, N, M)
    a_cx = jax.nn.softmax(
        jnp.einsum("bmhd,bnhd->bhmn", q2, k1) * sc, -1)[0]
    a_xc = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q1, k2) * sx, -1)[0]

    os.makedirs(args.out, exist_ok=True)
    base = np.asarray(x_u8, np.float32)

    def save_heat(heat2d, path):
        heat = np.asarray(heat2d)
        heat = (heat - heat.min()) / max(heat.max() - heat.min(), 1e-9)
        heat = np.kron(heat, np.ones((args.img_size // h,
                                      args.img_size // w)))
        overlay = base.copy()
        overlay[..., 0] = np.clip(base[..., 0] * 0.4 + heat * 255 * 0.6,
                                  0, 255)
        Image.fromarray(overlay.astype(np.uint8)).save(path)

    amap = np.asarray(a_cx.mean(0))  # avg heads: (M, N)
    for t in range(m):
        save_heat(amap[t].reshape(h, w),
                  os.path.join(args.out, f"meta_token_{t:02d}.png"))
    # where image tokens look among meta tokens: entropy map
    ent = -(a_xc.mean(0) * jnp.log(a_xc.mean(0) + 1e-9)).sum(-1)
    save_heat(np.asarray(ent).reshape(h, w),
              os.path.join(args.out, "image_token_entropy.png"))
    print(f"wrote {m + 1} attention maps to {args.out}")


if __name__ == "__main__":
    main()
