"""SKNet / Selective-Kernel ResNets (the reference zoo's sknet.py:46-230 +
layers/selective_kernel.py:20-122).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- SelectiveKernelConv (selective_kernel.py:48-122): two 3x3 branches with
  dilations (1, 2) (the [3, 5] default under keep_3x3), each
  conv->bn->relu; `split_input` halves the input channels across branches;
  attention = gap(sum of branches) -> 1x1 fc_reduce (no bias) -> bn+relu
  -> 1x1 fc_select -> softmax over branches -> weighted branch sum.
  attn channels = max(out/attn_reduction, min_attn_channels).
- blocks (sknet.py:46-142): basic = SKConv + 3x3 ConvBnAct(no act);
  bottleneck = 1x1 + SKConv(groups=cardinality) + 1x1(no act); residual,
  relu; zero_init_last_bn=False for every registered variant.
- shells: standard 7x7 stem (skresnet50d: deep stem + avg-down).

Torch state-dict loader: timm ResNet key layout with
convN.paths.{0,1}.{conv,bn} and convN.attn.{fc_reduce,bn,fc_select}.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_batch_norm, _bn_p, _bn_from, _kaiming, _v, _w,
                        _avg_pool2, _conv, _max_pool, _pad1)

Params = Dict[str, Any]

# name -> (layers, block, stem, down, card, bw, attn_red, attn_min, split)
SKNETS = {
    "skresnet18": ((2, 2, 2, 2), "basic", "7x7", "conv", 1, 64, 8, 16,
                   True),
    "skresnet34": ((3, 4, 6, 3), "basic", "7x7", "conv", 1, 64, 8, 16,
                   True),
    "skresnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv", 1, 64, 16,
                   32, True),
    "skresnet50d": ((3, 4, 6, 3), "bottleneck", "deep", "avg", 1, 64, 16,
                    32, True),
    "skresnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv", 32,
                          4, 16, 32, False),
}
_PLANES = (64, 128, 256, 512)
_DILATIONS = (1, 2)          # keep_3x3 on the [3, 5] default kernel list


def sknet_feature_channels(variant: str) -> int:
    block = SKNETS[variant][1]
    return _PLANES[-1] * (1 if block == "basic" else 4)


def _conv_d(x, w, stride, dilation, groups=1):
    """3x3 conv, torch-symmetric padding = dilation."""
    p = dilation
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _sk_conv(x, p, stride, groups, split):
    """SelectiveKernelConv forward."""
    if split:
        cin = x.shape[-1] // 2
        xs = (x[..., :cin], x[..., cin:])
    else:
        xs = (x, x)
    paths = []
    for i, (xp, d) in enumerate(zip(xs, _DILATIONS)):
        y = _conv_d(xp, p["paths"][i]["conv"], stride, d, groups)
        paths.append(jax.nn.relu(_batch_norm(y, p["paths"][i]["bn"],
                                             act=False)))
    stacked = jnp.stack(paths, axis=0)                # (P, B, H, W, C)
    gap = stacked.sum(axis=0).mean(axis=(1, 2))       # (B, C)
    a = gap @ p["attn"]["reduce_w"]
    a = jax.nn.relu(_batch_norm(a[:, None, None, :], p["attn"]["bn"],
                                act=False))[:, 0, 0, :]
    a = a @ p["attn"]["select_w"]                     # (B, P*C)
    B = a.shape[0]
    C = stacked.shape[-1]
    a = a.reshape(B, 2, C)
    a = jax.nn.softmax(a, axis=1)                     # over paths
    return (stacked * a.transpose(1, 0, 2)[:, :, None, None, :]).sum(0)


def apply_sknet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C) feature map."""
    layers, block, stem, down, card, bw, _, _, split = SKNETS[variant]
    relu = jax.nn.relu
    st = p["stem"]
    if stem == "deep":
        x = _batch_norm(_conv(_pad1(images), st["conv1"], 2, "VALID"),
                        st["bn1"])
        x = _batch_norm(_conv(_pad1(x), st["conv2"], 1, "VALID"),
                        st["bn2"])
        x = _batch_norm(_conv(_pad1(x), st["conv3"], 1, "VALID"),
                        st["bn3"])
    else:
        x = jnp.pad(images, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = _batch_norm(_conv(x, st["conv1"], 2, "VALID"), st["bn1"])
    x = _max_pool(_pad1(x), 3, 2, "VALID")
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            shortcut = x
            if "down_conv" in blk:
                if down == "avg":
                    d = _avg_pool2(x) if s == 2 else x
                    d = _conv(d, blk["down_conv"], 1)
                else:
                    d = _conv(x, blk["down_conv"], s)
                shortcut = _batch_norm(d, blk["down_bn"], act=False)
            if block == "bottleneck":
                y = relu(_batch_norm(_conv(x, blk["conv1"], 1),
                                     blk["bn1"], act=False))
                y = _sk_conv(y, blk["sk"], s, card, split)
                y = _batch_norm(_conv(y, blk["conv3"], 1), blk["bn3"],
                                act=False)
            else:
                y = _sk_conv(x, blk["sk"], s, card, split)
                y = _batch_norm(_conv(_pad1(y), blk["conv2"], 1, "VALID"),
                                blk["bn2"], act=False)
            x = relu(y + shortcut)
    return x


def init_sknet(rng: jax.Array, variant: str) -> Params:
    layers, block, stem, _, card, bw, red, amin, split = SKNETS[variant]
    ks = iter(jax.random.split(rng, 512))
    if stem == "deep":
        stem_p = {
            "conv1": _kaiming(next(ks), (3, 3, 3, 32)), "bn1": _bn_p(32),
            "conv2": _kaiming(next(ks), (3, 3, 32, 32)), "bn2": _bn_p(32),
            "conv3": _kaiming(next(ks), (3, 3, 32, 64)), "bn3": _bn_p(64),
        }
    else:
        stem_p = {"conv1": _kaiming(next(ks), (7, 7, 3, 64)),
                  "bn1": _bn_p(64)}
    p: Params = {"stem": stem_p, "stages": []}
    prev = 64

    def sk_p(cin, cout):
        attn = max(int(cout / red), amin)
        pin = cin // 2 if split else cin
        return {
            "paths": [{"conv": _kaiming(next(ks),
                                        (3, 3, pin // card, cout)),
                       "bn": _bn_p(cout)} for _ in range(2)],
            "attn": {
                "reduce_w": jax.random.normal(next(ks), (cout, attn),
                                              jnp.float32)
                * np.sqrt(2.0 / attn),
                "bn": _bn_p(attn),
                "select_w": jax.random.normal(next(ks), (attn, 2 * cout),
                                              jnp.float32)
                * np.sqrt(2.0 / (2 * cout)),
            },
        }

    for si, depth in enumerate(layers):
        planes = _PLANES[si]
        width = int(planes * bw / 64) * card
        out = planes * (1 if block == "basic" else 4)
        blocks = []
        for b in range(depth):
            if block == "bottleneck":
                blk = {
                    "conv1": _kaiming(next(ks), (1, 1, prev, width)),
                    "bn1": _bn_p(width),
                    "sk": sk_p(width, width),
                    "conv3": _kaiming(next(ks), (1, 1, width, out)),
                    "bn3": _bn_p(out),
                }
            else:
                blk = {
                    "sk": sk_p(prev, planes),
                    "conv2": _kaiming(next(ks), (3, 3, planes, out)),
                    "bn2": _bn_p(out),
                }
            s = (1 if si == 0 else 2) if b == 0 else 1
            if b == 0 and (s != 1 or prev != out):
                blk["down_conv"] = _kaiming(next(ks), (1, 1, prev, out))
                blk["down_bn"] = _bn_p(out)
            blocks.append(blk)
            prev = out
        p["stages"].append(blocks)
    return p


def load_sknet(params: Params, sd: Dict[str, Any], variant: str,
               prefix: str = "") -> Params:
    """Load the reference timm SKNet torch state-dict."""
    _, block, stem, down, *_ = SKNETS[variant]
    if stem == "deep":
        stem_p = {
            "conv1": _w(sd, prefix + "conv1.0.weight"),
            "bn1": _bn_from(sd, prefix + "conv1.1"),
            "conv2": _w(sd, prefix + "conv1.3.weight"),
            "bn2": _bn_from(sd, prefix + "conv1.4"),
            "conv3": _w(sd, prefix + "conv1.6.weight"),
            "bn3": _bn_from(sd, prefix + "bn1"),
        }
    else:
        stem_p = {"conv1": _w(sd, prefix + "conv1.weight"),
                  "bn1": _bn_from(sd, prefix + "bn1")}
    p: Params = {"stem": stem_p, "stages": []}
    dci = 1 if down == "avg" else 0

    def sk_from(base):
        rw = np.asarray(sd[base + ".attn.fc_reduce.weight"])[:, :, 0, 0]
        sw = np.asarray(sd[base + ".attn.fc_select.weight"])[:, :, 0, 0]
        return {
            "paths": [{"conv": _w(sd, base + f".paths.{i}.conv.weight"),
                       "bn": _bn_from(sd, base + f".paths.{i}.bn")}
                      for i in range(2)],
            "attn": {
                "reduce_w": jnp.asarray(rw.T, jnp.float32),
                "bn": _bn_from(sd, base + ".attn.bn"),
                "select_w": jnp.asarray(sw.T, jnp.float32),
            },
        }

    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}layer{si + 1}.{bi}."
            if block == "bottleneck":
                nb = {
                    "conv1": _w(sd, base + "conv1.conv.weight"),
                    "bn1": _bn_from(sd, base + "conv1.bn"),
                    "sk": sk_from(base + "conv2"),
                    "conv3": _w(sd, base + "conv3.conv.weight"),
                    "bn3": _bn_from(sd, base + "conv3.bn"),
                }
            else:
                nb = {
                    "sk": sk_from(base + "conv1"),
                    "conv2": _w(sd, base + "conv2.conv.weight"),
                    "bn2": _bn_from(sd, base + "conv2.bn"),
                }
            if "down_conv" in blk:
                nb["down_conv"] = _w(sd, base + f"downsample.{dci}.weight")
                nb["down_bn"] = _bn_from(sd, base + f"downsample.{dci + 1}")
            nbs.append(nb)
        p["stages"].append(nbs)
    return p
