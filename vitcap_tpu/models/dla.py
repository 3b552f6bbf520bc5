"""DLA — Deep Layer Aggregation (the reference zoo's dla.py:51-444).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- blocks: DlaBasic (two 3x3s), DlaBottleneck (1x1 / grouped 3x3 / 1x1,
  expansion 2: mid = floor(out*bw/64)*card // 2), DlaBottle2neck
  (res2-style scale-4 split with avd pool on strided blocks); every block
  takes an explicit residual (the tree's projected downsample).
- DlaTree (:206-254): recursive two-child aggregation; each leaf level
  ends in a DlaRoot 1x1 conv over [tree2, tree1, *children] (+ optional
  root residual add of tree2); stride-2 levels maxpool their input for
  the projected shortcut and (for level_root trees) as an extra child.
- stem: 7x7/1 conv + two conv levels (level1 stride 2); head:
  global-avg-pool + 1x1-conv classifier.

Torch state-dict loader mirrors the recursive module paths
(level{k}.tree1.tree2..., .root.conv, .project.0/.1, base_layer.0/1).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v, _w

Params = Dict[str, Any]

# name -> (levels, channels, block, cardinality, base_width, residual_root)
DLAS = {
    "dla34": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), "basic",
              1, 64, False),
    "dla46_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256),
                "bottleneck", 1, 64, False),
    "dla46x_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256),
                 "bottleneck", 32, 4, False),
    "dla60x_c": ((1, 1, 1, 2, 3, 1), (16, 32, 64, 64, 128, 256),
                 "bottleneck", 32, 4, False),
    "dla60": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
              "bottleneck", 1, 64, False),
    "dla60x": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneck", 32, 4, False),
    "dla102": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneck", 1, 64, True),
    "dla102x": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
                "bottleneck", 32, 4, True),
    "dla102x2": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
                 "bottleneck", 64, 4, True),
    "dla169": ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneck", 1, 64, True),
    "dla60_res2net": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
                      "bottle2neck", 1, 28, False),
    "dla60_res2next": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
                       "bottle2neck", 8, 4, False),
}
_SCALE = 4                       # DlaBottle2neck scale


def dla_feature_channels(variant: str) -> int:
    return DLAS[variant][1][-1]


def _conv3(x, w, stride=1, groups=1):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _mid_planes(block: str, out: int, card: int, bw: int) -> int:
    return int(math.floor(out * (bw / 64)) * card) // 2


def _block_apply(bp, x, residual, stride, block, card):
    relu = jax.nn.relu
    if block == "basic":
        y = relu(_batch_norm(_conv3(x, bp["conv1"], stride), bp["bn1"],
                             act=False))
        y = _batch_norm(_conv3(y, bp["conv2"]), bp["bn2"], act=False)
    elif block == "bottleneck":
        y = relu(_batch_norm(_conv1(x, bp["conv1"]), bp["bn1"], act=False))
        y = relu(_batch_norm(_conv3(y, bp["conv2"], stride, card),
                             bp["bn2"], act=False))
        y = _batch_norm(_conv1(y, bp["conv3"]), bp["bn3"], act=False)
    else:                                             # bottle2neck
        y = relu(_batch_norm(_conv1(x, bp["conv1"]), bp["bn1"], act=False))
        width = bp["convs"][0].shape[-1]
        is_first = stride > 1
        spx = [y[..., i * width:(i + 1) * width] for i in range(_SCALE)]
        spo = []
        sp = spx[0]
        for i, (cw, bn) in enumerate(zip(bp["convs"], bp["bns"])):
            sp = spx[i] if (i == 0 or is_first) else sp + spx[i]
            sp = relu(_batch_norm(_conv3(sp, cw, stride, card), bn,
                                  act=False))
            spo.append(sp)
        if is_first:
            t = jnp.pad(spx[-1], ((0, 0), (1, 1), (1, 1), (0, 0)))
            t = jax.lax.reduce_window(t, 0.0, jax.lax.add, (1, 3, 3, 1),
                                      (1, stride, stride, 1), "VALID") / 9.0
            spo.append(t)
        else:
            spo.append(spx[-1])
        y = jnp.concatenate(spo, axis=-1)
        y = _batch_norm(_conv1(y, bp["conv3"]), bp["bn3"], act=False)
    return relu(y + residual)


def _maxpool_s(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), "VALID")


def _tree_apply(tp, x, levels, stride, level_root, block, card,
                root_residual, children=None):
    children = [] if children is None else children
    bottom = _maxpool_s(x, stride) if stride > 1 else x
    if "project" in tp:
        residual = _batch_norm(_conv1(bottom, tp["project"]["conv"]),
                               tp["project"]["bn"], act=False)
    else:
        residual = bottom
    if level_root:
        children.append(bottom)
    if levels == 1:
        x1 = _block_apply(tp["tree1"], x, residual, stride, block, card)
        x2 = _block_apply(tp["tree2"], x1, x1, 1, block, card)
        cat = jnp.concatenate([x2, x1] + children, axis=-1)
        r = _batch_norm(_conv1(cat, tp["root"]["conv"]), tp["root"]["bn"],
                        act=False)
        if root_residual:
            r = r + x2
        return jax.nn.relu(r)
    x1 = _tree_apply(tp["tree1"], x, levels - 1, stride, False, block,
                     card, root_residual)
    children.append(x1)
    return _tree_apply(tp["tree2"], x1, levels - 1, 1, False, block, card,
                       root_residual, children)


def apply_dla(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C) level5 feature map (the
    reference forward_features, dla.py:318-326)."""
    levels, channels, block, card, bw, rr = DLAS[variant]
    relu = jax.nn.relu
    x = relu(_batch_norm(
        jax.lax.conv_general_dilated(
            jnp.pad(images, ((0, 0), (3, 3), (3, 3), (0, 0))),
            p["base"]["conv"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        p["base"]["bn"], act=False))
    for li, lp in enumerate((p["level0"], p["level1"])):
        stride = 1 if li == 0 else 2
        for ci, cp in enumerate(lp):
            x = relu(_batch_norm(_conv3(x, cp["conv"],
                                        stride if ci == 0 else 1),
                                 cp["bn"], act=False))
    x = _tree_apply(p["level2"], x, levels[2], 2, False, block, card, rr)
    x = _tree_apply(p["level3"], x, levels[3], 2, True, block, card, rr)
    x = _tree_apply(p["level4"], x, levels[4], 2, True, block, card, rr)
    x = _tree_apply(p["level5"], x, levels[5], 2, True, block, card, rr)
    return x


def _init_block(ks, block, cin, out, card, bw):
    mid = _mid_planes(block, out, card, bw)
    if block == "basic":
        return {"conv1": _kaiming(next(ks), (3, 3, cin, out)),
                "bn1": _bn_p(out),
                "conv2": _kaiming(next(ks), (3, 3, out, out)),
                "bn2": _bn_p(out)}
    if block == "bottleneck":
        return {"conv1": _kaiming(next(ks), (1, 1, cin, mid)),
                "bn1": _bn_p(mid),
                "conv2": _kaiming(next(ks), (3, 3, mid // card, mid)),
                "bn2": _bn_p(mid),
                "conv3": _kaiming(next(ks), (1, 1, mid, out)),
                "bn3": _bn_p(out)}
    return {"conv1": _kaiming(next(ks), (1, 1, cin, mid * _SCALE)),
            "bn1": _bn_p(mid * _SCALE),
            "convs": [_kaiming(next(ks), (3, 3, mid // card, mid))
                      for _ in range(_SCALE - 1)],
            "bns": [_bn_p(mid) for _ in range(_SCALE - 1)],
            "conv3": _kaiming(next(ks), (1, 1, mid * _SCALE, out)),
            "bn3": _bn_p(out)}


def _init_tree(ks, levels, block, cin, out, card, bw, level_root,
               root_dim):
    if root_dim == 0:
        root_dim = 2 * out
    if level_root:
        root_dim += cin
    tp: Params = {}
    if levels == 1:
        tp["tree1"] = _init_block(ks, block, cin, out, card, bw)
        tp["tree2"] = _init_block(ks, block, out, out, card, bw)
        if cin != out:
            tp["project"] = {"conv": _kaiming(next(ks), (1, 1, cin, out)),
                             "bn": _bn_p(out)}
        tp["root"] = {"conv": _kaiming(next(ks), (1, 1, root_dim, out)),
                      "bn": _bn_p(out)}
    else:
        tp["tree1"] = _init_tree(ks, levels - 1, block, cin, out, card,
                                 bw, False, 0)
        tp["tree2"] = _init_tree(ks, levels - 1, block, out, out, card,
                                 bw, False, root_dim + out)
    return tp


def init_dla(rng: jax.Array, variant: str) -> Params:
    levels, channels, block, card, bw, _ = DLAS[variant]
    ks = iter(jax.random.split(rng, 1024))
    p: Params = {
        "base": {"conv": _kaiming(next(ks), (7, 7, 3, channels[0])),
                 "bn": _bn_p(channels[0])},
        "level0": [{"conv": _kaiming(next(ks), (3, 3, channels[0],
                                                channels[0])),
                    "bn": _bn_p(channels[0])}
                   for _ in range(levels[0])],
        "level1": [{"conv": _kaiming(next(ks),
                                     (3, 3, channels[0 if i == 0 else 1],
                                      channels[1])),
                    "bn": _bn_p(channels[1])}
                   for i in range(levels[1])],
    }
    p["level2"] = _init_tree(ks, levels[2], block, channels[1],
                             channels[2], card, bw, False, 0)
    p["level3"] = _init_tree(ks, levels[3], block, channels[2],
                             channels[3], card, bw, True, 0)
    p["level4"] = _init_tree(ks, levels[4], block, channels[3],
                             channels[4], card, bw, True, 0)
    p["level5"] = _init_tree(ks, levels[5], block, channels[4],
                             channels[5], card, bw, True, 0)
    return p


def _load_block(sd, base, blk, block):
    nb: Params = {}
    for key in blk:
        if key == "convs":
            nb["convs"] = [_w(sd, f"{base}.convs.{i}.weight")
                           for i in range(len(blk["convs"]))]
        elif key == "bns":
            nb["bns"] = [_bn_from(sd, f"{base}.bns.{i}")
                         for i in range(len(blk["bns"]))]
        elif key.startswith("conv"):
            nb[key] = _w(sd, f"{base}.{key}.weight")
        else:
            nb[key] = _bn_from(sd, f"{base}.{key[:2]}{key[2:]}")
    return nb


def _load_tree(sd, base, tp, block):
    np_: Params = {}
    if "root" in tp:
        np_["tree1"] = _load_block(sd, base + ".tree1", tp["tree1"], block)
        np_["tree2"] = _load_block(sd, base + ".tree2", tp["tree2"], block)
        if "project" in tp:
            np_["project"] = {
                "conv": _w(sd, base + ".project.0.weight"),
                "bn": _bn_from(sd, base + ".project.1")}
        np_["root"] = {"conv": _w(sd, base + ".root.conv.weight"),
                       "bn": _bn_from(sd, base + ".root.bn")}
    else:
        np_["tree1"] = _load_tree(sd, base + ".tree1", tp["tree1"], block)
        np_["tree2"] = _load_tree(sd, base + ".tree2", tp["tree2"], block)
    return np_


def load_dla(params: Params, sd: Dict[str, Any], variant: str,
             prefix: str = "") -> Params:
    """Load the reference timm DLA torch state-dict."""
    _, channels, block, *_ = DLAS[variant]
    p: Params = {
        "base": {"conv": _w(sd, prefix + "base_layer.0.weight"),
                 "bn": _bn_from(sd, prefix + "base_layer.1")},
        "level0": [], "level1": [],
    }
    for li in (0, 1):
        for ci in range(len(params[f"level{li}"])):
            p[f"level{li}"].append({
                "conv": _w(sd, f"{prefix}level{li}.{ci * 3}.weight"),
                "bn": _bn_from(sd, f"{prefix}level{li}.{ci * 3 + 1}")})
    for li in (2, 3, 4, 5):
        p[f"level{li}"] = _load_tree(sd, f"{prefix}level{li}",
                                     params[f"level{li}"], block)
    return p
