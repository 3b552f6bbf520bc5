"""ReXNet V1 (the reference zoo's rexnet.py:52-260).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- channel schedule (_block_cfg, rexnet.py:113-130): layers (1,2,2,3,3,5),
  strides (1,2,2,2,1,2), exp 1 then 6; out channels ramp linearly from
  initial 16 toward final 180 with float accumulation + make_divisible
  (ch_div 8 for the 'r' variants); SE only from the third stage on.
- LinearBottleneck (:73-110): optional 1x1 expand (swish) -> 3x3 depthwise
  (bn, NO act) -> SEWithNorm (fc1 -> BN -> relu -> fc2 -> sigmoid,
  :52-70) -> relu6 -> 1x1 linear; PARTIAL residual: only the first
  in_chs channels receive the shortcut (:108-109).
- stem 3x3/2 swish; tail ConvBnAct to make_divisible(1280*wm) swish;
  global-avg-pool + fc head.

Torch state-dict loader: stem.{conv,bn},
features.{i}.{conv_exp,conv_dw,conv_pwl}.{conv,bn} + .se.{fc1,bn,fc2},
features.{last}.{conv,bn}, head.fc.
"""

from __future__ import annotations

from math import ceil
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import (_conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw,
                           make_divisible)

Params = Dict[str, Any]

# name -> (width_mult, ch_div)
REXNETS = {
    "rexnet_100": (1.0, 1),
    "rexnet_130": (1.3, 1),
    "rexnet_150": (1.5, 1),
    "rexnet_200": (2.0, 1),
    "rexnetr_100": (1.0, 8),
    "rexnetr_130": (1.3, 8),
    "rexnetr_150": (1.5, 8),
    "rexnetr_200": (2.0, 8),
}


def rexnet_plan(variant: str):
    """(stem_chs, [(out, exp, stride, se)], pen_chs) — rexnet.py:113-130."""
    wm, ch_div = REXNETS[variant]
    stem_base = 32 / wm if wm < 1.0 else 32
    stem_chs = make_divisible(round(stem_base * wm), ch_div)
    layers = [ceil(e * 1.0) for e in (1, 2, 2, 3, 3, 5)]
    strides = sum([[s] + [1] * (layers[i] - 1)
                   for i, s in enumerate((1, 2, 2, 2, 1, 2))], [])
    exp_ratios = [1] * layers[0] + [6] * sum(layers[1:])
    n = sum(layers)
    base = 16 / wm if wm < 1.0 else 16
    outs = []
    for _ in range(n):
        outs.append(make_divisible(round(base * wm), ch_div))
        base += 180 / n
    ses = [0.0] * (layers[0] + layers[1]) + [1 / 12.] * sum(layers[2:])
    pen = make_divisible(1280 * wm, ch_div)
    return stem_chs, list(zip(outs, exp_ratios, strides, ses)), pen


def rexnet_feature_channels(variant: str) -> int:
    return rexnet_plan(variant)[2]


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _se_norm(x, p):
    """SEWithNorm: fc1 -> BN -> relu -> fc2 -> sigmoid gate."""
    s = jnp.mean(x, axis=(1, 2))
    s = s @ p["fc1_w"] + p["fc1_b"]
    s = jax.nn.relu(_batch_norm(s[:, None, None, :], p["bn"],
                                act=False))[:, 0, 0, :]
    s = s @ p["fc2_w"] + p["fc2_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def apply_rexnet(p: Params, images: jnp.ndarray,
                 variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, pen_chs) feature map (the reference
    forward_features, rexnet.py:203-206)."""
    _, plan, _ = rexnet_plan(variant)
    x = _swish(_batch_norm(_conv_sym(images, p["stem"]["conv"], 2),
                           p["stem"]["bn"], act=False))
    for bi, (out, exp, stride, se) in enumerate(plan):
        bp = p["blocks"][bi]
        cin = x.shape[-1]
        shortcut = x
        y = x
        if "conv_exp" in bp:
            y = _swish(_batch_norm(_conv_sym(y, bp["conv_exp"]),
                                   bp["bn_exp"], act=False))
        y = _batch_norm(_dwconv(y, bp["conv_dw"], stride), bp["bn_dw"],
                        act=False)
        if "se" in bp:
            y = _se_norm(y, bp["se"])
        y = jnp.minimum(jax.nn.relu(y), 6.0)
        y = _batch_norm(_conv_sym(y, bp["conv_pwl"]), bp["bn_pwl"],
                        act=False)
        if stride == 1 and cin <= out:
            y = y.at[..., :cin].add(shortcut)
        x = y
    x = _swish(_batch_norm(_conv_sym(x, p["pen"]["conv"]), p["pen"]["bn"],
                           act=False))
    return x


def init_rexnet(rng: jax.Array, variant: str) -> Params:
    wm, ch_div = REXNETS[variant]
    stem_chs, plan, pen = rexnet_plan(variant)
    ks = iter(jax.random.split(rng, 256))
    p: Params = {"stem": {"conv": _kaiming(next(ks), (3, 3, 3, stem_chs)),
                          "bn": _bn_p(stem_chs)},
                 "blocks": []}
    prev = stem_chs
    for out, exp, stride, se in plan:
        bp: Params = {}
        dw = prev
        if exp != 1:
            dw = make_divisible(round(prev * exp), ch_div)
            bp["conv_exp"] = _kaiming(next(ks), (1, 1, prev, dw))
            bp["bn_exp"] = _bn_p(dw)
        bp["conv_dw"] = _kaiming_dw(next(ks), (3, 3, 1, dw))
        bp["bn_dw"] = _bn_p(dw)
        if se > 0:
            red = make_divisible(int(dw * se), ch_div)
            k1, k2 = jax.random.split(next(ks))
            bp["se"] = {
                "fc1_w": jax.random.normal(k1, (dw, red), jnp.float32)
                * np.sqrt(2.0 / red),
                "fc1_b": jnp.zeros((red,), jnp.float32),
                "bn": _bn_p(red),
                "fc2_w": jax.random.normal(k2, (red, dw), jnp.float32)
                * np.sqrt(2.0 / dw),
                "fc2_b": jnp.zeros((dw,), jnp.float32),
            }
        bp["conv_pwl"] = _kaiming(next(ks), (1, 1, dw, out))
        bp["bn_pwl"] = _bn_p(out)
        p["blocks"].append(bp)
        prev = out
    p["pen"] = {"conv": _kaiming(next(ks), (1, 1, prev, pen)),
                "bn": _bn_p(pen)}
    return p


def load_rexnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm ReXNetV1 torch state-dict."""
    p: Params = {"stem": {"conv": _w_conv(sd, prefix + "stem.conv.weight"),
                          "bn": _bn_from(sd, prefix + "stem.bn")},
                 "blocks": []}
    for bi, blk in enumerate(params["blocks"]):
        base = f"{prefix}features.{bi}."
        bp: Params = {}
        if "conv_exp" in blk:
            bp["conv_exp"] = _w_conv(sd, base + "conv_exp.conv.weight")
            bp["bn_exp"] = _bn_from(sd, base + "conv_exp.bn")
        bp["conv_dw"] = _w_dw(sd, base + "conv_dw.conv.weight")
        bp["bn_dw"] = _bn_from(sd, base + "conv_dw.bn")
        if "se" in blk:
            f1 = np.asarray(sd[base + "se.fc1.weight"])[:, :, 0, 0]
            f2 = np.asarray(sd[base + "se.fc2.weight"])[:, :, 0, 0]
            bp["se"] = {
                "fc1_w": jnp.asarray(f1.T, jnp.float32),
                "fc1_b": _v(sd, base + "se.fc1.bias"),
                "bn": _bn_from(sd, base + "se.bn"),
                "fc2_w": jnp.asarray(f2.T, jnp.float32),
                "fc2_b": _v(sd, base + "se.fc2.bias"),
            }
        bp["conv_pwl"] = _w_conv(sd, base + "conv_pwl.conv.weight")
        bp["bn_pwl"] = _bn_from(sd, base + "conv_pwl.bn")
        p["blocks"].append(bp)
    last = len(params["blocks"])
    p["pen"] = {"conv": _w_conv(sd, f"{prefix}features.{last}.conv.weight"),
                "bn": _bn_from(sd, f"{prefix}features.{last}.bn")}
    return p
