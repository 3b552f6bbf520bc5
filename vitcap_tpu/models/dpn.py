"""DPN — Dual Path Networks (the reference zoo's dpn.py:51-312).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- pre-activation blocks: BnActConv2d = BN(eps 1e-3)+relu then conv
  (dpn.py:72-79); DualPathBlock (:82-165): optional 1x1 projection
  (stride 2 for 'down') splitting into a residual part (bw) and a dense
  part (2*inc), then 1x1 -> grouped 3x3 (stride) -> 1x1 to bw+inc
  (b-variant: CatBnAct then separate 1x1 convs); residual add on the
  first bw channels, dense concat of the rest.
- stem: ConvBnAct (3x3 for 'small' else 7x7, stride 2, eps 1e-3) +
  maxpool 3/2 pad 1; final CatBnAct with ELU; 1x1-conv classifier after
  global pooling (:237-241, :253-260).

Torch state-dict loader: features.conv1_1.{conv,bn},
features.conv{s}_{i}.{c1x1_w_s1,c1x1_w_s2,c1x1_a,c3x3_b,c1x1_c}.{bn,conv}
(+ .c1x1_c1/.c1x1_c2 for b-variants), features.conv5_bn_ac.bn, classifier.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _kaiming, _v, _w
from .efficientnet import _conv_sym

Params = Dict[str, Any]

_BN_EPS = 1e-3

# name -> (small, init_features, k_r, groups, b, k_sec, inc_sec)
DPNS = {
    "dpn68": (True, 10, 128, 32, False, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn68b": (True, 10, 128, 32, True, (3, 4, 12, 3), (16, 32, 32, 64)),
    "dpn92": (False, 64, 96, 32, False, (3, 4, 20, 3), (16, 32, 24, 128)),
    "dpn98": (False, 96, 160, 40, False, (3, 6, 20, 3), (16, 32, 32, 128)),
    "dpn131": (False, 128, 160, 40, False, (4, 8, 28, 3),
               (16, 32, 32, 128)),
    "dpn107": (False, 128, 200, 50, False, (4, 8, 20, 3),
               (20, 64, 64, 128)),
}


def dpn_plan(variant: str) -> Tuple[int, List[List[dict]], int, bool, int]:
    """(init_features, stages[[block dict]], num_features, b, stem_k)."""
    small, init_f, k_r, groups, b, k_sec, inc_sec = DPNS[variant]
    bwf = 1 if small else 4
    stages = []
    in_chs = init_f
    for si in range(4):
        bw = 64 * (2 ** si) * bwf
        inc = inc_sec[si]
        r = (k_r * bw) // (64 * bwf)
        blocks = []
        for i in range(k_sec[si]):
            btype = ("proj" if si == 0 else "down") if i == 0 else "normal"
            blocks.append(dict(type=btype, in_chs=in_chs, r=r, bw=bw,
                               inc=inc, groups=groups))
            in_chs = (bw + 3 * inc) if i == 0 else in_chs + inc
        stages.append(blocks)
    return init_f, stages, in_chs, b, (3 if small else 7)


def dpn_feature_channels(variant: str) -> int:
    return dpn_plan(variant)[2]


def _bn_act(x, p, act="relu"):
    x = _batch_norm(x, p, act=False, eps=_BN_EPS)
    if act == "relu":
        return jax.nn.relu(x)
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)      # elu


def _bac(x, p, stride=1, groups=1):
    """BnActConv2d: BN+relu -> conv (torch-symmetric pad)."""
    x = _bn_act(x, p["bn"])
    w = p["conv"]
    k = w.shape[0]
    pd = k // 2
    if pd:
        x = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def apply_dpn(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C) post-conv5_bn_ac feature map."""
    _, stages, _, b, stem_k = dpn_plan(variant)
    # stem: conv -> bn+relu -> maxpool 3/2 pad 1
    x = images
    pd = stem_k // 2
    x = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["stem"]["conv"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _bn_act(x, p["stem"]["bn"])
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    resid, dense = x, None
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            bw = blk["bw"]
            x_in = resid if dense is None else \
                jnp.concatenate([resid, dense], axis=-1)
            stride = 2 if blk["type"] == "down" else 1
            if blk["type"] in ("proj", "down"):
                x_s = _bac(x_in, bp["c1x1_w"], stride)
                x_s1, x_s2 = x_s[..., :bw], x_s[..., bw:]
            else:
                x_s1, x_s2 = resid, dense
            y = _bac(x_in, bp["c1x1_a"])
            y = _bac(y, bp["c3x3_b"], stride, blk["groups"])
            if b:
                y = _bn_act(y, bp["c1x1_c"]["bn"])
                o1 = _conv_sym(y, bp["c1x1_c1"])
                if "c1x1_c1_b" in bp:
                    o1 = o1 + bp["c1x1_c1_b"]
                o2 = _conv_sym(y, bp["c1x1_c2"])
                if "c1x1_c2_b" in bp:
                    o2 = o2 + bp["c1x1_c2_b"]
            else:
                y = _bac(y, bp["c1x1_c"])
                o1, o2 = y[..., :bw], y[..., bw:]
            resid = x_s1 + o1
            dense = jnp.concatenate([x_s2, o2], axis=-1)
    x = jnp.concatenate([resid, dense], axis=-1)
    return _bn_act(x, p["final_bn"], act="elu")


def _bn_p_eps(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_dpn(rng: jax.Array, variant: str) -> Params:
    init_f, stages, feats, b, stem_k = dpn_plan(variant)
    ks = iter(jax.random.split(rng, 512))
    p: Params = {"stem": {"conv": _kaiming(next(ks),
                                           (stem_k, stem_k, 3, init_f)),
                          "bn": _bn_p_eps(init_f)},
                 "stages": []}
    for blocks in stages:
        bps = []
        for blk in blocks:
            cin, r, bw, inc, g = (blk["in_chs"], blk["r"], blk["bw"],
                                  blk["inc"], blk["groups"])
            bp: Params = {
                "c1x1_a": {"bn": _bn_p_eps(cin),
                           "conv": _kaiming(next(ks), (1, 1, cin, r))},
                "c3x3_b": {"bn": _bn_p_eps(r),
                           "conv": _kaiming(next(ks), (3, 3, r // g, r))},
            }
            if blk["type"] in ("proj", "down"):
                bp["c1x1_w"] = {
                    "bn": _bn_p_eps(cin),
                    "conv": _kaiming(next(ks), (1, 1, cin, bw + 2 * inc))}
            if b:
                bp["c1x1_c"] = {"bn": _bn_p_eps(r)}
                bp["c1x1_c1"] = _kaiming(next(ks), (1, 1, r, bw))
                bp["c1x1_c2"] = _kaiming(next(ks), (1, 1, r, inc))
            else:
                bp["c1x1_c"] = {
                    "bn": _bn_p_eps(r),
                    "conv": _kaiming(next(ks), (1, 1, r, bw + inc))}
            bps.append(bp)
        p["stages"].append(bps)
    p["final_bn"] = _bn_p_eps(feats)
    return p


def _bn_from_eps(sd, base):
    return {"scale": _v(sd, base + ".weight"),
            "bias": _v(sd, base + ".bias"),
            "mean": _v(sd, base + ".running_mean"),
            "var": _v(sd, base + ".running_var")}


def load_dpn(params: Params, sd: Dict[str, Any], variant: str,
             prefix: str = "features.") -> Params:
    """Load the reference timm DPN torch state-dict."""
    init_f, stages, feats, b, stem_k = dpn_plan(variant)
    p: Params = {"stem": {
        "conv": _w(sd, prefix + "conv1_1.conv.weight"),
        "bn": _bn_from_eps(sd, prefix + "conv1_1.bn"),
    }, "stages": []}
    for si, blocks in enumerate(stages):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}conv{si + 2}_{bi + 1}."
            bp: Params = {}
            if blk["type"] in ("proj", "down"):
                wkey = "c1x1_w_s2" if blk["type"] == "down" else "c1x1_w_s1"
                bp["c1x1_w"] = {
                    "bn": _bn_from_eps(sd, base + wkey + ".bn"),
                    "conv": _w(sd, base + wkey + ".conv.weight")}
            for name in ("c1x1_a", "c3x3_b"):
                bp[name] = {"bn": _bn_from_eps(sd, base + name + ".bn"),
                            "conv": _w(sd, base + name + ".conv.weight")}
            if b:
                bp["c1x1_c"] = {"bn": _bn_from_eps(sd, base + "c1x1_c.bn")}
                bp["c1x1_c1"] = _w(sd, base + "c1x1_c1.weight")
                bp["c1x1_c2"] = _w(sd, base + "c1x1_c2.weight")
                if base + "c1x1_c1.bias" in sd:
                    bp["c1x1_c1_b"] = _v(sd, base + "c1x1_c1.bias")
                    bp["c1x1_c2_b"] = _v(sd, base + "c1x1_c2.bias")
            else:
                bp["c1x1_c"] = {
                    "bn": _bn_from_eps(sd, base + "c1x1_c.bn"),
                    "conv": _w(sd, base + "c1x1_c.conv.weight")}
            bps.append(bp)
        p["stages"].append(bps)
    p["final_bn"] = _bn_from_eps(sd, prefix + "conv5_bn_ac.bn")
    return p
