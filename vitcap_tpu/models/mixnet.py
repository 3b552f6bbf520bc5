"""MixNet S/M/L/XL (the reference zoo's efficientnet.py:1497-1590
_gen_mixnet_s/_gen_mixnet_m + layers/mixed_conv2d.py).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- MixedConv2d: channels split across the kernel list (first split takes
  the remainder), each chunk convolved with its own kernel (depthwise for
  conv_dw; per-chunk 1x1s for the a1.1/p1.1 expand/project convs), then
  concatenated.
- blocks are the standard DS/IR shapes with per-block relu/swish
  ('nsw' tag) and in_chs-based SE (ratios .5/.25).
- mixnet_m/l/xl depth-scale with ROUND truncation (decode_arch_def
  depth_trunc='round': max(1, round(r * dm))), unlike the ceil rule of
  the efficientnet grid.

Torch state-dict loader: conv_dw.{i}.weight for mixed convs (plain
conv_dw.weight when single-kernel), conv_pw/conv_pwl likewise.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import (BN_EPS_TF, _conv_sym, _dwconv, _kaiming_dw,
                           _relu6, _se, _se_p, _w_conv, _w_dw,
                           make_divisible, round_channels,
                           scale_stage_repeats)

Params = Dict[str, Any]


def _split_channels(c: int, n: int) -> List[int]:
    split = [c // n] * n
    split[0] += c - sum(split)
    return split


# (type, repeats, dw kernels, exp kernels, pw kernels, stride, expand,
#  out, se, act)
def _b(t, r, ks, ek, pk, s, e, c, se=0.0, a="re"):
    return (t, r, ks, ek, pk, s, e, c, se, a)


_ARCH_S = (
    (_b("ds", 1, (3,), (1,), (1,), 1, 1, 16),),
    (_b("ir", 1, (3,), (1, 1), (1, 1), 2, 6, 24),
     _b("ir", 1, (3,), (1, 1), (1, 1), 1, 3, 24)),
    (_b("ir", 1, (3, 5, 7), (1,), (1,), 2, 6, 40, 0.5, "sw"),
     _b("ir", 3, (3, 5), (1, 1), (1, 1), 1, 6, 40, 0.5, "sw")),
    (_b("ir", 1, (3, 5, 7), (1,), (1, 1), 2, 6, 80, 0.25, "sw"),
     _b("ir", 2, (3, 5), (1,), (1, 1), 1, 6, 80, 0.25, "sw")),
    (_b("ir", 1, (3, 5, 7), (1, 1), (1, 1), 1, 6, 120, 0.5, "sw"),
     _b("ir", 2, (3, 5, 7, 9), (1, 1), (1, 1), 1, 3, 120, 0.5, "sw")),
    (_b("ir", 1, (3, 5, 7, 9, 11), (1,), (1,), 2, 6, 200, 0.5, "sw"),
     _b("ir", 2, (3, 5, 7, 9), (1,), (1, 1), 1, 6, 200, 0.5, "sw")),
)
_ARCH_M = (
    (_b("ds", 1, (3,), (1,), (1,), 1, 1, 24),),
    (_b("ir", 1, (3, 5, 7), (1, 1), (1, 1), 2, 6, 32),
     _b("ir", 1, (3,), (1, 1), (1, 1), 1, 3, 32)),
    (_b("ir", 1, (3, 5, 7, 9), (1,), (1,), 2, 6, 40, 0.5, "sw"),
     _b("ir", 3, (3, 5), (1, 1), (1, 1), 1, 6, 40, 0.5, "sw")),
    (_b("ir", 1, (3, 5, 7), (1,), (1,), 2, 6, 80, 0.25, "sw"),
     _b("ir", 3, (3, 5, 7, 9), (1, 1), (1, 1), 1, 6, 80, 0.25, "sw")),
    (_b("ir", 1, (3,), (1,), (1,), 1, 6, 120, 0.5, "sw"),
     _b("ir", 3, (3, 5, 7, 9), (1, 1), (1, 1), 1, 3, 120, 0.5, "sw")),
    (_b("ir", 1, (3, 5, 7, 9), (1,), (1,), 2, 6, 200, 0.5, "sw"),
     _b("ir", 3, (3, 5, 7, 9), (1,), (1, 1), 1, 6, 200, 0.5, "sw")),
)

# name -> (arch, cm, dm, stem)
MIXNETS = {
    "mixnet_s": (_ARCH_S, 1.0, 1.0, 16),
    "mixnet_m": (_ARCH_M, 1.0, 1.0, 24),
    "mixnet_l": (_ARCH_M, 1.3, 1.0, 24),
    "mixnet_xl": (_ARCH_M, 1.6, 1.2, 24),
    "mixnet_xxl": (_ARCH_M, 2.4, 1.3, 24),   # efficientnet.py:1688-1694
}
# TF-ported mixnets (efficientnet.py:1697-1729): same archs, SAME padding
# + BN eps 1e-3.
TF_MIXNETS = {"tf_mixnet_s": "mixnet_s", "tf_mixnet_m": "mixnet_m",
              "tf_mixnet_l": "mixnet_l"}
MIXNET_FEATURES = 1536


def _resolve(variant: str):
    """-> (base variant, tf: SAME padding + BN eps 1e-3)."""
    if variant in TF_MIXNETS:
        return TF_MIXNETS[variant], True
    return variant, False


def mixnet_plan(variant: str):
    variant, _ = _resolve(variant)
    arch, cm, dm, stem0 = MIXNETS[variant]
    stem = round_channels(stem0, cm)
    in_c = stem
    stages = []
    for row in arch:
        # depth_trunc='round' with stage-sum distribution
        # (decode_arch_def(..., depth_trunc='round'), _scale_stage_depth)
        reps_row = scale_stage_repeats([b[1] for b in row], dm, "round") \
            if dm != 1.0 else [b[1] for b in row]
        blocks = []
        for (bt, r, ks, ek, pk, s, e, c, se, a), reps in zip(row, reps_row):
            out = round_channels(c, cm)
            for bi in range(reps):
                mid = make_divisible(in_c * e)
                blocks.append({
                    "type": bt, "ks": ks, "ek": ek, "pk": pk,
                    "stride": s if bi == 0 else 1,
                    "in": in_c, "mid": mid, "out": out,
                    "se": make_divisible(in_c * se, 1) if se > 0 else 0,
                    "act": a,
                })
                in_c = out
        stages.append(blocks)
    return stem, stages, MIXNET_FEATURES


def mixnet_feature_channels(variant: str) -> int:
    return MIXNET_FEATURES


def _act(x, kind):
    if kind == "re":
        return jax.nn.relu(x)
    return x * jax.nn.sigmoid(x)                       # swish


def _mixed_dw(x, ws, stride, same=False):
    """Mixed depthwise conv: channel splits per kernel (each chunk padded
    independently, matching MixedConv2d's per-kernel create_conv2d)."""
    if len(ws) == 1:
        return _dwconv(x, ws[0], stride, same)
    splits = _split_channels(x.shape[-1], len(ws))
    outs = []
    o = 0
    for w, c in zip(ws, splits):
        outs.append(_dwconv(x[..., o:o + c], w, stride, same))
        o += c
    return jnp.concatenate(outs, axis=-1)


def _mixed_pw(x, ws):
    """Mixed (grouped) 1x1 conv: in AND out channels split per kernel."""
    if len(ws) == 1:
        return _conv_sym(x, ws[0])
    splits = _split_channels(x.shape[-1], len(ws))
    outs = []
    o = 0
    for w, c in zip(ws, splits):
        outs.append(_conv_sym(x[..., o:o + c], w))
        o += c
    return jnp.concatenate(outs, axis=-1)


def apply_mixnet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 1536) feature map."""
    _, stages, _ = mixnet_plan(variant)
    _, same = _resolve(variant)
    eps = BN_EPS_TF if same else 1e-5

    def bn(x, p_):
        return _batch_norm(x, p_, act=False, eps=eps)

    x = _act(bn(_conv_sym(images, p["stem"]["conv"], 2, same),
                p["stem"]["bn"]), "re")
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            act = blk["act"]
            residual = x
            if blk["type"] == "ds":
                y = _mixed_dw(x, bp["conv_dw"], blk["stride"], same)
                y = _act(bn(y, bp["bn1"]), act)
                if blk["se"]:
                    y = _se(y, bp["se_p"], lambda v: _act(v, act))
                y = _mixed_pw(y, bp["conv_pw"])
                y = bn(y, bp["bn2"])
            else:
                y = _mixed_pw(x, bp["conv_pw"])
                y = _act(bn(y, bp["bn1"]), act)
                y = _mixed_dw(y, bp["conv_dw"], blk["stride"], same)
                y = _act(bn(y, bp["bn2"]), act)
                if blk["se"]:
                    y = _se(y, bp["se_p"], lambda v: _act(v, act))
                y = _mixed_pw(y, bp["conv_pwl"])
                y = bn(y, bp["bn3"])
            if blk["stride"] == 1 and blk["in"] == blk["out"]:
                y = y + residual
            x = y
    x = _conv_sym(x, p["pen"]["conv"])
    return _act(bn(x, p["pen"]["bn"]), "re")


def _mixed_dw_p(ks_it, kernels, c):
    splits = _split_channels(c, len(kernels))
    return [_kaiming_dw(next(ks_it), (k, k, 1, cc))
            for k, cc in zip(kernels, splits)]


def _mixed_pw_p(ks_it, kernels, cin, cout):
    si = _split_channels(cin, len(kernels))
    so = _split_channels(cout, len(kernels))
    return [_kaiming(next(ks_it), (1, 1, ci, co))
            for ci, co in zip(si, so)]


def init_mixnet(rng: jax.Array, variant: str) -> Params:
    stem, stages, pen = mixnet_plan(variant)
    ks = iter(jax.random.split(rng, 512))
    p: Params = {"stem": {"conv": _kaiming(next(ks), (3, 3, 3, stem)),
                          "bn": _bn_p(stem)},
                 "stages": []}
    for blocks in stages:
        bps = []
        for blk in blocks:
            cin, mid, out = blk["in"], blk["mid"], blk["out"]
            if blk["type"] == "ds":
                bp = {"conv_dw": _mixed_dw_p(ks, blk["ks"], cin),
                      "bn1": _bn_p(cin),
                      "conv_pw": _mixed_pw_p(ks, blk["pk"], cin, out),
                      "bn2": _bn_p(out)}
                if blk["se"]:
                    bp["se_p"] = _se_p(next(ks), cin, blk["se"])
            else:
                bp = {"conv_pw": _mixed_pw_p(ks, blk["ek"], cin, mid),
                      "bn1": _bn_p(mid),
                      "conv_dw": _mixed_dw_p(ks, blk["ks"], mid),
                      "bn2": _bn_p(mid),
                      "conv_pwl": _mixed_pw_p(ks, blk["pk"], mid, out),
                      "bn3": _bn_p(out)}
                if blk["se"]:
                    bp["se_p"] = _se_p(next(ks), mid, blk["se"])
            bps.append(bp)
        p["stages"].append(bps)
    p["pen"] = {"conv": _kaiming(next(ks), (1, 1,
                                            stages[-1][-1]["out"], pen)),
                "bn": _bn_p(pen)}
    return p


def _mixed_from(sd, base, n, dw=False):
    load = _w_dw if dw else _w_conv
    if n == 1 and base + ".weight" in sd:
        return [load(sd, base + ".weight")]
    return [load(sd, f"{base}.{i}.weight") for i in range(n)]


def load_mixnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm MixNet torch state-dict."""
    _, stages, _ = mixnet_plan(variant)
    p: Params = {"stem": {"conv": _w_conv(sd, prefix + "conv_stem.weight"),
                          "bn": _bn_from(sd, prefix + "bn1")},
                 "stages": []}
    for si, blocks in enumerate(stages):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}blocks.{si}.{bi}."
            if blk["type"] == "ds":
                bp = {"conv_dw": _mixed_from(sd, base + "conv_dw",
                                             len(blk["ks"]), dw=True),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_pw": _mixed_from(sd, base + "conv_pw",
                                             len(blk["pk"])),
                      "bn2": _bn_from(sd, base + "bn2")}
            else:
                bp = {"conv_pw": _mixed_from(sd, base + "conv_pw",
                                             len(blk["ek"])),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_dw": _mixed_from(sd, base + "conv_dw",
                                             len(blk["ks"]), dw=True),
                      "bn2": _bn_from(sd, base + "bn2"),
                      "conv_pwl": _mixed_from(sd, base + "conv_pwl",
                                              len(blk["pk"])),
                      "bn3": _bn_from(sd, base + "bn3")}
            if blk["se"]:
                from .efficientnet import _se_from
                bp["se_p"] = _se_from(sd, base + "se")
            bps.append(bp)
        p["stages"].append(bps)
    p["pen"] = {"conv": _w_conv(sd, prefix + "conv_head.weight"),
                "bn": _bn_from(sd, prefix + "bn2")}
    return p
