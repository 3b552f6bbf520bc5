"""Aligned Xception 41/65/71 (the reference zoo's
xception_aligned.py:43-240).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: SeparableConv2d = dw conv -> bn(eps 1e-3) -> [relu] -> 1x1 pw
-> bn -> [relu] (internal relus only in the final no-skip module, which
has start_with_relu=False); XceptionModule = [relu + sep] x3 with the
stride on the third conv and a 1x1 conv+bn shortcut; two-ConvBnAct stem;
ClassifierHead (head.fc).

Torch state-dict loader: stem.{0,1}.{conv,bn},
blocks.{i}.stack.conv{1,2,3}.{conv_dw,bn_dw,conv_pw,bn_pw},
blocks.{i}.shortcut.{conv,bn}, head.fc.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _kaiming, _v, _w
from .efficientnet import _conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw

Params = Dict[str, Any]

_BN_EPS = 1e-3


def _blocks_cfg(variant: str):
    """(in, out3, stride, start_relu, no_skip) per module."""
    mid = {"xception41": 8, "xception65": 16, "xception71": 16}[variant]
    if variant == "xception71":
        entry = [(64, (128,) * 3, 2), (128, (256,) * 3, 1),
                 (256, (256,) * 3, 2), (256, (728,) * 3, 1),
                 (728, (728,) * 3, 2)]
    else:
        entry = [(64, (128,) * 3, 2), (128, (256,) * 3, 2),
                 (256, (728,) * 3, 2)]
    cfg = [(i, o, s, True, False) for i, o, s in entry]
    cfg += [(728, (728,) * 3, 1, True, False)] * mid
    cfg += [(728, (728, 1024, 1024), 2, True, False),
            (1024, (1536, 1536, 2048), 1, False, True)]
    return cfg


XCEPTION_ALIGNED = ("xception41", "xception65", "xception71")
XCEPTION_ALIGNED_FEATURES = 2048


def _bn(x, p):
    return _batch_norm(x, p, act=False, eps=_BN_EPS)


def _sep(x, p, stride, internal_act):
    y = _bn(_dwconv(x, p["dw"], stride), p["bn_dw"])
    if internal_act:
        y = jax.nn.relu(y)
    y = _bn(_conv_sym(y, p["pw"]), p["bn_pw"])
    return jax.nn.relu(y) if internal_act else y


def apply_xception_aligned(p: Params, images: jnp.ndarray,
                           variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 2048) feature map."""
    relu = jax.nn.relu
    x = relu(_bn(_conv_sym(images, p["stem"][0]["conv"], 2),
                 p["stem"][0]["bn"]))
    x = relu(_bn(_conv_sym(x, p["stem"][1]["conv"]), p["stem"][1]["bn"]))
    for bi, (cin, outs, stride, start_relu, no_skip) in \
            enumerate(_blocks_cfg(variant)):
        bp = p["blocks"][bi]
        skip = x
        y = x
        for i in range(3):
            if start_relu:
                y = relu(y)
            y = _sep(y, bp["seps"][i], stride if i == 2 else 1,
                     internal_act=not start_relu)
        if no_skip:
            x = y
        else:
            if "shortcut" in bp:
                skip = _bn(
                    jax.lax.conv_general_dilated(
                        x, bp["shortcut"]["conv"], (stride, stride),
                        "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")),
                    bp["shortcut"]["bn"])
            x = y + skip
    return x


def _bn_p(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def init_xception_aligned(rng: jax.Array, variant: str) -> Params:
    ks = iter(jax.random.split(rng, 256))

    def sep_p(cin, cout):
        return {"dw": _kaiming_dw(next(ks), (3, 3, 1, cin)),
                "bn_dw": _bn_p(cin),
                "pw": _kaiming(next(ks), (1, 1, cin, cout)),
                "bn_pw": _bn_p(cout)}

    p: Params = {"stem": [
        {"conv": _kaiming(next(ks), (3, 3, 3, 32)), "bn": _bn_p(32)},
        {"conv": _kaiming(next(ks), (3, 3, 32, 64)), "bn": _bn_p(64)},
    ], "blocks": []}
    for cin, outs, stride, start_relu, no_skip in _blocks_cfg(variant):
        bp: Params = {"seps": []}
        c = cin
        for i in range(3):
            bp["seps"].append(sep_p(c, outs[i]))
            c = outs[i]
        if not no_skip and (outs[-1] != cin or stride != 1):
            bp["shortcut"] = {
                "conv": _kaiming(next(ks), (1, 1, cin, outs[-1])),
                "bn": _bn_p(outs[-1])}
        p["blocks"].append(bp)
    return p


def _bn_from_eps(sd, base):
    return {"scale": _v(sd, base + ".weight"),
            "bias": _v(sd, base + ".bias"),
            "mean": _v(sd, base + ".running_mean"),
            "var": _v(sd, base + ".running_var")}


def load_xception_aligned(params: Params, sd: Dict[str, Any],
                          variant: str, prefix: str = "") -> Params:
    """Load the reference timm XceptionAligned torch state-dict."""
    def sep_from(base):
        return {"dw": _w_dw(sd, base + ".conv_dw.weight"),
                "bn_dw": _bn_from_eps(sd, base + ".bn_dw"),
                "pw": _w_conv(sd, base + ".conv_pw.weight"),
                "bn_pw": _bn_from_eps(sd, base + ".bn_pw")}

    p: Params = {"stem": [
        {"conv": _w(sd, prefix + "stem.0.conv.weight"),
         "bn": _bn_from_eps(sd, prefix + "stem.0.bn")},
        {"conv": _w(sd, prefix + "stem.1.conv.weight"),
         "bn": _bn_from_eps(sd, prefix + "stem.1.bn")},
    ], "blocks": []}
    for bi, blk in enumerate(params["blocks"]):
        base = f"{prefix}blocks.{bi}."
        bp: Params = {"seps": [sep_from(base + f"stack.conv{i}")
                               for i in (1, 2, 3)]}
        if "shortcut" in blk:
            bp["shortcut"] = {
                "conv": _w(sd, base + "shortcut.conv.weight"),
                "bn": _bn_from_eps(sd, base + "shortcut.bn")}
        p["blocks"].append(bp)
    return p
