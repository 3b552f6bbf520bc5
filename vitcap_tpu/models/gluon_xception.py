"""Gluon (aligned) Xception-65 (the reference zoo's
gluon_xception.py:44-262).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: SeparableConv2d carries a BN BETWEEN the depthwise and
pointwise convs (:44-66); blocks are [relu?, sep, bn] x3 with the stride
on the THIRD sep conv and a 1x1+bn skip (:68-107); entry 3x3/2 + 3x3
convs, blocks 1-3 (block1/2 without the leading relu, both followed by an
external relu only for block1), 16 middle 728-blocks, exit block20
(728, 1024, 1024) + three separable convs to 1536/1536/2048 each with
bn+relu (:110-240).

Torch state-dict loader: conv1/bn1, conv2/bn2,
{block*,mid.block*}.rep.{conv,bn}{1,2,3} (+ .skip.conv1/.skip.bn1),
conv{3,4,5}.{conv_dw,bn,conv_pw}, bn{3,4,5}, fc.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v, _w
from .efficientnet import _conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw

Params = Dict[str, Any]

GLUON_XCEPTION_FEATURES = 2048

# (torch path, in, planes-triple, stride, start_relu)
_BLOCKS = ([("block1", 64, (128, 128, 128), 2, False),
            ("block2", 128, (256, 256, 256), 2, False),
            ("block3", 256, (728, 728, 728), 2, True)]
           + [(f"mid.block{i}", 728, (728, 728, 728), 1, True)
              for i in range(4, 20)]
           + [("block20", 728, (728, 1024, 1024), 2, True)])


def _sep(x, p, stride=1):
    """SeparableConv2d: dw -> bn -> pw (gluon_xception.py:61-66)."""
    y = _dwconv(x, p["dw"], stride)
    y = _batch_norm(y, p["bn"], act=False)
    return _conv_sym(y, p["pw"])


def apply_gluon_xception(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 2048) post-act5 feature map (the
    reference forward_features, gluon_xception.py:204-239)."""
    relu = jax.nn.relu
    x = relu(_batch_norm(_conv_sym(images, p["conv1"], 2), p["bn1"],
                         act=False))
    x = relu(_batch_norm(_conv_sym(x, p["conv2"]), p["bn2"], act=False))
    for name, cin, planes, stride, start_relu in _BLOCKS:
        bp = p[name]
        skip = x
        if "skip_conv" in bp:
            skip = _batch_norm(
                jax.lax.conv_general_dilated(
                    x, bp["skip_conv"], (stride, stride), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")),
                bp["skip_bn"], act=False)
        y = x
        for i in range(3):
            if i > 0 or start_relu:
                y = relu(y)
            y = _sep(y, bp["seps"][i], stride if i == 2 else 1)
            y = _batch_norm(y, bp["bns"][i], act=False)
        x = y + skip
        if name == "block1" or name == "block20":
            x = relu(x)
    for i in (3, 4, 5):
        x = _sep(x, p[f"conv{i}"])
        x = relu(_batch_norm(x, p[f"bn{i}"], act=False))
    return x


def init_gluon_xception(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 256))

    def sep_p(cin, cout):
        return {"dw": _kaiming_dw(next(ks), (3, 3, 1, cin)),
                "bn": _bn_p(cin),
                "pw": _kaiming(next(ks), (1, 1, cin, cout))}

    p: Params = {
        "conv1": _kaiming(next(ks), (3, 3, 3, 32)), "bn1": _bn_p(32),
        "conv2": _kaiming(next(ks), (3, 3, 32, 64)), "bn2": _bn_p(64),
    }
    for name, cin, planes, stride, _ in _BLOCKS:
        bp: Params = {"seps": [], "bns": []}
        c = cin
        for i in range(3):
            bp["seps"].append(sep_p(c, planes[i]))
            bp["bns"].append(_bn_p(planes[i]))
            c = planes[i]
        if planes[-1] != cin or stride != 1:
            bp["skip_conv"] = _kaiming(next(ks), (1, 1, cin, planes[-1]))
            bp["skip_bn"] = _bn_p(planes[-1])
        p[name] = bp
    for i, (cin, cout) in zip((3, 4, 5),
                              ((1024, 1536), (1536, 1536), (1536, 2048))):
        p[f"conv{i}"] = sep_p(cin, cout)
        p[f"bn{i}"] = _bn_p(cout)
    return p


def load_gluon_xception(params: Params, sd: Dict[str, Any],
                        prefix: str = "") -> Params:
    """Load the reference timm Xception65 torch state-dict."""
    def sep_from(base):
        return {"dw": _w_dw(sd, base + ".conv_dw.weight"),
                "bn": _bn_from(sd, base + ".bn"),
                "pw": _w_conv(sd, base + ".conv_pw.weight")}

    p: Params = {
        "conv1": _w(sd, prefix + "conv1.weight"),
        "bn1": _bn_from(sd, prefix + "bn1"),
        "conv2": _w(sd, prefix + "conv2.weight"),
        "bn2": _bn_from(sd, prefix + "bn2"),
    }
    for name, cin, planes, stride, _ in _BLOCKS:
        base = f"{prefix}{name}."
        bp: Params = {"seps": [], "bns": []}
        for i in (1, 2, 3):
            bp["seps"].append(sep_from(base + f"rep.conv{i}"))
            bp["bns"].append(_bn_from(sd, base + f"rep.bn{i}"))
        if "skip_conv" in params[name]:
            bp["skip_conv"] = _w(sd, base + "skip.conv1.weight")
            bp["skip_bn"] = _bn_from(sd, base + "skip.bn1")
        p[name] = bp
    for i in (3, 4, 5):
        p[f"conv{i}"] = sep_from(f"{prefix}conv{i}")
        p[f"bn{i}"] = _bn_from(sd, f"{prefix}bn{i}")
    return p
