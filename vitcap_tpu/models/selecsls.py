"""SelecSLS (the reference zoo's selecsls.py:100-330).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: conv_bn = conv(no bias, pad ((s-1)+(k-1))//2) -> BN -> relu;
SelecSLSBlock (:110-137) runs three 3x3/1x1 conv pairs and concatenates
[d1, d2, d3 (+ the stage skip)] into conv6; `is_first` blocks start a new
skip; the head is four plain conv_bns.

Torch state-dict loader: stem.{0,1}, features.{i}.conv{1..6}.{0,1},
head.{i}.{0,1}, fc.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming
from .efficientnet import _conv_sym, _w_conv

Params = Dict[str, Any]

# (in, skip, mid, out, is_first, stride)
_F42 = ((32, 0, 64, 64, True, 2), (64, 64, 64, 128, False, 1),
        (128, 0, 144, 144, True, 2), (144, 144, 144, 288, False, 1),
        (288, 0, 304, 304, True, 2), (304, 304, 304, 480, False, 1))
_F60 = ((32, 0, 64, 64, True, 2), (64, 64, 64, 128, False, 1),
        (128, 0, 128, 128, True, 2), (128, 128, 128, 128, False, 1),
        (128, 128, 128, 288, False, 1), (288, 0, 288, 288, True, 2),
        (288, 288, 288, 288, False, 1), (288, 288, 288, 288, False, 1),
        (288, 288, 288, 416, False, 1))
_F84 = ((32, 0, 64, 64, True, 2), (64, 64, 64, 144, False, 1),
        (144, 0, 144, 144, True, 2), (144, 144, 144, 144, False, 1),
        (144, 144, 144, 144, False, 1), (144, 144, 144, 144, False, 1),
        (144, 144, 144, 304, False, 1), (304, 0, 304, 304, True, 2),
        (304, 304, 304, 304, False, 1), (304, 304, 304, 304, False, 1),
        (304, 304, 304, 304, False, 1), (304, 304, 304, 304, False, 1),
        (304, 304, 304, 512, False, 1))

# name -> (features, head convs (in, out, k, stride), num_features)
SELECSLS = {
    "selecsls42": (_F42, ((480, 960, 3, 2), (960, 1024, 3, 1),
                          (1024, 1024, 3, 2), (1024, 1280, 1, 1)), 1280),
    "selecsls42b": (_F42, ((480, 960, 3, 2), (960, 1024, 3, 1),
                           (1024, 1280, 3, 2), (1280, 1024, 1, 1)), 1024),
    "selecsls60": (_F60, ((416, 756, 3, 2), (756, 1024, 3, 1),
                          (1024, 1024, 3, 2), (1024, 1280, 1, 1)), 1280),
    "selecsls60b": (_F60, ((416, 756, 3, 2), (756, 1024, 3, 1),
                           (1024, 1280, 3, 2), (1280, 1024, 1, 1)), 1024),
    "selecsls84": (_F84, ((512, 960, 3, 2), (960, 1024, 3, 1),
                          (1024, 1024, 3, 2), (1024, 1280, 3, 1)), 1280),
}


def selecsls_feature_channels(variant: str) -> int:
    return SELECSLS[variant][2]


def _cbr(x, p, stride=1):
    return jax.nn.relu(_batch_norm(_conv_sym(x, p["conv"], stride),
                                   p["bn"], act=False))


def apply_selecsls(p: Params, images: jnp.ndarray,
                   variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> post-head NHWC feature map (the reference
    forward_features, selecsls.py:178-182)."""
    feats, head, _ = SELECSLS[variant]
    x = _cbr(images, p["stem"], 2)
    skip = None
    for bi, (cin, skc, mid, out, is_first, stride) in enumerate(feats):
        bp = p["features"][bi]
        d1 = _cbr(x, bp["conv1"], stride)
        d2 = _cbr(_cbr(d1, bp["conv2"]), bp["conv3"])
        d3 = _cbr(_cbr(d2, bp["conv4"]), bp["conv5"])
        if is_first:
            x = _cbr(jnp.concatenate([d1, d2, d3], axis=-1), bp["conv6"])
            skip = x
        else:
            x = _cbr(jnp.concatenate([d1, d2, d3, skip], axis=-1),
                     bp["conv6"])
    for hi, (_, _, _, stride) in enumerate(head):
        x = _cbr(x, p["head"][hi], stride)
    return x


def init_selecsls(rng: jax.Array, variant: str) -> Params:
    feats, head, _ = SELECSLS[variant]
    ks = iter(jax.random.split(rng, 256))

    def cb(cin, cout, k):
        return {"conv": _kaiming(next(ks), (k, k, cin, cout)),
                "bn": _bn_p(cout)}

    p: Params = {"stem": cb(3, 32, 3), "features": [], "head": []}
    for cin, skc, mid, out, is_first, _ in feats:
        p["features"].append({
            "conv1": cb(cin, mid, 3),
            "conv2": cb(mid, mid, 1),
            "conv3": cb(mid, mid // 2, 3),
            "conv4": cb(mid // 2, mid, 1),
            "conv5": cb(mid, mid // 2, 3),
            "conv6": cb(2 * mid + (0 if is_first else skc), out, 1),
        })
    for cin, cout, k, _ in head:
        p["head"].append(cb(cin, cout, k))
    return p


def load_selecsls(params: Params, sd: Dict[str, Any], variant: str,
                  prefix: str = "") -> Params:
    """Load the reference timm SelecSLS torch state-dict."""
    def cb_from(base):
        return {"conv": _w_conv(sd, base + ".0.weight"),
                "bn": _bn_from(sd, base + ".1")}

    p: Params = {"stem": cb_from(prefix + "stem"), "features": [],
                 "head": []}
    for bi in range(len(params["features"])):
        p["features"].append({
            f"conv{i}": cb_from(f"{prefix}features.{bi}.conv{i}")
            for i in range(1, 7)})
    for hi in range(len(params["head"])):
        p["head"].append(cb_from(f"{prefix}head.{hi}"))
    return p
