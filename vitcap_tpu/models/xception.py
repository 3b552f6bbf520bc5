"""Xception (the reference zoo's xception.py:51-233).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- entry: 3x3/2 conv (NO padding) -> bn+relu -> 3x3/1 conv (no padding) ->
  bn+relu (xception.py:126-132).
- 12 blocks (:65-106): chains of [relu, SeparableConv2d 3x3 pad 1, bn]
  (first relu dropped in block1), optional trailing MaxPool2d(3, 2, pad 1)
  on strided blocks, 1x1-conv+bn skip when shape changes, residual add.
  grow_first=False in block12 widens on the LAST rep.
- tail: separable 1024->1536 and 1536->2048 convs, each bn+relu; head fc.

Torch state-dict loader: conv1/bn1, conv2/bn2,
block{n}.rep.{i}.{conv1,pointwise}/bn, block{n}.{skip,skipbn}, conv3/bn3,
conv4/bn4, fc.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import _conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw

Params = Dict[str, Any]

# (in, out, reps, stride, start_relu, grow_first) — xception.py:135-149
XCEPTION_BLOCKS = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 1024, 2, 2, True, False),
)

XCEPTION_FEATURES = 2048


def _rep_channels(cin, cout, reps, grow_first):
    """Per-rep (in, out) channel pairs (xception.py:76-84)."""
    pairs = []
    for i in range(reps):
        if grow_first:
            pairs.append((cin if i == 0 else cout, cout))
        else:
            pairs.append((cin, cin if i < reps - 1 else cout))
    return pairs


def _conv_valid(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _maxpool3_p1(x, stride):
    """MaxPool2d(3, stride, padding=1), floor mode."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        "VALID")


def apply_xception(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, ~H/32, ~W/32, 2048) post-act4 feature map (the
    reference forward_features, xception.py:182-211)."""
    relu = jax.nn.relu
    x = relu(_batch_norm(_conv_valid(images, p["conv1"], 2), p["bn1"],
                         act=False))
    x = relu(_batch_norm(_conv_valid(x, p["conv2"]), p["bn2"], act=False))
    for bi, (cin, cout, reps, stride, start_relu, grow) in \
            enumerate(XCEPTION_BLOCKS):
        bp = p["blocks"][bi]
        y = x
        for i, sp in enumerate(bp["seps"]):
            if i > 0 or start_relu:
                y = relu(y)
            y = _dwconv(y, sp["dw"])
            y = _conv_sym(y, sp["pw"])
            y = _batch_norm(y, sp["bn"], act=False)
        if stride != 1:
            y = _maxpool3_p1(y, stride)
        if "skip" in bp:
            skip = _batch_norm(_conv_valid(x, bp["skip"], stride),
                               bp["skipbn"], act=False)
        else:
            skip = x
        x = y + skip
    # tail separable convs
    x = _conv_sym(_dwconv(x, p["conv3"]["dw"]), p["conv3"]["pw"])
    x = relu(_batch_norm(x, p["bn3"], act=False))
    x = _conv_sym(_dwconv(x, p["conv4"]["dw"]), p["conv4"]["pw"])
    return relu(_batch_norm(x, p["bn4"], act=False))


def init_xception(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 128))
    p: Params = {
        "conv1": _kaiming(next(ks), (3, 3, 3, 32)), "bn1": _bn_p(32),
        "conv2": _kaiming(next(ks), (3, 3, 32, 64)), "bn2": _bn_p(64),
        "blocks": [],
    }
    for cin, cout, reps, stride, _, grow in XCEPTION_BLOCKS:
        bp: Params = {"seps": []}
        for ri, ro in _rep_channels(cin, cout, reps, grow):
            bp["seps"].append({
                "dw": _kaiming_dw(next(ks), (3, 3, 1, ri)),
                "pw": _kaiming(next(ks), (1, 1, ri, ro)),
                "bn": _bn_p(ro),
            })
        if cin != cout or stride != 1:
            bp["skip"] = _kaiming(next(ks), (1, 1, cin, cout))
            bp["skipbn"] = _bn_p(cout)
        p["blocks"].append(bp)
    p["conv3"] = {"dw": _kaiming_dw(next(ks), (3, 3, 1, 1024)),
                  "pw": _kaiming(next(ks), (1, 1, 1024, 1536))}
    p["bn3"] = _bn_p(1536)
    p["conv4"] = {"dw": _kaiming_dw(next(ks), (3, 3, 1, 1536)),
                  "pw": _kaiming(next(ks), (1, 1, 1536, XCEPTION_FEATURES))}
    p["bn4"] = _bn_p(XCEPTION_FEATURES)
    return p


def load_xception(params: Params, sd: Dict[str, Any],
                  prefix: str = "") -> Params:
    """Load the reference timm Xception torch state-dict."""
    p: Params = {
        "conv1": _w_conv(sd, prefix + "conv1.weight"),
        "bn1": _bn_from(sd, prefix + "bn1"),
        "conv2": _w_conv(sd, prefix + "conv2.weight"),
        "bn2": _bn_from(sd, prefix + "bn2"),
        "blocks": [],
    }
    for bi, (cin, cout, reps, stride, start_relu, grow) in \
            enumerate(XCEPTION_BLOCKS):
        base = f"{prefix}block{bi + 1}.rep."
        # rep Sequential: [relu?] + reps x [sep, bn] interleaved with relus
        # indices: first sep at 0 if not start_relu else 1, then +3 each
        first = 0 if not start_relu else 1
        bp: Params = {"seps": []}
        for i in range(reps):
            si = first + 3 * i
            bp["seps"].append({
                "dw": _w_dw(sd, f"{base}{si}.conv1.weight"),
                "pw": _w_conv(sd, f"{base}{si}.pointwise.weight"),
                "bn": _bn_from(sd, f"{base}{si + 1}"),
            })
        if cin != cout or stride != 1:
            bp["skip"] = _w_conv(sd, f"{prefix}block{bi + 1}.skip.weight")
            bp["skipbn"] = _bn_from(sd, f"{prefix}block{bi + 1}.skipbn")
        p["blocks"].append(bp)
    p["conv3"] = {"dw": _w_dw(sd, prefix + "conv3.conv1.weight"),
                  "pw": _w_conv(sd, prefix + "conv3.pointwise.weight")}
    p["bn3"] = _bn_from(sd, prefix + "bn3")
    p["conv4"] = {"dw": _w_dw(sd, prefix + "conv4.conv1.weight"),
                  "pw": _w_conv(sd, prefix + "conv4.pointwise.weight")}
    p["bn4"] = _bn_from(sd, prefix + "bn4")
    return p
