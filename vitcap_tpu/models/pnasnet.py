"""PNASNet-5-Large (the reference zoo's pnasnet.py:36-347).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- everything uses TF 'SAME' asymmetric padding (pad_type='same',
  pnasnet.py:341-346) and BN eps 1e-3 — EXCEPT conv_0, a 3x3/2 VALID
  conv + bn with no act (:244-246).
- BranchSeparables (:52-74): relu -> sep(dw k/stride + pw 1x1) -> bn ->
  relu -> sep(k/1) -> bn; middle = out for stem_cell else in.
- ActConvBn (:76-90): relu -> conv -> bn.
- FactorizedReduction (:92-114): relu; path1 = x[::2, ::2] -> 1x1 conv;
  path2 = shift-by-one (crop top/left, zero-pad bottom/right) ->
  [::2, ::2] -> 1x1 conv; concat -> bn.
- cell_forward (:116-143): five comb branches — (0) two ops on x_left,
  (1,2) ops on x_right, (3) left op on comb2's OUTPUT (k3, stride 1) +
  pool of x_right, (4) op on x_left + (ActConvBn(x_right) when
  reduction else x_right) — concatenated.
- cell wiring (:289-307): each cell takes (prev-prev, prev); cells after
  a reduction use FactorizedReduction to match dims; channels
  54 -> 108 -> 216 (x4 cells) -> 432 (x4) -> 864 (x4), output 4320.
- head: relu, global avg pool, linear (num_classes defaults 1001 —
  the Cadene checkpoint's background class).

Torch state-dict loader (keys conv_0.{conv,bn}, cell_stem_0 / cell_stem_1
/ cell_{0-11}.{conv_prev_1x1,conv_1x1,comb_iter_*}, last_linear).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_batch_norm, _bn_p, _bn_from, _conv, _kaiming,
                        _v)
from .efficientnet import _conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw

Params = Dict[str, Any]

_BN_EPS = 1e-3

# cell name -> (in_left, out_left, in_right, out_right, reduction, match)
PNASNET_CELLS: List[Tuple[str, int, int, int, int, bool, bool]] = [
    ("cell_stem_1", 96, 108, 270, 108, True, True),
    ("cell_0", 270, 216, 540, 216, False, True),
    ("cell_1", 540, 216, 1080, 216, False, False),
    ("cell_2", 1080, 216, 1080, 216, False, False),
    ("cell_3", 1080, 216, 1080, 216, False, False),
    ("cell_4", 1080, 432, 1080, 432, True, False),
    ("cell_5", 1080, 432, 2160, 432, False, True),
    ("cell_6", 2160, 432, 2160, 432, False, False),
    ("cell_7", 2160, 432, 2160, 432, False, False),
    ("cell_8", 2160, 864, 2160, 864, True, False),
    ("cell_9", 2160, 864, 4320, 864, False, True),
    ("cell_10", 4320, 864, 4320, 864, False, False),
    ("cell_11", 4320, 864, 4320, 864, False, False),
]

PNASNET_FEATURES = 4320


def _bn(x, p):
    return _batch_norm(x, p, act=False, eps=_BN_EPS)


def _max_pool_same(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        "SAME")


def _branch_sep(x, p, stride):
    """BranchSeparables: relu -> dw/pw -> bn -> relu -> dw/pw -> bn."""
    x = jax.nn.relu(x)
    x = _dwconv(x, p["dw1"], stride, same=True)
    x = _conv_sym(x, p["pw1"], 1, same=True)
    x = _bn(x, p["bn1"])
    x = jax.nn.relu(x)
    x = _dwconv(x, p["dw2"], 1, same=True)
    x = _conv_sym(x, p["pw2"], 1, same=True)
    return _bn(x, p["bn2"])


def _act_conv_bn(x, p, stride=1):
    x = jax.nn.relu(x)
    x = _conv_sym(x, p["conv"], stride, same=True)
    return _bn(x, p["bn"])


def _pool_conv_bn(x, p, stride):
    """CellStem0's comb_iter_0_right: maxpool -> 1x1 conv -> bn."""
    x = _max_pool_same(x, stride)
    x = _conv_sym(x, p["conv"], 1, same=True)
    return _bn(x, p["bn"])


def _fact_reduce(x, p):
    """FactorizedReduction: two half-width stride-2 paths, one shifted
    by a pixel, concatenated then bn."""
    x = jax.nn.relu(x)
    p1 = _conv_sym(x[:, ::2, ::2, :], p["conv1"], 1, same=True)
    sh = jnp.pad(x[:, 1:, 1:, :], ((0, 0), (0, 1), (0, 1), (0, 0)))
    p2 = _conv_sym(sh[:, ::2, ::2, :], p["conv2"], 1, same=True)
    return _bn(jnp.concatenate([p1, p2], axis=-1), p["bn"])


def _cell_forward(p, x_left, x_right, stride):
    c0 = _branch_sep(x_left, p["c0_left"], stride) + (
        _pool_conv_bn(x_left, p["c0_right"], stride)
        if "conv" in p.get("c0_right", {})
        else _max_pool_same(x_left, stride))
    c1 = _branch_sep(x_right, p["c1_left"], stride) \
        + _max_pool_same(x_right, stride)
    c2 = _branch_sep(x_right, p["c2_left"], stride) \
        + _branch_sep(x_right, p["c2_right"], stride)
    c3 = _branch_sep(c2, p["c3_left"], 1) + _max_pool_same(x_right, stride)
    c4 = _branch_sep(x_left, p["c4_left"], stride)
    if "c4_right" in p:
        c4 = c4 + _act_conv_bn(x_right, p["c4_right"], stride)
    else:
        c4 = c4 + x_right
    return jnp.concatenate([c0, c1, c2, c3, c4], axis=-1)


def apply_pnasnet(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32-ish, W/32-ish, 4320) post-relu feature
    map (forward_features, pnasnet.py:295-312)."""
    x = _bn(_conv(images, p["conv_0"]["conv"], 2, "VALID"),
            p["conv_0"]["bn"])                     # true VALID 3x3/2
    s0 = p["cell_stem_0"]
    x_right = _act_conv_bn(x, s0["conv_1x1"])
    states = [x, _cell_forward(s0, x, x_right, 2)]
    for (name, _, _, _, _, red, match) in PNASNET_CELLS:
        cp = p[name]
        x_left, x_right = states[-2], states[-1]
        if match:
            x_left = _fact_reduce(x_left, cp["conv_prev_1x1"])
        else:
            x_left = _act_conv_bn(x_left, cp["conv_prev_1x1"])
        x_right = _act_conv_bn(x_right, cp["conv_1x1"])
        states.append(_cell_forward(cp, x_left, x_right,
                                    2 if red else 1))
        states = states[-2:]
    return jax.nn.relu(states[-1])


def _sep_p(ks, cin, mid, cout, k):
    return {"dw1": _kaiming_dw(next(ks), (k, k, 1, cin)),
            "pw1": _kaiming(next(ks), (1, 1, cin, mid)),
            "bn1": _bn_p(mid),
            "dw2": _kaiming_dw(next(ks), (k, k, 1, mid)),
            "pw2": _kaiming(next(ks), (1, 1, mid, cout)),
            "bn2": _bn_p(cout)}


def _acb_p(ks, cin, cout, k=1):
    return {"conv": _kaiming(next(ks), (k, k, cin, cout)),
            "bn": _bn_p(cout)}


def _cell_p(ks, in_l, out_l, in_r, out_r, reduction, stem=False):
    """comb-branch params; stem=True builds CellStem0's variants."""
    cp: Params = {}
    if stem:
        # stem_cell branches: middle = out (pnasnet.py:56)
        cp["c0_left"] = _sep_p(ks, in_l, out_l, out_l, 5)
        cp["c0_right"] = _acb_p(ks, in_l, out_l)        # pool-conv-bn
        cp["c4_left"] = _sep_p(ks, in_r, out_r, out_r, 3)
    else:
        cp["c0_left"] = _sep_p(ks, out_l, out_l, out_l, 5)
        cp["c0_right"] = {}                             # plain maxpool
        cp["c4_left"] = _sep_p(ks, out_l, out_l, out_l, 3)
    cp["c1_left"] = _sep_p(ks, out_r, out_r, out_r, 7)
    cp["c2_left"] = _sep_p(ks, out_r, out_r, out_r, 5)
    cp["c2_right"] = _sep_p(ks, out_r, out_r, out_r, 3)
    cp["c3_left"] = _sep_p(ks, out_r, out_r, out_r, 3)
    if reduction:
        cp["c4_right"] = _acb_p(ks, out_r, out_r)
    return cp


def init_pnasnet(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 1024))
    p: Params = {
        "conv_0": {"conv": _kaiming(next(ks), (3, 3, 3, 96)),
                   "bn": _bn_p(96)},
    }
    s0 = _cell_p(ks, 96, 54, 96, 54, True, stem=True)
    s0["conv_1x1"] = _acb_p(ks, 96, 54)
    p["cell_stem_0"] = s0
    for (name, in_l, out_l, in_r, out_r, red, match) in PNASNET_CELLS:
        cp = _cell_p(ks, in_l, out_l, in_r, out_r, red)
        if match:
            cp["conv_prev_1x1"] = {
                "conv1": _kaiming(next(ks), (1, 1, in_l, out_l // 2)),
                "conv2": _kaiming(next(ks), (1, 1, in_l, out_l // 2)),
                "bn": _bn_p(out_l)}
        else:
            cp["conv_prev_1x1"] = _acb_p(ks, in_l, out_l)
        cp["conv_1x1"] = _acb_p(ks, in_r, out_r)
        p[name] = cp
    return p


def _sep_from(sd, base):
    return {"dw1": _w_dw(sd, base + ".separable_1.depthwise_conv2d.weight"),
            "pw1": _w_conv(sd, base + ".separable_1.pointwise_conv2d.weight"),
            "bn1": _bn_from(sd, base + ".bn_sep_1", ),
            "dw2": _w_dw(sd, base + ".separable_2.depthwise_conv2d.weight"),
            "pw2": _w_conv(sd, base + ".separable_2.pointwise_conv2d.weight"),
            "bn2": _bn_from(sd, base + ".bn_sep_2")}


def _acb_from(sd, base):
    return {"conv": _w_conv(sd, base + ".conv.weight"),
            "bn": _bn_from(sd, base + ".bn")}


def _cell_from(sd, base, reduction, stem=False):
    cp: Params = {
        "c0_left": _sep_from(sd, base + ".comb_iter_0_left"),
        "c1_left": _sep_from(sd, base + ".comb_iter_1_left"),
        "c2_left": _sep_from(sd, base + ".comb_iter_2_left"),
        "c2_right": _sep_from(sd, base + ".comb_iter_2_right"),
        "c3_left": _sep_from(sd, base + ".comb_iter_3_left"),
        "c4_left": _sep_from(sd, base + ".comb_iter_4_left"),
    }
    if stem:
        cp["c0_right"] = {
            "conv": _w_conv(sd, base + ".comb_iter_0_right.conv.weight"),
            "bn": _bn_from(sd, base + ".comb_iter_0_right.bn")}
    else:
        cp["c0_right"] = {}
    if reduction:
        cp["c4_right"] = _acb_from(sd, base + ".comb_iter_4_right")
    return cp


def load_pnasnet(params: Params, sd: Dict[str, Any],
                 prefix: str = "") -> Params:
    """Load the reference timm PNASNet5Large torch state-dict."""
    p: Params = {
        "conv_0": {"conv": _w_conv(sd, prefix + "conv_0.conv.weight"),
                   "bn": _bn_from(sd, prefix + "conv_0.bn")},
    }
    s0 = _cell_from(sd, prefix + "cell_stem_0", True, stem=True)
    s0["conv_1x1"] = _acb_from(sd, prefix + "cell_stem_0.conv_1x1")
    p["cell_stem_0"] = s0
    for (name, _, _, _, _, red, match) in PNASNET_CELLS:
        base = prefix + name
        cp = _cell_from(sd, base, red)
        if match:
            cp["conv_prev_1x1"] = {
                "conv1": _w_conv(sd, base + ".conv_prev_1x1.path_1"
                                 ".conv.weight"),
                "conv2": _w_conv(sd, base + ".conv_prev_1x1.path_2"
                                 ".conv.weight"),
                "bn": _bn_from(sd, base + ".conv_prev_1x1.final_path_bn")}
        else:
            cp["conv_prev_1x1"] = _acb_from(sd, base + ".conv_prev_1x1")
        cp["conv_1x1"] = _acb_from(sd, base + ".conv_1x1")
        p[name] = cp
    return p
