"""NASNet-A-Large (6 @ 4032) — the reference zoo's nasnet.py:30-562.

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op.  All cells use TF 'SAME' pads (pad_type='same',
nasnet.py:555-561) and BN eps 1e-3; conv0 is a 3x3/2 VALID conv + bn,
no act (:419-421).

Cell types (channels c = 4032 // 24 = 168):

- CellStem0 (:88-131): x1 = ActConvBn(96 -> 42); five comb branches over
  (x_raw, x1) with stem-cell separables (middle = out) on the raw input;
  output concat of combs 1-4 (comb 0 feeds combs 3/4 only) = 168.
- CellStem1 (:134-200): x_left = ActConvBn(stem0 out), x_right =
  factorized-reduce(relu(conv0 out)) (avgpool-subsample + shifted path,
  :141-151); same reduction comb topology; out 336.
- FirstCell (:203-262): x_left = factorized-reduce(relu(x_prev)),
  x_right = ActConvBn(x); normal comb topology, SIX-way concat
  ([x_left, comb0..comb4]).
- NormalCell (:265-307): both inputs through ActConvBn, same topology.
- ReductionCell0/1 (:310-404, identical): sep5/7-stride-2 + pool
  branches; concat of combs 1-4.
- wiring (:516-543): each cell takes (prev, prev-prev) EXCEPT the
  FirstCell directly after each reduction, whose x_prev skips the
  pre-reduction cell (cell_6 sees cell_4, cell_12 sees cell_10).
- head: relu, global avg pool, linear (num_classes 1001 — Cadene
  checkpoint background class).

Torch state-dict loader (keys conv0.{conv,bn}, cell_stem_0/1.*,
cell_{0-17}.*, reduction_cell_0/1.*, last_linear).
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
NASNET_FEATURES = 4032
_C = NASNET_FEATURES // 24                     # 168

# name -> (kind, in_left, out_left, in_right, out_right, prev_offset)
NASNET_CELLS: List[Tuple[str, str, int, int, int, int, int]] = [
    ("cell_0", "first", _C, _C // 2, 2 * _C, _C, 2),
    ("cell_1", "normal", 2 * _C, _C, 6 * _C, _C, 2),
    ("cell_2", "normal", 6 * _C, _C, 6 * _C, _C, 2),
    ("cell_3", "normal", 6 * _C, _C, 6 * _C, _C, 2),
    ("cell_4", "normal", 6 * _C, _C, 6 * _C, _C, 2),
    ("cell_5", "normal", 6 * _C, _C, 6 * _C, _C, 2),
    ("reduction_cell_0", "reduction", 6 * _C, 2 * _C, 6 * _C, 2 * _C, 2),
    ("cell_6", "first", 6 * _C, _C, 8 * _C, 2 * _C, 3),
    ("cell_7", "normal", 8 * _C, 2 * _C, 12 * _C, 2 * _C, 2),
    ("cell_8", "normal", 12 * _C, 2 * _C, 12 * _C, 2 * _C, 2),
    ("cell_9", "normal", 12 * _C, 2 * _C, 12 * _C, 2 * _C, 2),
    ("cell_10", "normal", 12 * _C, 2 * _C, 12 * _C, 2 * _C, 2),
    ("cell_11", "normal", 12 * _C, 2 * _C, 12 * _C, 2 * _C, 2),
    ("reduction_cell_1", "reduction", 12 * _C, 4 * _C, 12 * _C, 4 * _C, 2),
    ("cell_12", "first", 12 * _C, 2 * _C, 16 * _C, 4 * _C, 3),
    ("cell_13", "normal", 16 * _C, 4 * _C, 24 * _C, 4 * _C, 2),
    ("cell_14", "normal", 24 * _C, 4 * _C, 24 * _C, 4 * _C, 2),
    ("cell_15", "normal", 24 * _C, 4 * _C, 24 * _C, 4 * _C, 2),
    ("cell_16", "normal", 24 * _C, 4 * _C, 24 * _C, 4 * _C, 2),
    ("cell_17", "normal", 24 * _C, 4 * _C, 24 * _C, 4 * _C, 2),
]


def _bn(x, p):
    return _batch_norm(x, p, act=False, eps=_BN_EPS)


def _max_pool_same(x, stride):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        "SAME")


def _avg_pool_same(x, stride):
    """create_pool2d('avg', 3, stride, padding='same',
    count_include_pad=False) resolves to TWO different semantics:

    - stride 2 -> dynamic AvgPool2dSame, which pads EXTERNALLY with
      zeros then calls avg_pool2d with padding 0 — count_include_pad is
      a no-op and border windows still divide by 9
      (layers/pool2d_same.py:15-18 FIXME note);
    - stride 1 -> 'SAME' is static symmetric pad 1, so create_pool2d
      returns a plain nn.AvgPool2d(3, 1, 1, count_include_pad=False)
      (pool2d_same.py:66-71) that divides by the VALID element count
      (6 at edges, 4 at corners)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, stride, stride, 1), "SAME")
    if stride == 2:
        return s / 9.0
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    return s / n


def _branch_sep(x, p, stride):
    """BranchSeparables: relu -> dw/pw -> bn -> relu -> dw/pw -> bn;
    both separables use the SAME kernel size (nasnet.py:62-85)."""
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


def _fact_reduce(x, p):
    """relu -> two stride-2 subsample paths (one shifted by a pixel)
    -> 1x1 convs -> concat -> bn (CellStem1/FirstCell paths)."""
    x = jax.nn.relu(x)
    p1 = _conv_sym(x[:, ::2, ::2, :], p["conv1"], 1, same=True)
    sh = jnp.pad(x[:, 1:, 1:, :], ((0, 0), (0, 1), (0, 1), (0, 0)))
    p2 = _conv_sym(sh[:, ::2, ::2, :], p["conv2"], 1, same=True)
    return _bn(jnp.concatenate([p1, p2], axis=-1), p["bn"])


def _reduction_combs(p, x_left, x_right):
    """The shared stem/reduction comb topology over (x_left, x_right):
    left ops run on x_left for stems (x1) / x_right for reductions —
    callers pass operands in cell_forward order."""
    c0 = _branch_sep(x_left, p["c0_left"], 2) \
        + _branch_sep(x_right, p["c0_right"], 2)
    c1 = _max_pool_same(x_left, 2) + _branch_sep(x_right, p["c1_right"], 2)
    c2 = _avg_pool_same(x_left, 2) + _branch_sep(x_right, p["c2_right"], 2)
    c3 = _avg_pool_same(c0, 1) + c1
    c4 = _branch_sep(c0, p["c4_left"], 1) + _max_pool_same(x_left, 2)
    return jnp.concatenate([c1, c2, c3, c4], axis=-1)


def _normal_combs(p, x_left, x_right):
    """FirstCell/NormalCell topology: six-way concat (nasnet.py:229-261)."""
    c0 = _branch_sep(x_right, p["c0_left"], 1) \
        + _branch_sep(x_left, p["c0_right"], 1)
    c1 = _branch_sep(x_left, p["c1_left"], 1) \
        + _branch_sep(x_left, p["c1_right"], 1)
    c2 = _avg_pool_same(x_right, 1) + x_left
    c3 = _avg_pool_same(x_left, 1) + _avg_pool_same(x_left, 1)
    c4 = _branch_sep(x_right, p["c4_left"], 1) + x_right
    return jnp.concatenate([x_left, c0, c1, c2, c3, c4], axis=-1)


def apply_nasnet(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, ~H/32, ~W/32, 4032) post-relu feature map
    (forward_features, nasnet.py:516-545)."""
    x_conv0 = _bn(_conv(images, p["conv0"]["conv"], 2, "VALID"),
                  p["conv0"]["bn"])               # true VALID 3x3/2
    s0 = p["cell_stem_0"]
    x1 = _act_conv_bn(x_conv0, s0["conv_1x1"])
    x_stem_0 = _reduction_combs(s0, x1, x_conv0)
    s1 = p["cell_stem_1"]
    x_left = _act_conv_bn(x_stem_0, s1["conv_1x1"])
    x_right = _fact_reduce(x_conv0, s1["path"])
    x_stem_1 = _reduction_combs(s1, x_left, x_right)
    states = [x_stem_0, x_stem_1]
    for (name, kind, _, _, _, _, poff) in NASNET_CELLS:
        cp = p[name]
        x, x_prev = states[-1], states[-poff]
        if kind == "first":
            x_left = _fact_reduce(x_prev, cp["path"])
            x_right = _act_conv_bn(x, cp["conv_1x1"])
            out = _normal_combs(cp, x_left, x_right)
        elif kind == "normal":
            x_left = _act_conv_bn(x_prev, cp["conv_prev_1x1"])
            x_right = _act_conv_bn(x, cp["conv_1x1"])
            out = _normal_combs(cp, x_left, x_right)
        else:                                   # reduction
            x_left = _act_conv_bn(x_prev, cp["conv_prev_1x1"])
            x_right = _act_conv_bn(x, cp["conv_1x1"])
            # cell_forward runs left ops on x_right (nasnet.py:331-350)
            out = _reduction_combs(cp, x_right, x_left)
        states.append(out)
        states = states[-3:]
    return jax.nn.relu(states[-1])


def _sep_p(ks, cin, mid, cout, k):
    return {"dw1": _kaiming_dw(next(ks), (k, k, 1, cin)),
            "pw1": _kaiming(next(ks), (1, 1, cin, mid)),
            "bn1": _bn_p(mid),
            "dw2": _kaiming_dw(next(ks), (k, k, 1, mid)),
            "pw2": _kaiming(next(ks), (1, 1, mid, cout)),
            "bn2": _bn_p(cout)}


def _acb_p(ks, cin, cout):
    return {"conv": _kaiming(next(ks), (1, 1, cin, cout)),
            "bn": _bn_p(cout)}


def _path_p(ks, cin, cout):
    return {"conv1": _kaiming(next(ks), (1, 1, cin, cout // 2)),
            "conv2": _kaiming(next(ks), (1, 1, cin, cout // 2)),
            "bn": _bn_p(cout)}


def _red_p(ks, nl, nr, stem_in=0):
    """reduction comb params; stem_in != 0 builds the stem-cell right
    branches (middle = out) from the raw input."""
    rin = stem_in or nr
    mid = nr if stem_in else rin
    return {"c0_left": _sep_p(ks, nl, nl, nl, 5),
            "c0_right": _sep_p(ks, rin, mid, nr, 7),
            "c1_right": _sep_p(ks, rin, mid, nr, 7),
            "c2_right": _sep_p(ks, rin, mid, nr, 5),
            "c4_left": _sep_p(ks, nl, nl, nl, 3)}


def _norm_p_cell(ks, out_l, out_r):
    return {"c0_left": _sep_p(ks, out_r, out_r, out_r, 5),
            "c0_right": _sep_p(ks, out_l, out_l, out_l, 3),
            "c1_left": _sep_p(ks, out_l, out_l, out_l, 5),
            "c1_right": _sep_p(ks, out_l, out_l, out_l, 3),
            "c4_left": _sep_p(ks, out_r, out_r, out_r, 3)}


def init_nasnet(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 2048))
    p: Params = {
        "conv0": {"conv": _kaiming(next(ks), (3, 3, 3, 96)),
                  "bn": _bn_p(96)},
    }
    c = _C // 4                                # 42
    s0 = _red_p(ks, c, c, stem_in=96)
    s0["conv_1x1"] = _acb_p(ks, 96, c)
    p["cell_stem_0"] = s0
    s1 = _red_p(ks, 2 * c, 2 * c)
    s1["conv_1x1"] = _acb_p(ks, 4 * c, 2 * c)
    s1["path"] = _path_p(ks, 96, 2 * c)
    p["cell_stem_1"] = s1
    for (name, kind, in_l, out_l, in_r, out_r, _) in NASNET_CELLS:
        if kind == "first":
            cp = _norm_p_cell(ks, 2 * out_l, out_r)
            cp["path"] = _path_p(ks, in_l, 2 * out_l)
            cp["conv_1x1"] = _acb_p(ks, in_r, out_r)
        elif kind == "normal":
            cp = _norm_p_cell(ks, out_l, out_r)
            cp["conv_prev_1x1"] = _acb_p(ks, in_l, out_l)
            cp["conv_1x1"] = _acb_p(ks, in_r, out_r)
        else:
            cp = _red_p(ks, out_r, out_l)
            cp["conv_prev_1x1"] = _acb_p(ks, in_l, out_l)
            cp["conv_1x1"] = _acb_p(ks, in_r, out_r)
        p[name] = cp
    return p


def _sep_from(sd, base):
    return {"dw1": _w_dw(sd, base + ".separable_1.depthwise_conv2d.weight"),
            "pw1": _w_conv(sd, base + ".separable_1.pointwise_conv2d.weight"),
            "bn1": _bn_from(sd, base + ".bn_sep_1"),
            "dw2": _w_dw(sd, base + ".separable_2.depthwise_conv2d.weight"),
            "pw2": _w_conv(sd, base + ".separable_2.pointwise_conv2d.weight"),
            "bn2": _bn_from(sd, base + ".bn_sep_2")}


def _acb_from(sd, base):
    return {"conv": _w_conv(sd, base + ".conv.weight"),
            "bn": _bn_from(sd, base + ".bn")}


def _path_from(sd, base, bn_key):
    return {"conv1": _w_conv(sd, base + ".path_1.conv.weight"),
            "conv2": _w_conv(sd, base + ".path_2.conv.weight"),
            "bn": _bn_from(sd, base + "." + bn_key)}


def _red_from(sd, base):
    return {"c0_left": _sep_from(sd, base + ".comb_iter_0_left"),
            "c0_right": _sep_from(sd, base + ".comb_iter_0_right"),
            "c1_right": _sep_from(sd, base + ".comb_iter_1_right"),
            "c2_right": _sep_from(sd, base + ".comb_iter_2_right"),
            "c4_left": _sep_from(sd, base + ".comb_iter_4_left")}


def _norm_from(sd, base):
    return {"c0_left": _sep_from(sd, base + ".comb_iter_0_left"),
            "c0_right": _sep_from(sd, base + ".comb_iter_0_right"),
            "c1_left": _sep_from(sd, base + ".comb_iter_1_left"),
            "c1_right": _sep_from(sd, base + ".comb_iter_1_right"),
            "c4_left": _sep_from(sd, base + ".comb_iter_4_left")}


def load_nasnet(params: Params, sd: Dict[str, Any],
                prefix: str = "") -> Params:
    """Load the reference timm NASNetALarge torch state-dict."""
    p: Params = {
        "conv0": {"conv": _w_conv(sd, prefix + "conv0.conv.weight"),
                  "bn": _bn_from(sd, prefix + "conv0.bn")},
    }
    s0 = _red_from(sd, prefix + "cell_stem_0")
    s0["conv_1x1"] = _acb_from(sd, prefix + "cell_stem_0.conv_1x1")
    p["cell_stem_0"] = s0
    s1 = _red_from(sd, prefix + "cell_stem_1")
    s1["conv_1x1"] = _acb_from(sd, prefix + "cell_stem_1.conv_1x1")
    s1["path"] = _path_from(sd, prefix + "cell_stem_1", "final_path_bn")
    p["cell_stem_1"] = s1
    for (name, kind, _, _, _, _, _2) in NASNET_CELLS:
        base = prefix + name
        if kind == "first":
            cp = _norm_from(sd, base)
            cp["path"] = _path_from(sd, base, "final_path_bn")
            cp["conv_1x1"] = _acb_from(sd, base + ".conv_1x1")
        elif kind == "normal":
            cp = _norm_from(sd, base)
            cp["conv_prev_1x1"] = _acb_from(sd, base + ".conv_prev_1x1")
            cp["conv_1x1"] = _acb_from(sd, base + ".conv_1x1")
        else:
            cp = _red_from(sd, base)
            cp["conv_prev_1x1"] = _acb_from(sd, base + ".conv_prev_1x1")
            cp["conv_1x1"] = _acb_from(sd, base + ".conv_1x1")
        p[name] = cp
    return p
