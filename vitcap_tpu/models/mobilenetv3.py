"""MobileNetV3 large/small/rw (the reference zoo's mobilenetv3 family,
reference mobilenetv3.py:259-391 `_gen_mobilenet_v3` / `_gen_mobilenet_v3_rw`
and the non-tf variant registrations :356-391).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op.  Differences from the efficientnet family (efficientnet.py here):

- per-block activation: `nre`-tagged blocks use relu, the rest hard_swish
  (mobilenetv3.py arch defs; activations.py:74-101 hard_swish/hard_sigmoid).
- SE reduces from the block's MID channels (`reduce_mid=True`,
  efficientnet_blocks.py:45-57), divisor 8 (large/small) or 1 (rw), inner
  act relu (large/small) or the block act (rw), gate hard_sigmoid.
- fixed repeats (no depth multiplier); channels round with divisor 8.
- trailing `cn` ConvBnAct 1x1 stage (efficientnet_blocks.py:126-147), then
  the "efficient head": global-avg-pool BEFORE the 1x1 conv_head (with bias
  unless rw) + act (mobilenetv3.py:101-112).
- rw's first ds block is `noskip` (no residual even though stride 1 needs
  in==out; in==out is false there anyway — kept for exactness of intent).

Torch state-dict loader reuses the efficientnet key layout plus
`blocks.6.0.{conv,bn1}` for the cn stage and a biased `conv_head`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _drop_path, _kaiming, _v
from .efficientnet import (_conv_sym, _dwconv, _kaiming_dw, _se_p, _w_conv,
                           _w_dw, make_divisible, round_channels)

Params = Dict[str, Any]


def hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


_ACTS = {"re": jax.nn.relu, "hs": hard_swish}

# Nested like the reference arch_def: one outer tuple per STAGE row (torch
# keys are `blocks.{stage}.{i}`), each holding (type, repeats, k, stride,
# expand, out_c, se_ratio, act) entries.
# mobilenetv3.py:288-303 (large), :272-301 (small), :230-245 (rw)
_ARCH_LARGE = (
    (("ds", 1, 3, 1, 1.0, 16, 0.0, "re"),),
    (("ir", 1, 3, 2, 4.0, 24, 0.0, "re"),
     ("ir", 1, 3, 1, 3.0, 24, 0.0, "re")),
    (("ir", 3, 5, 2, 3.0, 40, 0.25, "re"),),
    (("ir", 1, 3, 2, 6.0, 80, 0.0, "hs"),
     ("ir", 1, 3, 1, 2.5, 80, 0.0, "hs"),
     ("ir", 2, 3, 1, 2.3, 80, 0.0, "hs")),
    (("ir", 2, 3, 1, 6.0, 112, 0.25, "hs"),),
    (("ir", 3, 5, 2, 6.0, 160, 0.25, "hs"),),
    (("cn", 1, 1, 1, 0.0, 960, 0.0, "hs"),),
)
_ARCH_SMALL = (
    (("ds", 1, 3, 2, 1.0, 16, 0.25, "re"),),
    (("ir", 1, 3, 2, 4.5, 24, 0.0, "re"),
     ("ir", 1, 3, 1, 3.67, 24, 0.0, "re")),
    (("ir", 1, 5, 2, 4.0, 40, 0.25, "hs"),
     ("ir", 2, 5, 1, 6.0, 40, 0.25, "hs")),
    (("ir", 2, 5, 1, 3.0, 48, 0.25, "hs"),),
    (("ir", 3, 5, 2, 6.0, 96, 0.25, "hs"),),
    (("cn", 1, 1, 1, 0.0, 576, 0.0, "hs"),),
)
_ARCH_RW = (
    (("ds", 1, 3, 1, 1.0, 16, 0.0, "re"),),  # noskip (stage 0 only)
    (("ir", 1, 3, 2, 4.0, 24, 0.0, "re"),
     ("ir", 1, 3, 1, 3.0, 24, 0.0, "re")),
    (("ir", 3, 5, 2, 3.0, 40, 0.25, "re"),),
    (("ir", 1, 3, 2, 6.0, 80, 0.0, "hs"),
     ("ir", 1, 3, 1, 2.5, 80, 0.0, "hs"),
     ("ir", 2, 3, 1, 2.3, 80, 0.0, "hs")),
    (("ir", 2, 3, 1, 6.0, 112, 0.25, "hs"),),
    (("ir", 3, 5, 2, 6.0, 160, 0.25, "hs"),),
    (("cn", 1, 1, 1, 0.0, 960, 0.0, "hs"),),
)

# 'minimal' archs (mobilenetv3.py:270-284 small, :304-321 large): all-relu,
# no SE, 3x3 kernels only; registered only as tf_ variants in the reference.
_ARCH_LARGE_MIN = (
    (("ds", 1, 3, 1, 1.0, 16, 0.0, "re"),),
    (("ir", 1, 3, 2, 4.0, 24, 0.0, "re"),
     ("ir", 1, 3, 1, 3.0, 24, 0.0, "re")),
    (("ir", 3, 3, 2, 3.0, 40, 0.0, "re"),),
    (("ir", 1, 3, 2, 6.0, 80, 0.0, "re"),
     ("ir", 1, 3, 1, 2.5, 80, 0.0, "re"),
     ("ir", 2, 3, 1, 2.3, 80, 0.0, "re")),
    (("ir", 2, 3, 1, 6.0, 112, 0.0, "re"),),
    (("ir", 3, 3, 2, 6.0, 160, 0.0, "re"),),
    (("cn", 1, 1, 1, 0.0, 960, 0.0, "re"),),
)
_ARCH_SMALL_MIN = (
    (("ds", 1, 3, 2, 1.0, 16, 0.0, "re"),),
    (("ir", 1, 3, 2, 4.5, 24, 0.0, "re"),
     ("ir", 1, 3, 1, 3.67, 24, 0.0, "re")),
    (("ir", 1, 3, 2, 4.0, 40, 0.0, "re"),
     ("ir", 2, 3, 1, 6.0, 40, 0.0, "re")),
    (("ir", 2, 3, 1, 3.0, 48, 0.0, "re"),),
    (("ir", 3, 3, 2, 6.0, 96, 0.0, "re"),),
    (("cn", 1, 1, 1, 0.0, 576, 0.0, "re"),),
)

# name -> (channel_multiplier, default img, arch, num_features, head_bias,
#          se_divisor, se_act: None = block act, stem/head act)
MOBILENETV3S = {
    "mobilenetv3_large_075": (0.75, 224, _ARCH_LARGE, 1280, True, 8, "re",
                              "hs"),
    "mobilenetv3_large_100": (1.0, 224, _ARCH_LARGE, 1280, True, 8, "re",
                              "hs"),
    "mobilenetv3_small_075": (0.75, 224, _ARCH_SMALL, 1024, True, 8, "re",
                              "hs"),
    "mobilenetv3_small_100": (1.0, 224, _ARCH_SMALL, 1024, True, 8, "re",
                              "hs"),
    "mobilenetv3_rw": (1.0, 224, _ARCH_RW, 1280, False, 1, None, "hs"),
}
# TF-ported variants (mobilenetv3.py:394-457): same builder with
# pad_type='same' + BN eps 1e-3; minimal archs exist only here.
for _cm, _sfx in ((0.75, "075"), (1.0, "100")):
    MOBILENETV3S[f"tf_mobilenetv3_large_{_sfx}"] = \
        (_cm, 224, _ARCH_LARGE, 1280, True, 8, "re", "hs")
    MOBILENETV3S[f"tf_mobilenetv3_small_{_sfx}"] = \
        (_cm, 224, _ARCH_SMALL, 1024, True, 8, "re", "hs")
MOBILENETV3S["tf_mobilenetv3_large_minimal_100"] = \
    (1.0, 224, _ARCH_LARGE_MIN, 1280, True, 8, "re", "re")
MOBILENETV3S["tf_mobilenetv3_small_minimal_100"] = \
    (1.0, 224, _ARCH_SMALL_MIN, 1024, True, 8, "re", "re")
TF_MN3 = frozenset(n for n in MOBILENETV3S if n.startswith("tf_"))


def mn3_plan(variant: str) -> Tuple[int, List[List[dict]], int, bool]:
    """Static block plan: (stem_ch, stages[[block dict]], num_features,
    head_bias).  Stage grouping follows the reference arch_def rows (one
    entry per `ir_rN_...` string), so torch keys `blocks.{stage}.{i}` map
    directly."""
    cm, _, arch, feats, head_bias, se_div, se_act, _ = MOBILENETV3S[variant]
    stem = round_channels(16, cm)
    in_c = stem
    stages: List[List[dict]] = []
    for row_i, row in enumerate(arch):
        blocks = []
        for bt, r, k, s, e, c, se, a in row:
            out = round_channels(c, cm)
            for bi in range(r):
                mid = make_divisible(in_c * e) if bt == "ir" else in_c
                blocks.append({
                    "type": bt, "k": k, "stride": s if bi == 0 else 1,
                    "in": in_c, "mid": mid, "out": out, "act": a,
                    "se": make_divisible(mid * se, se_div) if se > 0 else 0,
                    "se_act": se_act or a,
                    "noskip": variant == "mobilenetv3_rw" and row_i == 0,
                })
                in_c = out
        stages.append(blocks)
    return stem, stages, feats, head_bias


def mn3_feature_channels(variant: str) -> int:
    return mn3_plan(variant)[2]


def _se_gated(x, p, act_fn):
    """SE with hard-sigmoid gate (SqueezeExcite with gate_fn=hard_sigmoid,
    efficientnet_blocks.py:105-120)."""
    s = jnp.mean(x, axis=(1, 2))
    s = act_fn(s @ p["reduce_w"] + p["reduce_b"])
    s = s @ p["expand_w"] + p["expand_b"]
    return x * hard_sigmoid(s)[:, None, None, :]


def apply_mn3(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, cn_out) feature map (pre-pool
    forward_features, mobilenetv3.py:128-135)."""
    _, stages, _, _ = mn3_plan(variant)
    same = variant in TF_MN3
    from .efficientnet import BN_EPS_TF
    eps = BN_EPS_TF if same else 1e-5
    stem_act = _ACTS[MOBILENETV3S[variant][7]]

    def bn(x, p_):
        return _batch_norm(x, p_, act=False, eps=eps)

    x = bn(_conv_sym(images, p["stem"]["conv"], 2, same), p["stem"]["bn"])
    x = stem_act(x)
    # stochastic-depth schedule: flat block index over ALL blocks, cn
    # included (efficientnet_builder.py:252 counts every block even though
    # ConvBnAct takes no drop_path); active only inside zoo_train_mode
    block_count = sum(len(b) for b in stages)
    block_idx = 0
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            act = _ACTS[blk["act"]]
            residual = x
            if blk["type"] == "cn":
                x = act(bn(_conv_sym(x, bp["conv"], blk["stride"], same),
                           bp["bn1"]))
                block_idx += 1
                continue
            if blk["type"] == "ds":
                y = _dwconv(x, bp["conv_dw"], blk["stride"], same)
                y = act(bn(y, bp["bn1"]))
                if blk["se"]:
                    y = _se_gated(y, bp["se"], _ACTS[blk["se_act"]])
                y = _conv_sym(y, bp["conv_pw"], 1, same)
                y = bn(y, bp["bn2"])
            else:                                           # ir
                y = _conv_sym(x, bp["conv_pw"], 1, same)
                y = act(bn(y, bp["bn1"]))
                y = _dwconv(y, bp["conv_dw"], blk["stride"], same)
                y = act(bn(y, bp["bn2"]))
                if blk["se"]:
                    y = _se_gated(y, bp["se"], _ACTS[blk["se_act"]])
                y = _conv_sym(y, bp["conv_pwl"], 1, same)
                y = bn(y, bp["bn3"])
            if (blk["stride"] == 1 and blk["in"] == blk["out"]
                    and not blk["noskip"]):
                y = _drop_path(y, block_idx / block_count) + residual
            x = y
            block_idx += 1
    return x


def apply_mn3_head(p: Params, feats: jnp.ndarray, variant: str) -> jnp.ndarray:
    """Efficient head: global-avg-pool, 1x1 conv_head (+bias unless rw),
    act -> (B, num_features) (mobilenetv3.py:101-112, :136-144).  Head act
    is the model act_layer (hard_swish; relu for minimal variants)."""
    pooled = jnp.mean(feats, axis=(1, 2))
    h = pooled @ p["head"]["conv"]
    if "bias" in p["head"]:
        h = h + p["head"]["bias"]
    return _ACTS[MOBILENETV3S[variant][7]](h)


def init_mn3(rng: jax.Array, variant: str) -> Params:
    stem, stages, feats, head_bias = mn3_plan(variant)
    ks = iter(jax.random.split(rng, 256))
    p: Params = {
        "stem": {"conv": _kaiming(next(ks), (3, 3, 3, stem)),
                 "bn": _bn_p(stem)},
        "stages": [],
    }
    for blocks in stages:
        bps = []
        for blk in blocks:
            k, cin, mid, out = blk["k"], blk["in"], blk["mid"], blk["out"]
            if blk["type"] == "cn":
                bp = {"conv": _kaiming(next(ks), (k, k, cin, out)),
                      "bn1": _bn_p(out)}
            elif blk["type"] == "ds":
                bp = {"conv_dw": _kaiming_dw(next(ks), (k, k, 1, cin)),
                      "bn1": _bn_p(cin),
                      "conv_pw": _kaiming(next(ks), (1, 1, cin, out)),
                      "bn2": _bn_p(out)}
            else:
                bp = {"conv_pw": _kaiming(next(ks), (1, 1, cin, mid)),
                      "bn1": _bn_p(mid),
                      "conv_dw": _kaiming_dw(next(ks), (k, k, 1, mid)),
                      "bn2": _bn_p(mid),
                      "conv_pwl": _kaiming(next(ks), (1, 1, mid, out)),
                      "bn3": _bn_p(out)}
            if blk["se"]:
                bp["se"] = _se_p(next(ks), mid if blk["type"] == "ir"
                                 else cin, blk["se"])
            bps.append(bp)
        p["stages"].append(bps)
    cn_out = stages[-1][-1]["out"]
    head = {"conv": jax.random.normal(next(ks), (cn_out, feats),
                                      jnp.float32) * np.sqrt(2.0 / feats)}
    if head_bias:
        head["bias"] = jnp.zeros((feats,), jnp.float32)
    p["head"] = head
    return p


def load_mn3(params: Params, sd: Dict[str, Any], variant: str,
             prefix: str = "") -> Params:
    """Load the reference timm MobileNetV3 torch state-dict."""
    _, stages, _, head_bias = mn3_plan(variant)
    p: Params = {
        "stem": {"conv": _w_conv(sd, prefix + "conv_stem.weight"),
                 "bn": _bn_from(sd, prefix + "bn1")},
        "stages": [],
    }
    for si, blocks in enumerate(stages):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}blocks.{si}.{bi}."
            if blk["type"] == "cn":
                bp = {"conv": _w_conv(sd, base + "conv.weight"),
                      "bn1": _bn_from(sd, base + "bn1")}
            elif blk["type"] == "ds":
                bp = {"conv_dw": _w_dw(sd, base + "conv_dw.weight"),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_pw": _w_conv(sd, base + "conv_pw.weight"),
                      "bn2": _bn_from(sd, base + "bn2")}
            else:
                bp = {"conv_pw": _w_conv(sd, base + "conv_pw.weight"),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_dw": _w_dw(sd, base + "conv_dw.weight"),
                      "bn2": _bn_from(sd, base + "bn2"),
                      "conv_pwl": _w_conv(sd, base + "conv_pwl.weight"),
                      "bn3": _bn_from(sd, base + "bn3")}
            if blk["se"]:
                rw = np.asarray(sd[base + "se.conv_reduce.weight"])[:, :, 0, 0]
                ew = np.asarray(sd[base + "se.conv_expand.weight"])[:, :, 0, 0]
                bp["se"] = {
                    "reduce_w": jnp.asarray(rw.T, jnp.float32),
                    "reduce_b": _v(sd, base + "se.conv_reduce.bias"),
                    "expand_w": jnp.asarray(ew.T, jnp.float32),
                    "expand_b": _v(sd, base + "se.conv_expand.bias"),
                }
            bps.append(bp)
        p["stages"].append(bps)
    hw = np.asarray(sd[prefix + "conv_head.weight"])[:, :, 0, 0]   # (F, C)
    head = {"conv": jnp.asarray(hw.T, jnp.float32)}
    if head_bias:
        head["bias"] = _v(sd, prefix + "conv_head.bias")
    p["head"] = head
    return p
