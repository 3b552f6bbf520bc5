"""EfficientNet B0-B8 + Lite0-4 (the reference zoo's efficientnet family,
reference efficientnet.py:667-711 `_gen_efficientnet`, :772-810
`_gen_efficientnet_lite`, :1002-1097 variant registrations).

Functional NHWC, eval semantics (BatchNorm on running stats, drop-path
inactive), matching the reference's torch graph op-for-op:

- arch decode: per-stage repeats scale by `ceil(r * depth_multiplier)`
  (efficientnet_builder.py:155-190 `_scale_stage_depth`, depth_trunc='ceil';
  lite variants pin the first and last stage, :206-207 `fix_first_last`);
  channels round via `round_channels`/`make_divisible` divisor 8 with the
  0.9 floor guard (efficientnet_blocks.py:68-82).
- blocks: DepthwiseSeparable (dw -> bn+act -> SE -> pw -> bn, residual when
  stride 1 and in==out; efficientnet_blocks.py:147-205) and InvertedResidual
  (pw expand -> bn+act -> dw -> bn+act -> SE -> pw-linear -> bn, residual;
  :207-280).  SE reduces to `make_divisible(block_in * se_ratio, 1)` acting
  on the EXPANDED features (SqueezeExcite :105-120, resolve_se_args :45-57:
  reduced_base_chs = block input channels, divisor 1).
- stem conv 3x3/2 (rounded channels unless lite's fix_stem), head 1x1 conv
  to `round_channels(1280 * cm)` (1280 fixed for lite), both bn+act
  (efficientnet.py:342-361).
- act: swish (b-series) / relu6 (lite); BN eps 1e-5 (non-tf defaults).
- padding: torch-symmetric k//2 explicit pads + VALID convs (create_conv2d
  pad_type='' -> layers/padding.py get_padding), NOT TF-'SAME'.

Torch state-dict loader at the bottom (keys: conv_stem, bn1, blocks.s.i.*,
conv_head, bn2, classifier).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _drop_path, _kaiming, _v

Params = Dict[str, Any]


def make_divisible(v: float, divisor: int = 8, min_value=None) -> int:
    """efficientnet_blocks.py:68-74 (incl. the <0.9v bump)."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def round_channels(channels: float, multiplier: float = 1.0,
                   divisor: int = 8) -> int:
    if not multiplier:
        return int(channels)
    return make_divisible(channels * multiplier, divisor)


def scale_stage_repeats(repeats: List[int], dm: float,
                        trunc: str = "ceil") -> List[int]:
    """_scale_stage_depth (efficientnet_builder.py:156-190): scale the
    stage's TOTAL repeat count, then distribute to the entries in REVERSE
    (so the first block of a stage is least likely to be scaled).  This
    differs from per-entry rounding whenever a stage has >1 arch entries
    (e.g. mixnet dm=1.3: repeats (1,1) -> (1,2), not (1,1))."""
    num = sum(repeats)
    scaled = max(1, round(num * dm)) if trunc == "round" \
        else int(math.ceil(num * dm))
    out: List[int] = []
    for r in repeats[::-1]:
        rs = max(1, round(r / num * scaled))
        out.append(rs)
        num -= r
        scaled -= rs
    return out[::-1]


# base arch (efficientnet.py:691-699): (type, repeats, k, stride, expand,
# out_c, se_ratio).  Lite drops SE and uses relu6 (efficientnet.py:790-798).
_ARCH = (
    ("ds", 1, 3, 1, 1, 16, 0.25),
    ("ir", 2, 3, 2, 6, 24, 0.25),
    ("ir", 2, 5, 2, 6, 40, 0.25),
    ("ir", 3, 3, 2, 6, 80, 0.25),
    ("ir", 3, 5, 1, 6, 112, 0.25),
    ("ir", 4, 5, 2, 6, 192, 0.25),
    ("ir", 1, 3, 1, 6, 320, 0.25),
)

# name -> (channel_multiplier, depth_multiplier, default img, kind)
EFFICIENTNETS = {
    "efficientnet_b0": (1.0, 1.0, 224, "b"),
    "efficientnet_b1": (1.0, 1.1, 240, "b"),
    "efficientnet_b2": (1.1, 1.2, 260, "b"),
    "efficientnet_b3": (1.2, 1.4, 300, "b"),
    "efficientnet_b4": (1.4, 1.8, 380, "b"),
    "efficientnet_b5": (1.6, 2.2, 456, "b"),
    "efficientnet_b6": (1.8, 2.6, 528, "b"),
    "efficientnet_b7": (2.0, 3.1, 600, "b"),
    "efficientnet_b8": (2.2, 3.6, 672, "b"),
    "efficientnet_lite0": (1.0, 1.0, 224, "lite"),
    "efficientnet_lite1": (1.0, 1.1, 240, "lite"),
    "efficientnet_lite2": (1.1, 1.2, 260, "lite"),
    "efficientnet_lite3": (1.2, 1.4, 280, "lite"),
    "efficientnet_lite4": (1.4, 1.8, 300, "lite"),
    "efficientnet_b2a": (1.1, 1.2, 288, "b"),   # b2 arch @288 (:1029)
    "efficientnet_b3a": (1.2, 1.4, 320, "b"),   # b3 arch @320 (:1047)
    "efficientnet_l2": (4.3, 5.3, 800, "b"),    # (:1101)
    # EfficientNet-CondConv (:742-769, :1134-1158): the b0 arch with
    # conditionally-parameterized convs (num_experts = 4 *
    # experts_multiplier) on the last three stages ('_cc4' arch tags)
    "efficientnet_cc_b0_4e": (1.0, 1.0, 224, "cc4"),
    "efficientnet_cc_b0_8e": (1.0, 1.0, 224, "cc8"),
    "efficientnet_cc_b1_8e": (1.0, 1.1, 240, "cc8"),
    # pruned b1/b2/b3 (:1206-1241): parent multipliers, channel plan
    # re-dimensioned by the pruned/*.txt manifest; TF SAME pad + eps 1e-3
    # (kwargs bn_eps/pad_type at :1210-1211)
    "efficientnet_b1_pruned": (1.0, 1.1, 240, "b"),
    "efficientnet_b2_pruned": (1.1, 1.2, 260, "b"),
    "efficientnet_b3_pruned": (1.2, 1.4, 300, "b"),
}
PRUNED_EFFNETS = {"efficientnet_b1_pruned", "efficientnet_b2_pruned",
                  "efficientnet_b3_pruned"}

# The other non-tf families generated by the same builder
# (reference efficientnet.py:818-998 _gen_mnasnet_* / _gen_mobilenet_v2 /
# _gen_fbnetc / _gen_spnasnet).  Rows mirror the arch_def strings:
# (type, repeats, k, stride, expand, out_c, se_ratio, noskip).
_B = lambda t, r, k, s, e, c, se=0.0, ns=False, fc=0: \
    (t, r, k, s, e, c, se, ns, fc)
GENERIC_EFFNETS = {
    # mnasnet-b1 grid (:825-850); 'b1'/'a1' are the 100 aliases
    "mnasnet_050": dict(cm=0.5, act="relu", stem=32, head=1280, arch=(
        _B("ds", 1, 3, 1, 1, 16, ns=True), _B("ir", 3, 3, 2, 3, 24),
        _B("ir", 3, 5, 2, 3, 40), _B("ir", 3, 5, 2, 6, 80),
        _B("ir", 2, 3, 1, 6, 96), _B("ir", 4, 5, 2, 6, 192),
        _B("ir", 1, 3, 1, 6, 320, ns=True))),
    # mnasnet-a1 / semnasnet (:852-878)
    "semnasnet_050": dict(cm=0.5, act="relu", stem=32, head=1280, arch=(
        _B("ds", 1, 3, 1, 1, 16, ns=True), _B("ir", 2, 3, 2, 6, 24),
        _B("ir", 3, 5, 2, 3, 40, se=0.25), _B("ir", 4, 3, 2, 6, 80),
        _B("ir", 2, 3, 1, 6, 112, se=0.25),
        _B("ir", 3, 5, 2, 6, 160, se=0.25),
        _B("ir", 1, 3, 1, 6, 320, ns=True))),
    "mnasnet_small": dict(cm=1.0, act="relu", stem=8, head=1280, arch=(
        _B("ds", 1, 3, 1, 1, 8), _B("ir", 1, 3, 2, 3, 16),
        _B("ir", 2, 3, 2, 6, 16), _B("ir", 4, 5, 2, 6, 32, se=0.25),
        _B("ir", 3, 3, 1, 6, 32, se=0.25),
        _B("ir", 3, 5, 2, 6, 88, se=0.25), _B("ir", 1, 3, 1, 6, 144))),
    # mobilenet-v2 (:955-982)
    "mobilenetv2_100": dict(cm=1.0, act="relu6", stem=32, head=1280,
                            head_cm=True, arch=(
        _B("ds", 1, 3, 1, 1, 16), _B("ir", 2, 3, 2, 6, 24),
        _B("ir", 3, 3, 2, 6, 32), _B("ir", 4, 3, 2, 6, 64),
        _B("ir", 3, 3, 1, 6, 96), _B("ir", 3, 3, 2, 6, 160),
        _B("ir", 1, 3, 1, 6, 320))),
    # fbnet-c (:985-992)
    "fbnetc_100": dict(cm=1.0, act="relu", stem=16, head=1984, arch=(
        _B("ir", 1, 3, 1, 1, 16), _B("ir", 1, 3, 2, 6, 24),
        _B("ir", 2, 3, 1, 1, 24),
        _B("ir", 1, 5, 2, 6, 32), _B("ir", 1, 5, 1, 3, 32),
        _B("ir", 1, 5, 1, 6, 32), _B("ir", 1, 3, 1, 6, 32),
        _B("ir", 1, 5, 2, 6, 64), _B("ir", 1, 5, 1, 3, 64),
        _B("ir", 2, 5, 1, 6, 64),
        _B("ir", 3, 5, 1, 6, 112), _B("ir", 1, 5, 1, 3, 112),
        _B("ir", 4, 5, 2, 6, 184), _B("ir", 1, 3, 1, 6, 352)),
        rows=(1, 2, 4, 3, 2, 1, 1)),
    # spnasnet (:995-998)
    "spnasnet_100": dict(cm=1.0, act="relu", stem=32, head=1280, arch=(
        _B("ds", 1, 3, 1, 1, 16, ns=True), _B("ir", 3, 3, 2, 3, 24),
        _B("ir", 1, 5, 2, 6, 40), _B("ir", 3, 3, 1, 3, 40),
        _B("ir", 1, 5, 2, 6, 80), _B("ir", 3, 3, 1, 3, 80),
        _B("ir", 1, 5, 1, 6, 96), _B("ir", 3, 5, 1, 3, 96),
        _B("ir", 4, 5, 2, 6, 192), _B("ir", 1, 3, 1, 6, 320, ns=True)),
        rows=(1, 1, 2, 2, 2, 1, 1)),
}
# width-multiplier aliases
for _cm, _sfx in ((0.75, "075"), (1.0, "100"), (1.4, "140")):
    GENERIC_EFFNETS[f"mnasnet_{_sfx}"] = dict(
        GENERIC_EFFNETS["mnasnet_050"], cm=_cm)
    GENERIC_EFFNETS[f"semnasnet_{_sfx}"] = dict(
        GENERIC_EFFNETS["semnasnet_050"], cm=_cm)
GENERIC_EFFNETS["mnasnet_b1"] = GENERIC_EFFNETS["mnasnet_100"]
GENERIC_EFFNETS["mnasnet_a1"] = GENERIC_EFFNETS["semnasnet_100"]
GENERIC_EFFNETS["mobilenetv2_140"] = dict(
    GENERIC_EFFNETS["mobilenetv2_100"], cm=1.4)
GENERIC_EFFNETS["mobilenetv2_110d"] = dict(
    GENERIC_EFFNETS["mobilenetv2_100"], cm=1.1, dm=1.2, fix_stem_head=True)
GENERIC_EFFNETS["mobilenetv2_120d"] = dict(
    GENERIC_EFFNETS["mobilenetv2_100"], cm=1.2, dm=1.4, fix_stem_head=True)
# EfficientNet-EdgeTPU (:1110-1132): 'er' EdgeResidual blocks — k3 expand
# conv (stride 1) then strided 1x1 pw-linear; relu act; the first block's
# fc24 fakes the expansion base (efficientnet_blocks.py:344-347)
_EDGE_ARCH = (
    _B("er", 1, 3, 1, 4, 24, ns=True, fc=24), _B("er", 2, 3, 2, 8, 32),
    _B("er", 4, 3, 2, 8, 48), _B("ir", 5, 5, 2, 8, 96),
    _B("ir", 4, 5, 1, 8, 144), _B("ir", 2, 5, 2, 8, 192))
GENERIC_EFFNETS["efficientnet_es"] = dict(
    cm=1.0, dm=1.0, act="relu", stem=32, head=1280, head_cm=True,
    arch=_EDGE_ARCH)
GENERIC_EFFNETS["efficientnet_em"] = dict(
    GENERIC_EFFNETS["efficientnet_es"], cm=1.0, dm=1.1)
GENERIC_EFFNETS["efficientnet_el"] = dict(
    GENERIC_EFFNETS["efficientnet_es"], cm=1.2, dm=1.4)

# TF-ported variants (reference efficientnet.py:1206-1683): IDENTICAL archs
# to their base name with pad_type='same' (TF asymmetric SAME padding) and
# BN eps 1e-3 (BN_EPS_TF_DEFAULT, efficientnet_blocks.py:24).  The _ap
# (AdvProp) / _ns (NoisyStudent) suffixes are training-recipe aliases of
# the same graph (:1352-1556).  Values: (base variant, default img size).
BN_EPS_TF = 1e-3
TF_EFFNETS: Dict[str, Tuple[str, int]] = {}
for _i, _img in enumerate((224, 240, 260, 300, 380, 456, 528, 600, 672)):
    TF_EFFNETS[f"tf_efficientnet_b{_i}"] = (f"efficientnet_b{_i}", _img)
    TF_EFFNETS[f"tf_efficientnet_b{_i}_ap"] = (f"efficientnet_b{_i}", _img)
    if _i <= 7:
        TF_EFFNETS[f"tf_efficientnet_b{_i}_ns"] = \
            (f"efficientnet_b{_i}", _img)
TF_EFFNETS["tf_efficientnet_l2_ns"] = ("efficientnet_l2", 800)
TF_EFFNETS["tf_efficientnet_l2_ns_475"] = ("efficientnet_l2", 475)
for _i, _img in enumerate((224, 240, 260, 280, 300)):
    TF_EFFNETS[f"tf_efficientnet_lite{_i}"] = \
        (f"efficientnet_lite{_i}", _img)
for _sfx, _img in (("es", 224), ("em", 240), ("el", 300)):
    TF_EFFNETS[f"tf_efficientnet_{_sfx}"] = (f"efficientnet_{_sfx}", _img)
for _cc in ("cc_b0_4e", "cc_b0_8e", "cc_b1_8e"):
    TF_EFFNETS[f"tf_efficientnet_{_cc}"] = \
        (f"efficientnet_{_cc}", 240 if "b1" in _cc else 224)


def resolve_variant(variant: str) -> Tuple[str, bool]:
    """-> (base arch variant, tf: SAME padding + BN eps 1e-3)."""
    if variant in TF_EFFNETS:
        return TF_EFFNETS[variant][0], True
    return variant, variant in PRUNED_EFFNETS


def effnet_bn_eps(variant: str) -> float:
    if variant in TF_EFFNETS or variant in PRUNED_EFFNETS:
        return BN_EPS_TF
    return 1e-5


def effnet_bn_momentum(variant: str) -> float:
    """Running-stat momentum for zoo_train_mode: torch default 0.1; the
    TF-ported variants train with BN_MOMENTUM_TF_DEFAULT = 1 - 0.99
    (reference efficientnet_builder.py:18-20)."""
    if variant in TF_EFFNETS or variant in PRUNED_EFFNETS:
        return 0.01
    return 0.1


def effnet_plan(variant: str) -> Tuple[int, List[List[dict]], int]:
    """Static block plan: (stem_channels, stages[[block dict]], head_ch).

    Stage grouping follows the reference arch_def rows so torch keys
    `blocks.{stage}.{i}` map directly; for GENERIC_EFFNETS, `rows` gives
    the number of table entries per arch_def row when a row holds more
    than one block string (fbnetc/spnasnet)."""
    variant, _ = resolve_variant(variant)
    if variant in GENERIC_EFFNETS:
        g = GENERIC_EFFNETS[variant]
        cm, dm = g["cm"], g.get("dm", 1.0)
        fix_sh = g.get("fix_stem_head", False)
        stem = g["stem"] if fix_sh else round_channels(g["stem"], cm)
        in_c = stem
        rows = g.get("rows") or (1,) * len(g["arch"])
        stages: List[List[dict]] = []
        ai = 0
        last_row = len(rows) - 1
        for ri, n_entries in enumerate(rows):
            blocks = []
            for _ in range(n_entries):
                bt, r, k, s, e, c, se, ns, fc = g["arch"][ai]
                ai += 1
                reps = r if (fix_sh and ri in (0, last_row)) \
                    else int(math.ceil(r * dm))
                out = round_channels(c, cm)
                for bi in range(reps):
                    base = fc if (fc and bi == 0) else in_c
                    mid = make_divisible(round(base * e))
                    blocks.append({
                        "type": bt, "k": k,
                        "stride": s if bi == 0 else 1,
                        "in": in_c, "mid": mid, "out": out,
                        "se": make_divisible(in_c * se, 1) if se > 0
                        else 0,
                        "noskip": ns,
                    })
                    in_c = out
            stages.append(blocks)
        head = g["head"] if (fix_sh or not g.get("head_cm")) \
            else round_channels(g["head"], cm)
        return stem, stages, head
    cm, dm, _, kind = EFFICIENTNETS[variant]
    lite = kind == "lite"
    experts = int(kind[2:]) if kind.startswith("cc") else 0
    stem = 32 if lite else round_channels(32, cm)
    in_c = stem
    stages: List[List[dict]] = []
    last = len(_ARCH) - 1
    for si, (bt, r, k, s, e, c, se) in enumerate(_ARCH):
        if lite:
            se = 0.0
            reps = r if si in (0, last) else int(math.ceil(r * dm))
        else:
            reps = int(math.ceil(r * dm))
        out = round_channels(c, cm)
        blocks = []
        for bi in range(reps):
            mid = make_divisible(in_c * e)
            blocks.append({
                "type": bt, "k": k, "stride": s if bi == 0 else 1,
                "in": in_c, "mid": mid, "out": out,
                "se": make_divisible(in_c * se, 1) if se > 0 else 0,
                # CondConv on the last three stages ('_cc4' tags, :748-755)
                "experts": experts if (experts and si >= 4) else 0,
            })
            in_c = out
        stages.append(blocks)
    head = 1280 if lite else round_channels(1280, cm)
    if variant in PRUNED_EFFNETS:
        return _pruned_effnet_plan(variant, stages)
    return stem, stages, head


def _pruned_effnet_plan(variant, stages):
    """Re-dimension the parent plan from the pruned shape manifest
    (helpers.py adapt_model_from_string semantics).  Residual adds follow
    the PARENT's stride/in==out decision — the torch module graph is
    fixed before adaptation — so parent-noskip blocks whose pruned
    channels happen to coincide stay skip-free."""
    from .pruned import pruned_shapes
    shapes = pruned_shapes(variant)
    stem = shapes["conv_stem.weight"][0]
    head = shapes["conv_head.weight"][0]
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            b = f"blocks.{si}.{bi}."
            parent_res = (blk["stride"] == 1 and blk["in"] == blk["out"]
                          and not blk.get("noskip"))
            if blk["type"] == "ds":
                blk["in"] = blk["mid"] = shapes[b + "conv_dw.weight"][0]
                blk["out"] = shapes[b + "conv_pw.weight"][0]
            else:                                           # ir
                blk["mid"] = shapes[b + "conv_pw.weight"][0]
                blk["in"] = shapes[b + "conv_pw.weight"][1]
                blk["out"] = shapes[b + "conv_pwl.weight"][0]
            if blk["se"]:
                blk["se"] = shapes[b + "se.conv_reduce.weight"][0]
            if not parent_res:
                blk["noskip"] = True
    return stem, stages, head


def effnet_act(variant: str):
    variant, _ = resolve_variant(variant)
    if variant in GENERIC_EFFNETS:
        kind = GENERIC_EFFNETS[variant]["act"]
    else:
        kind = "relu6" if EFFICIENTNETS[variant][3] == "lite" else "swish"
    if kind == "relu":
        return jax.nn.relu
    if kind == "relu6":
        return _relu6
    return lambda x: x * jax.nn.sigmoid(x)


def effnet_feature_channels(variant: str) -> int:
    return effnet_plan(variant)[2]


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _conv_sym(x, w, stride=1, same=False):
    """torch Conv2d with symmetric padding k//2 (create_conv2d default);
    same=True uses TF asymmetric SAME padding (XLA 'SAME' == TF SAME ==
    the reference's conv2d_same, layers/conv2d_same.py:14-29)."""
    if same:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k = w.shape[0]
    p = k // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dwconv(x, w, stride=1, same=False):
    """Depthwise conv; w is HWIO with I=1, O=C (feature_group_count=C)."""
    if same:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride), padding="SAME",
            feature_group_count=x.shape[-1],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k = w.shape[0]
    p = k // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _cc_routing(x, bp):
    """CondConv routing (efficientnet_blocks.py:303-308): global-pool the
    BLOCK INPUT, linear to num_experts, sigmoid.  One routing vector per
    block, shared by all three convs."""
    s = jnp.mean(x, axis=(1, 2))                       # (B, Cin)
    return jax.nn.sigmoid(s @ bp["routing_w"] + bp["routing_b"])  # (B, E)


def _cc_pw(x, w, rw):
    """Per-sample 1x1 conv: experts w (E, Cin, Cout) mixed by rw (B, E)
    then a batched matmul — the MXU-native form of the reference's
    grouped-conv hack (cond_conv2d.py:84-106)."""
    mix = jnp.einsum("be,eio->bio", rw, w)
    return jnp.einsum("bhwi,bio->bhwo", x, mix)


def _cc_dw(x, w, rw, stride=1, same=False):
    """Per-sample depthwise conv: experts w (E, k, k, 1, C) mixed by rw to
    (B, k, k, 1, C); vmap over batch (XLA lowers this to one conv with
    batch_group_count=B)."""
    mix = jnp.einsum("be,ehwic->bhwic", rw, w)
    return jax.vmap(
        lambda xi, wi: _dwconv(xi[None], wi, stride, same)[0])(x, mix)


def _se(x, p, act_fn):
    """Squeeze-excite on (B, H, W, C): mean-pool, reduce, act, expand,
    sigmoid gate (efficientnet_blocks.py:116-120)."""
    s = jnp.mean(x, axis=(1, 2))                       # (B, C)
    s = s @ p["reduce_w"] + p["reduce_b"]
    s = act_fn(s)
    s = s @ p["expand_w"] + p["expand_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def apply_effnet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, head_ch) feature map (the reference
    forward_features, efficientnet.py:381-389)."""
    act = effnet_act(variant)
    _, stages, _ = effnet_plan(variant)
    _, same = resolve_variant(variant)
    eps = effnet_bn_eps(variant)

    def bn(x, p_):
        return _batch_norm(x, p_, act=False, eps=eps)

    x = bn(_conv_sym(images, p["stem"]["conv"], 2, same), p["stem"]["bn"])
    x = act(x)
    # stochastic-depth schedule: the builder scales drop_path_rate linearly
    # by FLAT block index over the total block count (reference
    # efficientnet_builder.py:252); active only inside zoo_train_mode
    block_count = sum(len(b) for b in stages)
    block_idx = 0
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            residual = x
            if blk["type"] == "er":
                # EdgeResidual (efficientnet_blocks.py:335-400): k3 expand
                # (stride 1) -> bn+act -> SE -> STRIDED 1x1 pw-linear -> bn
                y = act(bn(_conv_sym(x, bp["conv_exp"], 1, same),
                           bp["bn1"]))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _conv_sym(y, bp["conv_pwl"], blk["stride"], same)
                y = bn(y, bp["bn2"])
            elif blk["type"] == "ds":
                y = _dwconv(x, bp["conv_dw"], blk["stride"], same)
                y = act(bn(y, bp["bn1"]))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _conv_sym(y, bp["conv_pw"], 1, same)
                y = bn(y, bp["bn2"])                        # no pw act
            elif blk.get("experts"):
                # CondConvResidual (efficientnet_blocks.py:282-331): same
                # graph as ir but all three convs take per-sample mixed
                # expert kernels from one routing of the block input
                rw = _cc_routing(x, bp)
                y = _cc_pw(x, bp["conv_pw"], rw)
                y = act(bn(y, bp["bn1"]))
                y = _cc_dw(y, bp["conv_dw"], rw, blk["stride"], same)
                y = act(bn(y, bp["bn2"]))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _cc_pw(y, bp["conv_pwl"], rw)
                y = bn(y, bp["bn3"])
            else:                                           # ir
                y = _conv_sym(x, bp["conv_pw"], 1, same)
                y = act(bn(y, bp["bn1"]))
                y = _dwconv(y, bp["conv_dw"], blk["stride"], same)
                y = act(bn(y, bp["bn2"]))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _conv_sym(y, bp["conv_pwl"], 1, same)
                y = bn(y, bp["bn3"])
            if blk["stride"] == 1 and blk["in"] == blk["out"] \
                    and not blk.get("noskip"):
                # drop_path sits on the branch, before the skip add
                # (efficientnet_blocks.py:201-202, :275-277, :329-331)
                y = _drop_path(y, block_idx / block_count) + residual
            x = y
            block_idx += 1
    x = _conv_sym(x, p["head"]["conv"], 1, same)
    x = act(bn(x, p["head"]["bn"]))
    return x


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _kaiming_dw(rng, shape):
    """Depthwise (k, k, 1, C) kaiming: the reference's _init_weight_goog
    divides fan_out by groups (efficientnet.py:320-326), so per-channel
    fan_out is k*k, NOT k*k*C."""
    fan_out = shape[0] * shape[1]
    return jax.random.normal(rng, shape, jnp.float32) * np.sqrt(2.0 / fan_out)


def _se_p(rng, mid: int, red: int) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "reduce_w": jax.random.normal(k1, (mid, red), jnp.float32)
        * np.sqrt(2.0 / red),
        "reduce_b": jnp.zeros((red,), jnp.float32),
        "expand_w": jax.random.normal(k2, (red, mid), jnp.float32)
        * np.sqrt(2.0 / mid),
        "expand_b": jnp.zeros((mid,), jnp.float32),
    }


def init_effnet(rng: jax.Array, variant: str) -> Params:
    stem, stages, head = effnet_plan(variant)
    ks = iter(jax.random.split(rng, 512))
    p: Params = {
        "stem": {"conv": _kaiming(next(ks), (3, 3, 3, stem)),
                 "bn": _bn_p(stem)},
        "stages": [],
    }
    for blocks in stages:
        bps = []
        for blk in blocks:
            k, cin, mid, out = blk["k"], blk["in"], blk["mid"], blk["out"]
            if blk["type"] == "er":
                bp = {"conv_exp": _kaiming(next(ks), (k, k, cin, mid)),
                      "bn1": _bn_p(mid),
                      "conv_pwl": _kaiming(next(ks), (1, 1, mid, out)),
                      "bn2": _bn_p(out)}
            elif blk["type"] == "ds":
                bp = {"conv_dw": _kaiming_dw(next(ks), (k, k, 1, cin)),
                      "bn1": _bn_p(cin),
                      "conv_pw": _kaiming(next(ks), (1, 1, cin, out)),
                      "bn2": _bn_p(out)}
                if blk["se"]:
                    bp["se"] = _se_p(next(ks), cin, blk["se"])
            elif blk.get("experts"):
                e = blk["experts"]
                bp = {
                    "routing_w": jax.random.normal(
                        next(ks), (cin, e), jnp.float32) / np.sqrt(cin),
                    "routing_b": jnp.zeros((e,), jnp.float32),
                    "conv_pw": jax.random.normal(
                        next(ks), (e, cin, mid), jnp.float32)
                    * np.sqrt(2.0 / mid),
                    "bn1": _bn_p(mid),
                    "conv_dw": jax.random.normal(
                        next(ks), (e, k, k, 1, mid), jnp.float32)
                    * np.sqrt(2.0 / (k * k)),
                    "bn2": _bn_p(mid),
                    "conv_pwl": jax.random.normal(
                        next(ks), (e, mid, out), jnp.float32)
                    * np.sqrt(2.0 / out),
                    "bn3": _bn_p(out)}
                if blk["se"]:
                    bp["se"] = _se_p(next(ks), mid, blk["se"])
            else:
                bp = {"conv_pw": _kaiming(next(ks), (1, 1, cin, mid)),
                      "bn1": _bn_p(mid),
                      "conv_dw": _kaiming_dw(next(ks), (k, k, 1, mid)),
                      "bn2": _bn_p(mid),
                      "conv_pwl": _kaiming(next(ks), (1, 1, mid, out)),
                      "bn3": _bn_p(out)}
                if blk["se"]:
                    bp["se"] = _se_p(next(ks), mid, blk["se"])
            bps.append(bp)
        p["stages"].append(bps)
    p["head"] = {"conv": _kaiming(next(ks), (1, 1,
                                             stages[-1][-1]["out"], head)),
                 "bn": _bn_p(head)}
    return p


# ---------------------------------------------------------------------------
# torch state-dict loader
# ---------------------------------------------------------------------------

def _w_conv(sd, key):
    """OIHW -> HWIO (regular conv)."""
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0),
                       jnp.float32)


def _w_dw(sd, key):
    """Depthwise OIHW (C,1,k,k) -> HWIO (k,k,1,C)."""
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0),
                       jnp.float32)


def _w_cc_pw(sd, key, cin, cout):
    """CondConv pointwise: torch flat (E, cout*cin) [weight_shape
    (cout, cin, 1, 1), cond_conv2d.py:60-64] -> (E, cin, cout)."""
    w = np.asarray(sd[key]).reshape(-1, cout, cin)
    return jnp.asarray(w.transpose(0, 2, 1), jnp.float32)


def _w_cc_dw(sd, key, k, c):
    """CondConv depthwise: torch flat (E, c*1*k*k) [weight_shape
    (c, 1, k, k), groups=c] -> (E, k, k, 1, c)."""
    w = np.asarray(sd[key]).reshape(-1, c, 1, k, k)
    return jnp.asarray(w.transpose(0, 3, 4, 2, 1), jnp.float32)


def _se_from(sd, base):
    rw = np.asarray(sd[base + ".conv_reduce.weight"])[:, :, 0, 0]  # (r, C)
    ew = np.asarray(sd[base + ".conv_expand.weight"])[:, :, 0, 0]  # (C, r)
    return {
        "reduce_w": jnp.asarray(rw.T, jnp.float32),
        "reduce_b": _v(sd, base + ".conv_reduce.bias"),
        "expand_w": jnp.asarray(ew.T, jnp.float32),
        "expand_b": _v(sd, base + ".conv_expand.bias"),
    }


def load_effnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm EfficientNet torch state-dict (key layout:
    conv_stem/bn1, blocks.{stage}.{i}.{conv_pw,conv_dw,conv_pwl,se,bn*},
    conv_head/bn2)."""
    _, stages, _ = effnet_plan(variant)
    p: Params = {
        "stem": {"conv": _w_conv(sd, prefix + "conv_stem.weight"),
                 "bn": _bn_from(sd, prefix + "bn1")},
        "stages": [],
    }
    for si, blocks in enumerate(stages):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}blocks.{si}.{bi}."
            if blk["type"] == "er":
                bp = {"conv_exp": _w_conv(sd, base + "conv_exp.weight"),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_pwl": _w_conv(sd, base + "conv_pwl.weight"),
                      "bn2": _bn_from(sd, base + "bn2")}
            elif blk["type"] == "ds":
                bp = {"conv_dw": _w_dw(sd, base + "conv_dw.weight"),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_pw": _w_conv(sd, base + "conv_pw.weight"),
                      "bn2": _bn_from(sd, base + "bn2")}
            elif blk.get("experts"):
                k, cin, mid, out = (blk["k"], blk["in"], blk["mid"],
                                    blk["out"])
                bp = {"routing_w": jnp.asarray(
                          np.asarray(sd[base + "routing_fn.weight"]).T,
                          jnp.float32),
                      "routing_b": _v(sd, base + "routing_fn.bias"),
                      "conv_pw": _w_cc_pw(sd, base + "conv_pw.weight",
                                          cin, mid),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_dw": _w_cc_dw(sd, base + "conv_dw.weight",
                                          k, mid),
                      "bn2": _bn_from(sd, base + "bn2"),
                      "conv_pwl": _w_cc_pw(sd, base + "conv_pwl.weight",
                                           mid, out),
                      "bn3": _bn_from(sd, base + "bn3")}
            else:
                bp = {"conv_pw": _w_conv(sd, base + "conv_pw.weight"),
                      "bn1": _bn_from(sd, base + "bn1"),
                      "conv_dw": _w_dw(sd, base + "conv_dw.weight"),
                      "bn2": _bn_from(sd, base + "bn2"),
                      "conv_pwl": _w_conv(sd, base + "conv_pwl.weight"),
                      "bn3": _bn_from(sd, base + "bn3")}
            if blk["se"]:
                bp["se"] = _se_from(sd, base + "se")
            bps.append(bp)
        p["stages"].append(bps)
    p["head"] = {"conv": _w_conv(sd, prefix + "conv_head.weight"),
                 "bn": _bn_from(sd, prefix + "bn2")}
    return p
