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

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v

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
}


def effnet_plan(variant: str) -> Tuple[int, List[List[dict]], int]:
    """Static block plan: (stem_channels, stages[[block dict]], head_ch)."""
    cm, dm, _, kind = EFFICIENTNETS[variant]
    lite = kind == "lite"
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
            })
            in_c = out
        stages.append(blocks)
    head = 1280 if lite else round_channels(1280, cm)
    return stem, stages, head


def effnet_feature_channels(variant: str) -> int:
    return effnet_plan(variant)[2]


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _conv_sym(x, w, stride=1):
    """torch Conv2d with symmetric padding k//2 (create_conv2d default)."""
    k = w.shape[0]
    p = k // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _dwconv(x, w, stride=1):
    """Depthwise conv; w is HWIO with I=1, O=C (feature_group_count=C)."""
    k = w.shape[0]
    p = k // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    kind = EFFICIENTNETS[variant][3]
    act = _relu6 if kind == "lite" else (lambda x: x * jax.nn.sigmoid(x))
    _, stages, _ = effnet_plan(variant)
    x = _batch_norm(_conv_sym(images, p["stem"]["conv"], 2),
                    p["stem"]["bn"], act=False)
    x = act(x)
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            residual = x
            if blk["type"] == "ds":
                y = _dwconv(x, bp["conv_dw"], blk["stride"])
                y = act(_batch_norm(y, bp["bn1"], act=False))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _conv_sym(y, bp["conv_pw"])
                y = _batch_norm(y, bp["bn2"], act=False)    # no pw act
            else:                                           # ir
                y = _conv_sym(x, bp["conv_pw"])
                y = act(_batch_norm(y, bp["bn1"], act=False))
                y = _dwconv(y, bp["conv_dw"], blk["stride"])
                y = act(_batch_norm(y, bp["bn2"], act=False))
                if blk["se"]:
                    y = _se(y, bp["se"], act)
                y = _conv_sym(y, bp["conv_pwl"])
                y = _batch_norm(y, bp["bn3"], act=False)
            if blk["stride"] == 1 and blk["in"] == blk["out"]:
                y = y + residual
            x = y
    x = _conv_sym(x, p["head"]["conv"])
    x = act(_batch_norm(x, p["head"]["bn"], act=False))
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
            if blk["type"] == "ds":
                bp = {"conv_dw": _kaiming_dw(next(ks), (k, k, 1, cin)),
                      "bn1": _bn_p(cin),
                      "conv_pw": _kaiming(next(ks), (1, 1, cin, out)),
                      "bn2": _bn_p(out)}
                if blk["se"]:
                    bp["se"] = _se_p(next(ks), cin, blk["se"])
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
            if blk["type"] == "ds":
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
                bp["se"] = _se_from(sd, base + "se")
            bps.append(bp)
        p["stages"].append(bps)
    p["head"] = {"conv": _w_conv(sd, prefix + "conv_head.weight"),
                 "bn": _bn_from(sd, prefix + "bn2")}
    return p
