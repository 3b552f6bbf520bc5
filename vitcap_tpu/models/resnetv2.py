"""ResNetV2 / Big-Transfer (BiT) family (the reference zoo's resnetv2.py:
`resnetv2_{50x1,50x3,101x1,101x3,152x2,152x4}_bitm[_in21k]`,
resnetv2.py:433-511).

Pre-activation bottleneck ResNet with weight-standardized convs and
GroupNorm(32) (no BatchNorm anywhere), functional NHWC, matching the
reference torch graph op-for-op:

- stem: StdConv 7x7/2 with torch-symmetric padding 3 (StdConv2d default,
  layers/std_conv.py:15-38), then the BiT 'fixed' pool: ConstantPad2d(1)
  + MaxPool 3x3/2 VALID (create_stem stem_type='fixed',
  resnetv2.py:297-300).  No stem norm (preact).
- PreActBottleneck (resnetv2.py:120-167): x_preact = GN+relu(x); shortcut
  = downsample(x_preact) when the block projects (1x1 StdConv, NO norm in
  preact mode, DownsampleConv :219-229); residual = conv1 1x1 ->
  GN+relu -> conv2 3x3 (stride) -> GN+relu -> conv3 1x1; out = residual
  + shortcut.  mid = make_div(out * 0.25).
- channels (256, 512, 1024, 2048) and stem 64 scale by the width factor
  through make_div (divisor 8, resnetv2.py:108-113); stage 0 stride 1,
  others 2.
- final GN+relu over the trunk output (resnetv2.py:352), then the
  classifier head is a 1x1 conv applied to the pooled vector
  (ClassifierHead use_conv=True, :354-355).

Weight standardization divides by (std + 1e-5) with the UNBIASED=False
std (std_conv.py:31-34) — backbones._std_conv implements exactly this.

Torch state-dict loader at the bottom (keys: stem.conv.weight,
stages.{i}.blocks.{j}.{norm1,conv1,norm2,conv2,norm3,conv3,
downsample.conv}.*, norm.weight/bias, head.fc.weight/bias).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_group_norm, _kaiming, _norm_p, _std_conv, _v)
from .efficientnet import make_divisible

Params = Dict[str, Any]

# name -> (per-stage block counts, width factor, default num_classes)
RESNETV2S = {}
for _layers, _lname in (((3, 4, 6, 3), "50"), ((3, 4, 23, 3), "101"),
                        ((3, 8, 36, 3), "152")):
    for _wf in (1, 2, 3, 4):
        _n = f"resnetv2_{_lname}x{_wf}_bitm"
        if (_lname, _wf) in (("50", 1), ("50", 3), ("101", 1), ("101", 3),
                             ("152", 2), ("152", 4)):
            RESNETV2S[_n] = (_layers, _wf, 1000)
            RESNETV2S[_n + "_in21k"] = (_layers, _wf, 21843)

_CHANNELS = (256, 512, 1024, 2048)


def resnetv2_plan(variant: str) -> Tuple[int, List[dict]]:
    """-> (stem channels, stage dicts with depth/out/mid/stride)."""
    layers, wf, _ = RESNETV2S[variant]
    stem = make_divisible(64 * wf)
    stages = []
    for si, (d, c) in enumerate(zip(layers, _CHANNELS)):
        out = make_divisible(c * wf)
        stages.append({"depth": d, "out": out,
                       "mid": make_divisible(out * 0.25),
                       "stride": 1 if si == 0 else 2})
    return stem, stages


def resnetv2_feature_channels(variant: str) -> int:
    return resnetv2_plan(variant)[1][-1]["out"]


def _conv_tsym(x, w, stride=1):
    """StdConv2d with torch-symmetric padding k//2 (std_conv.py:24-25)."""
    k = w.shape[0]
    p = k // 2
    pad = ((p, p), (p, p))
    return _std_conv(x, w, stride=stride, padding=pad)


def apply_resnetv2(p: Params, images: jnp.ndarray,
                   variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, feat) post-norm feature map
    (forward_features, resnetv2.py:371-375)."""
    _, stages = resnetv2_plan(variant)
    x = _conv_tsym(images, p["stem"]["conv"], 2)
    # 'fixed' BiT stem pool: ConstantPad2d(1, 0.) then VALID 3x3/2 max
    # pool — the pad value is ZERO, not -inf, and with no pre-pool relu
    # (preact) border zeros can win the max (resnetv2.py:295-297)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    for si, st in enumerate(stages):
        for bi in range(st["depth"]):
            bp = p["stages"][si][bi]
            s = st["stride"] if bi == 0 else 1
            x_preact = _group_norm(x, bp["norm1"])
            shortcut = x
            if "down_conv" in bp:
                shortcut = _conv_tsym(x_preact, bp["down_conv"], s)
            y = _conv_tsym(x_preact, bp["conv1"])
            y = _conv_tsym(_group_norm(y, bp["norm2"]), bp["conv2"], s)
            y = _conv_tsym(_group_norm(y, bp["norm3"]), bp["conv3"])
            x = y + shortcut
    return _group_norm(x, p["norm"])


def init_resnetv2(rng: jax.Array, variant: str) -> Params:
    stem, stages = resnetv2_plan(variant)
    ks = iter(jax.random.split(rng, 512))
    p: Params = {"stem": {"conv": _kaiming(next(ks), (7, 7, 3, stem))},
                 "stages": []}
    prev = stem
    for st in stages:
        mid, out = st["mid"], st["out"]
        blocks = []
        for bi in range(st["depth"]):
            bp = {"norm1": _norm_p(prev),
                  "conv1": _kaiming(next(ks), (1, 1, prev, mid)),
                  "norm2": _norm_p(mid),
                  "conv2": _kaiming(next(ks), (3, 3, mid, mid)),
                  "norm3": _norm_p(mid),
                  "conv3": _kaiming(next(ks), (1, 1, mid, out))}
            if bi == 0:
                bp["down_conv"] = _kaiming(next(ks), (1, 1, prev, out))
            blocks.append(bp)
            prev = out
        p["stages"].append(blocks)
    p["norm"] = _norm_p(prev)
    return p


def _w(sd, key):
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0),
                       jnp.float32)


def _gn_from(sd, base):
    return {"scale": _v(sd, base + ".weight"),
            "bias": _v(sd, base + ".bias")}


def load_resnetv2(params: Params, sd: Dict[str, Any], variant: str,
                  prefix: str = "") -> Params:
    """Load the reference timm ResNetV2 torch state-dict."""
    _, stages = resnetv2_plan(variant)
    p: Params = {"stem": {"conv": _w(sd, prefix + "stem.conv.weight")},
                 "stages": []}
    for si, st in enumerate(stages):
        blocks = []
        for bi in range(st["depth"]):
            base = f"{prefix}stages.{si}.blocks.{bi}."
            bp = {"norm1": _gn_from(sd, base + "norm1"),
                  "conv1": _w(sd, base + "conv1.weight"),
                  "norm2": _gn_from(sd, base + "norm2"),
                  "conv2": _w(sd, base + "conv2.weight"),
                  "norm3": _gn_from(sd, base + "norm3"),
                  "conv3": _w(sd, base + "conv3.weight")}
            if bi == 0:
                bp["down_conv"] = _w(sd, base + "downsample.conv.weight")
            blocks.append(bp)
        p["stages"].append(blocks)
    p["norm"] = _gn_from(sd, prefix + "norm")
    return p
