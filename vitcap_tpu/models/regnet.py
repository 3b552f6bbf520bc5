"""RegNetX / RegNetY (the reference zoo's regnet family, reference
regnet.py:25-57 model_cfgs, :97-120 width generation, :123-170 Bottleneck,
:228-330 RegNet).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- per-block widths from the quantized-log-space generator
  (`generate_regnet`, regnet.py:111-120): u_j = w0 + wa*j, snapped to
  w0*wm^round(log(u/w0)/log(wm)) then rounded to multiples of 8; unique
  widths become stages (counts = depths).
- group widths adjusted for divisibility (`adjust_widths_groups_comp`
  :102-108): g = min(g, w_bot), w_bot snapped to a multiple of g
  (bottle_ratio is 1.0 for every published cfg).
- block (:123-170): 1x1 conv->BN->relu, 3x3 grouped conv (stride)->BN->relu,
  optional SE (regnety; reduce channels = round(block_in * 0.25), sigmoid
  gate, relu inner act — SEModule layers/se.py:8-35 with
  reduction_channels direct), 1x1 conv->BN (no act), projection
  1x1-conv+BN shortcut when shape changes, add, relu.
- stem: 3x3/2 conv to 32, BN, relu (:245-246); head: global-avg-pool + fc.

Torch state-dict loader: stem.{conv,bn}, s{k}.b{j}.{conv1,conv2,conv3}
.{conv,bn}, .se.{fc1,fc2}, .downsample.{conv,bn}, head.fc.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import _conv_sym, _se, _se_p, _w_conv

Params = Dict[str, Any]

# name -> (w0, wa, wm, group_w, depth, se_ratio) — regnet.py:32-57
REGNETS = {
    "regnetx_002": (24, 36.44, 2.49, 8, 13, 0.0),
    "regnetx_004": (24, 24.48, 2.54, 16, 22, 0.0),
    "regnetx_006": (48, 36.97, 2.24, 24, 16, 0.0),
    "regnetx_008": (56, 35.73, 2.28, 16, 16, 0.0),
    "regnetx_016": (80, 34.01, 2.25, 24, 18, 0.0),
    "regnetx_032": (88, 26.31, 2.25, 48, 25, 0.0),
    "regnetx_040": (96, 38.65, 2.43, 40, 23, 0.0),
    "regnetx_064": (184, 60.83, 2.07, 56, 17, 0.0),
    "regnetx_080": (80, 49.56, 2.88, 120, 23, 0.0),
    "regnetx_120": (168, 73.36, 2.37, 112, 19, 0.0),
    "regnetx_160": (216, 55.59, 2.1, 128, 22, 0.0),
    "regnetx_320": (320, 69.86, 2.0, 168, 23, 0.0),
    "regnety_002": (24, 36.44, 2.49, 8, 13, 0.25),
    "regnety_004": (48, 27.89, 2.09, 8, 16, 0.25),
    "regnety_006": (48, 32.54, 2.32, 16, 15, 0.25),
    "regnety_008": (56, 38.84, 2.4, 16, 14, 0.25),
    "regnety_016": (48, 20.71, 2.65, 24, 27, 0.25),
    "regnety_032": (80, 42.63, 2.66, 24, 21, 0.25),
    "regnety_040": (96, 31.41, 2.24, 64, 22, 0.25),
    "regnety_064": (112, 33.22, 2.27, 72, 25, 0.25),
    "regnety_080": (192, 76.82, 2.19, 56, 17, 0.25),
    "regnety_120": (168, 73.36, 2.37, 112, 19, 0.25),
    "regnety_160": (200, 106.23, 2.48, 112, 18, 0.25),
    "regnety_320": (232, 115.89, 2.53, 232, 20, 0.25),
}

STEM_WIDTH = 32


def _generate_widths(w0: int, wa: float, wm: float, depth: int,
                     q: int = 8) -> List[int]:
    """regnet.py:111-120 generate_regnet."""
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, width_exps)
    widths = np.round(np.divide(widths, q)) * q
    return widths.astype(int).tolist()


def regnet_plan(variant: str) -> List[dict]:
    """Per-stage dicts: {out, depth, group, se} (se = reduce chs per block
    position is input-dependent, so stored per block below)."""
    w0, wa, wm, group_w, depth, se_ratio = REGNETS[variant]
    widths = _generate_widths(w0, wa, wm, depth)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    stage_widths = stage_widths.tolist()
    stage_depths = stage_depths.tolist()
    # adjust_widths_groups_comp (bottle_ratio == 1 for all cfgs)
    groups = [min(group_w, w) for w in stage_widths]
    stage_widths = [int(round(w / g) * g) for w, g in
                    zip(stage_widths, groups)]
    stages = []
    in_c = STEM_WIDTH
    for out, d, g in zip(stage_widths, stage_depths, groups):
        blocks = []
        for bi in range(d):
            blk_in = in_c if bi == 0 else out
            blocks.append({
                "in": blk_in, "out": out, "stride": 2 if bi == 0 else 1,
                "group": g,
                "se": int(round(blk_in * se_ratio)) if se_ratio else 0,
            })
        in_c = out
        stages.append(blocks)
    return stages


def regnet_feature_channels(variant: str) -> int:
    return regnet_plan(variant)[-1][-1]["out"]


def _gconv(x, w, stride, groups):
    """Grouped 3x3 conv, torch-symmetric padding; w is HWIO with
    I = C_in/groups."""
    k = w.shape[0]
    p = k // 2
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def apply_regnet(p: Params, images: jnp.ndarray,
                 variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C_last) feature map (the reference
    forward_features, regnet.py:320-323)."""
    relu = jax.nn.relu
    x = relu(_batch_norm(_conv_sym(images, p["stem"]["conv"], 2),
                         p["stem"]["bn"], act=False))
    for si, blocks in enumerate(regnet_plan(variant)):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            shortcut = x
            y = relu(_batch_norm(_conv_sym(x, bp["conv1"]),
                                 bp["bn1"], act=False))
            y = relu(_batch_norm(
                _gconv(y, bp["conv2"], blk["stride"],
                       blk["out"] // blk["group"]),
                bp["bn2"], act=False))
            if blk["se"]:
                y = _se(y, bp["se_p"], relu)
            y = _batch_norm(_conv_sym(y, bp["conv3"]), bp["bn3"], act=False)
            if "down_conv" in bp:
                shortcut = _batch_norm(
                    _conv_sym(shortcut, bp["down_conv"], blk["stride"]),
                    bp["down_bn"], act=False)
            x = relu(y + shortcut)
    return x


def init_regnet(rng: jax.Array, variant: str) -> Params:
    plan = regnet_plan(variant)
    n = 2 + sum(5 * len(b) for b in plan)
    ks = iter(jax.random.split(rng, max(n, 8)))
    p: Params = {
        "stem": {"conv": _kaiming(next(ks), (3, 3, 3, STEM_WIDTH)),
                 "bn": _bn_p(STEM_WIDTH)},
        "stages": [],
    }
    for blocks in plan:
        bps = []
        for blk in blocks:
            cin, out, g = blk["in"], blk["out"], blk["group"]
            bp = {
                "conv1": _kaiming(next(ks), (1, 1, cin, out)),
                "bn1": _bn_p(out),
                "conv2": _kaiming(next(ks), (3, 3, g, out)),
                "bn2": _bn_p(out),
                "conv3": _kaiming(next(ks), (1, 1, out, out)),
                # zero_init_last_bn (regnet.py:153-154, :274-277)
                "bn3": dict(_bn_p(out),
                            scale=jnp.zeros((out,), jnp.float32)),
            }
            if blk["se"]:
                bp["se_p"] = _se_p(next(ks), out, blk["se"])
            if cin != out or blk["stride"] != 1:
                bp["down_conv"] = _kaiming(next(ks), (1, 1, cin, out))
                bp["down_bn"] = _bn_p(out)
            bps.append(bp)
        p["stages"].append(bps)
    return p


def load_regnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm RegNet torch state-dict."""
    plan = regnet_plan(variant)
    p: Params = {
        "stem": {"conv": _w_conv(sd, prefix + "stem.conv.weight"),
                 "bn": _bn_from(sd, prefix + "stem.bn")},
        "stages": [],
    }
    for si, blocks in enumerate(plan):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}s{si + 1}.b{bi + 1}."
            bp = {
                "conv1": _w_conv(sd, base + "conv1.conv.weight"),
                "bn1": _bn_from(sd, base + "conv1.bn"),
                "conv2": _w_conv(sd, base + "conv2.conv.weight"),
                "bn2": _bn_from(sd, base + "conv2.bn"),
                "conv3": _w_conv(sd, base + "conv3.conv.weight"),
                "bn3": _bn_from(sd, base + "conv3.bn"),
            }
            if blk["se"]:
                rw = np.asarray(sd[base + "se.fc1.weight"])[:, :, 0, 0]
                ew = np.asarray(sd[base + "se.fc2.weight"])[:, :, 0, 0]
                bp["se_p"] = {
                    "reduce_w": jnp.asarray(rw.T, jnp.float32),
                    "reduce_b": _v(sd, base + "se.fc1.bias"),
                    "expand_w": jnp.asarray(ew.T, jnp.float32),
                    "expand_b": _v(sd, base + "se.fc2.bias"),
                }
            if blk["in"] != blk["out"] or blk["stride"] != 1:
                bp["down_conv"] = _w_conv(
                    sd, base + "downsample.conv.weight")
                bp["down_bn"] = _bn_from(sd, base + "downsample.bn")
            bps.append(bp)
        p["stages"].append(bps)
    return p
