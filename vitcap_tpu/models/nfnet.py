"""Normalizer-Free ResNets / RegNets (the reference zoo's
nfnet.py:61-472 + layers/std_conv.py:64-94 ScaledStdConv2d).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- ScaledStdConv2d: per-out-channel weight standardization (biased std),
  scaled by gamma/sqrt(fan_in), learned per-channel gain, bias; the
  activation-correction gamma is folded into the conv (gamma_in_act is
  False for every registered cfg).
- NormalizationFreeBlock (pre-act): out = act(x) * beta; the downsample
  (count-exclude-pad avg pool 2 + 1x1 std conv) consumes the ACTIVATED
  out; 1x1 -> act -> grouped 3x3 -> [attn_gain * SE/ECA] -> act -> 1x1;
  residual out*alpha + shortcut.  beta follows the expected-variance
  schedule (reset after each stage's first block).
- stems: 3x3 (regnets) or 7x7+maxpool (resnets); nf_regnets add an
  EfficientNet-style final 1x1 conv; final act; ClassifierHead.

Torch state-dict loader: stem.conv*.{weight,bias,gain},
stages.{s}.{b}.{conv1,conv2,conv3}.{...}, .attn.{fc1,fc2}/.attn.conv,
.downsample.conv.{...}, final_conv, head.fc.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _kaiming, _v
from .efficientnet import make_divisible
from .vovnet import _conv1d, _eca_kernel

Params = Dict[str, Any]

_GAMMA = {"silu": 1.0 / 0.5595,
          "relu": (0.5 * (1.0 - 1.0 / math.pi)) ** -0.5}

# name -> dict: see reference model_cfgs (nfnet.py:81-133)
_REGNET = dict(stem="3x3", stem_chs=None, group_size=8, attn="se",
               attn_rr=0.5, attn_div=8, width=0.75, bottle=2.25,
               efficient=True, act="silu", alpha=0.2)
_RESNET = dict(stem="7x7_pool", stem_chs=64, group_size=None, attn=None,
               attn_rr=0.0, attn_div=1, width=1.0, bottle=0.25,
               efficient=False, act="relu", alpha=0.2, num_features=0)
NFNETS = {
    "nf_regnet_b0": dict(_REGNET, depths=(1, 3, 6, 6),
                         channels=(48, 104, 208, 440), num_features=1280),
    "nf_regnet_b1": dict(_REGNET, depths=(2, 4, 7, 7),
                         channels=(48, 104, 208, 440), num_features=1280),
    "nf_regnet_b2": dict(_REGNET, depths=(2, 4, 8, 8),
                         channels=(56, 112, 232, 488), num_features=1416),
    "nf_regnet_b3": dict(_REGNET, depths=(2, 5, 9, 9),
                         channels=(56, 128, 248, 528), num_features=1536),
    "nf_regnet_b4": dict(_REGNET, depths=(2, 6, 11, 11),
                         channels=(64, 144, 288, 616), num_features=1792),
    "nf_regnet_b5": dict(_REGNET, depths=(3, 7, 14, 14),
                         channels=(80, 168, 336, 704), num_features=2048),
    "nf_resnet26": dict(_RESNET, depths=(2, 2, 2, 2),
                        channels=(256, 512, 1024, 2048)),
    "nf_resnet50": dict(_RESNET, depths=(3, 4, 6, 3),
                        channels=(256, 512, 1024, 2048)),
    "nf_resnet101": dict(_RESNET, depths=(3, 4, 23, 3),
                         channels=(256, 512, 1024, 2048)),
    "nf_seresnet26": dict(_RESNET, depths=(2, 2, 2, 2),
                          channels=(256, 512, 1024, 2048), attn="se",
                          attn_rr=0.25, attn_div=1),
    "nf_seresnet50": dict(_RESNET, depths=(3, 4, 6, 3),
                          channels=(256, 512, 1024, 2048), attn="se",
                          attn_rr=0.25, attn_div=1),
    "nf_seresnet101": dict(_RESNET, depths=(3, 4, 23, 3),
                           channels=(256, 512, 1024, 2048), attn="se",
                           attn_rr=0.25, attn_div=1),
    "nf_ecaresnet26": dict(_RESNET, depths=(2, 2, 2, 2),
                           channels=(256, 512, 1024, 2048), attn="eca"),
    "nf_ecaresnet50": dict(_RESNET, depths=(3, 4, 6, 3),
                           channels=(256, 512, 1024, 2048), attn="eca"),
    "nf_ecaresnet101": dict(_RESNET, depths=(3, 4, 23, 3),
                            channels=(256, 512, 1024, 2048), attn="eca"),
}
_CH_DIV = 8
_ATTN_GAIN = 2.0


def nfnet_plan(variant: str):
    """Static per-block plan mirroring NormalizerFreeNet.__init__."""
    cfg = NFNETS[variant]
    stem_chs = make_divisible((cfg["stem_chs"] or cfg["channels"][0])
                              * cfg["width"], _CH_DIV)
    alpha = cfg["alpha"]
    stem_stride = 4 if "pool" in cfg["stem"] else 2
    prev = stem_chs
    expected_var = 1.0
    stages = []
    for si, depth in enumerate(cfg["depths"]):
        stride = 1 if si == 0 and stem_stride > 2 else 2
        blocks = []
        for bi in range(depth):
            first_block = bi == 0 and si == 0
            out = make_divisible(cfg["channels"][si] * cfg["width"],
                                 _CH_DIV)
            bottle = 1.0 if cfg["efficient"] and first_block \
                else cfg["bottle"]
            mid = make_divisible((prev if cfg["efficient"] else out)
                                 * bottle, _CH_DIV)
            gs = cfg["group_size"]
            groups = 1 if gs is None else mid // gs
            if gs and gs % _CH_DIV == 0:
                mid = gs * groups
            if cfg["attn"] == "se":
                attn_red = make_divisible(mid * cfg["attn_rr"],
                                          cfg["attn_div"], 8)
            elif cfg["attn"] == "eca":
                attn_red = _eca_kernel(mid)
            else:
                attn_red = 0
            blocks.append(dict(
                in_chs=prev, out=out, mid=mid, groups=groups,
                stride=stride if bi == 0 else 1,
                beta=1.0 / expected_var ** 0.5, attn_red=attn_red))
            if bi == 0:
                expected_var = 1.0
            expected_var += alpha ** 2
            prev = out
        stages.append(blocks)
    if cfg["efficient"] and cfg["num_features"]:
        feats = make_divisible(cfg["width"] * cfg["num_features"], _CH_DIV)
    else:
        feats = prev
    return stem_chs, stages, feats


def nfnet_feature_channels(variant: str) -> int:
    return nfnet_plan(variant)[2]


def _act(x, kind):
    if kind == "relu":
        return jax.nn.relu(x)
    return x * jax.nn.sigmoid(x)                       # silu


def _std_conv(x, p, stride=1, groups=1, gamma=1.0):
    """ScaledStdConv2d (std_conv.py:64-94): HWIO weight standardized over
    (kh, kw, in), scaled by gamma/sqrt(fan_in) * gain, plus bias."""
    w = p["w"]
    kh, kw, cin, cout = w.shape
    mean = w.mean(axis=(0, 1, 2), keepdims=True)
    std = w.std(axis=(0, 1, 2), keepdims=True)         # biased
    scale = gamma * (kh * kw * cin) ** -0.5
    w = scale * (w - mean) / (std + 1e-5) * p["gain"]
    pd = kh // 2
    if pd:
        x = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _avg2_excl_ceil(x):
    """AvgPool2d(2, 2, ceil_mode=True, count_include_pad=False)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.pad(jnp.ones((1, H, W, 1), x.dtype),
                       ((0, 0), (0, ph), (0, pw), (0, 0)))
        den = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 2, 2, 1),
                                    (1, 2, 2, 1), "VALID")
    else:
        den = 4.0
    num = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                (1, 2, 2, 1), "VALID")
    return num / den


def _se(x, p, red):
    s = jnp.mean(x, axis=(1, 2))
    s = jax.nn.relu(s @ p["fc1_w"] + p["fc1_b"])
    s = s @ p["fc2_w"] + p["fc2_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def apply_nfnet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> post-final-act NHWC feature map (the reference
    forward_features, nfnet.py:378-383)."""
    cfg = NFNETS[variant]
    gamma = _GAMMA[cfg["act"]]
    act = cfg["act"]
    _, stages, _ = nfnet_plan(variant)
    st = p["stem"]
    if "pool" in cfg["stem"]:
        x = _std_conv(images, st["conv"], 2, gamma=gamma)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
    else:
        x = _std_conv(images, st["conv"], 2, gamma=gamma)
    for si, blocks in enumerate(stages):
        for bi, blk in enumerate(blocks):
            bp = p["stages"][si][bi]
            out_pre = _act(x, act) * blk["beta"]
            shortcut = x
            if "down_conv" in bp:
                d = _avg2_excl_ceil(out_pre) if blk["stride"] > 1 \
                    else out_pre
                shortcut = _std_conv(d, bp["down_conv"], 1, gamma=gamma)
            y = _std_conv(out_pre, bp["conv1"], 1, gamma=gamma)
            y = _std_conv(_act(y, act), bp["conv2"], blk["stride"],
                          blk["groups"], gamma=gamma)
            if cfg["attn"] == "se":
                y = _ATTN_GAIN * _se(y, bp["attn"], blk["attn_red"])
            elif cfg["attn"] == "eca":
                g = jax.nn.sigmoid(_conv1d(
                    jnp.mean(y, axis=(1, 2)), bp["attn"]["k"],
                    (bp["attn"]["k"].shape[0] - 1) // 2))
                y = _ATTN_GAIN * (y * g[:, None, None, :])
            y = _std_conv(_act(y, act), bp["conv3"], 1, gamma=gamma)
            x = y * cfg["alpha"] + shortcut
    if "final_conv" in p:
        x = _std_conv(x, p["final_conv"], 1, gamma=gamma)
    return _act(x, act)


def _sc_p(ks, kh, cin, cout):
    k = next(ks)
    return {"w": jax.random.normal(k, (kh, kh, cin, cout), jnp.float32)
            * (kh * kh * cin) ** -0.5,
            "gain": jnp.ones((1, 1, 1, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_nfnet(rng: jax.Array, variant: str) -> Params:
    cfg = NFNETS[variant]
    stem_chs, stages, feats = nfnet_plan(variant)
    ks = iter(jax.random.split(rng, 1024))
    p: Params = {"stem": {"conv": _sc_p(
        ks, 7 if "7x7" in cfg["stem"] else 3, 3, stem_chs)}, "stages": []}
    for blocks in stages:
        bps = []
        for blk in blocks:
            cin, mid, out, g = (blk["in_chs"], blk["mid"], blk["out"],
                                blk["groups"])
            bp: Params = {
                "conv1": _sc_p(ks, 1, cin, mid),
                "conv2": {"w": jax.random.normal(
                    next(ks), (3, 3, mid // g, mid), jnp.float32)
                    * (9 * mid // g) ** -0.5,
                    "gain": jnp.ones((1, 1, 1, mid), jnp.float32),
                    "b": jnp.zeros((mid,), jnp.float32)},
                "conv3": _sc_p(ks, 1, mid, out),
            }
            if cfg["attn"] == "se":
                red = blk["attn_red"]
                k1, k2 = jax.random.split(next(ks))
                bp["attn"] = {
                    "fc1_w": jax.random.normal(k1, (mid, red), jnp.float32)
                    * np.sqrt(2.0 / red),
                    "fc1_b": jnp.zeros((red,), jnp.float32),
                    "fc2_w": jax.random.normal(k2, (red, mid), jnp.float32)
                    * np.sqrt(2.0 / mid),
                    "fc2_b": jnp.zeros((mid,), jnp.float32)}
            elif cfg["attn"] == "eca":
                bp["attn"] = {"k": jax.random.normal(
                    next(ks), (blk["attn_red"],), jnp.float32) * 0.2}
            if cin != out or blk["stride"] != 1:
                bp["down_conv"] = _sc_p(ks, 1, cin, out)
            bps.append(bp)
        p["stages"].append(bps)
    if cfg["efficient"] and cfg["num_features"]:
        p["final_conv"] = _sc_p(ks, 1, stages[-1][-1]["out"], feats)
    return p


def _sc_from(sd, base):
    import numpy as _np
    w = _np.asarray(sd[base + ".weight"]).transpose(2, 3, 1, 0)
    gain = _np.asarray(sd[base + ".gain"])[:, 0, 0, 0]   # (out,1,1,1)
    return {"w": jnp.asarray(w, jnp.float32),
            "gain": jnp.asarray(gain, jnp.float32)[None, None, None, :],
            "b": _v(sd, base + ".bias")}


def load_nfnet(params: Params, sd: Dict[str, Any], variant: str,
               prefix: str = "") -> Params:
    """Load the reference timm NormalizerFreeNet torch state-dict."""
    cfg = NFNETS[variant]
    stem_key = "stem.conv"
    p: Params = {"stem": {"conv": _sc_from(sd, prefix + stem_key)},
                 "stages": []}
    for si, blocks in enumerate(params["stages"]):
        bps = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}stages.{si}.{bi}."
            bp: Params = {
                "conv1": _sc_from(sd, base + "conv1"),
                "conv2": _sc_from(sd, base + "conv2"),
                "conv3": _sc_from(sd, base + "conv3"),
            }
            if cfg["attn"] == "se":
                import numpy as _np
                f1 = _np.asarray(sd[base + "attn.fc1.weight"])[:, :, 0, 0]
                f2 = _np.asarray(sd[base + "attn.fc2.weight"])[:, :, 0, 0]
                bp["attn"] = {
                    "fc1_w": jnp.asarray(f1.T, jnp.float32),
                    "fc1_b": _v(sd, base + "attn.fc1.bias"),
                    "fc2_w": jnp.asarray(f2.T, jnp.float32),
                    "fc2_b": _v(sd, base + "attn.fc2.bias")}
            elif cfg["attn"] == "eca":
                import numpy as _np
                kw = _np.asarray(sd[base + "attn.conv.weight"])[0, 0]
                bp["attn"] = {"k": jnp.asarray(kw, jnp.float32)}
            if "down_conv" in blk:
                bp["down_conv"] = _sc_from(sd, base + "downsample.conv")
            bps.append(bp)
        p["stages"].append(bps)
    if "final_conv" in params:
        p["final_conv"] = _sc_from(sd, prefix + "final_conv")
    return p
