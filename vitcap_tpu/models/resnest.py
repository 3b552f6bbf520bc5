"""ResNeSt (the reference zoo's resnest.py:54-131 ResNestBottleneck +
layers/split_attn.py:14-88, registrations resnest.py:134-231).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- ResNet shell with deep stem (width 32 'd' / 64 'e') and avg-pool
  downsample in every variant.
- block: 1x1 conv -> bn+relu -> split-attention 3x3 conv -> optional
  AvgPool2d(3, s, pad 1) ('avd', applied before the split conv when
  avd_first else after; active when stride > 1) -> 1x1 conv -> bn
  (zero-init) -> residual -> relu.
- split attention (split_attn.py:31-88): 3x3 conv with groups=card*radix
  to gw*radix channels -> bn+relu -> radix-sum -> global pool -> grouped
  fc1 (attn = max(gw*radix/4, 32)) -> bn+relu -> grouped fc2 -> radix
  softmax (sigmoid when radix == 1) -> weighted radix sum.

Torch state-dict loader: timm ResNet key layout with
layer{k}.{i}.conv2.{conv,bn0,fc1,bn1,fc2} for the split-attn conv.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_batch_norm, _bn_p, _bn_from, _kaiming, _v, _w,
                        _avg_pool2, _conv, _max_pool, _pad1)

Params = Dict[str, Any]

# name -> (layers, stem_width, radix, cardinality, base_width, avd_first)
RESNESTS = {
    "resnest14d": ((1, 1, 1, 1), 32, 2, 1, 64, False),
    "resnest26d": ((2, 2, 2, 2), 32, 2, 1, 64, False),
    "resnest50d": ((3, 4, 6, 3), 32, 2, 1, 64, False),
    "resnest101e": ((3, 4, 23, 3), 64, 2, 1, 64, False),
    "resnest200e": ((3, 24, 36, 3), 64, 2, 1, 64, False),
    "resnest269e": ((3, 30, 48, 8), 64, 2, 1, 64, False),
    "resnest50d_4s2x40d": ((3, 4, 6, 3), 32, 4, 2, 40, True),
    "resnest50d_1s4x24d": ((3, 4, 6, 3), 32, 1, 4, 24, True),
}
_PLANES = (64, 128, 256, 512)


def resnest_feature_channels(variant: str) -> int:
    return _PLANES[-1] * 4


def _avg3_p1(x, stride):
    """AvgPool2d(3, stride, padding=1), count_include_pad=True."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, stride, stride, 1),
        "VALID") / 9.0


def _grouped_fc(x, w, b, card):
    """(B, Cin) x per-group (card, Cin/card, Cout/card) + bias."""
    B = x.shape[0]
    xg = x.reshape(B, card, -1)
    y = jnp.einsum("bgi,gio->bgo", xg, w)
    return y.reshape(B, -1) + b


def _split_attn(x, p, radix, card, act=jax.nn.relu):
    """SplitAttnConv2d minus the grouped 3x3 conv itself (already applied):
    x is the (B, H, W, gw*radix) conv output."""
    x = act(_batch_norm(x, p["bn0"], act=False))
    B, H, W, RC = x.shape
    gw = RC // radix
    if radix > 1:
        xr = x.reshape(B, H, W, radix, gw)
        gap = xr.sum(axis=3).mean(axis=(1, 2))        # (B, gw)
    else:
        gap = x.mean(axis=(1, 2))
    a = _grouped_fc(gap, p["fc1_w"], p["fc1_b"], card)
    a = act(_batch_norm(a[:, None, None, :], p["bn1"],
                        act=False))[:, 0, 0, :]
    a = _grouped_fc(a, p["fc2_w"], p["fc2_b"], card)  # (B, gw*radix)
    if radix > 1:
        # RadixSoftmax: (B, card, radix, gw/card) -> softmax over radix
        a = a.reshape(B, card, radix, gw // card)
        a = jax.nn.softmax(a, axis=2)
        a = a.transpose(0, 2, 1, 3).reshape(B, radix, gw)
        out = (x.reshape(B, H, W, radix, gw)
               * a[:, None, None, :, :]).sum(axis=3)
    else:
        out = x * jax.nn.sigmoid(a)[:, None, None, :]
    return out


def apply_resnest(p: Params, images: jnp.ndarray,
                  variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 2048) feature map."""
    layers, sw, radix, card, bw, avd_first = RESNESTS[variant]
    relu = jax.nn.relu
    st = p["stem"]
    x = _batch_norm(_conv(_pad1(images), st["conv1"], 2, "VALID"),
                    st["bn1"])
    x = _batch_norm(_conv(_pad1(x), st["conv2"], 1, "VALID"), st["bn2"])
    x = _batch_norm(_conv(_pad1(x), st["conv3"], 1, "VALID"), st["bn3"])
    x = _max_pool(_pad1(x), 3, 2, "VALID")
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            avd = s > 1                                 # is_first unused
            conv_stride = 1 if avd else s
            shortcut = x
            if "down_conv" in blk:
                d = _avg_pool2(x) if s == 2 else x
                shortcut = _batch_norm(_conv(d, blk["down_conv"], 1),
                                       blk["down_bn"], act=False)
            y = _batch_norm(_conv(x, blk["conv1"], 1), blk["bn1"])
            if avd and avd_first:
                y = _avg3_p1(y, s)
            y = _conv(_pad1(y), blk["conv2"]["conv"], conv_stride,
                      "VALID", groups=card * radix)
            y = _split_attn(y, blk["conv2"], radix, card)
            if avd and not avd_first:
                y = _avg3_p1(y, s)
            y = _batch_norm(_conv(y, blk["conv3"], 1), blk["bn3"],
                            act=False)
            x = relu(y + shortcut)
    return x


def init_resnest(rng: jax.Array, variant: str) -> Params:
    layers, sw, radix, card, bw, _ = RESNESTS[variant]
    ks = iter(jax.random.split(rng, 512))
    p: Params = {"stem": {
        "conv1": _kaiming(next(ks), (3, 3, 3, sw)), "bn1": _bn_p(sw),
        "conv2": _kaiming(next(ks), (3, 3, sw, sw)), "bn2": _bn_p(sw),
        "conv3": _kaiming(next(ks), (3, 3, sw, 2 * sw)),
        "bn3": _bn_p(2 * sw),
    }, "stages": []}
    prev = 2 * sw
    for si, depth in enumerate(layers):
        planes = _PLANES[si]
        gw = int(planes * bw / 64) * card
        out = planes * 4
        attn = max(gw * radix // 4, 32)
        blocks = []
        for b in range(depth):
            blk = {
                "conv1": _kaiming(next(ks), (1, 1, prev, gw)),
                "bn1": _bn_p(gw),
                "conv2": {
                    "conv": _kaiming(next(ks),
                                     (3, 3, gw // (card * radix),
                                      gw * radix)),
                    "bn0": _bn_p(gw * radix),
                    "fc1_w": jax.random.normal(
                        next(ks), (card, gw // card, attn // card),
                        jnp.float32) * np.sqrt(2.0 / attn),
                    "fc1_b": jnp.zeros((attn,), jnp.float32),
                    "bn1": _bn_p(attn),
                    "fc2_w": jax.random.normal(
                        next(ks), (card, attn // card,
                                   gw * radix // card),
                        jnp.float32) * np.sqrt(2.0 / (gw * radix)),
                    "fc2_b": jnp.zeros((gw * radix,), jnp.float32),
                },
                "conv3": _kaiming(next(ks), (1, 1, gw, out)),
                "bn3": dict(_bn_p(out),
                            scale=jnp.zeros((out,), jnp.float32)),
            }
            s = (1 if si == 0 else 2) if b == 0 else 1
            if b == 0 and (s != 1 or prev != out):
                blk["down_conv"] = _kaiming(next(ks), (1, 1, prev, out))
                blk["down_bn"] = _bn_p(out)
            blocks.append(blk)
            prev = out
        p["stages"].append(blocks)
    return p


def _grouped_fc_from(sd, key, card):
    w = np.asarray(sd[key + ".weight"])[:, :, 0, 0]   # (out, in/g)
    outpg = w.shape[0] // card
    wg = np.stack([w[g * outpg:(g + 1) * outpg].T for g in range(card)])
    return (jnp.asarray(wg, jnp.float32),
            _v(sd, key + ".bias"))


def load_resnest(params: Params, sd: Dict[str, Any], variant: str,
                 prefix: str = "") -> Params:
    """Load the reference timm ResNeSt torch state-dict."""
    _, sw, radix, card, bw, _ = RESNESTS[variant]
    p: Params = {"stem": {
        "conv1": _w(sd, prefix + "conv1.0.weight"),
        "bn1": _bn_from(sd, prefix + "conv1.1"),
        "conv2": _w(sd, prefix + "conv1.3.weight"),
        "bn2": _bn_from(sd, prefix + "conv1.4"),
        "conv3": _w(sd, prefix + "conv1.6.weight"),
        "bn3": _bn_from(sd, prefix + "bn1"),
    }, "stages": []}
    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}layer{si + 1}.{bi}."
            f1w, f1b = _grouped_fc_from(sd, base + "conv2.fc1", card)
            f2w, f2b = _grouped_fc_from(sd, base + "conv2.fc2", card)
            nb = {
                "conv1": _w(sd, base + "conv1.weight"),
                "bn1": _bn_from(sd, base + "bn1"),
                "conv2": {
                    "conv": _w(sd, base + "conv2.conv.weight"),
                    "bn0": _bn_from(sd, base + "conv2.bn0"),
                    "fc1_w": f1w, "fc1_b": f1b,
                    "bn1": _bn_from(sd, base + "conv2.bn1"),
                    "fc2_w": f2w, "fc2_b": f2b,
                },
                "conv3": _w(sd, base + "conv3.weight"),
                "bn3": _bn_from(sd, base + "bn3"),
            }
            if "down_conv" in blk:
                nb["down_conv"] = _w(sd, base + "downsample.1.weight")
                nb["down_bn"] = _bn_from(sd, base + "downsample.2")
            nbs.append(nb)
        p["stages"].append(nbs)
    return p
