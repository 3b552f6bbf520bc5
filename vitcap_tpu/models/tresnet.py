"""TResNet m/l/xl (+_448 aliases) — the reference zoo's tresnet.py
(:156-293): SpaceToDepth stem, InplaceABN convs, anti-aliased stride-2,
SE on the residual branch.

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- stem (tresnet.py:163-171): SpaceToDepth block 4 (channel order
  (h_off, w_off, c), layers/space_to_depth.py:11-17) -> 3x3/1 conv on
  16*in_chans -> IABN leaky(1e-2).
- BasicBlock (:71-105, layers 1-2): conv1 3x3 IABN leaky(1e-3) —
  stride-2 blocks run the conv at stride 1 then AntiAliasDownsample
  ([1,2,1] blur, reflect pad, stride 2; layers/anti_aliasing.py:21-40) —
  conv2 3x3 IABN identity, SE (reduce max(planes//4, 64)) on the branch,
  += residual, relu.
- Bottleneck (:108-153, layers 3-4): 1x1 leaky(1e-3) -> 3x3 leaky(1e-3)
  (+AA when stride 2) -> SE (reduce max(planes//2, 64), layer 4 has NO
  SE) -> 1x1 IABN identity, += residual, relu.
- downsample at block 0 when shape changes (:220-229): AvgPool2d(2,2)
  then 1x1 conv IABN identity (ceil_mode never triggers at the
  stride-4-aligned sizes SpaceToDepth requires).
- planes p=int(64*wf) double per layer (p, 2p, 4p, 8p); features
  out = 8p * 4.
- eval InplaceABN == BN(eps 1e-5) + leaky_relu(act_param)
  (layers/inplace_abn.py:41).

Torch state-dict loader (keys body.conv1.{0,1}, body.layer{1-4}.{j}.
{conv1,conv2,conv3}.{0,1}, .se.{fc1,fc2}, .downsample.1.{0,1}).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_avg_pool2, _batch_norm, _blur_pool, _bn_p,
                        _bn_from, _kaiming, _v)
from .efficientnet import _conv_sym, _w_conv

Params = Dict[str, Any]

# name -> (per-layer block counts, width factor)
TRESNETS = {
    "tresnet_m": ((3, 4, 11, 3), 1.0),
    "tresnet_l": ((4, 5, 18, 3), 1.2),
    "tresnet_xl": ((4, 5, 24, 3), 1.3),
}
# _448 names are the same arch with 448x448 pretrain cfg (tresnet.py:40-48)
for _n in ("tresnet_m", "tresnet_l", "tresnet_xl"):
    TRESNETS[_n + "_448"] = TRESNETS[_n]


def tresnet_feature_channels(variant: str) -> int:
    _, wf = TRESNETS[variant]
    return int(64 * wf) * 8 * 4


def _space_to_depth(x):
    """block 4, torch channel order (h_off, w_off, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 4, 4, W // 4, 4, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 4, W // 4, 16 * C)


def _iabn(x, p, slope):
    x = _batch_norm(x, p, act=False)
    return jax.nn.leaky_relu(x, slope) if slope else x


def _se(x, p):
    s = jnp.mean(x, axis=(1, 2))
    s = jax.nn.relu(s @ p["reduce_w"] + p["reduce_b"])
    s = s @ p["expand_w"] + p["expand_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def apply_tresnet(p: Params, images: jnp.ndarray,
                  variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, 32*wf*64) feature map (the
    reference forward_features == body, tresnet.py:248-249)."""
    layers, _ = TRESNETS[variant]
    x = _space_to_depth(images)
    x = _iabn(_conv_sym(x, p["conv1"]["conv"]), p["conv1"]["bn"], 1e-2)
    for li in range(4):
        stride = 1 if li == 0 else 2
        basic = li < 2
        for bi, blk in enumerate(p["layers"][li]):
            s = stride if bi == 0 else 1
            residual = x
            if "down_conv" in blk:
                d = _avg_pool2(x) if s == 2 else x
                residual = _iabn(_conv_sym(d, blk["down_conv"]),
                                 blk["down_bn"], 0)
            if basic:
                y = _iabn(_conv_sym(x, blk["conv1"]), blk["bn1"], 1e-3)
                if s == 2:
                    y = _blur_pool(y)
                y = _iabn(_conv_sym(y, blk["conv2"]), blk["bn2"], 0)
                if "se" in blk:
                    y = _se(y, blk["se"])
            else:
                y = _iabn(_conv_sym(x, blk["conv1"]), blk["bn1"], 1e-3)
                y = _iabn(_conv_sym(y, blk["conv2"]), blk["bn2"], 1e-3)
                if s == 2:
                    y = _blur_pool(y)
                if "se" in blk:
                    y = _se(y, blk["se"])
                y = _iabn(_conv_sym(y, blk["conv3"]), blk["bn3"], 0)
            x = jax.nn.relu(y + residual)
    return x


def _se_p(ks, c, red):
    k1, k2 = jax.random.split(next(ks))
    return {"reduce_w": jax.random.normal(k1, (c, red), jnp.float32)
            * np.sqrt(2.0 / red),
            "reduce_b": jnp.zeros((red,), jnp.float32),
            "expand_w": jax.random.normal(k2, (red, c), jnp.float32)
            * np.sqrt(2.0 / c),
            "expand_b": jnp.zeros((c,), jnp.float32)}


def init_tresnet(rng: jax.Array, variant: str) -> Params:
    layers, wf = TRESNETS[variant]
    planes = int(64 * wf)
    ks = iter(jax.random.split(rng, 1024))
    p: Params = {
        "conv1": {"conv": _kaiming(next(ks), (3, 3, 48, planes)),
                  "bn": _bn_p(planes)},
        "layers": [],
    }
    prev = planes
    for li, depth in enumerate(layers):
        pl = planes * (1 << li)
        basic = li < 2
        out = pl if basic else pl * 4
        use_se = li < 3
        blocks = []
        for bi in range(depth):
            s = (1 if li == 0 else 2) if bi == 0 else 1
            blk: Params = {}
            if bi == 0 and (s != 1 or prev != out):
                blk["down_conv"] = _kaiming(next(ks), (1, 1, prev, out))
                blk["down_bn"] = _bn_p(out)
            if basic:
                blk.update({
                    "conv1": _kaiming(next(ks), (3, 3, prev, pl)),
                    "bn1": _bn_p(pl),
                    "conv2": _kaiming(next(ks), (3, 3, pl, pl)),
                    # residual-branch IABN zero-init (tresnet.py:211-216)
                    "bn2": dict(_bn_p(pl),
                                scale=jnp.zeros((pl,), jnp.float32)),
                })
                if use_se:
                    blk["se"] = _se_p(ks, pl, max(pl // 4, 64))
            else:
                blk.update({
                    "conv1": _kaiming(next(ks), (1, 1, prev, pl)),
                    "bn1": _bn_p(pl),
                    "conv2": _kaiming(next(ks), (3, 3, pl, pl)),
                    "bn2": _bn_p(pl),
                    "conv3": _kaiming(next(ks), (1, 1, pl, out)),
                    "bn3": dict(_bn_p(out),
                                scale=jnp.zeros((out,), jnp.float32)),
                })
                if use_se:
                    blk["se"] = _se_p(ks, pl, max(pl // 2, 64))
            blocks.append(blk)
            prev = out
        p["layers"].append(blocks)
    return p


def _se_from(sd, base):
    rw = np.asarray(sd[base + ".fc1.weight"])[:, :, 0, 0]    # (r, C)
    ew = np.asarray(sd[base + ".fc2.weight"])[:, :, 0, 0]    # (C, r)
    return {"reduce_w": jnp.asarray(rw.T, jnp.float32),
            "reduce_b": _v(sd, base + ".fc1.bias"),
            "expand_w": jnp.asarray(ew.T, jnp.float32),
            "expand_b": _v(sd, base + ".fc2.bias")}


def load_tresnet(params: Params, sd: Dict[str, Any], variant: str,
                 prefix: str = "body.") -> Params:
    """Load the reference timm TResNet torch state-dict."""
    p: Params = {
        "conv1": {"conv": _w_conv(sd, prefix + "conv1.0.weight"),
                  "bn": _bn_from(sd, prefix + "conv1.1")},
        "layers": [],
    }
    for li, blocks in enumerate(params["layers"]):
        basic = li < 2
        nbs = []
        for bi, blk in enumerate(blocks):
            s2 = li > 0 and bi == 0
            base = f"{prefix}layer{li + 1}.{bi}."
            nb: Params = {}
            if "down_conv" in blk:
                nb["down_conv"] = _w_conv(sd,
                                          base + "downsample.1.0.weight")
                nb["down_bn"] = _bn_from(sd, base + "downsample.1.1")
            for ci in (1, 2, 3):
                if f"conv{ci}" not in blk:
                    continue
                # stride-2 convs wrap (conv, iabn) in another Sequential
                # with the AA layer: conv1 for BasicBlock, conv2 for
                # Bottleneck (tresnet.py:77-84, :118-126)
                aa = s2 and ci == (1 if basic else 2)
                sub = f"conv{ci}.0.0" if aa else f"conv{ci}.0"
                nb[f"conv{ci}"] = _w_conv(sd, f"{base}{sub}.weight")
                nb[f"bn{ci}"] = _bn_from(
                    sd, base + (f"conv{ci}.0.1" if aa else f"conv{ci}.1"))
            if "se" in blk:
                nb["se"] = _se_from(sd, base + "se")
            nbs.append(nb)
        p["layers"].append(nbs)
    return p
