"""VoVNet v2 (the reference zoo's vovnet family, reference vovnet.py:29-107
model_cfgs, :166-235 OsaBlock/OsaStage, :265-345 VovNet + registrations).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- stem: three 3x3 ConvBnAct (strides 2/1/2); the depthwise variants use
  SeparableConvBnAct (dw conv -> pw 1x1 -> ONE bn+relu) for stem convs 2-3
  (vovnet.py:286-291, layers/separable_conv.py:14-35).
- OSA block (:166-214): chain of layer_per_block 3x3 convs (separable for
  dw variants, with a 1x1 conv_reduction when in != mid), concat of
  [input, every chain output], 1x1 conv_concat, optional attention on the
  LAST block of each stage (ese: 1x1 C->C conv + hard-sigmoid gate,
  layers/se.py:38-50; eca: adaptive-kernel conv1d over the channel
  descriptor + sigmoid, layers/eca.py:41-65), residual add for blocks > 0.
- stages 1-3 downsample with MaxPool2d(3, 2, ceil_mode=True) (:222-225).
- head: global-avg-pool + fc.

Norm variants: ese_vovnet99b_iabn (InplaceABN == eval BN +
leaky_relu(0.01), vovnet.py:399-403) and ese_vovnet39b_evos
(EvoNormSample2d groups=8, :392-396, layers/evo_norm.py:55-83).

Torch state-dict loader: stem.{0,1,2}.{conv,conv_dw,conv_pw,bn},
stages.{i}.blocks.{j}.{conv_reduction,conv_mid.k,conv_concat}.{...},
stages.{i}.blocks.{j}.attn.fc / .attn.conv, head.fc.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import _conv_sym, _dwconv, _kaiming_dw, _w_conv, _w_dw
from .mobilenetv3 import hard_sigmoid

Params = Dict[str, Any]

# name -> dict(stem, conv, out, lpb, bps, residual, dw, attn)
VOVNETS = {
    "vovnet39a": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                      out=(256, 512, 768, 1024), lpb=5, bps=(1, 1, 2, 2),
                      residual=False, dw=False, attn=""),
    "vovnet57a": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                      out=(256, 512, 768, 1024), lpb=5, bps=(1, 1, 4, 3),
                      residual=False, dw=False, attn=""),
    "ese_vovnet19b_slim_dw": dict(stem=(64, 64, 64), conv=(64, 80, 96, 112),
                                  out=(112, 256, 384, 512), lpb=3,
                                  bps=(1, 1, 1, 1), residual=True, dw=True,
                                  attn="ese"),
    "ese_vovnet19b_dw": dict(stem=(64, 64, 64), conv=(128, 160, 192, 224),
                             out=(256, 512, 768, 1024), lpb=3,
                             bps=(1, 1, 1, 1), residual=True, dw=True,
                             attn="ese"),
    "ese_vovnet19b_slim": dict(stem=(64, 64, 128), conv=(64, 80, 96, 112),
                               out=(112, 256, 384, 512), lpb=3,
                               bps=(1, 1, 1, 1), residual=True, dw=False,
                               attn="ese"),
    "ese_vovnet19b": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                          out=(256, 512, 768, 1024), lpb=3, bps=(1, 1, 1, 1),
                          residual=True, dw=False, attn="ese"),
    "ese_vovnet39b": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                          out=(256, 512, 768, 1024), lpb=5, bps=(1, 1, 2, 2),
                          residual=True, dw=False, attn="ese"),
    "ese_vovnet57b": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                          out=(256, 512, 768, 1024), lpb=5, bps=(1, 1, 4, 3),
                          residual=True, dw=False, attn="ese"),
    "ese_vovnet99b": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                          out=(256, 512, 768, 1024), lpb=5, bps=(1, 3, 9, 3),
                          residual=True, dw=False, attn="ese"),
    "eca_vovnet39b": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                          out=(256, 512, 768, 1024), lpb=5, bps=(1, 1, 2, 2),
                          residual=True, dw=False, attn="eca"),
}
# ese_vovnet99b_iabn (vovnet.py:399-403): InplaceABN norm with
# act_layer=nn.LeakyReLU -> at eval BN + leaky_relu(0.01); same keys.
VOVNETS["ese_vovnet99b_iabn"] = dict(VOVNETS["ese_vovnet99b"], act="leaky")
# ese_vovnet39b_evos (vovnet.py:392-396): EvoNormSample2d(groups=8)
# replaces BN+act (no running stats; params weight/bias/v).
VOVNETS["ese_vovnet39b_evos"] = dict(VOVNETS["ese_vovnet39b"], norm="evos")


def vovnet_feature_channels(variant: str) -> int:
    return VOVNETS[variant]["out"][-1]


def _eca_kernel(channels: int, gamma: int = 2, beta: int = 1) -> int:
    t = int(abs(math.log(channels, 2) + beta) / gamma)
    return max(t if t % 2 else t + 1, 3)


def _maxpool_ceil(x):
    """MaxPool2d(3, 2, ceil_mode=True): right/bottom pad so every input
    pixel is covered (vovnet.py:222)."""
    h, w = x.shape[1], x.shape[2]
    oh = -(-(h - 3) // 2) + 1
    ow = -(-(w - 3) // 2) + 1
    ph = (oh - 1) * 2 + 3 - h
    pw = (ow - 1) * 2 + 3 - w
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, max(ph, 0)), (0, max(pw, 0)), (0, 0)))


def _evo_norm_s(x, p, groups=8, eps=1e-5):
    """EvoNorm-S0 (layers/evo_norm.py:55-83): n = x*sigmoid(v*x) divided
    by the per-sample per-group std (variance over (C/g, H, W) with
    torch's (B, C, H, W) grouping), then affine.  No running stats, so
    eval == train math."""
    B, H, W, C = x.shape
    n = x * jax.nn.sigmoid(x * p["v"])
    xg = x.reshape(B, H, W, groups, C // groups)
    d = jnp.sqrt(jnp.var(xg, axis=(1, 2, 4), keepdims=True) + eps)
    n = (n.reshape(B, H, W, groups, C // groups) / d).reshape(B, H, W, C)
    return n * p["scale"] + p["bias"]


def _norm_act_fn(cfg):
    if cfg.get("norm") == "evos":
        return _evo_norm_s
    if cfg.get("act") == "leaky":
        return lambda x, p_: jax.nn.leaky_relu(
            _batch_norm(x, p_, act=False), 0.01)
    return lambda x, p_: jax.nn.relu(_batch_norm(x, p_, act=False))


def _cba(x, p, stride=1, na=None):
    """ConvBnAct: conv (no bias) -> norm+act (bn+relu default)."""
    na = na or (lambda y, p_: jax.nn.relu(_batch_norm(y, p_, act=False)))
    return na(_conv_sym(x, p["conv"], stride), p["bn"])


def _sep_cba(x, p, stride=1, na=None):
    """SeparableConvBnAct: dw 3x3 -> pw 1x1 -> ONE norm+act."""
    na = na or (lambda y, p_: jax.nn.relu(_batch_norm(y, p_, act=False)))
    y = _dwconv(x, p["conv_dw"], stride)
    y = _conv_sym(y, p["conv_pw"])
    return na(y, p["bn"])


def _attn(x, p, kind):
    s = jnp.mean(x, axis=(1, 2))                      # (B, C)
    if kind == "ese":
        g = hard_sigmoid(s @ p["w"] + p["b"])
    else:                                             # eca: conv1d over C
        g = jax.nn.sigmoid(_conv1d(s, p["k"], (p["k"].shape[0] - 1) // 2))
    return x * g[:, None, None, :]


def _conv1d(s, k, pad):
    """(B, C) 'signal' conv over the channel axis with kernel (k,)."""
    B, C = s.shape
    x = jnp.pad(s, ((0, 0), (pad, pad)))
    return jax.lax.conv_general_dilated(
        x[:, :, None], k[:, None, None], window_strides=(1,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0]


def apply_vovnet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C) final-stage feature map (the
    reference forward_features, vovnet.py:341-342)."""
    cfg = VOVNETS[variant]
    dw = cfg["dw"]
    na = _norm_act_fn(cfg)
    x = _cba(images, p["stem"][0], 2, na)
    x = (_sep_cba if dw else _cba)(x, p["stem"][1], 1, na)
    x = (_sep_cba if dw else _cba)(x, p["stem"][2], 2, na)
    for si in range(4):
        if si > 0:
            x = _maxpool_ceil(x)
        for bi, bp in enumerate(p["stages"][si]):
            inp = x
            if "conv_reduction" in bp:
                x = _cba(x, bp["conv_reduction"], 1, na)
            outs = [inp]
            for mp in bp["mid"]:
                x = (_sep_cba if dw else _cba)(x, mp, 1, na)
                outs.append(x)
            x = _cba(jnp.concatenate(outs, axis=-1), bp["conv_concat"],
                     1, na)
            if "attn" in bp:
                x = _attn(x, bp["attn"], cfg["attn"])
            if cfg["residual"] and bi > 0:
                x = x + inp
    return x


def init_vovnet(rng: jax.Array, variant: str) -> Params:
    cfg = VOVNETS[variant]
    stem, conv, out, lpb, bps = (cfg["stem"], cfg["conv"], cfg["out"],
                                 cfg["lpb"], cfg["bps"])
    dw = cfg["dw"]
    ks = iter(jax.random.split(rng, 256))
    evos = cfg.get("norm") == "evos"

    def norm_p(c):
        if evos:
            return {"scale": jnp.ones((c,), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32),
                    "v": jnp.ones((c,), jnp.float32)}
        return _bn_p(c)

    def cba_p(cin, cout, k=3):
        return {"conv": _kaiming(next(ks), (k, k, cin, cout)),
                "bn": norm_p(cout)}

    def sep_p(cin, cout):
        return {"conv_dw": _kaiming_dw(next(ks), (3, 3, 1, cin)),
                "conv_pw": _kaiming(next(ks), (1, 1, cin, cout)),
                "bn": norm_p(cout)}

    p: Params = {"stem": [
        cba_p(3, stem[0]),
        (sep_p if dw else cba_p)(stem[0], stem[1]),
        (sep_p if dw else cba_p)(stem[1], stem[2]),
    ], "stages": []}
    in_c = stem[2]
    for si in range(4):
        mid, oc = conv[si], out[si]
        blocks = []
        for bi in range(bps[si]):
            bp: Params = {}
            nxt = in_c
            if dw and nxt != mid:
                bp["conv_reduction"] = cba_p(nxt, mid, 1)
                nxt = mid
            bp["mid"] = [(sep_p(mid, mid) if dw else cba_p(nxt if i == 0
                                                           else mid, mid))
                         for i in range(lpb)]
            bp["conv_concat"] = cba_p(in_c + lpb * mid, oc, 1)
            if cfg["attn"] and bi == bps[si] - 1:
                if cfg["attn"] == "ese":
                    bp["attn"] = {
                        "w": jax.random.normal(next(ks), (oc, oc),
                                               jnp.float32)
                        * np.sqrt(2.0 / oc),
                        "b": jnp.zeros((oc,), jnp.float32)}
                else:
                    k = _eca_kernel(oc)
                    bp["attn"] = {"k": jax.random.normal(
                        next(ks), (k,), jnp.float32) * np.sqrt(2.0 / k)}
            blocks.append(bp)
            in_c = oc
        p["stages"].append(blocks)
    return p


def load_vovnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm VovNet torch state-dict."""
    cfg = VOVNETS[variant]
    dw = cfg["dw"]
    evos = cfg.get("norm") == "evos"

    def norm_from(base):
        if evos:
            # EvoNormSample2d params are (1, C, 1, 1)
            return {"scale": jnp.asarray(
                        np.asarray(sd[base + ".weight"]).reshape(-1),
                        jnp.float32),
                    "bias": jnp.asarray(
                        np.asarray(sd[base + ".bias"]).reshape(-1),
                        jnp.float32),
                    "v": jnp.asarray(
                        np.asarray(sd[base + ".v"]).reshape(-1),
                        jnp.float32)}
        return _bn_from(sd, base)

    def cba_from(base):
        return {"conv": _w_conv(sd, base + ".conv.weight"),
                "bn": norm_from(base + ".bn")}

    def sep_from(base):
        return {"conv_dw": _w_dw(sd, base + ".conv_dw.weight"),
                "conv_pw": _w_conv(sd, base + ".conv_pw.weight"),
                "bn": norm_from(base + ".bn")}

    p: Params = {"stem": [
        cba_from(prefix + "stem.0"),
        (sep_from if dw else cba_from)(prefix + "stem.1"),
        (sep_from if dw else cba_from)(prefix + "stem.2"),
    ], "stages": []}
    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}stages.{si}.blocks.{bi}."
            nb: Params = {}
            if "conv_reduction" in blk:
                nb["conv_reduction"] = cba_from(base + "conv_reduction")
            nb["mid"] = [(sep_from if dw else cba_from)(
                base + f"conv_mid.{i}") for i in range(len(blk["mid"]))]
            nb["conv_concat"] = cba_from(base + "conv_concat")
            if "attn" in blk:
                if cfg["attn"] == "ese":
                    fw = np.asarray(sd[base + "attn.fc.weight"])[:, :, 0, 0]
                    nb["attn"] = {
                        "w": jnp.asarray(fw.T, jnp.float32),
                        "b": _v(sd, base + "attn.fc.bias")}
                else:
                    kw = np.asarray(sd[base + "attn.conv.weight"])[0, 0]
                    nb["attn"] = {"k": jnp.asarray(kw, jnp.float32)}
            nbs.append(nb)
        p["stages"].append(nbs)
    return p
