"""CSPNet / DarkNet (the reference zoo's cspnet.py:56-454).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- LeakyReLU(0.01) activations throughout (cspnet.py:344 act_layer).
- CrossStage (:225-271): optional grouped 3x3 conv_down (stride),
  1x1 conv_exp (linear when cross_linear), channel split in two, the
  block chain runs on the SECOND half, 1x1 conv_transition_b on the block
  output, concat with the untouched first half, 1x1 conv_transition.
- ResBottleneck (:155-192): 1x1 -> grouped 3x3 -> 1x1(no act) + residual,
  act after the add; DarkBlock (:195-222): 1x1 -> 3x3 + residual (no
  post-act).  Both zero-init their last BN.
- stems (:131-152): single 7x7/2 (+maxpool 3/2 pad 1) or 3-conv deep or
  darknet 3x3/1 convs without pool.

Skipped: the iabn norm variants (inplace-ABN, vendored-but-unused).

Torch state-dict loader: stem.conv{i}.{conv,bn},
stages.{i}.{conv_down,conv_exp,conv_transition_b,conv_transition}.{conv,bn},
stages.{i}.blocks.{j}.conv{1,2,3}.{conv,bn}, head.fc.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v
from .efficientnet import _conv_sym, _w_conv

Params = Dict[str, Any]

# name -> dict(stem=(chs..., k, stride, pool), out, depth, stride,
#              exp, bottle, block, groups, cross_linear, down_growth,
#              block_fn, stage_fn)
CSPNETS = {
    "cspresnet50": dict(stem=((64,), 7, 2, True), out=(128, 256, 512, 1024),
                        depth=(3, 3, 5, 2), stride=(1, 2, 2, 2),
                        exp=(2.,) * 4, bottle=(0.5,) * 4, block=(1.,) * 4,
                        groups=(1,) * 4, cross_linear=True,
                        down_growth=False, dark=False, cross=True),
    "cspresnet50d": dict(stem=((32, 32, 64), 3, 2, True),
                         out=(128, 256, 512, 1024), depth=(3, 3, 5, 2),
                         stride=(1, 2, 2, 2), exp=(2.,) * 4,
                         bottle=(0.5,) * 4, block=(1.,) * 4,
                         groups=(1,) * 4, cross_linear=True,
                         down_growth=False, dark=False, cross=True),
    "cspresnet50w": dict(stem=((32, 32, 64), 3, 2, True),
                         out=(256, 512, 1024, 2048), depth=(3, 3, 5, 2),
                         stride=(1, 2, 2, 2), exp=(1.,) * 4,
                         bottle=(0.25,) * 4, block=(0.5,) * 4,
                         groups=(1,) * 4, cross_linear=True,
                         down_growth=False, dark=False, cross=True),
    "cspresnext50": dict(stem=((64,), 7, 2, True),
                         out=(256, 512, 1024, 2048), depth=(3, 3, 5, 2),
                         stride=(1, 2, 2, 2), exp=(1.,) * 4,
                         bottle=(1.,) * 4, block=(0.5,) * 4,
                         groups=(32,) * 4, cross_linear=True,
                         down_growth=False, dark=False, cross=True),
    "cspdarknet53": dict(stem=((32,), 3, 1, False),
                         out=(64, 128, 256, 512, 1024),
                         depth=(1, 2, 8, 8, 4), stride=(2,) * 5,
                         exp=(2., 1., 1., 1., 1.),
                         bottle=(0.5, 1., 1., 1., 1.),
                         block=(1., 0.5, 0.5, 0.5, 0.5), groups=(1,) * 5,
                         cross_linear=False, down_growth=True, dark=True,
                         cross=True),
    "darknet53": dict(stem=((32,), 3, 1, False),
                      out=(64, 128, 256, 512, 1024), depth=(1, 2, 8, 8, 4),
                      stride=(2,) * 5, exp=(1.,) * 5, bottle=(0.5,) * 5,
                      block=(1.,) * 5, groups=(1,) * 5, cross_linear=False,
                      down_growth=False, dark=True, cross=False),
}
# InplaceABN variants (cspnet.py:434-448): at eval iabn == BN +
# leaky_relu(0.01), and CspNet already activates with LeakyReLU(0.01)
# (cspnet.py:344) — so these are compute-identical aliases with the same
# state-dict key layout.
CSPNETS["cspresnext50_iabn"] = CSPNETS["cspresnext50"]
CSPNETS["cspdarknet53_iabn"] = CSPNETS["cspdarknet53"]


def cspnet_feature_channels(variant: str) -> int:
    return CSPNETS[variant]["out"][-1]


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _cba(x, p, stride=1, groups=1, act=True):
    k = p["conv"].shape[0]
    pd = k // 2
    if pd:
        x = jnp.pad(x, ((0, 0), (pd, pd), (pd, pd), (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["conv"], window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _batch_norm(x, p["bn"], act=False)
    return _lrelu(x) if act else x


def apply_cspnet(p: Params, images: jnp.ndarray,
                 variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> final-stage NHWC feature map (the reference
    forward_features, cspnet.py:396-399)."""
    cfg = CSPNETS[variant]
    chs, k, s0, pool = cfg["stem"]
    x = images
    for i in range(len(chs)):
        x = _cba(x, p["stem"][i], s0 if i == 0 else 1)
    if pool:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
    for si in range(len(cfg["out"])):
        sp = p["stages"][si]
        g = cfg["groups"][si]
        stride = cfg["stride"][si]
        if "conv_down" in sp:
            x = _cba(x, sp["conv_down"], stride, g)
        if cfg["cross"]:
            x = _cba(x, sp["conv_exp"], act=not cfg["cross_linear"])
            half = x.shape[-1] // 2
            xs, xb = x[..., :half], x[..., half:]
        else:
            xs, xb = None, x
        for bp in sp["blocks"]:
            shortcut = xb
            if cfg["dark"]:
                y = _cba(xb, bp["conv1"])
                y = _cba(y, bp["conv2"], 1, g)
                xb = y + shortcut
            else:
                y = _cba(xb, bp["conv1"])
                y = _cba(y, bp["conv2"], 1, g)
                y = _cba(y, bp["conv3"], act=False)
                xb = _lrelu(y + shortcut)
        if cfg["cross"]:
            xb = _cba(xb, sp["conv_transition_b"])
            x = _cba(jnp.concatenate([xs, xb], axis=-1),
                     sp["conv_transition"])
        else:
            x = xb
    return x


def init_cspnet(rng: jax.Array, variant: str) -> Params:
    cfg = CSPNETS[variant]
    ks = iter(jax.random.split(rng, 512))
    chs, k, s0, pool = cfg["stem"]

    def cba_p(cin, cout, kk):
        return {"conv": _kaiming(next(ks), (kk, kk, cin, cout)),
                "bn": _bn_p(cout)}

    p: Params = {"stem": [], "stages": []}
    cin = 3
    for c in chs:
        p["stem"].append(cba_p(cin, c, k))
        cin = c
    prev = chs[-1]
    for si, out in enumerate(cfg["out"]):
        g = cfg["groups"][si]
        stride = cfg["stride"][si]
        sp: Params = {}
        if not cfg["cross"]:
            sp["conv_down"] = cba_p(prev, out, 3)
            bprev = out
        else:
            down = out if cfg["down_growth"] else prev
            if stride != 1:
                sp["conv_down"] = {
                    "conv": _kaiming(next(ks), (3, 3, prev // g, down)),
                    "bn": _bn_p(down)}
                prev = down
            exp = int(round(out * cfg["exp"][si]))
            sp["conv_exp"] = cba_p(prev, exp, 1)
            bprev = exp // 2
        bout = int(round(out * cfg["block"][si]))
        mid = int(round(bout * cfg["bottle"][si]))
        blocks = []
        for _ in range(cfg["depth"][si]):
            if cfg["dark"]:
                blk = {"conv1": cba_p(bprev, mid, 1),
                       "conv2": {"conv": _kaiming(next(ks),
                                                  (3, 3, mid // g, bout)),
                                 "bn": dict(_bn_p(bout), scale=jnp.zeros(
                                     (bout,), jnp.float32))}}
            else:
                blk = {"conv1": cba_p(bprev, mid, 1),
                       "conv2": {"conv": _kaiming(next(ks),
                                                  (3, 3, mid // g, mid)),
                                 "bn": _bn_p(mid)},
                       "conv3": {"conv": _kaiming(next(ks),
                                                  (1, 1, mid, bout)),
                                 "bn": dict(_bn_p(bout), scale=jnp.zeros(
                                     (bout,), jnp.float32))}}
            blocks.append(blk)
            bprev = bout
        sp["blocks"] = blocks
        if cfg["cross"]:
            exp = int(round(out * cfg["exp"][si]))
            sp["conv_transition_b"] = cba_p(bout, exp // 2, 1)
            sp["conv_transition"] = cba_p(exp, out, 1)
        p["stages"].append(sp)
        prev = out
    return p


def load_cspnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "") -> Params:
    """Load the reference timm CspNet torch state-dict."""
    cfg = CSPNETS[variant]

    def cba_from(base):
        return {"conv": _w_conv(sd, base + ".conv.weight"),
                "bn": _bn_from(sd, base + ".bn")}

    p: Params = {"stem": [], "stages": []}
    for i in range(len(params["stem"])):
        p["stem"].append(cba_from(f"{prefix}stem.conv{i + 1}"))
    for si, sp in enumerate(params["stages"]):
        base = f"{prefix}stages.{si}."
        np_: Params = {}
        if "conv_down" in sp:
            np_["conv_down"] = cba_from(base + "conv_down")
        if "conv_exp" in sp:
            np_["conv_exp"] = cba_from(base + "conv_exp")
        np_["blocks"] = []
        for bi, blk in enumerate(sp["blocks"]):
            bb = f"{base}blocks.{bi}."
            nb = {k: cba_from(bb + k) for k in blk}
            np_["blocks"].append(nb)
        if "conv_transition" in sp:
            np_["conv_transition_b"] = cba_from(base + "conv_transition_b")
            np_["conv_transition"] = cba_from(base + "conv_transition")
        p["stages"].append(np_)
    return p
