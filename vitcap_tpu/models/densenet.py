"""DenseNet (the reference zoo's densenet family, reference
densenet.py:47-147 DenseLayer/DenseBlock/DenseTransition, :150-262 DenseNet,
:295-365 variant registrations).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- dense layer (pre-activation): BN+relu -> 1x1 conv to bn_size(4)*growth ->
  BN+relu -> 3x3 conv (pad 1) to growth; the layer's input is the channel
  concat of the block input and every previous layer's output
  (densenet.py:47-110, DenseBlock :113-135).
- transition between blocks: BN+relu -> 1x1 conv to half -> 2x2/2 avg pool
  (:138-147).
- stem: classic 7x7/2 conv -> BN+relu -> 3x3/2 maxpool (pad 1), or the
  'deep' three-3x3 stem for the *d variants (:182-194: plain 'deep' uses
  g -> g -> 2g channels; no densenet variant uses the 'tiered' widths).
- final BN+relu (norm5), global-avg-pool, linear classifier (:233-241).
- densenetblur121d (:305-312): deep stem whose pool is maxpool 3x3
  STRIDE 1 (pad 1) followed by BlurPool2d stride 2 (:176-181,
  aa_stem_only so transitions keep plain avg-pool).
- densenet264d_iabn (:367-375): deep stem + InplaceABN norm; at eval
  iabn == BN + leaky_relu(0.01) (layers/inplace_abn.py:41 act defaults).
- tv_densenet121 (:379-385): the densenet121 arch (torchvision weights).

Torch state-dict loader: features.{conv0,norm0[,conv1,norm1,conv2,norm2]},
features.denseblock{i}.denselayer{j}.{norm1,conv1,norm2,conv2},
features.transition{i}.{norm,conv}, features.norm5, classifier.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import (_batch_norm, _blur_pool, _bn_p, _bn_from, _kaiming,
                        _max_pool)
from .efficientnet import _conv_sym, _w_conv

Params = Dict[str, Any]

# name -> (growth_rate, block_config, deep_stem)
DENSENETS = {
    "densenet121": (32, (6, 12, 24, 16), False),
    "densenet121d": (32, (6, 12, 24, 16), True),
    "densenet169": (32, (6, 12, 32, 32), False),
    "densenet201": (32, (6, 12, 48, 32), False),
    "densenet161": (48, (6, 12, 36, 24), False),
    "densenet264": (48, (6, 12, 64, 48), False),
    "densenetblur121d": (32, (6, 12, 24, 16), True),
    "densenet264d_iabn": (48, (6, 12, 64, 48), True),
    "tv_densenet121": (32, (6, 12, 24, 16), False),
}

_BN_SIZE = 4
# iabn variants: eval-mode InplaceABN == BN + leaky_relu(0.01)
_LEAKY = {"densenet264d_iabn"}
# aa variants: stem maxpool stride 1 + BlurPool2d stride 2 (stem only)
_BLUR = {"densenetblur121d"}


def densenet_feature_channels(variant: str) -> int:
    g, cfg, _ = DENSENETS[variant]
    n = 2 * g
    for i, layers in enumerate(cfg):
        n += layers * g
        if i != len(cfg) - 1:
            n //= 2
    return n


def _bn_relu(x, p):
    return jax.nn.relu(_batch_norm(x, p, act=False))


def _bn_leaky(x, p):
    return jax.nn.leaky_relu(_batch_norm(x, p, act=False), 0.01)


def apply_densenet(p: Params, images: jnp.ndarray,
                   variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/32, W/32, C) post-norm5 feature map (the
    reference forward_features, densenet.py:255-256)."""
    g, cfg, deep = DENSENETS[variant]
    bn_act = _bn_leaky if variant in _LEAKY else _bn_relu
    stem = p["stem"]
    if deep:
        x = bn_act(_conv_sym(images, stem["conv0"], 2), stem["norm0"])
        x = bn_act(_conv_sym(x, stem["conv1"]), stem["norm1"])
        x = bn_act(_conv_sym(x, stem["conv2"]), stem["norm2"])
    else:
        x = bn_act(_conv_sym(images, stem["conv0"], 2), stem["norm0"])
    if variant in _BLUR:
        x = _max_pool(x, window=3, stride=1,
                      padding=((0, 0), (1, 1), (1, 1), (0, 0)))
        x = _blur_pool(x)
    else:
        x = _max_pool(x, window=3, stride=2,
                      padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    for i in range(len(cfg)):
        feats = [x]
        for lp in p["blocks"][i]:
            h = jnp.concatenate(feats, axis=-1)
            h = bn_act(h, lp["norm1"])
            h = _conv_sym(h, lp["conv1"])
            h = bn_act(h, lp["norm2"])
            feats.append(_conv_sym(h, lp["conv2"]))
        x = jnp.concatenate(feats, axis=-1)
        if i != len(cfg) - 1:
            tp = p["transitions"][i]
            x = _conv_sym(bn_act(x, tp["norm"]), tp["conv"])
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") / 4.0
    return bn_act(x, p["norm5"])


def init_densenet(rng: jax.Array, variant: str) -> Params:
    g, cfg, deep = DENSENETS[variant]
    init_c = 2 * g
    ks = iter(jax.random.split(rng, 4 + 2 * sum(cfg) + len(cfg)))
    if deep:
        # plain 'deep' stem: g -> g -> 2g (densenet.py:183; the tiered
        # widths are never used by a densenet variant)
        c1 = c2 = g
        stem = {"conv0": _kaiming(next(ks), (3, 3, 3, c1)),
                "norm0": _bn_p(c1),
                "conv1": _kaiming(next(ks), (3, 3, c1, c2)),
                "norm1": _bn_p(c2),
                "conv2": _kaiming(next(ks), (3, 3, c2, init_c)),
                "norm2": _bn_p(init_c)}
    else:
        stem = {"conv0": _kaiming(next(ks), (7, 7, 3, init_c)),
                "norm0": _bn_p(init_c)}
    p: Params = {"stem": stem, "blocks": [], "transitions": []}
    n = init_c
    for i, layers in enumerate(cfg):
        lps = []
        for j in range(layers):
            cin = n + j * g
            lps.append({
                "norm1": _bn_p(cin),
                "conv1": _kaiming(next(ks), (1, 1, cin, _BN_SIZE * g)),
                "norm2": _bn_p(_BN_SIZE * g),
                "conv2": _kaiming(next(ks), (3, 3, _BN_SIZE * g, g)),
            })
        p["blocks"].append(lps)
        n += layers * g
        if i != len(cfg) - 1:
            p["transitions"].append({
                "norm": _bn_p(n),
                "conv": _kaiming(next(ks), (1, 1, n, n // 2)),
            })
            n //= 2
    p["norm5"] = _bn_p(n)
    return p


def load_densenet(params: Params, sd: Dict[str, Any], variant: str,
                  prefix: str = "features.") -> Params:
    """Load the reference timm DenseNet torch state-dict."""
    g, cfg, deep = DENSENETS[variant]
    if deep:
        stem = {k: (_w_conv(sd, f"{prefix}conv{i}.weight") if k.startswith(
                    "conv") else _bn_from(sd, f"{prefix}norm{i}"))
                for i in range(3) for k in (f"conv{i}", f"norm{i}")}
    else:
        stem = {"conv0": _w_conv(sd, prefix + "conv0.weight"),
                "norm0": _bn_from(sd, prefix + "norm0")}
    p: Params = {"stem": stem, "blocks": [], "transitions": []}
    for i, layers in enumerate(cfg):
        lps = []
        for j in range(layers):
            base = f"{prefix}denseblock{i + 1}.denselayer{j + 1}."
            lps.append({
                "norm1": _bn_from(sd, base + "norm1"),
                "conv1": _w_conv(sd, base + "conv1.weight"),
                "norm2": _bn_from(sd, base + "norm2"),
                "conv2": _w_conv(sd, base + "conv2.weight"),
            })
        p["blocks"].append(lps)
        if i != len(cfg) - 1:
            tb = f"{prefix}transition{i + 1}."
            p["transitions"].append({
                "norm": _bn_from(sd, tb + "norm"),
                "conv": _w_conv(sd, tb + "conv.weight"),
            })
    p["norm5"] = _bn_from(sd, prefix + "norm5")
    return p
