"""Legacy SENet family (the reference zoo's senet.py:70-470 — the original
Cadene-layout SENet154 / SE-ResNet / SE-ResNeXt, distinct from resnet.py's
seresnets in both block math and state-dict layout).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op:

- SEModule (senet.py:70-86): 1x1 fc1 (bias) -> relu -> 1x1 fc2 (bias) ->
  sigmoid, reduce = channels // 16; applied to the block output BEFORE the
  residual add (`se(out) + residual`, :112).
- blocks: SEBottleneck (senet154: 1x1 -> 2*planes, grouped 3x3 ->
  4*planes, 1x1 4p -> 4p, :117-138); SEResNetBottleneck (stride on CONV1,
  the Caffe quirk, :141-163); SEResNeXtBottleneck (width =
  floor(planes*base_width/64)*groups, stride on conv2, :166-187);
  SEResNetBlock (two 3x3s, :190-223).
- layer0: 7x7/2 or senet154's three-3x3 stem; pool0 = MaxPool2d(3, 2,
  ceil_mode=True); downsample convs use kernel 3 pad 1 on layers 2-4 for
  senet154 (:226-320).

Torch state-dict loader: layer0.conv{i}/bn{i},
layer{k}.{i}.{conv,bn}{1,2,3}, .se_module.{fc1,fc2},
.downsample.{0,1}, last_linear.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_p, _bn_from, _kaiming, _v, _w
from .vovnet import _maxpool_ceil

Params = Dict[str, Any]

# name -> (block, layers, groups, inplanes, input_3x3, down_k)
SENETS = {
    "legacy_seresnet18": ("basic", (2, 2, 2, 2), 1, 64, False, 1),
    "legacy_seresnet34": ("basic", (3, 4, 6, 3), 1, 64, False, 1),
    "legacy_seresnet50": ("res", (3, 4, 6, 3), 1, 64, False, 1),
    "legacy_seresnet101": ("res", (3, 4, 23, 3), 1, 64, False, 1),
    "legacy_seresnet152": ("res", (3, 8, 36, 3), 1, 64, False, 1),
    "legacy_senet154": ("se154", (3, 8, 36, 3), 64, 128, True, 3),
    "legacy_seresnext26_32x4d": ("next", (2, 2, 2, 2), 32, 64, False, 1),
    "legacy_seresnext50_32x4d": ("next", (3, 4, 6, 3), 32, 64, False, 1),
    "legacy_seresnext101_32x4d": ("next", (3, 4, 23, 3), 32, 64, False, 1),
}
_PLANES = (64, 128, 256, 512)


def senet_feature_channels(variant: str) -> int:
    block = SENETS[variant][0]
    return _PLANES[-1] * (1 if block == "basic" else 4)


def _block_widths(block: str, planes: int, groups: int):
    """(c1_out, c2_out) mid widths per block type."""
    if block == "se154":
        return planes * 2, planes * 4
    if block == "next":
        w = math.floor(planes * (4 / 64)) * groups
        return w, w
    return planes, planes                              # res / basic


def _conv_p(x, w, stride=1, groups=1, pad=None):
    k = w.shape[0]
    p = k // 2 if pad is None else pad
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _se(x, p):
    s = jnp.mean(x, axis=(1, 2))
    s = jax.nn.relu(s @ p["fc1_w"] + p["fc1_b"])
    s = s @ p["fc2_w"] + p["fc2_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def apply_senet(p: Params, images: jnp.ndarray, variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, ~H/32, ~W/32, C) feature map (the reference
    forward_features, senet.py:377-384)."""
    block, layers, groups, inplanes, input_3x3, down_k = SENETS[variant]
    relu = jax.nn.relu
    st = p["layer0"]
    if input_3x3:
        x = relu(_batch_norm(_conv_p(images, st["conv1"], 2), st["bn1"],
                             act=False))
        x = relu(_batch_norm(_conv_p(x, st["conv2"]), st["bn2"],
                             act=False))
        x = relu(_batch_norm(_conv_p(x, st["conv3"]), st["bn3"],
                             act=False))
    else:
        x = relu(_batch_norm(_conv_p(images, st["conv1"], 2), st["bn1"],
                             act=False))
    x = _maxpool_ceil(x)
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            residual = x
            if "down_conv" in blk:
                residual = _batch_norm(
                    _conv_p(x, blk["down_conv"], s), blk["down_bn"],
                    act=False)
            if block == "basic":
                y = relu(_batch_norm(_conv_p(x, blk["conv1"], s),
                                     blk["bn1"], act=False))
                # SEResNetBlock relu's bn2 BEFORE the SE (senet.py:206-222)
                y = relu(_batch_norm(_conv_p(y, blk["conv2"], 1, groups),
                                     blk["bn2"], act=False))
            else:
                s1 = s if block == "res" else 1        # Caffe stride quirk
                s2 = s if block != "res" else 1
                y = relu(_batch_norm(_conv_p(x, blk["conv1"], s1),
                                     blk["bn1"], act=False))
                y = relu(_batch_norm(_conv_p(y, blk["conv2"], s2, groups),
                                     blk["bn2"], act=False))
                y = _batch_norm(_conv_p(y, blk["conv3"]), blk["bn3"],
                                act=False)
            x = relu(_se(y, blk["se"]) + residual)
    return x


def init_senet(rng: jax.Array, variant: str) -> Params:
    block, layers, groups, inplanes, input_3x3, down_k = SENETS[variant]
    ks = iter(jax.random.split(rng, 512))
    if input_3x3:
        st = {"conv1": _kaiming(next(ks), (3, 3, 3, 64)), "bn1": _bn_p(64),
              "conv2": _kaiming(next(ks), (3, 3, 64, 64)),
              "bn2": _bn_p(64),
              "conv3": _kaiming(next(ks), (3, 3, 64, inplanes)),
              "bn3": _bn_p(inplanes)}
    else:
        st = {"conv1": _kaiming(next(ks), (7, 7, 3, inplanes)),
              "bn1": _bn_p(inplanes)}
    p: Params = {"layer0": st, "stages": []}
    prev = inplanes
    exp = 1 if block == "basic" else 4
    for si, depth in enumerate(layers):
        planes = _PLANES[si]
        out = planes * exp
        c1, c2 = _block_widths(block, planes, groups)
        blocks = []
        for b in range(depth):
            s = (1 if si == 0 else 2) if b == 0 else 1
            red = out // 16
            if block == "basic":
                blk = {"conv1": _kaiming(next(ks), (3, 3, prev, planes)),
                       "bn1": _bn_p(planes),
                       "conv2": _kaiming(next(ks),
                                         (3, 3, planes // groups, planes)),
                       "bn2": _bn_p(planes)}
            else:
                blk = {"conv1": _kaiming(next(ks), (1, 1, prev, c1)),
                       "bn1": _bn_p(c1),
                       "conv2": _kaiming(next(ks), (3, 3, c1 // groups,
                                                    c2)),
                       "bn2": _bn_p(c2),
                       "conv3": _kaiming(next(ks), (1, 1, c2, out)),
                       "bn3": _bn_p(out)}
            k1, k2 = jax.random.split(next(ks))
            blk["se"] = {
                "fc1_w": jax.random.normal(k1, (out, red), jnp.float32)
                * np.sqrt(2.0 / red),
                "fc1_b": jnp.zeros((red,), jnp.float32),
                "fc2_w": jax.random.normal(k2, (red, out), jnp.float32)
                * np.sqrt(2.0 / out),
                "fc2_b": jnp.zeros((out,), jnp.float32),
            }
            if b == 0 and (s != 1 or prev != out):
                dk = 1 if si == 0 else down_k
                blk["down_conv"] = _kaiming(next(ks), (dk, dk, prev, out))
                blk["down_bn"] = _bn_p(out)
            blocks.append(blk)
            prev = out
        p["stages"].append(blocks)
    return p


def load_senet(params: Params, sd: Dict[str, Any], variant: str,
               prefix: str = "") -> Params:
    """Load the reference timm (Cadene-layout) SENet torch state-dict."""
    block, layers, groups, inplanes, input_3x3, down_k = SENETS[variant]
    if input_3x3:
        st = {f"conv{i}": _w(sd, f"{prefix}layer0.conv{i}.weight")
              for i in (1, 2, 3)}
        st.update({f"bn{i}": _bn_from(sd, f"{prefix}layer0.bn{i}")
                   for i in (1, 2, 3)})
    else:
        st = {"conv1": _w(sd, prefix + "layer0.conv1.weight"),
              "bn1": _bn_from(sd, prefix + "layer0.bn1")}
    p: Params = {"layer0": st, "stages": []}
    n_convs = 2 if block == "basic" else 3
    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}layer{si + 1}.{bi}."
            nb = {}
            for ci in range(1, n_convs + 1):
                nb[f"conv{ci}"] = _w(sd, base + f"conv{ci}.weight")
                nb[f"bn{ci}"] = _bn_from(sd, base + f"bn{ci}")
            f1 = np.asarray(sd[base + "se_module.fc1.weight"])[:, :, 0, 0]
            f2 = np.asarray(sd[base + "se_module.fc2.weight"])[:, :, 0, 0]
            nb["se"] = {
                "fc1_w": jnp.asarray(f1.T, jnp.float32),
                "fc1_b": _v(sd, base + "se_module.fc1.bias"),
                "fc2_w": jnp.asarray(f2.T, jnp.float32),
                "fc2_b": _v(sd, base + "se_module.fc2.bias"),
            }
            if "down_conv" in blk:
                nb["down_conv"] = _w(sd, base + "downsample.0.weight")
                nb["down_bn"] = _bn_from(sd, base + "downsample.1")
            nbs.append(nb)
        p["stages"].append(nbs)
    return p
