"""Inception-ResNet-V2 (the reference zoo's inception_resnet_v2.py:36-356).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: BasicConv2d = conv (no bias) -> BN(eps 1e-3) -> relu; the
scaled-residual Block35/Block17/Block8 towers (out = conv2d(cat(branches))
* scale + x, conv2d carries a bias; the final block8 omits its relu),
Mixed_5b/6a/7a reductions, count-exclude-pad avg branch, 1536-dim
conv2d_7b -> global-avg-pool -> classif head.

Param tree: flat dict keyed by the torch module path of each BasicConv2d
(-> {"conv", "bn"}) or residual-scale conv (-> {"w", "b"}).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_from, _v, _w
from .inception_v4 import _avg3_excl, _max32

Params = Dict[str, Any]

_BN_EPS = 1e-3
INCEPTION_RESNET_V2_FEATURES = 1536
INCEPTION_RESNET_V2_NAMES = ("inception_resnet_v2",
                             "ens_adv_inception_resnet_v2")

# scaled-residual tower layout: (#blocks, scale, conv-in, conv-out)
_REPEATS = (("repeat", 10, 0.17, 128, 320),
            ("repeat_1", 20, 0.10, 384, 1088),
            ("repeat_2", 9, 0.20, 448, 2080))


def _conv_specs():
    specs: List[Tuple[str, int, int, Tuple[int, int], Tuple[int, int],
                      int]] = []

    def c(key, cin, cout, k, p=(0, 0), s=1):
        kk = (k, k) if isinstance(k, int) else k
        pp = (p, p) if isinstance(p, int) else p
        specs.append((key, cin, cout, kk, pp, s))

    c("conv2d_1a", 3, 32, 3, 0, 2)
    c("conv2d_2a", 32, 32, 3)
    c("conv2d_2b", 32, 64, 3, 1)
    c("conv2d_3b", 64, 80, 1)
    c("conv2d_4a", 80, 192, 3)
    # Mixed_5b
    c("mixed_5b.branch0", 192, 96, 1)
    c("mixed_5b.branch1.0", 192, 48, 1)
    c("mixed_5b.branch1.1", 48, 64, 5, 2)
    c("mixed_5b.branch2.0", 192, 64, 1)
    c("mixed_5b.branch2.1", 64, 96, 3, 1)
    c("mixed_5b.branch2.2", 96, 96, 3, 1)
    c("mixed_5b.branch3.1", 192, 64, 1)
    # Block35 x10
    for i in range(10):
        b = f"repeat.{i}."
        c(b + "branch0", 320, 32, 1)
        c(b + "branch1.0", 320, 32, 1)
        c(b + "branch1.1", 32, 32, 3, 1)
        c(b + "branch2.0", 320, 32, 1)
        c(b + "branch2.1", 32, 48, 3, 1)
        c(b + "branch2.2", 48, 64, 3, 1)
    # Mixed_6a
    c("mixed_6a.branch0", 320, 384, 3, 0, 2)
    c("mixed_6a.branch1.0", 320, 256, 1)
    c("mixed_6a.branch1.1", 256, 256, 3, 1)
    c("mixed_6a.branch1.2", 256, 384, 3, 0, 2)
    # Block17 x20
    for i in range(20):
        b = f"repeat_1.{i}."
        c(b + "branch0", 1088, 192, 1)
        c(b + "branch1.0", 1088, 128, 1)
        c(b + "branch1.1", 128, 160, (1, 7), (0, 3))
        c(b + "branch1.2", 160, 192, (7, 1), (3, 0))
    # Mixed_7a
    c("mixed_7a.branch0.0", 1088, 256, 1)
    c("mixed_7a.branch0.1", 256, 384, 3, 0, 2)
    c("mixed_7a.branch1.0", 1088, 256, 1)
    c("mixed_7a.branch1.1", 256, 288, 3, 0, 2)
    c("mixed_7a.branch2.0", 1088, 256, 1)
    c("mixed_7a.branch2.1", 256, 288, 3, 1)
    c("mixed_7a.branch2.2", 288, 320, 3, 0, 2)
    # Block8 x9 + final no-relu block8
    for pref in [f"repeat_2.{i}." for i in range(9)] + ["block8."]:
        c(pref + "branch0", 2080, 192, 1)
        c(pref + "branch1.0", 2080, 192, 1)
        c(pref + "branch1.1", 192, 224, (1, 3), (0, 1))
        c(pref + "branch1.2", 224, 256, (3, 1), (1, 0))
    c("conv2d_7b", 2080, 1536, 1)
    return specs


def _scale_convs():
    """The biased 1x1 `conv2d` of every scaled-residual block."""
    out = []
    for i in range(10):
        out.append((f"repeat.{i}.conv2d", 128, 320))
    for i in range(20):
        out.append((f"repeat_1.{i}.conv2d", 384, 1088))
    for i in range(9):
        out.append((f"repeat_2.{i}.conv2d", 448, 2080))
    out.append(("block8.conv2d", 448, 2080))
    return out


def _bca(x, p, pad, stride):
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]),
                        (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["conv"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _batch_norm(x, p["bn"], act=True, eps=_BN_EPS)


def apply_inception_resnet_v2(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, h, w, 1536) post-conv2d_7b feature map (the
    reference forward_features, inception_resnet_v2.py:311-327)."""
    meta = {s[0]: (s[4], s[5]) for s in _conv_specs()}

    def bca(key, x):
        pad, stride = meta[key]
        return _bca(x, p[key], pad, stride)

    x = bca("conv2d_1a", images)
    x = bca("conv2d_2a", x)
    x = bca("conv2d_2b", x)
    x = _max32(x)
    x = bca("conv2d_3b", x)
    x = bca("conv2d_4a", x)
    x = _max32(x)
    # Mixed_5b
    x = jnp.concatenate([
        bca("mixed_5b.branch0", x),
        bca("mixed_5b.branch1.1", bca("mixed_5b.branch1.0", x)),
        bca("mixed_5b.branch2.2",
            bca("mixed_5b.branch2.1", bca("mixed_5b.branch2.0", x))),
        bca("mixed_5b.branch3.1", _avg3_excl(x)),
    ], -1)

    def res_block(prefix, x, scale, branches, final_relu=True):
        cat = jnp.concatenate(branches, -1)
        sc = p[prefix + "conv2d"]
        y = jnp.einsum("bhwc,co->bhwo", cat, sc["w"]) + sc["b"]
        y = y * scale + x
        return jax.nn.relu(y) if final_relu else y

    for i in range(10):
        b = f"repeat.{i}."
        x = res_block(b, x, 0.17, [
            bca(b + "branch0", x),
            bca(b + "branch1.1", bca(b + "branch1.0", x)),
            bca(b + "branch2.2",
                bca(b + "branch2.1", bca(b + "branch2.0", x)))])
    # Mixed_6a
    x = jnp.concatenate([
        bca("mixed_6a.branch0", x),
        bca("mixed_6a.branch1.2",
            bca("mixed_6a.branch1.1", bca("mixed_6a.branch1.0", x))),
        _max32(x)], -1)
    for i in range(20):
        b = f"repeat_1.{i}."
        x = res_block(b, x, 0.10, [
            bca(b + "branch0", x),
            bca(b + "branch1.2",
                bca(b + "branch1.1", bca(b + "branch1.0", x)))])
    # Mixed_7a
    x = jnp.concatenate([
        bca("mixed_7a.branch0.1", bca("mixed_7a.branch0.0", x)),
        bca("mixed_7a.branch1.1", bca("mixed_7a.branch1.0", x)),
        bca("mixed_7a.branch2.2",
            bca("mixed_7a.branch2.1", bca("mixed_7a.branch2.0", x))),
        _max32(x)], -1)
    for i in range(9):
        b = f"repeat_2.{i}."
        x = res_block(b, x, 0.20, [
            bca(b + "branch0", x),
            bca(b + "branch1.2",
                bca(b + "branch1.1", bca(b + "branch1.0", x)))])
    b = "block8."
    x = res_block(b, x, 1.0, [
        bca(b + "branch0", x),
        bca(b + "branch1.2",
            bca(b + "branch1.1", bca(b + "branch1.0", x)))],
        final_relu=False)
    return bca("conv2d_7b", x)


def init_inception_resnet_v2(rng: jax.Array) -> Params:
    specs = _conv_specs()
    scs = _scale_convs()
    ks = iter(jax.random.split(rng, len(specs) + len(scs) + 1))
    p: Params = {}
    for key, cin, cout, (kh, kw), _, _ in specs:
        p[key] = {
            "conv": jax.random.normal(next(ks), (kh, kw, cin, cout),
                                      jnp.float32)
            * np.sqrt(2.0 / (kh * kw * cout)),
            "bn": {"scale": jnp.ones((cout,), jnp.float32),
                   "bias": jnp.zeros((cout,), jnp.float32),
                   "mean": jnp.zeros((cout,), jnp.float32),
                   "var": jnp.ones((cout,), jnp.float32)},
        }
    for key, cin, cout in scs:
        p[key] = {"w": jax.random.normal(next(ks), (cin, cout), jnp.float32)
                  * np.sqrt(1.0 / cin),
                  "b": jnp.zeros((cout,), jnp.float32)}
    return p


def load_inception_resnet_v2(params: Params, sd: Dict[str, Any],
                             prefix: str = "") -> Params:
    """Load the reference timm InceptionResnetV2 torch state-dict."""
    p: Params = {}
    for key in params:
        if key.endswith("conv2d"):
            w = np.asarray(sd[f"{prefix}{key}.weight"])[:, :, 0, 0]
            p[key] = {"w": jnp.asarray(w.T, jnp.float32),
                      "b": _v(sd, f"{prefix}{key}.bias")}
        else:
            p[key] = {"conv": _w(sd, f"{prefix}{key}.conv.weight"),
                      "bn": _bn_from(sd, f"{prefix}{key}.bn")}
    return p
