"""Inception-V4 (the reference zoo's inception_v4.py:26-320).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: BasicConv2d = conv (no bias) -> BN(eps 1e-3) -> relu; the stem
Mixed3a/4a/5a concat-reductions, 4x InceptionA + ReductionA, 7x InceptionB
+ ReductionB, 3x InceptionC; avg-pool branches use
count_include_pad=FALSE (unlike inception_v3); head = 1536-dim
global-avg-pool + last_linear.

Param tree: a flat dict keyed by the torch module path of each
BasicConv2d (e.g. "features.4.branch1.2"), each -> {"conv", "bn"}; the
loader is a direct key walk.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_from, _v, _w

Params = Dict[str, Any]

_BN_EPS = 1e-3
INCEPTION_V4_FEATURES = 1536


def _conv_specs():
    """(key, cin, cout, (kh, kw), (ph, pw), stride) for every BasicConv2d
    (inception_v4.py:26-276)."""
    specs: List[Tuple[str, int, int, Tuple[int, int], Tuple[int, int],
                      int]] = []

    def c(key, cin, cout, k, p=(0, 0), s=1):
        kk = (k, k) if isinstance(k, int) else k
        pp = (p, p) if isinstance(p, int) else p
        specs.append((key, cin, cout, kk, pp, s))

    c("features.0", 3, 32, 3, 0, 2)
    c("features.1", 32, 32, 3)
    c("features.2", 32, 64, 3, 1)
    c("features.3.conv", 64, 96, 3, 0, 2)              # Mixed3a
    c("features.4.branch0.0", 160, 64, 1)              # Mixed4a
    c("features.4.branch0.1", 64, 96, 3)
    c("features.4.branch1.0", 160, 64, 1)
    c("features.4.branch1.1", 64, 64, (1, 7), (0, 3))
    c("features.4.branch1.2", 64, 64, (7, 1), (3, 0))
    c("features.4.branch1.3", 64, 96, 3)
    c("features.5.conv", 192, 192, 3, 0, 2)            # Mixed5a

    def block_a(i):
        b = f"features.{i}."
        c(b + "branch0", 384, 96, 1)
        c(b + "branch1.0", 384, 64, 1)
        c(b + "branch1.1", 64, 96, 3, 1)
        c(b + "branch2.0", 384, 64, 1)
        c(b + "branch2.1", 64, 96, 3, 1)
        c(b + "branch2.2", 96, 96, 3, 1)
        c(b + "branch3.1", 384, 96, 1)

    for i in (6, 7, 8, 9):
        block_a(i)
    c("features.10.branch0", 384, 384, 3, 0, 2)        # ReductionA
    c("features.10.branch1.0", 384, 192, 1)
    c("features.10.branch1.1", 192, 224, 3, 1)
    c("features.10.branch1.2", 224, 256, 3, 0, 2)

    def block_b(i):
        b = f"features.{i}."
        c(b + "branch0", 1024, 384, 1)
        c(b + "branch1.0", 1024, 192, 1)
        c(b + "branch1.1", 192, 224, (1, 7), (0, 3))
        c(b + "branch1.2", 224, 256, (7, 1), (3, 0))
        c(b + "branch2.0", 1024, 192, 1)
        c(b + "branch2.1", 192, 192, (7, 1), (3, 0))
        c(b + "branch2.2", 192, 224, (1, 7), (0, 3))
        c(b + "branch2.3", 224, 224, (7, 1), (3, 0))
        c(b + "branch2.4", 224, 256, (1, 7), (0, 3))
        c(b + "branch3.1", 1024, 128, 1)

    for i in range(11, 18):
        block_b(i)
    c("features.18.branch0.0", 1024, 192, 1)           # ReductionB
    c("features.18.branch0.1", 192, 192, 3, 0, 2)
    c("features.18.branch1.0", 1024, 256, 1)
    c("features.18.branch1.1", 256, 256, (1, 7), (0, 3))
    c("features.18.branch1.2", 256, 320, (7, 1), (3, 0))
    c("features.18.branch1.3", 320, 320, 3, 0, 2)

    def block_c(i):
        b = f"features.{i}."
        c(b + "branch0", 1536, 256, 1)
        c(b + "branch1_0", 1536, 384, 1)
        c(b + "branch1_1a", 384, 256, (1, 3), (0, 1))
        c(b + "branch1_1b", 384, 256, (3, 1), (1, 0))
        c(b + "branch2_0", 1536, 384, 1)
        c(b + "branch2_1", 384, 448, (3, 1), (1, 0))
        c(b + "branch2_2", 448, 512, (1, 3), (0, 1))
        c(b + "branch2_3a", 512, 256, (1, 3), (0, 1))
        c(b + "branch2_3b", 512, 256, (3, 1), (1, 0))
        c(b + "branch3.1", 1536, 256, 1)

    for i in (19, 20, 21):
        block_c(i)
    return specs


def _bca(x, p, pad, stride):
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]),
                        (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["conv"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _batch_norm(x, p["bn"], act=True, eps=_BN_EPS)


def _avg3_excl(x):
    """avg_pool2d(3, 1, pad 1, count_include_pad=False)."""
    s = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    num = jax.lax.reduce_window(s, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "VALID")
    ones = jnp.pad(jnp.ones(x.shape[:3] + (1,), x.dtype),
                   ((0, 0), (1, 1), (1, 1), (0, 0)))
    den = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), "VALID")
    return num / den


def _max32(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def apply_inception_v4(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, h, w, 1536) final feature map (the reference
    forward_features, inception_v4.py:300-301)."""
    meta = {s[0]: (s[4], s[5]) for s in _conv_specs()}

    def bca(key, x):
        pad, stride = meta[key]
        return _bca(x, p[key], pad, stride)

    x = bca("features.0", images)
    x = bca("features.1", x)
    x = bca("features.2", x)
    x = jnp.concatenate([_max32(x), bca("features.3.conv", x)], -1)
    b0 = bca("features.4.branch0.1", bca("features.4.branch0.0", x))
    b1 = x
    for j in range(4):
        b1 = bca(f"features.4.branch1.{j}", b1)
    x = jnp.concatenate([b0, b1], -1)
    x = jnp.concatenate([bca("features.5.conv", x), _max32(x)], -1)

    def block_a(i, x):
        b = f"features.{i}."
        x0 = bca(b + "branch0", x)
        x1 = bca(b + "branch1.1", bca(b + "branch1.0", x))
        x2 = bca(b + "branch2.2", bca(b + "branch2.1",
                                      bca(b + "branch2.0", x)))
        x3 = bca(b + "branch3.1", _avg3_excl(x))
        return jnp.concatenate([x0, x1, x2, x3], -1)

    for i in (6, 7, 8, 9):
        x = block_a(i, x)
    # ReductionA
    x0 = bca("features.10.branch0", x)
    x1 = x
    for j in range(3):
        x1 = bca(f"features.10.branch1.{j}", x1)
    x = jnp.concatenate([x0, x1, _max32(x)], -1)

    def block_b(i, x):
        b = f"features.{i}."
        x0 = bca(b + "branch0", x)
        x1 = x
        for j in range(3):
            x1 = bca(b + f"branch1.{j}", x1)
        x2 = x
        for j in range(5):
            x2 = bca(b + f"branch2.{j}", x2)
        x3 = bca(b + "branch3.1", _avg3_excl(x))
        return jnp.concatenate([x0, x1, x2, x3], -1)

    for i in range(11, 18):
        x = block_b(i, x)
    # ReductionB
    x0 = bca("features.18.branch0.1", bca("features.18.branch0.0", x))
    x1 = x
    for j in range(4):
        x1 = bca(f"features.18.branch1.{j}", x1)
    x = jnp.concatenate([x0, x1, _max32(x)], -1)

    def block_c(i, x):
        b = f"features.{i}."
        x0 = bca(b + "branch0", x)
        x1_0 = bca(b + "branch1_0", x)
        x1 = jnp.concatenate([bca(b + "branch1_1a", x1_0),
                              bca(b + "branch1_1b", x1_0)], -1)
        x2 = bca(b + "branch2_2", bca(b + "branch2_1",
                                      bca(b + "branch2_0", x)))
        x2 = jnp.concatenate([bca(b + "branch2_3a", x2),
                              bca(b + "branch2_3b", x2)], -1)
        x3 = bca(b + "branch3.1", _avg3_excl(x))
        return jnp.concatenate([x0, x1, x2, x3], -1)

    for i in (19, 20, 21):
        x = block_c(i, x)
    return x


def init_inception_v4(rng: jax.Array) -> Params:
    specs = _conv_specs()
    ks = iter(jax.random.split(rng, len(specs) + 1))
    p: Params = {}
    for key, cin, cout, (kh, kw), _, _ in specs:
        p[key] = {
            "conv": jax.random.truncated_normal(
                next(ks), -2.0, 2.0, (kh, kw, cin, cout),
                jnp.float32) * 0.1,
            "bn": {"scale": jnp.ones((cout,), jnp.float32),
                   "bias": jnp.zeros((cout,), jnp.float32),
                   "mean": jnp.zeros((cout,), jnp.float32),
                   "var": jnp.ones((cout,), jnp.float32)},
        }
    return p


def load_inception_v4(params: Params, sd: Dict[str, Any],
                      prefix: str = "") -> Params:
    """Load the reference timm InceptionV4 torch state-dict."""
    p: Params = {}
    for key in params:
        p[key] = {"conv": _w(sd, f"{prefix}{key}.conv.weight"),
                  "bn": _bn_from(sd, f"{prefix}{key}.bn")}
    return p
