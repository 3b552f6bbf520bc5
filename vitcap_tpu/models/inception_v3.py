"""Inception-V3 (the reference zoo's inception_v3.py:52-436).

Functional NHWC, eval semantics, matching the reference torch graph
op-for-op: BasicConv2d = conv (no bias) -> BN(eps 1e-3) -> relu; the five
mixed-block types A/B/C/D/E with their avg(3,1,p1 count-include-pad) /
max(3,2) pool branches and asymmetric (1,7)/(7,1)/(1,3)/(3,1) convs; stem
Conv2d_1a..4a with two 3x3/2 maxpools; 2048-dim global-avg-pool + fc head.
The aux head (InceptionAux) is a train-time-only branch and is not
replicated (timm's default inception_v3 also sets aux_logits=False).

Param tree keys mirror the torch module paths (`Mixed_6b.branch7x7_2`
-> {"conv", "bn"}), so the loader is a direct key walk.  The four
registered weight flavors (inception_v3 / tf_ / adv_ / gluon_) share this
single architecture.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .backbones import _batch_norm, _bn_from, _kaiming, _v, _w

Params = Dict[str, Any]

_BN_EPS = 1e-3

INCEPTION_V3_FEATURES = 2048
INCEPTION_V3_NAMES = ("inception_v3", "tf_inception_v3",
                      "adv_inception_v3", "gluon_inception_v3")


def _conv_specs() -> List[Tuple[str, int, int, Tuple[int, int],
                                Tuple[int, int], int]]:
    """(name, cin, cout, (kh, kw), (ph, pw), stride) for every BasicConv2d,
    in forward order metadata (inception_v3.py:293-318 + block defs)."""
    specs = []

    def c(name, cin, cout, k, p=(0, 0), s=1):
        kk = (k, k) if isinstance(k, int) else k
        pp = (p, p) if isinstance(p, int) else p
        specs.append((name, cin, cout, kk, pp, s))

    c("Conv2d_1a_3x3", 3, 32, 3, 0, 2)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 32, 64, 3, 1)
    c("Conv2d_3b_1x1", 64, 80, 1)
    c("Conv2d_4a_3x3", 80, 192, 3)

    def block_a(name, cin, pf):
        c(f"{name}.branch1x1", cin, 64, 1)
        c(f"{name}.branch5x5_1", cin, 48, 1)
        c(f"{name}.branch5x5_2", 48, 64, 5, 2)
        c(f"{name}.branch3x3dbl_1", cin, 64, 1)
        c(f"{name}.branch3x3dbl_2", 64, 96, 3, 1)
        c(f"{name}.branch3x3dbl_3", 96, 96, 3, 1)
        c(f"{name}.branch_pool", cin, pf, 1)

    def block_b(name, cin):
        c(f"{name}.branch3x3", cin, 384, 3, 0, 2)
        c(f"{name}.branch3x3dbl_1", cin, 64, 1)
        c(f"{name}.branch3x3dbl_2", 64, 96, 3, 1)
        c(f"{name}.branch3x3dbl_3", 96, 96, 3, 0, 2)

    def block_c(name, cin, c7):
        c(f"{name}.branch1x1", cin, 192, 1)
        c(f"{name}.branch7x7_1", cin, c7, 1)
        c(f"{name}.branch7x7_2", c7, c7, (1, 7), (0, 3))
        c(f"{name}.branch7x7_3", c7, 192, (7, 1), (3, 0))
        c(f"{name}.branch7x7dbl_1", cin, c7, 1)
        c(f"{name}.branch7x7dbl_2", c7, c7, (7, 1), (3, 0))
        c(f"{name}.branch7x7dbl_3", c7, c7, (1, 7), (0, 3))
        c(f"{name}.branch7x7dbl_4", c7, c7, (7, 1), (3, 0))
        c(f"{name}.branch7x7dbl_5", c7, 192, (1, 7), (0, 3))
        c(f"{name}.branch_pool", cin, 192, 1)

    def block_d(name, cin):
        c(f"{name}.branch3x3_1", cin, 192, 1)
        c(f"{name}.branch3x3_2", 192, 320, 3, 0, 2)
        c(f"{name}.branch7x7x3_1", cin, 192, 1)
        c(f"{name}.branch7x7x3_2", 192, 192, (1, 7), (0, 3))
        c(f"{name}.branch7x7x3_3", 192, 192, (7, 1), (3, 0))
        c(f"{name}.branch7x7x3_4", 192, 192, 3, 0, 2)

    def block_e(name, cin):
        c(f"{name}.branch1x1", cin, 320, 1)
        c(f"{name}.branch3x3_1", cin, 384, 1)
        c(f"{name}.branch3x3_2a", 384, 384, (1, 3), (0, 1))
        c(f"{name}.branch3x3_2b", 384, 384, (3, 1), (1, 0))
        c(f"{name}.branch3x3dbl_1", cin, 448, 1)
        c(f"{name}.branch3x3dbl_2", 448, 384, 3, 1)
        c(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3), (0, 1))
        c(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1), (1, 0))
        c(f"{name}.branch_pool", cin, 192, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)
    block_b("Mixed_6a", 288)
    block_c("Mixed_6b", 768, 128)
    block_c("Mixed_6c", 768, 160)
    block_c("Mixed_6d", 768, 160)
    block_c("Mixed_6e", 768, 192)
    block_d("Mixed_7a", 768)
    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return specs


def _bca(x, p, pad, stride):
    """BasicConv2d: conv(no bias) -> BN(eps 1e-3) -> relu."""
    if pad != (0, 0):
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]),
                        (0, 0)))
    x = jax.lax.conv_general_dilated(
        x, p["conv"], window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # mode-aware BN (batch stats + running-stat updates inside
    # zoo_train_mode; eval math unchanged)
    return _batch_norm(x, p["bn"], act=True, eps=_BN_EPS)


def _avg3_incl(x):
    """avg_pool2d(3, 1, padding=1), count_include_pad=True."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID") / 9.0


def _max32(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def apply_inception_v3(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, h, w, 2048) post-Mixed_7c feature map (the
    reference forward_features, inception_v3.py:339-392)."""
    meta = {s[0]: (s[4], s[5]) for s in _conv_specs()}

    def bca(name, x):
        pad, stride = meta[name]
        return _bca(x, p[name], pad, stride)

    x = bca("Conv2d_1a_3x3", images)
    x = bca("Conv2d_2a_3x3", x)
    x = bca("Conv2d_2b_3x3", x)
    x = _max32(x)
    x = bca("Conv2d_3b_1x1", x)
    x = bca("Conv2d_4a_3x3", x)
    x = _max32(x)

    def block_a(name, x):
        b1 = bca(f"{name}.branch1x1", x)
        b5 = bca(f"{name}.branch5x5_2", bca(f"{name}.branch5x5_1", x))
        b3 = bca(f"{name}.branch3x3dbl_3",
                 bca(f"{name}.branch3x3dbl_2",
                     bca(f"{name}.branch3x3dbl_1", x)))
        bp = bca(f"{name}.branch_pool", _avg3_incl(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)

    def block_b(name, x):
        b3 = bca(f"{name}.branch3x3", x)
        bd = bca(f"{name}.branch3x3dbl_3",
                 bca(f"{name}.branch3x3dbl_2",
                     bca(f"{name}.branch3x3dbl_1", x)))
        return jnp.concatenate([b3, bd, _max32(x)], axis=-1)

    def block_c(name, x):
        b1 = bca(f"{name}.branch1x1", x)
        b7 = bca(f"{name}.branch7x7_3",
                 bca(f"{name}.branch7x7_2", bca(f"{name}.branch7x7_1", x)))
        bd = x
        for i in range(1, 6):
            bd = bca(f"{name}.branch7x7dbl_{i}", bd)
        bp = bca(f"{name}.branch_pool", _avg3_incl(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)

    def block_d(name, x):
        b3 = bca(f"{name}.branch3x3_2", bca(f"{name}.branch3x3_1", x))
        b7 = x
        for i in range(1, 5):
            b7 = bca(f"{name}.branch7x7x3_{i}", b7)
        return jnp.concatenate([b3, b7, _max32(x)], axis=-1)

    def block_e(name, x):
        b1 = bca(f"{name}.branch1x1", x)
        b3 = bca(f"{name}.branch3x3_1", x)
        b3 = jnp.concatenate([bca(f"{name}.branch3x3_2a", b3),
                              bca(f"{name}.branch3x3_2b", b3)], axis=-1)
        bd = bca(f"{name}.branch3x3dbl_2", bca(f"{name}.branch3x3dbl_1", x))
        bd = jnp.concatenate([bca(f"{name}.branch3x3dbl_3a", bd),
                              bca(f"{name}.branch3x3dbl_3b", bd)], axis=-1)
        bp = bca(f"{name}.branch_pool", _avg3_incl(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)

    x = block_a("Mixed_5b", x)
    x = block_a("Mixed_5c", x)
    x = block_a("Mixed_5d", x)
    x = block_b("Mixed_6a", x)
    x = block_c("Mixed_6b", x)
    x = block_c("Mixed_6c", x)
    x = block_c("Mixed_6d", x)
    x = block_c("Mixed_6e", x)
    x = block_d("Mixed_7a", x)
    x = block_e("Mixed_7b", x)
    x = block_e("Mixed_7c", x)
    return x


def init_inception_v3(rng: jax.Array) -> Params:
    specs = _conv_specs()
    ks = iter(jax.random.split(rng, len(specs) + 1))
    p: Params = {}
    for name, cin, cout, (kh, kw), _, _ in specs:
        p[name] = {
            "conv": jax.random.truncated_normal(
                next(ks), -2.0, 2.0, (kh, kw, cin, cout),
                jnp.float32) * 0.1,
            "bn": {"scale": jnp.ones((cout,), jnp.float32),
                   "bias": jnp.zeros((cout,), jnp.float32),
                   "mean": jnp.zeros((cout,), jnp.float32),
                   "var": jnp.ones((cout,), jnp.float32)},
        }
    return p


def load_inception_v3(params: Params, sd: Dict[str, Any],
                      prefix: str = "") -> Params:
    """Load the reference timm InceptionV3 torch state-dict."""
    p: Params = {}
    for name in params:
        p[name] = {"conv": _w(sd, f"{prefix}{name}.conv.weight"),
                   "bn": _bn_from(sd, f"{prefix}{name}.bn")}
    return p
