"""CNN stems for the hybrid ViTs (the reference zoo's `vit_*_resnet*`
models: R50+ViT-B/16 from the ViT paper and the custom resnet26d/50d
hybrids, reference vision_transformer.py:1377-1446).

Two families, functional NHWC, eval semantics (the hybrids are feature
extractors under the ViT):

- `resnetv2_r50`: 3-stage ResNetV2 without pre-activation —
  weight-standardized convs with TF-'SAME' padding, GroupNorm(32)+ReLU
  (reference resnetv2.py:171-217 Bottleneck, :277-307 create_stem,
  :309-380; StdConv2dSame std_conv.py:41-60: divide by std+eps, NOT
  sqrt(var+eps)).
- `resnet_d`: classic BatchNorm bottleneck ResNet with deep 3-conv stem
  and avg-pool downsample (reference resnet.py:695-716 resnet26d/50d).
  BatchNorm runs in eval mode on running stats.  Torch's symmetric
  padding is replicated with explicit ((1,1),(1,1)) pads — TF-'SAME'
  aligns differently for stride 2 on even inputs.

Parameters load from the reference's torch state-dict key layout
(`patch_embed.backbone.*`) via the loaders at the bottom.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_EPS = 1e-5


def _conv(x, w, stride=1, padding="SAME", dilation=1, groups=1):
    """NHWC x, HWIO w (I = C_in/groups for grouped convs)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _std_conv(x, w, stride=1, padding="SAME"):
    """Weight-standardized conv (per OUT channel over kh,kw,in):
    (w - mean) / (std + eps) — note eps adds to STD (std_conv.py:33)."""
    mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(w, axis=(0, 1, 2), keepdims=True)
    return _conv(x, (w - mean) / (std + _EPS), stride, padding)


def _group_norm(x, p, groups=32, act=True):
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + _EPS)
    x = xg.reshape(B, H, W, C) * p["scale"] + p["bias"]
    return jax.nn.relu(x) if act else x


def _batch_norm(x, p, act=True, eps=_EPS):
    """BatchNorm.  eps defaults to torch's 1e-5; the TF-ported zoo variants
    pass BN_EPS_TF_DEFAULT=1e-3 (reference efficientnet_blocks.py:24,
    resolve_bn_args).

    Eval mode (default): normalize on running stats.  Inside a
    `zoo_train_mode` context: normalize on the BATCH stats (biased
    variance), differentiable through them exactly like torch train-mode
    BN, and record the running-stat update (momentum-blended, UNBIASED
    batch variance — torch _BatchNorm semantics) for
    `bn_updated_params`."""
    tm = _TRAIN_MODE
    if tm is None:
        inv = jax.lax.rsqrt(p["var"] + eps)
        x = (x - p["mean"]) * inv * p["scale"] + p["bias"]
        return jax.nn.relu(x) if act else x
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axes)
    # centered two-pass variance: E[x^2]-E[x]^2 cancels catastrophically
    # (and can go slightly negative -> rsqrt NaN) for channels whose mean
    # dwarfs the spread; torch computes the centered form too
    var = jnp.mean(jnp.square(xf - mean), axes)               # biased
    n = 1
    for i in axes:
        n *= x.shape[i]
    m = tm.momentum
    unbiased = var * (n / max(n - 1, 1))
    tm.record_bn(p,
                 jax.lax.stop_gradient((1.0 - m) * p["mean"] + m * mean),
                 jax.lax.stop_gradient((1.0 - m) * p["var"] + m * unbiased))
    xh = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    x = xh.astype(x.dtype)
    return jax.nn.relu(x) if act else x


# --- zoo train mode --------------------------------------------------------
#
# The reference's vendored timm trains: BatchNorm uses batch statistics and
# updates running stats (torch _BatchNorm), stochastic depth drops residual
# branches per sample (reference layers/drop.py:140-157 drop_path,
# efficientnet_blocks.py:201-202), and head dropout precedes the classifier
# (resnet.py:641-642, mobilenetv3.py:142-143).  The functional zoo gets the
# same semantics through a trace-time context: wrap the apply call in
# `zoo_train_mode`, then materialize the running-stat updates with
# `bn_updated_params` INSIDE the same traced function:
#
#     def loss_fn(params, x, rng):
#         with zoo_train_mode(rng, drop_path_rate=0.2, drop_rate=0.2) as tm:
#             logits = model.apply(params, x, head=True)
#             new_params = bn_updated_params(params, tm)
#         return loss(logits), new_params
#
# The context is trace-time state (a module global), not runtime state —
# under jit the branch is resolved during tracing, so eval applies compile
# to exactly the old graph.

class ZooTrainMode:
    """Collects per-BN running-stat updates and deals dropout RNG during one
    traced forward.  momentum: torch BN default 0.1; the TF-ported effnet
    variants use 0.01 (reference efficientnet_builder.py:18
    BN_MOMENTUM_TF_DEFAULT, see efficientnet.effnet_bn_momentum)."""

    def __init__(self, rng, momentum=0.1, drop_path_rate=0.0,
                 drop_rate=0.0):
        self.rng = rng
        self.momentum = float(momentum)
        self.drop_path_rate = float(drop_path_rate)
        self.drop_rate = float(drop_rate)
        # id(bn dict) -> (bn dict, new_mean, new_var); the dict reference is
        # kept so the id stays pinned for the life of the trace
        self._bn: Dict[int, Any] = {}

    def record_bn(self, p, new_mean, new_var):
        self._bn[id(p)] = (p, new_mean, new_var)

    def next_rng(self):
        if self.rng is None:
            raise ValueError("zoo_train_mode needs an rng key when "
                             "drop_path_rate/drop_rate > 0")
        self.rng, sub = jax.random.split(self.rng)
        return sub


_TRAIN_MODE = None


class zoo_train_mode:
    """Context manager enabling reference train() semantics for the zoo.

    The mode is TRACE-time state (a module global), not runtime state:
    a jitted callable bakes in whichever mode was active when it was
    first traced, and its jit cache key does NOT include the mode.  Any
    jitted function used inside this context must therefore be defined
    (or at least first called) inside it — reusing a callable already
    traced in eval mode silently keeps eval semantics (and vice versa).
    The tests' pattern — `jax.jit` the `with zoo_train_mode(...)` body
    itself — is the supported one.  The global is also per-process, not
    per-thread; don't trace zoo models concurrently from threads with
    different modes."""

    def __init__(self, rng=None, momentum=0.1, drop_path_rate=0.0,
                 drop_rate=0.0):
        self._tm = ZooTrainMode(rng, momentum, drop_path_rate, drop_rate)

    def __enter__(self):
        global _TRAIN_MODE
        self._prev = _TRAIN_MODE
        _TRAIN_MODE = self._tm
        return self._tm

    def __exit__(self, *exc):
        global _TRAIN_MODE
        _TRAIN_MODE = self._prev
        return False


def bn_updated_params(params, tm: ZooTrainMode):
    """New params tree with the running stats recorded by `tm` blended in
    (call inside the same trace as the forward that filled `tm`)."""

    def walk(node):
        if isinstance(node, dict):
            rec = tm._bn.get(id(node))
            if rec is not None and rec[0] is node:
                out = dict(node)
                out["mean"], out["var"] = rec[1], rec[2]
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def _drop_path(x, rate_scale=1.0):
    """Stochastic depth on a residual branch (reference drop.py:150-157:
    per-sample keep mask `floor(keep_prob + U[0,1))`, surviving branches
    scaled by 1/keep_prob).  rate_scale implements the builder's linear
    depth schedule `drop_path_rate * block_idx / block_count`
    (efficientnet_builder.py:252).  Identity in eval mode."""
    tm = _TRAIN_MODE
    if tm is None:
        return x
    rate = tm.drop_path_rate * rate_scale
    if rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(tm.next_rng(), shape,
                                               jnp.float32))
    return x * (mask / keep).astype(x.dtype)


def _head_dropout(x):
    """Classifier-head dropout (reference resnet.py:641-642 F.dropout).
    Identity in eval mode."""
    tm = _TRAIN_MODE
    if tm is None or tm.drop_rate == 0.0:
        return x
    keep = 1.0 - tm.drop_rate
    mask = jax.random.bernoulli(tm.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _max_pool(x, window=3, stride=2, padding="SAME"):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding)


def _avg_pool2(x):
    """AvgPool2d(2, 2) (DownsampleAvg, resnetv2.py:231-247)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    return s / 4.0


def _pad1(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


# BlurPool2d (reference layers/blur_pool.py:19-59): reflect-pad 1, fixed
# [1,2,1]/4 binomial filter outer-product, depthwise stride-2 conv.
_BLUR_FILT = np.outer((0.25, 0.5, 0.25), (0.25, 0.5, 0.25))


def _blur_pool(x, stride=2):
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    w = jnp.broadcast_to(jnp.asarray(_BLUR_FILT, x.dtype)[:, :, None, None],
                         (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        xp, w, (stride, stride), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def _kaiming(rng, shape):
    fan_out = shape[0] * shape[1] * shape[3]
    return jax.random.normal(rng, shape, jnp.float32) * np.sqrt(2.0 / fan_out)


def _norm_p(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _bn_p(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


# ---------------------------------------------------------------------------
# ResNetV2 (R50+ViT hybrid stem): StdConvSame + GroupNorm, no pre-act
# ---------------------------------------------------------------------------

R50_LAYERS = (3, 4, 9)
R50_CHANNELS = (256, 512, 1024)


def init_resnetv2_r50(rng: jax.Array) -> Params:
    ks = iter(jax.random.split(rng, 64))
    p: Params = {
        "stem": {"conv": _kaiming(next(ks), (7, 7, 3, 64)),
                 "norm": _norm_p(64)},
        "stages": [],
    }
    prev = 64
    for depth, out in zip(R50_LAYERS, R50_CHANNELS):
        mid = out // 4
        blocks = []
        for b in range(depth):
            blk = {
                "conv1": _kaiming(next(ks), (1, 1, prev, mid)),
                "norm1": _norm_p(mid),
                "conv2": _kaiming(next(ks), (3, 3, mid, mid)),
                "norm2": _norm_p(mid),
                "conv3": _kaiming(next(ks), (1, 1, mid, out)),
                "norm3": _norm_p(out),
            }
            if b == 0:
                blk["down_conv"] = _kaiming(next(ks), (1, 1, prev, out))
                blk["down_norm"] = _norm_p(out)
            blocks.append(blk)
            prev = out
        p["stages"].append(blocks)
    return p


def apply_resnetv2_r50(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) float -> (B, H/16, W/16, 1024)."""
    x = _std_conv(images, p["stem"]["conv"], stride=2, padding="SAME")
    x = _group_norm(x, p["stem"]["norm"])
    x = _max_pool(x, 3, 2, "SAME")
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            shortcut = x
            if "down_conv" in blk:
                shortcut = _std_conv(x, blk["down_conv"], stride=s)
                shortcut = _group_norm(x=shortcut, p=blk["down_norm"],
                                       act=False)
            y = _group_norm(_std_conv(x, blk["conv1"]), blk["norm1"])
            y = _group_norm(_std_conv(y, blk["conv2"], stride=s),
                            blk["norm2"])
            y = _group_norm(_std_conv(y, blk["conv3"]), blk["norm3"],
                            act=False)
            x = jax.nn.relu(y + shortcut)
    return x


# ---------------------------------------------------------------------------
# ResNet family (reference resnet.py:481-795): BN bottleneck/basic blocks,
# 7x7 or deep 3-conv stem, conv or avg-pool downsample.  The -d variants
# (deep stem + avg-down) double as hybrid-ViT stems.
# ---------------------------------------------------------------------------

# variant -> (per-stage block counts, block type, stem type, downsample type)
RESNETS = {
    "resnet18": ((2, 2, 2, 2), "basic", "7x7", "conv"),
    "resnet18d": ((2, 2, 2, 2), "basic", "deep", "avg"),
    "resnet34": ((3, 4, 6, 3), "basic", "7x7", "conv"),
    "resnet34d": ((3, 4, 6, 3), "basic", "deep", "avg"),
    "resnet26": ((2, 2, 2, 2), "bottleneck", "7x7", "conv"),
    "resnet26d": ((2, 2, 2, 2), "bottleneck", "deep", "avg"),
    "resnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv"),
    "resnet50d": ((3, 4, 6, 3), "bottleneck", "deep", "avg"),
    "resnet101": ((3, 4, 23, 3), "bottleneck", "7x7", "conv"),
    "resnet101d": ((3, 4, 23, 3), "bottleneck", "deep", "avg"),
    "resnet152": ((3, 8, 36, 3), "bottleneck", "7x7", "conv"),
    "resnet152d": ((3, 8, 36, 3), "bottleneck", "deep", "avg"),
    "resnet200": ((3, 24, 36, 3), "bottleneck", "7x7", "conv"),
    "resnet200d": ((3, 24, 36, 3), "bottleneck", "deep", "avg"),
    # resnext: grouped bottleneck, width = floor(planes*bw/64)*cardinality
    # (reference resnet.py:331, :851-888)
    "resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                        dict(card=32, bw=4)),
    "resnext50d_32x4d": ((3, 4, 6, 3), "bottleneck", "deep", "avg",
                         dict(card=32, bw=4)),
    "resnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                         dict(card=32, bw=4)),
    "resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                         dict(card=32, bw=8)),
    "resnext101_64x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                         dict(card=64, bw=4)),
    # seresnet/seresnext: SEModule(out, reduction=16) after the last BN
    # (reference resnet.py:281/:351 create_attn, :1188-1320)
    "seresnet18": ((2, 2, 2, 2), "basic", "7x7", "conv", dict(se=True)),
    "seresnet34": ((3, 4, 6, 3), "basic", "7x7", "conv", dict(se=True)),
    "seresnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                   dict(se=True)),
    "seresnet101": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                    dict(se=True)),
    "seresnet152": ((3, 8, 36, 3), "bottleneck", "7x7", "conv",
                    dict(se=True)),
    "seresnet152d": ((3, 8, 36, 3), "bottleneck", "deep", "avg",
                     dict(se=True)),
    # same arch as seresnet152d; separate name for the 320x320-eval
    # pretrained cfg (resnet.py:1253-1258)
    "seresnet152d_320": ((3, 8, 36, 3), "bottleneck", "deep", "avg",
                         dict(se=True)),
    "seresnext26d_32x4d": ((2, 2, 2, 2), "bottleneck", "deep", "avg",
                           dict(card=32, bw=4, se=True)),
    "seresnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                          dict(card=32, bw=4, se=True)),
    "seresnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                           dict(card=32, bw=4, se=True)),
    "seresnext101_32x8d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                           dict(card=32, bw=8, se=True)),
    # res2net/res2next: scale-split Bottle2neck in the standard ResNet
    # shell (reference res2net.py:48-133, registrations :140-216)
    "res2net50_26w_4s": ((3, 4, 6, 3), "res2", "7x7", "conv",
                         dict(bw=26, scale=4)),
    "res2net101_26w_4s": ((3, 4, 23, 3), "res2", "7x7", "conv",
                          dict(bw=26, scale=4)),
    "res2net50_26w_6s": ((3, 4, 6, 3), "res2", "7x7", "conv",
                         dict(bw=26, scale=6)),
    "res2net50_26w_8s": ((3, 4, 6, 3), "res2", "7x7", "conv",
                         dict(bw=26, scale=8)),
    "res2net50_48w_2s": ((3, 4, 6, 3), "res2", "7x7", "conv",
                         dict(bw=48, scale=2)),
    "res2net50_14w_8s": ((3, 4, 6, 3), "res2", "7x7", "conv",
                         dict(bw=14, scale=8)),
    "res2next50": ((3, 4, 6, 3), "res2", "7x7", "conv",
                   dict(card=8, bw=4, scale=4)),
    # torchvision / ssl / swsl / ig re-registrations (resnet.py:795-1069):
    # identical graphs, distinct pretrained-weight identities
    "tv_resnet34": ((3, 4, 6, 3), "basic", "7x7", "conv"),
    "tv_resnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv"),
    "tv_resnet101": ((3, 4, 23, 3), "bottleneck", "7x7", "conv"),
    "tv_resnet152": ((3, 8, 36, 3), "bottleneck", "7x7", "conv"),
    "tv_resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                           dict(card=32, bw=4)),
    "ssl_resnet18": ((2, 2, 2, 2), "basic", "7x7", "conv"),
    "ssl_resnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv"),
    "ssl_resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                            dict(card=32, bw=4)),
    "ssl_resnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=4)),
    "ssl_resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=8)),
    "ssl_resnext101_32x16d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                              dict(card=32, bw=16)),
    "swsl_resnet18": ((2, 2, 2, 2), "basic", "7x7", "conv"),
    "swsl_resnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv"),
    "swsl_resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=4)),
    "swsl_resnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                              dict(card=32, bw=4)),
    "swsl_resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                              dict(card=32, bw=8)),
    "swsl_resnext101_32x16d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                               dict(card=32, bw=16)),
    "ig_resnext101_32x8d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                            dict(card=32, bw=8)),
    "ig_resnext101_32x16d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=16)),
    "ig_resnext101_32x32d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=32)),
    "ig_resnext101_32x48d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                             dict(card=32, bw=48)),
    # wide resnets: 2x bottleneck width (resnet.py:828-847)
    "wide_resnet50_2": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                        dict(bw=128)),
    "wide_resnet101_2": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                         dict(bw=128)),
    # 320x320 default-cfg duplicates of the -d models (resnet.py:736-792)
    "resnet101d_320": ((3, 4, 23, 3), "bottleneck", "deep", "avg"),
    "resnet152d_320": ((3, 8, 36, 3), "bottleneck", "deep", "avg"),
    "resnet200d_320": ((3, 24, 36, 3), "bottleneck", "deep", "avg"),
    # deep SE models + tiered stems (resnet.py:1187-1306): 't' stem is
    # (24, 48, 64), 'tn' is (24, 32, 64) (resnet.py:566-571)
    "seresnet200d": ((3, 24, 36, 3), "bottleneck", "deep", "avg",
                     dict(se=True)),
    "seresnet269d": ((3, 30, 48, 8), "bottleneck", "deep", "avg",
                     dict(se=True)),
    "seresnet50tn": ((3, 4, 6, 3), "bottleneck", "tiered_narrow", "avg",
                     dict(se=True)),
    "seresnext26_32x4d": ((2, 2, 2, 2), "bottleneck", "7x7", "conv",
                          dict(card=32, bw=4, se=True)),
    "seresnext26t_32x4d": ((2, 2, 2, 2), "bottleneck", "tiered", "avg",
                           dict(card=32, bw=4, se=True)),
    "seresnext26tn_32x4d": ((2, 2, 2, 2), "bottleneck", "tiered_narrow",
                            "avg", dict(card=32, bw=4, se=True)),
    # ECA-attention resnets (resnet.py:1071-1168; layers/eca.py:44-69:
    # adaptive 1d-conv kernel over the channel-pooled vector)
    "ecaresnet18": ((2, 2, 2, 2), "basic", "7x7", "conv",
                    dict(attn="eca")),
    "ecaresnet50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                    dict(attn="eca")),
    "ecaresnet50d": ((3, 4, 6, 3), "bottleneck", "deep", "avg",
                     dict(attn="eca")),
    # 'light': 7x7 stem + avg-down, layers (1, 1, 11, 3) (resnet.py:1108)
    "ecaresnetlight": ((1, 1, 11, 3), "bottleneck", "7x7", "avg",
                       dict(attn="eca")),
    "ecaresnet101d": ((3, 4, 23, 3), "bottleneck", "deep", "avg",
                      dict(attn="eca")),
    "ecaresnet200d": ((3, 24, 36, 3), "bottleneck", "deep", "avg",
                      dict(attn="eca")),
    "ecaresnet269d": ((3, 30, 48, 8), "bottleneck", "deep", "avg",
                      dict(attn="eca")),
    "ecaresnext26tn_32x4d": ((2, 2, 2, 2), "bottleneck", "tiered_narrow",
                             "avg", dict(card=32, bw=4, attn="eca")),
    # pruned eca-resnets (resnet.py:1097-1104, :1127-1134): the 50d/101d
    # arch with every block's widths re-dimensioned by the pruned/*.txt
    # manifest (helpers.py adapt_model_from_string)
    "ecaresnet50d_pruned": ((3, 4, 6, 3), "bottleneck", "deep", "avg",
                            dict(attn="eca", pruned=True)),
    "ecaresnet101d_pruned": ((3, 4, 23, 3), "bottleneck", "deep", "avg",
                             dict(attn="eca", pruned=True)),
    # anti-aliased (BlurPool) resnets (resnet.py:1171-1184)
    "resnetblur18": ((2, 2, 2, 2), "basic", "7x7", "conv",
                     dict(blur=True)),
    "resnetblur50": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                     dict(blur=True)),
    # SENet-154 in the modern ResNet shell (resnet.py:1330-1334 /
    # gluon_resnet.py:239-245): deep-64 stem, cardinality 64, first
    # bottleneck conv halved (reduce_first=2), 3x3 downsample convs
    "senet154": ((3, 8, 36, 3), "bottleneck", "deep64", "conv",
                 dict(card=64, bw=4, se=True, rf=2, down_k=3)),
    "gluon_senet154": ((3, 8, 36, 3), "bottleneck", "deep64", "conv",
                       dict(card=64, bw=4, se=True, rf=2, down_k=3)),
}

# gluon model-zoo re-parameterizations of the same ResNet shell
# (reference gluon_resnet.py:65-236): v1b = standard, v1c = deep stem +
# conv-down, v1d = deep stem + avg-down, v1s = 64-wide deep stem
RESNETS.update({
    "gluon_resnet18_v1b": ((2, 2, 2, 2), "basic", "7x7", "conv"),
    "gluon_resnet34_v1b": ((3, 4, 6, 3), "basic", "7x7", "conv"),
    "gluon_resnet50_v1b": ((3, 4, 6, 3), "bottleneck", "7x7", "conv"),
    "gluon_resnet101_v1b": ((3, 4, 23, 3), "bottleneck", "7x7", "conv"),
    "gluon_resnet152_v1b": ((3, 8, 36, 3), "bottleneck", "7x7", "conv"),
    "gluon_resnet50_v1c": ((3, 4, 6, 3), "bottleneck", "deep", "conv"),
    "gluon_resnet101_v1c": ((3, 4, 23, 3), "bottleneck", "deep", "conv"),
    "gluon_resnet152_v1c": ((3, 8, 36, 3), "bottleneck", "deep", "conv"),
    "gluon_resnet50_v1d": ((3, 4, 6, 3), "bottleneck", "deep", "avg"),
    "gluon_resnet101_v1d": ((3, 4, 23, 3), "bottleneck", "deep", "avg"),
    "gluon_resnet152_v1d": ((3, 8, 36, 3), "bottleneck", "deep", "avg"),
    "gluon_resnet50_v1s": ((3, 4, 6, 3), "bottleneck", "deep64", "conv"),
    "gluon_resnet101_v1s": ((3, 4, 23, 3), "bottleneck", "deep64", "conv"),
    "gluon_resnet152_v1s": ((3, 8, 36, 3), "bottleneck", "deep64", "conv"),
    "gluon_resnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                              dict(card=32, bw=4)),
    "gluon_resnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                               dict(card=32, bw=4)),
    "gluon_resnext101_64x4d": ((3, 4, 23, 3), "bottleneck", "7x7", "conv",
                               dict(card=64, bw=4)),
    "gluon_seresnext50_32x4d": ((3, 4, 6, 3), "bottleneck", "7x7", "conv",
                                dict(card=32, bw=4, se=True)),
    "gluon_seresnext101_32x4d": ((3, 4, 23, 3), "bottleneck", "7x7",
                                 "conv", dict(card=32, bw=4, se=True)),
    "gluon_seresnext101_64x4d": ((3, 4, 23, 3), "bottleneck", "7x7",
                                 "conv", dict(card=64, bw=4, se=True)),
})
_PLANES = (64, 128, 256, 512)


# deep-stem per-conv output channels (resnet.py:563-578): 'deep' uses
# stem_width 32, 's'/'senet' 64; tiered stems narrow the first two convs
_STEM_CHS = {
    "deep": (32, 32, 64),
    "deep64": (64, 64, 128),
    "tiered": (24, 48, 64),
    "tiered_narrow": (24, 32, 64),
}


def _resnet_cfg(variant: str) -> Dict[str, Any]:
    cfg = RESNETS[variant]
    extras = cfg[4] if len(cfg) > 4 else {}
    attn = extras.get("attn", "se" if extras.get("se") else None)
    return dict(layers=cfg[0], block=cfg[1], stem=cfg[2], down=cfg[3],
                card=extras.get("card", 1), bw=extras.get("bw", 64),
                attn=attn, scale=extras.get("scale", 4),
                rf=extras.get("rf", 1), down_k=extras.get("down_k", 1),
                blur=extras.get("blur", False),
                pruned=extras.get("pruned", False))


def resnet_feature_channels(variant: str, n_stages: int = 4) -> int:
    layers, block, _, _ = RESNETS[variant][:4]
    cfg5 = RESNETS[variant][4] if len(RESNETS[variant]) > 4 else {}
    if isinstance(cfg5, dict) and cfg5.get("pruned"):
        from .pruned import pruned_shapes
        shapes = pruned_shapes(variant)
        last = layers[n_stages - 1] - 1
        return shapes[f"layer{n_stages}.{last}.conv3.weight"][0]
    return _PLANES[n_stages - 1] * (1 if block == "basic" else 4)


def _se_resnet_p(rng, channels: int) -> Params:
    """SEModule(channels, reduction=16) params: reduce = max(8, c//16)
    (layers/se.py:16-28, make_divisible divisor 1 min 8)."""
    red = max(8, channels // 16)
    k1, k2 = jax.random.split(rng)
    return {
        "reduce_w": jax.random.normal(k1, (channels, red), jnp.float32)
        * np.sqrt(2.0 / red),
        "reduce_b": jnp.zeros((red,), jnp.float32),
        "expand_w": jax.random.normal(k2, (red, channels), jnp.float32)
        * np.sqrt(2.0 / channels),
        "expand_b": jnp.zeros((channels,), jnp.float32),
    }


def _se_apply(x, p):
    """Channel SE with relu inner act + sigmoid gate (layers/se.py:30-35)."""
    s = jnp.mean(x, axis=(1, 2))
    s = jax.nn.relu(s @ p["reduce_w"] + p["reduce_b"])
    s = s @ p["expand_w"] + p["expand_b"]
    return x * jax.nn.sigmoid(s)[:, None, None, :]


def _eca_kernel_size(channels: int) -> int:
    """Adaptive ECA 1d-conv kernel (layers/eca.py:57-59, gamma=2 beta=1)."""
    import math
    t = int(abs(math.log(channels, 2) + 1) / 2)
    return max(t if t % 2 else t + 1, 3)


def _eca_p(rng, channels: int) -> Params:
    k = _eca_kernel_size(channels)
    bound = 1.0 / np.sqrt(k)   # torch Conv1d default kaiming-uniform
    return {"conv": jax.random.uniform(rng, (k,), jnp.float32,
                                       -bound, bound)}


def _eca_apply(x, p):
    """ECA: zero-padded 1d conv over the channel-pooled vector, sigmoid
    gate (layers/eca.py:64-69)."""
    w = p["conv"]
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jnp.mean(x, axis=(1, 2))                      # (B, C)
    yp = jnp.pad(y, ((0, 0), (pad, pad)))
    c = y.shape[1]
    out = sum(w[j] * yp[:, j:j + c] for j in range(k))
    return x * jax.nn.sigmoid(out)[:, None, None, :]


def _attn_p(rng, attn, channels):
    if attn == "se":
        return _se_resnet_p(rng, channels)
    return _eca_p(rng, channels)


def _attn_apply(x, blk, attn):
    if "se" in blk:
        return _se_apply(x, blk["se"]) if attn == "se" \
            else _eca_apply(x, blk["se"])
    return x


def init_resnet(rng: jax.Array, variant: str, n_stages: int = 4) -> Params:
    cfg = _resnet_cfg(variant)
    block, card, bw, rf = cfg["block"], cfg["card"], cfg["bw"], cfg["rf"]
    scale = cfg["scale"]
    pshapes = None
    if cfg["pruned"]:
        from .pruned import pruned_shapes
        pshapes = pruned_shapes(variant)
    ks = iter(jax.random.split(rng, 1024))
    if cfg["stem"] in _STEM_CHS:
        c1, c2, c3 = _STEM_CHS[cfg["stem"]]
        stem_p = {
            "conv1": _kaiming(next(ks), (3, 3, 3, c1)), "bn1": _bn_p(c1),
            "conv2": _kaiming(next(ks), (3, 3, c1, c2)), "bn2": _bn_p(c2),
            "conv3": _kaiming(next(ks), (3, 3, c2, c3)),
            "bn3": _bn_p(c3),
        }
        prev = c3
    else:
        stem_p = {"conv1": _kaiming(next(ks), (7, 7, 3, 64)),
                  "bn1": _bn_p(64)}
        prev = 64
    p: Params = {"stem": stem_p, "stages": []}
    for si, depth in enumerate(cfg["layers"][:n_stages]):
        planes = _PLANES[si]
        mid = int(planes * bw / 64) * card
        out = planes * (1 if block == "basic" else 4)
        blocks = []
        for b in range(depth):
            if block == "res2":
                num_scales = max(1, scale - 1)
                blk = {
                    "conv1": _kaiming(next(ks), (1, 1, prev, mid * scale)),
                    "bn1": _bn_p(mid * scale),
                    "convs": [_kaiming(next(ks), (3, 3, mid // card, mid))
                              for _ in range(num_scales)],
                    "bns": [_bn_p(mid) for _ in range(num_scales)],
                    "conv3": _kaiming(next(ks), (1, 1, mid * scale, out)),
                    "bn3": _bn_p(out),
                }
            elif block == "bottleneck":
                first = mid // rf
                if pshapes is not None:
                    base = f"layer{si + 1}.{b}."
                    first = pshapes[base + "conv1.weight"][0]
                    mid = pshapes[base + "conv2.weight"][0]
                    out = pshapes[base + "conv3.weight"][0]
                blk = {
                    "conv1": _kaiming(next(ks), (1, 1, prev, first)),
                    "bn1": _bn_p(first),
                    "conv2": _kaiming(next(ks), (3, 3, first // card, mid)),
                    "bn2": _bn_p(mid),
                    "conv3": _kaiming(next(ks), (1, 1, mid, out)),
                    "bn3": _bn_p(out),
                }
            else:
                first = mid // rf
                blk = {
                    "conv1": _kaiming(next(ks), (3, 3, prev, first)),
                    "bn1": _bn_p(first),
                    "conv2": _kaiming(next(ks), (3, 3, first, out)),
                    "bn2": _bn_p(out),
                }
            if cfg["attn"]:
                if pshapes is not None and cfg["attn"] == "eca":
                    # kernel size was fixed from the UNPRUNED widths, so
                    # derive it from the manifest, not the formula
                    k = pshapes[f"layer{si + 1}.{b}.se.conv.weight"][2]
                    bound = 1.0 / np.sqrt(k)
                    blk["se"] = {"conv": jax.random.uniform(
                        next(ks), (k,), jnp.float32, -bound, bound)}
                else:
                    blk["se"] = _attn_p(next(ks), cfg["attn"], out)
            s = (1 if si == 0 else 2) if b == 0 else 1
            if b == 0 and (s != 1 or prev != out):
                # down_kernel_size (senets: 3x3, but still 1x1 when the
                # stage is stride-1 — make_blocks/downsample_conv quirk)
                dk = 1 if s == 1 else cfg["down_k"]
                blk["down_conv"] = _kaiming(next(ks), (dk, dk, prev, out))
                blk["down_bn"] = _bn_p(out)
            blocks.append(blk)
            prev = out
        p["stages"].append(blocks)
    return p


def apply_resnet(p: Params, images: jnp.ndarray,
                 variant: str) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, H/2^(1+n_stages), W/..., C) feature map."""
    cfg = _resnet_cfg(variant)
    block, down = cfg["block"], cfg["down"]
    card, scale, attn, blur = (cfg["card"], cfg["scale"], cfg["attn"],
                               cfg["blur"])
    if cfg["stem"] in _STEM_CHS:
        x = _batch_norm(_conv(_pad1(images), p["stem"]["conv1"], 2, "VALID"),
                        p["stem"]["bn1"])
        x = _batch_norm(_conv(_pad1(x), p["stem"]["conv2"], 1, "VALID"),
                        p["stem"]["bn2"])
        x = _batch_norm(_conv(_pad1(x), p["stem"]["conv3"], 1, "VALID"),
                        p["stem"]["bn3"])
    else:
        # 7x7/2 pad 3 — torch-symmetric, not TF-SAME (which pads 2+3)
        x = jnp.pad(images, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = _batch_norm(_conv(x, p["stem"]["conv1"], 2, "VALID"),
                        p["stem"]["bn1"])
    if blur:
        # aa stem pooling: stride-1 maxpool + BlurPool/2 (resnet.py:586-589)
        x = _blur_pool(_max_pool(_pad1(x), 3, 1, "VALID"), 2)
    else:
        x = _max_pool(_pad1(x), 3, 2, "VALID")
    for si, blocks in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            shortcut = x
            if "down_conv" in blk:
                if down == "avg":
                    d = _avg_pool2(x) if s == 2 else x
                    d = _conv(d, blk["down_conv"], 1)
                elif blk["down_conv"].shape[0] == 3:
                    # senet 3x3 downsample, torch-symmetric pad 1
                    d = _conv(_pad1(x), blk["down_conv"], s, "VALID")
                else:
                    d = _conv(x, blk["down_conv"], s)
                shortcut = _batch_norm(d, blk["down_bn"], act=False)
            if block == "res2":
                # Bottle2neck (res2net.py:96-133): hierarchical residual
                # conv over `scale` width-chunks of the expanded features
                width = blk["convs"][0].shape[-1]
                y = _batch_norm(_conv(x, blk["conv1"], 1), blk["bn1"])
                spx = [y[..., i * width:(i + 1) * width]
                       for i in range(scale)]
                is_first = "down_conv" in blk
                spo = []
                sp = spx[0]
                for i, (cw, bn) in enumerate(zip(blk["convs"], blk["bns"])):
                    sp = spx[i] if (i == 0 or is_first) else sp + spx[i]
                    sp = _batch_norm(
                        _conv(_pad1(sp), cw, s, "VALID", groups=card), bn)
                    spo.append(sp)
                if scale > 1:
                    if is_first:
                        # AvgPool2d(3, s, pad 1) with count_include_pad
                        t = jnp.pad(spx[-1],
                                    ((0, 0), (1, 1), (1, 1), (0, 0)))
                        t = jax.lax.reduce_window(
                            t, 0.0, jax.lax.add, (1, 3, 3, 1),
                            (1, s, s, 1), "VALID") / 9.0
                        spo.append(t)
                    else:
                        spo.append(spx[-1])
                y = jnp.concatenate(spo, axis=-1)
                y = _batch_norm(_conv(y, blk["conv3"], 1), blk["bn3"],
                                act=False)
            elif block == "bottleneck":
                # with aa (blur), the strided conv runs at stride 1 and a
                # BlurPool/stride follows act2 (resnet.py:337-377)
                use_aa = blur and s == 2
                y = _batch_norm(_conv(x, blk["conv1"], 1), blk["bn1"])
                y = _batch_norm(
                    _conv(_pad1(y), blk["conv2"], 1 if use_aa else s,
                          "VALID", groups=card), blk["bn2"])
                if use_aa:
                    y = _blur_pool(y, s)
                y = _batch_norm(_conv(y, blk["conv3"], 1), blk["bn3"],
                                act=False)
            else:
                # BasicBlock: stride on conv1 (reference resnet.py:270);
                # aa: conv1 stride 1 + BlurPool after act1 (:259-302)
                use_aa = blur and s == 2
                y = _batch_norm(_conv(_pad1(x), blk["conv1"],
                                      1 if use_aa else s, "VALID"),
                                blk["bn1"])
                if use_aa:
                    y = _blur_pool(y, s)
                y = _batch_norm(_conv(_pad1(y), blk["conv2"], 1, "VALID"),
                                blk["bn2"], act=False)
            y = _attn_apply(y, blk, attn)
            x = jax.nn.relu(y + shortcut)
    return x


# hybrid-stem aliases (all hybrids are deep-stem bottleneck avg-down,
# i.e. "resnet26d" structure; stage/block counts live in the params)
def init_resnet_d(rng: jax.Array, variant: str, n_stages: int = 4) -> Params:
    return init_resnet(rng, variant, n_stages)


def apply_resnet_d(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    return apply_resnet(p, images, "resnet26d")


# ---------------------------------------------------------------------------
# torch state-dict loaders (keys under `patch_embed.backbone.`)
# ---------------------------------------------------------------------------

def _w(sd, key):
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0),
                       jnp.float32)                     # OIHW -> HWIO


def _v(sd, key):
    return jnp.asarray(np.asarray(sd[key]), jnp.float32)


def load_resnetv2_r50(params: Params, sd: Dict[str, Any],
                      prefix: str = "patch_embed.backbone.") -> Params:
    p = {"stem": {"conv": _w(sd, prefix + "stem.conv.weight"),
                  "norm": {"scale": _v(sd, prefix + "stem.norm.weight"),
                           "bias": _v(sd, prefix + "stem.norm.bias")}},
         "stages": []}
    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}stages.{si}.blocks.{bi}."
            nb = {}
            for ci in (1, 2, 3):
                nb[f"conv{ci}"] = _w(sd, base + f"conv{ci}.weight")
                nb[f"norm{ci}"] = {
                    "scale": _v(sd, base + f"norm{ci}.weight"),
                    "bias": _v(sd, base + f"norm{ci}.bias")}
            if "down_conv" in blk:
                nb["down_conv"] = _w(sd, base + "downsample.conv.weight")
                nb["down_norm"] = {
                    "scale": _v(sd, base + "downsample.norm.weight"),
                    "bias": _v(sd, base + "downsample.norm.bias")}
            nbs.append(nb)
        p["stages"].append(nbs)
    return p


def _bn_from(sd, base):
    return {"scale": _v(sd, base + ".weight"),
            "bias": _v(sd, base + ".bias"),
            "mean": _v(sd, base + ".running_mean"),
            "var": _v(sd, base + ".running_var")}


def load_resnet(params: Params, sd: Dict[str, Any], variant: str,
                prefix: str = "patch_embed.backbone.") -> Params:
    _, block, stem, down = RESNETS[variant][:4]
    attn = _resnet_cfg(variant)["attn"]
    if stem in _STEM_CHS:
        stem_p = {
            "conv1": _w(sd, prefix + "conv1.0.weight"),
            "bn1": _bn_from(sd, prefix + "conv1.1"),
            "conv2": _w(sd, prefix + "conv1.3.weight"),
            "bn2": _bn_from(sd, prefix + "conv1.4"),
            "conv3": _w(sd, prefix + "conv1.6.weight"),
            "bn3": _bn_from(sd, prefix + "bn1"),
        }
    else:
        stem_p = {"conv1": _w(sd, prefix + "conv1.weight"),
                  "bn1": _bn_from(sd, prefix + "bn1")}
    p = {"stem": stem_p, "stages": []}
    n_convs = 2 if block == "basic" else 3
    # avg-down Sequential is [pool, conv, bn]; conv-down is [conv, bn]
    dci = 1 if down == "avg" else 0
    for si, blocks in enumerate(params["stages"]):
        nbs = []
        for bi, blk in enumerate(blocks):
            base = f"{prefix}layer{si + 1}.{bi}."
            nb = {}
            if block == "res2":
                nb["conv1"] = _w(sd, base + "conv1.weight")
                nb["bn1"] = _bn_from(sd, base + "bn1")
                nb["convs"] = [_w(sd, base + f"convs.{i}.weight")
                               for i in range(len(blk["convs"]))]
                nb["bns"] = [_bn_from(sd, base + f"bns.{i}")
                             for i in range(len(blk["bns"]))]
                nb["conv3"] = _w(sd, base + "conv3.weight")
                nb["bn3"] = _bn_from(sd, base + "bn3")
            else:
                for ci in range(1, n_convs + 1):
                    nb[f"conv{ci}"] = _w(sd, base + f"conv{ci}.weight")
                    nb[f"bn{ci}"] = _bn_from(sd, base + f"bn{ci}")
            if "se" in blk:
                if attn == "eca":
                    # EcaModule Conv1d weight (1, 1, k) (layers/eca.py:62)
                    nb["se"] = {"conv": jnp.asarray(
                        np.asarray(sd[base + "se.conv.weight"]).reshape(-1),
                        jnp.float32)}
                else:
                    rw = np.asarray(sd[base + "se.fc1.weight"])[:, :, 0, 0]
                    ew = np.asarray(sd[base + "se.fc2.weight"])[:, :, 0, 0]
                    nb["se"] = {
                        "reduce_w": jnp.asarray(rw.T, jnp.float32),
                        "reduce_b": _v(sd, base + "se.fc1.bias"),
                        "expand_w": jnp.asarray(ew.T, jnp.float32),
                        "expand_b": _v(sd, base + "se.fc2.bias"),
                    }
            if "down_conv" in blk:
                nb["down_conv"] = _w(sd, base + f"downsample.{dci}.weight")
                nb["down_bn"] = _bn_from(sd, base + f"downsample.{dci + 1}")
            nbs.append(nb)
        p["stages"].append(nbs)
    return p


def load_resnet_d(params: Params, sd: Dict[str, Any],
                  prefix: str = "patch_embed.backbone.") -> Params:
    return load_resnet(params, sd, "resnet26d", prefix)


# registry glue: hybrid name -> (init, apply, load, feature_channels, stride)
HYBRIDS = {
    "r50_v2": (init_resnetv2_r50, apply_resnetv2_r50, load_resnetv2_r50,
               1024, 16),
    "resnet26d": (lambda r: init_resnet_d(r, "resnet26d", 4),
                  apply_resnet_d, load_resnet_d, 2048, 32),
    "resnet50d": (lambda r: init_resnet_d(r, "resnet50d", 4),
                  apply_resnet_d, load_resnet_d, 2048, 32),
    "resnet50d_s3": (lambda r: init_resnet_d(r, "resnet50d", 3),
                     apply_resnet_d, load_resnet_d, 1024, 16),
}
