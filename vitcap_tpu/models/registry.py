"""Vision-model registry/factory — the timm-zoo equivalent.

The reference vendors pytorch_image_models (timm) for `create_model` /
`@register_model` / `load_pretrained` (reference
src/pytorch_image_models/timm/models/factory.py:6-62, registry.py,
helpers.py:248) with ~40 architecture families, of which ViTCAP uses
exactly one: the ViT (`vit_base_patch16_384`, uni_pipeline.py:1361-1430).

This registry keeps the same factory surface — string name -> model —
TPU-native: models are functional (init/apply pairs over param pytrees),
pos-embeds interpolate bicubically on size mismatch (reference
vision_transformer.py:416-421), and timm torch checkpoints load through
the checkpoint bridge's suffix-matching rules.  Coverage: all 404
reference `@register_model` names across ~35 family modules (ViT/DeiT +
hybrid stems, resnet* families in backbones.py, efficientnet/mobilenetv3/
regnet/densenet/vovnet/resnest/sknet/xception/nasnet/pnasnet/hrnet/dla/
tresnet/mixnet/t2t_vit/..., see tests/test_registry.py::TestZooCoverage),
each family with golden torch-parity tests against the vendored timm.

Train mode: wrapping apply in `backbones.zoo_train_mode` gives reference
train() semantics — BN batch statistics + running-stat updates
(materialized via `backbones.bn_updated_params`), stochastic depth on the
efficientnet/mobilenetv3 residual branches with the builder's linear depth
schedule, and classifier-head dropout.  Golden train-mode parity
(forward + running stats + grads THROUGH the batch statistics vs torch
.train()) is tested for resnet / efficientnet / mobilenetv3 / regnet and
the BN hybrid-ViT stems (tests/test_zoo_train_mode.py); every other
BN family shares the same `_batch_norm` entry point and therefore trains
mechanically, but only those five are parity-verified.

Usage:
    spec = model_spec("vit_base_patch16_384")
    model = create_model("vit_base_patch16_384", img_size=384)
    feats = model.apply(model.params, images)          # (B, 1+N, H)
    logits = model.apply(model.params, images, head=True)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .layers import (dense, layer_norm, torch_bicubic_resize_2d,
                     vision_embed, vit_block)

Params = Dict[str, Any]

_REGISTRY: Dict[str, Callable[..., "VisionModelSpec"]] = {}


@dataclasses.dataclass(frozen=True)
class VisionModelSpec:
    """Static architecture description (the ViT hyperparameter grid)."""
    name: str
    patch_size: int
    hidden_size: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    img_size: int = 224
    ln_eps: float = 1e-6
    num_classes: int = 1000
    distilled: bool = False        # deit distillation token: extra token
                                   # slot after CLS, pos_embed grid+2, and
                                   # a head_dist classifier averaged with
                                   # head at eval (reference
                                   # DistilledVisionTransformer
                                   # vision_transformer.py:505-550)
    representation_size: int = 0   # in21k checkpoints: pre_logits
                                   # Linear+tanh between CLS and head
                                   # (reference vision_transformer.py:355)
    qkv_bias: bool = True          # old-timm 'small' has no qkv bias; we
                                   # keep a zero bias tensor (functionally
                                   # identical) and the loader skips the
                                   # absent torch key
    hybrid: str = ""               # CNN stem instead of patchify: a key of
                                   # backbones.HYBRIDS (reference
                                   # HybridEmbed,
                                   # vision_transformer.py:278-316)

    @property
    def intermediate_size(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def num_lead_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def grid(self) -> int:
        if self.hybrid:
            from .backbones import HYBRIDS
            return self.img_size // HYBRIDS[self.hybrid][4]
        return self.img_size // self.patch_size


def register_model(fn: Callable[..., VisionModelSpec]):
    """Decorator: registers `fn.__name__` as a model builder
    (reference timm registry.py `@register_model`)."""
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models() -> list:
    return sorted(_REGISTRY)


def is_model(name: str) -> bool:
    return name in _REGISTRY


def model_spec(name: str, **kw) -> VisionModelSpec:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown model '{name}'; known: {', '.join(list_models())}")
    return _REGISTRY[name](**kw)


# ---------------------------------------------------------------------------
# the ViT/DeiT grid (reference vision_transformer.py:1199-1330 defaults)
# ---------------------------------------------------------------------------

def _vit(name, patch, hidden, depth, heads, img=224, **kw):
    return VisionModelSpec(name=name, patch_size=patch, hidden_size=hidden,
                           depth=depth, num_heads=heads, img_size=img, **kw)


@register_model
def vit_tiny_patch16_224(**kw):
    return _vit("vit_tiny_patch16_224", 16, 192, 12, 3, **kw)


@register_model
def vit_small_patch16_224(**kw):
    # the reference zoo's OLD-timm "my custom small": embed 768, depth 8,
    # heads 8, mlp_ratio 3, no qkv bias, and plain nn.LayerNorm (eps 1e-5,
    # unlike the 1e-6 partial every other vit uses)
    # (vision_transformer.py:1229-1240)
    return _vit("vit_small_patch16_224", 16, 768, 8, 8, mlp_ratio=3.0,
                qkv_bias=False, ln_eps=1e-5, **kw)


@register_model
def vit_small_patch16_384(**kw):
    # modern-timm small (not in the reference zoo; kept for loading
    # current deit/vit-small torch checkpoints)
    return _vit("vit_small_patch16_384", 16, 384, 12, 6, img=384, **kw)


@register_model
def vit_base_patch16_224(**kw):
    return _vit("vit_base_patch16_224", 16, 768, 12, 12, **kw)


@register_model
def vit_base_patch16_384(**kw):
    return _vit("vit_base_patch16_384", 16, 768, 12, 12, img=384, **kw)


@register_model
def vit_base_patch32_224(**kw):
    return _vit("vit_base_patch32_224", 32, 768, 12, 12, **kw)


@register_model
def vit_base_patch32_384(**kw):
    return _vit("vit_base_patch32_384", 32, 768, 12, 12, img=384, **kw)


@register_model
def vit_large_patch16_224(**kw):
    return _vit("vit_large_patch16_224", 16, 1024, 24, 16, **kw)


@register_model
def vit_large_patch16_384(**kw):
    return _vit("vit_large_patch16_384", 16, 1024, 24, 16, img=384, **kw)


@register_model
def vit_large_patch32_384(**kw):
    return _vit("vit_large_patch32_384", 32, 1024, 24, 16, img=384, **kw)


@register_model
def deit_tiny_patch16_224(**kw):
    return _vit("deit_tiny_patch16_224", 16, 192, 12, 3, **kw)


@register_model
def deit_small_patch16_224(**kw):
    return _vit("deit_small_patch16_224", 16, 384, 12, 6, **kw)


@register_model
def deit_base_patch16_224(**kw):
    return _vit("deit_base_patch16_224", 16, 768, 12, 12, **kw)


@register_model
def deit_base_patch16_384(**kw):
    return _vit("deit_base_patch16_384", 16, 768, 12, 12, img=384, **kw)


@register_model
def vit_large_patch32_224(**kw):
    return _vit("vit_large_patch32_224", 32, 1024, 24, 16, **kw)


# -- ImageNet-21k checkpoints: pre_logits representation head
#    (reference vision_transformer.py:1320-1375) --

@register_model
def vit_base_patch16_224_in21k(**kw):
    return _vit("vit_base_patch16_224_in21k", 16, 768, 12, 12,
                representation_size=768, num_classes=21843, **kw)


@register_model
def vit_base_patch32_224_in21k(**kw):
    return _vit("vit_base_patch32_224_in21k", 32, 768, 12, 12,
                representation_size=768, num_classes=21843, **kw)


@register_model
def vit_large_patch16_224_in21k(**kw):
    return _vit("vit_large_patch16_224_in21k", 16, 1024, 24, 16,
                representation_size=1024, num_classes=21843, **kw)


@register_model
def vit_large_patch32_224_in21k(**kw):
    return _vit("vit_large_patch32_224_in21k", 32, 1024, 24, 16,
                representation_size=1024, num_classes=21843, **kw)


@register_model
def vit_huge_patch14_224_in21k(**kw):
    return _vit("vit_huge_patch14_224_in21k", 14, 1280, 32, 16,
                representation_size=1280, num_classes=21843, **kw)


# -- hybrid CNN-stem ViTs (reference vision_transformer.py:1377-1446;
#    stems in models/backbones.py) --

@register_model
def vit_base_resnet50_224_in21k(**kw):
    return _vit("vit_base_resnet50_224_in21k", 16, 768, 12, 12,
                hybrid="r50_v2", representation_size=768,
                num_classes=21843, **kw)


@register_model
def vit_base_resnet50_384(**kw):
    return _vit("vit_base_resnet50_384", 16, 768, 12, 12, img=384,
                hybrid="r50_v2", **kw)


@register_model
def vit_small_resnet26d_224(**kw):
    # old-small trunk dims over a resnet26d stride-32 stem
    return _vit("vit_small_resnet26d_224", 32, 768, 8, 8, mlp_ratio=3.0,
                hybrid="resnet26d", **kw)


@register_model
def vit_small_resnet50d_s3_224(**kw):
    return _vit("vit_small_resnet50d_s3_224", 16, 768, 8, 8,
                mlp_ratio=3.0, hybrid="resnet50d_s3", **kw)


@register_model
def vit_base_resnet26d_224(**kw):
    return _vit("vit_base_resnet26d_224", 32, 768, 12, 12,
                hybrid="resnet26d", **kw)


@register_model
def vit_base_resnet50d_224(**kw):
    return _vit("vit_base_resnet50d_224", 32, 768, 12, 12,
                hybrid="resnet50d", **kw)


# -- standalone CNN classifiers (the reference zoo's resnet family,
#    resnet.py:653-795) --

@dataclasses.dataclass(frozen=True)
class CnnModelSpec:
    """Static description of a standalone CNN classifier (global-avg-pool
    head over a backbones.py feature extractor)."""
    name: str
    variant: str                   # key of backbones.RESNETS
    num_classes: int = 1000
    img_size: int = 224            # default cfg only; convs accept any size

    @property
    def feature_channels(self) -> int:
        from .backbones import resnet_feature_channels
        return resnet_feature_channels(self.variant)


def _register_resnets():
    from .backbones import RESNETS

    def make_builder(vname):
        def builder(**kw):
            return CnnModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in RESNETS:
        register_model(make_builder(vname))


_register_resnets()


def init_cnn_params(rng: jax.Array, spec: CnnModelSpec) -> Params:
    from .backbones import init_resnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_resnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def cnn_forward(params: Params, images: jnp.ndarray, spec: CnnModelSpec,
                head: bool = False, dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC feature map (reference forward_features);
    head=True -> global-avg-pool + fc logits (resnet.py:640-646)."""
    from .backbones import _head_dropout, apply_resnet
    x = apply_resnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], _head_dropout(pooled))


def load_cnn_checkpoint(params: Params, path: str,
                        spec: CnnModelSpec) -> Params:
    from .backbones import load_resnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_resnet(params["backbone"], sd, spec.variant,
                                   prefix="")}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone EfficientNet classifiers (the reference zoo's
#    efficientnet B0-B8 / Lite0-4, efficientnet.py:1002-1097) --

@dataclasses.dataclass(frozen=True)
class EffNetModelSpec:
    """Static description of an EfficientNet classifier (global-avg-pool
    head over an efficientnet.py feature extractor)."""
    name: str
    variant: str                   # key of efficientnet.EFFICIENTNETS
    num_classes: int = 1000
    img_size: int = 224            # default cfg only; convs accept any size

    @property
    def feature_channels(self) -> int:
        from .efficientnet import effnet_feature_channels
        return effnet_feature_channels(self.variant)


def _register_efficientnets():
    from .efficientnet import EFFICIENTNETS, GENERIC_EFFNETS, TF_EFFNETS

    def make_builder(vname, img):
        def builder(**kw):
            kw.setdefault("img_size", img)
            return EffNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname, (_, _, img, _) in EFFICIENTNETS.items():
        register_model(make_builder(vname, img))
    for vname in GENERIC_EFFNETS:
        register_model(make_builder(vname, 224))
    for vname, (_, img) in TF_EFFNETS.items():
        register_model(make_builder(vname, img))


_register_efficientnets()


def init_effnet_params(rng: jax.Array, spec: EffNetModelSpec) -> Params:
    from .efficientnet import init_effnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_effnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def effnet_forward(params: Params, images: jnp.ndarray,
                   spec: EffNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC post-head-conv feature map (the reference
    forward_features, efficientnet.py:381-389); head=True -> global-avg-pool
    + classifier logits (:391-396)."""
    from .backbones import _head_dropout
    from .efficientnet import apply_effnet
    x = apply_effnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], _head_dropout(pooled))


def load_effnet_checkpoint(params: Params, path: str,
                           spec: EffNetModelSpec) -> Params:
    from .efficientnet import load_effnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_effnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classifier.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone MixNet classifiers (the reference zoo's
#    efficientnet.py:1649-1696 mixnet_s/m/l/xl) --

@dataclasses.dataclass(frozen=True)
class MixNetModelSpec:
    """Static description of a MixNet classifier."""
    name: str
    variant: str                   # key of mixnet.MIXNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .mixnet import mixnet_feature_channels
        return mixnet_feature_channels(self.variant)


def _register_mixnets():
    from .mixnet import MIXNETS, TF_MIXNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return MixNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in list(MIXNETS) + list(TF_MIXNETS):
        register_model(make_builder(vname))


_register_mixnets()


def init_mixnet_params(rng: jax.Array, spec: MixNetModelSpec) -> Params:
    from .mixnet import init_mixnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_mixnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def mixnet_forward(params: Params, images: jnp.ndarray,
                   spec: MixNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    from .mixnet import apply_mixnet
    x = apply_mixnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_mixnet_checkpoint(params: Params, path: str,
                           spec: MixNetModelSpec) -> Params:
    from .mixnet import load_mixnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_mixnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classifier.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone HRNet classifiers (the reference zoo's hrnet.py:768-831) --

@dataclasses.dataclass(frozen=True)
class HrNetModelSpec:
    """Static description of an HRNet classifier."""
    name: str
    variant: str                   # key of hrnet.HRNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .hrnet import HRNET_FEATURES
        return HRNET_FEATURES


def _register_hrnets():
    from .hrnet import HRNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return HrNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in HRNETS:
        register_model(make_builder(vname))


_register_hrnets()


def init_hrnet_params(rng: jax.Array, spec: HrNetModelSpec) -> Params:
    from .hrnet import init_hrnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_hrnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def hrnet_forward(params: Params, images: jnp.ndarray,
                  spec: HrNetModelSpec, head: bool = False,
                  dtype=jnp.float32) -> jnp.ndarray:
    from .hrnet import apply_hrnet
    x = apply_hrnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_hrnet_checkpoint(params: Params, path: str,
                          spec: HrNetModelSpec) -> Params:
    from .hrnet import load_hrnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_hrnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classifier.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone Normalizer-Free nets (the reference zoo's
#    nfnet.py:400-472: nf_regnet_b* / nf_resnet* / nf_(se|eca)resnet*) --

@dataclasses.dataclass(frozen=True)
class NfNetModelSpec:
    """Static description of a Normalizer-Free classifier."""
    name: str
    variant: str                   # key of nfnet.NFNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .nfnet import nfnet_feature_channels
        return nfnet_feature_channels(self.variant)


def _register_nfnets():
    from .nfnet import NFNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return NfNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in NFNETS:
        register_model(make_builder(vname))


_register_nfnets()


def init_nfnet_params(rng: jax.Array, spec: NfNetModelSpec) -> Params:
    from .nfnet import init_nfnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_nfnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def nfnet_forward(params: Params, images: jnp.ndarray,
                  spec: NfNetModelSpec, head: bool = False,
                  dtype=jnp.float32) -> jnp.ndarray:
    from .nfnet import apply_nfnet
    x = apply_nfnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_nfnet_checkpoint(params: Params, path: str,
                          spec: NfNetModelSpec) -> Params:
    from .nfnet import load_nfnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_nfnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone aligned Xception 41/65/71 classifiers (the reference
#    zoo's xception_aligned.py:185-240) --

@dataclasses.dataclass(frozen=True)
class XcepAlignedModelSpec:
    """Static description of an aligned Xception classifier."""
    name: str
    variant: str
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .xception_aligned import XCEPTION_ALIGNED_FEATURES
        return XCEPTION_ALIGNED_FEATURES


def _register_xception_aligned():
    from .xception_aligned import XCEPTION_ALIGNED

    def make_builder(vname):
        def builder(**kw):
            return XcepAlignedModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in XCEPTION_ALIGNED:
        register_model(make_builder(vname))


_register_xception_aligned()


def init_xception_aligned_params(rng: jax.Array,
                                 spec: XcepAlignedModelSpec) -> Params:
    from .xception_aligned import init_xception_aligned
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_xception_aligned(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def xception_aligned_forward(params: Params, images: jnp.ndarray,
                             spec: XcepAlignedModelSpec,
                             head: bool = False,
                             dtype=jnp.float32) -> jnp.ndarray:
    from .xception_aligned import apply_xception_aligned
    x = apply_xception_aligned(params["backbone"], images.astype(dtype),
                               spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_xception_aligned_checkpoint(params: Params, path: str,
                                     spec: XcepAlignedModelSpec) -> Params:
    from .xception_aligned import load_xception_aligned
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_xception_aligned(params["backbone"], sd,
                                             spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone Gluon Xception-65 classifier (the reference zoo's
#    gluon_xception.py:255-262) --

@dataclasses.dataclass(frozen=True)
class GluonXceptionModelSpec:
    """Static description of the aligned Xception-65 classifier."""
    name: str = "gluon_xception65"
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .gluon_xception import GLUON_XCEPTION_FEATURES
        return GLUON_XCEPTION_FEATURES


@register_model
def gluon_xception65(**kw):
    return GluonXceptionModelSpec(**kw)


def init_gluon_xception_params(rng: jax.Array,
                               spec: GluonXceptionModelSpec) -> Params:
    from .gluon_xception import init_gluon_xception
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_gluon_xception(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def gluon_xception_forward(params: Params, images: jnp.ndarray,
                           spec: GluonXceptionModelSpec,
                           head: bool = False,
                           dtype=jnp.float32) -> jnp.ndarray:
    from .gluon_xception import apply_gluon_xception
    x = apply_gluon_xception(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_gluon_xception_checkpoint(params: Params, path: str,
                                   spec: GluonXceptionModelSpec) -> Params:
    from .gluon_xception import load_gluon_xception
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_gluon_xception(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone T2T-ViT classifiers (the reference zoo's vendored
#    t2t_vit package; only the working transformer-tokenized variants,
#    see models/t2t_vit.py docstring) --

@dataclasses.dataclass(frozen=True)
class T2tVitModelSpec:
    """Static description of a T2T-ViT classifier."""
    name: str
    variant: str                   # key of t2t_vit.T2T_VITS
    num_classes: int = 1000
    img_size: int = 224
    qk_scale: float = 0.0          # 0 = head_dim**-0.5; checkpoint loads
                                   # set embed**-0.5 (the reference's
                                   # pretrained qk_scale hack)

    @property
    def feature_channels(self) -> int:
        from .t2t_vit import t2t_feature_dim
        return t2t_feature_dim(self.variant)


def _register_t2t_vits():
    from .t2t_vit import T2T_VITS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return T2tVitModelSpec(name=vname, variant=vname, **kw)
        # the reference registers capitalized names (T2t_vit_t_14);
        # register both spellings
        return builder

    for vname in T2T_VITS:
        b = make_builder(vname)
        b.__name__ = vname
        register_model(b)
        b2 = make_builder(vname)
        b2.__name__ = "T2t" + vname[3:]
        register_model(b2)


_register_t2t_vits()


def init_t2t_vit_params(rng: jax.Array, spec: T2tVitModelSpec) -> Params:
    from .t2t_vit import init_t2t_vit
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_t2t_vit(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def t2t_vit_forward(params: Params, images: jnp.ndarray,
                    spec: T2tVitModelSpec, head: bool = False,
                    dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> (B, 1+N, D) post-norm tokens (the output_grid hook,
    t2t_vit.py:166-168); head=True -> CLS classifier logits."""
    from .t2t_vit import apply_t2t_vit
    x = apply_t2t_vit(params["backbone"], images.astype(dtype),
                      spec.variant, spec.qk_scale)
    if not head:
        return x
    return dense(params["head"], x[:, 0])


def load_t2t_vit_checkpoint(params: Params, path: str,
                            spec: T2tVitModelSpec) -> Params:
    from .t2t_vit import load_t2t_vit
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_t2t_vit(params["backbone"], sd, spec.variant)}
    if "head" in params and "head.weight" in sd:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.bias"]), jnp.float32),
        }
    elif "head" in params:
        out["head"] = params["head"]
    return out


# -- standalone DLA classifiers (the reference zoo's dla.py:344-444) --

@dataclasses.dataclass(frozen=True)
class DlaModelSpec:
    """Static description of a Deep-Layer-Aggregation classifier."""
    name: str
    variant: str                   # key of dla.DLAS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .dla import dla_feature_channels
        return dla_feature_channels(self.variant)


def _register_dlas():
    from .dla import DLAS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return DlaModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in DLAS:
        register_model(make_builder(vname))


_register_dlas()


def init_dla_params(rng: jax.Array, spec: DlaModelSpec) -> Params:
    from .dla import init_dla
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_dla(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def dla_forward(params: Params, images: jnp.ndarray,
                spec: DlaModelSpec, head: bool = False,
                dtype=jnp.float32) -> jnp.ndarray:
    from .dla import apply_dla
    x = apply_dla(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_dla_checkpoint(params: Params, path: str,
                        spec: DlaModelSpec) -> Params:
    from .dla import load_dla
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_dla(params["backbone"], sd, spec.variant)}
    if "head" in params:
        # reference classifier is a 1x1 conv (dla.py:292-294)
        w = np.asarray(sd["fc.weight"])[:, :, 0, 0]
        out["head"] = {
            "kernel": jnp.asarray(w.T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone Inception-ResNet-V2 classifiers (the reference zoo's
#    inception_resnet_v2.py:339-356) --

@dataclasses.dataclass(frozen=True)
class InceptionResnetV2ModelSpec:
    """Static description of the Inception-ResNet-V2 classifier."""
    name: str = "inception_resnet_v2"
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .inception_resnet_v2 import INCEPTION_RESNET_V2_FEATURES
        return INCEPTION_RESNET_V2_FEATURES


def _register_inception_resnet_v2s():
    from .inception_resnet_v2 import INCEPTION_RESNET_V2_NAMES

    def make_builder(vname):
        def builder(**kw):
            return InceptionResnetV2ModelSpec(name=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in INCEPTION_RESNET_V2_NAMES:
        register_model(make_builder(vname))


_register_inception_resnet_v2s()


def init_inception_resnet_v2_params(rng: jax.Array,
                                    spec: InceptionResnetV2ModelSpec
                                    ) -> Params:
    from .inception_resnet_v2 import init_inception_resnet_v2
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_inception_resnet_v2(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def inception_resnet_v2_forward(params: Params, images: jnp.ndarray,
                                spec: InceptionResnetV2ModelSpec,
                                head: bool = False,
                                dtype=jnp.float32) -> jnp.ndarray:
    from .inception_resnet_v2 import apply_inception_resnet_v2
    x = apply_inception_resnet_v2(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_inception_resnet_v2_checkpoint(params: Params, path: str,
                                        spec: InceptionResnetV2ModelSpec
                                        ) -> Params:
    from .inception_resnet_v2 import load_inception_resnet_v2
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_inception_resnet_v2(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classif.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classif.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone Inception-V4 classifier (the reference zoo's
#    inception_v4.py:313-320) --

@dataclasses.dataclass(frozen=True)
class InceptionV4ModelSpec:
    """Static description of the Inception-V4 classifier."""
    name: str = "inception_v4"
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .inception_v4 import INCEPTION_V4_FEATURES
        return INCEPTION_V4_FEATURES


@register_model
def inception_v4(**kw):
    return InceptionV4ModelSpec(**kw)


def init_inception_v4_params(rng: jax.Array,
                             spec: InceptionV4ModelSpec) -> Params:
    from .inception_v4 import init_inception_v4
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_inception_v4(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def inception_v4_forward(params: Params, images: jnp.ndarray,
                         spec: InceptionV4ModelSpec, head: bool = False,
                         dtype=jnp.float32) -> jnp.ndarray:
    from .inception_v4 import apply_inception_v4
    x = apply_inception_v4(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_inception_v4_checkpoint(params: Params, path: str,
                                 spec: InceptionV4ModelSpec) -> Params:
    from .inception_v4 import load_inception_v4
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_inception_v4(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["last_linear.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["last_linear.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone legacy SENet classifiers (the reference zoo's senet.py:
#    the Cadene-layout senet154 / se-resnet / se-resnext) --

@dataclasses.dataclass(frozen=True)
class SeNetModelSpec:
    """Static description of a legacy SENet classifier."""
    name: str
    variant: str                   # key of senet.SENETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .senet import senet_feature_channels
        return senet_feature_channels(self.variant)


def _register_senets():
    from .senet import SENETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return SeNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in SENETS:
        register_model(make_builder(vname))


_register_senets()


def init_senet_params(rng: jax.Array, spec: SeNetModelSpec) -> Params:
    from .senet import init_senet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_senet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def senet_forward(params: Params, images: jnp.ndarray,
                  spec: SeNetModelSpec, head: bool = False,
                  dtype=jnp.float32) -> jnp.ndarray:
    from .senet import apply_senet
    x = apply_senet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_senet_checkpoint(params: Params, path: str,
                          spec: SeNetModelSpec) -> Params:
    from .senet import load_senet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_senet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["last_linear.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["last_linear.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone SelecSLS classifiers (the reference zoo's selecsls.py) --

@dataclasses.dataclass(frozen=True)
class SelecSlsModelSpec:
    """Static description of a SelecSLS classifier."""
    name: str
    variant: str                   # key of selecsls.SELECSLS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .selecsls import selecsls_feature_channels
        return selecsls_feature_channels(self.variant)


def _register_selecsls():
    from .selecsls import SELECSLS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return SelecSlsModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in SELECSLS:
        register_model(make_builder(vname))


_register_selecsls()


def init_selecsls_params(rng: jax.Array, spec: SelecSlsModelSpec) -> Params:
    from .selecsls import init_selecsls
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_selecsls(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def selecsls_forward(params: Params, images: jnp.ndarray,
                     spec: SelecSlsModelSpec, head: bool = False,
                     dtype=jnp.float32) -> jnp.ndarray:
    from .selecsls import apply_selecsls
    x = apply_selecsls(params["backbone"], images.astype(dtype),
                       spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_selecsls_checkpoint(params: Params, path: str,
                             spec: SelecSlsModelSpec) -> Params:
    from .selecsls import load_selecsls
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_selecsls(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone CSPNet/DarkNet classifiers (the reference zoo's cspnet
#    family, cspnet.py:413-454) --

@dataclasses.dataclass(frozen=True)
class CspNetModelSpec:
    """Static description of a CSPNet/DarkNet classifier."""
    name: str
    variant: str                   # key of cspnet.CSPNETS
    num_classes: int = 1000
    img_size: int = 256

    @property
    def feature_channels(self) -> int:
        from .cspnet import cspnet_feature_channels
        return cspnet_feature_channels(self.variant)


def _register_cspnets():
    from .cspnet import CSPNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 256)
            return CspNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in CSPNETS:
        register_model(make_builder(vname))


_register_cspnets()


def init_cspnet_params(rng: jax.Array, spec: CspNetModelSpec) -> Params:
    from .cspnet import init_cspnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_cspnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def cspnet_forward(params: Params, images: jnp.ndarray,
                   spec: CspNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    from .cspnet import apply_cspnet
    x = apply_cspnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_cspnet_checkpoint(params: Params, path: str,
                           spec: CspNetModelSpec) -> Params:
    from .cspnet import load_cspnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_cspnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- NASNet-A-Large (the reference zoo's nasnet.py:405-562) --

@dataclasses.dataclass(frozen=True)
class NASNetModelSpec:
    """Static description of the NASNet-A-Large classifier."""
    name: str = "nasnetalarge"
    num_classes: int = 1001        # Cadene checkpoint background class
    img_size: int = 331

    @property
    def feature_channels(self) -> int:
        from .nasnet import NASNET_FEATURES
        return NASNET_FEATURES


@register_model
def nasnetalarge(**kw):
    kw.setdefault("img_size", 331)
    kw.setdefault("num_classes", 1001)
    return NASNetModelSpec(name="nasnetalarge", **kw)


def init_nasnet_params(rng: jax.Array, spec: NASNetModelSpec) -> Params:
    from .nasnet import init_nasnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_nasnet(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def nasnet_forward(params: Params, images: jnp.ndarray,
                   spec: NASNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    from .nasnet import apply_nasnet
    x = apply_nasnet(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_nasnet_checkpoint(params: Params, path: str,
                           spec: NASNetModelSpec) -> Params:
    from .nasnet import load_nasnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_nasnet(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["last_linear.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["last_linear.bias"]),
                                jnp.float32),
        }
    return out


# -- PNASNet-5-Large (the reference zoo's pnasnet.py:236-347) --

@dataclasses.dataclass(frozen=True)
class PNASNetModelSpec:
    """Static description of the PNASNet-5-Large classifier."""
    name: str = "pnasnet5large"
    num_classes: int = 1001        # Cadene checkpoint background class
    img_size: int = 331

    @property
    def feature_channels(self) -> int:
        from .pnasnet import PNASNET_FEATURES
        return PNASNET_FEATURES


@register_model
def pnasnet5large(**kw):
    kw.setdefault("img_size", 331)
    kw.setdefault("num_classes", 1001)
    return PNASNetModelSpec(name="pnasnet5large", **kw)


def init_pnasnet_params(rng: jax.Array, spec: PNASNetModelSpec) -> Params:
    from .pnasnet import init_pnasnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_pnasnet(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def pnasnet_forward(params: Params, images: jnp.ndarray,
                    spec: PNASNetModelSpec, head: bool = False,
                    dtype=jnp.float32) -> jnp.ndarray:
    from .pnasnet import apply_pnasnet
    x = apply_pnasnet(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_pnasnet_checkpoint(params: Params, path: str,
                            spec: PNASNetModelSpec) -> Params:
    from .pnasnet import load_pnasnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_pnasnet(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["last_linear.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["last_linear.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone TResNet classifiers (the reference zoo's tresnet.py:
#    SpaceToDepth stem + IABN + anti-aliased stride-2, :236-293) --

@dataclasses.dataclass(frozen=True)
class TResNetModelSpec:
    """Static description of a TResNet classifier."""
    name: str
    variant: str                   # key of tresnet.TRESNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .tresnet import tresnet_feature_channels
        return tresnet_feature_channels(self.variant)


def _register_tresnets():
    from .tresnet import TRESNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 448 if vname.endswith("_448")
                          else 224)
            return TResNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in TRESNETS:
        register_model(make_builder(vname))


_register_tresnets()


def init_tresnet_params(rng: jax.Array, spec: TResNetModelSpec) -> Params:
    from .tresnet import init_tresnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_tresnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def tresnet_forward(params: Params, images: jnp.ndarray,
                    spec: TResNetModelSpec, head: bool = False,
                    dtype=jnp.float32) -> jnp.ndarray:
    from .tresnet import apply_tresnet
    x = apply_tresnet(params["backbone"], images.astype(dtype),
                      spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_tresnet_checkpoint(params: Params, path: str,
                            spec: TResNetModelSpec) -> Params:
    from .tresnet import load_tresnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_tresnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone Inception-V3 classifiers (the reference zoo's
#    inception_v3.py:440-467: inception_v3 / tf_ / adv_ / gluon_ weight
#    flavors over one architecture) --

@dataclasses.dataclass(frozen=True)
class InceptionV3ModelSpec:
    """Static description of the Inception-V3 classifier."""
    name: str = "inception_v3"
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .inception_v3 import INCEPTION_V3_FEATURES
        return INCEPTION_V3_FEATURES


def _register_inception_v3s():
    from .inception_v3 import INCEPTION_V3_NAMES

    def make_builder(vname):
        def builder(**kw):
            return InceptionV3ModelSpec(name=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in INCEPTION_V3_NAMES:
        register_model(make_builder(vname))


_register_inception_v3s()


def init_inception_v3_params(rng: jax.Array,
                             spec: InceptionV3ModelSpec) -> Params:
    from .inception_v3 import init_inception_v3
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_inception_v3(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def inception_v3_forward(params: Params, images: jnp.ndarray,
                         spec: InceptionV3ModelSpec, head: bool = False,
                         dtype=jnp.float32) -> jnp.ndarray:
    from .inception_v3 import apply_inception_v3
    x = apply_inception_v3(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_inception_v3_checkpoint(params: Params, path: str,
                                 spec: InceptionV3ModelSpec) -> Params:
    from .inception_v3 import load_inception_v3
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_inception_v3(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone DPN classifiers (the reference zoo's dpn family,
#    dpn.py:264-312) --

@dataclasses.dataclass(frozen=True)
class DpnModelSpec:
    """Static description of a Dual-Path-Network classifier."""
    name: str
    variant: str                   # key of dpn.DPNS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .dpn import dpn_feature_channels
        return dpn_feature_channels(self.variant)


def _register_dpns():
    from .dpn import DPNS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return DpnModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in DPNS:
        register_model(make_builder(vname))


_register_dpns()


def init_dpn_params(rng: jax.Array, spec: DpnModelSpec) -> Params:
    from .dpn import init_dpn
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_dpn(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def dpn_forward(params: Params, images: jnp.ndarray,
                spec: DpnModelSpec, head: bool = False,
                dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> post-conv5_bn_ac NHWC feature map; head=True ->
    global-avg-pool + the reference's 1x1-conv classifier (as a dense)."""
    from .dpn import apply_dpn
    x = apply_dpn(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_dpn_checkpoint(params: Params, path: str,
                        spec: DpnModelSpec) -> Params:
    from .dpn import load_dpn
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_dpn(params["backbone"], sd, spec.variant)}
    if "head" in params:
        # reference classifier is a 1x1 conv (dpn.py:237-241)
        w = np.asarray(sd["classifier.weight"])[:, :, 0, 0]
        out["head"] = {
            "kernel": jnp.asarray(w.T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone ReXNet classifiers (the reference zoo's rexnet family,
#    rexnet.py:243-300) --

@dataclasses.dataclass(frozen=True)
class RexNetModelSpec:
    """Static description of a ReXNetV1 classifier."""
    name: str
    variant: str                   # key of rexnet.REXNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .rexnet import rexnet_feature_channels
        return rexnet_feature_channels(self.variant)


def _register_rexnets():
    from .rexnet import REXNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return RexNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in REXNETS:
        register_model(make_builder(vname))


_register_rexnets()


def init_rexnet_params(rng: jax.Array, spec: RexNetModelSpec) -> Params:
    from .rexnet import init_rexnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_rexnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def rexnet_forward(params: Params, images: jnp.ndarray,
                   spec: RexNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    from .rexnet import apply_rexnet
    x = apply_rexnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_rexnet_checkpoint(params: Params, path: str,
                           spec: RexNetModelSpec) -> Params:
    from .rexnet import load_rexnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_rexnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone SKNet classifiers (the reference zoo's sknet family,
#    sknet.py:146-230) --

@dataclasses.dataclass(frozen=True)
class SkNetModelSpec:
    """Static description of a Selective-Kernel ResNet classifier."""
    name: str
    variant: str                   # key of sknet.SKNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .sknet import sknet_feature_channels
        return sknet_feature_channels(self.variant)


def _register_sknets():
    from .sknet import SKNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return SkNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in SKNETS:
        register_model(make_builder(vname))


_register_sknets()


def init_sknet_params(rng: jax.Array, spec: SkNetModelSpec) -> Params:
    from .sknet import init_sknet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_sknet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def sknet_forward(params: Params, images: jnp.ndarray,
                  spec: SkNetModelSpec, head: bool = False,
                  dtype=jnp.float32) -> jnp.ndarray:
    from .sknet import apply_sknet
    x = apply_sknet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_sknet_checkpoint(params: Params, path: str,
                          spec: SkNetModelSpec) -> Params:
    from .sknet import load_sknet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_sknet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone ResNeSt classifiers (the reference zoo's resnest family,
#    resnest.py:134-231) --

@dataclasses.dataclass(frozen=True)
class ResNestModelSpec:
    """Static description of a ResNeSt classifier (split-attention
    bottleneck ResNet, resnest.py)."""
    name: str
    variant: str                   # key of resnest.RESNESTS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .resnest import resnest_feature_channels
        return resnest_feature_channels(self.variant)


def _register_resnests():
    from .resnest import RESNESTS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return ResNestModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in RESNESTS:
        register_model(make_builder(vname))


_register_resnests()


def init_resnest_params(rng: jax.Array, spec: ResNestModelSpec) -> Params:
    from .resnest import init_resnest
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_resnest(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def resnest_forward(params: Params, images: jnp.ndarray,
                    spec: ResNestModelSpec, head: bool = False,
                    dtype=jnp.float32) -> jnp.ndarray:
    from .resnest import apply_resnest
    x = apply_resnest(params["backbone"], images.astype(dtype),
                      spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_resnest_checkpoint(params: Params, path: str,
                            spec: ResNestModelSpec) -> Params:
    from .resnest import load_resnest
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_resnest(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone ResNetV2 / BiT classifiers (the reference zoo's
#    resnetv2.py:433-511 resnetv2_*_bitm[_in21k]) --

@dataclasses.dataclass(frozen=True)
class ResNetV2ModelSpec:
    """Static description of a ResNetV2/BiT classifier (pre-activation
    bottlenecks, weight-standardized convs, GroupNorm; resnetv2.py)."""
    name: str
    variant: str                   # key of resnetv2.RESNETV2S
    num_classes: int = 1000
    img_size: int = 480

    @property
    def feature_channels(self) -> int:
        from .resnetv2 import resnetv2_feature_channels
        return resnetv2_feature_channels(self.variant)


def _register_resnetv2s():
    from .resnetv2 import RESNETV2S

    def make_builder(vname, nc):
        def builder(**kw):
            kw.setdefault("img_size", 480)
            kw.setdefault("num_classes", nc)
            return ResNetV2ModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname, (_, _, nc) in RESNETV2S.items():
        register_model(make_builder(vname, nc))


_register_resnetv2s()


def init_resnetv2_params(rng: jax.Array, spec: ResNetV2ModelSpec) -> Params:
    from .resnetv2 import init_resnetv2
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_resnetv2(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def resnetv2_forward(params: Params, images: jnp.ndarray,
                     spec: ResNetV2ModelSpec, head: bool = False,
                     dtype=jnp.float32) -> jnp.ndarray:
    from .resnetv2 import apply_resnetv2
    x = apply_resnetv2(params["backbone"], images.astype(dtype),
                       spec.variant)
    if not head:
        return x
    # ClassifierHead(use_conv=True): pool then 1x1 conv == dense
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_resnetv2_checkpoint(params: Params, path: str,
                             spec: ResNetV2ModelSpec) -> Params:
    from .resnetv2 import load_resnetv2
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_resnetv2(params["backbone"], sd, spec.variant)}
    if "head" in params:
        fw = np.asarray(sd["head.fc.weight"])[:, :, 0, 0]      # (N, C)
        out["head"] = {
            "kernel": jnp.asarray(fw.T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone Xception classifier (the reference zoo's xception.py) --

@dataclasses.dataclass(frozen=True)
class XceptionModelSpec:
    """Static description of the Xception classifier."""
    name: str = "xception"
    num_classes: int = 1000
    img_size: int = 299

    @property
    def feature_channels(self) -> int:
        from .xception import XCEPTION_FEATURES
        return XCEPTION_FEATURES


@register_model
def xception(**kw):
    return XceptionModelSpec(**kw)


def init_xception_params(rng: jax.Array, spec: XceptionModelSpec) -> Params:
    from .xception import init_xception
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_xception(k_bb)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def xception_forward(params: Params, images: jnp.ndarray,
                     spec: XceptionModelSpec, head: bool = False,
                     dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> post-act4 NHWC feature map (the reference
    forward_features, xception.py:182-211); head=True -> pooled logits."""
    from .xception import apply_xception
    x = apply_xception(params["backbone"], images.astype(dtype))
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_xception_checkpoint(params: Params, path: str,
                             spec: XceptionModelSpec) -> Params:
    from .xception import load_xception
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_xception(params["backbone"], sd)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"]), jnp.float32),
        }
    return out


# -- standalone VoVNet classifiers (the reference zoo's vovnet family,
#    vovnet.py:348-412) --

@dataclasses.dataclass(frozen=True)
class VovNetModelSpec:
    """Static description of a VoVNet v2 classifier (global-avg-pool head
    over a vovnet.py OSA feature extractor)."""
    name: str
    variant: str                   # key of vovnet.VOVNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .vovnet import vovnet_feature_channels
        return vovnet_feature_channels(self.variant)


def _register_vovnets():
    from .vovnet import VOVNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return VovNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in VOVNETS:
        register_model(make_builder(vname))


_register_vovnets()


def init_vovnet_params(rng: jax.Array, spec: VovNetModelSpec) -> Params:
    from .vovnet import init_vovnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_vovnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def vovnet_forward(params: Params, images: jnp.ndarray,
                   spec: VovNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC final-stage feature map (the reference
    forward_features, vovnet.py:341-342); head=True -> global-avg-pool
    + classifier logits (ClassifierHead, head.fc)."""
    from .vovnet import apply_vovnet
    x = apply_vovnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_vovnet_checkpoint(params: Params, path: str,
                           spec: VovNetModelSpec) -> Params:
    from .vovnet import load_vovnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_vovnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone DenseNet classifiers (the reference zoo's densenet family,
#    densenet.py:295-365) --

@dataclasses.dataclass(frozen=True)
class DenseNetModelSpec:
    """Static description of a DenseNet classifier (global-avg-pool head
    over a densenet.py feature extractor)."""
    name: str
    variant: str                   # key of densenet.DENSENETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .densenet import densenet_feature_channels
        return densenet_feature_channels(self.variant)


def _register_densenets():
    from .densenet import DENSENETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return DenseNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in DENSENETS:
        register_model(make_builder(vname))


_register_densenets()


def init_densenet_params(rng: jax.Array, spec: DenseNetModelSpec) -> Params:
    from .densenet import init_densenet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_densenet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def densenet_forward(params: Params, images: jnp.ndarray,
                     spec: DenseNetModelSpec, head: bool = False,
                     dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC post-norm5 feature map (the reference
    forward_features, densenet.py:255-256); head=True -> global-avg-pool
    + classifier logits (:258-262)."""
    from .densenet import apply_densenet
    x = apply_densenet(params["backbone"], images.astype(dtype),
                       spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], pooled)


def load_densenet_checkpoint(params: Params, path: str,
                             spec: DenseNetModelSpec) -> Params:
    from .densenet import load_densenet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_densenet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classifier.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone RegNetX/Y classifiers (the reference zoo's regnet family,
#    regnet.py:337-480) --

@dataclasses.dataclass(frozen=True)
class RegNetModelSpec:
    """Static description of a RegNet classifier (global-avg-pool head
    over a regnet.py feature extractor)."""
    name: str
    variant: str                   # key of regnet.REGNETS
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .regnet import regnet_feature_channels
        return regnet_feature_channels(self.variant)


def _register_regnets():
    from .regnet import REGNETS

    def make_builder(vname):
        def builder(**kw):
            kw.setdefault("img_size", 224)
            return RegNetModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname in REGNETS:
        register_model(make_builder(vname))


_register_regnets()


def init_regnet_params(rng: jax.Array, spec: RegNetModelSpec) -> Params:
    from .regnet import init_regnet
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_regnet(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def regnet_forward(params: Params, images: jnp.ndarray,
                   spec: RegNetModelSpec, head: bool = False,
                   dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC final-stage feature map (the reference
    forward_features, regnet.py:320-323); head=True -> global-avg-pool
    + classifier logits (ClassifierHead)."""
    from .backbones import _head_dropout
    from .regnet import apply_regnet
    x = apply_regnet(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    pooled = jnp.mean(x, axis=(1, 2))
    return dense(params["head"], _head_dropout(pooled))


def load_regnet_checkpoint(params: Params, path: str,
                           spec: RegNetModelSpec) -> Params:
    from .regnet import load_regnet
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_regnet(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["head.fc.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["head.fc.bias"]),
                                jnp.float32),
        }
    return out


# -- standalone MobileNetV3 classifiers (the reference zoo's non-tf
#    mobilenetv3 family, mobilenetv3.py:356-391) --

@dataclasses.dataclass(frozen=True)
class Mn3ModelSpec:
    """Static description of a MobileNetV3 classifier (pool -> 1x1
    conv_head -> act -> linear, the 'efficient head')."""
    name: str
    variant: str                   # key of mobilenetv3.MOBILENETV3S
    num_classes: int = 1000
    img_size: int = 224

    @property
    def feature_channels(self) -> int:
        from .mobilenetv3 import mn3_feature_channels
        return mn3_feature_channels(self.variant)


def _register_mobilenetv3s():
    from .mobilenetv3 import MOBILENETV3S

    def make_builder(vname, img):
        def builder(**kw):
            kw.setdefault("img_size", img)
            return Mn3ModelSpec(name=vname, variant=vname, **kw)
        builder.__name__ = vname
        return builder

    for vname, cfg in MOBILENETV3S.items():
        register_model(make_builder(vname, cfg[1]))


_register_mobilenetv3s()


def init_mn3_params(rng: jax.Array, spec: Mn3ModelSpec) -> Params:
    from .mobilenetv3 import init_mn3
    from .vitcap import _dense_init
    k_bb, k_head = jax.random.split(rng)
    params = {"backbone": init_mn3(k_bb, spec.variant)}
    if spec.num_classes:
        params["head"] = _dense_init(k_head, spec.feature_channels,
                                     spec.num_classes)
    return params


def mn3_forward(params: Params, images: jnp.ndarray,
                spec: Mn3ModelSpec, head: bool = False,
                dtype=jnp.float32) -> jnp.ndarray:
    """head=False -> NHWC pre-pool feature map (the reference
    forward_features, mobilenetv3.py:128-135); head=True -> pooled
    conv_head features + classifier logits (:136-144)."""
    from .backbones import _head_dropout
    from .mobilenetv3 import apply_mn3, apply_mn3_head
    x = apply_mn3(params["backbone"], images.astype(dtype), spec.variant)
    if not head:
        return x
    h = apply_mn3_head(params["backbone"], x, spec.variant)
    return dense(params["head"], _head_dropout(h))


def load_mn3_checkpoint(params: Params, path: str,
                        spec: Mn3ModelSpec) -> Params:
    from .mobilenetv3 import load_mn3
    from ..solver.checkpoint_bridge import load_torch_state_dict
    import numpy as np
    sd = load_torch_state_dict(path)
    out = {"backbone": load_mn3(params["backbone"], sd, spec.variant)}
    if "head" in params:
        out["head"] = {
            "kernel": jnp.asarray(
                np.asarray(sd["classifier.weight"]).T, jnp.float32),
            "bias": jnp.asarray(np.asarray(sd["classifier.bias"]),
                                jnp.float32),
        }
    return out


# -- the reference zoo's deit names (vit_deit_*, incl. distilled;
#    vision_transformer.py:1446-1530) --

@register_model
def vit_deit_tiny_patch16_224(**kw):
    return _vit("vit_deit_tiny_patch16_224", 16, 192, 12, 3, **kw)


@register_model
def vit_deit_small_patch16_224(**kw):
    return _vit("vit_deit_small_patch16_224", 16, 384, 12, 6, **kw)


@register_model
def vit_deit_base_patch16_224(**kw):
    return _vit("vit_deit_base_patch16_224", 16, 768, 12, 12, **kw)


@register_model
def vit_deit_base_patch16_384(**kw):
    return _vit("vit_deit_base_patch16_384", 16, 768, 12, 12, img=384,
                **kw)


@register_model
def vit_deit_tiny_distilled_patch16_224(**kw):
    return _vit("vit_deit_tiny_distilled_patch16_224", 16, 192, 12, 3,
                distilled=True, **kw)


@register_model
def vit_deit_small_distilled_patch16_224(**kw):
    return _vit("vit_deit_small_distilled_patch16_224", 16, 384, 12, 6,
                distilled=True, **kw)


@register_model
def vit_deit_base_distilled_patch16_224(**kw):
    return _vit("vit_deit_base_distilled_patch16_224", 16, 768, 12, 12,
                distilled=True, **kw)


@register_model
def vit_deit_base_distilled_patch16_384(**kw):
    return _vit("vit_deit_base_distilled_patch16_384", 16, 768, 12, 12,
                img=384, distilled=True, **kw)


# ---------------------------------------------------------------------------
# functional model construction
# ---------------------------------------------------------------------------

class VisionModel(NamedTuple):
    spec: VisionModelSpec
    params: Params
    apply: Callable[..., jnp.ndarray]


def init_vision_params(rng: jax.Array, spec: VisionModelSpec) -> Params:
    """Standalone ViT param tree: patch embed + CLS + pos + blocks + norm
    (+ classifier head).  Shapes/layout match vitcap.init_params's trunk so
    the checkpoint bridge and the caption model interoperate."""
    from .vitcap import _dense_init, _ln_init, _trunc_normal, _vit_block_init
    from .config import ModelConfig
    cfg = ModelConfig(
        hidden_size=spec.hidden_size, num_attention_heads=spec.num_heads,
        intermediate_size=spec.intermediate_size,
        num_hidden_layers=spec.depth, img_size=spec.img_size,
        patch_size=spec.patch_size, vit_layer_norm_eps=spec.ln_eps,
        split_blocks=0)       # dims-only carrier; no tag branch here
    ks = jax.random.split(rng, spec.depth + 5)
    h = spec.hidden_size
    g = spec.grid
    if spec.hybrid:
        from .backbones import HYBRIDS
        init_fn, _, _, feat_c, _ = HYBRIDS[spec.hybrid]
        proj_shape = (1, 1, feat_c, h)
    else:
        proj_shape = (spec.patch_size, spec.patch_size, 3, h)
    params: Params = {
        "patch_proj": {
            "kernel": _trunc_normal(ks[0], proj_shape),
            "bias": jnp.zeros((h,), jnp.float32),
        },
        "cls_token": jnp.zeros((1, 1, h), jnp.float32),
        "pos_embed": _trunc_normal(
            ks[1], (1, g * g + spec.num_lead_tokens, h)),
        "blocks": [_vit_block_init(ks[2 + i], cfg)
                   for i in range(spec.depth)],
        "norm": _ln_init(h),
    }
    if spec.hybrid:
        params["backbone"] = init_fn(ks[-4])
    if spec.distilled:
        params["dist_token"] = jnp.zeros((1, 1, h), jnp.float32)
    if spec.representation_size:
        params["pre_logits"] = _dense_init(ks[-2], h,
                                           spec.representation_size)
    if spec.num_classes:
        head_in = spec.representation_size or h
        params["head"] = _dense_init(ks[-1], head_in, spec.num_classes)
        if spec.distilled:
            params["head_dist"] = _dense_init(ks[-3], h, spec.num_classes)
    return params


def vit_forward(params: Params, images: jnp.ndarray,
                spec: VisionModelSpec, head: bool = False,
                return_attn: bool = False, dtype=jnp.float32,
                token_drop: float = 0.0,
                rng: Optional[jax.Array] = None):
    """Patchify -> blocks -> final norm; head=True pools CLS into logits
    (reference VisionTransformer.forward :434-447; `output_grid` mode is
    head=False, which returns all post-norm tokens).

    return_attn=True additionally returns the per-block attention
    probabilities stacked as (depth, B, heads, L, L) — the reference fork's
    `return_attn` visualization hook (vision_transformer.py:174-182).

    token_drop>0 randomly drops that fraction of PATCH tokens after the
    position embedding (lead tokens always kept) — the reference fork's
    `token_drop` training hook.  The kept count is static (ceil), so the
    jit stays fixed-shape; per-example subsets are drawn from `rng`."""
    lead = spec.num_lead_tokens
    if spec.distilled or spec.hybrid:
        if spec.hybrid:
            # CNN stem -> 1x1 projection (reference HybridEmbed
            # vision_transformer.py:278-316)
            from .backbones import HYBRIDS
            apply_fn = HYBRIDS[spec.hybrid][1]
            feats = apply_fn(params["backbone"], images.astype(dtype))
            B, gh, gw, C = feats.shape
            w = params["patch_proj"]["kernel"].reshape(
                C, -1).astype(feats.dtype)
            tokens = feats.reshape(B, gh * gw, C) @ w \
                + params["patch_proj"]["bias"].astype(feats.dtype)
        else:
            from .layers import patch_embed
            tokens = patch_embed(params["patch_proj"],
                                 images.astype(dtype))
        # lead tokens (CLS [+ deit distillation token]) + joint pos embed
        # (reference DistilledVisionTransformer.forward_features :528-541)
        B, N, H = tokens.shape
        leads = [jnp.broadcast_to(
            params["cls_token"].astype(tokens.dtype), (B, 1, H))]
        if spec.distilled:
            leads.append(jnp.broadcast_to(
                params["dist_token"].astype(tokens.dtype), (B, 1, H)))
        x = jnp.concatenate(leads + [tokens], axis=1)
        pe = params["pos_embed"]
        old_n = pe.shape[1] - lead
        if old_n != N:
            g_old, g_new = int(old_n ** 0.5), int(N ** 0.5)
            lead_pe, grid_pe = pe[:, :lead], pe[:, lead:]
            grid_pe = torch_bicubic_resize_2d(
                grid_pe.reshape(g_old, g_old, H),
                (g_new, g_new)).reshape(1, N, H)
            pe = jnp.concatenate([lead_pe, grid_pe], axis=1)
        x = x + pe.astype(x.dtype)
    else:
        x = vision_embed(params, images.astype(dtype), spec.patch_size)
    if token_drop > 0.0:
        if rng is None:
            raise ValueError("token_drop needs an rng key")
        import math
        B, L, _ = x.shape
        n_keep = max(1, math.ceil((L - lead) * (1.0 - token_drop)))
        noise = jax.random.uniform(rng, (B, L - lead))
        keep_idx = jnp.argsort(noise, axis=1)[:, :n_keep] + lead
        keep_idx = jnp.sort(keep_idx, axis=1)                  # keep order
        patches = jnp.take_along_axis(x, keep_idx[..., None], axis=1)
        x = jnp.concatenate([x[:, :lead], patches], axis=1)
    attns = []
    for blk in params["blocks"]:
        if return_attn:
            attns.append(_block_attn_probs(blk, x, spec))
        x = vit_block(blk, x, spec.num_heads, spec.ln_eps)
    x = layer_norm(params["norm"], x, spec.ln_eps)
    if head:
        cls = x[:, 0]
        if spec.representation_size:
            cls = jnp.tanh(dense(params["pre_logits"], cls))
        out = dense(params["head"], cls)
        if spec.distilled:
            # eval-time deit: average of the two classifier heads
            # (reference vision_transformer.py:547-550)
            out = (out + dense(params["head_dist"], x[:, 1])) / 2
    else:
        out = x
    if return_attn:
        return out, jnp.stack(attns)
    return out


def _block_attn_probs(blk: Params, x: jnp.ndarray,
                      spec: VisionModelSpec) -> jnp.ndarray:
    """Softmax attention probabilities of one block (visualization only —
    the main path never materializes these)."""
    from .layers import layer_norm as ln
    B, L, H = x.shape
    nh = spec.num_heads
    hd = H // nh
    y = ln(blk["norm1"], x, spec.ln_eps)
    qkv = dense(blk["attn"]["qkv"], y)
    q, k, _ = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * hd ** -0.5
    return jax.nn.softmax(s, axis=-1)


def create_model(name: str, pretrained: bool = False,
                 checkpoint_path: Optional[str] = None,
                 img_size: Optional[int] = None,
                 num_classes: Optional[int] = None,
                 rng: Optional[jax.Array] = None,
                 dtype=jnp.float32, **spec_kw) -> VisionModel:
    """Factory (reference timm factory.py:6-62).  pretrained=True requires
    checkpoint_path (this environment has no network; timm downloads its
    weights — here they must be on disk as a torch state-dict).

    Extra keyword arguments override fields of the model's spec — the
    analogue of the reference entrypoints' **kwargs (e.g. the t2t
    qk_scale pretrained override, t2t_vit.py:178-186)."""
    kw = {}
    spec = model_spec(name)
    if img_size is not None and img_size != spec.img_size:
        spec = dataclasses.replace(spec, img_size=img_size)
    if num_classes is not None:
        spec = dataclasses.replace(spec, num_classes=num_classes)
    if spec_kw:
        spec = dataclasses.replace(spec, **spec_kw)
    if pretrained and not checkpoint_path:
        raise ValueError("pretrained=True needs checkpoint_path "
                         "(no-network environment)")
    if isinstance(spec, MixNetModelSpec):
        params = init_mixnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_mixnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return mixnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, ResNetV2ModelSpec):
        params = init_resnetv2_params(rng if rng is not None
                                      else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_resnetv2_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return resnetv2_forward(params, images, spec, head=head,
                                    dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, HrNetModelSpec):
        params = init_hrnet_params(rng if rng is not None
                                   else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_hrnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return hrnet_forward(params, images, spec, head=head,
                                 dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, NfNetModelSpec):
        params = init_nfnet_params(rng if rng is not None
                                   else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_nfnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return nfnet_forward(params, images, spec, head=head,
                                 dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, XcepAlignedModelSpec):
        params = init_xception_aligned_params(
            rng if rng is not None else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_xception_aligned_checkpoint(params,
                                                      checkpoint_path, spec)

        def apply(params, images, head=False):
            return xception_aligned_forward(params, images, spec,
                                            head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, GluonXceptionModelSpec):
        params = init_gluon_xception_params(
            rng if rng is not None else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_gluon_xception_checkpoint(params,
                                                    checkpoint_path, spec)

        def apply(params, images, head=False):
            return gluon_xception_forward(params, images, spec, head=head,
                                          dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, T2tVitModelSpec):
        params = init_t2t_vit_params(rng if rng is not None
                                     else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            # NOTE the reference's qk_scale=embed**-0.5 override is tied
            # to its pretrained=True entry path (t2t_vit.py:178-186), NOT
            # to load_state_dict — loading an arbitrary checkpoint keeps
            # the default head-dim scale (r5 fix: the old unconditional
            # override deviated from fn(pretrained=False)+load torch
            # semantics).  Callers modeling the released checkpoint pass
            # qk_scale=embed**-0.5 explicitly, as the reference user
            # would via the entrypoint kwarg.
            params = load_t2t_vit_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return t2t_vit_forward(params, images, spec, head=head,
                                   dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, DlaModelSpec):
        params = init_dla_params(rng if rng is not None
                                 else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_dla_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return dla_forward(params, images, spec, head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, InceptionResnetV2ModelSpec):
        params = init_inception_resnet_v2_params(
            rng if rng is not None else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_inception_resnet_v2_checkpoint(
                params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return inception_resnet_v2_forward(params, images, spec,
                                               head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, InceptionV4ModelSpec):
        params = init_inception_v4_params(rng if rng is not None
                                          else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_inception_v4_checkpoint(params, checkpoint_path,
                                                  spec)

        def apply(params, images, head=False):
            return inception_v4_forward(params, images, spec, head=head,
                                        dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, SeNetModelSpec):
        params = init_senet_params(rng if rng is not None
                                   else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_senet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return senet_forward(params, images, spec, head=head,
                                 dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, SelecSlsModelSpec):
        params = init_selecsls_params(rng if rng is not None
                                      else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_selecsls_checkpoint(params, checkpoint_path,
                                              spec)

        def apply(params, images, head=False):
            return selecsls_forward(params, images, spec, head=head,
                                    dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, CspNetModelSpec):
        params = init_cspnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_cspnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return cspnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, NASNetModelSpec):
        params = init_nasnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_nasnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return nasnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, PNASNetModelSpec):
        params = init_pnasnet_params(rng if rng is not None
                                     else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_pnasnet_checkpoint(params, checkpoint_path,
                                             spec)

        def apply(params, images, head=False):
            return pnasnet_forward(params, images, spec, head=head,
                                   dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, TResNetModelSpec):
        params = init_tresnet_params(rng if rng is not None
                                     else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_tresnet_checkpoint(params, checkpoint_path,
                                             spec)

        def apply(params, images, head=False):
            return tresnet_forward(params, images, spec, head=head,
                                   dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, InceptionV3ModelSpec):
        params = init_inception_v3_params(rng if rng is not None
                                          else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_inception_v3_checkpoint(params, checkpoint_path,
                                                  spec)

        def apply(params, images, head=False):
            return inception_v3_forward(params, images, spec, head=head,
                                        dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, DpnModelSpec):
        params = init_dpn_params(rng if rng is not None
                                 else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_dpn_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return dpn_forward(params, images, spec, head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, RexNetModelSpec):
        params = init_rexnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_rexnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return rexnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, SkNetModelSpec):
        params = init_sknet_params(rng if rng is not None
                                   else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_sknet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return sknet_forward(params, images, spec, head=head,
                                 dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, ResNestModelSpec):
        params = init_resnest_params(rng if rng is not None
                                     else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_resnest_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return resnest_forward(params, images, spec, head=head,
                                   dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, XceptionModelSpec):
        params = init_xception_params(rng if rng is not None
                                      else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_xception_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return xception_forward(params, images, spec, head=head,
                                    dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, VovNetModelSpec):
        params = init_vovnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_vovnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return vovnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, DenseNetModelSpec):
        params = init_densenet_params(rng if rng is not None
                                      else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_densenet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return densenet_forward(params, images, spec, head=head,
                                    dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, RegNetModelSpec):
        params = init_regnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_regnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return regnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, Mn3ModelSpec):
        params = init_mn3_params(rng if rng is not None
                                 else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_mn3_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return mn3_forward(params, images, spec, head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, EffNetModelSpec):
        params = init_effnet_params(rng if rng is not None
                                    else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_effnet_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return effnet_forward(params, images, spec, head=head,
                                  dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    if isinstance(spec, CnnModelSpec):
        params = init_cnn_params(rng if rng is not None
                                 else jax.random.PRNGKey(0), spec)
        if checkpoint_path:
            params = load_cnn_checkpoint(params, checkpoint_path, spec)

        def apply(params, images, head=False):
            return cnn_forward(params, images, spec, head=head, dtype=dtype)

        return VisionModel(spec=spec, params=params, apply=apply)
    params = init_vision_params(rng if rng is not None
                                else jax.random.PRNGKey(0), spec)
    if checkpoint_path:
        params = load_timm_checkpoint(params, checkpoint_path, spec)

    def apply(params, images, head=False):
        return vit_forward(params, images, spec, head=head, dtype=dtype)

    return VisionModel(spec=spec, params=params, apply=apply)


# ---------------------------------------------------------------------------
# timm torch checkpoint loading (reference helpers.py:248 load_pretrained)
# ---------------------------------------------------------------------------

_TIMM_NAME_MAP = {
    "patch_proj.kernel": ("patch_embed.proj.weight", "conv_hwio"),
    "patch_proj.bias": ("patch_embed.proj.bias", "none"),
    "cls_token": ("cls_token", "none"),
    "pos_embed": ("pos_embed", "pos_interp"),
    "norm.scale": ("norm.weight", "none"),
    "norm.bias": ("norm.bias", "none"),
    "head.kernel": ("head.weight", "t"),
    "head.bias": ("head.bias", "none"),
}
_BLOCK_MAP = {
    "norm1.scale": ("norm1.weight", "none"),
    "norm1.bias": ("norm1.bias", "none"),
    "attn.qkv.kernel": ("attn.qkv.weight", "t"),
    "attn.qkv.bias": ("attn.qkv.bias", "none"),
    "attn.proj.kernel": ("attn.proj.weight", "t"),
    "attn.proj.bias": ("attn.proj.bias", "none"),
    "norm2.scale": ("norm2.weight", "none"),
    "norm2.bias": ("norm2.bias", "none"),
    "mlp.fc1.kernel": ("mlp.fc1.weight", "t"),
    "mlp.fc1.bias": ("mlp.fc1.bias", "none"),
    "mlp.fc2.kernel": ("mlp.fc2.weight", "t"),
    "mlp.fc2.bias": ("mlp.fc2.bias", "none"),
}


def load_timm_checkpoint(params: Params, path: str,
                         spec: VisionModelSpec) -> Params:
    """Load a timm ViT torch state-dict; transposes linear kernels, converts
    the conv filter OIHW->HWIO, and bicubically interpolates pos_embed on
    grid mismatch (reference vision_transformer.py:416-421,
    helpers.py:248-299)."""
    import numpy as np
    from ..solver.checkpoint_bridge import load_torch_state_dict
    sd = load_torch_state_dict(path)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def fetch(tname, transform, target_shape):
        arr = np.asarray(sd[tname])
        if transform == "t":
            arr = arr.T
        elif transform == "conv_hwio":
            arr = arr.transpose(2, 3, 1, 0)   # OIHW -> HWIO
        elif transform == "pos_interp":
            if arr.shape != tuple(target_shape):
                lead = spec.num_lead_tokens
                old = int(round((arr.shape[1] - lead) ** 0.5))
                head_pe = jnp.asarray(arr[:, :lead])
                grid_pe = torch_bicubic_resize_2d(
                    jnp.asarray(arr[:, lead:]).reshape(
                        old, old, arr.shape[-1]),
                    (spec.grid, spec.grid)).reshape(1, spec.grid ** 2,
                                                    arr.shape[-1])
                arr = np.asarray(jnp.concatenate([head_pe, grid_pe], 1))
        return jnp.asarray(arr, jnp.float32)

    extra_maps = {}
    if spec.distilled:
        extra_maps["dist_token"] = ("dist_token", "none")
        extra_maps["head_dist.kernel"] = ("head_dist.weight", "t")
        extra_maps["head_dist.bias"] = ("head_dist.bias", "none")
    if spec.representation_size:
        extra_maps["pre_logits.kernel"] = ("pre_logits.fc.weight", "t")
        extra_maps["pre_logits.bias"] = ("pre_logits.fc.bias", "none")

    out = dict(params)
    for jname, (tname, tr) in {**_TIMM_NAME_MAP, **extra_maps}.items():
        top, _, sub = jname.partition(".")
        if top in ("head", "head_dist", "pre_logits") \
                and (top not in params or tname not in sd):
            continue
        tgt = params[top][sub] if sub else params[top]
        val = fetch(tname, tr, tgt.shape)
        if sub:
            out[top] = dict(out[top])
            out[top][sub] = val
        else:
            out[top] = val
    blocks = []
    for i, blk in enumerate(params["blocks"]):
        nb: Params = {}
        for jname, (tname, tr) in _BLOCK_MAP.items():
            parts = jname.split(".")
            cur = nb
            for pp in parts[:-1]:
                cur = cur.setdefault(pp, {})
            ref = blk
            for pp in parts:
                ref = ref[pp]
            if jname == "attn.qkv.bias" \
                    and f"blocks.{i}.{tname}" not in sd:
                # qkv_bias=False checkpoints (old-timm small): keep the
                # zero bias tensor — functionally identical
                cur[parts[-1]] = ref
                continue
            cur[parts[-1]] = fetch(f"blocks.{i}.{tname}", tr, ref.shape)
        blocks.append(nb)
    out["blocks"] = blocks
    if spec.hybrid:
        from .backbones import HYBRIDS
        load_fn = HYBRIDS[spec.hybrid][2]
        out["backbone"] = load_fn(params["backbone"], sd)
    return out
