"""Import harness for the read-only reference repo at /root/reference.

Used ONLY in tests to produce golden outputs from the reference torch
implementation (random tiny models) — never as a runtime dependency.
Stubs the reference's unavailable imports (boto3, torch._six, top-level timm)
and neutralizes its hard-coded .cuda() calls.
"""

import collections.abc
import importlib.machinery
import sys
import types


def _stub_module(name, is_package=False, path=None):
    """ModuleType with a real __spec__ so importlib.util.find_spec() on the
    stubbed name doesn't raise ValueError in unrelated imports."""
    mod = types.ModuleType(name)
    spec = importlib.machinery.ModuleSpec(name, None, is_package=is_package)
    if path is not None:
        mod.__path__ = path
        spec.submodule_search_locations = path
    mod.__spec__ = spec
    return mod

_INSTALLED = False


def install():
    global _INSTALLED
    if _INSTALLED:
        return
    if "/root/reference" not in sys.path:
        # append, not insert(0): the reference repo has top-level run.py /
        # src/ which must not shadow this repo's modules
        sys.path.append("/root/reference")

    for m in ["boto3", "botocore", "botocore.exceptions"]:
        mod = _stub_module(m, is_package=(m != "botocore.exceptions"))
        if m == "botocore.exceptions":
            mod.ClientError = Exception
        sys.modules.setdefault(m, mod)

    if "progressbar" not in sys.modules:
        pb = _stub_module("progressbar")
        pb.ProgressBar = lambda *a, **k: (lambda x: x)
        sys.modules["progressbar"] = pb

    if "future" not in sys.modules:
        fut = _stub_module("future", is_package=True)
        utils = _stub_module("future.utils")
        utils.viewitems = lambda d: d.items()
        fut.utils = utils
        sys.modules["future"] = fut
        sys.modules["future.utils"] = utils

    import torch
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.container_abcs = collections.abc
        six.int_classes = int
        six.string_classes = str
        sys.modules["torch._six"] = six

    if "timm" not in sys.modules:
        # `timm` alias package: __path__ points at the vendored tree so that
        # the vendored code's absolute `from timm.models... import` self-
        # imports resolve; `timm.data` (absent from the vendored snapshot)
        # is stubbed with the constants the model files read.
        timm_stub = _stub_module(
            "timm", is_package=True,
            path=["/root/reference/src/pytorch_image_models/timm"])
        data_stub = _stub_module("timm.data")
        for k, v in dict(
                IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
                IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225),
                IMAGENET_INCEPTION_MEAN=(0.5,) * 3,
                IMAGENET_INCEPTION_STD=(0.5,) * 3,
                IMAGENET_DPN_MEAN=(0.5,) * 3,
                IMAGENET_DPN_STD=(0.5,) * 3).items():
            setattr(data_stub, k, v)
        timm_stub.data = data_stub
        timm_stub.__version__ = "0.0-stub"
        sys.modules["timm"] = timm_stub
        sys.modules["timm.data"] = data_stub

    # reference model code calls .cuda() unconditionally (modeling_bert.py:1415)
    torch.Tensor.cuda = lambda self, *a, **k: self

    _INSTALLED = True


def install_cbs():
    """Extra stubs so the reference utils_cbs imports: a minimal anytree and
    an alias for its broken `src.tools.layers.bert.modeling_utils` import."""
    install()
    if "anytree" not in sys.modules:
        anytree = _stub_module("anytree", is_package=True)

        class AnyNode:
            def __init__(self, parent=None, **attrs):
                self.parent = parent
                self.children = []
                if parent is not None:
                    parent.children.append(self)
                for k, v in attrs.items():
                    setattr(self, k, v)

            @property
            def height(self):
                return 1 + max((c.height for c in self.children), default=-1)

        def findall(root, filter_):
            out = []

            def walk(n):
                if filter_(n):
                    out.append(n)
                for c in n.children:
                    walk(c)
            walk(root)
            return tuple(out)

        search = _stub_module("anytree.search")
        search.findall = findall
        anytree.AnyNode = AnyNode
        anytree.search = search
        sys.modules["anytree"] = anytree
        sys.modules["anytree.search"] = search

    if "src.tools.layers.bert.modeling_utils" not in sys.modules:
        import src.layers.bert.modeling_utils as real_mu
        for name in ["src.tools.layers", "src.tools.layers.bert"]:
            sys.modules.setdefault(name, _stub_module(name, is_package=True))
        sys.modules["src.tools.layers.bert.modeling_utils"] = real_mu


def make_tiny_ref_vitcap(tcfg, seed=0):
    """Build a tiny reference ViTCAP (torch) + matching patch-embed-only image
    encoder, with timm.create_model patched to produce tiny ViTs."""
    install()
    import torch
    torch.manual_seed(seed)

    import src.pytorch_image_models.timm as vtimm
    from src.pytorch_image_models.timm.models.vision_transformer import (
        VisionTransformer)

    def tiny_vit(**kw):
        return VisionTransformer(
            img_size=tcfg.img_size, patch_size=tcfg.patch_size,
            embed_dim=tcfg.hidden_size, depth=tcfg.num_hidden_layers,
            num_heads=tcfg.num_attention_heads, mlp_ratio=4.0, qkv_bias=True,
            output_grid=kw.get("output_grid", False))

    orig_create = vtimm.create_model
    vtimm.create_model = lambda name, **kw: tiny_vit(**kw)
    try:
        from src.layers.bert.modeling_bert import BertConfig, ViTCAP

        cfg = BertConfig(
            vocab_size_or_config_json_file=tcfg.vocab_size,
            hidden_size=tcfg.hidden_size,
            num_hidden_layers=tcfg.num_hidden_layers,
            num_attention_heads=tcfg.num_attention_heads,
            intermediate_size=tcfg.intermediate_size,
            hidden_act="gelu",
            hidden_dropout_prob=tcfg.hidden_dropout_prob,
            attention_probs_dropout_prob=tcfg.attention_probs_dropout_prob,
            max_position_embeddings=tcfg.max_position_embeddings,
            type_vocab_size=tcfg.type_vocab_size,
            initializer_range=0.02,
            layer_norm_eps=tcfg.bert_layer_norm_eps,
        )
        cfg.img_feature_dim = 2054
        cfg.img_feature_type = "frcnn"
        cfg.use_img_layernorm = False
        cfg.tie_weights = tcfg.tie_weights
        cfg.label_smoothing = tcfg.label_smoothing
        cfg.drop_worst_ratio = 0
        cfg.drop_worst_after = 0
        cfg.loss = tcfg.tag_loss
        cfg.split_blocks = tcfg.split_blocks
        cfg.tagemb = tcfg.tagemb
        cfg.category = "bert"
        cfg.topk = tcfg.topk
        cfg.net = "tiny_test"
        cfg.pretrained = False
        cfg.vocab = {"label_to_idx": {}}
        cfg.tokenizer = None
        cfg.output_attentions = False
        cfg.output_hidden_states = False
        cfg.tie_tag_weights = False
        cfg.freeze_embedding = False
        cfg.decoder_layer = tcfg.decoder_layers

        model = ViTCAP(cfg)
        model.eval()

        image_encoder = tiny_vit(output_grid=True)
        import torch.nn as nn
        image_encoder.norm = nn.Identity()
        image_encoder.blocks = nn.ModuleList()
        image_encoder.eval()
    finally:
        vtimm.create_model = orig_create

    return model, image_encoder, cfg


def combined_state_dict(model, image_encoder):
    """State dict shaped like a saved reference ImageCaptioning checkpoint:
    ViTCAP under 'module.', image encoder under 'image_encoder.module.'."""
    sd = {}
    for k, v in model.state_dict().items():
        sd["module." + k] = v
    for k, v in image_encoder.state_dict().items():
        sd["image_encoder.module." + k] = v
    return sd
