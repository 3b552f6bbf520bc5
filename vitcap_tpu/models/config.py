"""Static model configuration.

Mirrors the knobs that matter from the reference's BertConfig json
(/root/reference/yaml/VILT-L12-H784-uncased_16_384/config.json) plus the
pipeline-injected fields (tagger_caption_uni_pipeline_expanding_bertemb.py
get_fusion_config :520-563).  A frozen dataclass so it can be a static jit
argument.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # transformer dims (shared by ViT trunk and BERT decoder)
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    num_hidden_layers: int = 12          # ViT trunk depth
    decoder_layers: int = 4              # BERT multimodal decoder depth
    split_blocks: int = 4                # tag-branch fork size

    # vocab / embeddings
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    tag_vocab_size: int = 30522          # = vocab_size for category='bert'

    # image side
    img_size: int = 384
    patch_size: int = 16
    in_chans: int = 3

    # norms / activations
    bert_layer_norm_eps: float = 1e-12
    vit_layer_norm_eps: float = 1e-6

    # dropout (live config: hidden 0, attention 0.1 from the json)
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.1

    # captioning specifics
    topk: int = 50                       # concept tokens kept
    max_seq_len: int = 70                # caption(20) + od/tag(50) at train
    max_seq_a_len: int = 20
    max_gen_length: int = 20
    max_masked_tokens: int = 3
    label_smoothing: float = 0.1
    sep_token_id: int = 102
    cls_token_id: int = 101
    pad_token_id: int = 0
    mask_token_id: int = 103
    tag_conf_threshold: float = 0.2      # tags with sigmoid>=0.2 counted

    # losses
    tag_loss: str = "focal"              # 'focal' | 'bce'
    focal_alpha: float = 0.5
    focal_gamma: float = 1.0
    tag_loss_weight: float = 0.0         # live pipeline trains caption loss only
                                         # (…bertemb.py:400); stale SCST pipeline
                                         # adds tag loss (…expanding.py:401)

    # attention-aware token filtering (opt-in inference/train speed knob;
    # NOT reference behavior — pattern follows the retrieved ViT token
    # reduction literature, see PAPERS.md): at trunk block
    # token_filter_block, keep the ceil(keep * N) visual tokens with the
    # highest CLS-attention mass (CLS always kept); 0.0 disables.
    token_filter_keep: float = 0.0
    token_filter_block: int = 2

    # wiring
    tagemb: str = "cls"                  # tag embeddings from tied LM-head weight
    tie_weights: bool = True
    tie_tag_weights: bool = False        # tie tag head to word embeddings
                                         # (reference modeling_bert.py:723-726;
                                         # requires tag_vocab_size == vocab_size)
    mask_type: str = "seq2seq"
    # concept injection at decode: 'raw' = train-branch semantics (plain
    # tied-weight lookup, modeling_bert.py:1437-1470 — the path real-scale
    # eval takes); 'embedded' = infer-branch semantics (+pos/type emb + LN,
    # encode_tag_to_embedding :1381-1406)
    tag_attach: str = "raw"
    tag_pos_offset: int = 20             # hard-coded caption_len=20 in the
                                         # reference encode_tag_to_embedding

    # numerics
    dtype: str = "float32"               # compute dtype: 'float32' | 'bfloat16'
    scores_dtype: str = "auto"           # attention-score accumulation:
                                         # 'auto' = compute dtype (bf16 scores
                                         # when dtype=bfloat16, ~15% faster
                                         # attention, ~1e-2 output noise —
                                         # comparable to the reference's fp16
                                         # AMP score matmul); 'f32' = exact
    remat: Any = "auto"                  # jax.checkpoint each transformer
                                         # block: True | False | 'auto'.
                                         # With XLA attention the saved
                                         # (B, nh, L, L) prob activations
                                         # alone exceed HBM at training
                                         # batch sizes -> remat needed; the
                                         # Pallas one-pass backward never
                                         # stores probs, so full activation
                                         # storage fits and remat's ~1/3
                                         # recompute FLOPs are pure loss
                                         # (measured B=64 bf16 v5e: 110.8
                                         # img/s remat vs 134.9 without).
                                         # 'auto' = False when the Pallas
                                         # train attention is active
                                         # (TPU), True otherwise.
                                         # (no-op for forward-only jits)
    train_fused_blocks: bool = False     # route the TRAIN-time trunk
                                         # forward through the fused Pallas
                                         # block kernel (custom-vjp saves
                                         # only block inputs = remat
                                         # memory; backward recomputes via
                                         # XLA).  Measured SLOWER than
                                         # remat-XLA (84.2 vs 89.5 img/s at
                                         # B=64 — XLA fuses the remat
                                         # recompute into the backward
                                         # better than the split pipeline);
                                         # kept as an experiment knob,
                                         # grad-parity tested.
    kv_cache_quant: str = "none"         # 'none' | 'int8': quantize the
                                         # static decode context K/V caches
                                         # per (layer, image, head) absmax.
                                         # The caches are the dominant
                                         # per-step HBM traffic of the
                                         # decode scan (247MB/step at B=32);
                                         # int8 halves it.  Opt-in quality
                                         # knob (NOT reference behavior) —
                                         # tiny-model logits shift ~1e-2.

    def __post_init__(self):
        if self.split_blocks > self.num_hidden_layers:
            raise ValueError(
                f"split_blocks={self.split_blocks} exceeds trunk depth "
                f"{self.num_hidden_layers} (the tag branch forks off the "
                f"last split_blocks trunk layers)")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def use_remat(self) -> bool:
        """Resolve the remat tri-state (see the `remat` field): 'auto'
        rematerializes only when the XLA attention backward (which stores
        the (B, nh, L, L) probs) is in play.  'fusion' rematerializes the
        fusion decoder only (the B*K-wide SCST scoring layers) while the
        trunk keeps its no-recompute analytic backward."""
        if self.remat == "auto":
            from ..ops import train_attention_backend
            return train_attention_backend() == "xla"
        if self.remat == "fusion":
            return False
        return bool(self.remat)

    @property
    def use_remat_fusion(self) -> bool:
        """Remat gate for the fusion decoder's layer loop (see use_remat)."""
        return self.use_remat or self.remat == "fusion"


    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def num_visual_tokens(self) -> int:
        return self.num_patches + 1      # + CLS

    @property
    def decoder_seq_len(self) -> int:
        """text + tagger-CLS + visual."""
        return self.max_seq_len + 1 + self.num_visual_tokens

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def attention_scores_dtype(self):
        """None = f32/exact (the mha default); bf16 when opted in."""
        if self.scores_dtype == "auto":
            return jnp.bfloat16 if self.dtype == "bfloat16" else None
        return None

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    # -- json round-trip (reference PretrainedConfig.save_pretrained /
    #    from_pretrained, modeling_utils.py:67-220: a `config.json` in a
    #    directory; unknown keys are tolerated on load) --

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json_string(self) -> str:
        import json
        return json.dumps(self.to_dict(), indent=2, sort_keys=True) + "\n"

    def save_pretrained(self, save_directory: str) -> str:
        import os
        os.makedirs(save_directory, exist_ok=True)
        path = os.path.join(save_directory, "config.json")
        with open(path, "w") as f:
            f.write(self.to_json_string())
        return path

    @classmethod
    def from_pretrained(cls, path: str, **overrides) -> "ModelConfig":
        """`path` is a directory containing config.json or the json file
        itself.  Keys the dataclass doesn't know are ignored (the reference
        loader is similarly tolerant); `overrides` win over the file."""
        import json
        import os
        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in raw.items() if k in known}
        kw.update(overrides)
        return cls(**kw)


def tiny_config(**kw) -> ModelConfig:
    """Small config for tests."""
    base = dict(
        hidden_size=32, num_attention_heads=4, intermediate_size=128,
        num_hidden_layers=4, decoder_layers=2, split_blocks=2,
        vocab_size=128, tag_vocab_size=128, max_position_embeddings=96,
        img_size=32, patch_size=16, topk=5, max_seq_len=16, max_seq_a_len=6,
        max_gen_length=6, attention_probs_dropout_prob=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)
