"""ViTCAP model: split-ViT encoder + concept-token branch + BERT fusion decoder.

TPU-first re-design of the reference architecture (math-equivalent):

    PatchEmbed+CLS+pos -> ViTBlocks[0..12) ----------------------> caption tokens
                               \\-(fork at 12-split_blocks)-> TagBlocks[4) -> tagCLS
    tagCLS -> pooler -> tag_logit -> sigmoid top-K concept ids
    text embeddings[tail] <- concept embeddings (tied LM-head weight)
    [text(70) ; tagCLS ; visual(577)] -> BertDecoder(4) -> LM head

Behavioral references:
- TIMMVitSplitEncoder: /root/reference/src/layers/bert/modeling_bert.py:440-478
- ViTSplitCLSEmbModel.forward: modeling_bert.py:1408-1517 (incl. the appended
  tagger-CLS mask semantics at :1493-1496, which reduce to "tagCLS+visual form
  one bidirectional block that does not attend text")
- ViTCAP.encode_forward + losses: modeling_bert.py:751-823, 661-690
- FocalLossWithLogitsNegLoss: src/layers/loss.py:5-22
- seq2seq text mask: src/data_layer/dataset.py:699-717
- construct_attn_mask: …bertemb.py:57-88

Unlike the reference, the whole step is one jit-compiled function with static
shapes; masks are built on device from compact (seq_a_len, seq_len) descriptors
instead of shipping dense (648,648) masks from the host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    NEG_MASK_VALUE, bert_embeddings, bert_layer, bert_pooler, dense,
    layer_norm, lm_head, vision_embed, vit_block,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialization
# ---------------------------------------------------------------------------

def _trunc_normal(rng, shape, std=0.02, dtype=jnp.float32):
    return jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype) * std


def _dense_init(rng, fan_in, fan_out, std=0.02):
    return {"kernel": _trunc_normal(rng, (fan_in, fan_out), std),
            "bias": jnp.zeros((fan_out,))}


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _vit_block_init(rng, cfg: ModelConfig):
    h, i = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 4)
    return {
        "norm1": _ln_init(h),
        "attn": {"qkv": _dense_init(ks[0], h, 3 * h),
                 "proj": _dense_init(ks[1], h, h)},
        "norm2": _ln_init(h),
        "mlp": {"fc1": _dense_init(ks[2], h, i),
                "fc2": _dense_init(ks[3], i, h)},
    }


def _bert_layer_init(rng, cfg: ModelConfig):
    h, i = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 6)
    return {
        "attention": {
            "self": {"query": _dense_init(ks[0], h, h),
                     "key": _dense_init(ks[1], h, h),
                     "value": _dense_init(ks[2], h, h)},
            "output": {"dense": _dense_init(ks[3], h, h),
                       "LayerNorm": _ln_init(h)},
        },
        "intermediate": {"dense": _dense_init(ks[4], h, i)},
        "output": {"dense": _dense_init(ks[5], i, h),
                   "LayerNorm": _ln_init(h)},
    }


def _embeddings_init(rng, cfg: ModelConfig):
    h = cfg.hidden_size
    ks = jax.random.split(rng, 3)
    return {
        "word_embeddings": _trunc_normal(ks[0], (cfg.vocab_size, h)),
        "position_embeddings": _trunc_normal(
            ks[1], (cfg.max_position_embeddings, h)),
        "token_type_embeddings": _trunc_normal(ks[2], (cfg.type_vocab_size, h)),
        "LayerNorm": _ln_init(h),
    }


def _lm_head_init(rng, cfg: ModelConfig, out_dim: int, tied: bool):
    h = cfg.hidden_size
    ks = jax.random.split(rng, 2)
    p = {"transform": {"dense": _dense_init(ks[0], h, h),
                       "LayerNorm": _ln_init(h)}}
    if tied:
        p["decoder"] = {"bias": jnp.zeros((out_dim,))}
    else:
        p["decoder"] = _dense_init(ks[1], h, out_dim)
    return p


def init_params(rng: jax.Array, cfg: ModelConfig) -> Params:
    ks = jax.random.split(rng, 12)
    h = cfg.hidden_size
    gh = cfg.img_size // cfg.patch_size
    params: Params = {
        "image_encoder": {
            "patch_proj": {
                "kernel": _trunc_normal(
                    ks[0], (cfg.patch_size, cfg.patch_size, cfg.in_chans, h)),
                "bias": jnp.zeros((h,)),
            },
            "cls_token": _trunc_normal(ks[1], (1, 1, h)),
            "pos_embed": _trunc_normal(ks[2], (1, gh * gh + 1, h)),
        },
        "encoder": {
            "blocks": [
                _vit_block_init(k, cfg)
                for k in jax.random.split(ks[3], cfg.num_hidden_layers)],
            "tag_blocks": [
                _vit_block_init(k, cfg)
                for k in jax.random.split(ks[4], cfg.split_blocks)],
        },
        "embeddings": _embeddings_init(ks[5], cfg),
        "extra_embeddings": _embeddings_init(ks[6], cfg),
        "pooler": {"dense": _dense_init(ks[7], h, h)},
        "caption_pooler": {"dense": _dense_init(ks[8], h, h)},
        "tag_logit": _lm_head_init(ks[9], cfg, cfg.tag_vocab_size,
                                   tied=cfg.tie_tag_weights),
        "decoder": {"layer": [
            _bert_layer_init(k, cfg)
            for k in jax.random.split(ks[10], cfg.decoder_layers)]},
        "cls": _lm_head_init(ks[11], cfg, cfg.vocab_size,
                             tied=cfg.tie_weights),
    }
    return params


def init_tag_blocks_from_encoder(params: Params, cfg: ModelConfig) -> Params:
    """Copy the last split_blocks encoder blocks into the tag branch
    (reference …bertemb.py:265-267)."""
    src = params["encoder"]["blocks"][-cfg.split_blocks:]
    params = dict(params)
    enc = dict(params["encoder"])
    # real copies: aliased buffers would break jit donation downstream
    enc["tag_blocks"] = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True), src)
    params["encoder"] = enc
    return params


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def seq2seq_text_mask(seq_a_len: jnp.ndarray, seq_len: jnp.ndarray,
                      cfg: ModelConfig) -> jnp.ndarray:
    """(B, T, T) 0/1 mask over text tokens; causal caption, full od-label
    block, caption->od, no od->caption (reference dataset.py:699-717)."""
    T = cfg.max_seq_len
    A = cfg.max_seq_a_len
    i = jnp.arange(T)[None, :, None]
    j = jnp.arange(T)[None, None, :]
    a = seq_a_len[:, None, None]
    s = seq_len[:, None, None]
    cap_i, cap_j = i < a, j < a
    od_i = (i >= A) & (i < s)
    od_j = (j >= A) & (j < s)
    m = (cap_i & cap_j & (j <= i)) | (od_i & od_j) | (cap_i & od_j)
    return m.astype(jnp.float32)


def decoder_bias_from_text_mask(text_mask: jnp.ndarray,
                                n_ctx: int) -> jnp.ndarray:
    """(B,T,T) text mask -> (B,1,L,L) additive bias, L = T + n_ctx, where the
    n_ctx trailing tokens (tagCLS + visual) are a bidirectional block that all
    text attends to but that never attends text (seq2seq construct_attn_mask
    …bertemb.py:57-88 + the appended tagger-CLS row/col :1493-1496)."""
    B, T, _ = text_mask.shape
    L = T + n_ctx
    m = jnp.zeros((B, L, L), dtype=jnp.float32)
    m = m.at[:, :T, :T].set(text_mask)
    m = m.at[:, :, T:].set(1.0)
    return ((1.0 - m) * NEG_MASK_VALUE)[:, None, :, :]


# ---------------------------------------------------------------------------
# encoder / heads
# ---------------------------------------------------------------------------

def split_encoder(params: Params, visual_in: jnp.ndarray, cfg: ModelConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """12 ViT blocks; fork at depth-split_blocks into the tag branch
    (reference TIMMVitSplitEncoder modeling_bert.py:440-478).

    Returns (caption_hidden (B,V,H), tag_cls (B,1,H)) — the tag branch's
    CLS row, the only part of that branch any consumer reads."""
    sd = cfg.attention_scores_dtype

    # pad the token axis to a 128-multiple ONCE when the fused block kernel
    # will run (it needs aligned rows; per-block pad+unpad costs ~0.15 ms
    # each at the trunk shape).  Padded rows are masked as attention keys
    # inside the kernel and sliced off at the end.
    from ..ops import attention_backend
    backend = attention_backend()
    fused = backend != "xla"
    # opt-in train-time fused forward (cfg.train_fused_blocks): the
    # kernel's custom-vjp saves only block inputs (= remat memory) while
    # skipping remat's second forward
    train_fused = False
    if cfg.train_fused_blocks and not fused:
        import os
        from ..ops import _on_tpu
        interp = os.environ.get("VITCAP_PALLAS") == "interpret"
        if _on_tpu() or interp:
            fused = train_fused = True
            backend = "pallas_interpret" if interp else "pallas"
    from ..ops.fused_block import pad_len
    L_true = visual_in.shape[1]
    # the packed-kernel TRAIN path also benefits from one hoisted pad:
    # per-block pad+unpad copies (q/k/v/g in fwd+bwd autodiff) cost
    # ~0.8 ms/block at the trunk train shape.  Padded keys are masked
    # inside the packed kernels via l_actual; padded rows carry finite
    # garbage that is sliced off after the loop.
    packed_train = False
    if not fused:
        from ..ops import train_attention_backend
        packed_train = train_attention_backend() != "xla"
    pad = (pad_len(L_true) - L_true) if (fused or packed_train) else 0
    l_actual = L_true if pad else 0

    if train_fused:
        from ..ops.fused_block import fused_vit_block

        def blk_fn(blk, x, la=0):
            # direct kernel call: the vit_block dispatch would see the
            # train-time (non-inference) backend and fall back to XLA.
            # No outer jax.checkpoint — the custom-vjp already saves only
            # the block inputs.
            return fused_vit_block(blk, x, cfg.num_attention_heads,
                                   cfg.vit_layer_norm_eps,
                                   backend == "pallas_interpret", la)
    else:
        def blk_fn(blk, x, la=0):
            return vit_block(blk, x, cfg.num_attention_heads,
                             cfg.vit_layer_norm_eps, scores_dtype=sd,
                             l_actual=la)

    def cls_fn(blk, x):
        from .layers import vit_block_cls_only
        return vit_block_cls_only(blk, x, cfg.num_attention_heads,
                                  cfg.vit_layer_norm_eps, scores_dtype=sd)
    if cfg.use_remat:
        if not train_fused:
            blk_fn = jax.checkpoint(blk_fn, static_argnums=(2,))
        cls_fn = jax.checkpoint(cls_fn)
    x = visual_in
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    fork_at = cfg.num_hidden_layers - cfg.split_blocks
    tag_x = None
    for idx, blk in enumerate(params["encoder"]["blocks"]):
        if cfg.token_filter_keep and idx == cfg.token_filter_block:
            if pad:
                x = x[:, :L_true]
            x = _filter_tokens_by_attention(blk, x, cfg)
            L_true = x.shape[1]
            pad = (pad_len(L_true) - L_true) if (fused or packed_train) \
                else 0
            l_actual = L_true if pad else 0
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        if idx == fork_at:
            tag_x, tag_pad, tag_L = x, pad, L_true
        x = blk_fn(blk, x, l_actual)
    # only the CLS row of the tag branch is ever consumed (pooler + tagCLS),
    # so the final tag block computes just that row — exact, ~1/4 the branch
    # FLOPs saved
    tag_blocks = params["encoder"]["tag_blocks"]
    for blk in tag_blocks[:-1]:
        tag_x = blk_fn(blk, tag_x, tag_L if tag_pad else 0)
    if pad:
        x = x[:, :L_true]
    if tag_x is not None and tag_pad:
        tag_x = tag_x[:, :tag_L]
    tag_cls = cls_fn(tag_blocks[-1], tag_x) if tag_blocks else tag_x[:, :1]
    return x, tag_cls


def _filter_tokens_by_attention(blk: Params, x: jnp.ndarray,
                                cfg: ModelConfig) -> jnp.ndarray:
    """Attention-aware token filtering (opt-in, cfg.token_filter_keep): keep
    the ceil(keep * n_patch) patch tokens with the highest CLS-attention
    mass under the upcoming block, plus CLS itself; kept tokens stay in
    their original order.  Static output shape, so the whole step still
    compiles once."""
    import math
    B, L, H = x.shape
    from .layers import cls_attention_scores
    scores = cls_attention_scores(blk, x, cfg.num_attention_heads,
                                  cfg.vit_layer_norm_eps)      # (B, L)
    n_keep = int(math.ceil(cfg.token_filter_keep * (L - 1)))
    _, idx = jax.lax.top_k(scores[:, 1:], n_keep)              # patch idx
    idx = jnp.sort(idx, axis=1) + 1                            # keep order
    idx = jnp.concatenate([jnp.zeros((B, 1), idx.dtype), idx], axis=1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def tag_logits_from_hidden(params: Params, tag_hidden: jnp.ndarray,
                           cfg: ModelConfig) -> jnp.ndarray:
    pooled = bert_pooler(params["pooler"], tag_hidden)
    tied = word_embedding_weight(params) if cfg.tie_tag_weights else None
    return lm_head(params["tag_logit"], pooled, cfg.bert_layer_norm_eps,
                   decoder_weight=tied)


def select_tags(tag_logits: jnp.ndarray, cfg: ModelConfig
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Non-differentiable sigmoid top-K concept selection; last slot forced to
    SEP (reference modeling_bert.py:1427-1447).

    Top-K via decode.exact_top_k (tie-exact vs lax.top_k, which sorts the
    whole (B, V) row: ~1 ms/batch on v5e; the chunked two-stage selection
    runs at reduce bandwidth).  All rows are finite sigmoid probs, so the
    finite-row precondition holds."""
    from .decode import exact_top_k
    probs = jax.nn.sigmoid(jax.lax.stop_gradient(tag_logits.astype(jnp.float32)))
    top_prob, top_idx = exact_top_k(probs, cfg.topk)
    n_conf = jnp.sum(top_prob >= cfg.tag_conf_threshold, axis=-1)
    top_idx = top_idx.at[:, -1].set(cfg.sep_token_id)
    return top_idx, top_prob, n_conf


def word_embedding_weight(params: Params) -> jnp.ndarray:
    return params["embeddings"]["word_embeddings"]


def sample_visual_token_idx(rng: jax.Array, batch: int, n_tokens: int,
                            keep: int) -> jnp.ndarray:
    """Random visual-token subset per row, always keeping token 0 (CLS)
    (reference TokenSample …expanding.py:68-86; README's ~70% sampling for
    SCST memory relief)."""
    scores = jax.random.uniform(rng, (batch, n_tokens - 1))
    _, idx = jax.lax.top_k(scores, keep - 1)
    return jnp.concatenate(
        [jnp.zeros((batch, 1), idx.dtype), idx + 1], axis=1)


def encode_images(params: Params, images: jnp.ndarray, cfg: ModelConfig,
                  visual_token_idx: Optional[jnp.ndarray] = None
                  ) -> Dict[str, jnp.ndarray]:
    """Vision once: patch embed -> split encoder -> tag logits + selection.

    visual_token_idx: optional (B, keep) token subset (TokenSample) applied
    AFTER pos-embed, so the trunk runs on fewer tokens."""
    dtype = cfg.compute_dtype
    if images.dtype != jnp.uint8:       # uint8 feeds keep their bytes; the
        images = images.astype(dtype)   # normalization folds into the
    visual_in = vision_embed(params["image_encoder"],   # patch projection
                             images, cfg.patch_size, compute_dtype=dtype)
    if visual_token_idx is not None:
        visual_in = jnp.take_along_axis(
            visual_in, visual_token_idx[..., None], axis=1)
    cap_hidden, tag_cls = split_encoder(params, visual_in, cfg)
    tag_logits = tag_logits_from_hidden(params, tag_cls, cfg)
    pred_topk, tag_probs, n_conf = select_tags(tag_logits, cfg)
    return {
        "visual": cap_hidden,              # (B, V, H)
        "tag_cls": tag_cls,                # (B, 1, H)
        "tag_logits": tag_logits,          # (B, tagV)
        "pred_topk": pred_topk,            # (B, topk)
        "tag_probs": tag_probs,
        "n_conf_tags": n_conf,
    }


def embed_text_with_tags(params: Params, input_ids: jnp.ndarray,
                         token_type_ids: Optional[jnp.ndarray],
                         position_ids: Optional[jnp.ndarray],
                         pred_topk: jnp.ndarray, cfg: ModelConfig,
                         rng: Optional[jax.Array] = None,
                         deterministic: bool = True) -> jnp.ndarray:
    """BertEmbeddings over input ids, then overwrite the trailing topk slots
    with raw tied-weight concept embeddings (reference 'train branch' with
    tagemb=cls, modeling_bert.py:1437-1470; no pos/type/LN on the tags)."""
    dtype = cfg.compute_dtype
    emb = bert_embeddings(params["embeddings"], input_ids, position_ids,
                          token_type_ids, cfg.bert_layer_norm_eps,
                          cfg.hidden_dropout_prob, rng, deterministic, dtype)
    tag_emb = word_embedding_weight(params)[pred_topk].astype(dtype)
    return emb.at[:, -pred_topk.shape[1]:].set(tag_emb)


def fusion_decoder(params: Params, seq: jnp.ndarray, bias: jnp.ndarray,
                   cfg: ModelConfig, rng: Optional[jax.Array] = None,
                   deterministic: bool = True) -> jnp.ndarray:
    # hoist the packed-kernel token-axis pad (e.g. 648 -> 656) out of the
    # layer loop: per-layer, mha would otherwise pad q/k/v AND the
    # (B,1,L,L) bias on every call in fwd and bwd (~0.9/1.2 ms per layer
    # at the flagship train shape).  Padded rows carry finite garbage
    # (masked as attention keys inside the kernels), sliced off after the
    # loop.  Predicate mirrors mha's packed-path routing exactly.
    L = seq.shape[1]
    l_actual = 0
    if L >= 64 and L % 16 and bias is not None and bias.shape[1] == 1:
        from ..ops import attention_backend, train_attention_backend
        if (attention_backend() == "xla"
                and train_attention_backend() != "xla"):
            Lp = (L + 15) // 16 * 16
            seq = jnp.pad(seq, ((0, 0), (0, Lp - L), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp - L),
                                  (0, Lp - L)))
            l_actual = L

    def layer_fn(layer, x, bias, lrng):
        return bert_layer(layer, x, bias, cfg.num_attention_heads,
                          cfg.bert_layer_norm_eps,
                          hidden_dropout=cfg.hidden_dropout_prob,
                          attn_dropout=cfg.attention_probs_dropout_prob,
                          rng=lrng, deterministic=deterministic,
                          scores_dtype=cfg.attention_scores_dtype,
                          l_actual=l_actual)
    if cfg.use_remat_fusion:
        layer_fn = jax.checkpoint(layer_fn)
    x = seq
    for li, layer in enumerate(params["decoder"]["layer"]):
        lrng = jax.random.fold_in(rng, li) if rng is not None else None
        x = layer_fn(layer, x, bias, lrng)
    return x[:, :L] if l_actual else x


def caption_logits(params: Params, hidden: jnp.ndarray, cfg: ModelConfig
                   ) -> jnp.ndarray:
    tied = word_embedding_weight(params) if cfg.tie_weights else None
    return lm_head(params["cls"], hidden, cfg.bert_layer_norm_eps,
                   decoder_weight=tied)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def label_smoothed_kl(logits: jnp.ndarray, target: jnp.ndarray,
                      weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Exact reference loss value: KLDiv(log_softmax, smoothed one-hot)
    summed over classes, weighted-mean over tokens
    (reference BertCaptioningLoss modeling_bert.py:661-690)."""
    logits = logits.astype(jnp.float32)
    n_class = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    off = eps / (n_class - 1)
    on = 1.0 - eps
    # sum_c q_c*(log q_c - logp_c) with q = smoothed one-hot
    ent = -(on * jnp.log(on) + (n_class - 1) * off * jnp.log(off)) if eps > 0 \
        else 0.0
    logp_t = jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    sum_logp = jnp.sum(logp, axis=-1)
    cross = -(on * logp_t + off * (sum_logp - logp_t))
    per_tok = cross - ent
    denom = jnp.maximum(jnp.sum(weight), 1.0)
    return jnp.sum(per_tok * weight) / denom


def focal_tag_loss(logits: jnp.ndarray, label: jnp.ndarray, alpha: float,
                   gamma: float) -> jnp.ndarray:
    """FocalLossWithLogitsNegLoss summed over (B, V)
    (reference src/layers/loss.py:5-22, applied at modeling_bert.py:713-717
    with alpha=0.5, gamma=1, then .sum())."""
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    pos = (label == 1) * alpha * jnp.power(1.0 - p, gamma) * jax.nn.log_sigmoid(x)
    neg = (label == 0) * (1 - alpha) * jnp.power(p, gamma) * jax.nn.log_sigmoid(-x)
    return -jnp.sum(pos + neg)


def bce_tag_loss(logits: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * label + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# full forwards
# ---------------------------------------------------------------------------

def _masked_positions(masked_pos: jnp.ndarray, max_masked: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) 0/1 -> (B, M) indices of ones (ascending, then padding slots) +
    validity.  Slot k must align with masked_ids[:, k], which the tensorizer
    packs in ascending-position order — so masked positions must come FIRST
    (stable argsort of -masked_pos keeps them ascending), padding after."""
    idx = jnp.argsort(-masked_pos, axis=-1, stable=True)[:, :max_masked]
    valid = jnp.take_along_axis(masked_pos, idx, axis=-1) > 0
    return idx, valid


def forward_train(params: Params, batch: Dict[str, jnp.ndarray],
                  cfg: ModelConfig, rng: Optional[jax.Array] = None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training forward: returns (total_loss, aux dict).

    batch keys: image (B,H,W,3 NHWC, normalized), input_ids (B,T),
    token_type_ids (B,T), seq_a_len (B,), seq_len (B,), masked_pos (B,T),
    masked_ids (B,M), label (B, tagV) multi-hot.
    """
    deterministic = rng is None
    if rng is not None:
        r_emb, r_dec = jax.random.split(rng)
    else:
        r_emb = r_dec = None

    enc = encode_images(params, batch["image"], cfg)
    pred_topk = enc["pred_topk"]
    if "gen_tag_ratio" in batch and rng is not None:
        # GT-tag curriculum: the first floor((1-ratio)*n_gt) concept slots
        # are replaced by randomly-ordered ground-truth tags (reference
        # modeling_bert.py:1437-1444; ratio ramps iter/max_iter per
        # …bertemb.py:95-101).  ratio=1 -> pure predicted tags.
        r_emb, r_mix = jax.random.split(r_emb)
        label = batch["label"]
        noise = jax.random.uniform(r_mix, label.shape, minval=0.1)
        _, gt_rand = jax.lax.top_k(label * noise, cfg.topk)
        n_gt = jnp.sum(label > 0, axis=-1)
        batch_len = jnp.floor(
            (1.0 - batch["gen_tag_ratio"]) *
            jnp.minimum(n_gt, cfg.topk).astype(jnp.float32)).astype(jnp.int32)
        slot = jnp.arange(cfg.topk)[None, :]
        pred_topk = jnp.where(slot < batch_len[:, None], gt_rand, pred_topk)
        pred_topk = pred_topk.at[:, -1].set(cfg.sep_token_id)
    text_emb = embed_text_with_tags(
        params, batch["input_ids"], batch.get("token_type_ids"), None,
        pred_topk, cfg, r_emb, deterministic)

    seq = jnp.concatenate(
        [text_emb, enc["tag_cls"].astype(text_emb.dtype),
         enc["visual"].astype(text_emb.dtype)], axis=1)
    text_mask = seq2seq_text_mask(batch["seq_a_len"], batch["seq_len"], cfg)
    bias = decoder_bias_from_text_mask(text_mask, seq.shape[1] - cfg.max_seq_len)
    hidden = fusion_decoder(params, seq, bias, cfg, r_dec, deterministic)

    midx, mvalid = _masked_positions(batch["masked_pos"], cfg.max_masked_tokens)
    gathered = jnp.take_along_axis(hidden, midx[..., None], axis=1)  # (B,M,H)
    class_logits = caption_logits(params, gathered, cfg)             # (B,M,V)
    weight = ((batch["masked_ids"] != 0) & mvalid).astype(jnp.float32)
    masked_loss = label_smoothed_kl(
        class_logits.reshape(-1, class_logits.shape[-1]),
        batch["masked_ids"].reshape(-1), weight.reshape(-1),
        cfg.label_smoothing)

    aux = {
        "masked_loss": masked_loss,
        "class_logits": class_logits,
        "tag_logits": enc["tag_logits"],
        "masked_weight": weight,
    }
    total = masked_loss
    if cfg.tag_loss_weight > 0.0 and "label" in batch:
        if cfg.tag_loss == "focal":
            tl = focal_tag_loss(enc["tag_logits"], batch["label"],
                                cfg.focal_alpha, cfg.focal_gamma)
        else:
            tl = bce_tag_loss(enc["tag_logits"], batch["label"])
        aux["tag_loss"] = tl
        total = total + cfg.tag_loss_weight * tl
    aux["loss"] = total
    return total, aux


def forward_score(params: Params, images: jnp.ndarray,
                  input_ids: jnp.ndarray,
                  token_type_ids: Optional[jnp.ndarray],
                  position_ids: Optional[jnp.ndarray],
                  text_mask: jnp.ndarray, cfg: ModelConfig
                  ) -> Dict[str, jnp.ndarray]:
    """Inference-style scoring: logits at every text position (reference
    encode_forward non-training branch modeling_bert.py:806-822).  Used for
    parity tests and as the decode prefill building block.

    text_mask: (B, Tin, Tin) 0/1 over the given input_ids length.
    """
    enc = encode_images(params, images, cfg)
    dtype = cfg.compute_dtype
    emb = bert_embeddings(params["embeddings"], input_ids, position_ids,
                          token_type_ids, cfg.bert_layer_norm_eps,
                          dtype=dtype)
    tag_emb = word_embedding_weight(params)[enc["pred_topk"]].astype(dtype)
    emb = emb.at[:, -enc["pred_topk"].shape[1]:].set(tag_emb)
    seq = jnp.concatenate(
        [emb, enc["tag_cls"].astype(dtype), enc["visual"].astype(dtype)],
        axis=1)
    B, Tin, _ = text_mask.shape
    n_ctx = seq.shape[1] - Tin
    L = seq.shape[1]
    m = jnp.zeros((B, L, L), dtype=jnp.float32)
    m = m.at[:, :Tin, :Tin].set(text_mask)
    m = m.at[:, :, Tin:].set(1.0)
    bias = ((1.0 - m) * NEG_MASK_VALUE)[:, None]
    hidden = fusion_decoder(params, seq, bias, cfg)
    logits = caption_logits(params, hidden[:, :Tin], cfg)
    return {"class_logits": logits, **enc}


def resize_word_embeddings(params: Params, cfg: ModelConfig, new_size: int,
                           rng: Optional[jax.Array] = None) -> Params:
    """Grow/shrink the (tied) word-embedding table, keeping existing rows
    (reference PreTrainedModel.resize_token_embeddings,
    modeling_utils.py:245-315)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = dict(params)
    emb = dict(params["embeddings"])
    old = emb["word_embeddings"]
    old_n, h = old.shape
    if new_size == old_n:
        return params
    new = _trunc_normal(rng, (new_size, h)).astype(old.dtype)
    n = min(old_n, new_size)
    emb["word_embeddings"] = new.at[:n].set(old[:n])
    params["embeddings"] = emb
    cls = dict(params["cls"])
    dec = dict(cls["decoder"])
    if "bias" in dec:
        old_b = dec["bias"]
        new_b = jnp.zeros((new_size,), old_b.dtype)
        dec["bias"] = new_b.at[:n].set(old_b[:n])
    if "kernel" in dec:
        old_k = dec["kernel"]
        new_k = _trunc_normal(jax.random.fold_in(rng, 1),
                              (h, new_size)).astype(old_k.dtype)
        dec["kernel"] = new_k.at[:, :n].set(old_k[:, :n])
    cls["decoder"] = dec
    params["cls"] = cls
    return params
