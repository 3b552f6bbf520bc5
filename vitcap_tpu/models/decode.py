"""Autoregressive caption decoding: greedy / sampling / beam search.

TPU-first redesign of the reference generation engine
(/root/reference/src/layers/bert/modeling_bert.py:825-1059 generate +
prepare_inputs_for_generation; modeling_utils.py:768-886 no-beam, :888-1101
beam, :1103-1136 top-k/top-p, :1138-1181 BeamHypotheses).

The reference's live path has NO working KV cache: `_do_output_past` is
false for ViTCAP, so every step re-enters the full vision stack and runs the
fusion decoder over the whole (cur_len+1+od_len+1+visual) sequence.  Here:

- the vision trunk + tag head run ONCE per image (`build_decode_context`);
- the fusion decoder's static context — od/tag text slots, tagger-CLS, visual
  tokens — is prefilled ONCE into per-layer K/V caches (valid because the
  reference mask never lets context tokens attend caption tokens);
- each decode step runs the 4 decoder layers over a 2-token window
  [prev_token@t-1, MASK@t] (the reference's MASK-peek scheme: logits for
  position t are read at a MASK probe that attends generated tokens < t,
  itself, and the context), writing prev's K/V into a small per-beam caption
  cache.  All steps are one `lax.scan` with static shapes.
- the context cache is stored once per IMAGE and shared across beams /
  return-sequences (reference duplicates it per beam); only the tiny caption
  cache is gathered on beam reorder.

Everything jits; data-dependent early exit is replaced by masked bookkeeping
(identical results — finished rows write PAD exactly like the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import NEG_MASK_VALUE, dense, layer_norm, lm_head
from . import vitcap as M

Params = Dict[str, Any]

NEG_INF = -1e9  # beam bookkeeping sentinel (reference uses -1e9 / -1e5)


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Mirrors the reference `test_extra_input` dict
    (…bertemb.py:588-607)."""
    max_length: int = 20
    num_beams: int = 1
    num_keep_best: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    length_penalty: float = 1.0
    repetition_penalty: float = 1.0
    num_return_sequences: int = 1
    od_labels_start_posid: int = 20


# ---------------------------------------------------------------------------
# context build + prefill
# ---------------------------------------------------------------------------

def _tag_embeddings(params: Params, pred_topk: jnp.ndarray, cfg: ModelConfig
                    ) -> jnp.ndarray:
    """Concept-token embeddings injected into the od/tag slots.

    tag_attach='raw': train-branch semantics — plain tied-weight lookup, no
    pos/type/LN (reference modeling_bert.py:1437-1470).
    tag_attach='embedded': infer-branch semantics — lookup + position ids
    starting at the hard-coded caption_len=20 + type-0 + LayerNorm
    (encode_tag_to_embedding modeling_bert.py:1381-1406).
    """
    w = M.word_embedding_weight(params)
    emb = w[pred_topk]
    if cfg.tag_attach == "embedded":
        p = params["embeddings"]
        topk = pred_topk.shape[1]
        pos = jnp.arange(topk) + cfg.tag_pos_offset
        emb = (emb + p["position_embeddings"][pos][None]
               + p["token_type_embeddings"][0][None, None])
        emb = layer_norm(p["LayerNorm"], emb.astype(cfg.compute_dtype),
                         cfg.bert_layer_norm_eps)
    return emb.astype(cfg.compute_dtype)


def build_context_embeddings(params: Params, images: jnp.ndarray,
                             od_ids: jnp.ndarray,
                             od_token_type_ids: Optional[jnp.ndarray],
                             seq_len: jnp.ndarray, cfg: ModelConfig,
                             opts: DecodeOptions,
                             visual_token_idx: Optional[jnp.ndarray] = None,
                             inference: bool = True) -> Dict[str, Any]:
    """Vision + tag selection + pre-decoder context embeddings
    [od/tag slots, tagCLS, visual] and their validity mask.

    inference=False keeps the XLA attention path (gradients flow through
    this in SCST scoring; the Pallas kernel's recompute backward is
    slower).

    od_ids: (B, od_len) od-label token ids (tail slots are overwritten by
      predicted concept embeddings, like the reference).
    od_token_type_ids: (B, od_len) or None (defaults to 1, the tensorizer's
      text_b segment id).
    seq_len: (B,) total valid text length (max_seq_a + n_valid_od) governing
      which od slots are attendable (tensorizer mask semantics).
    """
    B, od_len = od_ids.shape
    dtype = cfg.compute_dtype
    import contextlib
    from ..ops import inference_mode
    guard = inference_mode() if inference else contextlib.nullcontext()
    with guard:                            # trace-time: Pallas attn on TPU
        enc = M.encode_images(params, images, cfg, visual_token_idx)

    # od/tag text slots: positions start at max(od_labels_start_posid,
    # max_length) (reference generate :958)
    pos0 = max(opts.od_labels_start_posid, opts.max_length)
    pos = jnp.broadcast_to(jnp.arange(od_len)[None] + pos0, (B, od_len))
    if od_token_type_ids is None:
        od_token_type_ids = jnp.ones_like(od_ids)
    from .layers import bert_embeddings
    od_emb = bert_embeddings(params["embeddings"], od_ids, pos,
                             od_token_type_ids, cfg.bert_layer_norm_eps,
                             dtype=dtype)
    topk = cfg.topk
    # The flagship recipe satisfies this: the live YAML
    # (ViTCAP_Captioning_…multiplier_0.1.yaml:43-44) sets
    # max_seq_length=70 / max_seq_a_length=20, so od_len = 50 = topk.
    # With the PIPELINE-DEFAULT seq_a=40 (od_len=30 < topk=50) the
    # reference itself crashes at decode time — its tail overwrite
    # `embedding_output[:, -topk:] = tag_embedding`
    # (modeling_bert.py:1470/1489) assigns a 50-wide tensor into the
    # 30-wide od region — so we refuse the geometry up front instead.
    assert topk <= od_len, (
        f"topk={topk} concept slots must fit in the od region "
        f"(od_len={od_len} = max_seq_length - max_seq_a_length); the live "
        f"recipe uses 70-20=50")
    tag_emb = _tag_embeddings(params, enc["pred_topk"], cfg)
    od_emb = od_emb.at[:, -topk:].set(tag_emb)

    ctx = jnp.concatenate(
        [od_emb, enc["tag_cls"].astype(dtype), enc["visual"].astype(dtype)],
        axis=1)                                     # (B, S_ctx, H)
    S_ctx = ctx.shape[1]

    # validity of od slots against caption-region queries AND od-region
    # queries; tagCLS+visual always attendable
    od_j = jnp.arange(od_len)[None] + opts.max_length  # position in text space
    od_valid = (od_j < seq_len[:, None])               # (B, od_len)
    ctx_valid = jnp.concatenate(
        [od_valid, jnp.ones((B, S_ctx - od_len), bool)], axis=1)  # (B, S_ctx)
    return {"ctx": ctx, "ctx_valid": ctx_valid, "od_len": od_len,
            "tag_logits": enc["tag_logits"], "pred_topk": enc["pred_topk"]}


def build_decode_context(params: Params, images: jnp.ndarray,
                         od_ids: jnp.ndarray,
                         od_token_type_ids: Optional[jnp.ndarray],
                         seq_len: jnp.ndarray, cfg: ModelConfig,
                         opts: DecodeOptions,
                         visual_token_idx: Optional[jnp.ndarray] = None,
                         layout: Optional[str] = None) -> Dict[str, Any]:
    """build_context_embeddings + decoder-layer K/V prefill over the static
    context (valid because context tokens never attend caption tokens).

    layout=None: auto (`_pick_layout(cfg)` — 'heads' unless the fused
    engine is requested).
    layout='heads': per-layer (B, nH, S, hd) lists for the XLA scan body.
    layout='flat': packed (nL, B, Sp, H) arrays + additive context bias for
    the fused Pallas decode-step kernel (ops/decode_step.py).

    A third 'proj' layout (merged projection minor, no head transpose) was
    measured a wash at B=64 (round 3, benchmarks/ablate_cache_layout.py)
    and deleted per the measured-loser policy (see ops/decode_step.py's
    sibling precedent)."""
    if layout is None:
        layout = _pick_layout(cfg)
    ce = build_context_embeddings(params, images, od_ids, od_token_type_ids,
                                  seq_len, cfg, opts, visual_token_idx)
    ctx, ctx_valid, od_len = ce["ctx"], ce["ctx_valid"], ce["od_len"]
    B, S_ctx, _ = ctx.shape

    # prefill mask: od rows attend valid od + tagCLS+visual; tagCLS/visual
    # rows attend only tagCLS+visual (reference mask: visual never sees text)
    is_od_row = jnp.arange(S_ctx) < od_len            # (S_ctx,)
    allow = jnp.where(
        is_od_row[None, :, None],
        ctx_valid[:, None, :],                                 # od rows
        (~is_od_row)[None, None, :] & jnp.ones((B, 1, 1), bool))
    bias = jnp.where(allow, 0.0, NEG_MASK_VALUE)[:, None]  # (B,1,S,S)

    nH = cfg.num_attention_heads
    hd = cfg.hidden_size // nH

    def to_heads(a):
        return a.reshape(B, S_ctx, nH, hd).transpose(0, 2, 1, 3)

    ctx_k: List[jnp.ndarray] = []
    ctx_v: List[jnp.ndarray] = []
    x = ctx
    from ..ops import attention_backend, inference_mode
    with inference_mode():
        # pad the token axis to the kernel pad length ONCE around the
        # prefill when the fused kernel runs: per-layer pad/unpad of x AND
        # the (B,1,S,S) f32 bias costs ~0.2 ms each.  Padded KEY columns
        # get the reference's -10000 mask; padded query rows are garbage
        # and never read (caches slice back to S).
        from ..ops.fused_block import pad_len
        pad = (pad_len(S_ctx) - S_ctx) \
            if attention_backend() != "xla" else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, 0)))
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad)),
                           constant_values=NEG_MASK_VALUE)
        layers = params["decoder"]["layer"]
        for li, layer in enumerate(layers):
            ps = layer["attention"]["self"]
            k = dense(ps["key"], x)[:, :S_ctx]
            v = dense(ps["value"], x)[:, :S_ctx]
            if layout == "heads":
                if cfg.kv_cache_quant == "int8":
                    # quantize FIRST in the projection layout (B,S,nH*hd),
                    # then transpose the int8: the head transpose then
                    # moves 1/2 the bytes, and absmax/round fuse into the
                    # projection output instead of re-reading a transposed
                    # bf16 buffer (measured ~8.7 ms/batch cheaper at B=64)
                    k = _quantize_cache_proj(k, nH, hd)
                    v = _quantize_cache_proj(v, nH, hd)
                else:
                    # head layout so the XLA scan body reads the caches
                    # directly (no per-step transpose inside the scan)
                    k, v = to_heads(k), to_heads(v)
            ctx_k.append(k)
            ctx_v.append(v)
            if li + 1 < len(layers):
                # the LAST layer's block output feeds nothing — only its
                # k/v projections above are consumed (the decode scan
                # reads caches, never prefill hidden states); skipping the
                # body saves one full BERT block over (B, S_ctx, H)
                # (~5 ms at B=64), bit-exact
                x = _bert_layer_full(layer, x, bias, cfg)
    # the ctx dict must stay jit-returnable (arrays only): flat layout is
    # signalled by the presence of 'ctx_bias', not a string field
    out = {
        "ctx_valid": ctx_valid,            # (B, S_ctx)
        "tag_logits": ce["tag_logits"],
        "pred_topk": ce["pred_topk"],
    }
    if layout == "flat":
        from ..ops.decode_step import pack_decode_context
        kp, vp, cbias = pack_decode_context(ctx_k, ctx_v, ctx_valid)
        out.update(ctx_k=kp, ctx_v=vp, ctx_bias=cbias)
    else:
        out.update(ctx_k=ctx_k, ctx_v=ctx_v)
    return out


def _quantize_cache(a: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-(image, head) absmax int8 quantization of a (B, nH, S, hd)
    cache (cfg.kv_cache_quant='int8', opt-in — the caches dominate the
    decode scan's HBM traffic)."""
    absmax = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=(2, 3),
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0          # (B, nH, 1, 1)
    q8 = jnp.clip(jnp.round(a.astype(jnp.float32) / scale),
                  -127, 127).astype(jnp.int8)
    return {"q8": q8, "scale": scale}


def _quantize_cache_proj(a: jnp.ndarray, nH: int, hd: int
                         ) -> Dict[str, jnp.ndarray]:
    """Per-(image, head) absmax int8 quantization of a (B, S, nH*hd)
    PROJECTION-layout tensor, returning the head-layout (B, nH, S, hd)
    cache dict of `_quantize_cache`.  Quantizing before the head transpose
    halves the transpose bytes and lets the round/clip fuse into the
    projection epilogue."""
    B, S, _ = a.shape
    a4 = a.reshape(B, S, nH, hd)
    absmax = jnp.max(jnp.abs(a4.astype(jnp.float32)), axis=(1, 3))  # (B,nH)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(a4.astype(jnp.float32)
                            / scale[:, None, :, None]),
                  -127, 127).astype(jnp.int8)
    return {"q8": q8.transpose(0, 2, 1, 3),
            "scale": scale[:, :, None, None]}


def _quantize_rows(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row absmax int8 quantization over the last axis (for the q and
    prob operands of native-int8 MXU dots)."""
    absmax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
    return q8, scale


def _ctx_layout(ctx: Dict[str, Any]) -> str:
    return "flat" if "ctx_bias" in ctx else "heads"


def _ctx_batch(ctx: Dict[str, Any]) -> int:
    if _ctx_layout(ctx) == "flat":
        return ctx["ctx_k"].shape[1]
    k0 = ctx["ctx_k"][0]
    return (k0["q8"] if isinstance(k0, dict) else k0).shape[0]


def _bert_layer_full(layer: Params, x: jnp.ndarray, bias: jnp.ndarray,
                     cfg: ModelConfig) -> jnp.ndarray:
    from .layers import bert_layer
    return bert_layer(layer, x, bias, cfg.num_attention_heads,
                      cfg.bert_layer_norm_eps,
                      scores_dtype=cfg.attention_scores_dtype)


def _decode_params_cast(params: Params, cfg: ModelConfig) -> Params:
    """Pre-cast the weights the scan body touches (decoder layers, LM head,
    word embeddings) to the compute dtype ONCE, outside the scan: XLA does
    not hoist the per-use f32->bf16 casts out of the loop, so without this
    every step re-reads f32 weights from HBM (measured 0.77 -> 0.64 ms/step
    at B=32).  Values are identical — dense() casts per use anyway."""
    dtype = cfg.compute_dtype
    if dtype == jnp.float32:
        return params

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 and a.ndim >= 2
            else a, tree)
    out = dict(params)
    out["decoder"] = cast(params["decoder"])
    # pre-merge q/k/v into one (H, 3H) matmul per layer for the scan body
    # (3 small matmuls + bias adds -> 1 per layer per step)
    layers = []
    for layer in out["decoder"]["layer"]:
        ps = layer["attention"]["self"]
        packed = {
            "kernel": jnp.concatenate(
                [ps["query"]["kernel"], ps["key"]["kernel"],
                 ps["value"]["kernel"]], axis=1),
            "bias": jnp.concatenate(
                [ps["query"]["bias"], ps["key"]["bias"],
                 ps["value"]["bias"]]),
        }
        new_self = dict(ps)
        new_self["qkv_packed"] = packed
        new_attn = dict(layer["attention"])
        new_attn["self"] = new_self
        new_layer = dict(layer)
        new_layer["attention"] = new_attn
        layers.append(new_layer)
    out["decoder"] = dict(out["decoder"])
    out["decoder"]["layer"] = layers
    out["cls"] = cast(params["cls"])
    emb = dict(params["embeddings"])
    emb["word_embeddings"] = params["embeddings"]["word_embeddings"] \
        .astype(dtype)
    out["embeddings"] = emb
    return out


# ---------------------------------------------------------------------------
# cached decode step
# ---------------------------------------------------------------------------

def _decode_attention(ps: Params, x_win: jnp.ndarray,
                      cap_k: jnp.ndarray, cap_v: jnp.ndarray,
                      ctx_k: jnp.ndarray, ctx_v: jnp.ndarray,
                      ctx_valid: jnp.ndarray, t: jnp.ndarray,
                      num_heads: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Window [prev@t-1, MASK@t] attention against (caption cache + self +
    shared context cache).  cap_* are per-beam (Bb, h, A, d); ctx_*
    per-image (B, h, S, d), both pre-transposed head layout so the scan
    body reads every cache byte exactly once.  Returns (out, cap_k, cap_v).
    """
    Bb, W, H = x_win.shape
    quant = isinstance(ctx_k, dict)           # int8 cache (kv_cache_quant)
    k_arr = ctx_k["q8"] if quant else ctx_k
    B = k_arr.shape[0]
    nb = Bb // B
    hd = H // num_heads
    A = cap_k.shape[2]
    S = k_arr.shape[2]

    if "qkv_packed" in ps:       # merged projection (decode_params_cast)
        q, k_win, v_win = jnp.split(dense(ps["qkv_packed"], x_win), 3,
                                    axis=-1)
    else:
        q = dense(ps["query"], x_win)
        k_win = dense(ps["key"], x_win)
        v_win = dense(ps["value"], x_win)

    def heads(a, L):
        return a.reshape(a.shape[0], L, num_heads, hd).transpose(0, 2, 1, 3)

    kh_win = heads(k_win, W)                           # (Bb,h,W,d)
    vh_win = heads(v_win, W)
    cap_k = jax.lax.dynamic_update_slice_in_dim(
        cap_k, kh_win[:, :, :1], t - 1, axis=2)  # write prev slot
    cap_v = jax.lax.dynamic_update_slice_in_dim(
        cap_v, vh_win[:, :, :1], t - 1, axis=2)

    qh = heads(q, W)                                   # (Bb,h,W,d)
    s_cap = jnp.einsum("bhqd,bhkd->bhqk", qh, cap_k,
                       preferred_element_type=jnp.float32)
    s_self = jnp.einsum("bhqd,bhd->bhq", qh, kh_win[:, :, 1],
                        preferred_element_type=jnp.float32)[..., None]
    q4 = qh.reshape(B, nb, num_heads, W, hd)
    if quant:
        # native int8 MXU dot: quantize q per row, rescale the int32 result
        q8, q_scale = _quantize_rows(q4.astype(jnp.float32))
        s32 = jnp.einsum("bnhqd,bhkd->bnhqk", q8, ctx_k["q8"],
                         preferred_element_type=jnp.int32)
        s_ctx = s32.astype(jnp.float32) * q_scale \
            * ctx_k["scale"][:, None, :, :, 0:1]
    else:
        s_ctx = jnp.einsum("bnhqd,bhkd->bnhqk", q4, ctx_k,
                           preferred_element_type=jnp.float32)
    s_ctx = s_ctx.reshape(Bb, num_heads, W, S)

    scale = hd ** -0.5
    # masks: both rows attend cap slots <= t-1; only the MASK row attends
    # its own K/V; context per od validity
    cap_allow = (jnp.arange(A)[None, None, None] <= (t - 1))  # (1,1,1,A)
    s_cap = jnp.where(cap_allow, s_cap * scale, NEG_MASK_VALUE)
    self_allow = jnp.array([False, True])[None, None, :, None]
    s_self = jnp.where(self_allow, s_self * scale, NEG_MASK_VALUE)
    ctx_allow = jnp.repeat(ctx_valid, nb, axis=0)[:, None, None, :]
    s_ctx = jnp.where(ctx_allow, s_ctx * scale, NEG_MASK_VALUE)

    # split-block softmax with the 1/l normalize folded into the (tiny)
    # attention outputs: softmax-then-divide materialized an extra f32
    # divide+convert pass over the (Bb, nh, W, S) prob tensor every layer
    # (~19 us/layer at B=64 on v5e); e/l applied per output row instead is
    # the same math (modeling_bert.py:139-176 softmax semantics preserved)
    m = jnp.maximum(jnp.max(s_ctx, -1, keepdims=True),
                    jnp.maximum(jnp.max(s_cap, -1, keepdims=True),
                                jnp.max(s_self, -1, keepdims=True)))
    e_cap = jnp.exp(s_cap - m)
    e_self = jnp.exp(s_self - m)                       # (Bb,nh,W,1) f32
    e_ctx = jnp.exp(s_ctx - m)
    l = (jnp.sum(e_cap, -1, keepdims=True) + e_self
         + jnp.sum(e_ctx, -1, keepdims=True))
    inv = 1.0 / l                                      # (Bb,nh,W,1) f32

    out = jnp.einsum("bhqk,bhkd->bhqd", e_cap.astype(x_win.dtype), cap_v,
                     preferred_element_type=jnp.float32)
    out += e_self * vh_win[:, :, 1:2].astype(jnp.float32)
    e_ctx5 = e_ctx.reshape(B, nb, num_heads, W, S)
    if quant:
        # per-row absmax of e equals that of p (= e/l, a per-row scalar),
        # so the int8 bits match the old quantize-probs path exactly
        p8, p_scale = _quantize_rows(e_ctx5)
        o32 = jnp.einsum("bnhqk,bhkd->bnhqd", p8, ctx_v["q8"],
                         preferred_element_type=jnp.int32)
        o_ctx = (o32.astype(jnp.float32) * p_scale
                 * ctx_v["scale"][:, None, :, :, 0:1])
    else:
        o_ctx = jnp.einsum("bnhqk,bhkd->bnhqd",
                           e_ctx5.astype(x_win.dtype), ctx_v,
                           preferred_element_type=jnp.float32)
    out += o_ctx.reshape(Bb, num_heads, W, hd)
    out = (out * inv).astype(x_win.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(Bb, W, H)
    return out, cap_k, cap_v


def _decode_layer(layer: Params, x_win: jnp.ndarray, cap_k, cap_v,
                  ctx_k, ctx_v, ctx_valid, t, cfg: ModelConfig):
    from .layers import gelu
    attn, cap_k, cap_v = _decode_attention(
        layer["attention"]["self"], x_win, cap_k, cap_v, ctx_k, ctx_v,
        ctx_valid, t, cfg.num_attention_heads)
    attn = dense(layer["attention"]["output"]["dense"], attn)
    x = layer_norm(layer["attention"]["output"]["LayerNorm"], attn + x_win,
                   cfg.bert_layer_norm_eps)
    inter = gelu(dense(layer["intermediate"]["dense"], x))
    out = dense(layer["output"]["dense"], inter)
    x = layer_norm(layer["output"]["LayerNorm"], out + x,
                   cfg.bert_layer_norm_eps)
    return x, cap_k, cap_v


def _window_embeddings(params: Params, prev_tok: jnp.ndarray,
                       t: jnp.ndarray, cfg: ModelConfig) -> jnp.ndarray:
    """Embeddings for [prev@t-1, MASK@t]; caption slots are segment 0
    positions t-1, t."""
    p = params["embeddings"]
    ids = jnp.stack([prev_tok,
                     jnp.full_like(prev_tok, cfg.mask_token_id)], axis=1)
    pos = jnp.stack([jnp.full_like(prev_tok, 0) + t - 1,
                     jnp.full_like(prev_tok, 0) + t], axis=1)
    emb = (p["word_embeddings"][ids]
           + p["position_embeddings"][pos]
           + p["token_type_embeddings"][jnp.zeros_like(ids)])
    return layer_norm(p["LayerNorm"], emb.astype(cfg.compute_dtype),
                      cfg.bert_layer_norm_eps)


def decode_step(params: Params, cap_k: List[jnp.ndarray],
                cap_v: List[jnp.ndarray], ctx: Dict[str, Any],
                prev_tok: jnp.ndarray, t: jnp.ndarray, cfg: ModelConfig
                ) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """One MASK-probe step: returns (logits (Bb,V), new caches)."""
    x = _window_embeddings(params, prev_tok, t, cfg)
    n_k, n_v = [], []
    for li, layer in enumerate(params["decoder"]["layer"]):
        x, k, v = _decode_layer(layer, x, cap_k[li], cap_v[li],
                                ctx["ctx_k"][li], ctx["ctx_v"][li],
                                ctx["ctx_valid"], t, cfg)
        n_k.append(k)
        n_v.append(v)
    logits = M.caption_logits(params, x[:, 1], cfg)
    return logits.astype(jnp.float32), n_k, n_v


def _init_caps(B: int, n_layers: int, A: int, H: int, dtype,
               num_heads: int
               ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    hd = H // num_heads
    z = [jnp.zeros((B, num_heads, A, hd), dtype) for _ in range(n_layers)]
    return z, [jnp.zeros((B, num_heads, A, hd), dtype)
               for _ in range(n_layers)]


def _pick_layout(cfg: ModelConfig) -> str:
    """Cache layout for the decode engine.  Default 'heads'.  int8 caches
    keep the head layout (the int8 transpose moves half the bytes and the
    in-scan int8 einsum prefers it); the int8 config knob wins over the
    VITCAP_DECODE_FUSED env opt-in (with a warning) rather than being
    silently dropped.

    Deleted knobs (round 4, measured-loser policy): VITCAP_CTX_LAYOUT=proj
    (wash at B=64) and VITCAP_DECODE_UNROLL (-1%)."""
    if _use_fused_decode():
        if cfg.kv_cache_quant != "none":
            import logging
            logging.warning(
                "kv_cache_quant=%s is unsupported by the fused decode "
                "engine; using the XLA scan engine with quantized caches",
                cfg.kv_cache_quant)
            return "heads"
        return "flat"
    return "heads"


def _use_fused_decode() -> bool:
    """Opt-in routing of the decode scan through the one-kernel-per-step
    Pallas engine (ops/decode_step.py): VITCAP_DECODE_FUSED=1 (TPU) or
    =interpret (CPU tests).  Not the default: at B=32 the XLA scan body
    measures 0.83 ms/step vs the kernel's 1.07 — Mosaic's generic matmul
    lowering cannot pipeline the 2-row window dots the way XLA's batched
    emitter does.  Kept as an experimental backend (exact-parity tested);
    worth revisiting if Mosaic grows a batched small-matmul path."""
    import os
    return os.environ.get("VITCAP_DECODE_FUSED", "0").lower() in (
        "1", "interpret")


def _decode_engine(params: Params, ctx: Dict[str, Any], cfg: ModelConfig,
                   opts: DecodeOptions, Bb: int):
    """(init, step, reorder) closures over either cache format.

    step(caches, prev, t) -> (logits f32 (Bb,V), caches); reorder gathers
    per-beam caption caches by flat row index."""
    A = opts.max_length
    H = cfg.hidden_size
    nL = cfg.decoder_layers

    if _ctx_layout(ctx) == "flat":
        import os
        interpret = os.environ.get("VITCAP_DECODE_FUSED", "") == "interpret"
        from ..ops.decode_step import fused_decode_step, pack_decode_layers
        packed = pack_decode_layers(params, cfg.compute_dtype)

        def init():
            z = jnp.zeros((nL, Bb, A, H), cfg.compute_dtype)
            return (z, jnp.zeros_like(z))

        def step(caches, prev, t):
            cap_k, cap_v = caches
            x = _window_embeddings(params, prev, t, cfg)
            x, cap_k, cap_v = fused_decode_step(
                packed, ctx["ctx_k"], ctx["ctx_v"], ctx["ctx_bias"],
                cap_k, cap_v, x, t, num_heads=cfg.num_attention_heads,
                eps=cfg.bert_layer_norm_eps, interpret=interpret)
            logits = M.caption_logits(params, x[:, 1], cfg)
            return logits.astype(jnp.float32), (cap_k, cap_v)

        def reorder(caches, flat_idx):
            cap_k, cap_v = caches
            return cap_k[:, flat_idx], cap_v[:, flat_idx]

        return init, step, reorder

    def init():
        return _init_caps(Bb, nL, A, H, cfg.compute_dtype,
                          cfg.num_attention_heads)

    def step(caches, prev, t):
        cap_k, cap_v = caches
        logits, cap_k, cap_v = decode_step(params, cap_k, cap_v, ctx, prev,
                                           t, cfg)
        return logits, (cap_k, cap_v)

    def reorder(caches, flat_idx):
        cap_k, cap_v = caches
        return ([k[flat_idx] for k in cap_k], [v[flat_idx] for v in cap_v])

    return init, step, reorder


def exact_top_k(x: jnp.ndarray, k: int, chunk: int = 512
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis, two-stage: chunk-max reduction, then
    k rounds of (argmax over C chunk-maxes -> argmax inside that one
    chunk -> mask element).  Matches lax.top_k exactly (desc values,
    ties broken toward smaller indices) but touches the full array once
    instead of sorting it: lax.top_k over the beam search's (B, nb*V~91k)
    candidate row measures 1.28 ms/step on v5e; this runs at the reduce's
    bandwidth.

    Precondition: every row must contain >= k FINITE values.  Selected
    elements are masked by writing -inf, so a row whose top-k reaches
    into pre-existing -inf entries returns duplicate indices where
    lax.top_k would return distinct ascending ones.  All in-repo callers
    mask with finite sentinels (-1e9/-1e20) and satisfy this."""
    B, N = x.shape
    C = (N + chunk - 1) // chunk
    pad = C * chunk - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    xc = x.reshape(B, C, chunk)
    cmax = jnp.max(xc, axis=-1)                       # (B, C)
    bidx = jnp.arange(B)
    vals, idxs = [], []
    for _ in range(k):
        c = jnp.argmax(cmax, axis=-1)                 # (B,) first-max chunk
        row = xc[bidx, c]                             # (B, chunk)
        w = jnp.argmax(row, axis=-1)
        vals.append(row[bidx, w])
        idxs.append(c * chunk + w)
        row = row.at[bidx, w].set(-jnp.inf)
        xc = xc.at[bidx, c].set(row)
        cmax = cmax.at[bidx, c].set(jnp.max(row, axis=-1))
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def apply_repetition_penalty(logits: jnp.ndarray, seen: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """CTRL-style repetition penalty (reference modeling_utils.py:797-807
    no-beam, :918-926 beam): for every vocab id already present in the
    row's input_ids, divide positive logits by `penalty` and multiply
    negative ones.  `seen` is the (B, V) bool membership mask of
    generated-so-far ids (incl. BOS, and PAD once a row finishes —
    exactly the reference's `set(input_ids[i].tolist())`)."""
    pen = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, pen, logits)


def _seen_init(Bb: int, V: int, first_token: int) -> jnp.ndarray:
    return jnp.zeros((Bb, V), bool).at[:, first_token].set(True)


def _seen_add(seen: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    return seen.at[jnp.arange(seen.shape[0]), tok].set(True)


# ---------------------------------------------------------------------------
# sampling filter (reference modeling_utils.py:1103-1136)
# ---------------------------------------------------------------------------

def top_k_top_p_filtering(logits: jnp.ndarray, top_k: int = 0,
                          top_p: float = 1.0,
                          min_tokens_to_keep: int = 1) -> jnp.ndarray:
    V = logits.shape[-1]
    if top_k > 0:
        k = max(top_k, min_tokens_to_keep)
        kth = jnp.sort(logits, axis=-1)[..., V - k][..., None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        remove = remove.at[..., :min_tokens_to_keep].set(False)
        scatter = jnp.zeros_like(remove).at[
            jnp.arange(remove.shape[0])[:, None], sort_idx].set(remove)
        logits = jnp.where(scatter, NEG_INF, logits)
    return logits


# ---------------------------------------------------------------------------
# greedy / sampling (no beam)
# ---------------------------------------------------------------------------

def generate_greedy(params: Params, images: jnp.ndarray, od_ids: jnp.ndarray,
                    od_token_type_ids: Optional[jnp.ndarray],
                    seq_len: jnp.ndarray, cfg: ModelConfig,
                    opts: DecodeOptions,
                    rng: Optional[jax.Array] = None,
                    ctx: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, jnp.ndarray]:
    """No-beam decode (greedy or sampling), reference
    modeling_utils.py:768-886.  Returns ids (B[,nrs],1,max_length),
    logprobs, and per-step token logprobs (for SCST)."""
    A = opts.max_length
    nrs = opts.num_return_sequences
    if ctx is None:
        ctx = build_decode_context(params, images, od_ids, od_token_type_ids,
                                   seq_len, cfg, opts,
                                   layout=_pick_layout(cfg))
    params = _decode_params_cast(params, cfg)   # once, outside the scan
    B = _ctx_batch(ctx)
    Bb = B * nrs
    init_caches, engine_step, _ = _decode_engine(params, ctx, cfg, opts, Bb)
    caches = init_caches()

    rep_pen = float(opts.repetition_penalty)
    tokens = jnp.full((Bb, A), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.cls_token_id)
    unfinished = jnp.ones((Bb,), jnp.float32)
    seen0 = (_seen_init(Bb, cfg.vocab_size, cfg.cls_token_id)
             if rep_pen != 1.0 else jnp.zeros((Bb, 1), bool))
    carry = (tokens, unfinished, jnp.zeros((Bb,)), jnp.zeros((Bb,)),
             caches, seen0,
             rng if rng is not None else jax.random.PRNGKey(0))

    def step(carry, t):
        tokens, unfin, sum_lp, cnt, caches, seen, r = carry
        prev = jnp.take_along_axis(tokens, (t - 1)[None, None].repeat(Bb, 0),
                                   axis=1)[:, 0]
        logits, caches = engine_step(caches, prev, t)
        if rep_pen != 1.0:
            logits = apply_repetition_penalty(logits, seen, rep_pen)
        if opts.do_sample:
            r, rs = jax.random.split(r)
            lg = logits / opts.temperature if opts.temperature != 1.0 \
                else logits
            lg = top_k_top_p_filtering(lg, opts.top_k, opts.top_p)
            nxt = jax.random.categorical(rs, lg, axis=-1)
        else:
            lg = logits
            nxt = jnp.argmax(logits, axis=-1)
        # log_softmax gathered at one index, without materializing the
        # (B, V) f32 log-prob array (3 extra HBM passes/step at V=30522);
        # same op order as log_softmax -> take_along_axis: (x-m) - lse
        m = jax.lax.stop_gradient(jnp.max(lg, axis=-1, keepdims=True))
        shifted = jnp.take_along_axis(lg, nxt[:, None], axis=1) - m
        lse = jnp.log(jnp.sum(jnp.exp(lg - m), axis=-1, keepdims=True))
        score = (shifted - lse)[:, 0]
        add = jnp.where(unfin > 0, nxt, cfg.pad_token_id).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, add[:, None], t, axis=1)
        sum_lp = sum_lp + score * unfin
        cnt = cnt + unfin
        unfin = unfin * (add != cfg.sep_token_id).astype(jnp.float32)
        if rep_pen != 1.0:
            seen = _seen_add(seen, add)
        return (tokens, unfin, sum_lp, cnt, caches, seen, r), (score, nxt)

    (tokens, unfin, sum_lp, cnt, *_), (step_scores, raw_tokens) = \
        jax.lax.scan(step, carry, jnp.arange(1, A))
    # force EOS on unfinished at max length (reference :884-886)
    tokens = tokens.at[:, A - 1].set(
        jnp.where(unfin > 0, cfg.sep_token_id, tokens[:, A - 1]))
    logprobs = sum_lp / jnp.maximum(cnt, 1.0)
    out_ids = tokens[:, None, :]               # (Bb, 1, A)
    out_lp = logprobs[:, None]
    if nrs > 1:
        out_ids = out_ids.reshape(B, nrs, A)
        out_lp = out_lp.reshape(B, nrs)
    return {"ids": out_ids, "logprobs": out_lp,
            "step_scores": step_scores.T,      # (Bb, A-1)
            # per-step argmax/sampled token BEFORE pad-masking / the forced
            # final EOS — the token whose logprob the loop recorded (needed
            # for exact SCST gradient parity)
            "raw_tokens": raw_tokens.T.astype(jnp.int32),   # (Bb, A-1)
            "tag_logits": ctx["tag_logits"], "pred_topk": ctx["pred_topk"]}


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def sample_beam_candidates(logits: jnp.ndarray, beam_scores: jnp.ndarray,
                           rng: jax.Array, nb: int, opts: DecodeOptions
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sampled-beam candidate draw (reference modeling_utils.py:948-966).

    Per beam row: temperature + top-k/top-p filter (min_tokens_to_keep=2),
    then TOPN_PER_BEAM=2 words drawn WITHOUT replacement
    (torch.multinomial -> Gumbel-top-2 here: identical distribution,
    different RNG stream); candidate score = that beam's filtered
    log-softmax at the word + its beam score.

    Returns (cand_score, cand_idx) of shape (B, 2*nb).  cand_idx encodes
    `word + V*beam` EXACTLY like the reference, i.e. with its scrambled
    attribution: words are laid out interleaved [b0d0,b0d1,b1d0,..] but
    the added beam offsets are TILED [0,V,..,(nb-1)V,0,V,..]
    (modeling_utils.py:959-963), so for nb>1 candidate j extends beam
    (j%nb)'s prefix while carrying beam (j//2)'s score.  Replicated
    bit-for-bit because it is the reference's observable behavior."""
    Bb, V = logits.shape
    B = Bb // nb
    lg = logits / opts.temperature if opts.temperature != 1.0 else logits
    lg = top_k_top_p_filtering(lg, opts.top_k, opts.top_p,
                               min_tokens_to_keep=2)           # (Bb, V)
    pert = lg + jax.random.gumbel(rng, lg.shape, jnp.float32)
    _, draws = jax.lax.top_k(pert, 2)                          # (Bb, 2)
    step_lp = jax.nn.log_softmax(lg, axis=-1)
    dscore = jnp.take_along_axis(step_lp, draws, axis=1) \
        + beam_scores.reshape(Bb)[:, None]                     # (Bb, 2)
    words = draws.reshape(B, 2 * nb)
    offs = jnp.tile(jnp.arange(nb, dtype=words.dtype) * V, 2)[None]
    return dscore.reshape(B, 2 * nb), words + offs

def generate_beam(params: Params, images: jnp.ndarray, od_ids: jnp.ndarray,
                  od_token_type_ids: Optional[jnp.ndarray],
                  seq_len: jnp.ndarray, cfg: ModelConfig,
                  opts: DecodeOptions,
                  rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Beam search with exact reference semantics
    (modeling_utils.py:888-1101): TOPN_PER_BEAM=2 candidates per beam; EOS
    candidates (and, at the final step, ALL candidates) go to a
    num_keep_best-sized hypothesis store scored sum_logprob/len^penalty;
    done batches freeze.

    do_sample=True follows the reference's sampled-beam branch
    (:948-966): per-beam temperature + top-k/top-p filter
    (min_tokens_to_keep=2), then 2 words drawn per beam WITHOUT
    replacement (torch.multinomial -> Gumbel-top-2 here, same
    distribution, different RNG stream).  NOTE the reference then
    attributes candidates to beams with a TILED offset vector
    ([0,V,..,(nb-1)V] repeated) while the drawn words are laid out
    INTERLEAVED ([b0d0,b0d1,b1d0,...]): for nb>1 a word drawn from beam
    i's distribution extends beam (j%nb)'s prefix (j = its slot) while
    keeping beam i's score.  We replicate that scramble bit-for-bit —
    it is the observable behavior — rather than "fixing" it."""
    A = opts.max_length
    nb = opts.num_beams
    K = opts.num_keep_best
    lp_pow = opts.length_penalty
    ctx = build_decode_context(params, images, od_ids, od_token_type_ids,
                               seq_len, cfg, opts, layout=_pick_layout(cfg))
    params = _decode_params_cast(params, cfg)   # once, outside the scan
    B = _ctx_batch(ctx)
    Bb = B * nb
    init_caches, engine_step, reorder_caches = _decode_engine(
        params, ctx, cfg, opts, Bb)
    caches = init_caches()

    rep_pen = float(opts.repetition_penalty)
    tokens = jnp.full((B, nb, A), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.cls_token_id)
    beam_scores = jnp.full((B, nb), NEG_INF).at[:, 0].set(0.0)
    # hypothesis store
    hyp_scores = jnp.full((B, K), jnp.float32(NEG_INF))
    hyp_tokens = jnp.full((B, K, A), cfg.pad_token_id, jnp.int32)
    hyp_len = jnp.zeros((B, K), jnp.int32)
    hyp_n = jnp.zeros((B,), jnp.int32)
    done = jnp.zeros((B,), bool)

    def add_hyps(cand_score, cand_tokens, cand_len, cand_take, store):
        """Insert candidates (given in desc score order) where cand_take.

        The reference inserts sequentially, replacing the current worst
        when full (BeamHypotheses.add).  With strictly-descending
        candidates that is replacement selection, i.e. the K best of
        (store ∪ taken candidates) — computed here as one stable sort of
        the K+2nb-wide union (existing entries win exact ties, matching
        the reference's strict `>` replacement test) instead of 2nb
        sequential scatter rounds per step."""
        hs, ht, hl, hn = store
        # NB: sequential insert-replace (a K-min replacement selection)
        # yields the K best of the union regardless of candidate order,
        # so this also covers the UNSORTED candidates of the sampling
        # branch; the stable sort keeps the reference's tie rules
        # (existing entries win ties via strict `>`; earlier candidates
        # win candidate-candidate ties).
        norm = cand_score / (cand_len.astype(jnp.float32) ** lp_pow)
        norm = jnp.where(cand_take, norm, NEG_INF)
        all_s = jnp.concatenate([hs, norm], axis=1)        # (B, K+2nb)
        order = jnp.argsort(-all_s, axis=1, stable=True)[:, :K]
        hs = jnp.take_along_axis(all_s, order, axis=1)
        hl = jnp.take_along_axis(
            jnp.concatenate([hl, cand_len], axis=1), order, axis=1)
        ht = jnp.take_along_axis(
            jnp.concatenate([ht, cand_tokens], axis=1), order[..., None],
            axis=1)
        hn = jnp.minimum(hn + jnp.sum(cand_take, axis=1), K)
        return hs, ht, hl, hn

    seen0 = (_seen_init(Bb, cfg.vocab_size, cfg.cls_token_id)
             if rep_pen != 1.0 else jnp.zeros((Bb, 1), bool))
    carry = (tokens, beam_scores, hyp_scores, hyp_tokens, hyp_len, hyp_n,
             done, caches, seen0,
             rng if rng is not None else jax.random.PRNGKey(0))

    def step(carry, t):
        (tokens, beam_scores, hs, ht, hl, hn, done, caches, seen, r) = carry
        prev = jax.lax.dynamic_index_in_dim(
            tokens, t - 1, axis=2, keepdims=False).reshape(Bb)
        logits, caches = engine_step(caches, prev, t)
        if rep_pen != 1.0:
            logits = apply_repetition_penalty(logits, seen, rep_pen)
        V = logits.shape[-1]
        n_cand = 2 * nb
        if opts.do_sample:
            r, rs = jax.random.split(r)
            cand_score, cand_idx = sample_beam_candidates(
                logits, beam_scores, rs, nb, opts)
        else:
            logp = jax.nn.log_softmax(logits, axis=-1)       # (Bb, V)
            total = logp.reshape(B, nb, V) + beam_scores[..., None]
            flat = total.reshape(B, nb * V)
            cand_score, cand_idx = exact_top_k(flat, n_cand)  # (B, 2nb) desc
        cand_beam = cand_idx // V
        cand_word = cand_idx % V

        # done check BEFORE this step's insertions (reference order); the
        # reference normalizes by (max_length - 1), not cur_len
        # (BeamHypotheses.is_done modeling_utils.py:1170-1181).  Greedy
        # candidates are sorted desc so max == [:,0]; sampled ones are
        # unsorted, hence the explicit max (reference takes .max()).
        best_possible = jnp.max(cand_score, axis=1) / (float(A - 1) ** lp_pow)
        done = done | ((hn >= K) & (best_possible <= jnp.min(hs, axis=-1)))

        is_eos = (cand_word == cfg.sep_token_id)
        final = (t == A - 1)
        goes_to_hyp = jnp.where(final, jnp.ones_like(is_eos), is_eos)
        # reference scans candidates in order and stops once nb non-EOS are
        # taken; EOS candidates before that cutoff get added to hyps
        non_eos_cum = jnp.cumsum((~goes_to_hyp).astype(jnp.int32), axis=1)
        before_cut = jnp.where(final, jnp.ones_like(is_eos),
                               (non_eos_cum - (~goes_to_hyp)) < nb)
        take_hyp = goes_to_hyp & before_cut & ~done[:, None]

        cand_tokens = jnp.take_along_axis(
            tokens, cand_beam[..., None], axis=1)        # (B, 2nb, A)
        cand_len = jnp.full((B, n_cand), t, jnp.int32)   # hyp len = cur_len
        hs, ht, hl, hn = add_hyps(cand_score, cand_tokens, cand_len,
                                  take_hyp, (hs, ht, hl, hn))

        # next beams: first nb non-hyp candidates (in order)
        keep = (~goes_to_hyp) & before_cut
        rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        order = jnp.argsort(jnp.where(keep, rank, n_cand + 1), axis=1,
                            stable=True)[:, :nb]         # indices of kept
        new_beam = jnp.take_along_axis(cand_beam, order, axis=1)
        new_word = jnp.take_along_axis(cand_word, order, axis=1)
        new_score = jnp.take_along_axis(cand_score, order, axis=1)
        n_kept = jnp.sum(keep, axis=1)

        # frozen rows for done batches (scores 0/pad like the reference)
        new_beam = jnp.where(done[:, None], 0, new_beam)
        new_word = jnp.where(done[:, None], cfg.pad_token_id, new_word)
        new_score = jnp.where(done[:, None], 0.0, new_score)
        # if fewer than nb kept (only possible at final step) pad
        pad_slot = jnp.arange(nb)[None] >= n_kept[:, None]
        new_word = jnp.where(pad_slot, cfg.pad_token_id, new_word)
        new_score = jnp.where(pad_slot, 0.0, new_score)
        new_beam = jnp.where(pad_slot, 0, new_beam)

        tokens = jnp.take_along_axis(tokens, new_beam[..., None], axis=1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, new_word[..., None].astype(jnp.int32), t, axis=2)
        beam_scores = new_score

        # reorder caption caches by beam (small: (Bb, A, H))
        flat_idx = (jnp.arange(B)[:, None] * nb + new_beam).reshape(Bb)
        caches = reorder_caches(caches, flat_idx)
        if rep_pen != 1.0:
            # membership masks follow their beam's prefix, then absorb
            # the appended word (reference reorders input_ids by beam_idx
            # and concatenates beam_words, :1050-1052)
            seen = _seen_add(seen[flat_idx], new_word.reshape(Bb))
        return (tokens, beam_scores, hs, ht, hl, hn, done, caches, seen,
                r), None

    carry, _ = jax.lax.scan(step, carry, jnp.arange(1, A),
                            )
    (_, _, hs, ht, hl, hn, _, _, _, _) = carry

    # final selection: top-K hyps by normalized score; append EOS
    order = jnp.argsort(-hs, axis=-1)[:, :K]
    sel_scores = jnp.take_along_axis(hs, order, axis=1)
    sel_tokens = jnp.take_along_axis(ht, order[..., None], axis=1)
    sel_len = jnp.take_along_axis(hl, order, axis=1)
    # blank out beyond len, write EOS at len
    posn = jnp.arange(A)[None, None]
    sel_tokens = jnp.where(posn < sel_len[..., None], sel_tokens,
                           cfg.pad_token_id)
    sel_tokens = jnp.where(posn == sel_len[..., None], cfg.sep_token_id,
                           sel_tokens)
    empty = jnp.arange(K)[None] >= hn[:, None]
    sel_scores = jnp.where(empty, -1e5, sel_scores)
    return {"ids": sel_tokens, "logprobs": sel_scores,
            "tag_logits": ctx["tag_logits"], "pred_topk": ctx["pred_topk"]}


def generate(params: Params, images: jnp.ndarray, od_ids: jnp.ndarray,
             od_token_type_ids: Optional[jnp.ndarray],
             seq_len: jnp.ndarray, cfg: ModelConfig, opts: DecodeOptions,
             rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Dispatch like the reference `generate` (modeling_bert.py:928-1059)."""
    if opts.num_beams > 1:
        return generate_beam(params, images, od_ids, od_token_type_ids,
                             seq_len, cfg, opts, rng)
    return generate_greedy(params, images, od_ids, od_token_type_ids,
                           seq_len, cfg, opts, rng)


def prod_generate(params: Params, image: jnp.ndarray, cfg: ModelConfig,
                  opts: Optional[DecodeOptions] = None,
                  od_ids: Optional[jnp.ndarray] = None
                  ) -> Dict[str, jnp.ndarray]:
    """Production single-image greedy decode (reference prod_generate
    modeling_bert.py:1075-1202).  The cached engine already IS the
    fast path, so this is the batch-1 greedy entry point; the reference's
    cache-free `prod_no_hidden_generate` (:1204-1304) recompute variant is
    subsumed (identical outputs, strictly slower)."""
    if opts is None:
        opts = DecodeOptions(max_length=cfg.max_gen_length,
                             od_labels_start_posid=cfg.max_seq_a_len)
    if image.ndim == 3:
        image = image[None]
    od_len = cfg.max_seq_len - cfg.max_seq_a_len
    if od_ids is None:
        od_ids = jnp.zeros((image.shape[0], od_len), jnp.int32)
    seq_len = jnp.full((image.shape[0],), cfg.max_seq_a_len, jnp.int32)
    return generate_greedy(params, image, od_ids, None, seq_len, cfg, opts)


prod_no_hidden_generate = prod_generate
