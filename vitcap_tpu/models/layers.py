"""Functional transformer primitives over explicit parameter pytrees.

Design: pure functions + nested-dict params (torch-state-dict-shaped for a
mechanical checkpoint bridge).  Dense kernels are stored (in, out); the
bridge transposes torch's (out, in).

Behavioral references (math only, re-implemented):
- ViT pre-norm block / attention: reference
  src/pytorch_image_models/timm/models/vision_transformer.py:161-250
- BERT post-norm layer / embeddings / pooler / LM head: reference
  src/layers/bert/modeling_bert.py:208-563
"""

from __future__ import annotations

import functools

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

NEG_MASK_VALUE = -10000.0  # reference uses (1-m)*-10000, not -inf; match exactly


# ---------------------------------------------------------------------------
# elementary ops
# ---------------------------------------------------------------------------

def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # params are stored f32; cast to the activation dtype so bf16 compute
    # actually runs the MXU in bf16 instead of silently promoting to f32
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    # normalize in f32 for stability regardless of compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # exact (erf) gelu, matching torch nn.GELU default
    return jax.nn.gelu(x, approximate=False)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def prune_dense(p: Params, index, dim: int) -> Params:
    """Keep only the `index` entries of a dense layer along `dim` — the
    functional equivalent of the reference `prune_linear_layer`
    (modeling_utils.py:1183-1196).  kernel is stored (in, out): dim=0 prunes
    OUTPUT features (bias pruned too, torch's Linear dim=0), dim=1 prunes
    INPUT features (bias kept)."""
    index = jnp.asarray(index)
    out = dict(p)
    if dim == 0:
        out["kernel"] = p["kernel"][:, index]
        if "bias" in p:
            out["bias"] = p["bias"][index]
    elif dim == 1:
        out["kernel"] = p["kernel"][index, :]
    else:
        raise ValueError(f"dim must be 0 or 1, got {dim}")
    return out


def prune_attention_heads(attn: Params, heads, num_heads: int,
                          head_dim: int) -> Params:
    """Remove whole attention heads from a BertSelfAttention param group
    {'query','key','value'} (+ sibling output dense handled by the caller
    via prune_dense(dim=1)).  Mirrors the reference's head-pruning use of
    prune_linear_layer.  Returns new params; caller must also shrink its
    num_heads bookkeeping."""
    heads = set(int(h) for h in heads)
    keep = [h for h in range(num_heads) if h not in heads]
    idx = jnp.concatenate([jnp.arange(h * head_dim, (h + 1) * head_dim)
                           for h in keep])
    return {name: (prune_dense(attn[name], idx, dim=0)
                   if name in ("query", "key", "value") else attn[name])
            for name in attn}


# ---------------------------------------------------------------------------
# multi-head attention core (shared by ViT and BERT paths)
# ---------------------------------------------------------------------------

def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
        bias: Optional[jnp.ndarray] = None,
        dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    """q:(B,Lq,H) k/v:(B,Lk,H) bias:(B,1|nh,Lq,Lk) additive -> (B,Lq,H).

    l_actual > 0: inputs are pre-padded on the token axis (16-aligned)
    with that many valid rows — only supported on the packed-kernel train
    path (the caller hoists padding outside its block loop).

    Self-attention (Lq == Lk) without attention-prob dropout routes to the
    fused Pallas flash kernel on TPU (ops.flash_attention); everything else
    (decode windows, dropout-active training attention) uses the XLA path.

    scores_dtype: accumulation/storage dtype of the (B,h,Lq,Lk) score
    tensor.  None = f32 (exact; the default every parity test locks in).
    bf16 halves score-tensor HBM traffic and doubles the QK^T MXU rate —
    measured ~15% faster attention at ViTCAP's trunk shape with ~1e-2 output
    noise, comparable to the reference's fp16-AMP score matmul.  Softmax
    internals stay f32 either way (XLA fuses the up/downcast).
    """
    B, Lq, H = q.shape
    Lk = k.shape[1]
    hd = H // num_heads

    use_dropout = not (deterministic or dropout_rate == 0.0 or rng is None)
    if Lq == Lk and Lq >= 64:
        from ..ops import attention_backend, train_attention_backend
        backend = attention_backend()
        if backend == "xla" and (bias is None or bias.shape[1] == 1):
            # gradient-carrying traces (training/scoring): packed-layout
            # fused kernels, fwd + one-pass Pallas backward.  XLA's
            # attention backward re-reads the materialized (B, nh, L, L)
            # probs, and the (B, L, H) <-> (B, nh, L, dh) head transposes
            # around per-head kernels move 64-wide minor chunks at
            # ~20 GB/s — the packed kernels avoid both.  Attention-prob
            # dropout runs INSIDE the kernel (counter-hash mask, same
            # bits regenerated in the backward), so the reference's
            # dropout=0.1 training config gets the fused path too.
            tb = train_attention_backend()
            if tb != "xla":
                from ..ops.flash_attention import flash_attention_packed
                if use_dropout:
                    seed = jax.lax.bitcast_convert_type(
                        jax.random.bits(rng, (), jnp.uint32), jnp.int32)
                    return flash_attention_packed(
                        q, k, v, bias, seed, num_heads,
                        tb == "pallas_interpret", float(dropout_rate),
                        l_actual)
                return flash_attention_packed(q, k, v, bias,
                                              jnp.zeros((), jnp.int32),
                                              num_heads,
                                              tb == "pallas_interpret",
                                              0.0, l_actual)
        if l_actual:
            # survives python -O (unlike assert): pad rows would be read
            # as real keys by every non-packed path below
            raise ValueError("pre-padded mha (l_actual > 0) requires the "
                             "packed train kernels; backend routing drift")
        if backend != "xla" and not use_dropout:
            from ..ops.flash_attention import flash_attention
            qh = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
            out = flash_attention(qh, kh, vh, bias,
                                  backend == "pallas_interpret")
            return out.transpose(0, 2, 1, 3).reshape(B, Lq, H)

    qh = q.reshape(B, Lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Lk, num_heads, hd).transpose(0, 2, 1, 3)

    if scores_dtype is not None and scores_dtype != jnp.float32:
        # fold the scale into q so no extra full-size pass is needed
        qh = qh * jnp.asarray(hd ** -0.5, qh.dtype)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=scores_dtype)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(q.dtype)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    probs = dropout(probs, dropout_rate, rng, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, H)


# ---------------------------------------------------------------------------
# ViT (pre-norm, timm-style)
# ---------------------------------------------------------------------------

def vit_attention(p: Params, x: jnp.ndarray, num_heads: int,
                  bias: Optional[jnp.ndarray] = None,
                  scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    """Fused-qkv attention (reference vision_transformer.py:161-210)."""
    B, L, H = x.shape
    qkv = dense(p["qkv"], x)               # (B, L, 3H)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = mha(q, k, v, num_heads, bias, scores_dtype=scores_dtype,
              l_actual=l_actual)
    return dense(p["proj"], out)


def vit_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return dense(p["fc2"], gelu(dense(p["fc1"], x)))


def _vit_block_xla(p: Params, x: jnp.ndarray, num_heads: int, ln_eps: float,
                   bias: Optional[jnp.ndarray] = None,
                   scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    x = x + vit_attention(p["attn"], layer_norm(p["norm1"], x, ln_eps),
                          num_heads, bias, scores_dtype, l_actual)
    x = x + vit_mlp(p["mlp"], layer_norm(p["norm2"], x, ln_eps))
    return x


def vit_block(p: Params, x: jnp.ndarray, num_heads: int, ln_eps: float,
              bias: Optional[jnp.ndarray] = None,
              scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    """One pre-norm ViT block.  On TPU inference traces the bias-free path
    routes to the single fused Pallas block kernel (ops/fused_block:
    LN1+QKV+attn+proj+LN2+MLP, one HBM round-trip per block — measured
    3.07 vs 4.50 ms/block XLA / 3.95 one-pass-attention-only at the trunk
    shape B=32 L=577 bf16); elsewhere the plain XLA chain runs (training
    backward, biased decoder blocks, CPU tests).

    l_actual > 0: x is pre-padded to ops.fused_block.pad_len with that many valid
    rows (the caller hoisted padding out of its block loop; only
    meaningful on the fused path — the XLA path treats padded rows as
    real, so callers must only pre-pad when the fused path is active)."""
    if bias is None and x.shape[1] >= 64:
        from ..ops import attention_backend
        backend = attention_backend()
        if backend != "xla":
            from ..ops.fused_block import fused_vit_block
            return fused_vit_block(p, x, num_heads, ln_eps,
                                   backend == "pallas_interpret", l_actual)
        if x.shape[1] % 16 == 0 and x.shape[1] <= 1024:
            # gradient-carrying traces: split-kernel forward + analytic
            # backward (r5).  The XLA + packed-mha train forward measured
            # 6.95 ms/block at B=64 Lp=592 vs 4.43 for the split kernels;
            # the analytic backward reuses the kernel-materialized
            # residuals, so no forward recompute (same saved-tensor HBM
            # as XLA autodiff).  scores_dtype is ignored exactly like the
            # packed-mha path ignores it (f32 score accumulation).
            from ..ops import train_attention_backend
            tb = train_attention_backend()
            if tb != "xla":
                from ..ops.fused_block import split_vit_block_train
                return split_vit_block_train(p, x, num_heads, ln_eps,
                                             tb == "pallas_interpret",
                                             l_actual)
    # l_actual on the XLA chain is only valid when mha will route to the
    # packed train kernels (which mask the padded keys); mha asserts that.
    return _vit_block_xla(p, x, num_heads, ln_eps, bias, scores_dtype,
                          l_actual)


def vit_block_cls_only(p: Params, x: jnp.ndarray, num_heads: int,
                       ln_eps: float, scores_dtype=None) -> jnp.ndarray:
    """Exact CLS-row output of vit_block, (B,L,H) -> (B,1,H).

    The tag branch's final block only ever feeds token 0 onward (the
    reference consumes it via BertPooler / tag-CLS only,
    modeling_bert.py:1411-1424), so q/proj/MLP run on one row while k/v
    still cover every row.  Bit-for-bit the same CLS output as vit_block.
    """
    B, L, H = x.shape
    ln1 = layer_norm(p["norm1"], x, ln_eps)
    qkv_k = p["attn"]["qkv"]["kernel"]
    q = jnp.dot(ln1[:, :1], qkv_k[:, :H].astype(x.dtype),
                preferred_element_type=x.dtype)
    kv = jnp.dot(ln1, qkv_k[:, H:].astype(x.dtype),
                 preferred_element_type=x.dtype)
    if "bias" in p["attn"]["qkv"]:
        qkv_b = p["attn"]["qkv"]["bias"]
        q = q + qkv_b[:H].astype(x.dtype)
        kv = kv + qkv_b[H:].astype(x.dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    out = mha(q, k, v, num_heads, scores_dtype=scores_dtype)
    x0 = x[:, :1] + dense(p["attn"]["proj"], out)
    x0 = x0 + vit_mlp(p["mlp"], layer_norm(p["norm2"], x0, ln_eps))
    return x0


def cls_attention_scores(p: Params, x: jnp.ndarray, num_heads: int,
                         ln_eps: float) -> jnp.ndarray:
    """CLS-row attention mass of a ViT block over its input (B, L) —
    the token-importance signal for attention-aware filtering (cheap: one
    query row, no value matmul)."""
    B, L, H = x.shape
    hd = H // num_heads
    y = layer_norm(p["norm1"], x, ln_eps)
    qkv_k = p["attn"]["qkv"]["kernel"]
    q = jnp.dot(y[:, :1], qkv_k[:, :H].astype(x.dtype),
                preferred_element_type=x.dtype)
    k = jnp.dot(y, qkv_k[:, H:2 * H].astype(x.dtype),
                preferred_element_type=x.dtype)
    if "bias" in p["attn"]["qkv"]:
        b = p["attn"]["qkv"]["bias"]
        q = q + b[:H].astype(x.dtype)
        k = k + b[H:2 * H].astype(x.dtype)
    qh = q.reshape(B, 1, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * hd ** -0.5
    probs = jax.nn.softmax(s, axis=-1)       # (B, h, 1, L)
    return probs.mean(axis=1)[:, 0]          # (B, L)


def patch_embed(p: Params, images: jnp.ndarray,
                compute_dtype=None, mean: float = 0.5,
                std: float = 0.5) -> jnp.ndarray:
    """images (B, H, W, C) NHWC float or UINT8, or (B, N, P*P*C)
    pre-patchified on the host -> patch tokens (B, N, H).

    Math = conv stride=patch (reference PatchEmbed
    vision_transformer.py:253-275), computed as space-to-depth + matmul:
    XLA's conv lowering at C=3 wastes the MXU (measured ~30% slower), and
    a host-patchified input skips the device-side layout shuffle entirely.

    uint8 input: the host input pipeline's `(x/255 - mean)/std`
    normalization (reference transform.py Normalize) is FOLDED into the
    projection — w' = w/(255*std), b' = b - (mean/std)*sum_rows(w) — so
    raw camera bytes go straight to the MXU: zero extra device ops and
    4x less host->device traffic than the float32 feed.  The fold is
    exact linear algebra; only float-rounding order differs."""
    ph, pw, C, H = p["kernel"].shape
    if images.dtype == jnp.uint8:
        dt = compute_dtype or jnp.float32
        w32 = p["kernel"].reshape(ph * pw * C, H).astype(jnp.float32)
        w = (w32 / (255.0 * std)).astype(dt)
        b = (p["bias"].astype(jnp.float32)
             - (mean / std) * w32.sum(0)).astype(dt)
    else:
        dt = images.dtype
        w = p["kernel"].reshape(ph * pw * C, H).astype(dt)
        b = p["bias"].astype(dt)
    if images.ndim == 3:                       # already (B, N, ph*pw*C)
        x = images
    else:
        B, ih, iw, _ = images.shape
        gh, gw = ih // ph, iw // pw
        if ih != gh * ph or iw != gw * pw:
            # conv-stride truncation semantics: a stride-p conv ignores
            # the sub-patch tail (e.g. patch-14 models fed 64px inputs
            # keep a 4x4 grid and drop 8 edge pixels), so the
            # space-to-depth path must crop the same way
            images = images[:, :gh * ph, :gw * pw]
        x = images.reshape(B, gh, ph, gw, pw, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh * gw, ph * pw * C)
    y = jnp.dot(x.astype(dt), w, preferred_element_type=dt)
    return y + b


def patchify_host(image_hwc, patch: int):
    """Host-side space-to-depth: (H, W, C) numpy -> (N, patch*patch*C),
    the pre-patchified layout patch_embed consumes without a device-side
    layout shuffle (tiny-lane transposes are slow on TPU)."""
    import numpy as np
    ih, iw, C = image_hwc.shape
    gh, gw = ih // patch, iw // patch
    x = image_hwc.reshape(gh, patch, gw, patch, C).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(x).reshape(gh * gw, patch * patch * C)


@functools.lru_cache(maxsize=64)
def _torch_bicubic_matrix(in_size: int, out_size: int):
    """Row (out, in) weight matrix reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly:
    cubic-convolution kernel A=-0.75, half-pixel source centers
    (src = (dst+0.5)*in/out - 0.5), clamped border reads, and NO
    antialiasing — unlike ``jax.image.resize``, which uses the A=-0.5
    Keys kernel and antialiases on downscale (the two deviate by
    ~1e-1 at 224-ckpt -> 64-input geometry)."""
    import numpy as np
    A = -0.75

    def w1(x):                       # |x| <= 1
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def w2(x):                       # 1 < |x| < 2
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    scale = in_size / out_size
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        real = (i + 0.5) * scale - 0.5
        j = int(np.floor(real))
        t = real - j
        for k, c in enumerate((w2(t + 1.0), w1(t), w1(1.0 - t),
                               w2(2.0 - t))):
            W[i, min(max(j - 1 + k, 0), in_size - 1)] += c
    return W.astype(np.float32)


def torch_bicubic_resize_2d(grid: jnp.ndarray,
                            new_hw: Tuple[int, int]) -> jnp.ndarray:
    """(H, W, C) -> (h, w, C) torch-bicubic resize as two small matmuls;
    weight matrices are built host-side at trace time (grid sizes are
    static under jit), so the device op is pure MXU work."""
    H, W, C = grid.shape
    h, w = new_hw
    if (H, W) == (h, w):
        return grid
    mh = jnp.asarray(_torch_bicubic_matrix(H, h))
    mw = jnp.asarray(_torch_bicubic_matrix(W, w))
    out = jnp.einsum("hH,HWC->hWC", mh, grid.astype(jnp.float32))
    out = jnp.einsum("wW,hWC->hwC", mw, out)
    return out.astype(grid.dtype)


def interpolate_pos_embed(pos_embed: jnp.ndarray, new_grid: Tuple[int, int],
                          old_grid: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic grid-pos-embed resize keeping the CLS slot, matching torch
    F.interpolate bicubic semantics bit-for-bit at f32
    (reference vision_transformer.py:416-421)."""
    if new_grid == old_grid:
        return pos_embed
    cls_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
    H = pos_embed.shape[-1]
    grid_pe = grid_pe.reshape(old_grid[0], old_grid[1], H)
    grid_pe = torch_bicubic_resize_2d(grid_pe, new_grid)
    grid_pe = grid_pe.reshape(1, new_grid[0] * new_grid[1], H)
    return jnp.concatenate([cls_pe, grid_pe], axis=1)


def vision_embed(p: Params, images: jnp.ndarray, patch_size: int,
                 compute_dtype=None) -> jnp.ndarray:
    """Full 'image encoder' of the reference live path: patch-embed + CLS +
    (interpolated) pos-embed; no blocks, no norm
    (…bertemb.py get_image_encoder_model :750-778).
    compute_dtype only matters for uint8 images (see patch_embed)."""
    tokens = patch_embed(p["patch_proj"], images, compute_dtype)
    B, N, H = tokens.shape
    cls_tok = jnp.broadcast_to(p["cls_token"].astype(tokens.dtype), (B, 1, H))
    x = jnp.concatenate([cls_tok, tokens], axis=1)
    pe = p["pos_embed"]
    old_n = pe.shape[1] - 1
    if old_n != N:
        g_old = int(old_n ** 0.5)
        g_new = int(N ** 0.5)
        pe = interpolate_pos_embed(pe, (g_new, g_new), (g_old, g_old))
    return x + pe.astype(x.dtype)


# ---------------------------------------------------------------------------
# BERT (post-norm)
# ---------------------------------------------------------------------------

def bert_embeddings(p: Params, input_ids: jnp.ndarray,
                    position_ids: Optional[jnp.ndarray],
                    token_type_ids: Optional[jnp.ndarray],
                    ln_eps: float, dropout_rate: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True,
                    dtype=jnp.float32) -> jnp.ndarray:
    """word + position + type embeddings -> LN -> dropout
    (reference modeling_bert.py:208-237)."""
    B, L = input_ids.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    emb = (p["word_embeddings"][input_ids]
           + p["position_embeddings"][position_ids]
           + p["token_type_embeddings"][token_type_ids]).astype(dtype)
    emb = layer_norm(p["LayerNorm"], emb, ln_eps)
    return dropout(emb, dropout_rate, rng, deterministic)


def bert_self_attention(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                        num_heads: int,
                        kv_input: Optional[jnp.ndarray] = None,
                        attn_dropout: float = 0.0,
                        rng: Optional[jax.Array] = None,
                        deterministic: bool = True,
                        scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    """Separate q/k/v projections; kv_input (defaults to x) supports the
    decode path where keys/values cover history + current tokens
    (reference modeling_bert.py:275-343)."""
    kv = x if kv_input is None else kv_input
    q = dense(p["query"], x)
    k = dense(p["key"], kv)
    v = dense(p["value"], kv)
    return mha(q, k, v, num_heads, bias, attn_dropout, rng, deterministic,
               scores_dtype, l_actual=l_actual)


def bert_layer(p: Params, x: jnp.ndarray, bias: jnp.ndarray, num_heads: int,
               ln_eps: float, kv_input: Optional[jnp.ndarray] = None,
               hidden_dropout: float = 0.0, attn_dropout: float = 0.0,
               rng: Optional[jax.Array] = None,
               deterministic: bool = True,
               scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    """Post-norm BERT layer (reference modeling_bert.py:422-437).

    On TPU inference traces the plain self-attention path (no kv_input, no
    dropout) routes to the fused Pallas kernel (ops/fused_block.py
    fused_bert_block) — the decode-prefill hot block.

    l_actual > 0: x AND bias are pre-padded on the token axis (16-aligned)
    with that many valid rows — the caller hoisted the pad outside its
    layer loop (fusion_decoder).  Only valid with the packed train
    kernels, which mask the padded keys; mha raises otherwise."""
    if (kv_input is None and bias is not None and x.shape[1] >= 64
            and not l_actual
            and (deterministic or rng is None
                 or (hidden_dropout == 0.0 and attn_dropout == 0.0))):
        from ..ops import attention_backend
        backend = attention_backend()
        if backend != "xla":
            from ..ops.fused_block import fused_bert_block
            return fused_bert_block(p, x, bias, num_heads, ln_eps,
                                    backend == "pallas_interpret")
    if (kv_input is None and bias is not None and bias.shape[1] == 1
            and x.shape[1] >= 64 and x.shape[1] % 16 == 0
            and x.shape[1] <= 1024):
        # gradient-carrying traces: split forward + analytic backward
        # (r5, the BERT analogue of the trunk's split_vit_block_train).
        # Hidden/attn dropout run in-kernel via counter-hash lattices;
        # seeds derive from the layer rng, so the draw is iid bernoulli
        # like the reference's nn.Dropout (the bit stream differs from
        # the jax.random path, which no parity contract pins).
        from ..ops import attention_backend, train_attention_backend
        if attention_backend() == "xla":
            tb = train_attention_backend()
            if tb != "xla":
                from ..ops.fused_block import split_bert_layer_train
                det = deterministic or rng is None
                h_rate = 0.0 if det else float(hidden_dropout)
                a_rate = 0.0 if det else float(attn_dropout)
                if (h_rate > 0.0 or a_rate > 0.0):
                    seeds = jax.lax.bitcast_convert_type(
                        jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)
                else:
                    seeds = jnp.zeros((2,), jnp.int32)
                return split_bert_layer_train(
                    p, x, bias, num_heads, ln_eps,
                    tb == "pallas_interpret", l_actual, h_rate, a_rate,
                    seeds)
    return _bert_layer_xla(p, x, bias, num_heads, ln_eps, kv_input,
                           hidden_dropout, attn_dropout, rng, deterministic,
                           scores_dtype, l_actual)


def _bert_layer_xla(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                    num_heads: int, ln_eps: float,
                    kv_input: Optional[jnp.ndarray] = None,
                    hidden_dropout: float = 0.0, attn_dropout: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True,
                    scores_dtype=None, l_actual: int = 0) -> jnp.ndarray:
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    else:
        r1 = r2 = r3 = None
    attn = bert_self_attention(p["attention"]["self"], x, bias, num_heads,
                               kv_input, attn_dropout, r1, deterministic,
                               scores_dtype, l_actual)
    attn = dense(p["attention"]["output"]["dense"], attn)
    attn = dropout(attn, hidden_dropout, r2, deterministic)
    x = layer_norm(p["attention"]["output"]["LayerNorm"], attn + x, ln_eps)
    inter = gelu(dense(p["intermediate"]["dense"], x))
    out = dense(p["output"]["dense"], inter)
    out = dropout(out, hidden_dropout, r3, deterministic)
    return layer_norm(p["output"]["LayerNorm"], out + x, ln_eps)


def bert_pooler(p: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """tanh(dense(token 0)) (reference modeling_bert.py:515-527)."""
    return jnp.tanh(dense(p["dense"], hidden[:, 0]))


def lm_head_transform(p: Params, x: jnp.ndarray, ln_eps: float) -> jnp.ndarray:
    """dense -> gelu -> LN (reference BertPredictionHeadTransform :530-544)."""
    return layer_norm(p["LayerNorm"], gelu(dense(p["dense"], x)), ln_eps)


def lm_head(p: Params, x: jnp.ndarray, ln_eps: float,
            decoder_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """transform -> (tied or own) decoder projection + bias
    (reference BertLMPredictionHead :547-563).

    decoder_weight: (V, H) embedding-style matrix when tied; otherwise uses
    p['decoder'] stored as jax (H, V) kernel.
    """
    h = lm_head_transform(p["transform"], x, ln_eps)
    if decoder_weight is not None:
        logits = jnp.dot(h, decoder_weight.T.astype(h.dtype),
                         preferred_element_type=h.dtype)
        logits = logits + p["decoder"]["bias"]
    else:
        logits = dense(p["decoder"], h)
    return logits
