"""Fused decode-step context attention Pallas kernel.

The decode scan's cost is reading the static context K/V caches: 4 layers
x 2 tensors x (B, S~627, H=768) bf16 = ~492 MB per token step at B=64.
XLA's einsum pair (scores, then probs @ V) reads the caches at only
~286 GB/s effective (benchmarks/ablate_int8_layout.py, v5e, 819 GB/s
peak): the two einsums are separate kernels, each a skinny 2-row dot that
cannot overlap the other's DMA, with the softmax/mask/concat chain
between them.

This kernel does the WHOLE per-layer decode attention — caption-cache,
window-self and context scores, one joint softmax, and both weighted
sums — in one pallas_call per layer with the context K and V tiles
streaming through VMEM once.

The 12 heads' skinny dots become ONE MXU matmul via a block-diagonal
expansion: q rows (n, w) of the (nb*2, H) window are broadcast to
(nb, 12, 2, H) and masked so row r=(n, h, w) keeps only head h's 64
columns.  Then

    qe (nb*24, 768) @ K^T (768, S)

computes every head's scores exactly (off-head columns are zero), and

    p (nb*24, S) @ V (S, 768)

yields each head's context sum in its own 64-column block (off-head
blocks are garbage, masked and summed away by the same expansion mask).
The 12x extra MXU FLOPs are free — the op is bandwidth-bound (2-row
queries) — and the head transpose disappears: caches stay in the raw
(B, S, nH*hd) projection layout end to end.

Reference semantics: modeling_utils.py:768-886 single-step attention over
[caption cache <= t-1, self (MASK row only), od+visual context]; masks
are additive -1e30 biases, softmax in f32, probs cast to the compute
dtype before the V dots (matching models/decode.py:_decode_attention).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def decode_attention_backend() -> str:
    """'pallas' | 'pallas_interpret' | 'xla' for the decode-scan context
    attention (VITCAP_DECODE_ATTN: 1 | interpret | 0 | auto)."""
    from . import _on_tpu
    mode = os.environ.get("VITCAP_DECODE_ATTN", "auto").lower()
    if mode == "interpret":
        return "pallas_interpret"
    if mode in ("1", "fused"):
        return "pallas"
    if mode == "0":
        return "xla"
    return "pallas" if _on_tpu() else "xla"


@functools.lru_cache(None)
def _head_mask(nb: int, nh: int, dh: int, dtype_name: str) -> np.ndarray:
    """(nb*nh*2, nh*dh) block-diagonal expansion mask: row r=(n,h,w) keeps
    columns [h*dh, (h+1)*dh)."""
    R = nb * nh * 2
    H = nh * dh
    r = np.arange(R)[:, None]
    c = np.arange(H)[None, :]
    h = (r // 2) % nh
    return ((c // dh) == h).astype(dtype_name)


def _kernel(qw_ref, kw_ref, vw_ref, capk_ref, capv_ref, ctxk_ref, ctxv_ref,
            ctxb_ref, cwb_ref, hm_ref, o_ref, *, nb: int, nh: int, dh: int,
            scale: float):
    H = nh * dh
    R = nb * nh * 2
    dt = qw_ref.dtype

    # block-diagonal q expansion: (nb*2, H) -> (R, H), head h keeps its
    # own dh columns (see module docstring)
    hm = hm_ref[...]
    q2 = qw_ref[0]                                          # (nb*2, H)
    qe = (jnp.broadcast_to(q2.reshape(nb, 1, 2, H), (nb, nh, 2, H))
          .reshape(R, H) * hm)

    # scores: context / caption-cache / window-self, all f32
    s_ctx = jax.lax.dot_general(
        qe, ctxk_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # (R, Sp)
    s_ctx = s_ctx + ctxb_ref[0]                             # (1, Sp) bcast
    s_cap = jax.lax.dot_general(
        qe, capk_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # (R, nb*A)
    s_win = jax.lax.dot_general(
        qe, kw_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # (R, nb*2)
    # caption/self additive bias: (nb*2, nb*A + nb*2) expanded over heads
    cwb = cwb_ref[...]
    C2 = cwb.shape[-1]
    cwb_e = (jnp.broadcast_to(cwb.reshape(nb, 1, 2, C2), (nb, nh, 2, C2))
             .reshape(R, C2))
    nbA = C2 - nb * 2
    s_cap = s_cap + cwb_e[:, :nbA]
    s_win = s_win + cwb_e[:, nbA:]

    # joint softmax over [cap, self, ctx]
    m = jnp.maximum(jnp.max(s_ctx, axis=-1, keepdims=True),
                    jnp.maximum(jnp.max(s_cap, axis=-1, keepdims=True),
                                jnp.max(s_win, axis=-1, keepdims=True)))
    e_ctx = jnp.exp(s_ctx - m)
    e_cap = jnp.exp(s_cap - m)
    e_win = jnp.exp(s_win - m)
    l = (jnp.sum(e_ctx, axis=-1, keepdims=True)
         + jnp.sum(e_cap, axis=-1, keepdims=True)
         + jnp.sum(e_win, axis=-1, keepdims=True))
    inv = 1.0 / jnp.maximum(l, 1e-30)

    o = jax.lax.dot_general(
        (e_ctx * inv).astype(dt), ctxv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (R, H)
    o += jax.lax.dot_general(
        (e_cap * inv).astype(dt), capv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o += jax.lax.dot_general(
        (e_win * inv).astype(dt), vw_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # fold the 12 per-head blocks back to (nb*2, H): off-head columns are
    # garbage -> mask, then sum over the head axis
    o = (o * hm).reshape(nb, nh, 2, H).sum(axis=1)          # (nb, 2, H)
    o_ref[0] = o.reshape(nb * 2, H).astype(o_ref.dtype)


def fused_decode_attention(q_win: jnp.ndarray, k_win: jnp.ndarray,
                           v_win: jnp.ndarray, cap_k: jnp.ndarray,
                           cap_v: jnp.ndarray, ctx_k: jnp.ndarray,
                           ctx_v: jnp.ndarray, ctx_bias: jnp.ndarray,
                           capwin_bias: jnp.ndarray, num_heads: int,
                           interpret: bool = False) -> jnp.ndarray:
    """One decode step's attention for one decoder layer.

    q_win/k_win/v_win: (Bb, 2, H) window projections (prev@t-1, MASK@t).
    cap_k/cap_v: (Bb, A, H) caption caches, prev row already written at
        slot t-1 by the caller.
    ctx_k/ctx_v: (B, Sp, H) context caches, projection layout, padded.
    ctx_bias: (B, Sp) f32 additive (0 valid / -1e30 invalid+pad).
    capwin_bias: (nb*2, nb*A + nb*2) f32 additive mask for the caption
        slots (<= t-1, own beam) and the window-self column (MASK row
        only); shared across images and heads.
    Returns (Bb, 2, H) attention output (pre out-projection).
    """
    Bb, W, H = q_win.shape
    B, Sp, _ = ctx_k.shape
    nb = Bb // B
    A = cap_k.shape[1]
    dh = H // num_heads
    R = nb * num_heads * 2

    if interpret and q_win.dtype == jnp.bfloat16:
        # CPU interpret mode: the XLA-CPU dot thunk has no
        # BF16 x BF16 = F32 path; run the test trace in f32
        f32 = lambda a: a.astype(jnp.float32)
        return fused_decode_attention(
            f32(q_win), f32(k_win), f32(v_win), f32(cap_k), f32(cap_v),
            f32(ctx_k), f32(ctx_v), ctx_bias, capwin_bias, num_heads,
            interpret).astype(q_win.dtype)

    hm = jnp.asarray(_head_mask(nb, num_heads, dh, np.dtype(
        q_win.dtype).name))
    qw = q_win.reshape(B, nb * 2, H)
    kw = k_win.reshape(B, nb * 2, H)
    vw = v_win.reshape(B, nb * 2, H)
    capk = cap_k.reshape(B, nb * A, H)
    capv = cap_v.reshape(B, nb * A, H)

    row = lambda n: pl.BlockSpec((1, n, H), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, nh=num_heads, dh=dh,
                          scale=dh ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B, nb * 2, H), q_win.dtype),
        grid=(B,),
        in_specs=[
            row(nb * 2), row(nb * 2), row(nb * 2),          # q/k/v window
            row(nb * A), row(nb * A),                       # caption caches
            row(Sp), row(Sp),                               # context caches
            pl.BlockSpec((1, 1, Sp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),          # ctx bias
            const(capwin_bias.shape),                       # cap/self bias
            const((R, H)),                                  # head mask
        ],
        out_specs=row(nb * 2),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(qw, kw, vw, capk, capv, ctx_k, ctx_v, ctx_bias[:, None, :],
      capwin_bias, hm)
    return out.reshape(Bb, 2, H)


def capwin_bias(nb: int, A: int, t: jnp.ndarray) -> jnp.ndarray:
    """(nb*2, nb*A + nb*2) f32 additive mask for `fused_decode_attention`:
    row (n, w) may attend caption slots (n, a<=t-1) and — MASK row only —
    its own window-self column (n, 1)."""
    r_n = jnp.arange(nb * 2) // 2                      # (rows,) beam
    r_w = jnp.arange(nb * 2) % 2
    c_n = jnp.arange(nb * A) // A
    c_a = jnp.arange(nb * A) % A
    cap_ok = (r_n[:, None] == c_n[None, :]) & (c_a[None, :] <= (t - 1))
    w_n = jnp.arange(nb * 2) // 2
    w_w = jnp.arange(nb * 2) % 2
    win_ok = ((r_n[:, None] == w_n[None, :]) & (w_w[None, :] == 1)
              & (r_w[:, None] == 1))
    ok = jnp.concatenate([cap_ok, win_ok], axis=-1)
    return jnp.where(ok, 0.0, NEG).astype(jnp.float32)
