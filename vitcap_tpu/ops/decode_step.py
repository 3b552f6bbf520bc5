"""Fused autoregressive decode step: all 4 fusion-decoder layers in ONE
Pallas kernel per token.

The XLA scan body (models/decode.py decode_step) issues ~60 small ops per
step per layer group; at B=32 that runs ~0.81 ms/step against a ~0.43 ms
HBM floor (context KV caches + layer weights + LM head are the only
irreducible traffic).  This kernel walks grid (layer, image-group):
per-layer weights are VMEM-resident across the group sweep, each cell
streams a group of images' context K/V, and the 2-token window hidden
state lives in a revisited VMEM output block across all 4 layers — one
kernel launch per step instead of dozens of XLA ops.  Grouping several
images per cell amortizes per-cell DMA/sync overhead (the 1-image variant
measured ~1.4 ms/step of mostly fixed costs at 128 cells).

Semantics are exactly models/decode.py:_decode_attention /_decode_layer
(reference modeling_bert.py:275-343 history_state attention + :422-437
post-norm layer): window [prev@t-1, MASK@t]; both rows attend caption
cache slots <= t-1 (including prev's K/V written this step), only the MASK
row attends its own K/V, context columns per od-validity bias.

Kernel-layout notes: caches stay flat (…, len, H) — lane-dim reshapes of
activations are unsupported on TPU, so heads are static 64-lane column
extracts (same pattern as ops/fused_block.py); score sources (caption /
self / context) are softmax-joined through a shared max instead of a
lane-offset concatenate; head outputs accumulate straight into the output
projection via row slices of W_o instead of a heads concat.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import _gelu_exact, _round_up

Params = Dict[str, Any]

NEG = -1e30           # padded context columns (exact 0 after softmax)


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def pack_decode_layers(params: Params, dtype) -> Params:
    """Stack the decoder layers' weights into (nL, ...) arrays, qkv merged
    column-wise, kernels cast to the compute dtype, LN params f32."""
    layers = params["decoder"]["layer"]

    def stack(path, cast=None):
        arrs = []
        for layer in layers:
            a = layer
            for kseg in path:
                a = a[kseg]
            arrs.append(a)
        out = jnp.stack(arrs)
        return out.astype(cast) if cast is not None else out

    def stack1(path, cast):                     # (nL, 1, N): Pallas TPU
        # block shapes need the last-2 dims to equal the array dims
        return stack(path, cast)[:, None, :]

    wq = stack(("attention", "self", "query", "kernel"), dtype)
    wk = stack(("attention", "self", "key", "kernel"), dtype)
    wv = stack(("attention", "self", "value", "kernel"), dtype)
    bq = stack1(("attention", "self", "query", "bias"), jnp.float32)
    bk = stack1(("attention", "self", "key", "bias"), jnp.float32)
    bv = stack1(("attention", "self", "value", "bias"), jnp.float32)
    return {
        "wqkv": jnp.concatenate([wq, wk, wv], axis=2),     # (nL, H, 3H)
        "bqkv": jnp.concatenate([bq, bk, bv], axis=2),     # (nL, 1, 3H)
        "wo": stack(("attention", "output", "dense", "kernel"), dtype),
        "bo": stack1(("attention", "output", "dense", "bias"), jnp.float32),
        "ln1s": stack1(("attention", "output", "LayerNorm", "scale"),
                       jnp.float32),
        "ln1b": stack1(("attention", "output", "LayerNorm", "bias"),
                       jnp.float32),
        "wfc1": stack(("intermediate", "dense", "kernel"), dtype),
        "bfc1": stack1(("intermediate", "dense", "bias"), jnp.float32),
        "wfc2": stack(("output", "dense", "kernel"), dtype),
        "bfc2": stack1(("output", "dense", "bias"), jnp.float32),
        "ln2s": stack1(("output", "LayerNorm", "scale"), jnp.float32),
        "ln2b": stack1(("output", "LayerNorm", "bias"), jnp.float32),
    }


def pack_decode_context(ctx_k_flat, ctx_v_flat, ctx_valid
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ctx_k_flat/v: list of per-layer (B, S, H); ctx_valid (B, S) bool ->
    ((nL,B,Sp,H), (nL,B,Sp,H), (B,1,Sp) additive f32 bias)."""
    k = jnp.stack(ctx_k_flat)
    v = jnp.stack(ctx_v_flat)
    nL, B, S, H = k.shape
    Sp = _round_up(S, 128)
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    # invalid od slots get the reference's -10000; padded tail hard NEG
    from ..models.layers import NEG_MASK_VALUE
    bias = jnp.where(ctx_valid, 0.0, NEG_MASK_VALUE).astype(jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, Sp - S)), constant_values=NEG)
    return k, v, bias[:, None, :]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(t_ref, xin_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            ln1s_ref, ln1b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
            ln2s_ref, ln2b_ref, ctxk_ref, ctxv_ref, ctxb_ref,
            capk_in_ref, capv_in_ref,
            xout_ref, capk_out_ref, capv_out_ref, *,
            num_heads: int, eps: float, bb: int, nb: int):
    l = pl.program_id(0)
    g = pl.program_id(1)
    t = t_ref[0]
    H = xin_ref.shape[-1]
    hd = H // num_heads
    A = capk_in_ref.shape[2]
    dt = xin_ref.dtype
    R = 2 * bb                                    # window rows in this cell

    @pl.when(l == 0)
    def _():
        xout_ref[pl.ds(g * bb, bb)] = xin_ref[pl.ds(g * bb, bb)]

    x = xout_ref[pl.ds(g * bb, bb)].reshape(R, H)

    qkv = jnp.dot(x, wqkv_ref[0],
                  preferred_element_type=jnp.float32)  # (R, 3H)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(dt)
    q = qkv[:, :H]
    kw = qkv[:, H:2 * H]
    vw = qkv[:, 2 * H:]

    # caption caches: write each image's prev row at slot t-1 via a masked
    # select (dynamic-sublane vector stores need 8-row alignment on TPU)
    cap_rows = jax.lax.broadcasted_iota(jnp.int32, (1, A, 1), 1)
    at_prev = cap_rows == (t - 1)
    # prev rows of each image: rows 0,2,4,... of the window
    prev_k = kw.reshape(bb, 2, H)[:, 0:1]              # (bb, 1, H)
    prev_v = vw.reshape(bb, 2, H)[:, 0:1]
    capk = jnp.where(at_prev, prev_k, capk_in_ref[0])  # (bb, A, H)
    capv = jnp.where(at_prev, prev_v, capv_in_ref[0])
    capk_out_ref[0] = capk
    capv_out_ref[0] = capv

    scale = jnp.asarray(hd ** -0.5, dt)
    cap_cols = jax.lax.broadcasted_iota(jnp.int32, (2, A), 1)
    cap_mask = cap_cols <= (t - 1)
    row_is_mask = jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0) == 1

    img_outs = []
    for i in range(bb):
        rows = slice(2 * i, 2 * i + 2)
        # static block-local image index: _pick_group guarantees a cell's
        # rows cover whole beam groups (nb<=bb) or sit inside one (nb>bb)
        img = i // nb if nb <= bb else 0
        ctxk = ctxk_ref[0, img]                        # (Sp, H)
        ctxv = ctxv_ref[0, img]
        # ctxb block is (n_img, 1, Sp): image is the FIRST axis here
        cbias = ctxb_ref[img]                          # (1, Sp) f32
        oi = jnp.zeros((2, H), jnp.float32)
        for h in range(num_heads):
            cs = slice(h * hd, (h + 1) * hd)
            qh = q[rows, cs] * scale                   # (2, hd)
            s_cap = jax.lax.dot_general(
                qh, capk[i][:, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # (2, A)
            s_cap = jnp.where(cap_mask, s_cap, NEG)
            # multiply-reduce: Mosaic mis-lowers (2,hd)x(1,hd) matmuls
            s_self = jnp.sum((qh * kw[rows, cs][1:2]).astype(jnp.float32),
                             axis=-1, keepdims=True)   # (2, 1)
            s_self = jnp.where(row_is_mask, s_self, NEG)
            s_ctx = jax.lax.dot_general(
                qh, ctxk[:, cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + cbias     # (2, Sp)
            # concat-free joint softmax over the three sources
            m = jnp.maximum(jnp.maximum(
                jnp.max(s_cap, axis=-1, keepdims=True),
                jnp.max(s_ctx, axis=-1, keepdims=True)), s_self)
            p_cap = jnp.exp(s_cap - m)
            p_self = jnp.exp(s_self - m)
            p_ctx = jnp.exp(s_ctx - m)
            denom = (jnp.sum(p_cap, axis=-1, keepdims=True) + p_self
                     + jnp.sum(p_ctx, axis=-1, keepdims=True))
            o = jnp.dot(p_cap.astype(dt), capv[i][:, cs],
                        preferred_element_type=jnp.float32)
            o += p_self * vw[rows, cs][1:2].astype(jnp.float32)
            o += jnp.dot(p_ctx.astype(dt), ctxv[:, cs],
                         preferred_element_type=jnp.float32)
            o = (o / denom).astype(dt)                 # (2, hd)
            # accumulate into the output projection (no heads concat)
            oi += jnp.dot(o, wo_ref[0][cs, :],
                          preferred_element_type=jnp.float32)
        img_outs.append(oi)
    # row-direction (sublane) concat — aligned, unlike a heads concat
    o_acc = img_outs[0] if bb == 1 else jnp.concatenate(img_outs, axis=0)
    attn = o_acc + bo_ref[0].astype(jnp.float32)

    def post_ln(y_f32, res, s_ref, b_ref):
        yf = y_f32 + res.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        out = (yf - mean) * jax.lax.rsqrt(var + eps)
        return (out * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(dt)

    x = post_ln(attn, x, ln1s_ref, ln1b_ref)
    h1 = jnp.dot(x, wfc1_ref[0], preferred_element_type=jnp.float32)
    h1 = _gelu_exact((h1 + bfc1_ref[0].astype(jnp.float32)).astype(dt))
    y = jnp.dot(h1, wfc2_ref[0], preferred_element_type=jnp.float32)
    y = y + bfc2_ref[0].astype(jnp.float32)
    x = post_ln(y, x, ln2s_ref, ln2b_ref)
    xout_ref[pl.ds(g * bb, bb)] = x.reshape(bb, 2, H)


def _pick_group(Bb: int, nb: int) -> int:
    """Images per grid cell: amortize per-cell DMA/sync overhead while the
    group's context K/V (2 x bb x Sp x H bf16 ~ 2MB/img) stays well inside
    VMEM next to the resident layer weights.  Beam rows of one image must
    not span cells (their ctx block index must be constant per cell)."""
    for bb in (8, 4, 2, 1):
        if Bb % bb == 0 and (nb == 1 or bb % nb == 0 or nb % bb == 0):
            if nb == 1 or bb <= nb:
                return bb
    return 1


def fused_decode_step(packed: Params, ctx_k: jnp.ndarray, ctx_v: jnp.ndarray,
                      ctx_bias: jnp.ndarray, cap_k: jnp.ndarray,
                      cap_v: jnp.ndarray, x_win: jnp.ndarray, t: jnp.ndarray,
                      *, num_heads: int, eps: float,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One full decoder-stack step.

    packed: pack_decode_layers output; ctx_k/v (nL,B,Sp,H);
    ctx_bias (B,1,Sp); cap_k/v (nL,Bb,A,H); x_win (Bb,2,H); t scalar.
    Bb = B*nb (beams share their image's context).
    Returns (x_out (Bb,2,H), cap_k', cap_v')."""
    nL, B, Sp, H = ctx_k.shape
    Bb = cap_k.shape[1]
    A = cap_k.shape[2]
    nb = Bb // B
    dt = x_win.dtype
    bb = _pick_group(Bb, nb)
    n_img = max(1, bb // nb)      # distinct images per cell
    kern = functools.partial(_kernel, num_heads=num_heads, eps=eps,
                             bb=bb, nb=nb)

    # index maps get the scalar-prefetch ref appended (here: t, unused)
    const = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda l, g, _t: (l,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    # per-layer 1D params are packed (nL, 1, N): TPU blocks need their
    # last-2 dims to equal the array dims
    constb = lambda n: pl.BlockSpec((1, 1, n), lambda l, g, _t: (l, 0, 0),
                                    memory_space=pltpu.VMEM)
    # index maps return BLOCK indices: image block = first covered image /
    # images-per-block ((g*bb) is always a multiple of nb*n_img by
    # _pick_group's divisibility constraints)
    img_block = nb * n_img
    ctx_spec = pl.BlockSpec(
        (1, n_img, Sp, H), lambda l, g, _t: (l, (g * bb) // img_block, 0, 0),
        memory_space=pltpu.VMEM)
    cbias_spec = pl.BlockSpec(
        (n_img, 1, Sp), lambda l, g, _t: ((g * bb) // img_block, 0, 0),
        memory_space=pltpu.VMEM)
    cap_spec = pl.BlockSpec((1, bb, A, H), lambda l, g, _t: (l, g, 0, 0),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((Bb, 2, H), lambda l, g, _t: (0, 0, 0),
                          memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nL, Bb // bb),
        in_specs=[x_spec,
                  const(H, 3 * H), constb(3 * H), const(H, H), constb(H),
                  constb(H), constb(H),
                  const(H, packed["wfc1"].shape[2]),
                  constb(packed["wfc1"].shape[2]),
                  const(packed["wfc2"].shape[1], H), constb(H),
                  constb(H), constb(H),
                  ctx_spec, ctx_spec, cbias_spec, cap_spec, cap_spec],
        out_specs=[x_spec, cap_spec, cap_spec],
    )
    x_out, cap_k2, cap_v2 = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((Bb, 2, H), dt),
                   jax.ShapeDtypeStruct(cap_k.shape, cap_k.dtype),
                   jax.ShapeDtypeStruct(cap_v.shape, cap_v.dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(t, jnp.int32).reshape(1), x_win,
      packed["wqkv"], packed["bqkv"], packed["wo"], packed["bo"],
      packed["ln1s"], packed["ln1b"], packed["wfc1"], packed["bfc1"],
      packed["wfc2"], packed["bfc2"], packed["ln2s"], packed["ln2b"],
      ctx_k, ctx_v, ctx_bias, cap_k, cap_v)
    return x_out, cap_k2, cap_v2
