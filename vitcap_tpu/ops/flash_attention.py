"""Fused flash-style attention Pallas kernel for TPU.

The hot op of the whole framework: the ViT trunk runs 16 blocks of dense
577-token self-attention per image, and the fusion decoder runs 4 masked
~650-token blocks.  XLA materializes the (B, heads, L, L) probability tensor
in HBM (at B=32 fp32 that is ~0.5 GB per layer of traffic); this kernel
keeps scores/probs in VMEM with the online-softmax recurrence, writing only
the (B, heads, L, dh) output.

Forward = Pallas (q-tile grid, static unrolled k-tile loop, f32
accumulators).  Backward = jax.custom_vjp that recomputes attention with
plain XLA ops — numerically the standard softmax gradient, so training works
through the same API while the inference path (the headline captions/sec
benchmark) gets the fused kernel.

Kernel layout per (batch, head, q-tile) grid cell:
  q (TQ, dh) . k^T (dh, Lp) tile-by-tile -> online max/denominator in VMEM
  padded tail keys masked with NEG; optional additive bias tile streamed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
TQ = 128           # q tile (sublane-aligned for f32/bf16)
TK = 128           # k tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dropout_keep(seed_u32, salt: jnp.ndarray, rate: float, shape,
                  dims=(0, 1)):
    """Counter-based keep mask for attention-prob dropout (reference
    BertSelfAttention's nn.Dropout on the softmax probs,
    modeling_bert.py:139-141,176).

    Stateless murmur3-fmix32 hash over the (row, col) lattice + seed +
    salt: plain integer VPU ops, so the SAME bits regenerate in the
    backward kernel (no mask tensor ever touches HBM) and the code runs
    identically under interpret mode (pltpu.prng_* has no interpret
    lowering).  Quality is ample for dropout.

    dims: which axes of `shape` are the (row, col) lattice coordinates —
    (0, 1) in the 2D per-grid-cell kernels; (1, 2) for XLA-side
    regeneration over a (B, L, H) batch (salt then carries the per-image
    term as a broadcastable array)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, dims[0])
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, dims[1])
    x = (r * jnp.uint32(0x9E3779B9) + c * jnp.uint32(0x85EBCA6B)
         + seed_u32 + salt.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    # keep with prob (1 - rate): uniform u32 >= rate * 2^32
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return x >= thresh


# --- pair-blockdiagonal shared core -----------------------------------------
#
# Two hd=64 heads per matmul via [[a1,0];[0,a2]] K/V packing on a
# 128-aligned LG row stride, so every contraction/minor is a full MXU
# tile (the skinny per-head dots are tile-bound at 50%) and every f32
# score-slab slice lands lane-aligned.  Shared by the packed train
# kernels here and fused_block's inference/BERT pair kernels — one
# implementation of the packing/masking/softmax invariants (ADVICE r4).

def _bd_pack(a1, a2, lp: int, LG: int):
    """Two (Lp, dh) segments -> (2LG, 2dh) block-diagonal stack."""
    dt = a1.dtype
    dh = a1.shape[-1]
    z = jnp.zeros((lp, dh), dt)
    seg1 = jnp.concatenate([a1, z], axis=-1)
    seg2 = jnp.concatenate([z, a2], axis=-1)
    if LG > lp:
        zg = jnp.zeros((LG - lp, 2 * dh), dt)
        return jnp.concatenate([seg1, zg, seg2, zg], axis=0)
    return jnp.concatenate([seg1, seg2], axis=0)


def _bd_valid(lp: int, LG: int, l_actual: int):
    """(Lp, 2LG) mask covering both the pad rows (l_actual..lp) and the
    LG-alignment gap rows (lp..LG) of each segment."""
    kidx = jax.lax.broadcasted_iota(jnp.int32, (lp, 2 * LG), 1)
    return (kidx % LG) < l_actual


def _bd_bias2(bias_f32, lp: int, LG: int):
    """(Lp, lp) additive bias tile -> (Lp, 2LG): padded to the segment
    stride and placed once into both segments (gap columns are masked
    downstream, their bias value is irrelevant)."""
    if LG > lp:
        bias_f32 = jnp.pad(bias_f32, ((0, 0), (0, LG - lp)))
    return jnp.concatenate([bias_f32, bias_f32], axis=-1)


def _bd_scores(qp, kbd, valid, scale: float, bias2=None):
    """Masked (Lp, 2LG) f32 pair-score slab."""
    s = jax.lax.dot_general(qp, kbd, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if bias2 is not None:
        s = s + bias2
    return jnp.where(valid, s, NEG)


def _bd_softmax(s, LG: int):
    """Per-segment softmax pieces: (e1, e2, l1, l2), e unnormalized."""
    s1, s2 = s[:, :LG], s[:, LG:]
    m1 = jnp.max(s1, axis=-1, keepdims=True)
    m2 = jnp.max(s2, axis=-1, keepdims=True)
    e1 = jnp.exp(s1 - m1)
    e2 = jnp.exp(s2 - m2)
    l1 = jnp.sum(e1, axis=-1, keepdims=True)
    l2 = jnp.sum(e2, axis=-1, keepdims=True)
    return e1, e2, l1, l2


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_k_tiles: int,
            tk: int, scale: float, l_actual: int):
    TK = tk
    # keep matmul INPUTS in the native dtype (bf16 hits the MXU at full
    # rate); accumulate in f32 via preferred_element_type
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)    # (TQ, dh)
    dh = q.shape[-1]
    m = jnp.full((TQ, 1), NEG, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, dh), jnp.float32)

    for kt in range(n_k_tiles):
        k = k_ref[0, kt * TK:(kt + 1) * TK]                       # (TK, dh)
        v = v_ref[0, kt * TK:(kt + 1) * TK]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (TQ, TK)
        if bias_ref is not None:
            s = s + bias_ref[0, :, kt * TK:(kt + 1) * TK].astype(
                jnp.float32)
        # mask padded keys
        if (kt + 1) * TK > l_actual:
            kidx = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 1) \
                + kt * TK
            s = jnp.where(kidx < l_actual, s, NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.dot(p.astype(v.dtype), v,
                                   preferred_element_type=jnp.float32)
        m = m_new

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _onepass_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, hpc: int,
                    scale: float, l_actual: int, lp: int):
    """One-pass softmax (whole K resident in VMEM), several heads per grid
    cell so Mosaic pipelines one head's softmax (VPU) against the next
    head's matmuls (MXU) — measured ~10% faster than XLA at the ViT trunk
    shape, where the 128-tile online-rescale variant was slower."""
    for h in range(hpc):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, h if bias_ref.shape[1] > 1 else 0].astype(
                jnp.float32)
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                    preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd_onepass(q, k, v, bias, interpret: bool) -> jnp.ndarray:
    """Short-sequence path (the ViTCAP regime, Lp <= 1024): full K in VMEM,
    hpc heads per cell."""
    B, nH, L, dh = q.shape
    scale = dh ** -0.5
    Lp = _round_up(L, TK)
    pad = Lp - L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
    hpc = next((h for h in (4, 3, 2, 1) if nH % h == 0))
    cells = B * nH // hpc
    qf = q.reshape(cells, hpc, Lp, dh)
    kf = k.reshape(cells, hpc, Lp, dh)
    vf = v.reshape(cells, hpc, Lp, dh)
    kern = functools.partial(_onepass_kernel, hpc=hpc, scale=scale,
                             l_actual=L, lp=Lp)
    spec = pl.BlockSpec((1, hpc, Lp, dh), lambda c: (c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    args = [qf, kf, vf]
    if bias is not None:
        nHb = bias.shape[1]
        if nHb == nH:
            bias_f = bias.reshape(cells, hpc, Lp, Lp)
            bspec = pl.BlockSpec((1, hpc, Lp, Lp), lambda c: (c, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            per_img = nH // hpc
            bias_f = bias.reshape(B, 1, Lp, Lp)
            bspec = pl.BlockSpec(
                (1, 1, Lp, Lp),
                lambda c, _n=per_img: (c // _n, 0, 0, 0),
                memory_space=pltpu.VMEM)
        in_specs.append(bspec)
        args.append(bias_f)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, o_r = refs
            kern(q_r, k_r, v_r, b_r, o_r)
        else:
            q_r, k_r, v_r, o_r = refs
            kern(q_r, k_r, v_r, None, o_r)

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((cells, hpc, Lp, dh), q.dtype),
        grid=(cells,),
        in_specs=in_specs,
        out_specs=spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    out = out.reshape(B, nH, Lp, dh)
    return out[:, :, :L] if pad else out


def _flash_fwd_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      bias: Optional[jnp.ndarray],
                      interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (B, nH, L, dh); bias: (B, nHb, L, L) additive or None
    (nHb in {1, nH})."""
    B, nH, L, dh = q.shape
    scale = dh ** -0.5
    Lp = _round_up(L, TK)
    if Lp <= 1024:
        return _flash_fwd_onepass(q, k, v, bias, interpret)
    pad = Lp - L
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
    n_q = Lp // TQ
    # short sequences (the ViTCAP regime: 577-650 tokens) fit one K block in
    # VMEM — single-pass softmax, no online-rescale VPU overhead
    tk = Lp if Lp <= 1024 else TK
    n_k = Lp // tk

    kern = functools.partial(_kernel, n_k_tiles=n_k, tk=tk, scale=scale,
                             l_actual=L)
    grid = (B, nH, n_q)
    in_specs = [
        pl.BlockSpec((1, TQ, dh), lambda b, h, i: (b * nH + h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp, dh), lambda b, h, i: (b * nH + h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lp, dh), lambda b, h, i: (b * nH + h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q.reshape(B * nH, Lp, dh), k.reshape(B * nH, Lp, dh),
            v.reshape(B * nH, Lp, dh)]
    if bias is not None:
        nHb = bias.shape[1]
        bias_flat = jnp.broadcast_to(
            bias, (B, nHb if nHb == nH else 1, Lp, Lp))
        if nHb == nH:
            bias_flat = bias_flat.reshape(B * nH, Lp, Lp)
            bmap = lambda b, h, i: (b * nH + h, i, 0)
        else:
            bias_flat = bias_flat.reshape(B, Lp, Lp)
            bmap = lambda b, h, i: (b, i, 0)
        in_specs.append(pl.BlockSpec((1, TQ, Lp), bmap,
                                     memory_space=pltpu.VMEM))
        args.append(bias_flat)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, o_r = refs
            kern(q_r, k_r, v_r, b_r, o_r)
        else:
            q_r, k_r, v_r, o_r = refs
            kern(q_r, k_r, v_r, None, o_r)

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B * nH, Lp, dh), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TQ, dh), lambda b, h, i: (b * nH + h, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    out = out.reshape(B, nH, Lp, dh)
    return out[:, :, :L] if pad else out


def _bwd_onepass_kernel(q_ref, k_ref, v_ref, g_ref, bias_ref,
                        dq_ref, dk_ref, dv_ref, *, hpc: int, scale: float,
                        l_actual: int, lp: int):
    """dq/dk/dv with the whole (Lp, Lp) score matrix resident in VMEM,
    recomputed from q/k/v (no probs ever touch HBM — XLA's backward reads
    the materialized probability tensor, ~10 MB/head/block of traffic at
    the trunk shape; this reads the 4 (Lp, dh) operands and writes 3).

    Per head: S = scale*q.k^T (+bias, pad-key mask), P = softmax(S),
    dV = P^T.g, dP = g.V^T, dS = P*(dP - rowsum(dP*P)), dQ = scale*dS.K,
    dK = scale*dS^T.Q."""
    for h in range(hpc):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        g = g_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (Lp, Lp)
        if bias_ref is not None:
            s = s + bias_ref[0, h if bias_ref.shape[1] > 1 else 0].astype(
                jnp.float32)
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / jnp.maximum(l, 1e-30)                        # (Lp, Lp) f32
        pb = p.astype(v.dtype)
        # dV[k, d] = sum_q P[q, k] * g[q, d]
        dv = jax.lax.dot_general(pb, g, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dP[q, k] = sum_d g[q, d] * v[k, d]
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        r = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - r)).astype(q.dtype)                  # (Lp, Lp)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dK[k, d] = sum_q dS[q, k] * q[q, d]
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, h] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _flash_bwd_onepass(q, k, v, bias, g, interpret: bool):
    """(B, nH, L, dh) backward; returns (dq, dk, dv).  Short-sequence
    regime only (Lp <= 1024): S/P/dP live in VMEM per head; hpc=2 heads
    per cell keeps the f32 (Lp, Lp) intermediates (3 x 2.6 MB at Lp=640)
    plus 7 head-operand blocks inside the ~16 MB VMEM budget."""
    B, nH, L, dh = q.shape
    scale = dh ** -0.5
    Lp = _round_up(L, TK)
    pad = Lp - L
    if pad:
        pads = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, pads)
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)
        g = jnp.pad(g, pads)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
    hpc = next((h for h in (2, 1) if nH % h == 0))
    cells = B * nH // hpc
    qf = q.reshape(cells, hpc, Lp, dh)
    kf = k.reshape(cells, hpc, Lp, dh)
    vf = v.reshape(cells, hpc, Lp, dh)
    gf = g.reshape(cells, hpc, Lp, dh)
    kern = functools.partial(_bwd_onepass_kernel, hpc=hpc, scale=scale,
                             l_actual=L, lp=Lp)
    spec = pl.BlockSpec((1, hpc, Lp, dh), lambda c: (c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec, spec]
    args = [qf, kf, vf, gf]
    if bias is not None:
        nHb = bias.shape[1]
        if nHb == nH:
            bias_f = bias.reshape(cells, hpc, Lp, Lp)
            bspec = pl.BlockSpec((1, hpc, Lp, Lp), lambda c: (c, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        else:
            per_img = nH // hpc
            bias_f = bias.reshape(B, 1, Lp, Lp)
            bspec = pl.BlockSpec(
                (1, 1, Lp, Lp),
                lambda c, _n=per_img: (c // _n, 0, 0, 0),
                memory_space=pltpu.VMEM)
        in_specs.append(bspec)
        args.append(bias_f)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, g_r, b_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, b_r, dq_r, dk_r, dv_r)
        else:
            q_r, k_r, v_r, g_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, None, dq_r, dk_r, dv_r)

    oshape = jax.ShapeDtypeStruct((cells, hpc, Lp, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        body,
        out_shape=(oshape, oshape, oshape),
        grid=(cells,),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    out = [a.reshape(B, nH, Lp, dh) for a in (dq, dk, dv)]
    if pad:
        out = [a[:, :, :L] for a in out]
    return tuple(out)


# ---------------------------------------------------------------------------
# packed-layout kernels: q/k/v stay (B, L, nh*dh) end to end
# ---------------------------------------------------------------------------
#
# The (B, L, H) -> (B, nh, L, dh) head transposes XLA inserts around the
# per-head kernels move 64-wide minor-dim chunks — measured 2.8 ms per
# 56 MB transpose on v5e (20 GB/s, 40x below bandwidth) plus equally slow
# pad copies, ~110 ms/step at B=64.  These kernels take the packed layout
# directly and slice each head's dh columns inside VMEM.

def _fwd_packed_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref, *,
                       heads: int, dh: int, scale: float, l_actual: int,
                       lp: int, rate: float, nh: int, hpg: int):
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]                                  # (Lp, dh)
        k = k_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # (Lp, Lp)
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            # dropout AFTER normalization: out = (mask o softmax) @ v;
            # l is the pre-dropout denominator, so masking the numerator
            # before the divide is equivalent.  Salt = global head index
            # (grouping-independent: fwd unrolls 4 heads/cell, bwd 2).
            ghead = pl.program_id(0) * nh + pl.program_id(1) * hpg + h
            keep = _dropout_keep(seed_ref[0].astype(jnp.uint32),
                                 jnp.int32(ghead), rate, p.shape)
            p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, :, sl],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _fwd_packed_pair_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref,
                            o_ref, *, heads: int, dh: int, scale: float,
                            l_actual: int, lp: int, rate: float, nh: int,
                            hpg: int):
    """Pair-blockdiagonal variant of _fwd_packed_kernel (dh == 64, heads
    even): two heads per matmul via [[k1,0];[0,k2]] K/V packing, so every
    dot has a full 128-wide contraction/minor instead of 64 (the skinny
    per-head dots are MXU-tile-bound at 50%).  2x the flops at equal
    intrinsic cost, but 3 large dots per pair instead of 6 skinny ones.
    Segments stack on a 128-aligned LG row stride (ADVICE r4: the old lp
    stride put every f32 score-slab slice at a lane-unaligned offset,
    costing Mosaic relayouts; same scheme as fused_block's
    _attn_pairbd_kernel).  Gap rows (seg index in [l_actual, LG)) are
    masked with NEG.  Dropout lattices hash (row, col) coordinates, so
    bits at columns < lp are identical to the per-head kernel's
    (Lp, Lp)-shaped lattice — fwd/bwd and pair/per-head mask regeneration
    stay layout-independent (gap columns carry p == 0)."""
    dt = o_ref.dtype
    LG = _round_up(lp, 128)
    valid = _bd_valid(lp, LG, l_actual)
    bias2 = None
    if bias_ref is not None:
        bias2 = _bd_bias2(bias_ref[0, 0].astype(jnp.float32), lp, LG)
    for hp in range(0, heads, 2):
        sl1 = slice(hp * dh, (hp + 1) * dh)
        sl2 = slice((hp + 1) * dh, (hp + 2) * dh)
        qp = jnp.concatenate([q_ref[0, :, sl1], q_ref[0, :, sl2]],
                             axis=-1)                          # (Lp, 2dh)
        kbd = _bd_pack(k_ref[0, :, sl1], k_ref[0, :, sl2], lp, LG)
        s = _bd_scores(qp, kbd, valid, scale, bias2)           # (Lp, 2LG)
        p1, p2, l1, l2 = _bd_softmax(s, LG)
        if rate > 0.0:
            g0 = pl.program_id(0) * nh + pl.program_id(1) * hpg + hp
            seed = seed_ref[0].astype(jnp.uint32)
            inv = 1.0 / (1.0 - rate)
            keep1 = _dropout_keep(seed, jnp.int32(g0), rate, p1.shape)
            keep2 = _dropout_keep(seed, jnp.int32(g0 + 1), rate, p2.shape)
            p1 = jnp.where(keep1, p1, 0.0) * inv
            p2 = jnp.where(keep2, p2, 0.0) * inv
        pcat = jnp.concatenate([p1, p2], axis=-1).astype(dt)
        vbd = _bd_pack(v_ref[0, :, sl1], v_ref[0, :, sl2], lp, LG)
        o = jnp.dot(pcat, vbd, preferred_element_type=jnp.float32)
        o_ref[0, :, sl1] = (o[:, :dh] / jnp.maximum(l1, 1e-30)).astype(dt)
        o_ref[0, :, sl2] = (o[:, dh:] / jnp.maximum(l2, 1e-30)).astype(dt)


def _bwd_packed_pair_kernel(q_ref, k_ref, v_ref, g_ref, bias_ref, seed_ref,
                            dq_ref, dk_ref, dv_ref, *, heads: int, dh: int,
                            scale: float, l_actual: int, lp: int,
                            rate: float, nh: int, hpg: int):
    """Pair-blockdiagonal one-pass backward: same packing as the pair
    forward; all five dots (recompute scores, dV, dP, dQ, dK) run with
    128-wide contraction/minor.  The zero blocks in the packed K/V kill
    every cross-pair term, and garbage halves of the packed dV/dK outputs
    are simply not written back.  Segments stack on the 128-aligned LG
    row stride (see _fwd_packed_pair_kernel); math mirrors
    _bwd_packed_kernel line-for-line per segment."""
    dt = dq_ref.dtype
    LG = _round_up(lp, 128)
    valid = _bd_valid(lp, LG, l_actual)
    bias2 = None
    if bias_ref is not None:
        bias2 = _bd_bias2(bias_ref[0, 0].astype(jnp.float32), lp, LG)
    for hp in range(0, heads, 2):
        sl1 = slice(hp * dh, (hp + 1) * dh)
        sl2 = slice((hp + 1) * dh, (hp + 2) * dh)
        q1, q2 = q_ref[0, :, sl1], q_ref[0, :, sl2]
        g1, g2 = g_ref[0, :, sl1], g_ref[0, :, sl2]
        qp = jnp.concatenate([q1, q2], axis=-1)
        gp = jnp.concatenate([g1, g2], axis=-1)
        kbd = _bd_pack(k_ref[0, :, sl1], k_ref[0, :, sl2], lp, LG)
        vbd = _bd_pack(v_ref[0, :, sl1], v_ref[0, :, sl2], lp, LG)
        s = _bd_scores(qp, kbd, valid, scale, bias2)           # (Lp, 2LG)
        e1, e2, l1, l2 = _bd_softmax(s, LG)
        p1 = e1 / jnp.maximum(l1, 1e-30)
        p2 = e2 / jnp.maximum(l2, 1e-30)
        if rate > 0.0:
            g0 = pl.program_id(0) * nh + pl.program_id(1) * hpg + hp
            seed = seed_ref[0].astype(jnp.uint32)
            inv = 1.0 / (1.0 - rate)
            keep1 = _dropout_keep(seed, jnp.int32(g0), rate, p1.shape)
            keep2 = _dropout_keep(seed, jnp.int32(g0 + 1), rate, p2.shape)
            pd1 = jnp.where(keep1, p1, 0.0) * inv
            pd2 = jnp.where(keep2, p2, 0.0) * inv
        else:
            pd1, pd2 = p1, p2
        pdcat = jnp.concatenate([pd1, pd2], axis=-1).astype(dt)
        dvbd = jax.lax.dot_general(
            pdcat, gp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (2LG, 2dh)
        dv_ref[0, :, sl1] = dvbd[:lp, :dh].astype(dt)
        dv_ref[0, :, sl2] = dvbd[LG:LG + lp, dh:].astype(dt)
        dp = jax.lax.dot_general(
            gp, vbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Lp, 2LG)
        dp1, dp2 = dp[:, :LG], dp[:, LG:]
        if rate > 0.0:
            dp1 = jnp.where(keep1, dp1, 0.0) * inv
            dp2 = jnp.where(keep2, dp2, 0.0) * inv
        r1 = jnp.sum(dp1 * p1, axis=-1, keepdims=True)
        r2 = jnp.sum(dp2 * p2, axis=-1, keepdims=True)
        ds1 = (p1 * (dp1 - r1))
        ds2 = (p2 * (dp2 - r2))
        dscat = jnp.concatenate([ds1, ds2], axis=-1).astype(q1.dtype)
        dqp = jax.lax.dot_general(
            dscat, kbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Lp, 2dh)
        dq_ref[0, :, sl1] = (dqp[:, :dh] * scale).astype(dt)
        dq_ref[0, :, sl2] = (dqp[:, dh:] * scale).astype(dt)
        dkbd = jax.lax.dot_general(
            dscat, qp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (2LG, 2dh)
        dk_ref[0, :, sl1] = (dkbd[:lp, :dh] * scale).astype(dt)
        dk_ref[0, :, sl2] = (dkbd[LG:LG + lp, dh:] * scale).astype(dt)


def _bwd_packed_kernel(q_ref, k_ref, v_ref, g_ref, bias_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref, *, heads: int, dh: int,
                       scale: float, l_actual: int, lp: int, rate: float,
                       nh: int, hpg: int):
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        p = e / jnp.maximum(l, 1e-30)
        if rate > 0.0:
            # regenerate the forward's exact mask (same seed/salt/hash);
            # pd = dropout(p) feeds dV, and the dropout chain applies to
            # dP before the softmax backward in p
            ghead = pl.program_id(0) * nh + pl.program_id(1) * hpg + h
            keep = _dropout_keep(seed_ref[0].astype(jnp.uint32),
                                 jnp.int32(ghead), rate, p.shape)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p, 0.0) * inv
        else:
            pd = p
        dv = jax.lax.dot_general(pd.astype(v.dtype), g,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = jnp.where(keep, dp, 0.0) * inv
        r = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - r)).astype(q.dtype)
        dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _packed_pad(x, Lp):
    B, L, H = x.shape
    return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0))) if Lp > L else x


def _packed_specs(B, Lp, H, ng, Hg, bias, heads_per_group):
    spec = pl.BlockSpec((1, Lp, Hg), lambda b, g: (b, 0, g),
                        memory_space=pltpu.VMEM)
    bspec = None
    if bias is not None:
        bspec = pl.BlockSpec((1, 1, Lp, Lp), lambda b, g: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    return spec, bspec


def _seed_spec(ng):
    return pl.BlockSpec((1,), lambda b, g: (0,), memory_space=pltpu.SMEM)


def _flash_fwd_packed(q, k, v, bias, seed, nh, interpret, rate=0.0,
                      l_actual=0):
    """q/k/v: (B, L, H=nh*dh); bias None or (B, 1, L, L) per-image.

    l_actual > 0: the token axis is ALREADY padded (16-aligned) with that
    many valid rows — the caller hoisted the pad outside its block loop
    (per-call pad+unpad copies cost ~0.8 ms/block at the trunk train
    shape).  Packed kernels run whole-Lp single-tile dots, so 16 (bf16
    sublane) alignment suffices — 577 runs at 592 rows, not 640."""
    B, L, H = q.shape
    dh = H // nh
    scale = dh ** -0.5
    if l_actual:
        if L % 16:
            raise ValueError("pre-padded input must be 16-aligned")
        Lp = L
        L = l_actual
    else:
        Lp = _round_up(L, 16)
        q, k, v = (_packed_pad(a, Lp) for a in (q, k, v))
        if bias is not None and Lp > L:
            bias = jnp.pad(bias,
                           ((0, 0), (0, 0), (0, Lp - L), (0, Lp - L)))
    # head-group size: >4 unrolled full-matrix heads per cell explodes the
    # Mosaic program (the 12-head variant hung the remote compiler)
    hpg = min(4, nh)
    while nh % hpg:
        hpg -= 1
    ng = nh // hpg
    Hg = hpg * dh
    spec, bspec = _packed_specs(B, Lp, H, ng, Hg, bias, hpg)
    base = _fwd_packed_pair_kernel if (dh == 64 and hpg % 2 == 0) \
        else _fwd_packed_kernel
    kern = functools.partial(base, heads=hpg, dh=dh,
                             scale=scale, l_actual=L, lp=Lp, rate=rate,
                             nh=nh, hpg=hpg)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, s_r, o_r = refs
            kern(q_r, k_r, v_r, b_r, s_r, o_r)
        else:
            q_r, k_r, v_r, s_r, o_r = refs
            kern(q_r, k_r, v_r, None, s_r, o_r)

    in_specs = [spec, spec, spec] \
        + ([bspec] if bias is not None else []) + [_seed_spec(ng)]
    args = [q, k, v] + ([bias] if bias is not None else []) \
        + [jnp.reshape(seed, (1,)).astype(jnp.int32)]
    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), q.dtype),
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    if l_actual:
        return out                      # caller slices once, outside loop
    return out[:, :L] if Lp > L else out


def _flash_bwd_packed(q, k, v, bias, seed, g, nh, interpret, rate=0.0,
                      l_actual=0):
    B, L, H = q.shape
    dh = H // nh
    scale = dh ** -0.5
    if l_actual:
        if L % 16:
            raise ValueError("pre-padded input must be 16-aligned")
        Lp = L
        L = l_actual
    else:
        Lp = _round_up(L, 16)
        q, k, v, g = (_packed_pad(a, Lp) for a in (q, k, v, g))
        if bias is not None and Lp > L:
            bias = jnp.pad(bias,
                           ((0, 0), (0, 0), (0, Lp - L), (0, Lp - L)))
    # 7 resident blocks (4 in + 3 out) and a heavier per-head body than
    # the forward: keep the unroll at 2 heads per cell
    hpg = min(2, nh)
    while nh % hpg:
        hpg -= 1
    ng = nh // hpg
    Hg = hpg * dh
    spec, bspec = _packed_specs(B, Lp, H, ng, Hg, bias, hpg)
    base = _bwd_packed_pair_kernel if (dh == 64 and hpg % 2 == 0) \
        else _bwd_packed_kernel
    kern = functools.partial(base, heads=hpg, dh=dh,
                             scale=scale, l_actual=L, lp=Lp, rate=rate,
                             nh=nh, hpg=hpg)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, g_r, b_r, s_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, b_r, s_r, dq_r, dk_r, dv_r)
        else:
            q_r, k_r, v_r, g_r, s_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, None, s_r, dq_r, dk_r, dv_r)

    in_specs = [spec] * 4 \
        + ([bspec] if bias is not None else []) + [_seed_spec(ng)]
    args = [q, k, v, g] + ([bias] if bias is not None else []) \
        + [jnp.reshape(seed, (1,)).astype(jnp.int32)]
    oshape = jax.ShapeDtypeStruct((B, Lp, H), q.dtype)
    dq, dk, dv = pl.pallas_call(
        body,
        out_shape=(oshape, oshape, oshape),
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=(spec, spec, spec),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    if not l_actual and Lp > L:
        dq, dk, dv = dq[:, :L], dk[:, :L], dv[:, :L]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention_packed(q, k, v, bias, seed, num_heads,
                           interpret=False, dropout_rate=0.0,
                           l_actual=0):
    """Packed-layout fused attention: q/k/v (B, L, H), bias None or
    (B, 1, L, L) additive, seed an int32 scalar array (ignored when
    dropout_rate == 0), returns (B, L, H).  No head transposes touch HBM
    in either direction; backward is the one-pass Pallas recompute
    kernel.

    dropout_rate > 0 applies attention-prob dropout (reference
    BertSelfAttention modeling_bert.py:139-141) INSIDE the kernel via a
    counter-based hash seeded by `seed`: the backward regenerates the
    identical mask, so no (B, nh, L, L) mask or prob tensor ever exists
    in HBM.

    l_actual > 0 marks the inputs as already 16-aligned-padded with that
    many valid rows; the (B, Lpadded, H) output is returned unsliced."""
    return _flash_fwd_packed(q, k, v, bias, seed, num_heads, interpret,
                             dropout_rate, l_actual)


def _packed_fwd(q, k, v, bias, seed, num_heads, interpret, dropout_rate,
                l_actual):
    out = _flash_fwd_packed(q, k, v, bias, seed, num_heads, interpret,
                            dropout_rate, l_actual)
    return out, (q, k, v, bias, seed)


def _packed_bwd(num_heads, interpret, dropout_rate, l_actual, res, gout):
    q, k, v, bias, seed = res
    dq, dk, dv = _flash_bwd_packed(q, k, v, bias, seed, gout, num_heads,
                                   interpret, dropout_rate, l_actual)
    import numpy as _np
    dseed = _np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, (None if bias is None else jnp.zeros_like(bias)), \
        dseed


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def _xla_attention(q, k, v, bias):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (dh ** -0.5)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, bias=None, interpret=False):
    """(B, nH, L, dh) fused attention; bias (B, 1|nH, L, L) additive."""
    return _flash_fwd_pallas(q, k, v, bias, interpret)


def _fwd(q, k, v, bias, interpret):
    return _flash_fwd_pallas(q, k, v, bias, interpret), (q, k, v, bias)


def _bwd(interpret, res, g):
    q, k, v, bias = res
    Lp = _round_up(q.shape[2], TK)
    if Lp <= 1024:
        # fused recompute backward: no (B, nH, L, L) probability tensor
        # ever reaches HBM (XLA's backward reads the materialized probs —
        # measured 16 ms/block fwd+bwd at the trunk shape vs ~4 for this)
        dq, dk, dv = _flash_bwd_onepass(q, k, v, bias, g, interpret)
        # bias is the (constant) mask tensor; its cotangent is never
        # consumed (masks are not trainable) and the zeros are DCE'd
        return dq, dk, dv, (None if bias is None
                            else jnp.zeros_like(bias))
    # long-sequence fallback: recompute with plain XLA ops
    def f(q, k, v, bias):
        return _xla_attention(q, k, v, bias)
    if bias is None:
        _, vjp = jax.vjp(lambda a, b, c: f(a, b, c, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)


def flash_bwd_packed_slab(slab, seed, g, nh, interpret, rate=0.0,
                          l_actual=0, bias=None):
    """One-pass packed attention backward taking the fused (B, Lp, 3H)
    [q|k|v] qkv SLAB directly (the split-train block's kernel-1 output):
    the slab is passed three times with column-offset index maps, so each
    grid cell DMAs exactly its (Lp, Hg) q/k/v triplet — no (B, Lp, H)
    slice copies materialize in HBM (three 58 MB copies per block at the
    trunk train shape otherwise).  Returns (dq, dk, dv) as separate
    arrays; callers fold them into dW/dx via per-third GEMMs instead of
    concatenating a dslab (another 174 MB round-trip saved).

    Bias-free (the ViT trunk regime).  l_actual as in _flash_bwd_packed;
    the slab must already be at its padded length."""
    B, Lp, H3 = slab.shape
    H = H3 // 3
    dh = H // nh
    scale = dh ** -0.5
    if Lp % 16:
        raise ValueError("slab token axis must be 16-aligned")
    L = l_actual or Lp
    hpg = min(2, nh)
    while nh % hpg:
        hpg -= 1
    ng = nh // hpg
    Hg = hpg * dh
    qspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, gi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, ng + gi),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, 2 * ng + gi),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, gi),
                         memory_space=pltpu.VMEM)
    bspec = None
    if bias is not None:
        bspec = pl.BlockSpec((1, 1, Lp, Lp), lambda b, gi: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    base = _bwd_packed_pair_kernel if (dh == 64 and hpg % 2 == 0) \
        else _bwd_packed_kernel
    kern = functools.partial(base, heads=hpg, dh=dh, scale=scale,
                             l_actual=L, lp=Lp, rate=rate, nh=nh, hpg=hpg)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, g_r, b_r, s_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, b_r, s_r, dq_r, dk_r, dv_r)
        else:
            q_r, k_r, v_r, g_r, s_r, dq_r, dk_r, dv_r = refs
            kern(q_r, k_r, v_r, g_r, None, s_r, dq_r, dk_r, dv_r)

    in_specs = [qspec, kspec, vspec, ospec] \
        + ([bspec] if bias is not None else []) + [_seed_spec(ng)]
    args = [slab, slab, slab, g] + ([bias] if bias is not None else []) \
        + [jnp.reshape(seed, (1,)).astype(jnp.int32)]
    oshape = jax.ShapeDtypeStruct((B, Lp, H), slab.dtype)
    return pl.pallas_call(
        body,
        out_shape=(oshape, oshape, oshape),
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=(ospec, ospec, ospec),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def flash_fwd_packed_slab(slab, bias, seed, nh, interpret, rate=0.0,
                          l_actual=0):
    """Packed attention forward taking the fused (B, Lp, 3H) [q|k|v] slab
    directly (column-offset index maps — see flash_bwd_packed_slab).
    bias: None or (B, 1, Lp, Lp) additive, already at the padded length.
    Same kernels/salting as _flash_fwd_packed, so dropout bits regenerate
    identically in the packed backward."""
    B, Lp, H3 = slab.shape
    H = H3 // 3
    dh = H // nh
    scale = dh ** -0.5
    if Lp % 16:
        raise ValueError("slab token axis must be 16-aligned")
    L = l_actual or Lp
    hpg = min(4, nh)
    while nh % hpg:
        hpg -= 1
    ng = nh // hpg
    Hg = hpg * dh
    qspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, gi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, ng + gi),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, 2 * ng + gi),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, Lp, Hg), lambda b, gi: (b, 0, gi),
                         memory_space=pltpu.VMEM)
    bspec = None
    if bias is not None:
        bspec = pl.BlockSpec((1, 1, Lp, Lp), lambda b, gi: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    base = _fwd_packed_pair_kernel if (dh == 64 and hpg % 2 == 0) \
        else _fwd_packed_kernel
    kern = functools.partial(base, heads=hpg, dh=dh, scale=scale,
                             l_actual=L, lp=Lp, rate=rate, nh=nh, hpg=hpg)

    def body(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, s_r, o_r = refs
            kern(q_r, k_r, v_r, b_r, s_r, o_r)
        else:
            q_r, k_r, v_r, s_r, o_r = refs
            kern(q_r, k_r, v_r, None, s_r, o_r)

    in_specs = [qspec, kspec, vspec] \
        + ([bspec] if bias is not None else []) + [_seed_spec(ng)]
    args = [slab, slab, slab] + ([bias] if bias is not None else []) \
        + [jnp.reshape(seed, (1,)).astype(jnp.int32)]
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), slab.dtype),
        grid=(B, ng),
        in_specs=in_specs,
        out_specs=ospec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
