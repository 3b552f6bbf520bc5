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
    )(*args)
    out = out.reshape(B, nH, Lp, dh)
    return out[:, :, :L] if pad else out


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
    # recompute-based backward with plain XLA ops (standard softmax grad)
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
