"""Fused ViT attention half-block Pallas kernel.

One kernel per trunk block computes LN1 -> fused-QKV projection -> 12-head
self-attention -> output projection -> residual add, entirely in VMEM.
Replaces (on TPU inference traces) the XLA chain that round-trips q/k/v and
the attention output through HBM and relayouts (B,L,H)->(B,h,L,dh) three
times per block:

  XLA path traffic/block  ~ x + qkv(w+r) + heads relayout + o(w+r) + proj
  fused kernel traffic    ~ x(r) + weights + out(w)          (~4x less)

The attention math itself is the same one-pass softmax as
ops/flash_attention.py (whole K resident, f32 score accumulation, padded
tail keys masked), so outputs match the XLA reference to bf16 tolerance.

Reference behavior covered: timm Attention + Block without attention_mask
(vision_transformer.py:161-250); the masked/bias path (fusion decoder)
keeps using ops/flash_attention.py.

Backward = custom_vjp recomputing with plain XLA ops (training keeps XLA
anyway; the kernel auto-engages only inside ops.inference_mode()).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

NEG = -1e30
TQ = 128            # q-row tile inside the kernel (keeps the f32 score
                    # slab at (TQ, Lp) instead of (Lp, Lp))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_len(L: int) -> int:
    """Padded token length for the fused kernels.  Single-q-tile slabs
    (L <= 1024) only need SUBLANE alignment — bf16 tiles at (16, 128), so
    577 pads to 592 instead of 640, cutting ~7% of every matmul's rows
    (measured 5.42 -> 5.06 ms/block at B=64, L=577).  Longer L keeps TQ
    alignment for the q-tile loop."""
    lp = max(64, _round_up(L, 16))   # >=64: the vit_block dispatch gate —
    # pre-padded inputs must still engage the fused path
    return lp if lp <= 1024 else _round_up(L, TQ)


def _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, o_ref, *, num_heads: int, eps: float, l_actual: int,
            lp: int):
    H = x_ref.shape[-1]
    hd = H // num_heads
    x = x_ref[0]                                     # (Lp, H) compute dtype

    # LayerNorm in f32 (matches models.layers.layer_norm numerics)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)

    # Mosaic matmuls must accumulate in f32; cast the result back
    qkv = jnp.dot(ln, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    qkv = qkv + bqkv_ref[0].astype(x.dtype)          # (Lp, 3H)

    scale = hd ** -0.5
    # single q-tile when the whole (Lp, Lp) f32 score slab fits comfortably
    # in VMEM: measured 2.86 vs 3.08 ms/block at the trunk shape (fewer,
    # larger matmuls; Mosaic pipelines heads against each other)
    tq = lp if lp <= 1024 else TQ
    n_qt = lp // tq
    out_tiles = []
    for qt in range(n_qt):
        rows = slice(qt * tq, (qt + 1) * tq)
        heads = []
        for h in range(num_heads):
            q = qkv[rows, h * hd:(h + 1) * hd]               # (TQ, hd)
            k = qkv[:, H + h * hd:H + (h + 1) * hd]          # (Lp, hd)
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]  # (Lp, hd)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (TQ, Lp)
            if l_actual < lp:
                kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kidx < l_actual, s, NEG)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(x.dtype), v,
                        preferred_element_type=jnp.float32)
            heads.append((o / jnp.maximum(l, 1e-30)).astype(x.dtype))
        out_tiles.append(jnp.concatenate(heads, axis=-1))    # (TQ, H)
    attn = jnp.concatenate(out_tiles, axis=0)                # (Lp, H)

    proj = jnp.dot(attn, wproj_ref[:],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = x + proj + bproj_ref[0].astype(x.dtype)


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) gelu for Pallas TPU, which has no erf/erfc lowering:
    Abramowitz-Stegun 7.1.26 rational polynomial (|err| <= 1.5e-7, far
    below compute-dtype noise and the XLA-parity test tolerance)."""
    xf = x.astype(jnp.float32)
    z = xf * jnp.float32(0.7071067811865476)          # x / sqrt(2)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.sign(z) * erf_abs
    return (0.5 * xf * (1.0 + erf)).astype(x.dtype)


def _block_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                  bproj_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                  wfc2_ref, bfc2_ref, o_ref, *, num_heads: int, eps: float,
                  l_actual: int, lp: int):
    """Whole ViT block in one kernel: attention half (same math as _kernel)
    + LN2 + MLP(gelu) + residual.  x never round-trips HBM between the two
    halves."""
    _kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, o_ref, num_heads=num_heads, eps=eps,
            l_actual=l_actual, lp=lp)
    x = o_ref[0]                                     # attn residual output
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * ln2s_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(ln, wfc1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = _gelu_exact(h + bfc1_ref[0].astype(x.dtype))
    y = jnp.dot(h, wfc2_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)


def _qkv_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref, *,
                eps: float):
    """LN1 + fused-qkv projection -> (Lp, 3H) slab.  Pure-matmul kernel:
    runs at tail-kernel efficiency (~70% MFU); keeping it OUT of the
    attention kernel is the point of the split (see _split_block_fwd)."""
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = qkv + bqkv_ref[0].astype(x.dtype)


def _attn_perhead_kernel(slab_ref, o_ref, *, num_heads: int, l_actual: int,
                         lp: int):
    """12-head one-pass attention over a (Lp, 3H) qkv slab."""
    qkv = slab_ref[0]
    H = o_ref.shape[-1]
    hd = H // num_heads
    scale = hd ** -0.5
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, H + h * hd:H + (h + 1) * hd]
        v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(qkv.dtype), v,
                    preferred_element_type=jnp.float32)
        heads.append((o / jnp.maximum(l, 1e-30)).astype(qkv.dtype))
    o_ref[0] = jnp.concatenate(heads, axis=-1)


def _attn_pairbd_kernel(slab_ref, o_ref, *, num_heads: int, l_actual: int,
                        lp: int):
    """Two heads per matmul via block-diagonal K/V packing (hd == 64).

    Per head pair: scores = [q_h q_h+1] (Lp, 128) @ K_bd^T where K_bd is
    [[k_h, 0]; [0, k_h+1]] stacked on a 128-aligned LG-row segment stride.
    The contraction is 128-wide (full MXU tile) at 2x the flops — which
    equals the hd=64 half-tile intrinsic cost — but runs as 6 large
    matmuls instead of 24 skinny ones.  Measured at the trunk shape
    (B=64, Lp=592): 4.43 vs 4.64 ms/block per-head, outputs bit-identical
    (benchmarks/ablate_attn2.py).  Gap rows (seg index in [l_actual, LG))
    are masked with NEG, so padding and the gap region never contribute."""
    from .flash_attention import (_bd_pack, _bd_scores, _bd_softmax,
                                  _bd_valid)
    qkv = slab_ref[0]
    H = o_ref.shape[-1]
    hd = H // num_heads
    scale = hd ** -0.5
    dt = qkv.dtype
    LG = _round_up(lp, 128)
    valid = _bd_valid(lp, LG, l_actual)
    outs = []
    for h in range(0, num_heads, 2):
        qp = jnp.concatenate([qkv[:, h * hd:(h + 1) * hd],
                              qkv[:, (h + 1) * hd:(h + 2) * hd]],
                             axis=-1)                          # (Lp, 2hd)
        kbd = _bd_pack(qkv[:, H + h * hd:H + (h + 1) * hd],
                       qkv[:, H + (h + 1) * hd:H + (h + 2) * hd], lp, LG)
        s = _bd_scores(qp, kbd, valid, scale)                  # (Lp, 2LG)
        p1, p2, l1, l2 = _bd_softmax(s, LG)
        pcat = jnp.concatenate([p1, p2], axis=-1).astype(dt)
        vbd = _bd_pack(qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd],
                       qkv[:, 2 * H + (h + 1) * hd:2 * H + (h + 2) * hd],
                       lp, LG)
        o = jnp.dot(pcat, vbd, preferred_element_type=jnp.float32)
        o1 = o[:, :hd] / jnp.maximum(l1, 1e-30)
        o2 = o[:, hd:] / jnp.maximum(l2, 1e-30)
        outs.append(jnp.concatenate([o1, o2], axis=-1).astype(dt))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _tail_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                 ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, o_ref, *,
                 eps: float):
    """proj + residual + LN2 + MLP(gelu) + residual."""
    x = x_ref[0]
    proj = jnp.dot(attn_ref[0], wproj_ref[:],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + proj + bproj_ref[0].astype(x.dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * ln2s_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(ln, wfc1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = _gelu_exact(h + bfc1_ref[0].astype(x.dtype))
    y = jnp.dot(h, wfc2_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)


def _split_block_fwd(x: jnp.ndarray, p: Params, num_heads: int,
                     eps: float, interpret: bool, L: int, Lp: int
                     ) -> jnp.ndarray:
    """Three-kernel split ViT block: [LN1+qkv] | [attention] | [tail].

    The monolithic whole-block kernel schedules its attention section
    ~2x slower when it shares the kernel with the MLP matmuls (measured:
    5.05 ms/block mono vs 4.43 split+pairbd at B=64 Lp=592, bit-identical
    outputs — benchmarks/ablate_split.py, ablate_attn2.py).  Splitting
    pays two extra HBM round trips (qkv slab + attn out, ~0.3 ms/block of
    overlappable DMA at B=64) to keep every kernel in its fast regime."""
    B = x.shape[0]
    H = x.shape[-1]
    dt = x.dtype
    I = p["mlp"]["fc1"]["kernel"].shape[1]
    hd = H // num_heads
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, Lp, 3 * H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    slab = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, Lp, 3 * H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=sspec, interpret=interpret, compiler_params=cp,
    )(x, row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
      p["attn"]["qkv"]["kernel"].astype(dt), row(p["attn"]["qkv"]["bias"]))

    if hd == 64 and num_heads % 2 == 0:
        attn_kern = functools.partial(_attn_pairbd_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    else:
        attn_kern = functools.partial(_attn_perhead_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    attn = pl.pallas_call(
        attn_kern, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,), in_specs=[sspec], out_specs=xspec, interpret=interpret,
        compiler_params=cp)(slab)

    return pl.pallas_call(
        functools.partial(_tail_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=xspec, interpret=interpret, compiler_params=cp,
    )(x, attn, p["attn"]["proj"]["kernel"].astype(dt),
      row(p["attn"]["proj"]["bias"]),
      row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
      p["mlp"]["fc1"]["kernel"].astype(dt), row(p["mlp"]["fc1"]["bias"]),
      p["mlp"]["fc2"]["kernel"].astype(dt), row(p["mlp"]["fc2"]["bias"]))


def _fused_block_fwd(x: jnp.ndarray, p: Params, num_heads: int,
                     eps: float, interpret: bool,
                     l_actual: int = 0) -> jnp.ndarray:
    """Full-block fusion entry: p is a ViT block param tree
    {'norm1','attn':{'qkv','proj'},'norm2','mlp':{'fc1','fc2'}}.

    l_actual > 0 marks x as ALREADY padded to pad_len (16-aligned for
    L <= 1024, e.g. 577 -> 592; TQ-aligned beyond) with l_actual valid
    rows — the caller hoisted the pad outside a block loop (a pad+unpad
    pair costs ~0.15 ms/block at the trunk shape).

    Single-q-tile shapes (Lp <= 1024) run the three-kernel split pipeline
    (_split_block_fwd); longer sequences keep the monolithic q-tiled
    kernel."""
    B, L, H = x.shape
    if l_actual:
        if L % 16 or (L > 1024 and L % TQ):
            raise ValueError("pre-padded input must be pad_len-aligned")
        Lp, pad = L, 0
        L = l_actual
    else:
        Lp = pad_len(L)
        pad = Lp - L
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    if Lp <= 1024:
        out = _split_block_fwd(x, p, num_heads, eps, interpret, L, Lp)
        return out[:, :L] if pad else out
    dt = x.dtype
    kern = functools.partial(_block_kernel, num_heads=num_heads, eps=eps,
                             l_actual=L, lp=Lp)
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    I = p["mlp"]["fc1"]["kernel"].shape[1]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H), wspec((H, H)), bspec(H),
                  bspec(H), bspec(H), wspec((H, I)), bspec(I),
                  wspec((I, H)), bspec(H)],
        out_specs=xspec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x,
      row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
      p["attn"]["qkv"]["kernel"].astype(dt), row(p["attn"]["qkv"]["bias"]),
      p["attn"]["proj"]["kernel"].astype(dt), row(p["attn"]["proj"]["bias"]),
      row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
      p["mlp"]["fc1"]["kernel"].astype(dt), row(p["mlp"]["fc1"]["bias"]),
      p["mlp"]["fc2"]["kernel"].astype(dt), row(p["mlp"]["fc2"]["bias"]))
    return out[:, :L] if pad else out


def _fused_fwd(x: jnp.ndarray, lns, lnb, wqkv, bqkv, wproj, bproj,
               num_heads: int, eps: float, interpret: bool) -> jnp.ndarray:
    B, L, H = x.shape
    Lp = pad_len(L)
    pad = Lp - L
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    dt = x.dtype
    wqkv = wqkv.astype(dt)
    wproj = wproj.astype(dt)
    kern = functools.partial(_kernel, num_heads=num_heads, eps=eps,
                             l_actual=L, lp=Lp)
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H), wspec((H, H)), bspec(H)],
        out_specs=xspec,
        interpret=interpret,
        # weights + qkv + f32 intermediates exceed the 16MB default scoped
        # limit; v5e has 128MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, row(lns), row(lnb), wqkv, row(bqkv), wproj, row(bproj))
    return out[:, :L] if pad else out


def _xla_reference(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps):
    from ..models.layers import layer_norm, mha
    ln = layer_norm({"scale": lns, "bias": lnb}, x, eps)
    qkv = jnp.dot(ln, wqkv.astype(x.dtype),
                  preferred_element_type=x.dtype) + bqkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = mha(q, k, v, num_heads)
    return x + jnp.dot(o, wproj.astype(x.dtype),
                       preferred_element_type=x.dtype) + bproj.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_vit_attn(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                   num_heads: int, eps: float, interpret: bool = False):
    """x + proj(attention(LN1(x))) — the attention half of a ViT block.

    x: (B, L, H); lns/lnb: (H,); wqkv: (H, 3H); bqkv: (3H,);
    wproj: (H, H); bproj: (H,).
    """
    return _fused_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj,
                      num_heads, eps, interpret)


def _vjp_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps,
             interpret):
    y = _fused_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps,
                   interpret)
    return y, (x, lns, lnb, wqkv, bqkv, wproj, bproj)


def _vjp_bwd(num_heads, eps, interpret, res, g):
    x, lns, lnb, wqkv, bqkv, wproj, bproj = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, num_heads=num_heads, eps=eps),
        x, lns, lnb, wqkv, bqkv, wproj, bproj)
    return vjp(g)


fused_vit_attn.defvjp(_vjp_fwd, _vjp_bwd)


def vit_attention_residual(p_block: Params, x: jnp.ndarray, num_heads: int,
                           ln_eps: float, interpret: bool = False
                           ) -> jnp.ndarray:
    """Param-tree adapter: p_block = {'norm1','attn':{'qkv','proj'}}."""
    return fused_vit_attn(
        x, p_block["norm1"]["scale"], p_block["norm1"]["bias"],
        p_block["attn"]["qkv"]["kernel"], p_block["attn"]["qkv"]["bias"],
        p_block["attn"]["proj"]["kernel"], p_block["attn"]["proj"]["bias"],
        num_heads, ln_eps, interpret)


def _bert_kernel(x_ref, bias_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 ln1s_ref, ln1b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                 ln2s_ref, ln2b_ref, o_ref, *, num_heads: int, eps: float,
                 l_actual: int, lp: int):
    """Post-norm BERT layer (reference modeling_bert.py:422-437) with an
    additive attention bias, one grid cell per batch row.  Same one-pass
    attention structure as _kernel but: no pre-LN (qkv projects raw x),
    residual LNs AFTER each sublayer, bias tile added to the scores."""
    H = x_ref.shape[-1]
    hd = H // num_heads
    x = x_ref[0]                                     # (Lp, H)
    dt = x.dtype

    qkv = jnp.dot(x, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(dt)
    qkv = qkv + bqkv_ref[0].astype(dt)               # (Lp, 3H)

    scale = hd ** -0.5
    # single q-tile when the whole (Lp, Lp) f32 score slab fits comfortably
    # in VMEM: measured 2.86 vs 3.08 ms/block at the trunk shape (fewer,
    # larger matmuls; Mosaic pipelines heads against each other)
    tq = lp if lp <= 1024 else TQ
    n_qt = lp // tq
    out_tiles = []
    for qt in range(n_qt):
        rows = slice(qt * tq, (qt + 1) * tq)
        heads = []
        for h in range(num_heads):
            q = qkv[rows, h * hd:(h + 1) * hd]
            k = qkv[:, H + h * hd:H + (h + 1) * hd]
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = s + bias_ref[0, 0, rows].astype(jnp.float32)
            if l_actual < lp:
                kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kidx < l_actual, s, NEG)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
            heads.append((o / jnp.maximum(l, 1e-30)).astype(dt))
        out_tiles.append(jnp.concatenate(heads, axis=-1))
    attn = jnp.concatenate(out_tiles, axis=0)        # (Lp, H)

    def post_ln(y_f32, res, s_ref, b_ref):
        yf = y_f32 + res.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        out = (yf - mean) * jax.lax.rsqrt(var + eps)
        return (out * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(dt)

    attn = jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32)
    attn = attn + bo_ref[0].astype(jnp.float32)
    y = post_ln(attn, x, ln1s_ref, ln1b_ref)
    h1 = jnp.dot(y, wfc1_ref[:], preferred_element_type=jnp.float32)
    h1 = _gelu_exact((h1 + bfc1_ref[0].astype(jnp.float32)).astype(dt))
    z = jnp.dot(h1, wfc2_ref[:], preferred_element_type=jnp.float32)
    z = z + bfc2_ref[0].astype(jnp.float32)
    o_ref[0] = post_ln(z, y, ln2s_ref, ln2b_ref)


def _bert_qkv_kernel(x_ref, wqkv_ref, bqkv_ref, o_ref):
    """Raw-x fused-qkv projection (post-norm BERT: no pre-LN)."""
    x = x_ref[0]
    qkv = jnp.dot(x, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = qkv + bqkv_ref[0].astype(x.dtype)


def _bert_attn_pairbd_kernel(slab_ref, bias_ref, o_ref, *, num_heads: int,
                             l_actual: int, lp: int):
    """Pair-blockdiagonal attention with additive (head-broadcast) bias —
    same packing as _attn_pairbd_kernel; the (Lp, Lp) bias tile is placed
    once into both LG segments of the (Lp, 2LG) score layout."""
    from .flash_attention import (_bd_bias2, _bd_pack, _bd_scores,
                                  _bd_softmax, _bd_valid)
    qkv = slab_ref[0]
    H = o_ref.shape[-1]
    hd = H // num_heads
    scale = hd ** -0.5
    dt = qkv.dtype
    LG = _round_up(lp, 128)
    bias2 = _bd_bias2(bias_ref[0, 0].astype(jnp.float32), lp, LG)
    valid = _bd_valid(lp, LG, l_actual)
    outs = []
    for h in range(0, num_heads, 2):
        qp = jnp.concatenate([qkv[:, h * hd:(h + 1) * hd],
                              qkv[:, (h + 1) * hd:(h + 2) * hd]],
                             axis=-1)
        kbd = _bd_pack(qkv[:, H + h * hd:H + (h + 1) * hd],
                       qkv[:, H + (h + 1) * hd:H + (h + 2) * hd], lp, LG)
        s = _bd_scores(qp, kbd, valid, scale, bias2)
        p1, p2, l1, l2 = _bd_softmax(s, LG)
        pcat = jnp.concatenate([p1, p2], axis=-1).astype(dt)
        vbd = _bd_pack(qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd],
                       qkv[:, 2 * H + (h + 1) * hd:2 * H + (h + 2) * hd],
                       lp, LG)
        o = jnp.dot(pcat, vbd, preferred_element_type=jnp.float32)
        o1 = o[:, :hd] / jnp.maximum(l1, 1e-30)
        o2 = o[:, hd:] / jnp.maximum(l2, 1e-30)
        outs.append(jnp.concatenate([o1, o2], axis=-1).astype(dt))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


def _bert_attn_perhead_kernel(slab_ref, bias_ref, o_ref, *, num_heads: int,
                              l_actual: int, lp: int):
    qkv = slab_ref[0]
    H = o_ref.shape[-1]
    hd = H // num_heads
    scale = hd ** -0.5
    dt = qkv.dtype
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, H + h * hd:H + (h + 1) * hd]
        v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, 0].astype(jnp.float32)
        if l_actual < lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < l_actual, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
        heads.append((o / jnp.maximum(l, 1e-30)).astype(dt))
    o_ref[0] = jnp.concatenate(heads, axis=-1)


def _bert_tail_kernel(x_ref, attn_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
                      wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, ln2s_ref,
                      ln2b_ref, o_ref, *, eps: float):
    """out-dense + post-LN1 + MLP(gelu) + post-LN2 (post-norm residuals,
    f32 sublayer accumulation like _bert_kernel)."""
    x = x_ref[0]
    dt = x.dtype

    def post_ln(y_f32, res, s_ref, b_ref):
        yf = y_f32 + res.astype(jnp.float32)
        mean = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(yf - mean), axis=-1, keepdims=True)
        out = (yf - mean) * jax.lax.rsqrt(var + eps)
        return (out * s_ref[0].astype(jnp.float32)
                + b_ref[0].astype(jnp.float32)).astype(dt)

    attn = jnp.dot(attn_ref[0], wo_ref[:],
                   preferred_element_type=jnp.float32)
    attn = attn + bo_ref[0].astype(jnp.float32)
    y = post_ln(attn, x, ln1s_ref, ln1b_ref)
    h1 = jnp.dot(y, wfc1_ref[:], preferred_element_type=jnp.float32)
    h1 = _gelu_exact((h1 + bfc1_ref[0].astype(jnp.float32)).astype(dt))
    z = jnp.dot(h1, wfc2_ref[:], preferred_element_type=jnp.float32)
    z = z + bfc2_ref[0].astype(jnp.float32)
    o_ref[0] = post_ln(z, y, ln2s_ref, ln2b_ref)


def _bert_split_fwd(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                    num_heads: int, eps: float, interpret: bool,
                    L: int, Lp: int) -> jnp.ndarray:
    """Three-kernel split BERT layer (same rationale as _split_block_fwd:
    attention in its own kernel runs ~2x faster than co-resident with the
    MLP; measured on the ViT trunk, same kernel structure here)."""
    B = x.shape[0]
    H = x.shape[-1]
    dt = x.dtype
    hd = H // num_heads
    ps = p["attention"]["self"]
    wqkv = jnp.concatenate([ps["query"]["kernel"], ps["key"]["kernel"],
                            ps["value"]["kernel"]], axis=1).astype(dt)
    bqkv = jnp.concatenate([ps["query"]["bias"], ps["key"]["bias"],
                            ps["value"]["bias"]])
    po = p["attention"]["output"]
    I = p["intermediate"]["dense"]["kernel"].shape[1]
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, Lp, 3 * H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, Lp, Lp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    slab = pl.pallas_call(
        _bert_qkv_kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lp, 3 * H), dt),
        grid=(B,),
        in_specs=[xspec, wspec((H, 3 * H)), bspec(3 * H)],
        out_specs=sspec, interpret=interpret, compiler_params=cp,
    )(x, wqkv, row(bqkv))

    if hd == 64 and num_heads % 2 == 0:
        attn_kern = functools.partial(_bert_attn_pairbd_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    else:
        attn_kern = functools.partial(_bert_attn_perhead_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    attn = pl.pallas_call(
        attn_kern, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,), in_specs=[sspec, mspec], out_specs=xspec,
        interpret=interpret, compiler_params=cp)(slab,
                                                 bias.astype(jnp.float32))

    return pl.pallas_call(
        functools.partial(_bert_tail_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H), bspec(H), bspec(H)],
        out_specs=xspec, interpret=interpret, compiler_params=cp,
    )(x, attn, po["dense"]["kernel"].astype(dt), row(po["dense"]["bias"]),
      row(po["LayerNorm"]["scale"]), row(po["LayerNorm"]["bias"]),
      p["intermediate"]["dense"]["kernel"].astype(dt),
      row(p["intermediate"]["dense"]["bias"]),
      p["output"]["dense"]["kernel"].astype(dt),
      row(p["output"]["dense"]["bias"]),
      row(p["output"]["LayerNorm"]["scale"]),
      row(p["output"]["LayerNorm"]["bias"]))


def _fused_bert_fwd(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                    num_heads: int, eps: float, interpret: bool
                    ) -> jnp.ndarray:
    """p: BERT layer param tree {'attention':{'self':{query,key,value},
    'output':{dense,LayerNorm}}, 'intermediate':{dense},
    'output':{dense,LayerNorm}}; bias (B,1,L,L) additive."""
    B, L, H = x.shape
    Lp = pad_len(L)
    pad = Lp - L
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad), (0, pad)))
    if Lp <= 1024:
        out = _bert_split_fwd(p, x, bias, num_heads, eps, interpret, L, Lp)
        return out[:, :L] if pad else out
    dt = x.dtype
    ps = p["attention"]["self"]
    wqkv = jnp.concatenate([ps["query"]["kernel"], ps["key"]["kernel"],
                            ps["value"]["kernel"]], axis=1).astype(dt)
    bqkv = jnp.concatenate([ps["query"]["bias"], ps["key"]["bias"],
                            ps["value"]["bias"]])
    po = p["attention"]["output"]
    kern = functools.partial(_bert_kernel, num_heads=num_heads, eps=eps,
                             l_actual=L, lp=Lp)
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, Lp, Lp), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    I = p["intermediate"]["dense"]["kernel"].shape[1]
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, mspec, wspec((H, 3 * H)), bspec(3 * H),
                  wspec((H, H)), bspec(H), bspec(H), bspec(H),
                  wspec((H, I)), bspec(I), wspec((I, H)), bspec(H),
                  bspec(H), bspec(H)],
        out_specs=xspec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, bias.astype(jnp.float32),
      wqkv, row(bqkv), po["dense"]["kernel"].astype(dt),
      row(po["dense"]["bias"]), row(po["LayerNorm"]["scale"]),
      row(po["LayerNorm"]["bias"]),
      p["intermediate"]["dense"]["kernel"].astype(dt),
      row(p["intermediate"]["dense"]["bias"]),
      p["output"]["dense"]["kernel"].astype(dt),
      row(p["output"]["dense"]["bias"]),
      row(p["output"]["LayerNorm"]["scale"]),
      row(p["output"]["LayerNorm"]["bias"]))
    return out[:, :L] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_bert_block(p: Params, x: jnp.ndarray, bias: jnp.ndarray,
                     num_heads: int, eps: float, interpret: bool = False
                     ) -> jnp.ndarray:
    """One whole post-norm BERT layer with additive attention bias as a
    single Pallas kernel — the decode-prefill / score-forward hot block.
    Same outputs as models.layers.bert_layer (deterministic path)."""
    return _fused_bert_fwd(p, x, bias, num_heads, eps, interpret)


def _bert_vjp_fwd(p, x, bias, num_heads, eps, interpret):
    return _fused_bert_fwd(p, x, bias, num_heads, eps, interpret), \
        (p, x, bias)


def _bert_vjp_bwd(num_heads, eps, interpret, res, g):
    from ..models.layers import _bert_layer_xla
    p, x, bias = res
    _, vjp = jax.vjp(
        lambda p, x, bias: _bert_layer_xla(p, x, bias, num_heads, eps),
        p, x, bias)
    return vjp(g)


fused_bert_block.defvjp(_bert_vjp_fwd, _bert_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_vit_block(p_block: Params, x: jnp.ndarray, num_heads: int,
                    ln_eps: float, interpret: bool = False,
                    l_actual: int = 0) -> jnp.ndarray:
    """One whole ViT block (attention + MLP halves) as a single Pallas
    kernel.  Same outputs as models.layers.vit_block (bias-free,
    dropout-free path) to compute-dtype tolerance.  l_actual > 0: x is
    pre-padded to pad_len (16-aligned for L <= 1024, TQ-aligned beyond)
    with that many valid rows (pad hoisted outside the caller's block
    loop)."""
    return _fused_block_fwd(x, p_block, num_heads, ln_eps, interpret,
                            l_actual)


def _blk_vjp_fwd(p_block, x, num_heads, ln_eps, interpret, l_actual):
    y = _fused_block_fwd(x, p_block, num_heads, ln_eps, interpret, l_actual)
    return y, (p_block, x)


def _blk_vjp_bwd(num_heads, ln_eps, interpret, l_actual, res, g):
    # recompute with the explicit XLA body — routing through the public
    # vit_block would re-dispatch here and recurse
    from ..models.layers import _vit_block_xla
    p_block, x = res

    def f(p, x):
        if l_actual:           # padded rows don't contribute to the loss
            return _vit_block_xla(p, x[:, :l_actual], num_heads, ln_eps)
        return _vit_block_xla(p, x, num_heads, ln_eps)

    _, vjp = jax.vjp(f, p_block, x)
    if l_actual:
        # vjp through f's internal slice already zero-fills the padded rows
        return vjp(g[:, :l_actual])
    return vjp(g)


fused_vit_block.defvjp(_blk_vjp_fwd, _blk_vjp_bwd)


# ---------------------------------------------------------------------------
# Train-mode split block: split-kernel forward + analytic backward
# ---------------------------------------------------------------------------

def _tail_train_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                       ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                       o_ref, y1_ref, pre1_ref, *, eps: float):
    """_tail_kernel with two extra outputs the analytic backward needs:
    y1 (post-proj residual, the LN2 input) and pre1 (pre-gelu fc1 out).
    Writing them from the kernel (~0.36 ms/block of DMA at the trunk
    shape) is cheaper than recomputing their matmuls in the backward
    (~224 GFLOP/block), and costs no extra HBM vs the XLA autodiff path,
    which saves the same tensors."""
    x = x_ref[0]
    proj = jnp.dot(attn_ref[0], wproj_ref[:],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + proj + bproj_ref[0].astype(x.dtype)
    y1_ref[0] = x
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * ln2s_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(ln, wfc1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + bfc1_ref[0].astype(x.dtype)
    pre1_ref[0] = h
    h = _gelu_exact(h)
    y = jnp.dot(h, wfc2_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)


def _split_block_train_fwd(x, p, num_heads, eps, interpret, L, Lp):
    """Forward of split_vit_block_train: the _split_block_fwd pipeline
    with (slab, attn, y1, pre1) kept as residuals."""
    B = x.shape[0]
    H = x.shape[-1]
    dt = x.dtype
    I = p["mlp"]["fc1"]["kernel"].shape[1]
    hd = H // num_heads
    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, Lp, I), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, Lp, 3 * H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # stat rows as (B, 1, Lp): Mosaic requires the last two block dims
    # be full-array or (8, 128)-divisible; (1, 1, Lp) full-dim blocks
    # satisfy that where (1, Lp) over (B, Lp) does not
    stspec = pl.BlockSpec((1, 1, Lp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    stshape = jax.ShapeDtypeStruct((B, 1, Lp), jnp.float32)
    slab, mu1, rs1 = pl.pallas_call(
        functools.partial(_qkv_train_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, Lp, 3 * H), dt), stshape,
                   stshape),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=(sspec, stspec, stspec), interpret=interpret,
        compiler_params=cp,
    )(x, row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
      p["attn"]["qkv"]["kernel"].astype(dt), row(p["attn"]["qkv"]["bias"]))

    if hd == 64 and num_heads % 2 == 0:
        attn_kern = functools.partial(_attn_pairbd_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    else:
        attn_kern = functools.partial(_attn_perhead_kernel,
                                      num_heads=num_heads, l_actual=L,
                                      lp=Lp)
    attn = pl.pallas_call(
        attn_kern, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,), in_specs=[sspec], out_specs=xspec, interpret=interpret,
        compiler_params=cp)(slab)

    out, y1, pre1, mu2, rs2 = pl.pallas_call(
        functools.partial(_tail_train_stats_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, I), dt), stshape, stshape),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=(xspec, xspec, ispec, stspec, stspec),
        interpret=interpret, compiler_params=cp,
    )(x, attn, p["attn"]["proj"]["kernel"].astype(dt),
      row(p["attn"]["proj"]["bias"]),
      row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
      p["mlp"]["fc1"]["kernel"].astype(dt), row(p["mlp"]["fc1"]["bias"]),
      p["mlp"]["fc2"]["kernel"].astype(dt), row(p["mlp"]["fc2"]["bias"]))
    return out, (slab, attn, y1, pre1, (mu1, rs1), (mu2, rs2))


def _ln_stats(x32, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    return (x32 - mean) * rsig, rsig


def _ln_bwd(dln, xhat, rsig, scale):
    """Input/param grads of y = xhat*scale + bias, xhat = (x-mu)*rsig.
    Returns (dx (f32), dscale, dbias)."""
    dscale = jnp.sum(dln * xhat, axis=(0, 1))
    dbias = jnp.sum(dln, axis=(0, 1))
    dxhat = dln * scale.astype(jnp.float32)
    dx = rsig * (dxhat
                 - jnp.mean(dxhat, axis=-1, keepdims=True)
                 - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, dscale, dbias


def _gelu_grad(x32):
    """d/dx of exact (erf) gelu in f32."""
    cdf = 0.5 * (1.0 + jax.lax.erf(x32 * 0.7071067811865476))
    pdf = jnp.exp(-0.5 * x32 * x32) * 0.3989422804014327
    return cdf + x32 * pdf


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def split_vit_block_train(p_block: Params, x: jnp.ndarray, num_heads: int,
                          ln_eps: float, interpret: bool = False,
                          l_actual: int = 0) -> jnp.ndarray:
    """Training ViT block: three-kernel split forward (the 4.43 ms/block
    inference pipeline, vs ~6.9 ms/block for the XLA + packed-mha train
    forward measured at B=64 Lp=592) with an ANALYTIC backward — no
    forward recompute: the d-GEMMs run as plain XLA matmuls over the
    kernel-materialized residuals (slab/attn/y1/pre1, the same tensors
    XLA autodiff saves) and attention backward is the one-pass Pallas
    pair kernel (ops/flash_attention._flash_bwd_packed).

    Bias-free, dropout-free self-attention only (the ViT trunk's exact
    regime — timm Block, vision_transformer.py:213-250).  x must be
    pre-padded to pad_len with l_actual valid rows when l_actual > 0;
    padded rows carry finite garbage, are masked as attention keys, and
    contribute zero to parameter grads when the upstream gradient's
    padded rows are zero (guaranteed by the caller's final slice)."""
    B, Lp, H = x.shape
    L = l_actual or Lp
    if Lp % 16:
        raise ValueError("split_vit_block_train needs a 16-aligned "
                         "token axis (pre-pad via pad_len)")
    if Lp > 1024:
        raise ValueError("split_vit_block_train covers single-q-tile "
                         "shapes (Lp <= 1024) only")
    out, _ = _split_block_train_fwd(x, p_block, num_heads, ln_eps,
                                    interpret, L, Lp)
    return out


def _sbt_vjp_fwd(p_block, x, num_heads, ln_eps, interpret, l_actual):
    B, Lp, H = x.shape
    L = l_actual or Lp
    out, res = _split_block_train_fwd(x, p_block, num_heads, ln_eps,
                                      interpret, L, Lp)
    return out, (p_block, x) + res


def _sbt_vjp_bwd(num_heads, ln_eps, interpret, l_actual, res, g):
    from .flash_attention import flash_bwd_packed_slab
    p, x, slab, attn, y1, pre1, st1, st2 = res
    B, Lp, H = x.shape
    L = l_actual or Lp
    dt = x.dtype
    f32 = jnp.float32
    g = g.astype(dt)

    wfc2 = p["mlp"]["fc2"]["kernel"].astype(dt)      # (I, H)
    wfc1 = p["mlp"]["fc1"]["kernel"].astype(dt)      # (H, I)
    wproj = p["attn"]["proj"]["kernel"].astype(dt)   # (H, H)
    wqkv = p["attn"]["qkv"]["kernel"].astype(dt)     # (H, 3H)

    def mm(a, b):                 # (B,L,K)@(K,N) -> (B,L,N) f32 accum
        return jax.lax.dot_general(
            a, b, (((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mm_w(a, b):               # sum_B a^T b -> (K, N) f32 (dW)
        return jax.lax.dot_general(
            a, b, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=f32)

    # ---- tail backward: out = y1 + gelu(pre1) @ Wfc2 + b2
    h = _gelu_exact(pre1)
    dh32 = mm(g, wfc2.T)
    dW2 = mm_w(h, g)
    db2 = jnp.sum(g.astype(f32), axis=(0, 1))
    dpre1 = (dh32 * _gelu_grad(pre1.astype(f32))).astype(dt)
    # ln2 = LN(y1) * s2 + b2' — xhat rebuilt from the kernel-saved stats
    # (no reduction pass; see _tail_train_stats_kernel)
    mu2 = st2[0][:, 0, :, None]
    rsig2 = st2[1][:, 0, :, None]
    xhat2 = (y1.astype(f32) - mu2) * rsig2
    ln2 = (xhat2 * p["norm2"]["scale"].astype(f32)
           + p["norm2"]["bias"].astype(f32)).astype(dt)
    dW1 = mm_w(ln2, dpre1)
    db1 = jnp.sum(dpre1.astype(f32), axis=(0, 1))
    dln2 = mm(dpre1, wfc1.T)
    dy1_ln, ds2, dbeta2 = _ln_bwd(dln2, xhat2, rsig2, p["norm2"]["scale"])
    # residual + LN path; inter-op cotangents travel in compute dtype
    # (the f32 chain cost ~2 ms/step of extra HBM; XLA autodiff's own
    # cotangents are bf16 with f32 dot accumulation, same as this)
    dy1_lp = (g.astype(f32) + dy1_ln).astype(dt)

    # ---- proj backward: y1 = x + attn @ Wproj + bp
    dattn = mm(dy1_lp, wproj.T).astype(dt)
    dWproj = mm_w(attn, dy1_lp)
    dbproj = jnp.sum(dy1_lp.astype(f32), axis=(0, 1))

    # ---- attention backward: slab-layout one-pass Pallas pair kernel —
    # reads the (B,Lp,3H) slab via column-offset index maps (no q/k/v
    # slice copies) and dq/dk/dv stay separate: dWqkv/dln1 fold them in
    # per-third GEMMs, so no dslab concat round-trips HBM either
    dq, dk, dv = flash_bwd_packed_slab(slab, jnp.zeros((), jnp.int32),
                                       dattn, num_heads, interpret, 0.0,
                                       L if L < Lp else 0)

    # ---- qkv backward: slab = LN(x) * s1 + b1' ... @ Wqkv + bqkv
    mu1 = st1[0][:, 0, :, None]
    rsig1 = st1[1][:, 0, :, None]
    xhat1 = (x.astype(f32) - mu1) * rsig1
    ln1 = (xhat1 * p["norm1"]["scale"].astype(f32)
           + p["norm1"]["bias"].astype(f32)).astype(dt)
    dWqkv = jnp.concatenate(
        [mm_w(ln1, dq), mm_w(ln1, dk), mm_w(ln1, dv)], axis=1)
    dbqkv = jnp.concatenate(
        [jnp.sum(dq.astype(f32), axis=(0, 1)),
         jnp.sum(dk.astype(f32), axis=(0, 1)),
         jnp.sum(dv.astype(f32), axis=(0, 1))])
    dln1 = (mm(dq, wqkv[:, :H].T) + mm(dk, wqkv[:, H:2 * H].T)
            + mm(dv, wqkv[:, 2 * H:].T))
    dx_ln, ds1, dbeta1 = _ln_bwd(dln1, xhat1, rsig1, p["norm1"]["scale"])
    dx = (dy1_lp.astype(f32) + dx_ln).astype(dt)

    dp = {
        "norm1": {"scale": ds1, "bias": dbeta1},
        "norm2": {"scale": ds2, "bias": dbeta2},
        "attn": {
            "qkv": {"kernel": dWqkv, "bias": dbqkv},
            "proj": {"kernel": dWproj, "bias": dbproj},
        },
        "mlp": {
            "fc1": {"kernel": dW1, "bias": db1},
            "fc2": {"kernel": dW2, "bias": db2},
        },
    }
    return dp, dx


split_vit_block_train.defvjp(_sbt_vjp_fwd, _sbt_vjp_bwd)


# ---------------------------------------------------------------------------
# Train-mode split BERT layer (post-norm) — split forward + analytic backward
# ---------------------------------------------------------------------------

def _bert_tail_train_kernel(x_ref, a_ref, wo_ref, bo_ref, ln1s_ref,
                            ln1b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                            bfc2_ref, ln2s_ref, ln2b_ref, seed_ref,
                            o_ref, r1_ref, y1_ref, pre1_ref, r2_ref,
                            mu1_ref, rs1_ref, mu2_ref, rs2_ref, *,
                            eps: float, rate: float):
    """Post-norm BERT tail: out-dense -> hidden-dropout -> +x -> LN1 ->
    fc1+gelu -> fc2 -> hidden-dropout -> +LN1out -> LN2 (reference
    BertSelfOutput/BertIntermediate/BertOutput modeling_bert.py:346-437).
    Residuals the analytic backward needs (r1/y1/pre1/r2 — the tensors
    XLA autodiff saves anyway) stream out as extra outputs; the two
    hidden-dropout masks are counter-hash lattices over (token, feature)
    with per-image salt, regenerated bit-identically XLA-side in the
    backward (no mask tensors in HBM)."""
    from .flash_attention import _dropout_keep
    x = x_ref[0]
    dt = x.dtype
    t = jnp.dot(a_ref[0], wo_ref[:],
                preferred_element_type=jnp.float32).astype(dt)
    t = t + bo_ref[0].astype(dt)
    if rate > 0.0:
        seed = seed_ref[0].astype(jnp.uint32)
        img = pl.program_id(0)
        inv = 1.0 / (1.0 - rate)
        keep = _dropout_keep(seed, img * 2, rate, t.shape)
        t = jnp.where(keep, t, 0.0).astype(dt) * jnp.asarray(inv, dt)
    r1 = x + t
    r1_ref[0] = r1
    xf = r1.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    mu1_ref[0, 0] = mean[:, 0]
    rs1_ref[0, 0] = rsig[:, 0]
    ln = (xf - mean) * rsig
    y1 = (ln * ln1s_ref[0].astype(jnp.float32)
          + ln1b_ref[0].astype(jnp.float32)).astype(dt)
    y1_ref[0] = y1
    pre1 = jnp.dot(y1, wfc1_ref[:],
                   preferred_element_type=jnp.float32).astype(dt)
    pre1 = pre1 + bfc1_ref[0].astype(dt)
    pre1_ref[0] = pre1
    h = _gelu_exact(pre1)
    u = jnp.dot(h, wfc2_ref[:],
                preferred_element_type=jnp.float32).astype(dt)
    u = u + bfc2_ref[0].astype(dt)
    if rate > 0.0:
        keep2 = _dropout_keep(seed, img * 2 + 1, rate, u.shape)
        u = jnp.where(keep2, u, 0.0).astype(dt) * jnp.asarray(inv, dt)
    r2 = y1 + u
    r2_ref[0] = r2
    xf = r2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    mu2_ref[0, 0] = mean[:, 0]
    rs2_ref[0, 0] = rsig[:, 0]
    ln = (xf - mean) * rsig
    o_ref[0] = (ln * ln2s_ref[0].astype(jnp.float32)
                + ln2b_ref[0].astype(jnp.float32)).astype(dt)


def _bert_qkv_cat(p):
    """Concatenate the three separate q/k/v projections into one (H, 3H)
    kernel + (3H,) bias (trace-time, tiny)."""
    s = p["attention"]["self"]
    wq, wk, wv = (s[n]["kernel"] for n in ("query", "key", "value"))
    bq, bk, bv = (s[n]["bias"] for n in ("query", "key", "value"))
    return (jnp.concatenate([wq, wk, wv], axis=1),
            jnp.concatenate([bq, bk, bv]))


def _split_bert_train_fwd(p, x, bias, num_heads, eps, interpret, L, Lp,
                          hidden_rate, attn_rate, seeds):
    from .flash_attention import flash_fwd_packed_slab
    B, _, H = x.shape
    dt = x.dtype
    I = p["intermediate"]["dense"]["kernel"].shape[1]
    wqkv, bqkv = _bert_qkv_cat(p)
    slab = (jax.lax.dot_general(
        x, wqkv.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
        + bqkv.astype(dt))
    a = flash_fwd_packed_slab(slab, bias, seeds[0], num_heads, interpret,
                              attn_rate, L if L < Lp else 0)

    row = lambda v: v.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ispec = pl.BlockSpec((1, Lp, I), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1,), lambda b: (0,), memory_space=pltpu.SMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    ao = p["attention"]["output"]
    stspec = pl.BlockSpec((1, 1, Lp), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    stshape = jax.ShapeDtypeStruct((B, 1, Lp), jnp.float32)
    out, r1, y1, pre1, r2, mu1, rs1, mu2, rs2 = pl.pallas_call(
        functools.partial(_bert_tail_train_kernel, eps=eps,
                          rate=hidden_rate),
        out_shape=(jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, I), dt),
                   jax.ShapeDtypeStruct((B, Lp, H), dt),
                   stshape, stshape, stshape, stshape),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H), bspec(H), bspec(H), sspec],
        out_specs=(xspec, xspec, xspec, ispec, xspec, stspec, stspec,
                   stspec, stspec),
        interpret=interpret, compiler_params=cp,
    )(x, a, ao["dense"]["kernel"].astype(dt), row(ao["dense"]["bias"]),
      row(ao["LayerNorm"]["scale"]), row(ao["LayerNorm"]["bias"]),
      p["intermediate"]["dense"]["kernel"].astype(dt),
      row(p["intermediate"]["dense"]["bias"]),
      p["output"]["dense"]["kernel"].astype(dt),
      row(p["output"]["dense"]["bias"]),
      row(p["output"]["LayerNorm"]["scale"]),
      row(p["output"]["LayerNorm"]["bias"]),
      jnp.reshape(seeds[1], (1,)).astype(jnp.int32))
    return out, (slab, a, r1, y1, pre1, r2, (mu1, rs1), (mu2, rs2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def split_bert_layer_train(p_layer: Params, x: jnp.ndarray,
                           bias: jnp.ndarray, num_heads: int,
                           ln_eps: float, interpret: bool = False,
                           l_actual: int = 0, hidden_rate: float = 0.0,
                           attn_rate: float = 0.0,
                           seeds: jnp.ndarray = None) -> jnp.ndarray:
    """Training post-norm BERT layer: split forward (XLA fused-qkv matmul
    | packed pair attention with bias + in-kernel prob dropout | tail
    kernel with in-kernel hidden dropout) + ANALYTIC backward over the
    materialized residuals — the BERT analogue of split_vit_block_train.

    x and bias must be pre-padded (16-aligned) with l_actual valid rows
    when l_actual > 0.  seeds: (2,) int32 — [attn-prob seed, hidden seed]
    (pass zeros when both rates are 0)."""
    B, Lp, H = x.shape
    if Lp % 16:
        raise ValueError("split_bert_layer_train needs a 16-aligned "
                         "token axis")
    if Lp > 1024:
        raise ValueError("split_bert_layer_train covers Lp <= 1024 only")
    L = l_actual or Lp
    out, _ = _split_bert_train_fwd(p_layer, x, bias, num_heads, ln_eps,
                                   interpret, L, Lp, hidden_rate,
                                   attn_rate, seeds)
    return out


def _sblt_vjp_fwd(p_layer, x, bias, num_heads, ln_eps, interpret,
                  l_actual, hidden_rate, attn_rate, seeds):
    B, Lp, H = x.shape
    L = l_actual or Lp
    out, res = _split_bert_train_fwd(p_layer, x, bias, num_heads, ln_eps,
                                     interpret, L, Lp, hidden_rate,
                                     attn_rate, seeds)
    return out, (p_layer, x, bias, seeds) + res


def _sblt_vjp_bwd(num_heads, ln_eps, interpret, l_actual, hidden_rate,
                  attn_rate, res, g):
    from .flash_attention import _dropout_keep, flash_bwd_packed_slab
    p, x, bias, seeds, slab, a, r1, y1, pre1, r2, st1, st2 = res
    B, Lp, H = x.shape
    L = l_actual or Lp
    dt = x.dtype
    f32 = jnp.float32
    ao = p["attention"]["output"]
    wo = ao["dense"]["kernel"].astype(dt)
    wfc1 = p["intermediate"]["dense"]["kernel"].astype(dt)
    wfc2 = p["output"]["dense"]["kernel"].astype(dt)
    wqkv, _ = _bert_qkv_cat(p)
    wqkv = wqkv.astype(dt)

    def mm(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((2,), (0,)), ((), ())), preferred_element_type=f32)

    def mm_w(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=f32)

    def hmask(which, ref_shape):
        # bit-identical regeneration of the kernel's per-image lattice:
        # salt = img*2 + which, (row, col) = (token, feature) dims (1, 2)
        seed = seeds[1].astype(jnp.uint32)
        img = jax.lax.broadcasted_iota(jnp.uint32, ref_shape, 0)
        return _dropout_keep(seed, img * 2 + which, hidden_rate,
                             ref_shape, dims=(1, 2))

    # ---- LN2: out = LN(r2)*s2 + b2 — xhat from kernel-saved stats
    mu2s = st2[0][:, 0, :, None]
    rsig2 = st2[1][:, 0, :, None]
    xhat2 = (r2.astype(f32) - mu2s) * rsig2
    dr2, ds2, dbeta2 = _ln_bwd(g.astype(f32), xhat2, rsig2,
                               p["output"]["LayerNorm"]["scale"])
    # inter-op cotangents travel in compute dtype (see the ViT backward)
    dr2 = dr2.astype(dt)
    du = dr2
    if hidden_rate > 0.0:
        keep2 = hmask(1, du.shape)
        du = (jnp.where(keep2, du, 0.0)
              * jnp.asarray(1.0 / (1.0 - hidden_rate), dt))
    h = _gelu_exact(pre1)
    dW2 = mm_w(h, du)
    db2 = jnp.sum(du.astype(f32), axis=(0, 1))
    dh = mm(du, wfc2.T)
    dpre1 = (dh * _gelu_grad(pre1.astype(f32))).astype(dt)
    dW1 = mm_w(y1, dpre1)
    db1 = jnp.sum(dpre1.astype(f32), axis=(0, 1))
    dy1 = (dr2.astype(f32) + mm(dpre1, wfc1.T)).astype(dt)

    # ---- LN1: y1 = LN(r1)*s1 + b1
    mu1s = st1[0][:, 0, :, None]
    rsig1 = st1[1][:, 0, :, None]
    xhat1 = (r1.astype(f32) - mu1s) * rsig1
    dr1, ds1, dbeta1 = _ln_bwd(dy1.astype(f32), xhat1, rsig1,
                               ao["LayerNorm"]["scale"])
    dr1 = dr1.astype(dt)
    dt_ = dr1
    if hidden_rate > 0.0:
        keep1 = hmask(0, dt_.shape)
        dt_ = (jnp.where(keep1, dt_, 0.0)
               * jnp.asarray(1.0 / (1.0 - hidden_rate), dt))
    dx = dr1                                           # residual path
    da = mm(dt_, wo.T).astype(dt)
    dWo = mm_w(a, dt_)
    dbo = jnp.sum(dt_.astype(f32), axis=(0, 1))

    # ---- attention backward (slab pair kernel, bias + prob dropout)
    dq, dk, dv = flash_bwd_packed_slab(slab, seeds[0], da, num_heads,
                                       interpret, attn_rate,
                                       L if L < Lp else 0, bias)

    # ---- qkv backward (no pre-LN in post-norm BERT: straight to x)
    dWq, dWk, dWv = mm_w(x, dq), mm_w(x, dk), mm_w(x, dv)
    dbq = jnp.sum(dq.astype(f32), axis=(0, 1))
    dbk = jnp.sum(dk.astype(f32), axis=(0, 1))
    dbv = jnp.sum(dv.astype(f32), axis=(0, 1))
    dx = (dx.astype(f32) + mm(dq, wqkv[:, :H].T)
          + mm(dk, wqkv[:, H:2 * H].T)
          + mm(dv, wqkv[:, 2 * H:].T)).astype(dt)

    dp = {
        "attention": {
            "self": {
                "query": {"kernel": dWq, "bias": dbq},
                "key": {"kernel": dWk, "bias": dbk},
                "value": {"kernel": dWv, "bias": dbv},
            },
            "output": {
                "dense": {"kernel": dWo, "bias": dbo},
                "LayerNorm": {"scale": ds1, "bias": dbeta1},
            },
        },
        "intermediate": {"dense": {"kernel": dW1, "bias": db1}},
        "output": {
            "dense": {"kernel": dW2, "bias": db2},
            "LayerNorm": {"scale": ds2, "bias": dbeta2},
        },
    }
    import numpy as _np
    dseeds = _np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dp, dx, jnp.zeros_like(bias), dseeds


split_bert_layer_train.defvjp(_sblt_vjp_fwd, _sblt_vjp_bwd)


# ---- LN-stat-carrying train kernel variants --------------------------------
# XLA autodiff saves each LayerNorm's (mean, rsig) row stats; the analytic
# backwards above recomputed them with an extra fused reduction pass over
# every LN input (~2.4 ms/step at the flagship shape).  These variants
# stream the stats out of the forward kernels ((B, Lp) f32 rows — ~170 KB
# per stat, negligible DMA) so the backward's xhat is a pure elementwise
# rebuild.

def _qkv_train_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref,
                      mu_ref, rs_ref, *, eps: float):
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    mu_ref[0, 0] = mean[:, 0]
    rs_ref[0, 0] = rsig[:, 0]
    ln = (xf - mean) * rsig
    ln = (ln * lns_ref[0].astype(jnp.float32)
          + lnb_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv = jnp.dot(ln, wqkv_ref[:],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = qkv + bqkv_ref[0].astype(x.dtype)


def _tail_train_stats_kernel(x_ref, attn_ref, wproj_ref, bproj_ref,
                             ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                             wfc2_ref, bfc2_ref, o_ref, y1_ref, pre1_ref,
                             mu_ref, rs_ref, *, eps: float):
    x = x_ref[0]
    proj = jnp.dot(attn_ref[0], wproj_ref[:],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + proj + bproj_ref[0].astype(x.dtype)
    y1_ref[0] = x
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rsig = jax.lax.rsqrt(var + eps)
    mu_ref[0, 0] = mean[:, 0]
    rs_ref[0, 0] = rsig[:, 0]
    ln = (xf - mean) * rsig
    ln = (ln * ln2s_ref[0].astype(jnp.float32)
          + ln2b_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jnp.dot(ln, wfc1_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + bfc1_ref[0].astype(x.dtype)
    pre1_ref[0] = h
    h = _gelu_exact(h)
    y = jnp.dot(h, wfc2_ref[:],
                preferred_element_type=jnp.float32).astype(x.dtype)
    o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)
