"""Split-kernel ViT block candidates vs the monolithic fused block.

ablate_attn.py showed the block's attention section costs ~2.0 ms inside
the monolithic kernel but only 0.30 ms as a standalone kernel reading the
qkv slab from HBM (Mosaic scheduling interaction with the in-kernel
computed slab).  These variants split the block at different seams so the
attention runs in the fast regime, paying HBM round trips for it:

  mono     : production _block_kernel (baseline)
  split3   : [LN1+qkv] -> slab | [attn(slab)] | [proj+res+LN2+MLP+res]
  split2a  : [LN1+qkv] -> slab | [attn(slab)+proj+res+LN2+MLP+res]
  split2b  : [LN1+qkv+attn]    | [proj+res+LN2+MLP+res]   (round-3 probe)

All variants compute the production math (l_actual key masking included)
and are numerics-checked against the production fused_vit_block before
timing.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/ablate_split.py [B] [L]
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, fetch, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn()
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vitcap_tpu.ops.fused_block import (_gelu_exact, pad_len,
                                            _fused_block_fwd)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 577
    H, I, NH = 768, 3072, 12
    hd = H // NH
    Lp = pad_len(L)
    eps = 1e-6
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    NEG = -1e30

    x = jnp.asarray(rs.randn(B, Lp, H), dt)
    x = x.at[:, L:].set(0)
    p = {
        "norm1": {"scale": jnp.asarray(rs.randn(H), jnp.float32),
                  "bias": jnp.asarray(rs.randn(H), jnp.float32)},
        "attn": {"qkv": {"kernel": jnp.asarray(rs.randn(H, 3 * H) * 0.02,
                                               jnp.float32),
                         "bias": jnp.asarray(rs.randn(3 * H) * 0.02,
                                             jnp.float32)},
                 "proj": {"kernel": jnp.asarray(rs.randn(H, H) * 0.02,
                                                jnp.float32),
                          "bias": jnp.asarray(rs.randn(H) * 0.02,
                                              jnp.float32)}},
        "norm2": {"scale": jnp.asarray(rs.randn(H), jnp.float32),
                  "bias": jnp.asarray(rs.randn(H), jnp.float32)},
        "mlp": {"fc1": {"kernel": jnp.asarray(rs.randn(H, I) * 0.02,
                                              jnp.float32),
                        "bias": jnp.asarray(rs.randn(I) * 0.02,
                                            jnp.float32)},
                "fc2": {"kernel": jnp.asarray(rs.randn(I, H) * 0.02,
                                              jnp.float32),
                        "bias": jnp.asarray(rs.randn(H) * 0.02,
                                            jnp.float32)}},
    }

    def ln_f32(x, s, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (out * s + b).astype(x.dtype)

    # --- kernels ---------------------------------------------------------
    def qkv_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref):
        x = x_ref[0]
        ln = ln_f32(x, lns_ref[0], lnb_ref[0])
        qkv = jnp.dot(ln, wqkv_ref[:],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        o_ref[0] = qkv + bqkv_ref[0].astype(x.dtype)

    def attn_body(qkv):
        scale = hd ** -0.5
        heads = []
        for h in range(NH):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, H + h * hd:H + (h + 1) * hd]
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if L < Lp:
                kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kidx < L, s, NEG)
            m = jnp.max(s, axis=-1, keepdims=True)
            pr = jnp.exp(s - m)
            l = jnp.sum(pr, axis=-1, keepdims=True)
            o = jnp.dot(pr.astype(qkv.dtype), v,
                        preferred_element_type=jnp.float32)
            heads.append((o / jnp.maximum(l, 1e-30)).astype(qkv.dtype))
        return jnp.concatenate(heads, axis=-1)

    def attn_kernel(qkv_ref, o_ref):
        o_ref[0] = attn_body(qkv_ref[0])

    def tail_body(x, attn, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref):
        proj = jnp.dot(attn, wproj_ref[:],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + proj + bproj_ref[0].astype(x.dtype)
        ln2 = ln_f32(x, ln2s_ref[0], ln2b_ref[0])
        h1 = jnp.dot(ln2, wfc1_ref[:],
                     preferred_element_type=jnp.float32).astype(x.dtype)
        h1 = _gelu_exact(h1 + bfc1_ref[0].astype(x.dtype))
        y = jnp.dot(h1, wfc2_ref[:],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return x + y + bfc2_ref[0].astype(x.dtype)

    def tail_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                    ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                    o_ref):
        o_ref[0] = tail_body(x_ref[0], attn_ref[0], wproj_ref, bproj_ref,
                             ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                             wfc2_ref, bfc2_ref)

    def attn_tail_kernel(x_ref, qkv_ref, wproj_ref, bproj_ref, ln2s_ref,
                         ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                         o_ref):
        attn = attn_body(qkv_ref[0])
        o_ref[0] = tail_body(x_ref[0], attn, wproj_ref, bproj_ref,
                             ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                             wfc2_ref, bfc2_ref)

    def head_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref):
        x = x_ref[0]
        ln = ln_f32(x, lns_ref[0], lnb_ref[0])
        qkv = jnp.dot(ln, wqkv_ref[:],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = qkv + bqkv_ref[0].astype(x.dtype)
        o_ref[0] = attn_body(qkv)

    # --- pallas wrappers -------------------------------------------------
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

    qkv_call = pl.pallas_call(
        qkv_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, 3 * H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=sspec, compiler_params=cp)
    attn_call = pl.pallas_call(
        attn_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,), in_specs=[sspec], out_specs=xspec, compiler_params=cp)
    tail_call = pl.pallas_call(
        tail_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=xspec, compiler_params=cp)
    attn_tail_call = pl.pallas_call(
        attn_tail_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, sspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=xspec, compiler_params=cp)
    head_call = pl.pallas_call(
        head_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=xspec, compiler_params=cp)

    pk = p["norm1"], p["attn"], p["norm2"], p["mlp"]
    a_qkv = (row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
             p["attn"]["qkv"]["kernel"].astype(dt),
             row(p["attn"]["qkv"]["bias"]))
    a_tail = (p["attn"]["proj"]["kernel"].astype(dt),
              row(p["attn"]["proj"]["bias"]),
              row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
              p["mlp"]["fc1"]["kernel"].astype(dt),
              row(p["mlp"]["fc1"]["bias"]),
              p["mlp"]["fc2"]["kernel"].astype(dt),
              row(p["mlp"]["fc2"]["bias"]))

    def blk_mono(x):
        return _fused_block_fwd(x, p, NH, eps, False, l_actual=L)

    def blk_split3(x):
        slab = qkv_call(x, *a_qkv)
        attn = attn_call(slab)
        return tail_call(x, attn, *a_tail)

    def blk_split2a(x):
        slab = qkv_call(x, *a_qkv)
        return attn_tail_call(x, slab, *a_tail)

    def blk_split2b(x):
        attn = head_call(x, *a_qkv)
        return tail_call(x, attn, *a_tail)

    fl_blk = (4 * Lp * H * H + 2 * Lp * Lp * H + 2 * Lp * H * I) * 2 * B
    print(f"B={B} Lp={Lp} padded-ideal/blk = {fl_blk/197e12*1e3:.2f} ms")

    ref = None
    for name, blk in [("mono   ", blk_mono), ("split3 ", blk_split3),
                      ("split2a", blk_split2a), ("split2b", blk_split2b)]:
        def twelve(x, blk=blk):
            for _ in range(12):
                x = blk(x)
            return x
        jf = jax.jit(twelve)
        out = np.asarray(jf(x)[:, :L], np.float32)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref) /
                               (np.abs(ref) + 1.0)))
        t = min(timeit(lambda: jf(x), lambda o: o[:1, :1, :1])
                for _ in range(3)) / 12
        print(f"  {name}: {t*1e3:6.2f} ms/blk  ({fl_blk/t/1e12:5.1f} TF/s)"
              f"  maxrelerr={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
