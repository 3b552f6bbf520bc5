"""Attention-variant A/B inside the real split3 block chain (dependent).

METHODOLOGY NOTE (supersedes ablate_attn.py / the isolation probes in
ablate_split2.py): perturbing inputs with ``x * (1 + i*1e-6)`` does NOT
defeat CSE in bf16 — 1+1e-6 rounds to exactly 1.0, so XLA collapses the
"independent" calls into one and the per-call time reads ~12x too fast
(the "963 TF/s tail" artifact).  Every timing here is a 12-deep
DEPENDENT chain: x -> qkv -> attn -> tail -> x.

Variants change ONLY the attention kernel:
  perhead : 24 skinny (592,64) dots, one head at a time  (production)
  pairbd  : 2 heads per dot via block-diagonal K/V packing — 128-wide
            contraction (full MXU) at 2x flops == same intrinsic cost,
            but 12 large dots instead of 24 small ones
  batched : one batched dot_general over all 12 heads
  hpg4    : per-head loop, (B, 3) grid, 4 heads per cell

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_attn2.py [B] [L]
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

    x = jnp.asarray(rs.randn(B, Lp, H) * 0.5, dt)
    x = x.at[:, L:].set(0)
    p = {
        "norm1": {"scale": jnp.asarray(1 + 0.1 * rs.randn(H), jnp.float32),
                  "bias": jnp.asarray(0.1 * rs.randn(H), jnp.float32)},
        "attn": {"qkv": {"kernel": jnp.asarray(rs.randn(H, 3 * H) * 0.02,
                                               jnp.float32),
                         "bias": jnp.asarray(rs.randn(3 * H) * 0.02,
                                             jnp.float32)},
                 "proj": {"kernel": jnp.asarray(rs.randn(H, H) * 0.02,
                                                jnp.float32),
                          "bias": jnp.asarray(rs.randn(H) * 0.02,
                                              jnp.float32)}},
        "norm2": {"scale": jnp.asarray(1 + 0.1 * rs.randn(H), jnp.float32),
                  "bias": jnp.asarray(0.1 * rs.randn(H), jnp.float32)},
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

    def qkv_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref):
        x = x_ref[0]
        ln = ln_f32(x, lns_ref[0], lnb_ref[0])
        qkv = jnp.dot(ln, wqkv_ref[:],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        o_ref[0] = qkv + bqkv_ref[0].astype(x.dtype)

    def smax(s):
        if L < Lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kidx < L, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        pr = jnp.exp(s - m)
        l = jnp.sum(pr, axis=-1, keepdims=True)
        return pr, l

    scale = hd ** -0.5

    def attn_perhead(qkv_ref, o_ref):
        qkv = qkv_ref[0]
        heads = []
        for h in range(NH):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, H + h * hd:H + (h + 1) * hd]
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            pr, l = smax(s)
            o = jnp.dot(pr.astype(qkv.dtype), v,
                        preferred_element_type=jnp.float32)
            heads.append((o / jnp.maximum(l, 1e-30)).astype(qkv.dtype))
        o_ref[0] = jnp.concatenate(heads, axis=-1)

    LG = 640            # 128-aligned segment stride (>= Lp)

    def attn_pairbd(qkv_ref, o_ref):
        qkv = qkv_ref[0]
        z = jnp.zeros((Lp, hd), dt)
        zgap = jnp.zeros((LG - Lp, 2 * hd), dt)
        outs = []
        kidx2 = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * LG), 1)
        seg = kidx2 % LG
        valid = seg < L
        for h in range(0, NH, 2):
            q1 = qkv[:, h * hd:(h + 1) * hd]
            q2 = qkv[:, (h + 1) * hd:(h + 2) * hd]
            k1 = qkv[:, H + h * hd:H + (h + 1) * hd]
            k2 = qkv[:, H + (h + 1) * hd:H + (h + 2) * hd]
            v1 = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            v2 = qkv[:, 2 * H + (h + 1) * hd:2 * H + (h + 2) * hd]
            qp = jnp.concatenate([q1, q2], axis=-1)              # (Lp,128)
            kbd = jnp.concatenate([
                jnp.concatenate([k1, z], axis=-1), zgap,
                jnp.concatenate([z, k2], axis=-1), zgap], axis=0)  # (2LG,128)
            s = jax.lax.dot_general(qp, kbd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale                    # (Lp,2LG)
            s = jnp.where(valid, s, NEG)
            s1, s2 = s[:, :LG], s[:, LG:]
            m1 = jnp.max(s1, axis=-1, keepdims=True)
            m2 = jnp.max(s2, axis=-1, keepdims=True)
            p1 = jnp.exp(s1 - m1)
            p2 = jnp.exp(s2 - m2)
            l1 = jnp.sum(p1, axis=-1, keepdims=True)
            l2 = jnp.sum(p2, axis=-1, keepdims=True)
            pcat = jnp.concatenate([p1, p2], axis=-1).astype(dt)  # (Lp,2LG)
            vst = jnp.concatenate([
                jnp.concatenate([v1, z], axis=-1), zgap,
                jnp.concatenate([z, v2], axis=-1), zgap], axis=0)  # (2LG,128)
            o = jnp.dot(pcat, vst,
                        preferred_element_type=jnp.float32)      # (Lp,128)
            o1 = o[:, :hd] / jnp.maximum(l1, 1e-30)
            o2 = o[:, hd:] / jnp.maximum(l2, 1e-30)
            outs.append(jnp.concatenate([o1, o2], axis=-1).astype(dt))
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    def attn_batched(qkv_ref, o_ref):
        qkv = qkv_ref[0]
        q = qkv[:, :H].reshape(Lp, NH, hd)
        k = qkv[:, H:2 * H].reshape(Lp, NH, hd)
        v = qkv[:, 2 * H:].reshape(Lp, NH, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32) * scale          # (NH,Lp,Lp)
        if L < Lp:
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(kidx < L, s, NEG)
        m = jnp.max(s, axis=-1, keepdims=True)
        pr = jnp.exp(s - m)
        l = jnp.sum(pr, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            pr.astype(dt), v, (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)                  # (NH,Lp,hd)
        o = o / jnp.maximum(l, 1e-30)
        o_ref[0] = jnp.concatenate([o[h] for h in range(NH)],
                                   axis=-1).astype(dt)

    def attn_hpg(qkv_ref, o_ref, *, hpg):
        g = pl.program_id(1)
        qkv = qkv_ref[0]
        for gi in range(NH // hpg):
            @pl.when(g == gi)
            def _():
                heads = []
                for h in range(gi * hpg, (gi + 1) * hpg):
                    q = qkv[:, h * hd:(h + 1) * hd]
                    k = qkv[:, H + h * hd:H + (h + 1) * hd]
                    v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    pr, l = smax(s)
                    o = jnp.dot(pr.astype(dt), v,
                                preferred_element_type=jnp.float32)
                    heads.append((o / jnp.maximum(l, 1e-30)).astype(dt))
                o_ref[0] = jnp.concatenate(heads, axis=-1)

    def tail_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                    ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                    o_ref):
        x = x_ref[0]
        proj = jnp.dot(attn_ref[0], wproj_ref[:],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + proj + bproj_ref[0].astype(x.dtype)
        ln2 = ln_f32(x, ln2s_ref[0], ln2b_ref[0])
        h1 = jnp.dot(ln2, wfc1_ref[:],
                     preferred_element_type=jnp.float32).astype(x.dtype)
        h1 = _gelu_exact(h1 + bfc1_ref[0].astype(x.dtype))
        y = jnp.dot(h1, wfc2_ref[:],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)

    row = lambda a: a.reshape(1, -1)
    bspec = lambda n: pl.BlockSpec((1, n), lambda *g: (0, 0),
                                   memory_space=pltpu.VMEM)
    wspec = lambda s: pl.BlockSpec(s, lambda *g: (0, 0),
                                   memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, Lp, H), lambda b, *g: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, Lp, 3 * H), lambda b, *g: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    qkv_call = pl.pallas_call(
        qkv_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, 3 * H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=sspec, compiler_params=cp)
    tail_call = pl.pallas_call(
        tail_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=xspec, compiler_params=cp)

    def make_attn_call(kern, grid2=None):
        if grid2 is None:
            return pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
                grid=(B,), in_specs=[sspec], out_specs=xspec,
                compiler_params=cp)
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B, grid2),
            in_specs=[pl.BlockSpec((1, Lp, 3 * H), lambda b, g: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Lp, H // grid2),
                                   lambda b, g: (b, 0, g),
                                   memory_space=pltpu.VMEM),
            compiler_params=cp)

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

    fl_blk = (4 * Lp * H * H + 2 * Lp * Lp * H + 2 * Lp * H * I) * 2 * B
    print(f"B={B} Lp={Lp} padded-ideal/blk = {fl_blk/197e12*1e3:.2f} ms",
          flush=True)

    def blk_mono(x):
        for _ in range(12):
            x = _fused_block_fwd(x, p, NH, eps, False, l_actual=L)
        return x

    ref = np.asarray(jax.jit(blk_mono)(x)[:, :L], np.float32)

    cases = [("mono        ", None),
             ("s3-perhead  ", make_attn_call(attn_perhead)),
             ("s3-pairbd   ", make_attn_call(attn_pairbd)),
             ("s3-batched  ", make_attn_call(attn_batched)),
             ("s3-hpg4     ", make_attn_call(
                 functools.partial(attn_hpg, hpg=4), grid2=3)),
             ]
    for name, attn_call in cases:
        if attn_call is None:
            fn = blk_mono
        else:
            def fn(x, ac=attn_call):
                for _ in range(12):
                    slab = qkv_call(x, *a_qkv)
                    attn = ac(slab)
                    x = tail_call(x, attn, *a_tail)
                return x
        jf = jax.jit(fn)
        try:
            out = np.asarray(jf(x)[:, :L], np.float32)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1.0)))
        t = min(timeit(lambda: jf(x), lambda o: o[:1, :1, :1])
                for _ in range(3)) / 12
        print(f"  {name}: {t*1e3:6.2f} ms/blk  ({fl_blk/t/1e12:5.1f} TF/s)"
              f"  maxrelerr={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
