"""Second-round split probes: component isolation + pipelined variants.

From ablate_split.py: attention sharing a kernel with the MLP is the slow
regime; attention alone (or with the qkv matmul) is fast.  These probes:

  qkv-only / attn-only / tail-only : isolated per-component costs when
      looped 12x (pipeline-context, not single-call)
  attn-hpg4   : attention kernel on a (B, 3) grid, 4 heads/cell
  blk2        : [attn(slab)] | [proj+res+LN2+MLP+res + LN1'+qkv' -> slab']
                2 kernels/block; the next block's qkv rides the tail's
                matmul kernel so attention never shares a kernel with MLP
  split3-hpg4 : split3 with the finer-grid attention

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_split2.py [B] [L]
"""

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
    slab0 = jnp.asarray(rs.randn(B, Lp, 3 * H) * 0.3, dt)
    attn0 = jnp.asarray(rs.randn(B, Lp, H) * 0.3, dt)
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
                "fc2": {"kernel": jnp.asarray(rs.randn(H, I).T * 0.02,
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

    def attn_heads(qkv, hs, he):
        scale = hd ** -0.5
        heads = []
        for h in range(hs, he):
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
        o_ref[0] = attn_heads(qkv_ref[0], 0, NH)

    def attn_kernel_hpg(qkv_ref, o_ref, *, hpg):
        g = pl.program_id(1)
        # static unroll over groups: program_id picks which slice to write
        for gi in range(NH // hpg):
            @pl.when(g == gi)
            def _():
                o_ref[0] = attn_heads(qkv_ref[0], gi * hpg,
                                      (gi + 1) * hpg)

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

    def tailqkv_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                       ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                       lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                       o_ref, slab_ref):
        y = tail_body(x_ref[0], attn_ref[0], wproj_ref, bproj_ref,
                      ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                      wfc2_ref, bfc2_ref)
        o_ref[0] = y
        ln = ln_f32(y, lns_ref[0], lnb_ref[0])
        qkv = jnp.dot(ln, wqkv_ref[:],
                      preferred_element_type=jnp.float32).astype(y.dtype)
        slab_ref[0] = qkv + bqkv_ref[0].astype(y.dtype)

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

    import functools
    qkv_call = pl.pallas_call(
        qkv_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, 3 * H), dt),
        grid=(B,),
        in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=sspec, compiler_params=cp)
    attn_call = pl.pallas_call(
        attn_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,), in_specs=[sspec], out_specs=xspec, compiler_params=cp)
    HPG = 4
    attn_call_hpg = pl.pallas_call(
        functools.partial(attn_kernel_hpg, hpg=HPG),
        out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B, NH // HPG),
        in_specs=[pl.BlockSpec((1, Lp, 3 * H), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Lp, HPG * hd), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        compiler_params=cp)
    tail_call = pl.pallas_call(
        tail_kernel, out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H)],
        out_specs=xspec, compiler_params=cp)
    tailqkv_call = pl.pallas_call(
        tailqkv_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Lp, H), dt),
                   jax.ShapeDtypeStruct((B, Lp, 3 * H), dt)),
        grid=(B,),
        in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                  bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                  bspec(H), bspec(H), bspec(H), wspec((H, 3 * H)),
                  bspec(3 * H)],
        out_specs=(xspec, sspec), compiler_params=cp)

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

    def bench(name, fn, args, fetch):
        jf = jax.jit(fn)
        t = min(timeit(lambda: jf(*args), fetch) for _ in range(3)) / 12
        print(f"  {name}: {t*1e3:6.2f} ms/blk", flush=True)
        return t

    # --- isolated components (12x loops, input perturbed) ---------------
    def loop12(call, first, rest):
        def f(a):
            acc = None
            for i in range(12):
                o = call(a * (1.0 + i * 1e-6), *rest)
                o = o[0] if isinstance(o, tuple) else o
                acc = o if acc is None else acc + o
            return acc
        return f

    bench("qkv-only        ", loop12(qkv_call, x, a_qkv), (x,),
          lambda o: o[:1, :1, :1])
    bench("attn-only       ", loop12(attn_call, slab0, ()), (slab0,),
          lambda o: o[:1, :1, :1])
    bench("attn-hpg4-only  ", loop12(attn_call_hpg, slab0, ()), (slab0,),
          lambda o: o[:1, :1, :1])

    def tail_loop(x):
        acc = None
        for i in range(12):
            o = tail_call(x * (1.0 + i * 1e-6), attn0, *a_tail)
            acc = o if acc is None else acc + o
        return acc
    bench("tail-only       ", tail_loop, (x,), lambda o: o[:1, :1, :1])

    # --- full-block pipelines (numerics-checked vs production) ----------
    def blk_mono(x):
        for _ in range(12):
            x = _fused_block_fwd(x, p, NH, eps, False, l_actual=L)
        return x

    def blk_split3(x):
        for _ in range(12):
            slab = qkv_call(x, *a_qkv)
            attn = attn_call(slab)
            x = tail_call(x, attn, *a_tail)
        return x

    def blk_split3_hpg(x):
        for _ in range(12):
            slab = qkv_call(x, *a_qkv)
            attn = attn_call_hpg(slab)
            x = tail_call(x, attn, *a_tail)
        return x

    def blk2(x):
        # block i's tail also emits block i+1's qkv slab (same params
        # every block here, so a plain loop is representative)
        slab = qkv_call(x, *a_qkv)
        for _ in range(12):
            attn = attn_call(slab)
            x, slab = tailqkv_call(x, attn, *a_tail, *a_qkv)
        return x

    def blk2_hpg(x):
        slab = qkv_call(x, *a_qkv)
        for _ in range(12):
            attn = attn_call_hpg(slab)
            x, slab = tailqkv_call(x, attn, *a_tail, *a_qkv)
        return x

    ref = np.asarray(jax.jit(blk_mono)(x)[:, :L], np.float32)
    for name, fn in [("mono            ", blk_mono),
                     ("split3          ", blk_split3),
                     ("split3-hpg4     ", blk_split3_hpg),
                     ("blk2            ", blk2),
                     ("blk2-hpg4       ", blk2_hpg)]:
        jf = jax.jit(fn)
        out = np.asarray(jf(x)[:, :L], np.float32)
        err = float(np.max(np.abs(out - ref) / (np.abs(ref) + 1.0)))
        t = min(timeit(lambda: jf(x), lambda o: o[:1, :1, :1])
                for _ in range(3)) / 12
        print(f"  {name}: {t*1e3:6.2f} ms/blk  ({fl_blk/t/1e12:5.1f} TF/s)"
              f"  maxrelerr={err:.1e}", flush=True)


if __name__ == "__main__":
    main()
