"""Locate the non-MXU time inside ops/fused_block._block_kernel.

The trunk block at B=64, Lp=592 runs 5.2 ms vs a ~3.07 ms padded-MXU
ideal (197 TFLOP/s v5e).  Each variant strips or restructures one phase
of the kernel; the delta vs `base` attributes the cost.  Variants are
NOT numerically correct — this is a scheduling probe, not a product
path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_trunk.py [B] [L]
"""

import functools
import sys
import time

import numpy as np


def timeit(fn, fetch, iters=20, warmup=3):
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
    from vitcap_tpu.ops.fused_block import _gelu_exact, pad_len

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 577
    H, I, NH = 768, 3072, 12
    hd = H // NH
    Lp = pad_len(L)
    eps = 1e-6
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16

    x = jnp.asarray(rs.randn(B, Lp, H), dt)
    lns = jnp.asarray(rs.randn(H), jnp.float32)
    lnb = jnp.asarray(rs.randn(H), jnp.float32)
    wqkv = jnp.asarray(rs.randn(H, 3 * H) * 0.02, dt)
    bqkv = jnp.asarray(rs.randn(3 * H), jnp.float32)
    wproj = jnp.asarray(rs.randn(H, H) * 0.02, dt)
    bproj = jnp.asarray(rs.randn(H), jnp.float32)
    ln2s = jnp.asarray(rs.randn(H), jnp.float32)
    ln2b = jnp.asarray(rs.randn(H), jnp.float32)
    wfc1 = jnp.asarray(rs.randn(H, I) * 0.02, dt)
    bfc1 = jnp.asarray(rs.randn(I), jnp.float32)
    wfc2 = jnp.asarray(rs.randn(I, H) * 0.02, dt)
    bfc2 = jnp.asarray(rs.randn(H), jnp.float32)

    NEG = -1e30

    def ln_f32(x, s, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (out * s + b).astype(x.dtype)

    def make_kernel(*, do_ln=True, do_attn=True, do_smax=True, do_gelu=True,
                    headbatch=False, mlp_tiles=1, headbatch_t=False,
                    proj_mode="batched"):
        def kern(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref,
                 wfc2_ref, bfc2_ref, o_ref):
            x = x_ref[0]
            ln = ln_f32(x, lns_ref[0], lnb_ref[0]) if do_ln else x
            scale = hd ** -0.5
            if headbatch_t:
                # transposed head-batched attention: qkv computed as
                # (3H, Lp), head split on the LEADING dim (legal reshape),
                # all heads in ONE batched dot_general per stage.
                qkvT = jax.lax.dot_general(
                    wqkv_ref[:], ln, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # bias broadcast must stay f32: Mosaic can't insert a minor
                # dim on bf16 vectors
                qkvT = (qkvT + bqkv_ref[0][:, None]).astype(x.dtype)
                q3 = qkvT.reshape(3 * NH, hd, Lp)
                qT = q3[:NH] * jnp.asarray(scale, x.dtype)
                kT = q3[NH:2 * NH]
                vT = q3[2 * NH:]
                s = jax.lax.dot_general(
                    qT, kT, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)     # (NH, Lp, Lp)
                if do_smax:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                    p = p / jnp.maximum(l, 1e-30)
                else:
                    p = s
                o = jax.lax.dot_general(
                    p.astype(x.dtype), vT, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32).astype(x.dtype)
                # o: (NH, Lp, hd)
                if proj_mode == "batched":
                    w3 = wproj_ref[:].reshape(NH, hd, H)
                    pr = jax.lax.dot_general(
                        o, w3, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (NH, Lp, H)
                    proj = jnp.sum(pr, axis=0).astype(x.dtype)
                else:
                    # scatter heads back into a (Lp, H) scratch-free concat
                    attn = jnp.concatenate(
                        [o[h] for h in range(NH)], axis=-1)
                    proj = jnp.dot(attn, wproj_ref[:],
                                   preferred_element_type=jnp.float32
                                   ).astype(x.dtype)
                x = x + proj + bproj_ref[0].astype(x.dtype)
                ln2 = ln_f32(x, ln2s_ref[0], ln2b_ref[0]) if do_ln else x
                act = _gelu_exact if do_gelu else (
                    lambda a: jnp.maximum(a, 0))
                h1 = jnp.dot(ln2, wfc1_ref[:],
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
                h1 = act(h1 + bfc1_ref[0].astype(x.dtype))
                y = jnp.dot(h1, wfc2_ref[:],
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype)
                o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)
                return
            qkv = jnp.dot(ln, wqkv_ref[:],
                          preferred_element_type=jnp.float32).astype(x.dtype)
            qkv = qkv + bqkv_ref[0].astype(x.dtype)
            if not do_attn:
                attn = qkv[:, :H]
            elif headbatch:
                q = qkv[:, :H].reshape(Lp, NH, hd).transpose(1, 0, 2)
                k = qkv[:, H:2 * H].reshape(Lp, NH, hd).transpose(1, 0, 2)
                v = qkv[:, 2 * H:].reshape(Lp, NH, hd).transpose(1, 0, 2)
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                if do_smax:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    l = jnp.sum(p, axis=-1, keepdims=True)
                else:
                    p, l = s, jnp.float32(1.0)
                o = jax.lax.dot_general(
                    p.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                o = (o / jnp.maximum(l, 1e-30)).astype(x.dtype)
                attn = o.transpose(1, 0, 2).reshape(Lp, H)
            else:
                heads = []
                for h in range(NH):
                    q = qkv[:, h * hd:(h + 1) * hd]
                    k = qkv[:, H + h * hd:H + (h + 1) * hd]
                    v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    if do_smax:
                        m = jnp.max(s, axis=-1, keepdims=True)
                        p = jnp.exp(s - m)
                        l = jnp.sum(p, axis=-1, keepdims=True)
                    else:
                        p, l = s, jnp.float32(1.0)
                    o = jnp.dot(p.astype(x.dtype), v,
                                preferred_element_type=jnp.float32)
                    heads.append((o / jnp.maximum(l, 1e-30)).astype(x.dtype))
                attn = jnp.concatenate(heads, axis=-1)
            proj = jnp.dot(attn, wproj_ref[:],
                           preferred_element_type=jnp.float32).astype(x.dtype)
            x = x + proj + bproj_ref[0].astype(x.dtype)

            ln2 = ln_f32(x, ln2s_ref[0], ln2b_ref[0]) if do_ln else x
            act = _gelu_exact if do_gelu else (lambda a: jnp.maximum(a, 0))
            if mlp_tiles == 1:
                h1 = jnp.dot(ln2, wfc1_ref[:],
                             preferred_element_type=jnp.float32).astype(x.dtype)
                h1 = act(h1 + bfc1_ref[0].astype(x.dtype))
                y = jnp.dot(h1, wfc2_ref[:],
                            preferred_element_type=jnp.float32).astype(x.dtype)
                o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)
            else:
                # row-tiled fc1→gelu→fc2: VPU gelu of tile i overlaps MXU
                # matmuls of tile i+1.  Uneven tail tile keeps 16-alignment.
                tile = (Lp // mlp_tiles + 15) // 16 * 16
                bounds = [(t * tile, min((t + 1) * tile, Lp))
                          for t in range((Lp + tile - 1) // tile)]
                ys = []
                for lo, hi in bounds:
                    rows = slice(lo, hi)
                    h1 = jnp.dot(ln2[rows], wfc1_ref[:],
                                 preferred_element_type=jnp.float32
                                 ).astype(x.dtype)
                    h1 = act(h1 + bfc1_ref[0].astype(x.dtype))
                    ys.append(jnp.dot(h1, wfc2_ref[:],
                                      preferred_element_type=jnp.float32
                                      ).astype(x.dtype))
                y = jnp.concatenate(ys, axis=0)
                o_ref[0] = x + y + bfc2_ref[0].astype(x.dtype)
        return kern

    row = lambda a: a.reshape(1, -1)
    def run(kern, semantics=None):
        bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        cp = dict(vmem_limit_bytes=100 * 1024 * 1024)
        if semantics:
            cp["dimension_semantics"] = semantics
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B,),
            in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                      bspec(3 * H), wspec((H, H)), bspec(H),
                      bspec(H), bspec(H), wspec((H, I)), bspec(I),
                      wspec((I, H)), bspec(H)],
            out_specs=xspec,
            compiler_params=pltpu.CompilerParams(**cp),
        )

        def twelve(x):
            for _ in range(12):
                x = call(x, row(lns), row(lnb), wqkv, row(bqkv), wproj,
                         row(bproj), row(ln2s), row(ln2b), wfc1, row(bfc1),
                         wfc2, row(bfc2))
            return x
        jf = jax.jit(twelve)
        return timeit(lambda: jf(x), lambda o: o[:1, :1, :1]) / 12

    fl_blk = (4 * Lp * H * H + 2 * Lp * Lp * H + 2 * Lp * H * I) * 2 * B
    variants = [
        ("base            ", make_kernel(), None),
        ("no-softmax      ", make_kernel(do_smax=False), None),
        ("no-ln           ", make_kernel(do_ln=False), None),
        ("no-gelu         ", make_kernel(do_gelu=False), None),
        ("no-attn         ", make_kernel(do_attn=False), None),
        ("headbatch       ", make_kernel(headbatch=True), None),
        ("headbatch-T     ", make_kernel(headbatch_t=True), None),
        ("headbatch-T-cat ", make_kernel(headbatch_t=True,
                                         proj_mode="concat"), None),
        ("mlp-tiles-4     ", make_kernel(mlp_tiles=4), None),
    ]
    print(f"B={B} Lp={Lp} padded-ideal/blk = {fl_blk/197e12*1e3:.2f} ms")
    for name, kern, sem in variants:
        try:
            t = run(kern, sem)
            print(f"  {name}: {t*1e3:6.2f} ms/blk  ({fl_blk/t/1e12:5.1f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # --- split-kernel variants: same math, 2 pallas calls per block ------
    # Hypothesis: the monolithic kernel's attention runs 5x slower than the
    # identical ops in a standalone kernel (Mosaic scheduling interaction);
    # splitting pays one (Lp,H) HBM round trip (~0.14 ms/blk) to recover it.
    def head_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, o_ref):
        """LN1 + qkv + per-head attention + concat -> (Lp, H) attn out."""
        x = x_ref[0]
        ln = ln_f32(x, lns_ref[0], lnb_ref[0])
        qkv = jnp.dot(ln, wqkv_ref[:],
                      preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = qkv + bqkv_ref[0].astype(x.dtype)
        scale = hd ** -0.5
        heads = []
        for h in range(NH):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, H + h * hd:H + (h + 1) * hd]
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(x.dtype), v,
                        preferred_element_type=jnp.float32)
            heads.append((o / jnp.maximum(l, 1e-30)).astype(x.dtype))
        o_ref[0] = jnp.concatenate(heads, axis=-1)

    def tail_kernel(x_ref, attn_ref, wproj_ref, bproj_ref, ln2s_ref,
                    ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                    o_ref):
        """proj + residual + LN2 + MLP + residual."""
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

    def run_split():
        bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        head_call = pl.pallas_call(
            head_kernel,
            out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B,),
            in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                      bspec(3 * H)],
            out_specs=xspec, compiler_params=cp)
        tail_call = pl.pallas_call(
            tail_kernel,
            out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B,),
            in_specs=[xspec, xspec, wspec((H, H)), bspec(H), bspec(H),
                      bspec(H), wspec((H, I)), bspec(I), wspec((I, H)),
                      bspec(H)],
            out_specs=xspec, compiler_params=cp)

        def twelve(x):
            for _ in range(12):
                attn = head_call(x, row(lns), row(lnb), wqkv, row(bqkv))
                x = tail_call(x, attn, wproj, row(bproj), row(ln2s),
                              row(ln2b), wfc1, row(bfc1), wfc2, row(bfc2))
            return x
        jf = jax.jit(twelve)
        return min(timeit(lambda: jf(x), lambda o: o[:1, :1, :1])
                   for _ in range(3)) / 12

    try:
        t = run_split()
        print(f"  split-2-kernels : {t*1e3:6.2f} ms/blk  "
              f"({fl_blk/t/1e12:5.1f} TF/s)", flush=True)
    except Exception as e:
        print(f"  split-2-kernels : FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # XLA attention-only probe at the padded shape (option: give attention
    # back to XLA between two fused kernels)
    q = jnp.asarray(rs.randn(B, NH, Lp, hd), dt)
    k = jnp.asarray(rs.randn(B, NH, Lp, hd), dt)
    v = jnp.asarray(rs.randn(B, NH, Lp, hd), dt)

    def xla_attn(q, k, v):
        s = jnp.einsum("bhld,bhmd->bhlm", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        return jnp.einsum("bhlm,bhmd->bhld", p, v,
                          preferred_element_type=jnp.float32).astype(dt)

    jf = jax.jit(xla_attn)
    t = timeit(lambda: jf(q, k, v), lambda o: o[:1, :1, :1, :1])
    fl_attn = 2 * Lp * Lp * H * 2 * B
    print(f"  xla-attn-only   : {t*1e3:6.2f} ms/blk  "
          f"(attn ideal {fl_attn/197e12*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
