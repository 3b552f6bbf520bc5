"""Attention-only kernel probes at the trunk shape (B=64, Lp=592, 12
heads, hd=64, bf16).  Finds where the ~2.0 ms/blk attention cost (vs the
0.70 ms 50%-MXU intrinsic bound for hd=64) goes: slab slicing, k
transpose, the small matmuls, or softmax.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ablate_attn.py [B]
"""

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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H, NH, hd, Lp = 768, 12, 64, 592
    dt = jnp.bfloat16
    rs = np.random.RandomState(0)
    slab = jnp.asarray(rs.randn(B, Lp, 3 * H) * 0.3, dt)   # fake qkv slab
    qs = jnp.asarray(rs.randn(B, NH, Lp, hd) * 0.3, dt)    # pre-split
    ks = jnp.asarray(rs.randn(B, NH, Lp, hd) * 0.3, dt)
    vs = jnp.asarray(rs.randn(B, NH, Lp, hd) * 0.3, dt)
    kts = jnp.asarray(rs.randn(B, NH, hd, Lp) * 0.3, dt)   # k pre-transposed
    scale = hd ** -0.5
    fl = 2 * Lp * Lp * H * 2 * B   # per-"block" attention flops

    def attn_rows(q, k, v, do_smax=True):
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if do_smax:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(l, 1e-30)
        else:
            p = s
        return jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32
                       ).astype(dt)

    # --- variant kernels -------------------------------------------------
    def k_slab(slab_ref, o_ref, *, do_smax=True):
        """Exactly the base fused-block attention: slice from (Lp,3H)."""
        qkv = slab_ref[0]
        heads = []
        for h in range(NH):
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, H + h * hd:H + (h + 1) * hd]
            v = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
            heads.append(attn_rows(q, k, v, do_smax))
        o_ref[0] = jnp.concatenate(heads, axis=-1)

    def k_presplit(q_ref, k_ref, v_ref, o_ref, *, do_smax=True):
        """Heads pre-split on a leading dim: no slab slicing."""
        heads = []
        for h in range(NH):
            heads.append(attn_rows(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                   do_smax))
        o_ref[0] = jnp.concatenate(heads, axis=-1)

    def k_pret(q_ref, kt_ref, v_ref, o_ref, *, do_smax=True):
        """k pre-transposed: scores = q @ kT without in-kernel transpose."""
        heads = []
        for h in range(NH):
            q = q_ref[0, h]
            kt = kt_ref[0, h]                       # (hd, Lp)
            s = jnp.dot(q, kt, preferred_element_type=jnp.float32) * scale
            if do_smax:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p = p / jnp.maximum(l, 1e-30)
            else:
                p = s
            heads.append(jnp.dot(p.astype(dt), v_ref[0, h],
                                 preferred_element_type=jnp.float32
                                 ).astype(dt))
        o_ref[0] = jnp.concatenate(heads, axis=-1)

    def k_batched(q_ref, k_ref, v_ref, o_ref, *, do_smax=True):
        """One batched dot_general over the head dim."""
        q, k, v = q_ref[0], k_ref[0], v_ref[0]     # (NH, Lp, hd)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        if do_smax:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(l, 1e-30)
        else:
            p = s
        o = jax.lax.dot_general(p.astype(dt), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[0] = jnp.concatenate([o[h] for h in range(NH)],
                                   axis=-1).astype(dt)

    LG = 640                    # gap-padded segment stride (5x128 lanes)

    def k_pairbd(q_ref, k_ref, v_ref, o_ref, *, do_smax=True):
        """Two heads per matmul with block-diagonal packing: the pair score
        matmul is (Lp,128)@(128,2*LG) — K=128 full-MXU contraction at 2x
        flops == the hd=64 intrinsic bound, but via fewer, larger matmuls.
        Segments live at lane offsets 0/LG (128-aligned) so the per-segment
        softmax slices need no relayout."""
        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        zgap = jnp.zeros((LG - Lp, 2 * hd), dt)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (Lp, 2 * LG), 1)
        seg = kidx % LG
        valid = seg < Lp
        outs = []
        for h in range(0, NH, 2):
            qp = jnp.concatenate([q[h], q[h + 1]], axis=-1)      # (Lp,128)
            z = jnp.zeros((Lp, hd), dt)
            kbd = jnp.concatenate([
                jnp.concatenate([k[h], z], axis=-1), zgap,
                jnp.concatenate([z, k[h + 1]], axis=-1), zgap],
                axis=0)                                          # (2LG,128)
            s = jax.lax.dot_general(qp, kbd, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale                    # (Lp,2LG)
            if do_smax:
                s = jnp.where(valid, s, -1e30)
                s1, s2 = s[:, :LG], s[:, LG:]
                m1 = jnp.max(s1, axis=-1, keepdims=True)
                m2 = jnp.max(s2, axis=-1, keepdims=True)
                p1 = jnp.exp(s1 - m1)
                p2 = jnp.exp(s2 - m2)
                l1 = jnp.sum(p1, axis=-1, keepdims=True)
                l2 = jnp.sum(p2, axis=-1, keepdims=True)
                p = jnp.concatenate([p1 / jnp.maximum(l1, 1e-30),
                                     p2 / jnp.maximum(l2, 1e-30)], axis=-1)
            else:
                p = jnp.where(valid, s, 0.0)
            vst = jnp.concatenate([
                jnp.concatenate([v[h], z], axis=-1), zgap,
                jnp.concatenate([z, v[h + 1]], axis=-1), zgap],
                axis=0)                                          # (2LG,128)
            outs.append(jnp.dot(p.astype(dt), vst,
                                preferred_element_type=jnp.float32
                                ).astype(dt))                    # (Lp,128)
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    # --- harness ----------------------------------------------------------
    def run(kern, inputs, specs):
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B,),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        # 12 in-graph applications per dispatch: single-call timings are
        # tunnel-RPC-noise-bound.  First input is perturbed per call to
        # defeat CSE; outputs accumulate to defeat DCE.
        def twelve(*a):
            acc = None
            for i in range(12):
                o = call(a[0] * (1.0 + i * 1e-6), *a[1:])
                acc = o if acc is None else acc + o
            return acc
        jf = jax.jit(twelve)
        t = min(timeit(lambda: jf(*inputs), lambda o: o[:1, :1, :1],
                       iters=10) for _ in range(3))
        return t / 12

    slab_spec = [pl.BlockSpec((1, Lp, 3 * H), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    split_spec = [pl.BlockSpec((1, NH, Lp, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3
    pret_spec = [split_spec[0],
                 pl.BlockSpec((1, NH, hd, Lp), lambda b: (b, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 split_spec[0]]

    import functools
    probes = [
        ("slab (base)     ", k_slab, (slab,), slab_spec),
        ("slab nosmax     ", functools.partial(k_slab, do_smax=False),
         (slab,), slab_spec),
        ("presplit        ", k_presplit, (qs, ks, vs), split_spec),
        ("presplit nosmax ", functools.partial(k_presplit, do_smax=False),
         (qs, ks, vs), split_spec),
        ("pre-transposed-k", k_pret, (qs, kts, vs), pret_spec),
        ("batched-dot     ", k_batched, (qs, ks, vs), split_spec),
        ("pair-blockdiag  ", k_pairbd, (qs, ks, vs), split_spec),
    ]
    print(f"B={B} attention intrinsic bound (hd=64 @50% MXU): "
          f"{fl/0.5/197e12*1e3:.2f} ms; raw flops ideal {fl/197e12*1e3:.2f}")
    for name, kern, inputs, specs in probes:
        try:
            t = run(kern, inputs, specs)
            print(f"  {name}: {t*1e3:6.2f} ms  ({fl/t/1e12:5.1f} TF/s)",
                  flush=True)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
