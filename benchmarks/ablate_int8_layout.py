"""Ablate int8 decode-cache cost on the real chip.

Part 1 — prefill-side quantize cost: time ONE (B, S, H) bf16 tensor
through quantize variants (the live prefill does this 8x: k/v x 4 layers).

Part 2 — scan-side read: 19-step scan whose body does the real
score+out einsum pair against a carried q window, per int8 layout:
  a. (B, nH, S, 64) int8   head layout (minor 64 -> possible lane pad)
  b. (B, S, 768)   int8    merged minor (no pad), heads via reshape+dot
  c. bf16 (B, nH, S, 64)   baseline
Reports ms/step and effective GB/s over UNPADDED cache bytes.

Run: python benchmarks/ablate_int8_layout.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, fetch, iters=20, warmup=2):
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nH, hd, S = 12, 64, 627
    H = nH * hd
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(B, S, H), jnp.bfloat16)

    # ---- part 1: quantize variants on one (B,S,H) tensor ----
    def q_f32(a):
        a4 = a.reshape(B, S, nH, hd)
        absmax = jnp.max(jnp.abs(a4.astype(jnp.float32)), axis=(1, 3))
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(a4.astype(jnp.float32)
                                / scale[:, None, :, None]),
                      -127, 127).astype(jnp.int8)
        return q8.transpose(0, 2, 1, 3), scale

    def q_bf16max(a):
        a4 = a.reshape(B, S, nH, hd)
        absmax = jnp.max(jnp.abs(a4), axis=(1, 3)).astype(jnp.float32)
        inv = 127.0 / jnp.maximum(absmax, 1e-8)
        q8 = jnp.clip(jnp.round(a4.astype(jnp.float32)
                                * inv[:, None, :, None]),
                      -127, 127).astype(jnp.int8)
        return q8.transpose(0, 2, 1, 3), 1.0 / inv

    def q_notrans(a):
        a4 = a.reshape(B, S, nH, hd)
        absmax = jnp.max(jnp.abs(a4), axis=(1, 3)).astype(jnp.float32)
        inv = 127.0 / jnp.maximum(absmax, 1e-8)
        q8 = jnp.clip(jnp.round(a4.astype(jnp.float32)
                                * inv[:, None, :, None]),
                      -127, 127).astype(jnp.int8)
        return q8, 1.0 / inv             # stays (B, S, nH, hd)

    def q_pertensor(a):
        absmax = jnp.max(jnp.abs(a)).astype(jnp.float32)
        inv = 127.0 / jnp.maximum(absmax, 1e-8)
        q8 = jnp.clip(jnp.round(a.astype(jnp.float32) * inv),
                      -127, 127).astype(jnp.int8)
        return q8, 1.0 / inv             # (B, S, H) merged, per-tensor scale

    for name, fn in [("f32-absmax+trans", q_f32),
                     ("bf16-absmax+trans", q_bf16max),
                     ("bf16-absmax, no trans", q_notrans),
                     ("per-tensor, merged", q_pertensor)]:
        jf = jax.jit(fn)
        t = timeit(lambda: jf(a), lambda o: o[0][:1].sum())
        print(f"quantize {name:24}: {t*1e3:7.3f} ms/tensor "
              f"(x8 = {8*t*1e3:6.2f} ms/batch)", flush=True)

    # baseline: the bf16 head transpose the no-quant path pays
    jt = jax.jit(lambda a: a.reshape(B, S, nH, hd).transpose(0, 2, 1, 3))
    t = timeit(lambda: jt(a), lambda o: o[:1].sum())
    print(f"bf16 head transpose (no-quant path): {t*1e3:7.3f} ms/tensor "
          f"(x8 = {8*t*1e3:6.2f} ms)", flush=True)

    # ---- part 2: scan read layouts ----
    steps = 19
    q0 = jnp.asarray(rng.randn(B, nH, 1, hd), jnp.bfloat16)

    kv_bytes_i8 = 2 * B * nH * S * hd          # k+v, one layer equivalent
    kv_bytes_bf = 2 * kv_bytes_i8

    def run_scan(body, init_q):
        def f(carry, _):
            return body(carry), None
        return jax.lax.scan(f, init_q, None, length=steps)[0]

    # a. head-layout int8
    k8 = jnp.asarray(np.clip(rng.randn(B, nH, S, hd) * 40, -127, 127)
                     .astype(np.int8))
    v8 = jnp.asarray(np.clip(rng.randn(B, nH, S, hd) * 40, -127, 127)
                     .astype(np.int8))
    sc = jnp.asarray(np.abs(rng.randn(B, nH, 1, 1)) + .5, jnp.float32)

    def body_a(q):
        q8 = jnp.clip(jnp.round(q.astype(jnp.float32) * 32.0), -127, 127) \
            .astype(jnp.int8)
        s = jnp.einsum("bhqd,bhkd->bhqk", q8, k8,
                       preferred_element_type=jnp.int32)
        p = jax.nn.softmax(s.astype(jnp.float32) * sc, axis=-1)
        p8 = jnp.clip(jnp.round(p * 127.0), -127, 127).astype(jnp.int8)
        o = jnp.einsum("bhqk,bhkd->bhqd", p8, v8,
                       preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    jf = jax.jit(lambda q: run_scan(body_a, q))
    t = timeit(lambda: jf(q0), lambda o: o, iters=10)
    print(f"scan a (B,nH,S,64) int8 : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes_i8/(t/steps)/1e9:7.1f} GB/s eff", flush=True)

    # b. merged-minor int8 (B, S, H)
    k8m = jnp.asarray(np.clip(rng.randn(B, S, H) * 40, -127, 127)
                      .astype(np.int8))
    v8m = jnp.asarray(np.clip(rng.randn(B, S, H) * 40, -127, 127)
                      .astype(np.int8))

    def body_b(q):
        q8 = jnp.clip(jnp.round(q.astype(jnp.float32) * 32.0), -127, 127) \
            .astype(jnp.int8)
        k4 = k8m.reshape(B, S, nH, hd)
        s = jnp.einsum("bhqd,bshd->bhqs", q8, k4,
                       preferred_element_type=jnp.int32)
        p = jax.nn.softmax(s.astype(jnp.float32) * sc, axis=-1)
        p8 = jnp.clip(jnp.round(p * 127.0), -127, 127).astype(jnp.int8)
        v4 = v8m.reshape(B, S, nH, hd)
        o = jnp.einsum("bhqs,bshd->bhqd", p8, v4,
                       preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    jf = jax.jit(lambda q: run_scan(body_b, q))
    t = timeit(lambda: jf(q0), lambda o: o, iters=10)
    print(f"scan b (B,S,768)  int8  : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes_i8/(t/steps)/1e9:7.1f} GB/s eff", flush=True)

    # d. int8 stored, CONVERT-to-bf16 fused into the dot (bf16 MXU):
    # HBM reads int8 bytes, the convert rides the operand fusion, and the
    # per-(b,h) scale folds into q / the output instead of the cache.
    def body_d(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q * sc.astype(jnp.bfloat16),
                       k8.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v8.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return (o * sc).astype(jnp.bfloat16)

    jf = jax.jit(lambda q: run_scan(body_d, q))
    t = timeit(lambda: jf(q0), lambda o: o, iters=10)
    print(f"scan d int8->bf16 fused : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes_i8/(t/steps)/1e9:7.1f} GB/s eff", flush=True)

    # c. bf16 baseline head layout
    kb = jnp.asarray(rng.randn(B, nH, S, hd), jnp.bfloat16)
    vb = jnp.asarray(rng.randn(B, nH, S, hd), jnp.bfloat16)

    def body_c(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vb,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    jf = jax.jit(lambda q: run_scan(body_c, q))
    t = timeit(lambda: jf(q0), lambda o: o, iters=10)
    print(f"scan c (B,nH,S,64) bf16 : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes_bf/(t/steps)/1e9:7.1f} GB/s eff", flush=True)

    # e. bf16 merged-minor (B, S, 768) — the PROJECTION layout the prefill
    # denses produce.  If this reads as fast as head layout in-scan, the
    # ctx build can skip its 8 head transposes (~17 ms/batch at B=64).
    kbm = jnp.asarray(rng.randn(B, S, H), jnp.bfloat16)
    vbm = jnp.asarray(rng.randn(B, S, H), jnp.bfloat16)

    def body_e(q):
        k4 = kbm.reshape(B, S, nH, hd)
        s = jnp.einsum("bhqd,bshd->bhqs", q, k4,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        v4 = vbm.reshape(B, S, nH, hd)
        o = jnp.einsum("bhqs,bshd->bhqd", p, v4,
                       preferred_element_type=jnp.float32)
        return o.astype(jnp.bfloat16)

    jf = jax.jit(lambda q: run_scan(body_e, q))
    t = timeit(lambda: jf(q0), lambda o: o, iters=10)
    print(f"scan e (B,S,768)  bf16  : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes_bf/(t/steps)/1e9:7.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
