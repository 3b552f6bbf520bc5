"""Microbench the fused decode-attention kernel (ops/decode_attn.py) vs
the XLA einsum pair at flagship decode shapes (one layer, 19-step scan).

Run: python benchmarks/bench_decode_attn.py [B] [nb]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, fetch, iters=10, warmup=2):
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
    from vitcap_tpu.ops.decode_attn import (fused_decode_attention,
                                            capwin_bias)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    nh, dh, S, A = 12, 64, 627, 20
    H = nh * dh
    Sp = (S + 127) // 128 * 128
    Bb = B * nb
    steps = 19
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    ctxk = jnp.asarray(rng.randn(B, Sp, H), dt)
    ctxv = jnp.asarray(rng.randn(B, Sp, H), dt)
    ctxb = jnp.where(jnp.arange(Sp)[None, :] < S, 0.0, -1e30).astype(
        jnp.float32) * jnp.ones((B, 1), jnp.float32)
    capk = jnp.asarray(rng.randn(Bb, A, H), dt)
    capv = jnp.asarray(rng.randn(Bb, A, H), dt)
    qw0 = jnp.asarray(rng.randn(Bb, 2, H), dt)

    kv_bytes = 2 * B * S * H * 2          # unpadded ctx K+V bf16

    def run_scan(body, q0):
        def step(carry, t):
            q = carry
            o = body(q, t)
            return (q + o * 1e-6).astype(dt), ()
        out, _ = jax.lax.scan(step, q0, jnp.arange(1, steps + 1))
        return out

    # fused kernel
    def body_fused(q, t):
        cwb = capwin_bias(nb, A, t)
        return fused_decode_attention(q, q, q, capk, capv, ctxk, ctxv,
                                      ctxb, cwb, nh)

    jf = jax.jit(lambda q: run_scan(body_fused, q))
    t = timeit(lambda: jf(qw0), lambda o: o)
    print(f"fused kernel        : {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes/(t/steps)/1e9:7.1f} GB/s eff", flush=True)

    # XLA head-layout einsum pair (the live scan body's ctx part + cap/self)
    from vitcap_tpu.models.decode import _decode_attention

    ps = {"query": {"kernel": jnp.asarray(rng.randn(H, H) * 0.02, dt),
                    "bias": jnp.zeros((H,), dt)},
          "key": {"kernel": jnp.asarray(rng.randn(H, H) * 0.02, dt),
                  "bias": jnp.zeros((H,), dt)},
          "value": {"kernel": jnp.asarray(rng.randn(H, H) * 0.02, dt),
                    "bias": jnp.zeros((H,), dt)}}
    ctxk_h = ctxk[:, :S].reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
    ctxv_h = ctxv[:, :S].reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
    capk_h = capk.reshape(Bb, A, nh, dh).transpose(0, 2, 1, 3)
    capv_h = capv.reshape(Bb, A, nh, dh).transpose(0, 2, 1, 3)
    valid = jnp.ones((B, S), bool)

    def body_xla(q, t):
        o, _, _ = _decode_attention(ps, q, capk_h, capv_h, ctxk_h, ctxv_h,
                                    valid, t, nh)
        return o

    jx = jax.jit(lambda q: run_scan(body_xla, q))
    t = timeit(lambda: jx(qw0), lambda o: o)
    print(f"xla heads (+qkv proj): {t/steps*1e3:7.3f} ms/step "
          f"{kv_bytes/(t/steps)/1e9:7.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
