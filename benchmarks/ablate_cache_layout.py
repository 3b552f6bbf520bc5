"""Measure decode-cache read bandwidth per KV layout on the real chip.

The decode scan's context caches are (B, nH, S, hd=64) bf16.  TPU memory
tiling pads the minor (lane) dimension to 128, so hd=64 may stream 2x the
bytes.  Candidate layouts:

  a. (B, nH, S, 64)   current     minor 64  -> possible 2x pad
  b. (B, nH, 64, S)   transposed  minor S (627 -> pad 640, ~2%)
  c. (B, S, 768)      merged      minor 768, heads via in-kernel reshape

Each variant runs a 19-step scan whose body computes the REAL score+out
einsum pair against a carried q window (not hoistable), and reports
ms/step and achieved GB/s over the unpadded cache bytes.

Run: python benchmarks/ablate_cache_layout.py [B]
"""

import sys
import time

import numpy as np


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
    nH, hd, S, A = 12, 64, 627, 20
    H = nH * hd
    steps = A - 1
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    # 4 layers x (k, v) like the real decoder
    def mk(shape):
        return [jnp.asarray(rng.randn(*shape) * 0.1, dt) for _ in range(4)]

    bytes_unpadded = 2 * 4 * B * S * H * 2  # k+v, 4 layers, bf16

    def run(body, carry0, env):
        def g(carry0, env):
            def step(c, t):
                return body(c, t, env), None
            c, _ = jax.lax.scan(step, carry0, jnp.arange(1, A))
            return c
        jg = jax.jit(g)
        return timeit(lambda: jg(carry0, env),
                      lambda o: jax.tree_util.tree_leaves(o)[0]) / steps

    q0 = jnp.asarray(rng.randn(B, nH, 2, hd) * 0.1, dt)

    # a. current (B, nH, S, hd)
    ks, vs = mk((B, nH, S, hd)), mk((B, nH, S, hd))

    def body_a(c, t, env):
        q = c
        ks, vs = env
        for li in range(4):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, ks[li],
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(dt)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vs[li],
                           preferred_element_type=dt)
            q = q + o * 1e-3
        return q
    ta = run(body_a, q0, (ks, vs))
    print(f"a (B,nH,S,64):  {ta*1e3:7.3f} ms/step  "
          f"{bytes_unpadded/ta/1e9:7.1f} GB/s eff", flush=True)

    # b. transposed (B, nH, hd, S): k natural for scores; v too (out
    #    einsum contracts S on the minor dim of both operands)
    ks_t = [k.transpose(0, 1, 3, 2) for k in ks]
    vs_t = [v.transpose(0, 1, 3, 2) for v in vs]

    def body_b(c, t, env):
        q = c
        ks_t, vs_t = env
        for li in range(4):
            s = jnp.einsum("bhqd,bhdk->bhqk", q, ks_t[li],
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(dt)
            o = jnp.einsum("bhqk,bhdk->bhqd", p, vs_t[li],
                           preferred_element_type=dt)
            q = q + o * 1e-3
        return q
    tb = run(body_b, q0, (ks_t, vs_t))
    print(f"b (B,nH,64,S):  {tb*1e3:7.3f} ms/step  "
          f"{bytes_unpadded/tb/1e9:7.1f} GB/s eff", flush=True)

    # c. merged (B, S, H): heads recovered by reshape at use time
    ks_m = [k.transpose(0, 2, 1, 3).reshape(B, S, H) for k in ks]
    vs_m = [v.transpose(0, 2, 1, 3).reshape(B, S, H) for v in vs]

    def body_c(c, t, env):
        q = c
        ks_m, vs_m = env
        for li in range(4):
            kh = ks_m[li].reshape(B, S, nH, hd).transpose(0, 2, 1, 3)
            vh = vs_m[li].reshape(B, S, nH, hd).transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kh,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(dt)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                           preferred_element_type=dt)
            q = q + o * 1e-3
        return q
    tc = run(body_c, q0, (ks_m, vs_m))
    print(f"c (B,S,768):    {tc*1e3:7.3f} ms/step  "
          f"{bytes_unpadded/tc/1e9:7.1f} GB/s eff", flush=True)

    # d/e. pure-read floor: sum-reduce the caches, no attention math.
    # The reduction is scaled by a carry element so XLA cannot hoist the
    # reads out of the scan (a carry-independent sum computes once).
    def body_d(c, t, env):
        acc = c
        g = acc[0, 0].astype(dt)
        ks, vs = env
        for li in range(4):
            acc = acc + jnp.sum(ks[li] * g, axis=(1, 2)) \
                + jnp.sum(vs[li] * g, axis=(1, 2))
        return acc * 1e-3
    td = run(body_d, jnp.ones((B, hd), dt), (ks, vs))
    print(f"d read(a)-only: {td*1e3:7.3f} ms/step  "
          f"{bytes_unpadded/td/1e9:7.1f} GB/s eff", flush=True)

    def body_e(c, t, env):
        acc = c
        g = acc[0, 0].astype(dt)
        ks_t, vs_t = env
        for li in range(4):
            acc = acc + jnp.sum(ks_t[li] * g, axis=(1, 3)) \
                + jnp.sum(vs_t[li] * g, axis=(1, 3))
        return acc * 1e-3
    td2 = run(body_e, jnp.ones((B, hd), dt), (ks_t, vs_t))
    print(f"e read(b)-only: {td2*1e3:7.3f} ms/step  "
          f"{bytes_unpadded/td2/1e9:7.1f} GB/s eff", flush=True)


if __name__ == "__main__":
    main()
