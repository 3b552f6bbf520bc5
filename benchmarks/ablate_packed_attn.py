"""Packed-layout train attention fwd+bwd cost at the trunk shape.

12-deep dependent chain of flash_attention_packed, differentiated end to
end: measures 12 forward + 12 one-pass-backward kernel applications —
i.e. the attention share of a 12-block trunk train step at B=64.

Run: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/ablate_packed_attn.py [B] [L] [rate]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.ops.flash_attention import flash_attention_packed

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 577
    rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    H, NH = 768, 12
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rs.randn(B, L, H) * 0.3, dt)
    k = jnp.asarray(rs.randn(B, L, H) * 0.3, dt)
    v = jnp.asarray(rs.randn(B, L, H) * 0.3, dt)
    seed = jnp.zeros((), jnp.int32)

    def chain(q, k, v):
        x = q
        for _ in range(12):
            o = flash_attention_packed(x, k, v, None, seed, NH, False,
                                       rate)
            x = x + o.astype(dt) * jnp.bfloat16(0.1)
        return jnp.sum(x.astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(chain, argnums=(0, 1, 2)))

    def timeit(fn, iters=10, warmup=3):
        for _ in range(warmup):
            out = fn()
        np.asarray(out[0][:1, :1, :1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0][:1, :1, :1])
        return (time.perf_counter() - t0) / iters

    t = min(timeit(lambda: gf(q, k, v)) for _ in range(3)) / 12
    # fwd 2 dots + bwd 4 dots + 1 recompute dot = 7 Lp^2-class dots
    print(f"B={B} L={L} rate={rate}: {t*1e3:6.2f} ms per block-equivalent"
          f" (12x fwd+bwd chain)", flush=True)


if __name__ == "__main__":
    main()
