"""Does trunk-block padding granularity matter?  L=577 currently pads to
640 (TQ=128 alignment): ~11% garbage q rows through every matmul.  Sublane
alignment (8) only needs 584.  Times 12 sequential whole-block kernels at
both paddings on the real chip.

Run: python benchmarks/ablate_block_pad.py [B]
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.ops.fused_block import _block_kernel

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = 577
    cfg = ModelConfig(dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    blocks = params["encoder"]["blocks"]
    rs = np.random.RandomState(0)
    H, I = 768, 3072
    fl = 12 * (4 * L * H**2 + 2 * L * L * H + 2 * L * H * I) * 2 * B

    def call_block(p, x, Lp):
        dt = x.dtype
        kern = functools.partial(_block_kernel, num_heads=12, eps=1e-6,
                                 l_actual=L, lp=Lp)
        row = lambda a: a.reshape(1, -1)
        bspec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        wspec = lambda s: pl.BlockSpec(s, lambda b: (0, 0),
                                       memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, Lp, H), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, Lp, H), dt),
            grid=(B,),
            in_specs=[xspec, bspec(H), bspec(H), wspec((H, 3 * H)),
                      bspec(3 * H), wspec((H, H)), bspec(H),
                      bspec(H), bspec(H), wspec((H, I)), bspec(I),
                      wspec((I, H)), bspec(H)],
            out_specs=xspec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x,
          row(p["norm1"]["scale"]), row(p["norm1"]["bias"]),
          p["attn"]["qkv"]["kernel"].astype(dt),
          row(p["attn"]["qkv"]["bias"]),
          p["attn"]["proj"]["kernel"].astype(dt),
          row(p["attn"]["proj"]["bias"]),
          row(p["norm2"]["scale"]), row(p["norm2"]["bias"]),
          p["mlp"]["fc1"]["kernel"].astype(dt),
          row(p["mlp"]["fc1"]["bias"]),
          p["mlp"]["fc2"]["kernel"].astype(dt),
          row(p["mlp"]["fc2"]["bias"]))

    for Lp in (640, 584):
        x = jnp.asarray(rs.randn(B, Lp, H) * 0.1, jnp.bfloat16)

        def trunk(blocks, x):
            for blk in blocks:
                x = call_block(blk, x, x.shape[1])
            return x

        jf = jax.jit(trunk)
        t = timeit(lambda: jf(blocks, x), lambda o: o[:1, :1, :1], iters=10)
        print(f"Lp={Lp}: {t*1e3:7.2f} ms ({t/12*1e3:5.2f} ms/blk, "
              f"{fl/t/1e12:6.1f} TFLOP/s eff)", flush=True)


if __name__ == "__main__":
    main()
