"""Microbenchmark: ViT trunk block attention variants on real TPU.

Compares, per block at the ViTCAP trunk shape (B=32, L=577, H=768, 12 heads,
bf16):
  1. XLA attention        (VITCAP_PALLAS=0 path)
  2. one-pass Pallas attn (current inference default, ops/flash_attention)
  3. fused half-block     (ops/fused_block: LN+QKV+attn+proj+residual in
                           one kernel) + XLA MLP

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_fused_block.py [B] [L]
"""

import os
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
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models.layers import layer_norm, vit_block, vit_mlp
    from vitcap_tpu.ops.fused_block import vit_attention_residual

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 577
    cfg = ModelConfig(dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    blocks = params["encoder"]["blocks"]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, L, cfg.hidden_size), jnp.bfloat16)
    DEPTH = 12
    fl = DEPTH * (4 * L * 768**2 + 2 * L * L * 768
                  + 2 * L * 768 * 3072) * 2 * B

    def run_xla(blocks, x):
        for blk in blocks:
            x = vit_block(blk, x, cfg.num_attention_heads,
                          cfg.vit_layer_norm_eps)
        return x

    def run_fused(blocks, x):
        for blk in blocks:
            x = vit_attention_residual(blk, x, cfg.num_attention_heads,
                                       cfg.vit_layer_norm_eps)
            x = x + vit_mlp(blk["mlp"], layer_norm(blk["norm2"], x,
                                                   cfg.vit_layer_norm_eps))
        return x

    from vitcap_tpu.ops.fused_block import fused_vit_block

    def run_fullblk(blocks, x):
        for blk in blocks:
            x = fused_vit_block(blk, x, cfg.num_attention_heads,
                                cfg.vit_layer_norm_eps)
        return x

    for name, env, fn in (("xla attn ", "0", run_xla),
                          ("pallas 1p", "1", run_xla),
                          ("fusedblk ", "0", run_fused),
                          ("fullblk  ", "0", run_fullblk)):
        os.environ["VITCAP_PALLAS"] = env
        # fresh closure: jax's jit trace cache is keyed on the function
        # object, which would otherwise skip re-reading the env flag
        jit = jax.jit(lambda blocks, x, _fn=fn: _fn(blocks, x))
        t = timeit(lambda: jit(blocks, x), lambda o: o[:1, :1, :1])
        print(f"  {name}: {t*1e3:7.2f} ms ({t/DEPTH*1e3:5.2f} ms/blk, "
              f"{fl/t/1e12:5.1f} TFLOP/s)")
        out = jit(blocks, x)
        if name.startswith("xla"):
            ref = np.asarray(out, np.float32)
        else:
            got = np.asarray(out, np.float32)
            err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            print(f"            max rel err vs xla: {err:.2e}")


if __name__ == "__main__":
    main()
