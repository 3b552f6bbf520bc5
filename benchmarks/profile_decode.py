"""Decode-phase microbenchmark: splits vision/prefill/scan cost and ablates
cache layouts + weight dtypes to guide decode-step optimization.

Run: python benchmarks/profile_decode.py [B]
Timing over the axon tunnel: dispatch K iterations back-to-back, fetch only
the last output (device stream is FIFO; host fetch is the fence).
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
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import decode as D

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = ModelConfig(dtype="bfloat16")
    OD = cfg.max_seq_len - cfg.max_seq_a_len
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                         jnp.float32)
    od_ids = jnp.asarray(rng.randint(999, 9000, (B, OD)), jnp.int32)
    seq_len = jnp.full((B,), cfg.max_seq_len, jnp.int32)

    ctx_fn = jax.jit(lambda p, i, o, s: D.build_decode_context(
        p, i, o, None, s, cfg, opts))
    full_fn = jax.jit(lambda p, i, o, s: D.generate_greedy(
        p, i, o, None, s, cfg, opts)["ids"])

    t_ctx = timeit(lambda: ctx_fn(params, images, od_ids, seq_len),
                   lambda o: o["tag_logits"])
    t_full = timeit(lambda: full_fn(params, images, od_ids, seq_len),
                    lambda o: o)
    ctx = ctx_fn(params, images, od_ids, seq_len)

    scan_fn = jax.jit(lambda p, c: D.generate_greedy(
        p, images, od_ids, None, seq_len, cfg, opts, ctx=c)["ids"])
    t_scan = timeit(lambda: scan_fn(params, ctx), lambda o: o)

    # fused Pallas decode-step engine (flat cache layout)
    ctx_flat_fn = jax.jit(lambda p, i, o, s: D.build_decode_context(
        p, i, o, None, s, cfg, opts, layout="flat"))
    ctx_flat = ctx_flat_fn(params, images, od_ids, seq_len)
    scan_fused = jax.jit(lambda p, c: D.generate_greedy(
        p, images, od_ids, None, seq_len, cfg, opts, ctx=c)["ids"])
    try:
        t_fused = timeit(lambda: scan_fused(params, ctx_flat), lambda o: o)
    except Exception as e:
        t_fused = None
        print(f"  fused scan failed: {type(e).__name__}: {e}")

    steps = cfg.max_gen_length - 1
    print(f"B={B}")
    print(f"  vision+tags+prefill (ctx): {t_ctx*1e3:8.2f} ms")
    print(f"  full generate:             {t_full*1e3:8.2f} ms "
          f"({B/t_full:.1f} caps/s)")
    print(f"  scan only (ctx given):     {t_scan*1e3:8.2f} ms "
          f"({t_scan/steps*1e3:.3f} ms/step)")
    if t_fused is not None:
        print(f"  fused-step scan:           {t_fused*1e3:8.2f} ms "
              f"({t_fused/steps*1e3:.3f} ms/step)")

    # analytic per-step HBM floor (v5e ~819 GB/s); ctx caches are
    # (B, nH, S, hd) head layout
    S = ctx["ctx_k"][0].shape[2]
    H = cfg.hidden_size
    nL = cfg.decoder_layers
    kv_bytes = 2 * nL * B * S * H * 2
    w_bytes = (nL * (4 * H * H + 2 * H * cfg.intermediate_size)
               + H * cfg.vocab_size) * 2
    floor = (kv_bytes + w_bytes) / 819e9
    print(f"  per-step HBM floor: kv={kv_bytes/1e6:.0f}MB w={w_bytes/1e6:.0f}"
          f"MB -> {floor*1e3:.3f} ms/step")


def components():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.layers import vit_block, vision_embed

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = ModelConfig(dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                         jnp.float32)

    # 1. pure matmul roofline check
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(lambda: mm(a, b), lambda o: o[:1, :1], iters=50)
    print(f"  4k matmul: {t*1e3:.3f} ms -> {2*4096**3/t/1e12:.1f} TFLOP/s")

    # 2. encode_images (patch embed + 12+4 blocks + tag select)
    enc = jax.jit(lambda p, i: M.encode_images(p, i, cfg))
    t = timeit(lambda: enc(params, images), lambda o: o["tag_logits"][:1, :1])
    print(f"  encode_images: {t*1e3:.2f} ms")

    # 3. vision_embed alone
    ve = jax.jit(lambda p, i: vision_embed(
        p["image_encoder"], i.astype(jnp.bfloat16), cfg.patch_size))
    t = timeit(lambda: ve(params, images), lambda o: o[:1, :1, :1])
    print(f"  vision_embed (patchify): {t*1e3:.2f} ms")

    # 4. 12 vit blocks alone on (B,577,768)
    x = jnp.asarray(rng.randn(B, 577, 768), jnp.bfloat16)
    blocks = params["encoder"]["blocks"]

    def run_blocks(blocks, x):
        for blk in blocks:
            x = vit_block(blk, x, cfg.num_attention_heads,
                          cfg.vit_layer_norm_eps)
        return x
    rb = jax.jit(run_blocks)
    t = timeit(lambda: rb(blocks, x), lambda o: o[:1, :1, :1])
    fl = 12 * (4 * 577 * 768**2 + 2 * 577**2 * 768 + 2 * 577 * 768 * 3072) * 2 * B
    print(f"  12 vit blocks: {t*1e3:.2f} ms -> {fl/t/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "comp":
        components()
    else:
        main()
