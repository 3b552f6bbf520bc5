"""Break down the decode-context build (vision trunk + tags + BERT
prefill) at flagship geometry — the 108 ms that dominates the 129 ms
greedy batch at B=64.

Run: python benchmarks/profile_ctx.py [B]
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
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

    # full ctx
    ctx_fn = jax.jit(lambda p, i, o, s: D.build_decode_context(
        p, i, o, None, s, cfg, opts))
    t_ctx = timeit(lambda: ctx_fn(params, images, od_ids, seq_len),
                   lambda o: o["tag_logits"][:1, :1])
    print(f"B={B} full ctx: {t_ctx*1e3:8.2f} ms", flush=True)

    # stage 1: encode_images (patchify + trunk + split + tag head + select)
    enc = jax.jit(lambda p, i: M.encode_images(p, i, cfg))
    t_enc = timeit(lambda: enc(params, images),
                   lambda o: o["tag_logits"][:1, :1])
    print(f"  encode_images:            {t_enc*1e3:8.2f} ms", flush=True)

    # stage 2: build_context_embeddings (encode + tag embed + od embed +
    # concat) — its delta over encode_images is the embedding/concat cost
    ce = jax.jit(lambda p, i, o, s: D.build_context_embeddings(
        p, i, o, None, s, cfg, opts))
    t_ce = timeit(lambda: ce(params, images, od_ids, seq_len),
                  lambda o: o["ctx"][:1, :1, :1])
    print(f"  build_context_embeddings: {t_ce*1e3:8.2f} ms "
          f"(embed/concat delta {1e3*(t_ce-t_enc):5.2f})", flush=True)
    print(f"  BERT prefill delta:       {1e3*(t_ctx-t_ce):8.2f} ms",
          flush=True)

    # encode_images internals
    from vitcap_tpu.models.layers import vision_embed, vit_block
    ve = jax.jit(lambda p, i: vision_embed(
        p["image_encoder"], i, cfg.patch_size))
    t_ve = timeit(lambda: ve(params, images), lambda o: o[:1, :1, :1])
    print(f"    vision_embed (f32 feed):{t_ve*1e3:8.2f} ms", flush=True)

    x = jnp.asarray(rng.randn(B, 577, 768), jnp.bfloat16)
    from vitcap_tpu.ops import inference_mode

    def run_blocks(blocks, x):
        for blk in blocks:
            x = vit_block(blk, x, cfg.num_attention_heads,
                          cfg.vit_layer_norm_eps)
        return x

    with inference_mode():
        rb = jax.jit(lambda bs, x: run_blocks(bs, x))
        t12 = timeit(lambda: rb(params["encoder"]["blocks"], x),
                     lambda o: o[:1, :1, :1])
    fl = 12 * (4 * 577 * 768**2 + 2 * 577**2 * 768
               + 2 * 577 * 768 * 3072) * 2 * B
    print(f"    12 vit blocks:          {t12*1e3:8.2f} ms "
          f"-> {fl/t12/1e12:.1f} TFLOP/s", flush=True)

    # tag head: hidden (B, 577, H) -> tag logits (B, V)
    tag = jax.jit(lambda p, h: M.tag_logits_from_hidden(p, h, cfg))
    h = jnp.asarray(rng.randn(B, 577, 768), jnp.bfloat16)
    try:
        t_tag = timeit(lambda: tag(params, h), lambda o: o[:1, :1])
        print(f"    tag head:               {t_tag*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"    tag head: skipped ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
