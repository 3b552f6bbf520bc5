"""A/B the int8 decode context cache (cfg.kv_cache_quant) on the real chip.

Measures, at a given batch size, the greedy scan ms/step and end-to-end
caps/s for kv_cache_quant in {none, int8}, plus beam-3 caps/s, and checks
the generated ids agree between the two (greedy near-ties can flip; report
the mismatch count rather than asserting).

Run: python benchmarks/ab_int8_kv.py [B]
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
    # generation length: argv[2] (default the flagship 20).  VERDICT r4
    # item #6: int8 KV's claimed winning regime is LONGER generations,
    # where scan savings amortize the prefill-side quantize cost.
    ML = int(sys.argv[2]) if len(sys.argv) > 2 else None
    base = ModelConfig(dtype="bfloat16")
    if ML:
        base = base.replace(max_gen_length=ML,
                            max_seq_a_len=max(base.max_seq_a_len, ML),
                            max_seq_len=base.max_seq_len
                            + max(0, ML - base.max_seq_a_len))
    OD = base.max_seq_len - base.max_seq_a_len
    opts = D.DecodeOptions(max_length=base.max_gen_length,
                           od_labels_start_posid=base.max_seq_a_len)
    params = M.init_params(jax.random.PRNGKey(0), base)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, base.img_size, base.img_size, 3),
                         jnp.float32)
    od_ids = jnp.asarray(rng.randint(999, 9000, (B, OD)), jnp.int32)
    seq_len = jnp.full((B,), base.max_seq_len, jnp.int32)
    steps = base.max_gen_length - 1

    ids = {}
    for mode in ("none", "int8"):
        cfg = base.replace(kv_cache_quant=mode)
        ctx_fn = jax.jit(lambda p, i, o, s: D.build_decode_context(
            p, i, o, None, s, cfg, opts))
        full_fn = jax.jit(lambda p, i, o, s: D.generate_greedy(
            p, i, o, None, s, cfg, opts)["ids"])
        ctx = ctx_fn(params, images, od_ids, seq_len)
        scan_fn = jax.jit(lambda p, c: D.generate_greedy(
            p, images, od_ids, None, seq_len, cfg, opts, ctx=c)["ids"])
        beam_opts = D.DecodeOptions(
            max_length=base.max_gen_length,
            od_labels_start_posid=base.max_seq_a_len, num_beams=3)
        beam_fn = jax.jit(lambda p, i, o, s: D.generate_beam(
            p, i, o, None, s, cfg, beam_opts)["ids"])

        t_ctx = timeit(lambda: ctx_fn(params, images, od_ids, seq_len),
                       lambda o: o["tag_logits"])
        t_scan = timeit(lambda: scan_fn(params, ctx), lambda o: o)
        t_full = timeit(lambda: full_fn(params, images, od_ids, seq_len),
                        lambda o: o)
        t_beam = timeit(lambda: beam_fn(params, images, od_ids, seq_len),
                        lambda o: o, iters=10)
        ids[mode] = np.asarray(full_fn(params, images, od_ids, seq_len))
        print(f"{mode:>5}: ctx {t_ctx*1e3:7.2f} ms | scan {t_scan*1e3:6.2f} ms"
              f" ({t_scan/steps*1e3:.3f} ms/step) | greedy {t_full*1e3:7.2f}"
              f" ms ({B/t_full:6.1f} caps/s) | beam3 {B/t_beam:6.1f} caps/s",
              flush=True)

    same = (ids["none"].reshape(B, -1)
            == ids["int8"].reshape(B, -1)).all(axis=1)
    print(f"greedy ids identical: {int(same.sum())}/{B} rows")


if __name__ == "__main__":
    main()
