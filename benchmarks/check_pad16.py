"""On-chip check of the pad_len=16-granularity fused kernels: greedy ids
fused-vs-XLA must match (same weights), and time full ctx + greedy.

Run: python benchmarks/check_pad16.py [B]
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
    from vitcap_tpu import ops

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

    full_fn = jax.jit(lambda p, i, o, s: D.generate_greedy(
        p, i, o, None, s, cfg, opts)["ids"])
    t_full = timeit(lambda: full_fn(params, images, od_ids, seq_len),
                    lambda o: o)
    ids_fused = np.asarray(full_fn(params, images, od_ids, seq_len))
    print(f"fused pad16: greedy {t_full*1e3:7.2f} ms ({B/t_full:6.1f} "
          f"caps/s)", flush=True)

    os.environ["VITCAP_PALLAS"] = "0"
    import importlib
    importlib.reload(ops) if hasattr(ops, "__file__") else None
    # attention_backend reads the env at trace time; retrace with a fresh jit
    full_xla = jax.jit(lambda p, i, o, s: D.generate_greedy(
        p, i, o, None, s, cfg, opts)["ids"])
    ids_xla = np.asarray(full_xla(params, images, od_ids, seq_len))
    same = (ids_fused == ids_xla).mean()
    print(f"ids fused==xla: {float(same)*100:.2f}% of positions "
          f"({int((ids_fused == ids_xla).all(axis=-1).sum())}/{B} rows exact)",
          flush=True)


if __name__ == "__main__":
    main()
