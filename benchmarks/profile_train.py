"""Training-step microbenchmark on the real chip.

Usage: python benchmarks/profile_train.py [batch] [remat(0|1)]
Reports step time / images-per-second for the jitted ViT-B/16-384 train
step in bf16 (the production recipe shape).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.solver.train_step import (TrainHyper, init_train_state,
                                              make_jitted_train_step)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    cfg = ModelConfig(dtype="bfloat16", remat=remat)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, jax.random.PRNGKey(1))
    hyper = TrainHyper(max_iter=1000)
    step = make_jitted_train_step(cfg, hyper)

    rng = np.random.RandomState(0)
    T = cfg.max_seq_len
    batch = dict(
        image=jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32),
        input_ids=jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)),
                              jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), cfg.max_seq_a_len, jnp.int32),
        seq_len=jnp.full((B,), T, jnp.int32),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1)
        .at[:, 3].set(1),
        masked_ids=jnp.zeros((B, cfg.max_masked_tokens), jnp.int32)
        .at[:, 0].set(7).at[:, 1].set(9),
        label=jnp.zeros((B, cfg.tag_vocab_size), jnp.float32)
        .at[:, 3].set(1.0),
    )

    state, m = step(state, batch)          # compile
    np.asarray(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B} remat={remat}: {dt*1e3:.1f} ms/step  "
          f"{B/dt:.1f} img/s  loss={float(m['loss']):.3f}")


if __name__ == "__main__":
    main()
