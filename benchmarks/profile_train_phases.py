"""Phase-split train-step profile on the real chip.

Times, at the flagship geometry (ViT-B/16-384, B=64, bf16):
  encode_fwd : encode_images only (vision trunk + tag head)
  loss_fwd   : full forward_train loss
  grad       : value_and_grad(forward_train)
  step       : full train step, probes off
  step+probes: full train step, probes on

Deltas attribute the step: bwd = grad - loss_fwd, optimizer+clip =
step - grad, probes = step+probes - step.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/profile_train_phases.py [batch] [remat(0|1)] [phase]

phase in {enc, loss, grad, step, probes, all} — run ONE phase per process
when HBM is tight (each live jitted executable pins its buffers; enc +
loss + grad together exhaust the 16 GB chip at B=64 remat-off).
"""

import sys
import time

import numpy as np


def timeit(fn, fetch, iters=8, warmup=2):
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
    from vitcap_tpu.solver.train_step import (TrainHyper, init_train_state,
                                              make_jitted_train_step,
                                              make_train_step)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    remat = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    cfg = ModelConfig(dtype="bfloat16", remat=remat)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, jax.random.PRNGKey(1))
    hyper = TrainHyper(max_iter=1000)

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
    img_bf = batch["image"].astype(jnp.bfloat16)

    phase = sys.argv[3] if len(sys.argv) > 3 else "all"
    print(f"B={B} remat={remat} phase={phase}", flush=True)
    key = jax.random.PRNGKey(2)

    if phase in ("enc", "all"):
        enc = jax.jit(lambda p, im: M.encode_images(p, im, cfg)["visual"])
        t = timeit(lambda: enc(params, img_bf), lambda o: o[:1, :1, :1])
        print(f"  encode_fwd : {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
              flush=True)

    if phase in ("loss", "all"):
        lossf = jax.jit(lambda p, b, k: M.forward_train(p, b, cfg,
                                                        rng=k)[0])
        t = timeit(lambda: lossf(params, batch, key), lambda o: o)
        print(f"  loss_fwd   : {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
              flush=True)

    if phase in ("grad", "all"):
        gradf = jax.jit(jax.value_and_grad(
            lambda p, b, k: M.forward_train(p, b, cfg, rng=k)[0]))
        t = timeit(lambda: gradf(params, batch, key), lambda o: o[0])
        print(f"  grad       : {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
              flush=True)

    if phase in ("step", "probes", "all"):
        step = make_jitted_train_step(cfg, hyper)
        st = state
        def run_step(with_probes):
            nonlocal st
            st, m = step(st, batch, with_probes)
            return m
        if phase in ("step", "all"):
            t = timeit(lambda: run_step(False), lambda m: m["loss"])
            print(f"  step       : {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
                  flush=True)
        if phase in ("probes", "all"):
            t = timeit(lambda: run_step(True), lambda m: m["loss"])
            print(f"  step+probes: {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
                  flush=True)


if __name__ == "__main__":
    main()
