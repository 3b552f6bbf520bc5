"""Training-step throughput benchmark on the real chip (B=64 bf16).

Usage: python benchmarks/bench_train.py [--remat 0|1|auto] [--batch 64]
       [--profile DIR] [--steps 8]
Prints one JSON line {"metric", "value", "unit"}.
"""

import argparse
import json
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="auto",
                    help="1 | 0 | auto (auto = off when the Pallas\n"
                         "attention backward is active)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--profile", default=None)
    ap.add_argument("--probes", type=int, default=0,
                    help="include train-time metric probes (the pipeline "
                         "runs them only at log steps)")
    ap.add_argument("--scores-dtype", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models.layers import patchify_host
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)
    from vitcap_tpu.models import vitcap as M

    remat = args.remat if args.remat == "auto" else bool(int(args.remat))
    cfg = ModelConfig(dtype="bfloat16", remat=remat,
                      scores_dtype=args.scores_dtype, tag_loss_weight=1.0)
    B = args.batch
    T = cfg.max_seq_len
    rng = np.random.RandomState(0)
    raw = rng.randn(B, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    batch = {
        "image": jnp.asarray(np.stack(
            [patchify_host(r, cfg.patch_size) for r in raw])),
        "input_ids": jnp.asarray(
            rng.randint(999, 9000, (B, T)), jnp.int32),
        "token_type_ids": jnp.concatenate(
            [jnp.zeros((B, cfg.max_seq_a_len), jnp.int32),
             jnp.ones((B, T - cfg.max_seq_a_len), jnp.int32)], 1),
        "seq_a_len": jnp.full((B,), cfg.max_seq_a_len, jnp.int32),
        "seq_len": jnp.full((B,), T, jnp.int32),
        "masked_pos": jnp.zeros((B, T), jnp.int32).at[:, 1:4].set(1),
        "masked_ids": jnp.asarray(
            rng.randint(999, 9000, (B, cfg.max_masked_tokens)), jnp.int32),
        "label": jnp.asarray(
            (rng.rand(B, cfg.tag_vocab_size) < 0.002), jnp.float32),
    }
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, jax.random.PRNGKey(1))
    step_fn = make_jitted_train_step(cfg, TrainHyper(base_lr=1e-4,
                                                     max_iter=1000))

    probes = bool(args.probes)
    state, metrics = step_fn(state, batch, probes)   # compile
    float(metrics["loss"])                           # host fetch = sync

    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, probes)
    loss = float(metrics["loss"])                 # fetch forces completion
    dt = (time.perf_counter() - t0) / args.steps
    if args.profile:
        jax.profiler.stop_trace()

    print(json.dumps({
        "metric": f"train img/s/chip (B={B} bf16 remat={args.remat})",
        "value": round(B / dt, 2),
        "unit": "img/s",
        "loss": round(loss, 4),
        "step_ms": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
