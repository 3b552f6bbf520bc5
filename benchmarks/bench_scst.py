"""SCST step throughput on the real chip: greedy baseline + K samples
decode, host CiderD reward, policy-gradient step (the reference's headline
fine-tuning mode, …expanding.py:404-478).

Usage: python benchmarks/bench_scst.py [--batch 64] [--num-return 2]
       [--steps 4] [--token-ratio 1.0] [--split 0]
Prints one JSON line with img/s plus a decode/reward/grad phase split
(--split 1; phase timing forces host syncs, so the headline img/s is
measured separately with the phases free-running).
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-return", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--token-ratio", type=float, default=1.0)
    ap.add_argument("--split", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import decode as D
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.solver.scst import (ScstConfig, ScstReward,
                                        make_scst_fns, scst_train_step)
    from vitcap_tpu.solver.train_step import TrainHyper, init_train_state

    cfg = ModelConfig(dtype="bfloat16")
    B = args.batch
    OD = cfg.max_seq_len - cfg.max_seq_a_len
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    scst = ScstConfig(num_return=args.num_return,
                      visual_token_ratio=args.token_ratio)
    hyper = TrainHyper(base_lr=1e-6, max_iter=1000)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randn(B, cfg.img_size, cfg.img_size, 3), jnp.float32),
        "od_ids": jnp.asarray(rng.randint(999, 9000, (B, OD)), jnp.int32),
        "seq_len": jnp.full((B,), cfg.max_seq_len, jnp.int32),
    }
    gt_captions = [["a dog runs across the grass",
                    "a brown dog running in a field"]] * B
    tokenizer = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    reward = ScstReward(baseline_type=scst.baseline_type)

    params = M.init_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, jax.random.PRNGKey(1))
    decode_fn, grad_step_fn = make_scst_fns(cfg, opts, scst, hyper)

    key = jax.random.PRNGKey(0)

    def one_step(state, key):
        key, sub = jax.random.split(key)
        state, metrics = scst_train_step(decode_fn, grad_step_fn, reward,
                                         tokenizer, state, batch,
                                         gt_captions, sub)
        return state, key, metrics

    state, key, metrics = one_step(state, key)      # compile both phases
    float(metrics["scst_loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, key, metrics = one_step(state, key)
    float(metrics["scst_loss"])                     # fetch = sync
    dt = (time.perf_counter() - t0) / args.steps

    out = {
        "metric": f"scst img/s/chip (B={B} K={args.num_return} bf16)",
        "value": round(B / dt, 2),
        "unit": "img/s",
        "step_ms": round(dt * 1e3, 2),
        "cider": round(metrics["cider_score"], 4),
    }

    if args.split:
        # phase split (adds host syncs the free-running loop overlaps)
        key, sub = jax.random.split(key)
        t = time.perf_counter()
        g, s, rt, vidx = decode_fn(state.params, batch["image"],
                                   batch["od_ids"], None,
                                   batch["seq_len"], sub)
        g_np, s_np = np.asarray(g), np.asarray(s)
        out["decode_ms"] = round((time.perf_counter() - t) * 1e3, 2)
        t = time.perf_counter()
        greedy = [tokenizer.decode(list(map(int, r)),
                                   skip_special_tokens=True) for r in g_np]
        samples = [tokenizer.decode(list(map(int, r)),
                                    skip_special_tokens=True) for r in s_np]
        adv = jnp.asarray(reward(gt_captions, greedy, samples))
        out["reward_ms"] = round((time.perf_counter() - t) * 1e3, 2)
        t = time.perf_counter()
        state, metrics = grad_step_fn(state, batch, s, rt, adv, vidx)
        float(metrics["scst_loss"])
        out["grad_ms"] = round((time.perf_counter() - t) * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
