"""Headline benchmark: COCO-style greedy captioning throughput, one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference (jacobswan1/ViTCAP) publishes no throughput numbers, so the
baseline is an analytic estimate of its V100 decode rate: the reference
generation loop re-runs the ENTIRE vision trunk + fusion decoder at every
token step (SURVEY.md §3.2; modeling_utils.py:768-886 with no usable KV
cache), i.e. ~max_gen_length forward passes per caption.  We count those
FLOPs exactly for ViT-B/16-384 + 4-layer decoder and assume the V100
sustains 40 TFLOP/s in fp16 (~32% of 125 TFLOP/s peak, generous for this
workload).  vs_baseline = ours / that estimate.
"""

import json
import time

import numpy as np


def _flops_reference_per_caption(cfg, od_len=50, steps=20):
    """Decode FLOPs of the reference loop (re-encode everything per step)."""
    H = cfg.hidden_size
    V = cfg.num_visual_tokens          # 577
    I = cfg.intermediate_size
    vocab = cfg.vocab_size

    def block(tokens):                  # one transformer block fwd
        attn = 4 * tokens * H * H + 2 * tokens * tokens * H
        mlp = 2 * tokens * H * I
        return 2 * (attn + mlp)         # MAC->FLOP

    total = 0.0
    for t in range(1, steps):
        text = (t + 1) + od_len
        L = text + 1 + V
        total += (cfg.num_hidden_layers + cfg.split_blocks) * block(V)
        total += cfg.decoder_layers * block(L)
        total += 2 * H * vocab * text   # LM head over text (reference does)
        total += 2 * H * vocab          # tag head
    return total


def _train_fwd_flops(cfg):
    """One training forward (per image): trunk over 577 visual tokens,
    decoder over text+visual, LM + tag heads."""
    H = cfg.hidden_size
    V = cfg.num_visual_tokens
    I = cfg.intermediate_size

    def block(tokens):
        attn = 4 * tokens * H * H + 2 * tokens * tokens * H
        mlp = 2 * tokens * H * I
        return 2 * (attn + mlp)

    L = cfg.max_seq_len + 1 + V
    total = (cfg.num_hidden_layers + cfg.split_blocks) * block(V)
    total += cfg.decoder_layers * block(L)
    total += 2 * H * cfg.vocab_size * cfg.max_seq_len
    total += 2 * H * cfg.tag_vocab_size
    return total


def main():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import decode as D

    cfg = ModelConfig(dtype="bfloat16")
    B = 64      # throughput knee: 450 caps/s @32, 471 @64, 471 @128 (v5e)
    OD = cfg.max_seq_len - cfg.max_seq_a_len
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    # host pre-patchified layout (the production input-pipeline output;
    # models/layers.py patchify_host) — device-side space-to-depth at C=3
    # is lane-starved on TPU
    from vitcap_tpu.models.layers import patchify_host
    raw = rng.randn(B, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    images = jnp.asarray(np.stack([patchify_host(r, cfg.patch_size)
                                   for r in raw]))
    od_ids = jnp.asarray(rng.randint(999, 9000, (B, OD)), jnp.int32)
    seq_len = jnp.full((B,), cfg.max_seq_len, jnp.int32)

    @jax.jit
    def run(params, images, od_ids, seq_len):
        out = D.generate_greedy(params, images, od_ids, None, seq_len, cfg,
                                opts)
        return out["ids"], out["logprobs"]

    ids, lp = run(params, images, od_ids, seq_len)   # compile
    np.array(ids)   # force full execution (block_until_ready is unreliable
                    # over the axon tunnel; a host fetch is authoritative)

    # amortize tunnel round-trip latency: dispatch K sequential runs (device
    # stream is FIFO), fetch only the last result
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        ids, lp = run(params, images, od_ids, seq_len)
    np.array(ids)
    dt = (time.perf_counter() - t0) / iters
    caps_per_sec = B / dt

    ref_flops = _flops_reference_per_caption(cfg)
    v100_rate = 40e12 / ref_flops        # captions/sec on V100 (estimate)

    print(json.dumps({
        "metric": f"greedy captions/sec/chip (ViT-B/16-384, B={B}, 20 steps)",
        "value": round(caps_per_sec, 2),
        "unit": "captions/s",
        "vs_baseline": round(caps_per_sec / v100_rate, 2),
    }), flush=True)

    # --- secondary lines (greedy stays first for the driver contract) ---
    bopts = D.DecodeOptions(max_length=cfg.max_gen_length, num_beams=3,
                            od_labels_start_posid=cfg.max_seq_a_len)

    @jax.jit
    def run_beam(params, images, od_ids, seq_len):
        out = D.generate_beam(params, images, od_ids, None, seq_len, cfg,
                              bopts)
        return out["ids"]

    np.array(run_beam(params, images, od_ids, seq_len))     # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        bids = run_beam(params, images, od_ids, seq_len)
    np.array(bids)
    beam_rate = B / ((time.perf_counter() - t0) / iters)
    print(json.dumps({
        "metric": f"beam-3 captions/sec/chip (B={B}, 20 steps)",
        "value": round(beam_rate, 2),
        "unit": "captions/s",
        "vs_baseline": round(beam_rate / (v100_rate / 3.0), 2),
    }), flush=True)

    # training step, B=64 bf16, remat 'auto' (= OFF with the Pallas
    # one-pass attention backward: no stored probs, full activations fit)
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)
    tcfg = ModelConfig(dtype="bfloat16", remat="auto",
                       tag_loss_weight=1.0)
    T = tcfg.max_seq_len
    batch = {
        "image": images,
        "input_ids": jnp.asarray(rng.randint(999, 9000, (B, T)), jnp.int32),
        "token_type_ids": jnp.concatenate(
            [jnp.zeros((B, tcfg.max_seq_a_len), jnp.int32),
             jnp.ones((B, T - tcfg.max_seq_a_len), jnp.int32)], 1),
        "seq_a_len": jnp.full((B,), tcfg.max_seq_a_len, jnp.int32),
        "seq_len": jnp.full((B,), T, jnp.int32),
        "masked_pos": jnp.zeros((B, T), jnp.int32).at[:, 1:4].set(1),
        "masked_ids": jnp.asarray(
            rng.randint(999, 9000, (B, tcfg.max_masked_tokens)), jnp.int32),
        "label": jnp.asarray((rng.rand(B, tcfg.tag_vocab_size) < 0.002),
                             jnp.float32),
    }
    tstate = init_train_state(M.init_params(jax.random.PRNGKey(0), tcfg),
                              jax.random.PRNGKey(1))
    step_fn = make_jitted_train_step(tcfg, TrainHyper(base_lr=1e-4,
                                                      max_iter=1000))
    tstate, tm = step_fn(tstate, batch, False)              # compile
    float(tm["loss"])
    t0 = time.perf_counter()
    for _ in range(8):
        tstate, tm = step_fn(tstate, batch, False)
    float(tm["loss"])
    train_rate = B / ((time.perf_counter() - t0) / 8)
    # reference trains ViTCAP on V100s; same 40 TFLOP/s analytic budget
    # over fwd+bwd (~3x fwd) of the full model at seq 70 + 577 visual
    train_flops = 3 * _train_fwd_flops(tcfg)
    print(json.dumps({
        "metric": f"train img/s/chip (B={B} bf16)",
        "value": round(train_rate, 2),
        "unit": "img/s",
        "vs_baseline": round(train_rate / (40e12 / train_flops), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
