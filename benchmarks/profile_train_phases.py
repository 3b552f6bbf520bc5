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

    if phase == "loss_nodrop":
        # dropout cost isolation: rng=None -> deterministic forward
        lossf = jax.jit(lambda p, b: M.forward_train(p, b, cfg,
                                                     rng=None)[0])
        t = timeit(lambda: lossf(params, batch), lambda o: o)
        print(f"  loss_nodrop: {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
              flush=True)

    if phase == "fusion":
        # text embed + fusion decoder + heads/losses, vision REUSED from a
        # precomputed encode (isolates the non-vision forward)
        enc = jax.jit(lambda p, im: M.encode_images(p, im, cfg))
        enc_out = jax.tree.map(jnp.asarray, enc(params, img_bf))
        jax.block_until_ready(enc_out)

        def tail(p, b, e, k):
            import jax as _jax
            from vitcap_tpu.models.vitcap import (
                embed_text_with_tags, seq2seq_text_mask,
                decoder_bias_from_text_mask, fusion_decoder,
                _masked_positions, caption_logits, label_smoothed_kl,
                focal_tag_loss)
            r_emb, r_dec = _jax.random.split(k)
            text_emb = embed_text_with_tags(
                p, b["input_ids"], b.get("token_type_ids"), None,
                e["pred_topk"], cfg, r_emb, False)
            seq = jnp.concatenate(
                [text_emb, e["tag_cls"].astype(text_emb.dtype),
                 e["visual"].astype(text_emb.dtype)], axis=1)
            text_mask = seq2seq_text_mask(b["seq_a_len"], b["seq_len"],
                                          cfg)
            bias = decoder_bias_from_text_mask(
                text_mask, seq.shape[1] - cfg.max_seq_len)
            hidden = fusion_decoder(p, seq, bias, cfg, r_dec, False)
            midx, mvalid = _masked_positions(b["masked_pos"],
                                             cfg.max_masked_tokens)
            gathered = jnp.take_along_axis(hidden, midx[..., None],
                                           axis=1)
            class_logits = caption_logits(p, gathered, cfg)
            weight = ((b["masked_ids"] != 0) & mvalid).astype(jnp.float32)
            loss = label_smoothed_kl(
                class_logits.reshape(-1, class_logits.shape[-1]),
                b["masked_ids"].reshape(-1), weight.reshape(-1),
                cfg.label_smoothing)
            return loss + cfg.tag_loss_weight * focal_tag_loss(
                e["tag_logits"], b["label"], cfg.focal_alpha,
                cfg.focal_gamma)

        tailf = jax.jit(tail)
        t = timeit(lambda: tailf(params, batch, enc_out, key),
                   lambda o: o)
        print(f"  fusion_tail: {t*1e3:7.1f} ms  ({B/t:6.1f} img/s)",
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
