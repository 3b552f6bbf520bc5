"""Ablate the decode-scan step cost at B=64: which ops own the gap between
the measured ~1.37 ms/step and the ~0.73 ms HBM floor?

Each variant runs a 19-step lax.scan whose body contains only a subset of
the real step's work, reading the same context caches / weights so HBM
traffic is realistic.  Run: PYTHONPATH=... python benchmarks/ablate_scan.py
"""

import sys
import time

import numpy as np


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
    print("start", flush=True)
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

    ctx_fn = jax.jit(lambda p, i, o, s: D.build_decode_context(
        p, i, o, None, s, cfg, opts))
    ctx = jax.device_get(ctx_fn(params, images, od_ids, seq_len))
    ctx = jax.device_put(ctx)
    pcast = jax.jit(lambda p: D._decode_params_cast(p, cfg))(params)

    nH = cfg.num_attention_heads
    hd = cfg.hidden_size // nH
    H = cfg.hidden_size
    A = opts.max_length
    steps = A - 1
    Bb = B
    dt = cfg.compute_dtype

    ctx_k = ctx["ctx_k"]  # list of (B, nH, S, hd)
    ctx_v = ctx["ctx_v"]
    S = ctx_k[0].shape[2]

    def run_scan(body, carry0, env=()):
        # env is passed as a jit ARG: closed-over device arrays would be
        # serialized into the HLO as constants (413s the compile tunnel)
        def f(env):
            def step(c, t):
                return body(c, t, env), None
            return step
        def g(carry0, env):
            c, _ = jax.lax.scan(f(env), carry0, jnp.arange(1, A))
            return c
        jg = jax.jit(g)
        return timeit(lambda: jg(carry0, env),
                      lambda o: jax.tree_util.tree_leaves(o)[0]) / steps

    q0 = jnp.asarray(rng.randn(Bb, nH, 2, hd), dt)

    # 1. ctx einsums only (score + out per layer), softmax-free
    def body_einsums(c, t, env):
        acc = c
        ctx_k, ctx_v = env
        for li in range(4):
            s = jnp.einsum("bhqd,bhkd->bhqk", q0, ctx_k[li],
                           preferred_element_type=jnp.float32)
            p = (s * 1e-4).astype(dt)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, ctx_v[li],
                           preferred_element_type=dt)
            acc = acc + o
        return acc
    t1 = run_scan(body_einsums, jnp.zeros((Bb, nH, 2, hd), dt), (ctx_k, ctx_v))
    print(f"ctx einsums only:        {t1*1e3:7.3f} ms/step "
          f"(kv floor ~{2*4*B*S*H*2/819e9*1e3:.3f})")

    # 2. + full softmax over concat'd scores (cap+self+ctx) like the real step
    cap_k = jnp.zeros((Bb, nH, A, hd), dt)
    cap_v = jnp.zeros((Bb, nH, A, hd), dt)

    def body_attn(c, t, env):
        acc, ck, cv = c
        pc, ctx_k, ctx_v, valid = env
        for li in range(4):
            o, ck, cv = D._decode_attention(
                pc["decoder"]["layer"][li]["attention"]["self"],
                acc, ck, cv, ctx_k[li], ctx_v[li], valid, t, nH)
        return (o, ck, cv)
    t2 = run_scan(body_attn, (jnp.zeros((Bb, 2, H), dt), cap_k, cap_v),
                  (pcast, ctx_k, ctx_v, ctx["ctx_valid"]))
    print(f"full attn x4 (no MLP):   {t2*1e3:7.3f} ms/step")

    # 3. small matmuls only: qkv + out-proj + MLP per layer, no attention
    def body_mm(c, t, env):
        x = c
        for layer in env["decoder"]["layer"]:
            from vitcap_tpu.models.layers import dense, gelu, layer_norm
            qkv = dense(layer["attention"]["self"]["qkv_packed"], x)
            x = qkv[:, :, :H]
            x = dense(layer["attention"]["output"]["dense"], x)
            x = layer_norm(layer["attention"]["output"]["LayerNorm"], x,
                           cfg.bert_layer_norm_eps)
            i = gelu(dense(layer["intermediate"]["dense"], x))
            x = dense(layer["output"]["dense"], i)
        return x
    t3 = run_scan(body_mm, jnp.zeros((Bb, 2, H), dt), pcast)
    print(f"small matmuls only:      {t3*1e3:7.3f} ms/step "
          f"(w floor ~{4*(3*H*H+H*H+2*H*3072)*2/819e9*1e3:.3f})")

    # 4. LM head + argmax + log_softmax only
    x1 = jnp.asarray(rng.randn(Bb, H), dt)

    def body_lm(c, t, env):
        logits = M.caption_logits(env, c, cfg).astype(jnp.float32)
        nxt = jnp.argmax(logits, -1)
        lp = jax.nn.log_softmax(logits, -1)
        sc = jnp.take_along_axis(lp, nxt[:, None], 1)[:, 0]
        return c + sc[:, None].astype(dt) * 0
    t4 = run_scan(body_lm, x1, pcast)
    print(f"LM head+argmax+lsm only: {t4*1e3:7.3f} ms/step "
          f"(w floor ~{H*cfg.vocab_size*2/819e9*1e3:.3f})")

    # 5. token bookkeeping only (dynamic slices on tokens)
    tokens = jnp.full((Bb, A), 0, jnp.int32)

    def body_tok(c, t, env):
        tokens, unfin = c
        prev = jnp.take_along_axis(tokens, (t - 1)[None, None].repeat(Bb, 0),
                                   axis=1)[:, 0]
        add = jnp.where(unfin > 0, prev, 0).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, add[:, None], t, axis=1)
        unfin = unfin * (add != cfg.sep_token_id)
        return tokens, unfin
    t5 = run_scan(body_tok, (tokens, jnp.ones((Bb,), jnp.float32)))
    print(f"token bookkeeping only:  {t5*1e3:7.3f} ms/step")

    # 6. real full step for comparison
    def body_full(c, t, env):
        pc, cx = env
        init_caches, engine_step, _ = D._decode_engine(pc, cx, cfg, opts, Bb)
        caches, prev = c
        logits, caches = engine_step(caches, prev, t)
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        return caches, nxt
    init_caches, _, _ = D._decode_engine(pcast, ctx, cfg, opts, Bb)
    t6 = run_scan(body_full, (init_caches(),
                              jnp.full((Bb,), cfg.cls_token_id, jnp.int32)),
                  (pcast, ctx))
    print(f"real full step:          {t6*1e3:7.3f} ms/step")
    print(f"sum of parts (1+3+4+5):  {(t1+t3+t4+t5)*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
