"""Piece-level train-step attribution on the real chip (VERDICT r5 #1).

Times each segment of the flagship train step (ViT-B/16-384, B=64, bf16)
in isolation — forward AND forward+backward — as 4-deep dependent chains
(the dcb28ce lesson: independent probe calls get CSE'd / overlapped and
read fast).  Complements profile_train_phases.py's jit-boundary split by
attributing WITHIN the phases:

  patchify  : device-side space-to-depth reshape+transpose (bf16 images)
  vembed    : full vision_embed (patchify + proj + cls + pos)
  trunk12   : 12 train-path vit_blocks on the pre-padded (B, 592, H) input
  tagsel    : tag head + select_tags (top-50 of 30522)
  bert4     : 4 train-path bert_layers at L=648 (pads 648->656 per call)
  bert4pad  : same on pre-padded 656 input with l_actual plumbed... (n/a:
              bert mha has no l_actual hoist today — measures the pad tax)
  lmhead    : masked gather + LM head + label-smoothed KL

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/profile_train_pieces.py [piece|all] [B]
"""

import sys
import time

import numpy as np

CHAIN = 4


def timeit(fn, fetch, iters=8, warmup=2, chain=CHAIN):
    for _ in range(warmup):
        out = fn()
    np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters / chain


def main():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import layers as Ly

    piece = sys.argv[1] if len(sys.argv) > 1 else "all"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cfg = ModelConfig(dtype="bfloat16", remat=False)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    H = cfg.hidden_size
    img = jnp.asarray(rs.randn(B, cfg.img_size, cfg.img_size, 3), dt)

    def run(name, fn, fetch=None, chain=CHAIN):
        t = timeit(fn, fetch or (lambda o: o), chain=chain)
        print(f"  {name:10s}: {t*1e3:7.2f} ms", flush=True)

    if piece in ("patchify", "all"):
        ph = cfg.patch_size

        @jax.jit
        def f(x):
            for _ in range(CHAIN):
                Bs, ih, iw, C = x.shape
                gh, gw = ih // ph, iw // ph
                y = x.reshape(Bs, gh, ph, gw, ph, C) \
                     .transpose(0, 1, 3, 2, 4, 5) \
                     .reshape(Bs, gh * gw, ph * ph * C)
                # fold back so the chain stays shape-stable & dependent
                x = x + y.sum() * 1e-12
            return x
        run("patchify", lambda: f(img), lambda o: o[:1, :1, :1, :1])

    if piece in ("vembed", "all"):
        @jax.jit
        def f(x):
            acc = 0.0
            for _ in range(CHAIN):
                y = Ly.vision_embed(params["image_encoder"], x,
                                    cfg.patch_size, compute_dtype=dt)
                acc = acc + y.sum()
                x = x + acc * 1e-12
            return acc
        run("vembed", lambda: f(img))

    if piece in ("trunk12", "trunk12_bwd", "all"):
        from vitcap_tpu.ops.fused_block import pad_len
        L = cfg.num_visual_tokens          # 577
        Lp = pad_len(L)
        x0 = jnp.asarray(rs.randn(B, Lp, H), dt)
        blocks = params["encoder"]["blocks"]

        # blocks must be jit ARGUMENTS: closing over them ships the whole
        # param tree as compile-payload constants and the remote compiler
        # rejects the request (HTTP 413)
        def trunk(bs, x):
            for blk in bs:
                x = Ly.vit_block(blk, x, cfg.num_attention_heads,
                                 cfg.vit_layer_norm_eps,
                                 scores_dtype=cfg.attention_scores_dtype,
                                 l_actual=L)
            return x

        if piece in ("trunk12", "all"):
            # chain=1: the 12-block chain is CSE-proof by itself
            f = jax.jit(trunk)
            run("trunk12", lambda: f(blocks, x0), lambda o: o[:1, :1, :1],
                chain=1)

        if piece in ("trunk12_bwd", "all"):
            # chain=1: a 4-deep chain of 12-block backwards would pin
            # ~20 GB of saved activations; the 12-block chain itself is
            # CSE-proof
            @jax.jit
            def g(bs, x):
                def loss(xx):
                    return (trunk(bs, xx).astype(jnp.float32) ** 2).mean()
                return jax.grad(loss)(x)
            run("trunk12+bwd", lambda: g(blocks, x0),
                lambda o: o[:1, :1, :1], chain=1)

    if piece in ("tagsel", "all"):
        tcls = jnp.asarray(rs.randn(B, 1, H), dt)

        @jax.jit
        def f(p, t):
            acc = 0.0
            for _ in range(CHAIN):
                logits = M.tag_logits_from_hidden(p, t, cfg)
                topk, probs, n = M.select_tags(logits, cfg)
                acc = acc + probs.sum() + topk.sum()
                t = t + acc * 1e-12
            return acc
        run("tagsel", lambda: f(params, tcls))

    if piece in ("bert4", "bert4_bwd", "bert4h", "bert4h_bwd", "bert4s",
                 "bert4s_bwd", "all"):
        S = cfg.max_seq_len + 1 + cfg.num_visual_tokens     # 648
        seq0 = jnp.asarray(rs.randn(B, S, H), dt)
        bias = jnp.asarray(
            np.where(rs.rand(B, 1, S, S) > 0.1, 0.0, -1e4), jnp.float32)
        layers = params["decoder"]["layer"]

        def bert(ls, x, b):
            for layer in ls:
                x = Ly.bert_layer(layer, x, b,
                                  cfg.num_attention_heads,
                                  cfg.bert_layer_norm_eps,
                                  scores_dtype=cfg.attention_scores_dtype)
            return x

        if piece in ("bert4", "all"):
            f = jax.jit(bert)
            run("bert4", lambda: f(layers, seq0, bias),
                lambda o: o[:1, :1, :1], chain=1)

        if piece in ("bert4h", "bert4h_bwd", "all"):
            # the round-5 hoist: pre-padded 656 input + bias, l_actual
            Sp = (S + 15) // 16 * 16
            seqp = jnp.pad(seq0, ((0, 0), (0, Sp - S), (0, 0)))
            biasp = jnp.pad(bias, ((0, 0), (0, 0), (0, Sp - S),
                                   (0, Sp - S)))

            def berth(ls, x, b):
                for layer in ls:
                    x = Ly.bert_layer(layer, x, b,
                                      cfg.num_attention_heads,
                                      cfg.bert_layer_norm_eps,
                                      scores_dtype=cfg
                                      .attention_scores_dtype,
                                      l_actual=S)
                return x

            if piece in ("bert4h", "all"):
                fh = jax.jit(berth)
                run("bert4hoist", lambda: fh(layers, seqp, biasp),
                    lambda o: o[:1, :1, :1], chain=1)

            if piece in ("bert4h_bwd", "all"):
                @jax.jit
                def gh(ls, x, b):
                    def loss(xx):
                        return (berth(ls, xx, b)[:, :S]
                                .astype(jnp.float32) ** 2).mean()
                    return jax.grad(loss)(x)
                run("bert4h+bwd", lambda: gh(layers, seqp, biasp),
                    lambda o: o[:1, :1, :1], chain=1)

        if piece in ("bert4s", "bert4s_bwd", "all"):
            # the round-5 split BERT train layer (analytic backward)
            from vitcap_tpu.ops.fused_block import split_bert_layer_train
            Sp2 = (S + 15) // 16 * 16
            seqp2 = jnp.pad(seq0, ((0, 0), (0, Sp2 - S), (0, 0)))
            biasp2 = jnp.pad(bias, ((0, 0), (0, 0), (0, Sp2 - S),
                                    (0, Sp2 - S)))
            seeds = jnp.asarray([3, 5], jnp.int32)
            rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1

            def berts(ls, x, b):
                for layer in ls:
                    x = split_bert_layer_train(
                        layer, x, b, cfg.num_attention_heads,
                        cfg.bert_layer_norm_eps, False, S, rate, rate,
                        seeds)
                return x

            if piece in ("bert4s", "all"):
                fs = jax.jit(berts)
                run("bert4split", lambda: fs(layers, seqp2, biasp2),
                    lambda o: o[:1, :1, :1], chain=1)

            if piece in ("bert4s_bwd", "all"):
                @jax.jit
                def gs(ls, x, b):
                    def loss(xx):
                        return (berts(ls, xx, b)[:, :S]
                                .astype(jnp.float32) ** 2).mean()
                    return jax.grad(loss)(x)
                run("bert4s+bwd", lambda: gs(layers, seqp2, biasp2),
                    lambda o: o[:1, :1, :1], chain=1)

        if piece in ("bert4_bwd", "all"):
            @jax.jit
            def g(ls, x, b):
                def loss(xx):
                    return (bert(ls, xx, b).astype(jnp.float32)
                            ** 2).mean()
                return jax.grad(loss)(x)
            run("bert4+bwd", lambda: g(layers, seq0, bias),
                lambda o: o[:1, :1, :1], chain=1)

    if piece in ("lmhead", "all"):
        T = cfg.max_seq_len
        hid = jnp.asarray(rs.randn(B, T + 1 + cfg.num_visual_tokens, H), dt)
        mpos = jnp.zeros((B, T), jnp.int32).at[:, 1].set(1).at[:, 3].set(1)
        mids = jnp.zeros((B, cfg.max_masked_tokens), jnp.int32) \
            .at[:, 0].set(7).at[:, 1].set(9)

        @jax.jit
        def f(p, h):
            acc = 0.0
            for _ in range(CHAIN):
                midx, mvalid = M._masked_positions(mpos,
                                                   cfg.max_masked_tokens)
                gathered = jnp.take_along_axis(h, midx[..., None], axis=1)
                logits = M.caption_logits(p, gathered, cfg)
                w = ((mids != 0) & mvalid).astype(jnp.float32)
                loss = M.label_smoothed_kl(
                    logits.reshape(-1, logits.shape[-1]),
                    mids.reshape(-1), w.reshape(-1), cfg.label_smoothing)
                acc = acc + loss
                h = h + acc * 1e-9
            return acc
        run("lmhead", lambda: f(params, hid))


if __name__ == "__main__":
    main()
