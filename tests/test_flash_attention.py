"""Pallas flash-attention correctness (interpret mode on CPU) vs XLA."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vitcap_tpu.ops.flash_attention import _xla_attention, flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape),
                       jnp.float32)


@pytest.mark.parametrize("L", [128, 200, 577])
def test_no_bias_matches_xla(L):
    B, nH, dh = 2, 4, 64
    q, k, v = (_rand((B, nH, L, dh), s) for s in (0, 1, 2))
    ref = _xla_attention(q, k, v, None)
    out = flash_attention(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nHb", [1, 4])
def test_bias_matches_xla(nHb):
    B, nH, L, dh = 2, 4, 150, 32
    q, k, v = (_rand((B, nH, L, dh), s) for s in (3, 4, 5))
    # additive seq2seq-style mask bias
    rng = np.random.RandomState(6)
    bias = jnp.asarray(
        np.where(rng.rand(B, nHb, L, L) < 0.3, -10000.0, 0.0), jnp.float32)
    ref = _xla_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    B, nH, L, dh = 1, 2, 130, 32
    q, k, v = (_rand((B, nH, L, dh), s) for s in (7, 8, 9))
    bias = jnp.zeros((B, 1, L, L))

    def loss_flash(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias, True) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(_xla_attention(q, k, v, bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_bwd_kernel_padded_bias():
    """The one-pass Pallas backward (dq/dk/dv recomputed-in-VMEM) at a
    padded sequence (L=161 -> Lp=256) with a per-image additive bias and
    nontrivial masking must match XLA's softmax gradient."""
    B, nH, L, dh = 2, 4, 161, 32
    q, k, v = (_rand((B, nH, L, dh), s) for s in (11, 12, 13))
    rng = np.random.RandomState(14)
    bias = jnp.asarray(
        np.where(rng.rand(B, 1, L, L) < 0.25, -10000.0, 0.0), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_backend_routes_mha(monkeypatch):
    """VITCAP_TRAIN_PALLAS=interpret routes gradient-carrying mha through
    the fused kernels; grads of a tiny trunk block must match the XLA
    path."""
    from vitcap_tpu.models.layers import mha
    B, L, H, nh = 2, 80, 32, 4
    rs = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rs.randn(B, L, H), jnp.float32)
               for _ in range(3))

    def loss(q, k, v):
        return jnp.sum(mha(q, k, v, nh) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("VITCAP_TRAIN_PALLAS", "interpret")
    g_pal = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_forward_same_with_pallas_interpret(monkeypatch):
    """Whole tiny-model forward identical with the Pallas attention path."""
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    cfg = tiny_config(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      num_attention_heads=2, hidden_size=64,
                      intermediate_size=256)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 2, cfg.max_seq_len
    batch = dict(
        image=jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32),
        input_ids=jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)),
                              jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), cfg.max_seq_a_len),
        seq_len=jnp.full((B,), T),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1),
        masked_ids=jnp.zeros((B, cfg.max_masked_tokens), jnp.int32)
        .at[:, 0].set(7),
        label=jnp.zeros((B, cfg.tag_vocab_size)).at[:, 3].set(1.0),
    )
    monkeypatch.setenv("VITCAP_PALLAS", "0")
    t0, aux0 = M.forward_train(params, batch, cfg)
    monkeypatch.setenv("VITCAP_PALLAS", "interpret")
    t1, aux1 = M.forward_train(params, batch, cfg)
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux0["tag_logits"]),
                               np.asarray(aux1["tag_logits"]),
                               rtol=1e-4, atol=1e-4)


class TestFusedVitAttn:
    """Fused LN1+QKV+attention+proj+residual half-block kernel
    (ops/fused_block.py) vs the plain XLA chain."""

    def _setup(self, B=2, L=70, H=32, nh=4, dtype=jnp.float32):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(B, L, H), dtype)
        lns = jnp.asarray(rs.randn(H), jnp.float32)
        lnb = jnp.asarray(rs.randn(H) * 0.1, jnp.float32)
        wqkv = jnp.asarray(rs.randn(H, 3 * H) * 0.05, jnp.float32)
        bqkv = jnp.asarray(rs.randn(3 * H) * 0.1, jnp.float32)
        wproj = jnp.asarray(rs.randn(H, H) * 0.05, jnp.float32)
        bproj = jnp.asarray(rs.randn(H) * 0.1, jnp.float32)
        return x, lns, lnb, wqkv, bqkv, wproj, bproj, nh

    def test_parity_interpret(self):
        from vitcap_tpu.ops.fused_block import (_xla_reference,
                                                fused_vit_attn)
        *args, nh = self._setup()
        ref = _xla_reference(*args, num_heads=nh, eps=1e-6)
        out = fused_vit_attn(*args, nh, 1e-6, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_parity_padded_seq(self):
        """Non-16-multiple L pads (pad_len) — padded keys must not leak
        into softmax."""
        from vitcap_tpu.ops.fused_block import (_xla_reference,
                                                fused_vit_attn)
        *args, nh = self._setup(L=130)   # pads to 144
        ref = _xla_reference(*args, num_heads=nh, eps=1e-6)
        out = fused_vit_attn(*args, nh, 1e-6, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_matches_xla(self):
        from vitcap_tpu.ops.fused_block import (_xla_reference,
                                                fused_vit_attn)
        *args, nh = self._setup()

        def loss_fused(x, w):
            a = list(args)
            a[0], a[3] = x, w
            return jnp.sum(fused_vit_attn(*a, nh, 1e-6, True) ** 2)

        def loss_ref(x, w):
            a = list(args)
            a[0], a[3] = x, w
            return jnp.sum(_xla_reference(*a, num_heads=nh, eps=1e-6) ** 2)

        gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(args[0], args[3])
        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(args[0], args[3])
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-4)

    def test_param_tree_adapter(self):
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        from vitcap_tpu.models.layers import layer_norm, vit_attention
        from vitcap_tpu.ops.fused_block import vit_attention_residual
        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        blk = params["encoder"]["blocks"][0]
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(2, 17, cfg.hidden_size), jnp.float32)
        ref = x + vit_attention(
            blk["attn"], layer_norm(blk["norm1"], x, cfg.vit_layer_norm_eps),
            cfg.num_attention_heads)
        out = vit_attention_residual(blk, x, cfg.num_attention_heads,
                                     cfg.vit_layer_norm_eps, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_full_block_parity_and_grad(self):
        """fused_vit_block (whole block incl. exact-ish gelu MLP) matches
        the XLA vit_block forward and recompute backward."""
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        from vitcap_tpu.models.layers import _vit_block_xla
        from vitcap_tpu.ops.fused_block import fused_vit_block
        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        blk = params["encoder"]["blocks"][0]
        x = jnp.asarray(np.random.RandomState(1).randn(2, 17,
                                                       cfg.hidden_size),
                        jnp.float32)
        nh, eps = cfg.num_attention_heads, cfg.vit_layer_norm_eps
        ref = _vit_block_xla(blk, x, nh, eps)
        out = fused_vit_block(blk, x, nh, eps, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        g1 = jax.grad(lambda p: jnp.sum(
            fused_vit_block(p, x, nh, eps, True) ** 2))(blk)
        g2 = jax.grad(lambda p: jnp.sum(
            _vit_block_xla(p, x, nh, eps) ** 2))(blk)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_vit_block_dispatch_interpret(self):
        """public vit_block under VITCAP_PALLAS=interpret routes to the
        fused kernel and still matches the XLA body."""
        import os
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        from vitcap_tpu.models.layers import _vit_block_xla, vit_block
        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        blk = params["encoder"]["blocks"][0]
        # L >= 64 required for dispatch
        x = jnp.asarray(np.random.RandomState(1).randn(2, 70,
                                                       cfg.hidden_size),
                        jnp.float32)
        nh, eps = cfg.num_attention_heads, cfg.vit_layer_norm_eps
        old = os.environ.get("VITCAP_PALLAS")
        os.environ["VITCAP_PALLAS"] = "interpret"
        try:
            out = vit_block(blk, x, nh, eps)
        finally:
            if old is None:
                os.environ.pop("VITCAP_PALLAS")
            else:
                os.environ["VITCAP_PALLAS"] = old
        ref = _vit_block_xla(blk, x, nh, eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_bert_block_parity_and_grad(self):
        """fused_bert_block (post-norm BERT layer + bias) matches the XLA
        bert_layer forward and recompute backward."""
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        from vitcap_tpu.models.layers import _bert_layer_xla
        from vitcap_tpu.ops.fused_block import fused_bert_block
        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        layer = params["decoder"]["layer"][0]
        rs = np.random.RandomState(0)
        B, L, H = 2, 70, cfg.hidden_size
        x = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        bias = jnp.where(jnp.asarray(rs.rand(B, 1, L, L) > 0.3), 0.0,
                         -10000.0).astype(jnp.float32)
        nh, eps = cfg.num_attention_heads, cfg.bert_layer_norm_eps
        ref = _bert_layer_xla(layer, x, bias, nh, eps)
        out = fused_bert_block(layer, x, bias, nh, eps, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        g1 = jax.grad(lambda p: jnp.sum(
            fused_bert_block(p, x, bias, nh, eps, True) ** 2))(layer)
        g2 = jax.grad(lambda p: jnp.sum(
            _bert_layer_xla(p, x, bias, nh, eps) ** 2))(layer)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-3)

    def test_train_fused_blocks_grad_parity(self):
        """cfg.train_fused_blocks routes the train forward through the
        fused kernel (interpret on CPU); loss + grads match XLA."""
        import os
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        cfg_x = tiny_config(img_size=128)   # 65 tokens -> fused eligible
        cfg_f = cfg_x.replace(train_fused_blocks=True)
        params = M.init_params(jax.random.PRNGKey(0), cfg_x)
        rs = np.random.RandomState(0)
        B, T = 2, cfg_x.max_seq_len
        batch = dict(
            image=jnp.asarray(rs.randn(B, cfg_x.img_size, cfg_x.img_size,
                                       3), jnp.float32),
            input_ids=jnp.asarray(rs.randint(1, cfg_x.vocab_size, (B, T)),
                                  jnp.int32),
            token_type_ids=jnp.zeros((B, T), jnp.int32),
            seq_a_len=jnp.full((B,), cfg_x.max_seq_a_len, jnp.int32),
            seq_len=jnp.full((B,), T, jnp.int32),
            masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1)
            .at[:, 3].set(1),
            masked_ids=jnp.zeros((B, cfg_x.max_masked_tokens), jnp.int32)
            .at[:, 0].set(7).at[:, 1].set(9),
            label=jnp.zeros((B, cfg_x.tag_vocab_size), jnp.float32)
            .at[:, 3].set(1.0),
        )
        lx, gx = jax.value_and_grad(
            lambda p: M.forward_train(p, batch, cfg_x)[0])(params)
        old = os.environ.get("VITCAP_PALLAS")
        os.environ["VITCAP_PALLAS"] = "interpret"
        try:
            lf, gf = jax.value_and_grad(
                lambda p: M.forward_train(p, batch, cfg_f)[0])(params)
        finally:
            if old is None:
                os.environ.pop("VITCAP_PALLAS")
            else:
                os.environ["VITCAP_PALLAS"] = old
        assert abs(float(lx) - float(lf)) < 1e-4
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


class TestKernelDropout:
    """In-kernel attention-prob dropout (counter-hash mask, regenerated in
    the backward — reference BertSelfAttention dropout,
    modeling_bert.py:139-141)."""

    def _qkv(self, B=2, L=80, H=32):
        rs = np.random.RandomState(1)
        return tuple(jnp.asarray(rs.randn(B, L, H), jnp.float32)
                     for _ in range(3))

    def test_deterministic_per_seed(self):
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        q, k, v = self._qkv()
        s1 = jnp.asarray(42, jnp.int32)
        a = flash_attention_packed(q, k, v, None, s1, 4, True, 0.3)
        b = flash_attention_packed(q, k, v, None, s1, 4, True, 0.3)
        c = flash_attention_packed(q, k, v, None,
                                   jnp.asarray(7, jnp.int32), 4, True, 0.3)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_rate_zero_matches_no_dropout(self):
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        q, k, v = self._qkv()
        s = jnp.asarray(5, jnp.int32)
        a = flash_attention_packed(q, k, v, None, s, 4, True, 0.0)
        b = flash_attention_packed(q, k, v, None, s, 4, True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_drop_fraction(self):
        """With v = identity columns the output row recovers the dropped
        probability mass; the kept fraction must track 1 - rate."""
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        B, L, H, nh = 1, 128, 128, 1
        rs = np.random.RandomState(2)
        q = jnp.asarray(rs.randn(B, L, H), jnp.float32) * 0.0
        k = jnp.asarray(rs.randn(B, L, H), jnp.float32) * 0.0
        # uniform probs 1/L per (q, key); v = I so out[q, j] = Pd[q, j]
        v = jnp.eye(L, H)[None]
        rate = 0.25
        out = flash_attention_packed(q, k, v, None,
                                     jnp.asarray(3, jnp.int32), nh, True,
                                     rate)
        probs = np.asarray(out)[0] * (1 - rate) * L   # back to keep-mask
        kept = probs > 0.5
        frac = kept.mean()
        assert abs(frac - (1 - rate)) < 0.03, frac
        # kept entries carry the inverse-scaled uniform mass
        np.testing.assert_allclose(probs[kept], 1.0, rtol=1e-4)

    def test_grad_matches_finite_difference(self):
        """Directional finite differences of the seed-fixed forward vs the
        custom backward: proves the backward regenerates the forward's
        exact mask and the dropout-softmax chain rule."""
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        B, L, H, nh = 1, 64, 16, 2
        rs = np.random.RandomState(3)
        q, k, v = (jnp.asarray(rs.randn(B, L, H), jnp.float32)
                   for _ in range(3))
        co = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        s = jnp.asarray(11, jnp.int32)

        def f(q, k, v):
            return jnp.sum(co * flash_attention_packed(
                q, k, v, None, s, nh, True, 0.2))

        grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        eps = 1e-3
        for idx, g in enumerate(grads):
            d = jnp.asarray(rs.randn(B, L, H), jnp.float32)
            args_p = [q, k, v]; args_m = [q, k, v]
            args_p[idx] = args_p[idx] + eps * d
            args_m[idx] = args_m[idx] - eps * d
            num = (f(*args_p) - f(*args_m)) / (2 * eps)
            ana = jnp.sum(g * d)
            np.testing.assert_allclose(float(num), float(ana),
                                       rtol=2e-3, atol=2e-3)

    def test_mha_dropout_routes_packed(self, monkeypatch):
        """mha with dropout active + interpret backend returns a dropout
        draw (differs from deterministic), and grads flow."""
        from vitcap_tpu.models.layers import mha
        q, k, v = self._qkv()
        monkeypatch.setenv("VITCAP_TRAIN_PALLAS", "interpret")
        rng = jax.random.PRNGKey(0)
        out_det = mha(q, k, v, 4, deterministic=True)
        out_drop = mha(q, k, v, 4, dropout_rate=0.2, rng=rng,
                       deterministic=False)
        assert not np.allclose(np.asarray(out_det), np.asarray(out_drop))

        def loss(q):
            return jnp.sum(mha(q, k, v, 4, dropout_rate=0.2, rng=rng,
                               deterministic=False) ** 2)
        g = jax.grad(loss)(q)
        assert np.isfinite(np.asarray(g)).all()


class TestPackedPairKernels:
    """dh == 64 routes the packed fwd/bwd through the pair-blockdiagonal
    kernels (_fwd_packed_pair_kernel / _bwd_packed_pair_kernel): two heads
    per matmul with [[k1,0];[0,k2]] K/V packing.  None of the other packed
    tests hit dh == 64, so this class locks in that path."""

    def _qkv(self, B=2, L=90, H=256, seed=0):
        rs = np.random.RandomState(seed)
        return tuple(jnp.asarray(rs.randn(B, L, H), jnp.float32)
                     for _ in range(3))

    def test_pair_forward_matches_xla(self):
        from vitcap_tpu.models.layers import mha
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        q, k, v = self._qkv()                     # nh=4, dh=64 -> pair
        ref = mha(q, k, v, 4, deterministic=True)
        out = flash_attention_packed(q, k, v, None,
                                     jnp.asarray(0, jnp.int32), 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_pair_forward_matches_xla_with_bias(self):
        from vitcap_tpu.models.layers import mha
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        q, k, v = self._qkv(seed=1)
        rs = np.random.RandomState(2)
        B, L = q.shape[0], q.shape[1]
        bias = jnp.asarray(
            np.where(rs.rand(B, 1, L, L) < 0.25, -10000.0, 0.0),
            jnp.float32)
        ref = mha(q, k, v, 4, bias=bias, deterministic=True)
        out = flash_attention_packed(q, k, v, bias,
                                     jnp.asarray(0, jnp.int32), 4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_pair_backward_matches_xla(self):
        from vitcap_tpu.models.layers import mha
        from vitcap_tpu.ops.flash_attention import flash_attention_packed
        q, k, v = self._qkv(seed=3)

        def loss_pal(q, k, v):
            return jnp.sum(flash_attention_packed(
                q, k, v, None, jnp.asarray(0, jnp.int32), 4, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(mha(q, k, v, 4, deterministic=True) ** 2)

        gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_pair_dropout_matches_perhead(self, monkeypatch):
        """The pair kernels generate per-segment dropout masks with the
        SAME (seed, global-head) salt and (Lp, Lp) lattice as the
        per-head kernels, so forward outputs AND gradients must match the
        per-head path draw-for-draw (finite differences are too noisy in
        f32 at this shape to prove this — direct cross-layout comparison
        is exact)."""
        import vitcap_tpu.ops.flash_attention as fa
        B, L, H, nh = 2, 90, 256, 4               # dh=64 -> pair kernels
        rs = np.random.RandomState(5)
        q, k, v = (jnp.asarray(rs.randn(B, L, H), jnp.float32)
                   for _ in range(3))
        co = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        s = jnp.asarray(11, jnp.int32)

        def f(q, k, v):
            return jnp.sum(co * fa.flash_attention_packed(
                q, k, v, None, s, nh, True, 0.3))

        out_pair = fa.flash_attention_packed(q, k, v, None, s, nh, True,
                                             0.3)
        g_pair = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        monkeypatch.setattr(fa, "_fwd_packed_pair_kernel",
                            fa._fwd_packed_kernel)
        monkeypatch.setattr(fa, "_bwd_packed_pair_kernel",
                            fa._bwd_packed_kernel)
        out_ph = fa.flash_attention_packed(q, k, v, None, s, nh, True,
                                           0.3)
        g_ph = jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        np.testing.assert_allclose(np.asarray(out_pair),
                                   np.asarray(out_ph),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(g_pair, g_ph):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("img", [32, 128])
def test_train_forward_hoisted_padding_matches_xla(monkeypatch, img):
    """With the packed train backend active, split_encoder pre-pads the
    trunk token axis once (l_actual plumbed through vit_block -> mha ->
    the packed kernels) instead of per-block pad/unpad.  Loss and grads
    must match the plain-XLA train forward.

    img=128 additionally drives the fusion sequence past 64 tokens
    (65 visual + 17 text = 82 -> padded to 96), engaging the round-5
    fusion_decoder pad hoist (seq + bias padded ONCE outside the 4-layer
    loop, l_actual plumbed through bert_layer)."""
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    cfg = tiny_config(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0,
                      num_attention_heads=2, hidden_size=64,
                      intermediate_size=128, img_size=img)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    B, T = 2, cfg.max_seq_len
    batch = dict(
        image=jnp.asarray(rs.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32),
        input_ids=jnp.asarray(rs.randint(1, cfg.vocab_size, (B, T)),
                              jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), cfg.max_seq_a_len, jnp.int32),
        seq_len=jnp.full((B,), T, jnp.int32),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1),
        masked_ids=jnp.zeros((B, cfg.max_masked_tokens), jnp.int32)
        .at[:, 0].set(5),
        label=jnp.zeros((B, cfg.tag_vocab_size), jnp.float32)
        .at[:, 1].set(1.0),
    )

    def loss(p):
        return M.forward_train(p, batch, cfg, rng=None)[0]

    l_ref, g_ref = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("VITCAP_TRAIN_PALLAS", "interpret")
    l_pal, g_pal = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-4)
    from jax.flatten_util import ravel_pytree
    flat_r, _ = ravel_pytree(g_ref)
    flat_p, _ = ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_r),
                               rtol=5e-3, atol=1e-4)


class TestSplitBlockTrain:
    """split_vit_block_train: split-kernel forward + ANALYTIC backward
    (no forward recompute).  Value and every grad (params, input) must
    match the XLA train block; padded rows must get zero input-grad and
    contribute nothing to parameter grads."""

    def _block(self, H, I, nh, seed=0):
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        cfg = tiny_config(hidden_size=H, intermediate_size=I,
                          num_attention_heads=nh)
        params = M.init_params(jax.random.PRNGKey(seed), cfg)
        return params["encoder"]["blocks"][0], cfg.vit_layer_norm_eps

    @pytest.mark.parametrize("nh,hd", [(2, 64), (4, 32)])
    def test_padded_value_and_grads_match_xla(self, nh, hd):
        from vitcap_tpu.models.layers import _vit_block_xla
        from vitcap_tpu.ops.fused_block import split_vit_block_train
        H = nh * hd
        blk, eps = self._block(H, 4 * H, nh)
        B, L, Lp = 2, 77, 80
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))

        out = split_vit_block_train(blk, xp, nh, eps, True, L)
        ref = _vit_block_xla(blk, x, nh, eps)
        np.testing.assert_allclose(np.asarray(out[:, :L]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_split(p, xx):
            o = split_vit_block_train(p, xx, nh, eps, True, L)
            return jnp.sum(o[:, :L] ** 2)

        def loss_ref(p, xx):
            return jnp.sum(_vit_block_xla(p, xx, nh, eps) ** 2)

        (gp_s, gx_s) = jax.grad(loss_split, argnums=(0, 1))(blk, xp)
        (gp_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(blk, x)
        np.testing.assert_allclose(np.asarray(gx_s[:, :L]),
                                   np.asarray(gx_r), rtol=1e-4, atol=1e-4)
        # padded rows contribute nothing and receive nothing
        np.testing.assert_allclose(np.asarray(gx_s[:, L:]), 0.0)
        flat_s = jax.tree_util.tree_leaves_with_path(gp_s)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(gp_r))
        assert len(flat_s) == len(flat_r)
        for path, a in flat_s:
            b = flat_r[path]
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=2e-4, err_msg=str(path))

    def test_unpadded_aligned(self):
        from vitcap_tpu.models.layers import _vit_block_xla
        from vitcap_tpu.ops.fused_block import split_vit_block_train
        nh, H = 2, 128
        blk, eps = self._block(H, 4 * H, nh)
        x = jnp.asarray(np.random.RandomState(5).randn(2, 80, H),
                        jnp.float32)
        out = split_vit_block_train(blk, x, nh, eps, True, 0)
        ref = _vit_block_xla(blk, x, nh, eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_vit_block_routes_split_train(self, monkeypatch):
        """public vit_block with the interpret train backend + aligned
        input routes through split_vit_block_train (grads flow, value
        matches XLA)."""
        from vitcap_tpu.models.layers import _vit_block_xla, vit_block
        nh, H = 2, 128
        blk, eps = self._block(H, 4 * H, nh)
        x = jnp.asarray(np.random.RandomState(7).randn(2, 80, H),
                        jnp.float32)
        monkeypatch.setenv("VITCAP_TRAIN_PALLAS", "interpret")
        out = vit_block(blk, x, nh, eps)
        ref = _vit_block_xla(blk, x, nh, eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        g = jax.grad(lambda p: jnp.sum(vit_block(p, x, nh, eps) ** 2))(blk)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))


class TestSplitBertLayerTrain:
    """split_bert_layer_train: split forward + analytic backward for the
    post-norm fusion-decoder layer (bias + in-kernel hidden/attn
    dropout).  Deterministic value/grads must match _bert_layer_xla;
    dropout grads must match finite differences of the seed-fixed
    forward (proving XLA-side mask regeneration matches the kernels)."""

    def _layer(self, H, I, nh, seed=0):
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        cfg = tiny_config(hidden_size=H, intermediate_size=I,
                          num_attention_heads=nh)
        params = M.init_params(jax.random.PRNGKey(seed), cfg)
        return params["decoder"]["layer"][0], cfg.bert_layer_norm_eps

    def _bias(self, B, L, seed=9):
        rng = np.random.RandomState(seed)
        return jnp.asarray(
            np.where(rng.rand(B, 1, L, L) > 0.25, 0.0, -10000.0),
            jnp.float32)

    @pytest.mark.parametrize("nh,hd", [(2, 64), (4, 32)])
    def test_det_value_and_grads_match_xla(self, nh, hd):
        from vitcap_tpu.models.layers import _bert_layer_xla
        from vitcap_tpu.ops.fused_block import split_bert_layer_train
        H = nh * hd
        p, eps = self._layer(H, 4 * H, nh)
        B, L, Lp = 2, 77, 80
        rs = np.random.RandomState(4)
        x = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        bias = self._bias(B, L)
        xp = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        biasp = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp - L), (0, Lp - L)))
        seeds = jnp.zeros((2,), jnp.int32)

        out = split_bert_layer_train(p, xp, biasp, nh, eps, True, L,
                                     0.0, 0.0, seeds)
        ref = _bert_layer_xla(p, x, bias, nh, eps)
        np.testing.assert_allclose(np.asarray(out[:, :L]),
                                   np.asarray(ref), rtol=3e-5, atol=3e-5)

        def loss_split(p_, xx):
            o = split_bert_layer_train(p_, xx, biasp, nh, eps, True, L,
                                       0.0, 0.0, seeds)
            return jnp.sum(o[:, :L] ** 2)

        def loss_ref(p_, xx):
            return jnp.sum(_bert_layer_xla(p_, xx, bias, nh, eps) ** 2)

        gp_s, gx_s = jax.grad(loss_split, argnums=(0, 1))(p, xp)
        gp_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(p, x)
        np.testing.assert_allclose(np.asarray(gx_s[:, :L]),
                                   np.asarray(gx_r), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gx_s[:, L:]), 0.0,
                                   atol=1e-6)
        flat_s = jax.tree_util.tree_leaves_with_path(gp_s)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(gp_r))
        assert len(flat_s) == len(flat_r)
        for path, a_ in flat_s:
            np.testing.assert_allclose(
                np.asarray(a_, np.float32),
                np.asarray(flat_r[path], np.float32),
                rtol=3e-4, atol=3e-4, err_msg=str(path))

    def test_dropout_grad_matches_finite_difference(self):
        from vitcap_tpu.ops.fused_block import split_bert_layer_train
        nh, H = 2, 128
        p, eps = self._layer(H, 2 * H, nh)
        B, L = 1, 64
        rs = np.random.RandomState(6)
        x = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        bias = self._bias(B, L, seed=12)
        co = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        seeds = jnp.asarray([17, 23], jnp.int32)

        def f(xx):
            return jnp.sum(co * split_bert_layer_train(
                p, xx, bias, nh, eps, True, 0, 0.2, 0.1, seeds))

        g = jax.grad(f)(x)
        eps_fd = 1e-3
        d = jnp.asarray(rs.randn(B, L, H), jnp.float32)
        num = (f(x + eps_fd * d) - f(x - eps_fd * d)) / (2 * eps_fd)
        ana = jnp.sum(g * d)
        np.testing.assert_allclose(float(num), float(ana), rtol=2e-3,
                                   atol=2e-3)

    def test_bert_layer_routes_split_train(self, monkeypatch):
        """public bert_layer with the interpret train backend + aligned
        input routes through split_bert_layer_train; deterministic value
        matches the XLA body and dropout-active grads are finite."""
        from vitcap_tpu.models.layers import _bert_layer_xla, bert_layer
        nh, H = 2, 128
        p, eps = self._layer(H, 2 * H, nh)
        x = jnp.asarray(np.random.RandomState(8).randn(2, 80, H),
                        jnp.float32)
        bias = self._bias(2, 80, seed=13)
        monkeypatch.setenv("VITCAP_TRAIN_PALLAS", "interpret")
        out = bert_layer(p, x, bias, nh, eps)
        ref = _bert_layer_xla(p, x, bias, nh, eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)
        rng = jax.random.PRNGKey(0)
        g = jax.grad(lambda p_: jnp.sum(bert_layer(
            p_, x, bias, nh, eps, hidden_dropout=0.1, attn_dropout=0.1,
            rng=rng, deterministic=False) ** 2))(p)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
