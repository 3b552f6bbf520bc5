"""SCAN retrieval parity tests vs the reference scan_utils.py
(torch, run directly from /root/reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import reference_harness
reference_harness.install()

from vitcap_tpu.models import scan as S


def _ref_scan_utils():
    import importlib
    return importlib.import_module("src.tools.captioning.scan_utils")


class _Opt:
    def __init__(self, cfg: S.ScanConfig):
        self.RAW_FEATURE_NORM = cfg.raw_feature_norm
        self.LAMBDA_SOFTMAX = cfg.lambda_softmax
        self.LAMBDA_LSE = cfg.lambda_lse
        self.AGG_FUNC = cfg.agg_func
        self.CROSS_ATTN = cfg.cross_attn
        self.MARGIN = cfg.margin
        self.MAX_VIOLATION = cfg.max_violation


@pytest.mark.parametrize("norm", ["clipped_l2norm", "softmax", "l1norm",
                                  "no_norm"])
def test_func_attention_parity(norm):
    import torch
    su = _ref_scan_utils()
    cfg = S.ScanConfig(raw_feature_norm=norm)
    rng = np.random.RandomState(0)
    q = rng.randn(3, 5, 16).astype(np.float32)
    c = rng.randn(3, 7, 16).astype(np.float32)
    ref_w, ref_a = su.func_attention(torch.from_numpy(q),
                                     torch.from_numpy(c), _Opt(cfg),
                                     smooth=cfg.lambda_softmax)
    w, a = S.func_attention(jnp.asarray(q), jnp.asarray(c), cfg,
                            smooth=cfg.lambda_softmax)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), ref_a.numpy(), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("agg", ["LogSumExp", "Max", "Sum", "Mean"])
def test_xattn_t2i_parity(agg):
    import torch
    su = _ref_scan_utils()
    cfg = S.ScanConfig(agg_func=agg)
    rng = np.random.RandomState(1)
    n_img, n_cap, R, Lw, d = 4, 4, 6, 8, 16
    img = rng.randn(n_img, R, d).astype(np.float32)
    cap = rng.randn(n_cap, Lw, d).astype(np.float32)
    lens = np.array([8, 5, 3, 7])
    # zero the padded tail like the text encoder does
    for i, ln in enumerate(lens):
        cap[i, ln:] = 0
    ref, _ = su.xattn_score_t2i(torch.from_numpy(img),
                                torch.from_numpy(cap),
                                torch.from_numpy(lens), _Opt(cfg))
    ours = S.xattn_score_t2i(jnp.asarray(img), jnp.asarray(cap),
                             jnp.asarray(lens), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=1e-5)


@pytest.mark.parametrize("agg", ["LogSumExp", "Sum", "Mean"])
def test_xattn_i2t_parity(agg):
    import torch
    su = _ref_scan_utils()
    cfg = S.ScanConfig(agg_func=agg, cross_attn="i2t")
    rng = np.random.RandomState(2)
    n_img, R, Lw, d = 4, 6, 8, 16
    img = rng.randn(n_img, R, d).astype(np.float32)
    cap = rng.randn(n_img, Lw, d).astype(np.float32)
    cap_lens = np.array([8, 5, 3, 7])
    img_lens = np.array([6, 6, 6, 6])      # reference pads regions equally
    for i, ln in enumerate(cap_lens):
        cap[i, ln:] = 0
    ref, _ = su.xattn_score_i2t(torch.from_numpy(img),
                                torch.from_numpy(img_lens),
                                torch.from_numpy(cap),
                                torch.from_numpy(cap_lens), _Opt(cfg))
    ours = S.xattn_score_i2t(jnp.asarray(img), jnp.asarray(img_lens),
                             jnp.asarray(cap), jnp.asarray(cap_lens), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=1e-5)


def test_contrastive_loss_parity():
    import torch
    su = _ref_scan_utils()
    for mv in (True, False):
        cfg = S.ScanConfig(max_violation=mv)
        rng = np.random.RandomState(3)
        n, R, Lw, d = 5, 6, 8, 16
        img = rng.randn(n, R, d).astype(np.float32)
        cap = rng.randn(n, Lw, d).astype(np.float32)
        lens = np.array([8, 5, 3, 7, 6])
        for i, ln in enumerate(lens):
            cap[i, ln:] = 0
        crit = su.ContrastiveLoss(_Opt(cfg), margin=cfg.margin,
                                  max_violation=mv)
        ref = crit(torch.from_numpy(img), None, torch.from_numpy(cap),
                   torch.from_numpy(lens))
        scores = S.scan_scores(jnp.asarray(img), None, jnp.asarray(cap),
                               jnp.asarray(lens), cfg)
        ours = S.contrastive_loss(scores, cfg)
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_gru_text_encoder_parity():
    """encode_text matches torch nn.GRU (bi, 1 layer) + averaging + l2norm
    (reference EncoderText.forward)."""
    import torch
    cfg = S.ScanConfig(vocab_size=50, word_dim=12, embed_size=10,
                       num_layers=1, bi_gru=True)
    params = S.init_scan_params(jax.random.PRNGKey(0), cfg)

    gru = torch.nn.GRU(cfg.word_dim, cfg.embed_size, 1, batch_first=True,
                       bidirectional=True)
    with torch.no_grad():
        l = params["gru"][0]
        gru.weight_ih_l0.copy_(torch.from_numpy(np.asarray(l[0]["w_ih"])))
        gru.weight_hh_l0.copy_(torch.from_numpy(np.asarray(l[0]["w_hh"])))
        gru.bias_ih_l0.copy_(torch.from_numpy(np.asarray(l[0]["b_ih"])))
        gru.bias_hh_l0.copy_(torch.from_numpy(np.asarray(l[0]["b_hh"])))
        gru.weight_ih_l0_reverse.copy_(
            torch.from_numpy(np.asarray(l[1]["w_ih"])))
        gru.weight_hh_l0_reverse.copy_(
            torch.from_numpy(np.asarray(l[1]["w_hh"])))
        gru.bias_ih_l0_reverse.copy_(
            torch.from_numpy(np.asarray(l[1]["b_ih"])))
        gru.bias_hh_l0_reverse.copy_(
            torch.from_numpy(np.asarray(l[1]["b_hh"])))

    rng = np.random.RandomState(4)
    ids = rng.randint(0, 50, (3, 7))
    lens = np.array([7, 4, 2])
    emb = np.asarray(params["embed"])[ids]

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(emb.astype(np.float32)), torch.from_numpy(lens),
        batch_first=True, enforce_sorted=False)
    out, _ = gru(packed)
    padded, out_lens = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True)
    ref = (padded[:, :, :cfg.embed_size]
           + padded[:, :, cfg.embed_size:]).detach().numpy() / 2
    # reference l2norms after averaging
    ref = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-8)

    ours = np.asarray(S.encode_text(params, jnp.asarray(ids),
                                    jnp.asarray(lens), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_scan_train_and_retrieval():
    """End-to-end: jitted contrastive training step reduces loss; retrieval
    metrics find the aligned pairs on separable data."""
    import optax
    cfg = S.ScanConfig(vocab_size=40, word_dim=8, embed_size=8, img_dim=12,
                       num_layers=1, bi_gru=False, cap_chunk=8)
    params = S.init_scan_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    B, R, Lw = 8, 4, 6
    img = rng.randn(B, R, cfg.img_dim).astype(np.float32)
    ids = rng.randint(0, 40, (B, Lw))
    lens = np.full((B,), Lw)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return S.scan_forward(p, jnp.asarray(img), None,
                                  jnp.asarray(ids), jnp.asarray(lens), cfg)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state2 = opt.update(grads, state)
        return optax.apply_updates(params, upd), state2, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::6]

    img_emb, cap_emb = S.scan_forward(params, jnp.asarray(img), None,
                                      jnp.asarray(ids), jnp.asarray(lens),
                                      cfg, train=False)
    scores = S.scan_scores(img_emb, None, cap_emb, jnp.asarray(lens), cfg)
    m = S.retrieval_metrics(scores, caps_per_image=1)
    assert m["i2t_R@1"] > 50.0
    assert m["t2i_R@1"] > 50.0
