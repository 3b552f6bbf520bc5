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
