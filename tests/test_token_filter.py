"""Attention-aware token filtering (opt-in speed knob, see PAPERS.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models import decode as D


def test_filter_shapes_and_determinism():
    cfg = tiny_config(token_filter_keep=0.5, img_size=64)   # 16 patches
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    out = M.encode_images(params, images, cfg)
    assert out["visual"].shape == (2, 1 + 8, cfg.hidden_size)  # CLS + 50%
    out2 = M.encode_images(params, images, cfg)
    np.testing.assert_array_equal(np.asarray(out["visual"]),
                                  np.asarray(out2["visual"]))


def test_filter_off_is_exact_old_path():
    cfg_on = tiny_config(token_filter_keep=0.0, img_size=64)
    params = M.init_params(jax.random.PRNGKey(0), cfg_on)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    out = M.encode_images(params, images, cfg_on)
    assert out["visual"].shape == (2, 17, cfg_on.hidden_size)


def test_filter_selects_high_attention_tokens():
    from vitcap_tpu.models.layers import cls_attention_scores
    from vitcap_tpu.models.vitcap import _filter_tokens_by_attention
    cfg = tiny_config(token_filter_keep=0.25)
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    blk = params["encoder"]["blocks"][cfg.token_filter_block]
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 9, cfg.hidden_size), jnp.float32)
    scores = np.asarray(cls_attention_scores(
        blk, x, cfg.num_attention_heads, cfg.vit_layer_norm_eps))
    kept = np.asarray(_filter_tokens_by_attention(blk, x, cfg))
    # CLS first, then the top-2 patches by score in original order
    want = np.sort(np.argsort(-scores[:, 1:], axis=1)[:, :2], axis=1) + 1
    for b in range(2):
        np.testing.assert_array_equal(kept[b, 0], np.asarray(x)[b, 0])
        np.testing.assert_array_equal(kept[b, 1:],
                                      np.asarray(x)[b, want[b]])


def test_filtered_decode_runs_end_to_end():
    cfg = tiny_config(token_filter_keep=0.5, img_size=64)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    rng = np.random.RandomState(0)
    B = 2
    images = jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32)
    od = jnp.asarray(rng.randint(5, 100,
                                 (B, cfg.max_seq_len - cfg.max_seq_a_len)),
                     jnp.int32)
    sl = jnp.full((B,), cfg.max_seq_len, jnp.int32)
    out = jax.jit(lambda p: D.generate_greedy(p, images, od, None, sl, cfg,
                                              opts))(params)
    assert out["ids"].shape == (B, 1, cfg.max_gen_length)
