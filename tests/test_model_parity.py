"""Golden parity: vitcap_tpu model vs the reference torch implementation on
tiny random models.  Loss values and logits must match to float tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.solver.checkpoint_bridge import load_params_from_torch

import reference_harness as RH


# tiny config sized so the reference's hard-coded `topk_len + 20 <= seq_len`
# train-branch condition (modeling_bert.py:1433) holds: topk=5, seq_len=26
TCFG = tiny_config(max_seq_len=26, max_seq_a_len=6, topk=5,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   tag_loss_weight=1.0)


@pytest.fixture(scope="module")
def ref_and_params():
    model, image_encoder, _ = RH.make_tiny_ref_vitcap(TCFG, seed=3)
    sd = RH.combined_state_dict(model, image_encoder)
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    params = M.init_params(jax.random.PRNGKey(0), TCFG)
    params, report = load_params_from_torch(params, sd_np)
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]
    return model, image_encoder, params


def _make_batch(rng, B=2):
    T, A = TCFG.max_seq_len, TCFG.max_seq_a_len
    image = rng.randn(B, TCFG.img_size, TCFG.img_size, 3).astype(np.float32)
    input_ids = rng.randint(4, TCFG.vocab_size, size=(B, T)).astype(np.int32)
    seq_a_len = np.array([5, 6], dtype=np.int32)[:B]
    seq_len = np.array([T - 2, T], dtype=np.int32)[:B]
    token_type_ids = np.zeros((B, T), dtype=np.int32)
    for b in range(B):
        input_ids[b, seq_a_len[b]:A] = 0          # pad tail of text_a
        input_ids[b, seq_len[b]:] = 0             # pad tail of text_b
        token_type_ids[b, A:seq_len[b]] = 1
    masked_pos = np.zeros((B, T), dtype=np.int32)
    masked_pos[0, [1, 3]] = 1
    masked_pos[1, [2, 4, 5]] = 1
    masked_ids = np.zeros((B, TCFG.max_masked_tokens), dtype=np.int32)
    masked_ids[0, :2] = [17, 23]
    masked_ids[1, :3] = [9, 41, 77]
    label = (rng.rand(B, TCFG.tag_vocab_size) < 0.05).astype(np.float32)
    return dict(image=image, input_ids=input_ids,
                token_type_ids=token_type_ids, seq_a_len=seq_a_len,
                seq_len=seq_len, masked_pos=masked_pos, masked_ids=masked_ids,
                label=label)


def _ref_full_mask(batch):
    """Reference-style full (text+img)^2 mask -> construct_attn_mask composition
    (…bertemb.py:57-88)."""
    from vitcap_tpu.models.vitcap import seq2seq_text_mask
    B = batch["input_ids"].shape[0]
    T = TCFG.max_seq_len
    V = TCFG.num_visual_tokens
    tm = np.array(seq2seq_text_mask(jnp.asarray(batch["seq_a_len"]),
                                    jnp.asarray(batch["seq_len"]), TCFG))
    full = np.zeros((B, T + V, T + V), dtype=np.float32)
    full[:, :T, :T] = tm
    full[:, :T, T:] = 1.0    # top_right: text attends image
    full[:, T:, T:] = 1.0    # bottom_right: image attends image
    return full


def _ref_forward(model, image_encoder, batch, is_training):
    import torch
    with torch.no_grad():
        img = torch.from_numpy(
            batch["image"].transpose(0, 3, 1, 2))  # NHWC -> NCHW
        img_feats = image_encoder(img)
        out = model.encode_forward(
            input_ids=torch.from_numpy(batch["input_ids"]).long(),
            img_feats=img_feats,
            attention_mask=torch.from_numpy(_ref_full_mask(batch)),
            label=torch.from_numpy(batch["label"]),
            masked_pos=torch.from_numpy(batch["masked_pos"]).long(),
            masked_ids=torch.from_numpy(batch["masked_ids"]).long(),
            token_type_ids=torch.from_numpy(batch["token_type_ids"]).long(),
            is_training=is_training,
            return_dict=True,
        )
    return out


def test_train_forward_parity(ref_and_params):
    model, image_encoder, params = ref_and_params
    batch = _make_batch(np.random.RandomState(1))
    ref = _ref_forward(model, image_encoder, batch, is_training=True)

    total, aux = M.forward_train(
        params, {k: jnp.asarray(v) for k, v in batch.items()}, TCFG, rng=None)

    np.testing.assert_allclose(
        float(aux["masked_loss"]), float(ref["masked_loss"]),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        float(aux["tag_loss"]), float(ref["tag_loss"]), rtol=2e-4, atol=2e-4)
    # class logits: reference returns a flat (num_masked, V); ours (B, M, V)
    w = np.array(aux["masked_weight"]).reshape(-1) > 0
    mine = np.array(aux["class_logits"]).reshape(-1, TCFG.vocab_size)[w]
    np.testing.assert_allclose(mine, ref["class_logits"].numpy(),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.array(aux["tag_logits"]),
                               ref["tag_logits"].numpy(),
                               rtol=2e-3, atol=2e-4)


def test_score_forward_parity(ref_and_params):
    model, image_encoder, params = ref_and_params
    batch = _make_batch(np.random.RandomState(2))
    ref = _ref_forward(model, image_encoder, batch, is_training=False)

    tm = M.seq2seq_text_mask(jnp.asarray(batch["seq_a_len"]),
                             jnp.asarray(batch["seq_len"]), TCFG)
    out = M.forward_score(params, jnp.asarray(batch["image"]),
                          jnp.asarray(batch["input_ids"]),
                          jnp.asarray(batch["token_type_ids"]), None, tm, TCFG)
    np.testing.assert_allclose(np.array(out["class_logits"]),
                               ref["class_logits"].numpy(),
                               rtol=2e-3, atol=2e-4)


def test_tag_block_init_copy():
    params = M.init_params(jax.random.PRNGKey(1), TCFG)
    params = M.init_tag_blocks_from_encoder(params, TCFG)
    src = params["encoder"]["blocks"][-TCFG.split_blocks:]
    dst = params["encoder"]["tag_blocks"]
    for s, d in zip(src, dst):
        for sa, da in zip(jax.tree_util.tree_leaves(s),
                          jax.tree_util.tree_leaves(d)):
            np.testing.assert_array_equal(np.array(sa), np.array(da))
