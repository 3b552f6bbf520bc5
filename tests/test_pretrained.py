"""HF-style save_pretrained / from_pretrained directory round-trip
(reference modeling_utils.py:80-123, :324-533)."""

import json
import os.path as op

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitcap_tpu.models import pretrained as P
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models.config import ModelConfig, tiny_config


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    params = M.init_params(jax.random.PRNGKey(7), cfg)
    return cfg, params


def _forward_logits(params, cfg):
    rng = np.random.RandomState(0)
    B, T = 2, cfg.max_seq_len
    batch = dict(
        image=jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32),
        input_ids=jnp.asarray(rng.randint(1, cfg.vocab_size, (B, T)),
                              jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), cfg.max_seq_a_len, jnp.int32),
        seq_len=jnp.full((B,), T, jnp.int32),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1),
        masked_ids=jnp.zeros((B, cfg.max_masked_tokens), jnp.int32)
        .at[:, 0].set(5),
        label=jnp.zeros((B, cfg.tag_vocab_size), jnp.float32)
        .at[:, 2].set(1.0),
    )
    total, aux = M.forward_train(params, batch, cfg)
    return np.asarray(total), np.asarray(aux["tag_logits"])


def test_roundtrip_exact(tiny, tmp_path):
    cfg, params = tiny
    d = str(tmp_path / "saved")
    P.save_pretrained(d, params, cfg)
    assert op.exists(op.join(d, "config.json"))
    assert op.exists(op.join(d, "pytorch_model.bin")) \
        or op.exists(op.join(d, "model.msgpack"))

    params2, cfg2 = P.from_pretrained(d)
    assert cfg2 == cfg
    l1, t1 = _forward_logits(params, cfg)
    l2, t2 = _forward_logits(params2, cfg2)
    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    np.testing.assert_allclose(t2, t1, rtol=1e-4, atol=1e-4)


def test_config_overrides(tiny, tmp_path):
    cfg, params = tiny
    d = str(tmp_path / "saved")
    P.save_pretrained(d, params, cfg)
    _, cfg2 = P.from_pretrained(d, topk=3)
    assert cfg2.topk == 3
    assert cfg2.hidden_size == cfg.hidden_size
    with pytest.raises(ValueError):
        P.from_pretrained(d, not_a_field=1)


def test_foreign_bertconfig_json(tmp_path):
    """A plain BertConfig json (no vitcap section) still builds a config —
    the reference's VILT-dir ingestion path."""
    j = {"hidden_size": 32, "num_attention_heads": 2,
         "intermediate_size": 64, "num_hidden_layers": 2,
         "vocab_size": 99, "max_position_embeddings": 40,
         "type_vocab_size": 2, "layer_norm_eps": 1e-5,
         "hidden_dropout_prob": 0.0,
         "attention_probs_dropout_prob": 0.0}
    cfg = P.config_from_json_dict(j, split_blocks=1)
    assert cfg.hidden_size == 32
    assert cfg.bert_layer_norm_eps == 1e-5
    assert cfg.vocab_size == 99
    # defaults fill the rest
    assert cfg.decoder_layers == ModelConfig().decoder_layers


def test_saved_bin_is_reference_loadable(tiny, tmp_path):
    """The emitted pytorch_model.bin is a torch-layout state dict with
    torch-convention names (module-free, `weight`/`bias` leaves)."""
    torch = pytest.importorskip("torch")
    cfg, params = tiny
    d = str(tmp_path / "saved")
    P.save_pretrained(d, params, cfg)
    sd = torch.load(op.join(d, "pytorch_model.bin"), weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    names = set(sd)
    assert any(n.endswith(".weight") for n in names)
    assert not any(n.startswith("module.") for n in names)
