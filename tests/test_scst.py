"""SCST tests: probe-layout scoring parity with the decode loop, reward /
advantage math, full step smoke."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models import decode as D
from vitcap_tpu.solver import scst as S

TCFG = tiny_config(max_seq_len=26, max_seq_a_len=6, topk=5,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   max_gen_length=6)
OD_LEN = TCFG.max_seq_len - TCFG.max_seq_a_len
A = TCFG.max_gen_length
OPTS = D.DecodeOptions(max_length=A, od_labels_start_posid=TCFG.max_seq_a_len)


@pytest.fixture(scope="module")
def setup():
    params = M.init_params(jax.random.PRNGKey(5), TCFG)
    rng = np.random.RandomState(3)
    B = 2
    images = jnp.asarray(rng.randn(B, TCFG.img_size, TCFG.img_size, 3),
                         jnp.float32)
    od_ids = jnp.asarray(rng.randint(4, TCFG.vocab_size, (B, OD_LEN)),
                         jnp.int32)
    seq_len = jnp.asarray([A + OD_LEN, A + OD_LEN - 3])
    return params, images, od_ids, seq_len


def test_probe_scoring_matches_decode_loop(setup):
    """Greedy-decoded captions re-scored by the probe layout must give the
    decode loop's own logprobs bit-for-bit (same math, different layout)."""
    params, images, od_ids, seq_len = setup
    out = D.generate_greedy(params, images, od_ids, None, seq_len, TCFG, OPTS)
    ids = out["ids"][:, 0]                    # (B, A)
    lp = S.score_caption_logprobs(params, images, od_ids, None, seq_len,
                                  ids, TCFG, OPTS,
                                  target_ids=out["raw_tokens"])
    np.testing.assert_allclose(np.array(lp), np.array(out["logprobs"][:, 0]),
                               rtol=1e-5, atol=1e-6)


def test_probe_scoring_num_return_expansion(setup):
    params, images, od_ids, seq_len = setup
    out = D.generate_greedy(params, images, od_ids, None, seq_len, TCFG, OPTS)
    ids = out["ids"][:, 0]
    # repeat each image's caption K=2 times -> same logprobs per pair
    K = 2
    rep = jnp.repeat(ids, K, axis=0)
    lp = S.score_caption_logprobs(params, images, od_ids, None, seq_len,
                                  rep, TCFG, OPTS)
    lp = np.array(lp).reshape(-1, K)
    np.testing.assert_allclose(lp[:, 0], lp[:, 1], rtol=1e-6)


def test_advantage_math_greedy_baseline(monkeypatch):
    r = S.ScstReward(baseline_type="greedy")
    fake = np.array([1.0, 3.0, 2.0, 4.0, 0.5, 1.5])   # 4 samples + 2 greedy

    def fake_score(gts, res):
        return None, fake[: len(res)]
    monkeypatch.setattr(r.scorer, "compute_score",
                        lambda gts, res: (None, fake))
    adv = r([["gt a"], ["gt b"]], ["g1", "g2"], ["s1", "s2", "s3", "s4"])
    np.testing.assert_allclose(adv, [1.0 - 0.5, 3.0 - 0.5,
                                     2.0 - 1.5, 4.0 - 1.5])
    assert abs(r.get_score() - np.mean([1, 3, 2, 4])) < 1e-9


def test_advantage_math_sample_baseline(monkeypatch):
    r = S.ScstReward(baseline_type="sample")
    fake = np.array([1.0, 3.0, 2.0, 4.0])
    monkeypatch.setattr(r.scorer, "compute_score",
                        lambda gts, res: (None, fake))
    adv = r([["gt a"], ["gt b"]], [], ["s1", "s2", "s3", "s4"])
    # leave-one-out baselines: [3, 1, 4, 2]
    np.testing.assert_allclose(adv, [1 - 3, 3 - 1, 2 - 4, 4 - 2])


def test_wrap_sentence():
    assert S.wrap_sentence("a dog runs.") == "a dog runs <eos>"
    assert S.wrap_sentence(" a dog ") == "a dog <eos>"


def test_full_scst_step(setup):
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.solver.train_step import TrainHyper, init_train_state
    params, images, od_ids, seq_len = setup
    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    hyper = TrainHyper(base_lr=1e-4, max_iter=10)
    scfg = S.ScstConfig(num_return=2)
    decode_fn, grad_fn = S.make_scst_fns(TCFG, OPTS, scfg, hyper)
    # copy: grad_fn donates its state and params come from a shared fixture
    params_copy = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                         params)
    state = init_train_state(params_copy, jax.random.PRNGKey(0))
    reward = S.ScstReward(baseline_type="greedy")
    batch = {"image": images, "od_ids": od_ids, "seq_len": seq_len}
    gt = [["a dog runs across the field", "the dog runs"],
          ["a man rides a bike", "the man is riding"]]
    state, metrics = S.scst_train_step(decode_fn, grad_fn, reward, tok,
                                       state, batch, gt,
                                       jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["scst_loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert metrics["cider_score"] is not None


def test_scst_step_data_parallel_matches_single(setup):
    """One DP SCST step on the 8-virtual-device CPU mesh (params
    replicated, batch/advantages data-sharded like _train_scst) must
    produce the same updated params as the unsharded step — the SCST
    analogue of test_solver's DP-vs-single check (the reference SCSTs
    across WORLD_SIZE=3, …expanding.py:404-478)."""
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.parallel.mesh import make_mesh, shard_batch, \
        shard_params
    from vitcap_tpu.solver.train_step import TrainHyper, init_train_state
    params, _, _, _ = setup
    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    hyper = TrainHyper(base_lr=1e-3, max_iter=10)
    scfg = S.ScstConfig(num_return=2)
    rng = np.random.RandomState(9)
    B = 8
    images = jnp.asarray(rng.randn(B, TCFG.img_size, TCFG.img_size, 3),
                         jnp.float32)
    od_ids = jnp.asarray(rng.randint(4, TCFG.vocab_size, (B, OD_LEN)),
                         jnp.int32)
    seq_len = jnp.asarray([A + OD_LEN - (i % 3) for i in range(B)])
    gt = [[f"a dog number {i} runs", "the dog runs"] for i in range(B)]

    results = {}
    for name, n_dev in (("single", 1), ("dp", 8)):
        mesh = make_mesh(n_data=n_dev)
        p = shard_params(jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params), mesh)
        state = init_train_state(p, jax.random.PRNGKey(0))
        decode_fn, grad_fn = S.make_scst_fns(TCFG, OPTS, scfg, hyper)
        batch = shard_batch({"image": images, "od_ids": od_ids,
                             "seq_len": seq_len}, mesh)
        state, metrics = S.scst_train_step(decode_fn, grad_fn, reward=
                                           S.ScstReward(
                                               baseline_type="greedy"),
                                           tokenizer=tok, state=state,
                                           batch=batch, gt_captions=gt,
                                           rng=jax.random.PRNGKey(7),
                                           mesh=mesh)
        results[name] = (jax.tree_util.tree_map(np.asarray, state.params),
                         float(metrics["scst_loss"]))

    np.testing.assert_allclose(results["single"][1], results["dp"][1],
                               rtol=1e-5, atol=1e-6)
    flat_s = jax.tree_util.tree_leaves(results["single"][0])
    flat_d = jax.tree_util.tree_leaves(results["dp"][0])
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_gen_tag_ratio_curriculum(setup):
    """ratio=1 -> pure predicted tags (same loss as without the key);
    ratio=0 -> GT tags occupy the leading concept slots."""
    import jax
    params, images, od_ids, seq_len = setup
    B = 2
    T = TCFG.max_seq_len
    rng = np.random.RandomState(9)
    batch = dict(
        image=images,
        input_ids=jnp.asarray(rng.randint(4, TCFG.vocab_size, (B, T)),
                              jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), TCFG.max_seq_a_len),
        seq_len=jnp.full((B,), T),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1),
        masked_ids=jnp.zeros((B, TCFG.max_masked_tokens), jnp.int32)
        .at[:, 0].set(7),
        label=jnp.zeros((B, TCFG.tag_vocab_size)).at[:, 5].set(1.0)
        .at[:, 9].set(1.0),
    )
    key = jax.random.PRNGKey(0)
    l_plain, _ = M.forward_train(params, batch, TCFG, rng=key)
    l_ratio1, _ = M.forward_train(
        params, dict(batch, gen_tag_ratio=jnp.asarray(1.0)), TCFG, rng=key)
    np.testing.assert_allclose(float(l_plain), float(l_ratio1), rtol=1e-6)
    l_ratio0, _ = M.forward_train(
        params, dict(batch, gen_tag_ratio=jnp.asarray(0.0)), TCFG, rng=key)
    assert abs(float(l_ratio0) - float(l_plain)) > 1e-7  # GT tags injected


def test_scst_with_token_sampling(setup):
    """SCST with 70% visual-token sampling (reference TokenSample)."""
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.solver.train_step import TrainHyper, init_train_state
    params, images, od_ids, seq_len = setup
    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    hyper = TrainHyper(base_lr=1e-4, max_iter=10)
    scfg = S.ScstConfig(num_return=2, visual_token_ratio=0.7)
    decode_fn, grad_fn = S.make_scst_fns(TCFG, OPTS, scfg, hyper)
    params_copy = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                         params)
    state = init_train_state(params_copy, jax.random.PRNGKey(0))
    reward = S.ScstReward(baseline_type="greedy")
    batch = {"image": images, "od_ids": od_ids, "seq_len": seq_len}
    gt = [["a dog runs"], ["a man rides"]]
    state, metrics = S.scst_train_step(decode_fn, grad_fn, reward, tok,
                                       state, batch, gt,
                                       jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["scst_loss"]))


def test_sample_visual_token_idx():
    idx = M.sample_visual_token_idx(jax.random.PRNGKey(0), 3, 10, 6)
    arr = np.asarray(idx)
    assert arr.shape == (3, 6)
    assert (arr[:, 0] == 0).all()                 # CLS kept
    for row in arr:
        assert len(set(row.tolist())) == 6        # no duplicates
        assert (row[1:] >= 1).all() and (row < 10).all()
