"""Constrained-beam-search golden parity vs the reference utils_cbs."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models import decode as D
from vitcap_tpu.models import cbs as C
from vitcap_tpu.solver.checkpoint_bridge import load_params_from_torch

import reference_harness as RH

TCFG = tiny_config(max_seq_len=26, max_seq_a_len=6, topk=5,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   max_gen_length=6, tag_attach="embedded")
OD_LEN = TCFG.max_seq_len - TCFG.max_seq_a_len
A = TCFG.max_gen_length
NB = 3
NS = 2


@pytest.fixture(scope="module")
def ref_and_params():
    RH.install_cbs()
    model, image_encoder, _ = RH.make_tiny_ref_vitcap(TCFG, seed=3)
    sd = RH.combined_state_dict(model, image_encoder)
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    params = M.init_params(jax.random.PRNGKey(0), TCFG)
    params, report = load_params_from_torch(params, sd_np)
    assert not report["shape_mismatch"] and not report["missing"]
    return model, image_encoder, params


def _tiny_fsm(B, constraint_word_ids):
    """S=2: state0 self-loops except constraint words -> state1; state1
    self-loops everything."""
    V = TCFG.vocab_size
    fsm = np.zeros((B, NS, NS, V), dtype=np.uint8)
    fsm[:, 0, 0, :] = 1
    fsm[:, 1, 1, :] = 1
    for w in constraint_word_ids:
        fsm[:, 0, 0, w] = 0
        fsm[:, 0, 1, w] = 1
    return fsm


def _decode_batch(rng, B=2):
    image = rng.randn(B, TCFG.img_size, TCFG.img_size, 3).astype(np.float32)
    od_ids = rng.randint(4, TCFG.vocab_size, size=(B, OD_LEN)).astype(np.int32)
    seq_len = np.full((B,), A + OD_LEN, np.int32)
    return image, od_ids, seq_len


def test_cbs_parity(ref_and_params):
    """Raw search parity: same beam SETS per FSM state with matching
    logprobs.  Near-tied beams (float-noise |dlp| ~ 2e-4 on the tiny random
    model) may swap rank between torch and jax, so rows are matched by token
    content, not rank."""
    import torch
    import src.tools.captioning.utils_cbs as U
    model, image_encoder, params = ref_and_params
    rng = np.random.RandomState(21)
    image, od_ids, seq_len = _decode_batch(rng)
    B = image.shape[0]
    fsm = _tiny_fsm(B, constraint_word_ids=[17, 42])

    captured = {}
    orig = U.select_best_beam_with_constraints

    def spy(beams, lps, *a, **k):
        captured["beams"] = beams.clone().numpy()
        captured["lps"] = lps.clone().numpy()
        return orig(beams, lps, *a, **k)

    U.select_best_beam_with_constraints = spy
    try:
        _ref_cbs(model, image_encoder, image, od_ids, seq_len, fsm)
    finally:
        U.select_best_beam_with_constraints = orig
    ref_ids, ref_lp = captured["beams"], captured["lps"]

    out = C.constrained_beam_search(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        jnp.asarray(fsm), TCFG,
        D.DecodeOptions(max_length=A,
                        od_labels_start_posid=TCFG.max_seq_a_len),
        beam_size=NB)
    my_ids = np.asarray(out["ids"])[:, :, :, 1:]    # drop BOS like the ref
    my_lp = np.asarray(out["logprobs"])

    for b in range(B):
        for s in range(NS):
            mine = {tuple(r): l for r, l in zip(my_ids[b, s], my_lp[b, s])}
            ref = {tuple(r): l for r, l in zip(ref_ids[b, s], ref_lp[b, s])}
            assert set(mine) == set(ref), (b, s, mine, ref)
            for k in ref:
                np.testing.assert_allclose(mine[k], ref[k], atol=2e-3)


def _ref_cbs(model, image_encoder, image, od_ids, seq_len, fsm):
    import torch
    from src.tools.captioning.utils_cbs import ConstrainedBeamSearch
    B = image.shape[0]
    T = A + OD_LEN
    tm = np.array(M.seq2seq_text_mask(
        jnp.full((B,), A), jnp.asarray(seq_len),
        TCFG.replace(max_seq_len=T, max_seq_a_len=A)))
    V = TCFG.num_visual_tokens
    full = np.zeros((B, T + V, T + V), dtype=np.float32)
    full[:, :T, :T] = tm
    full[:, :T, T:] = 1.0
    full[:, T:, T:] = 1.0
    input_ids = np.zeros((B, T), dtype=np.int64)
    input_ids[:, A:] = od_ids
    tt = np.zeros((B, T), dtype=np.int64)
    tt[:, A:] = 1

    with torch.no_grad():
        img_feats = image_encoder(
            torch.from_numpy(image.transpose(0, 3, 1, 2)))
        out = model.generate(
            img_feats=img_feats,
            attention_mask=torch.from_numpy(full),
            masked_pos=torch.zeros(B, T, dtype=torch.long),
            token_type_ids=torch.from_numpy(tt),
            input_ids=torch.from_numpy(input_ids),
            is_decode=True, do_sample=False,
            bos_token_id=TCFG.cls_token_id,
            pad_token_id=TCFG.pad_token_id,
            eos_token_ids=[TCFG.sep_token_id],
            mask_token_id=TCFG.mask_token_id,
            add_od_labels=True,
            od_labels_start_posid=TCFG.max_seq_a_len,
            max_length=A, num_beams=NB, temperature=1.0,
            top_k=0, top_p=1.0, repetition_penalty=1, length_penalty=1,
            num_return_sequences=1, num_keep_best=1,
            use_cbs=True, fsm=torch.from_numpy(fsm),
            num_constraints=torch.tensor([1, 1]),
            min_constraints_to_satisfy=1,
        )
    # reference CBS returns best beams already selected: (B, 1, len), (B, 1)
    return out


def test_ref_cbs_path_runs_and_matches_select(ref_and_params):
    """Full reference generate(use_cbs=True) equals my CBS + select chain."""
    model, image_encoder, params = ref_and_params
    rng = np.random.RandomState(22)
    image, od_ids, seq_len = _decode_batch(rng)
    B = image.shape[0]
    fsm = _tiny_fsm(B, constraint_word_ids=[17, 42])
    ref_out = _ref_cbs(model, image_encoder, image, od_ids, seq_len, fsm)
    ref_best = ref_out[0].numpy()[:, 0, :]
    ref_best_lp = ref_out[1].numpy()[:, 0]

    out = C.constrained_beam_search(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        jnp.asarray(fsm), TCFG,
        D.DecodeOptions(max_length=A,
                        od_labels_start_posid=TCFG.max_seq_a_len),
        beam_size=NB)
    mb, mlp = C.select_best_beam_with_constraints(
        np.asarray(out["ids"])[:, :, :, 1:], np.asarray(out["logprobs"]),
        np.array([1, 1]), 1, [TCFG.sep_token_id])
    # near-ties can swap which beam is 'best'; logprobs must agree and the
    # selected caption must satisfy the constraint either way
    np.testing.assert_allclose(mlp, ref_best_lp, atol=2e-3)
    for b in range(mb.shape[0]):
        assert (mb[b] == 17).any() or (mb[b] == 42).any()
        assert (ref_best[b] == 17).any() or (ref_best[b] == 42).any()


def test_fsm_builder_parity():
    RH.install_cbs()
    import torch
    from src.tools.captioning.utils_cbs import \
        FiniteStateMachineBuilder as RefBuilder
    from vitcap_tpu.data.tokenization import BertTokenizer

    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    c2t = {"dog": ["dog"], "fire": ["fire"], "hydrant": ["hydrant"],
           "cat": ["cat"]}
    wf = {"dog": ["dog", "dogs"], "fire": ["fire"],
          "hydrant": ["hydrant", "hydrants"], "cat": ["cat", "cats"]}

    class _TmpFiles:
        pass

    import tempfile, os
    d = tempfile.mkdtemp()
    c2t_p = os.path.join(d, "c2t.tsv")
    wf_p = os.path.join(d, "wf.tsv")
    with open(c2t_p, "w") as f:
        for k, v in c2t.items():
            f.write(f"{k}\t{','.join(v)}\n")
    with open(wf_p, "w") as f:
        for k, v in wf.items():
            f.write(f"{k}\t{','.join(v)}\n")

    ref = RefBuilder(tok_wrap(tok), c2t_p, wf_p, max_given_constraints=3)
    mine = C.FiniteStateMachineBuilder(tok, C.load_wordforms(c2t_p),
                                       C.load_wordforms(wf_p),
                                       max_given_constraints=3)
    for constraints in [["dog"], ["dog", "cat"], ["fire hydrant", "dog"],
                        ["fire hydrant", "dog", "cat"]]:
        rf, rsub = ref.build(constraints)
        mf, msub = mine.build(constraints)
        assert rsub == msub
        np.testing.assert_array_equal(mf, rf.numpy())


def tok_wrap(tok):
    """reference builder expects a tokenizer w/ vocab_size + ids lookup."""
    class W:
        vocab_size = tok.vocab_size

        def convert_tokens_to_ids(self, toks):
            return tok.convert_tokens_to_ids(toks)
    return W()


def test_constraint_filter(tmp_path):
    hierarchy = {
        "LabelName": "Entity",
        "Subcategory": [
            {"LabelName": "Animal",
             "Subcategory": [{"LabelName": "Dog"}, {"LabelName": "Cat"}]},
            {"LabelName": "Car"},
        ],
    }
    p = tmp_path / "h.json"
    p.write_text(json.dumps(hierarchy))
    f = C.ConstraintFilter(str(p), nms_threshold=0.85,
                           max_given_constraints=3)
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60],
                      [0, 0, 9, 9]])
    names = ["dog", "animal", "car", "person"]
    scores = np.array([0.9, 0.8, 0.7, 0.99])
    out = f(boxes, names, scores)
    # person blacklisted.  NOTE reference NMS semantics: boxes with height
    # >= the current (finer) box are KEPT (utils_cbs.py:636-640), so the
    # coarser 'animal' survives despite full overlap with 'dog'.
    assert "person" not in out
    assert set(out) == {"dog", "car", "animal"}


def _tiny_builder():
    from vitcap_tpu.data.tokenization import BertTokenizer
    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    c2t = {"dog": ["dog"], "fire": ["fire"], "hydrant": ["hydrant"],
           "cat": ["cat"]}
    wf = {"dog": ["dog", "dogs"], "fire": ["fire"],
          "hydrant": ["hydrant", "hydrants"], "cat": ["cat", "cats"]}
    return C.FiniteStateMachineBuilder(tok, c2t, wf,
                                       max_given_constraints=3)


def test_sparse_builder_equals_dense():
    """build_sparse_fsm mirrors FiniteStateMachineBuilder.build op-for-op:
    densified sparse adjacency is bit-identical, incl. multi-word
    constraint sub-state chains and the reference's reset-row quirk."""
    b = _tiny_builder()
    for constraints in [[], ["dog"], ["dog", "cat"], ["fire hydrant"],
                        ["fire hydrant", "dog"],
                        ["fire hydrant", "dog", "cat"],
                        ["dog", "dog"]]:
        dense, _ = b.build(constraints)
        sparse = C.build_sparse_fsm(b, constraints)
        np.testing.assert_array_equal(sparse.densify(), dense,
                                      err_msg=str(constraints))


def test_dense_to_sparse_roundtrip():
    b = _tiny_builder()
    dense, _ = b.build(["fire hydrant", "dog"])
    np.testing.assert_array_equal(C.dense_to_sparse(dense).densify(), dense)


def test_sparse_search_matches_dense(ref_and_params):
    """The production sparse-FSM search returns the same beam sets and
    logprobs as the dense (S, S, V) search on the tiny model."""
    _, _, params = ref_and_params
    rng = np.random.RandomState(23)
    image, od_ids, seq_len = _decode_batch(rng)
    B = image.shape[0]
    fsm = _tiny_fsm(B, constraint_word_ids=[17, 42])
    opts = D.DecodeOptions(max_length=A,
                           od_labels_start_posid=TCFG.max_seq_a_len)

    dense = C.constrained_beam_search(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        jnp.asarray(fsm), TCFG, opts, beam_size=NB)

    sfsm = C.sparse_batch([C.dense_to_sparse(f) for f in fsm])
    sparse = C.constrained_beam_search_sparse(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        {k: jnp.asarray(v) for k, v in sfsm.items()}, TCFG, opts,
        beam_size=NB)

    d_ids = np.asarray(dense["ids"])
    d_lp = np.asarray(dense["logprobs"])
    s_ids = np.asarray(sparse["ids"])
    s_lp = np.asarray(sparse["logprobs"])
    for b in range(B):
        for s in range(NS):
            dm = {tuple(r): l for r, l in zip(d_ids[b, s], d_lp[b, s])}
            sm = {tuple(r): l for r, l in zip(s_ids[b, s], s_lp[b, s])}
            assert set(dm) == set(sm), (b, s, dm, sm)
            for k in dm:
                np.testing.assert_allclose(sm[k], dm[k], atol=1e-5)


def test_sparse_search_with_builder_fsm(ref_and_params):
    """Sparse vs dense on a REAL builder FSM (multi-word constraint ->
    sub-state chains, wordforms, S=32): beam sets per state match."""
    _, _, params = ref_and_params

    class _StubTok:       # word ids inside the tiny model's 128-vocab
        vocab_size = TCFG.vocab_size
        _map = {"dog": 17, "dogs": 18, "cat": 42, "cats": 43,
                "fire": 50, "hydrant": 51, "hydrants": 52}

        def convert_tokens_to_ids(self, toks):
            return [self._map.get(t, 3) for t in toks]

    b = C.FiniteStateMachineBuilder(
        _StubTok(),
        {"dog": ["dog"], "fire": ["fire"], "hydrant": ["hydrant"],
         "cat": ["cat"]},
        {"dog": ["dog", "dogs"], "fire": ["fire"],
         "hydrant": ["hydrant", "hydrants"], "cat": ["cat", "cats"]},
        max_given_constraints=3)
    rng = np.random.RandomState(24)
    image, od_ids, seq_len = _decode_batch(rng)
    B = image.shape[0]
    cons = [["fire hydrant", "dog"], ["dog", "cat"]]
    dense_fsms = [b.build(c)[0] for c in cons]
    sparse_fsms = [C.build_sparse_fsm(b, c) for c in cons]
    fsm = np.stack(dense_fsms)
    opts = D.DecodeOptions(max_length=A,
                           od_labels_start_posid=TCFG.max_seq_a_len)

    dense = C.constrained_beam_search(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        jnp.asarray(fsm), TCFG, opts, beam_size=NB)
    sfsm = C.sparse_batch(sparse_fsms)
    sparse = C.constrained_beam_search_sparse(
        params, jnp.asarray(image), jnp.asarray(od_ids),
        jnp.ones_like(jnp.asarray(od_ids)), jnp.asarray(seq_len),
        {k: jnp.asarray(v) for k, v in sfsm.items()}, TCFG, opts,
        beam_size=NB)

    S = fsm.shape[1]
    d_ids = np.asarray(dense["ids"])
    d_lp = np.asarray(dense["logprobs"])
    s_ids = np.asarray(sparse["ids"])
    s_lp = np.asarray(sparse["logprobs"])
    live = -1e10   # ignore dead/filler beams (different sentinels)
    for bi in range(B):
        for s in range(S):
            dm = {tuple(r): l for r, l in zip(d_ids[bi, s], d_lp[bi, s])
                  if l > live}
            sm = {tuple(r): l for r, l in zip(s_ids[bi, s], s_lp[bi, s])
                  if l > live}
            assert set(dm) == set(sm), (bi, s, dm, sm)
            for k in dm:
                np.testing.assert_allclose(sm[k], dm[k], atol=1e-5)
