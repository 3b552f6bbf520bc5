"""Golden decode parity: vitcap_tpu scan-based cached decoding vs the
reference torch generate (which re-runs the full stack every step).

The tiny configs here always drive the reference into its 'infer' tag
branch (topk_len+20 > input len, modeling_bert.py:1433), so cfg uses
tag_attach='embedded'; train-branch ('raw') equivalence is covered by
test_model_parity.test_score_forward_parity.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models import decode as D
from vitcap_tpu.solver.checkpoint_bridge import load_params_from_torch

import reference_harness as RH

TCFG = tiny_config(max_seq_len=26, max_seq_a_len=6, topk=5,
                   hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                   max_gen_length=6, tag_attach="embedded")
OD_LEN = TCFG.max_seq_len - TCFG.max_seq_a_len   # 20
A = TCFG.max_gen_length                          # 6


@pytest.fixture(scope="module")
def ref_and_params():
    model, image_encoder, _ = RH.make_tiny_ref_vitcap(TCFG, seed=3)
    sd = RH.combined_state_dict(model, image_encoder)
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    params = M.init_params(jax.random.PRNGKey(0), TCFG)
    params, report = load_params_from_torch(params, sd_np)
    assert not report["shape_mismatch"] and not report["missing"]
    return model, image_encoder, params


def _decode_batch(rng, B=2, gen_len=None):
    A_ = gen_len or A
    image = rng.randn(B, TCFG.img_size, TCFG.img_size, 3).astype(np.float32)
    od_ids = rng.randint(4, TCFG.vocab_size, size=(B, OD_LEN)).astype(np.int32)
    n_od = np.array([OD_LEN, OD_LEN - 4], dtype=np.int32)[:B]
    seq_len = A_ + n_od
    for b in range(B):
        od_ids[b, n_od[b]:] = 0
    return image, od_ids, seq_len


def _ref_generate(model, image_encoder, image, od_ids, seq_len, num_beams,
                  gen_len=None, **kw):
    import torch
    A = gen_len or globals()["A"]
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
    token_type_ids = np.zeros((B, T), dtype=np.int64)
    token_type_ids[:, A:] = 1

    gen_kw = dict(
        do_sample=False,
        temperature=1.0,
        top_k=0,
        top_p=1.0,
        repetition_penalty=1,
        length_penalty=1,
    )
    gen_kw.update(kw)
    with torch.no_grad():
        img_feats = image_encoder(
            torch.from_numpy(image.transpose(0, 3, 1, 2)))
        out = model.generate(
            img_feats=img_feats,
            attention_mask=torch.from_numpy(full),
            masked_pos=torch.zeros(B, T, dtype=torch.long),
            token_type_ids=torch.from_numpy(token_type_ids),
            input_ids=torch.from_numpy(input_ids),
            is_decode=True,
            bos_token_id=TCFG.cls_token_id,
            pad_token_id=TCFG.pad_token_id,
            eos_token_ids=[TCFG.sep_token_id],
            mask_token_id=TCFG.mask_token_id,
            add_od_labels=True,
            od_labels_start_posid=TCFG.max_seq_a_len,
            max_length=A,
            num_beams=num_beams,
            num_return_sequences=1,
            num_keep_best=1,
            **gen_kw,
        )
    return out[0].numpy(), out[1].numpy()


def _my_generate(params, image, od_ids, seq_len, num_beams, rng=None,
                 gen_len=None, **kw):
    opts = D.DecodeOptions(max_length=gen_len or A, num_beams=num_beams,
                           od_labels_start_posid=TCFG.max_seq_a_len, **kw)
    tt = np.ones_like(od_ids)
    out = D.generate(params, jnp.asarray(image), jnp.asarray(od_ids),
                     jnp.asarray(tt), jnp.asarray(seq_len), TCFG, opts,
                     rng=rng)
    return np.array(out["ids"]), np.array(out["logprobs"])


def test_greedy_parity(ref_and_params):
    model, image_encoder, params = ref_and_params
    image, od_ids, seq_len = _decode_batch(np.random.RandomState(7))
    ref_ids, ref_lp = _ref_generate(model, image_encoder, image, od_ids,
                                    seq_len, num_beams=1)
    my_ids, my_lp = _my_generate(params, image, od_ids, seq_len, num_beams=1)
    np.testing.assert_array_equal(my_ids, ref_ids)
    np.testing.assert_allclose(my_lp, ref_lp, rtol=1e-3, atol=1e-4)


def test_beam_parity(ref_and_params):
    model, image_encoder, params = ref_and_params
    image, od_ids, seq_len = _decode_batch(np.random.RandomState(11))
    ref_ids, ref_lp = _ref_generate(model, image_encoder, image, od_ids,
                                    seq_len, num_beams=3)
    my_ids, my_lp = _my_generate(params, image, od_ids, seq_len, num_beams=3)
    np.testing.assert_array_equal(my_ids, ref_ids)
    np.testing.assert_allclose(my_lp, ref_lp, rtol=1e-3, atol=1e-4)


def test_repetition_penalty_greedy_parity(ref_and_params):
    """repetition_penalty != 1 (reference modeling_utils.py:797-807): ids
    and logprobs must track the reference's CTRL-style logit rescale of
    already-generated ids (incl. BOS and post-finish PAD)."""
    model, image_encoder, params = ref_and_params
    image, od_ids, seq_len = _decode_batch(np.random.RandomState(13))
    ref_ids, ref_lp = _ref_generate(model, image_encoder, image, od_ids,
                                    seq_len, num_beams=1,
                                    repetition_penalty=1.7)
    my_ids, my_lp = _my_generate(params, image, od_ids, seq_len, num_beams=1,
                                 repetition_penalty=1.7)
    np.testing.assert_array_equal(my_ids, ref_ids)
    np.testing.assert_allclose(my_lp, ref_lp, rtol=1e-3, atol=1e-4)


def test_repetition_penalty_beam_parity(ref_and_params):
    """Beam variant (reference modeling_utils.py:918-926): the membership
    mask must follow each beam's reordered prefix."""
    model, image_encoder, params = ref_and_params
    image, od_ids, seq_len = _decode_batch(np.random.RandomState(17))
    ref_ids, ref_lp = _ref_generate(model, image_encoder, image, od_ids,
                                    seq_len, num_beams=3,
                                    repetition_penalty=2.0)
    my_ids, my_lp = _my_generate(params, image, od_ids, seq_len, num_beams=3,
                                 repetition_penalty=2.0)
    np.testing.assert_array_equal(my_ids, ref_ids)
    np.testing.assert_allclose(my_lp, ref_lp, rtol=1e-3, atol=1e-4)


def test_beam_sample_low_temperature_parity(ref_and_params):
    """do_sample=True inside beam search (reference
    modeling_utils.py:948-966).  RNG streams differ (torch.multinomial vs
    Gumbel-top-2), so drive both into their deterministic limit with a
    tiny temperature: both draws per beam collapse to the top-2 of that
    beam's distribution and the whole decode — including the reference's
    scrambled beam-offset attribution — must match exactly."""
    import torch
    model, image_encoder, params = ref_and_params
    # gen_len=5, not the full 6: this tiny model's LAST-step top-2 logits
    # are near-tied (gap ~4e-4), so the deterministic limit fails there —
    # the two RNG schemes flip the d0/d1 draw and, through the reference's
    # scrambled attribution, the winning chain.  At gen_len=5 every step's
    # top-2 gap is wide and the whole decode (incl. final-step all-to-hyp
    # insertion) is seed-independent.
    image, od_ids, seq_len = _decode_batch(np.random.RandomState(19),
                                           gen_len=5)
    torch.manual_seed(0)
    ref_ids, ref_lp = _ref_generate(model, image_encoder, image, od_ids,
                                    seq_len, num_beams=3, gen_len=5,
                                    do_sample=True, temperature=0.003)
    my_ids, my_lp = _my_generate(params, image, od_ids, seq_len, num_beams=3,
                                 rng=jax.random.PRNGKey(23), gen_len=5,
                                 do_sample=True, temperature=0.003)
    np.testing.assert_array_equal(my_ids, ref_ids)
    # logprobs are len-normalized sums of temperature-scaled
    # log-softmaxes; tolerate the tiny-value f32 noise
    np.testing.assert_allclose(my_lp, ref_lp, rtol=1e-2, atol=1e-3)


def test_beam_sample_candidate_distribution():
    """Seeded statistical check of sample_beam_candidates: (a) the first
    draw of each beam is categorical(softmax(filtered logits)); (b) the
    two draws per beam are distinct (without replacement); (c) the beam
    offsets follow the reference's TILED pattern."""
    from vitcap_tpu.models.decode import sample_beam_candidates
    nb, V, N = 2, 7, 4000
    rs = np.random.RandomState(5)
    logits = jnp.asarray(rs.randn(nb, V), jnp.float32)  # B=1
    beam_scores = jnp.zeros((1, nb), jnp.float32)
    opts = D.DecodeOptions(do_sample=True, num_beams=nb)

    draw = jax.jit(lambda r: sample_beam_candidates(
        logits, beam_scores, r, nb, opts))
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    scores, idxs = jax.vmap(draw)(keys)     # (N, 1, 4)
    idxs = np.asarray(idxs)[:, 0, :]        # slots [b0d0, b0d1, b1d0, b1d1]
    scores = np.asarray(scores)[:, 0, :]

    # (c) tiled offsets: slot0 +0, slot1 +V, slot2 +0, slot3 +V
    words = np.stack([idxs[:, 0], idxs[:, 1] - V, idxs[:, 2],
                      idxs[:, 3] - V], axis=1)
    assert words.min() >= 0 and words.max() < V
    # (b) without replacement per beam row: d0 != d1
    assert (words[:, 0] != words[:, 1]).all()
    assert (words[:, 2] != words[:, 3]).all()
    # (a) first-draw marginal == softmax, 5-sigma band
    for beam, slot in ((0, 0), (1, 2)):
        p = np.exp(np.asarray(jax.nn.log_softmax(logits[beam])))
        freq = np.bincount(words[:, slot], minlength=V) / N
        sigma = np.sqrt(p * (1 - p) / N)
        np.testing.assert_array_less(np.abs(freq - p), 5 * sigma + 1e-9)
    # scores are that beam's log-softmax at the drawn word
    lp0 = np.asarray(jax.nn.log_softmax(logits[0]))
    np.testing.assert_allclose(scores[:, 0], lp0[words[:, 0]], rtol=1e-5,
                               atol=1e-6)


class TestFusedDecodeEngine:
    """Fused Pallas decode-step kernel (ops/decode_step.py) vs the XLA scan
    engine, interpret mode on CPU: ids must match exactly."""

    def _inputs(self):
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.config import tiny_config
        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        rs = np.random.RandomState(0)
        # B=4 so the kernel groups several images per grid cell, and
        # PER-IMAGE seq_len so each image carries a different od-validity
        # bias (a uniform seq_len masked a wrong-image bias read once)
        B = 4
        img = jnp.asarray(rs.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32)
        OD = cfg.max_seq_len - cfg.max_seq_a_len
        od = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, OD)), jnp.int32)
        sl = jnp.asarray([cfg.max_seq_a_len + (i % (OD + 1))
                          for i in range(B)], jnp.int32)
        return cfg, params, img, od, sl

    def _run(self, opts, backend):
        import os
        from vitcap_tpu.models import decode as D
        cfg, params, img, od, sl = self._inputs()
        old = os.environ.get("VITCAP_DECODE_FUSED")
        os.environ["VITCAP_DECODE_FUSED"] = backend
        try:
            return D.generate(params, img, od, None, sl, cfg, opts)
        finally:
            if old is None:
                os.environ.pop("VITCAP_DECODE_FUSED")
            else:
                os.environ["VITCAP_DECODE_FUSED"] = old

    def test_greedy_ids_match(self):
        from vitcap_tpu.models import decode as D
        cfg = self._inputs()[0]
        opts = D.DecodeOptions(max_length=cfg.max_seq_a_len,
                               od_labels_start_posid=cfg.max_seq_a_len)
        ref = self._run(opts, "0")
        out = self._run(opts, "interpret")
        np.testing.assert_array_equal(np.asarray(ref["ids"]),
                                      np.asarray(out["ids"]))
        np.testing.assert_allclose(np.asarray(ref["logprobs"]),
                                   np.asarray(out["logprobs"]),
                                   rtol=1e-4, atol=1e-5)

    def test_beam_ids_match(self):
        from vitcap_tpu.models import decode as D
        cfg = self._inputs()[0]
        opts = D.DecodeOptions(max_length=cfg.max_seq_a_len, num_beams=3,
                               num_keep_best=2,
                               od_labels_start_posid=cfg.max_seq_a_len)
        ref = self._run(opts, "0")
        out = self._run(opts, "interpret")
        np.testing.assert_array_equal(np.asarray(ref["ids"]),
                                      np.asarray(out["ids"]))
        np.testing.assert_allclose(np.asarray(ref["logprobs"]),
                                   np.asarray(out["logprobs"]),
                                   rtol=1e-4, atol=1e-5)


def test_int8_kv_cache_quant_close_to_exact():
    """kv_cache_quant='int8' (opt-in): greedy decode stays functionally
    intact and close to the exact path on tiny models."""
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import decode as D
    from vitcap_tpu.models.config import tiny_config
    cfg = tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    B = 2
    img = jnp.asarray(rs.randn(B, cfg.img_size, cfg.img_size, 3),
                      jnp.float32)
    OD = cfg.max_seq_len - cfg.max_seq_a_len
    od = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, OD)), jnp.int32)
    sl = jnp.full((B,), cfg.max_seq_a_len + 2, jnp.int32)
    opts = D.DecodeOptions(max_length=cfg.max_seq_a_len,
                           od_labels_start_posid=cfg.max_seq_a_len)
    exact = D.generate(params, img, od, None, sl, cfg, opts)
    quant = D.generate(params, img, od, None, sl,
                       cfg.replace(kv_cache_quant="int8"), opts)
    np.testing.assert_array_equal(np.asarray(exact["ids"]),
                                  np.asarray(quant["ids"]))
    np.testing.assert_allclose(np.asarray(exact["logprobs"]),
                               np.asarray(quant["logprobs"]),
                               rtol=2e-2, atol=2e-3)
    # beam path also runs under quantized caches
    opts_b = D.DecodeOptions(max_length=cfg.max_seq_a_len, num_beams=3,
                             num_keep_best=2,
                             od_labels_start_posid=cfg.max_seq_a_len)
    out_b = D.generate(params, img, od, None, sl,
                       cfg.replace(kv_cache_quant="int8"), opts_b)
    assert np.asarray(out_b["ids"]).shape == (B, 2, cfg.max_seq_a_len)


def test_exact_top_k_matches_lax():
    """exact_top_k (two-stage chunked, the beam-search hot op) ==
    lax.top_k including tie-breaking toward smaller indices."""
    from vitcap_tpu.models.decode import exact_top_k
    rs = np.random.RandomState(0)
    for shape, k in (((8, 9157), 6), ((4, 1000), 4), ((2, 513), 3),
                     ((3, 512), 2), ((1, 100), 5)):
        x = jnp.asarray(rs.randn(*shape), jnp.float32)
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = exact_top_k(x, k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # exact ties across chunk boundaries
    x = jnp.zeros((2, 2048)).at[:, [5, 600, 601, 1500]].set(3.0)
    v1, i1 = jax.lax.top_k(x, 5)
    v2, i2 = exact_top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
