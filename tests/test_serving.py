"""Dynamic-batching caption server (vitcap_tpu/serving.py) — the
production-serving analogue of the reference's prod_generate
(modeling_bert.py:1075-1202), batched TPU-style."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitcap_tpu.models import decode as D
from vitcap_tpu.models import vitcap as M
from vitcap_tpu.models.config import tiny_config
from vitcap_tpu.serving import CaptionServer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = (rng.randn(7, cfg.img_size, cfg.img_size, 3)
            .astype(np.float32) * 0.5)
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    direct = [np.asarray(
        D.prod_generate(params, jnp.asarray(im), cfg, opts)["ids"]
    ).reshape(-1, cfg.max_gen_length)[0] for im in imgs]
    return cfg, params, imgs, direct


def test_concurrent_submits_match_direct_decode(setup):
    """N client threads, batch 4 over 7 requests (full batch + padded
    tail) — every future must equal the single-image prod_generate ids
    (greedy rows are batch-independent, so padding must not leak)."""
    cfg, params, imgs, direct = setup
    with CaptionServer(params, cfg, batch_size=4,
                       max_delay_s=0.05) as server:
        futs = [None] * len(imgs)

        def client(i):
            futs[i] = server.submit(imgs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        results = [f.result(timeout=120) for f in futs]
        stats = server.stats()
    for got, want in zip(results, direct):
        np.testing.assert_array_equal(got["ids"], want)
    assert stats["requests"] == len(imgs)
    assert stats["batches"] >= 2          # 7 requests can't fit one batch


def test_single_request_resolves_without_followup_traffic(setup):
    """A lone request must resolve even with max_in_flight=2 (the
    batcher may not hold a dispatched batch while waiting for more)."""
    cfg, params, imgs, direct = setup
    with CaptionServer(params, cfg, batch_size=4, max_delay_s=0.001,
                       max_in_flight=2) as server:
        got = server.caption(imgs[0], timeout=120)
    np.testing.assert_array_equal(got["ids"], direct[0])


def test_tokenizer_and_close_semantics(setup):
    cfg, params, imgs, _ = setup

    class FakeTok:
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids if i != cfg.pad_token_id)

    server = CaptionServer(params, cfg, tokenizer=FakeTok(), batch_size=2)
    out = server.caption(imgs[0], timeout=120)
    assert isinstance(out["caption"], str) and 0 < out["conf"] <= 1.0
    server.close()
    server.close()                        # idempotent
    with pytest.raises(RuntimeError):
        server.submit(imgs[0])


def test_bad_input_raises(setup):
    cfg, params, imgs, _ = setup
    with CaptionServer(params, cfg, batch_size=2) as server:
        with pytest.raises(ValueError):
            server.submit(np.zeros((3, 3)))
