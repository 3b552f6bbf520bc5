import os.path as op

import pytest

from vitcap_tpu.data.tokenization import BertTokenizer

VOCAB = "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt"

pytestmark = pytest.mark.skipif(not op.isfile(VOCAB),
                                reason="reference vocab not mounted")

SENTENCES = [
    "A man riding a wave on top of a surfboard.",
    "two dogs playing catch in the park!",
    "Ce n'est pas une pipe — café, naïve, résumé.",
    "weird   spacing\tand\nnewlines",
    "unicode: 你好 world 123",
    "[CLS] special [SEP] tokens [MASK] kept",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "a photo of 2,054 dimensions (vinvl) -- labels: 'dog', \"cat\"",
]


@pytest.fixture(scope="module")
def tok():
    return BertTokenizer.from_pretrained(op.dirname(VOCAB))


@pytest.fixture(scope="module")
def hf_tok():
    from transformers import BertTokenizer as HFTok
    return HFTok(VOCAB, do_lower_case=True)


def test_matches_huggingface(tok, hf_tok):
    for s in SENTENCES:
        assert tok.tokenize(s) == hf_tok.tokenize(s), s


def test_ids_roundtrip(tok, hf_tok):
    for s in SENTENCES:
        ids = tok.convert_tokens_to_ids(tok.tokenize(s))
        hf_ids = hf_tok.convert_tokens_to_ids(hf_tok.tokenize(s))
        assert ids == hf_ids, s


def test_special_token_ids(tok):
    # classic bert-base-uncased layout used by the reference configs
    assert tok.pad_token_id == 0
    assert tok.cls_token_id == 101
    assert tok.sep_token_id == 102
    assert tok.mask_token_id == 103
    assert tok.vocab_size == 30522


def test_decode(tok):
    ids = tok.convert_tokens_to_ids(
        ["[CLS]", "a", "man", "surf", "##board", ".", "[SEP]", "[PAD]"])
    assert tok.decode(ids) == "a man surfboard ."
    assert "[CLS]" in tok.decode(ids, skip_special_tokens=False)


def test_get_random_token(tok):
    for _ in range(10):
        t = tok.get_random_token()
        assert t in tok.vocab
