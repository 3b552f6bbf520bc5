"""Data layer tests: tensorizer golden parity vs the reference, synthetic
TSV dataset -> transform chain -> loader end-to-end."""

import base64
import io
import json
import random

import numpy as np
import pytest

import reference_harness as RH

VOCAB_DIR = "/root/reference/yaml/VILT-L12-H784-uncased_16_384"


@pytest.fixture(scope="module")
def tokenizer():
    from vitcap_tpu.data.tokenization import BertTokenizer
    return BertTokenizer(VOCAB_DIR + "/vocab.txt")


@pytest.fixture(scope="module")
def ref_tokenizer():
    RH.install()
    from src.layers.bert import BertTokenizer as RefTok
    return RefTok(VOCAB_DIR + "/vocab.txt", do_lower_case=True)


CAPTION = "A big brown dog runs across the grassy field near trees."


def test_tensorize_ab_parity_train(tokenizer, ref_tokenizer):
    from vitcap_tpu.data.tensorizers import CaptionTensorizer
    from src.data_layer.dataset import CaptionTensorizer as RefTensorizer

    ref = RefTensorizer(ref_tokenizer, max_img_seq_length=0,
                        max_seq_length=70, max_seq_a_length=20,
                        mask_prob=0.15, max_masked_tokens=3,
                        mask_type="seq2seq", is_train=True, mask_b=False)
    mine = CaptionTensorizer(tokenizer, max_seq_length=70,
                             max_seq_a_length=20, mask_prob=0.15,
                             max_masked_tokens=3, is_train=True,
                             rng=random)

    for seed in range(5):
        random.seed(seed)
        r = ref.tensorize_ab(CAPTION, text_b="")
        random.seed(seed)
        m = mine.tensorize_ab(CAPTION, text_b="")
        np.testing.assert_array_equal(m["input_ids"],
                                      r["origin_input_ids"].numpy() * 0
                                      + np.asarray(
                                          tokenizer.convert_tokens_to_ids(
                                              ref_tokenizer.convert_ids_to_tokens(
                                                  r["input_ids"].tolist()))))
        np.testing.assert_array_equal(m["masked_pos"],
                                      r["masked_pos"].numpy())
        np.testing.assert_array_equal(m["masked_ids"],
                                      r["masked_ids"].numpy())
        np.testing.assert_array_equal(m["segment_ids"],
                                      r["segment_ids"].numpy())
        # dense mask parity
        dm = mine.dense_text_mask(int(m["seq_a_len"]), int(m["seq_len"]))
        np.testing.assert_array_equal(dm, r["attention_mask"].numpy())


def test_tensorize_ab_parity_test_mode(tokenizer, ref_tokenizer):
    from vitcap_tpu.data.tensorizers import CaptionTensorizer
    from src.data_layer.dataset import CaptionTensorizer as RefTensorizer
    ref = RefTensorizer(ref_tokenizer, max_img_seq_length=0,
                        max_seq_length=70, max_seq_a_length=20,
                        is_train=False)
    mine = CaptionTensorizer(tokenizer, max_seq_length=70,
                             max_seq_a_length=20, is_train=False)
    r = ref.tensorize_ab("", text_b="", real_text_a_in_test=False)
    m = mine.tensorize_ab("", text_b="")
    np.testing.assert_array_equal(m["input_ids"], r["input_ids"].numpy())
    np.testing.assert_array_equal(m["segment_ids"], r["segment_ids"].numpy())
    assert int(m["seq_a_len"]) == 20 and int(m["seq_len"]) == 20


def test_tagger_tensorizer_bert_mode(tokenizer):
    from vitcap_tpu.data.tensorizers import CaptionTaggerTensorizer
    tt = CaptionTaggerTensorizer(tokenizer, threshold=0.2, encode="bert")
    labels = [{"class": "dog", "conf": 0.9},
              {"class": "grass", "conf": 0.1}]     # below threshold
    out = tt.tensorize(labels, "a dog runs")
    lab = out["label"]
    assert lab[tokenizer.vocab["dog"]] == 1
    assert lab[tokenizer.vocab["grass"]] == 0
    assert lab[tokenizer.vocab["runs"]] == 1
    assert lab.sum() >= 3


def _png_b64(rgb):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """data/<name>/{train.tsv, train.hw.tsv, train.caption.tsv,
    train.num_caption.tsv, train.label.tsv}"""
    root = tmp_path_factory.mktemp("data")
    from vitcap_tpu.data.tsv import tsv_writer
    name, split = "synthcoco", "train"
    d = root / name
    rng = np.random.RandomState(0)
    n = 6
    keys = [f"img{i}" for i in range(n)]
    tsv_writer(((k, "0", _png_b64(rng.randint(0, 255, (48, 64, 3),
                                              dtype=np.uint8)))
                for k in keys), str(d / f"{split}.tsv"))
    tsv_writer(((k, json.dumps([{"height": 48, "width": 64}]))
                for k in keys), str(d / f"{split}.hw.tsv"))
    tsv_writer(((k, json.dumps([{"caption": f"a dog number {i}"},
                                {"caption": f"another dog {i}"}]))
                for i, k in enumerate(keys)), str(d / f"{split}.caption.tsv"))
    tsv_writer(((k, "2") for k in keys),
               str(d / f"{split}.num_caption.tsv"))
    tsv_writer(((k, json.dumps([{"class": "dog", "conf": 0.95},
                                {"class": "tree", "conf": 0.4}]))
                for k in keys), str(d / f"{split}.label.tsv"))
    return str(root), name, split


def test_full_train_chain(synth_dataset, tokenizer):
    root, name, split = synth_dataset
    from vitcap_tpu.data.dataset import (
        BatchSampler, CaptionIdxTSVDataset, Compose, DataLoader,
        DatasetPlusTransform, DistributedSampler, IdentifyTextAB,
        IterationBasedBatchSampler, LoadCaption, LoadHW, LoadImage,
        LoadLabel, RemoveUselessKeys, RenameKey, TagTensorize,
        TransCaptionTensorizer)
    from vitcap_tpu.data.tensorizers import (
        CaptionTaggerTensorizer, CaptionTensorizer)
    from vitcap_tpu.data.transforms import TrainImageTransform

    idx_ds = CaptionIdxTSVDataset(name, split, data_root=root)
    assert len(idx_ds) == 12                     # 6 images x 2 captions

    chain = Compose([
        LoadHW(name, split, data_root=root),
        LoadImage(name, split,
                  image_transform=TrainImageTransform(crop_size=32, seed=0),
                  data_root=root),
        LoadCaption(name, split, data_root=root),
        LoadLabel(name, split, data_root=root),
        IdentifyTextAB(False, 0.2),
        TransCaptionTensorizer(CaptionTensorizer(
            tokenizer, max_seq_length=70, max_seq_a_length=20,
            rng=random.Random(0))),
        TagTensorize(CaptionTaggerTensorizer(tokenizer, encode="bert")),
        RemoveUselessKeys(["caption", "text_a", "text_b", "height", "width",
                           "idx", "idx_img", "idx_cap"]),
        RenameKey({"segment_ids": "token_type_ids"}),
    ])
    ds = DatasetPlusTransform(idx_ds, chain)
    sampler = DistributedSampler(ds, num_replicas=2, rank=0, shuffle=True)
    bs = BatchSampler(sampler, batch_size=3, drop_last=True)
    ibs = IterationBasedBatchSampler(bs, num_iterations=4)
    loader = DataLoader(ds, ibs, num_workers=2)

    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (3, 32, 32, 3)
    assert b["input_ids"].shape == (3, 70)
    assert b["token_type_ids"].shape == (3, 70)
    assert b["label"].shape[1] == tokenizer.vocab_size
    assert b["masked_ids"].shape == (3, 3)
    # text_b is empty in the live pipeline -> seq_len == seq_a_len
    np.testing.assert_array_equal(b["seq_len"], b["seq_a_len"])
    assert (b["label"].sum(1) >= 1).all()


def test_image_idx_dataset(synth_dataset):
    root, name, split = synth_dataset
    from vitcap_tpu.data.dataset import ImageIdxTSVDataset
    ds = ImageIdxTSVDataset(name, split, data_root=root)
    assert len(ds) == 6
    assert ds[2]["key"] == "img2"
    assert ds.get_keys() == [f"img{i}" for i in range(6)]


def test_distributed_sampler_covers_all():
    from vitcap_tpu.data.dataset import DistributedSampler

    class FakeDS:
        def __len__(self):
            return 10

    got = []
    for r in range(3):
        s = DistributedSampler(FakeDS(), num_replicas=3, rank=r,
                               shuffle=True)
        s.set_epoch(1)
        idx = list(s)
        assert len(idx) == 4                      # ceil(10/3) = 4
        got += idx
    assert set(got) == set(range(10))             # tail duplicated, all seen


def test_precomputed_tags_tool_and_tensorizer(tmp_path):
    """tools/precompute_tags.py writes the caption_tags sidecar;
    LoadCaptionTags + encode='precomputed' reproduce the online nltk path
    (the fallback tagger, since this image has no nltk corpora)."""
    import json as _json
    import sys
    from vitcap_tpu.data.tsv import tsv_writer, TSVSplitProperty
    from vitcap_tpu.data.dataset import LoadCaptionTags, TagTensorize
    from vitcap_tpu.data.tensorizers import CaptionTaggerTensorizer
    from vitcap_tpu.data.tokenization import BertTokenizer

    d = tmp_path / "data" / "tiny"
    caps = [("k0", _json.dumps([{"caption": "a dog runs"},
                                {"caption": "two cats sleep"}])),
            ("k1", _json.dumps([{"caption": "a red car"}]))]
    tsv_writer(caps, str(d / "train.caption.tsv"))

    sys.path.insert(0, "/root/repo/tools")
    import precompute_tags
    out = precompute_tags.main(["--data", "tiny", "--split", "train",
                                "--data-root", str(tmp_path / "data")])
    rows = list(TSVSplitProperty("tiny", "train", "caption_tags",
                                 data_root=str(tmp_path / "data")))
    assert rows[0][0] == "k0"
    per_cap = _json.loads(rows[0][1])
    assert per_cap[0] == ["a", "dog", "runs"]      # fallback: all-NN

    tok = BertTokenizer(
        "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt")
    online = CaptionTaggerTensorizer(tok, encode="nltk")
    offline = CaptionTaggerTensorizer(tok, encode="precomputed")
    data = {"idx_img": 0, "idx_cap": 1, "label": [],
            "caption": {"caption": "two cats sleep"}}
    LoadCaptionTags("tiny", "train",
                    data_root=str(tmp_path / "data"))(data)
    assert data["caption_tags"] == ["two", "cats", "sleep"]
    got = TagTensorize(offline)(dict(data))["label"]
    want = online.tensorize([], "two cats sleep")["label"]
    np.testing.assert_array_equal(got, want)


def test_pert_collate_itm_negatives():
    from vitcap_tpu.data.dataset import pert_collate
    rng = np.random.RandomState(0)
    samples = [{"image": np.full((2, 2), i, np.float32), "cap": i}
               for i in range(8)]
    out = pert_collate(samples, prob=0.5, rng=rng)
    assert out["image"].shape == (8, 2, 2)
    assert out["matched"].dtype == bool
    # rows beyond the shuffle window always match
    assert out["matched"][5:].all()
    # shuffled rows: matched iff the image landed back on its own slot
    for i in range(8):
        assert out["matched"][i] == (out["image"][i, 0, 0] == i)


def test_empty_epoch_sampler_raises():
    """batch_size > dataset with drop_last yields zero batches per epoch;
    the iteration-based sampler must raise instead of spinning forever."""
    import pytest
    from vitcap_tpu.data.dataset import (
        BatchSampler, DistributedSampler, IterationBasedBatchSampler)

    class _DS:
        def __len__(self):
            return 6

    sampler = DistributedSampler(_DS(), num_replicas=1, rank=0,
                                 shuffle=False)
    bs = BatchSampler(sampler, batch_size=8, drop_last=True)
    ibs = IterationBasedBatchSampler(bs, num_iterations=3)
    with pytest.raises(RuntimeError, match="no batches"):
        list(ibs)


class TestUint8Feed:
    """uint8 image feed: normalization folded into the patch projection
    (models/layers.py patch_embed) must equal the host-normalized float
    path, end to end through encode_images."""

    def test_patch_embed_fold_matches_host_normalize(self, rng):
        import jax
        import jax.numpy as jnp
        from vitcap_tpu.models.layers import patch_embed, patchify_host

        P, C, H = 16, 3, 32
        kernel = jnp.asarray(rng.randn(P, P, C, H), jnp.float32) * 0.02
        bias = jnp.asarray(rng.randn(H), jnp.float32) * 0.02
        p = {"kernel": kernel, "bias": bias}
        raw = rng.randint(0, 256, (2, 64, 64, C)).astype(np.uint8)

        # host path: normalize + patchify, float32 feed
        norm = (raw.astype(np.float32) / 255.0 - 0.5) / 0.5
        host = np.stack([patchify_host(x, P) for x in norm])
        y_host = patch_embed(p, jnp.asarray(host))

        # device path: raw bytes, folded normalization
        y_dev = patch_embed(p, jnp.asarray(raw), compute_dtype=jnp.float32)

        np.testing.assert_allclose(np.asarray(y_dev), np.asarray(y_host),
                                   rtol=2e-5, atol=2e-6)

    def test_transform_emit_uint8_matches_float(self):
        from PIL import Image
        from vitcap_tpu.data.transforms import TestImageTransform
        rng = np.random.RandomState(3)
        img = Image.fromarray(
            rng.randint(0, 255, (100, 80, 3), dtype=np.uint8))
        t_f = TestImageTransform(crop_size=64, crop_pct=0.875)
        t_u = TestImageTransform(crop_size=64, crop_pct=0.875,
                                 emit_uint8=True)
        f = t_f(img)
        u = t_u(img)
        assert u.dtype == np.uint8 and u.shape == (64, 64, 3)
        np.testing.assert_allclose(
            f, (u.astype(np.float32) / 255.0 - 0.5) / 0.5, rtol=0, atol=0)

    def test_encode_images_uint8_matches_float(self, rng):
        import jax
        import jax.numpy as jnp
        from vitcap_tpu.models.config import tiny_config
        from vitcap_tpu.models import vitcap as M
        from vitcap_tpu.models.layers import patchify_host

        cfg = tiny_config()
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        raw = rng.randint(0, 256,
                          (2, cfg.img_size, cfg.img_size, 3)).astype(np.uint8)
        norm = (raw.astype(np.float32) / 255.0 - 0.5) / 0.5
        host = np.stack([patchify_host(x, cfg.patch_size) for x in norm])

        out_f = M.encode_images(params, jnp.asarray(host), cfg)
        out_u = M.encode_images(params, jnp.asarray(raw), cfg)
        np.testing.assert_allclose(np.asarray(out_u["visual"]),
                                   np.asarray(out_f["visual"]),
                                   rtol=1e-4, atol=1e-5)
        assert np.array_equal(np.asarray(out_u["pred_topk"]),
                              np.asarray(out_f["pred_topk"]))


class TestNativeImage:
    """Fused C++ decode+resize+crop (data/native_image.py) vs the PIL
    reference path (transforms.py TestImageTransform)."""

    @staticmethod
    def _jpeg(h, w, seed=0, quality=90):
        import io
        from PIL import Image
        rng = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([(np.sin(xx / 37.0) + 1) * 110 + rng.randn(h, w) * 6,
                        (np.cos(yy / 23.0) + 1) * 100 + rng.randn(h, w) * 6,
                        ((xx + yy) % 251) / 250.0 * 200
                        + rng.randn(h, w) * 6], -1)
        buf = io.BytesIO()
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)) \
            .save(buf, "JPEG", quality=quality)
        return buf.getvalue()

    def _pil_ref(self, data, crop, crop_pct):
        import io
        from PIL import Image
        from vitcap_tpu.data.transforms import TestImageTransform
        t = TestImageTransform(crop_size=crop, crop_pct=crop_pct,
                               emit_uint8=True, backend="pil")
        return t(Image.open(io.BytesIO(data)).convert("RGB"))

    def test_exact_mode_bit_exact(self):
        from vitcap_tpu.data import native_image as NI
        if not NI.available():
            pytest.skip("native imageproc toolchain unavailable")
        for (h, w), crop, pct in [((480, 640), 384, 1.0),
                                  ((500, 500), 384, 1.0),
                                  ((300, 200), 128, 0.875),
                                  ((640, 480), 224, 0.9)]:
            data = self._jpeg(h, w, seed=h + w)
            from vitcap_tpu.data.transforms import TestImageTransform
            t = TestImageTransform(crop_size=crop, crop_pct=pct,
                                   emit_uint8=True, backend="native")
            out = t.from_jpeg_bytes(data)
            ref = self._pil_ref(data, crop, pct)
            assert out is not None
            np.testing.assert_array_equal(out, ref)

    def test_fast_mode_close(self):
        from vitcap_tpu.data import native_image as NI
        if not NI.available():
            pytest.skip("native imageproc toolchain unavailable")
        data = self._jpeg(1200, 1600)
        out = NI.decode_resize_center_crop(data, 384, 384, fast=True)
        ref = self._pil_ref(data, 384, 1.0)
        assert out.shape == ref.shape
        d = np.abs(out.astype(int) - ref.astype(int))
        assert d.mean() < 1.5 and (d > 25).mean() < 1e-3

    def test_normalized_output_matches_pil_path(self):
        from vitcap_tpu.data import native_image as NI
        if not NI.available():
            pytest.skip("native imageproc toolchain unavailable")
        import io
        from PIL import Image
        from vitcap_tpu.data.transforms import TestImageTransform
        data = self._jpeg(240, 320)
        tn = TestImageTransform(crop_size=128, backend="native")
        tp = TestImageTransform(crop_size=128, backend="pil")
        a = tn.from_jpeg_bytes(data)
        b = tp(Image.open(io.BytesIO(data)).convert("RGB"))
        assert a.dtype == np.float32
        np.testing.assert_array_equal(a, b)

    def test_non_jpeg_falls_back(self):
        import io
        from PIL import Image
        from vitcap_tpu.data.transforms import TestImageTransform
        buf = io.BytesIO()
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, "PNG")
        t = TestImageTransform(crop_size=32, emit_uint8=True,
                               backend="native")
        assert t.from_jpeg_bytes(buf.getvalue()) is None  # caller -> PIL

    def test_loadimage_integration(self, tmp_path):
        """LoadImage routes JPEG rows through the native path and matches
        the PIL-backend pipeline output exactly."""
        import base64
        from vitcap_tpu.data.tsv import tsv_writer
        from vitcap_tpu.data.dataset import LoadImage
        from vitcap_tpu.data.transforms import TestImageTransform
        data_root = tmp_path
        d = data_root / "demo"
        d.mkdir(parents=True)
        rows = [[f"k{i}",
                 base64.b64encode(self._jpeg(200 + 10 * i, 300)).decode()]
                for i in range(3)]
        tsv_writer(rows, str(d / "test.tsv"))
        outs = {}
        for backend in ("native", "pil"):
            t = TestImageTransform(crop_size=96, emit_uint8=True,
                                   backend=backend)
            li = LoadImage("demo", "test", image_transform=t,
                           data_root=str(data_root))
            outs[backend] = [li({"idx_img": i})["image"] for i in range(3)]
        for a, b in zip(outs["native"], outs["pil"]):
            np.testing.assert_array_equal(a, b)
