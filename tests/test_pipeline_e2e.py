"""End-to-end pipeline test: run.py surface -> train -> predict -> evaluate
on a tiny synthetic TSV dataset with a tiny model config."""

import base64
import io
import json
import os.path as op

import numpy as np
import pytest

VOCAB = "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt"


def _b64(rng):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)).save(
        buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    from vitcap_tpu.data.tsv import tsv_writer
    d = root / "data" / "tinycoco"
    rng = np.random.RandomState(0)
    keys = [f"im{i}" for i in range(6)]
    caps = ["a dog runs", "a cat sits", "a man walks", "a bird flies",
            "a car drives", "a child plays"]
    for split in ["train", "test"]:
        tsv_writer(((k, "0", _b64(rng)) for k in keys),
                   str(d / f"{split}.tsv"))
        tsv_writer(((k, json.dumps([{"height": 40, "width": 48}]))
                    for k in keys), str(d / f"{split}.hw.tsv"))
        tsv_writer(((k, json.dumps([{"caption": caps[i]}]))
                    for i, k in enumerate(keys)),
                   str(d / f"{split}.caption.tsv"))
        tsv_writer(((k, "1") for k in keys),
                   str(d / f"{split}.num_caption.tsv"))
        tsv_writer(((k, json.dumps([{"class": "dog", "conf": 0.9}]))
                    for k in keys), str(d / f"{split}.label.tsv"))
    # tiny text-encoder dir: tiny dims + the real vocab
    enc = root / "tiny_encoder"
    enc.mkdir()
    cfgj = {"hidden_size": 32, "num_attention_heads": 4,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "max_position_embeddings": 96, "type_vocab_size": 2,
            "vocab_size": 30522, "layer_norm_eps": 1e-12,
            "attention_probs_dropout_prob": 0.0}
    (enc / "config.json").write_text(json.dumps(cfgj))
    import shutil
    shutil.copy(VOCAB, enc / "vocab.txt")
    return root


def _param(workdir):
    return {
        "data": "tinycoco",
        "test_data": "tinycoco",
        "test_split": "test",
        "net": "tiny",
        "expid": "e2e",
        "data_root": str(workdir / "data"),
        "output_root": str(workdir / "output"),
        "text_encoder_type": str(workdir / "tiny_encoder"),
        "train_crop_size": 32,
        "test_crop_size": 32,
        "max_seq_length": 26,
        "max_seq_a_length": 6,
        "max_gen_length": 6,
        "topk": 5,
        "split_blocks": 1,
        "decoder_layers": 2,
        "effective_batch_size": 2,
        "test_batch_size": 2,
        "max_iter": 3,
        "snapshot_steps": 2,
        "log_step": 1,
        "base_lr": 1e-3,
        "drop_out": 0.0,
        "num_workers": 2,
        "encode": "bert",
        "mesh_data": 1,
        "pipeline_type": {
            "from": "src.pipelines.tagger_caption_uni_pipeline_expanding_bertemb",
            "import": "CaptionUniPipeline"},
    }


def test_train_eval_multi(workdir):
    import run as R
    param = _param(workdir)
    all_test = [{"test_data": "tinycoco", "test_split": "test"}]
    results = R.pipeline_train_eval_multi(all_test, param)

    out = workdir / "output" / "tinycoco_tiny_e2e"
    final = out / "snapshot" / "model_iter_0000003.ckpt"
    assert final.is_file()
    # intermediate snapshot at iter 2
    assert (out / "snapshot" / "model_iter_0000002.ckpt").is_file()
    assert (out / "snapshot" / "last_checkpoint").is_file()

    assert len(results) == 1 and results[0] is not None
    for k in ["Bleu_4", "CIDEr", "METEOR", "ROUGE_L"]:
        assert k in results[0]

    # predict tsv exists with 6 rows of {caption, conf}
    preds = list((out / "snapshot").glob("*.predict.tsv"))
    assert len(preds) == 1
    rows = [l.split("\t") for l in
            preds[0].read_text().strip().split("\n")]
    assert len(rows) == 6
    caps = json.loads(rows[0][1])
    assert "caption" in caps[0] and "conf" in caps[0]

    # re-run: everything cached (no retrain, same artifacts)
    results2 = R.pipeline_train_eval_multi(all_test, param)
    assert results2[0] == results[0]


def test_eval_multi_after_train(workdir):
    import run as R
    param = _param(workdir)
    all_test = [{"test_data": "tinycoco", "test_split": "test"}]
    results = R.pipeline_eval_multi(all_test, param)
    assert results and results[0] is not None


def test_eval_released_pt_checkpoint(workdir):
    """PARITY_RUNBOOK workflow: a reference-named torch `.pt` dropped into
    a fresh expid's snapshot dir as model_iter_*.pt is picked up by
    get_checkpoint_file's fallback and evaluated through the bridge —
    predictions must equal the native-checkpoint run's."""
    import run as R
    import torch
    from vitcap_tpu.solver.checkpointing import load_state
    from vitcap_tpu.solver.checkpoint_bridge import params_to_torch_state_dict

    # export the e2e-trained tiny model as a torch state dict
    pip0 = R.create_pipeline(
        {**_param(workdir), "test_data": "tinycoco", "test_split": "test"})
    state = load_state(pip0.get_checkpoint_file())
    params = state["params"] if "params" in state else state
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          params_to_torch_state_dict(params).items()}

    param = _param(workdir)
    param["expid"] = "released_pt"
    pip = R.create_pipeline(
        {**param, "test_data": "tinycoco", "test_split": "test"})
    assert not pip.is_train_finished()
    import os
    os.makedirs(pip.model_folder, exist_ok=True)
    pt = op.join(pip.model_folder, f"model_iter_{pip.max_iter:07d}.pt")
    torch.save(sd, pt)
    assert pip.get_checkpoint_file() == pt and pip.is_train_finished()

    results = R.pipeline_eval_multi(
        [{"test_data": "tinycoco", "test_split": "test"}], param)
    assert results and results[0] is not None and "CIDEr" in results[0]

    def captions(folder):
        preds = list((folder).glob("*.predict.tsv"))
        assert len(preds) == 1, preds
        return [l.split("\t")[1] for l in
                preds[0].read_text().strip().split("\n")]
    native = captions(workdir / "output" / "tinycoco_tiny_e2e" / "snapshot")
    bridged = captions(
        workdir / "output" / "tinycoco_tiny_released_pt" / "snapshot")
    assert bridged == native


def test_resume_from_snapshot(workdir):
    """Kill-and-resume: training restarts from the last snapshot."""
    import run as R
    param = _param(workdir)
    param["expid"] = "resume"
    param["max_iter"] = 4
    param["snapshot_steps"] = 2
    pip = R.create_pipeline(param)
    pip.ensure_train()
    out = workdir / "output" / "tinycoco_tiny_resume" / "snapshot"
    assert (out / "model_iter_0000004.ckpt").is_file()

    # delete the final; pointer at iter 2 -> resume trains only 2 more
    (out / "model_iter_0000004.ckpt").unlink()
    (out / "last_checkpoint").write_text(
        str(out / "model_iter_0000002.ckpt"))
    pip2 = R.create_pipeline(param)
    pip2.ensure_train()
    assert (out / "model_iter_0000004.ckpt").is_file()


def test_scst_pipeline(workdir):
    """SCST fine-tuning through the pipeline surface."""
    import run as R
    param = _param(workdir)
    param.update({"expid": "scst", "scst": True, "scst_num_return": 2,
                  "max_iter": 2, "snapshot_steps": 10,
                  "cider_cached_tokens": "corpus", "base_lr": 1e-4})
    pip = R.create_pipeline(param)
    pip.ensure_train()
    out = workdir / "output" / "tinycoco_tiny_scst" / "snapshot"
    assert (out / "model_iter_0000002.ckpt").is_file()


def test_vinvl_category_pipeline(workdir):
    """category='vinvl': 2027-way tag head + vinvl tagger tensorizer."""
    import run as R
    param = _param(workdir)
    param.update({"expid": "vinvl", "category": "vinvl",
                  "tokenizer_file": "./yaml/vinvl_label.json",  # exercises resolve_asset
                  "max_iter": 2, "snapshot_steps": 10})
    pip = R.create_pipeline(param)
    assert pip.model_cfg.tag_vocab_size == 2027
    tt = pip.tagger_tensorizer()
    out = tt.tensorize([{"class": "dog", "conf": 0.9}], "a dog runs")
    assert out["label"].shape == (2027,) and out["label"].sum() == 1
    pip.ensure_train()
    out_dir = workdir / "output" / "tinycoco_tiny_vinvl" / "snapshot"
    assert (out_dir / "model_iter_0000002.ckpt").is_file()


def test_tie_tag_weights_model():
    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    cfg = tiny_config(tie_tag_weights=True)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    assert "kernel" not in params["tag_logit"]["decoder"]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, cfg.img_size, cfg.img_size, 3),
                      jnp.float32)
    out = M.encode_images(params, img, cfg)
    assert out["tag_logits"].shape == (1, cfg.tag_vocab_size)


def test_train_with_grain_loader(workdir):
    """Same tiny train but through the Grain host pipeline
    (loader: grain)."""
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    param = _param(workdir)
    param["expid"] = "grain"
    param["loader"] = "grain"
    pip = CaptionUniPipeline(**param)
    pip.ensure_train()
    assert pip.is_train_finished()


def test_train_profiler_trace(workdir, tmp_path):
    """jax_profile_dir captures a device trace window during training."""
    import os
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    param = _param(workdir)
    param["expid"] = "prof"
    param["jax_profile_dir"] = str(tmp_path / "trace")
    param["jax_profile_start"] = 1
    param["jax_profile_steps"] = 1
    pip = CaptionUniPipeline(**param)
    pip.ensure_train()
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found += [f for f in files if f.endswith((".trace.json.gz", ".pb",
                                                  ".xplane.pb"))]
    assert found, "no profiler artifacts written"


def test_train_resume_orbax_backend(workdir):
    """Train with checkpoint_backend: orbax, interrupt, resume from the
    orbax snapshot (same flow as test_resume_from_snapshot)."""
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    param = _param(workdir)
    param["expid"] = "orbax"
    param["max_iter"] = 4
    param["snapshot_steps"] = 2
    param["checkpoint_backend"] = "orbax"
    pip = CaptionUniPipeline(**param)
    pip.ensure_train()
    assert pip.is_train_finished()
    import os.path as op
    assert op.isdir(op.join(pip.model_folder, "model_iter_0000004.orbax"))


def test_predict_local_data_parallel(workdir):
    """Prediction shards the batch over all local (virtual) devices when
    test_batch_size divides the device count; captions must match the
    single-device run."""
    import jax
    if jax.local_device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    import json as _json
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    from vitcap_tpu.data.tsv import tsv_reader
    base = _param(workdir)
    base["expid"] = "dp_predict"
    pip = CaptionUniPipeline(**base)
    pip.ensure_train()

    def captions(extra):
        p = dict(base, **extra)
        pp = CaptionUniPipeline(**p)
        f = pp.ensure_predict(pip.get_checkpoint_file())
        return {k: _json.loads(v)[0]["caption"] for k, v in tsv_reader(f)}

    multi = captions({"test_batch_size": jax.local_device_count(),
                      "full_expid": pip.full_expid})
    # force_predict: same artifact name, so the second run must recompute
    single = captions({"test_batch_size": 1, "full_expid": pip.full_expid,
                       "force_predict": True})
    assert multi == single


def test_sigterm_preemption_snapshot(workdir):
    """SIGTERM mid-training -> snapshot at the step boundary + SystemExit
    143; a fresh pipeline resumes from it and finishes."""
    import os
    import signal
    import run as R
    param = _param(workdir)
    param["expid"] = "preempt"
    param["max_iter"] = 50          # long enough that SIGTERM lands mid-run
    param["snapshot_steps"] = 1000  # no cadence snapshots: only preemption
    pip = R.create_pipeline(param)
    # deliver SIGTERM deterministically from inside the loop: the 2nd
    # batch-transfer call raises it in the main thread (jit-compile time
    # makes wall-clock timers flaky)
    orig = pip._device_train_batch
    calls = {"n": 0}

    def tripwire(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig(*a, **kw)

    pip._device_train_batch = tripwire
    with pytest.raises(SystemExit) as e:
        pip.ensure_train()
    assert e.value.code == 143
    pip._device_train_batch = orig
    out = workdir / "output" / "tinycoco_tiny_preempt" / "snapshot"
    snaps = sorted(out.glob("model_iter_*.ckpt"))
    assert snaps, "preemption snapshot missing"
    # resume completes the run from the snapshot
    param["max_iter"] = int(snaps[-1].name[len("model_iter_"):-5]) + 1
    pip2 = R.create_pipeline(param)
    pip2.ensure_train()
    assert (out / f"model_iter_{param['max_iter']:07d}.ckpt").is_file()


def test_cbs_predict_pipeline(workdir):
    """use_cbs predict through the pipeline (pipelined dispatch/drain +
    sparse-FSM search): every caption must contain a constraint word, and
    the sparse and dense paths must produce identical predict rows."""
    import json as _json
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    from vitcap_tpu.data.tsv import tsv_reader

    root = workdir
    # detected boxes for every test key: dog + cat, overlapping rects
    keys = [f"im{i}" for i in range(6)]
    boxes = root / "cbs_boxes.tsv"
    with open(boxes, "w") as f:
        for k in keys:
            dets = [{"class": "dog", "conf": 0.9, "rect": [0, 0, 10, 10]},
                    {"class": "cat", "conf": 0.8, "rect": [20, 20, 30, 30]}]
            f.write(f"{k}\t{_json.dumps(dets)}\n")
    hierarchy = root / "cbs_hierarchy.json"
    hierarchy.write_text(_json.dumps(
        {"LabelName": "Entity",
         "Subcategory": [{"LabelName": "Dog"}, {"LabelName": "Cat"}]}))
    c2t = root / "cbs_c2t.tsv"
    c2t.write_text("dog\tdog\ncat\tcat\n")
    wf = root / "cbs_wf.tsv"
    wf.write_text("dog\tdog,dogs\ncat\tcat,cats\n")

    base = _param(workdir)
    base["expid"] = "cbs_predict"
    pip = CaptionUniPipeline(**base)
    pip.ensure_train()

    def rows(extra):
        p = dict(base, use_cbs=True, cbs_boxes_tsv=str(boxes),
                 cbs_hierarchy_json=str(hierarchy),
                 cbs_constraint2tokens_tsv=str(c2t),
                 cbs_wordforms_tsv=str(wf), min_constraints_to_satisfy=1,
                 full_expid=pip.full_expid, **extra)
        pp = CaptionUniPipeline(**p)
        f = pp.ensure_predict(pip.get_checkpoint_file())
        return {k: _json.loads(v) for k, v in tsv_reader(f)}

    sparse = rows({})
    assert set(sparse) == set(keys)
    for caps in sparse.values():
        assert caps and "caption" in caps[0] and "conf" in caps[0]
    # dense path must agree row for row (force_predict recomputes into the
    # same artifact)
    dense = rows({"cbs_sparse": 0, "force_predict": True})
    assert dense == sparse
    # local data-parallel CBS: batch shards across all virtual devices
    # (the round-2 `not use_cbs` mesh exclusion is lifted — every search
    # input incl. the sparse-FSM descriptors is batch-leading); captions
    # must match the single-device sparse run
    import jax
    if jax.local_device_count() > 1:
        dp = rows({"test_batch_size": jax.local_device_count(),
                   "force_predict": True})
        assert dp == sparse


def test_predict_speed_breakdown(workdir):
    """speed_breakdown: 1 adds the per-stage device-time table to the
    .speed.yaml (jit-era ForwardPassTimeChecker equivalent)."""
    import yaml
    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    param = _param(workdir)
    param["expid"] = "speedtab"
    param["speed_breakdown"] = 1
    pip = CaptionUniPipeline(**param)
    pip.ensure_train()
    f = pip.ensure_predict(pip.get_checkpoint_file())
    with open(f + ".speed.yaml") as fh:
        info = yaml.safe_load(fh)
    mt = info["module_time"]
    for k in ("vision_tags_ms", "vision_per_block_ms", "prefill_ms",
              "decode_scan_ms", "decode_per_step_ms",
              "full_generate_ms", "device_caps_per_s"):
        assert k in mt, (k, mt)
    assert mt["full_generate_ms"] >= mt["vision_tags_ms"] > 0
