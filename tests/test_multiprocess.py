"""TRUE multi-process tests: two `jax.distributed` CPU processes (Gloo)
running the real code paths — global-mesh DP train step, per-rank predict
shards merged/deduped/reordered by rank 0, and the MASTER_ADDR/RANK env
plumbing (reference torch_common.py:125-142, uni_pipeline.py:782-850).

Round 1 exercised multi-"chip" only as a single process with 8 virtual
devices; these tests spawn actual peer processes (tests/mp_worker.py) and
compare against the single-process results computed in this process.
"""

import base64
import io
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(__file__)
VOCAB = "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(mode, workdir, world=2, timeout=900):
    port = str(_free_port())
    procs = []
    for rank in range(world):
        env = dict(os.environ)
        # the worker sets its own JAX env; scrub pytest's so nothing leaks
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"), mode,
             str(rank), str(world), port, workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return outs


def test_two_process_train_step_matches_single(tmp_path):
    """One DP train step across 2 processes x 2 virtual devices (global
    4-device mesh, grads psum over Gloo) == the same step single-process.
    Exercises ensure_init_distributed's env rendezvous, the multi-process
    shard_batch (host-local -> global array), and replicated param
    placement."""
    _spawn("step", str(tmp_path))
    mp = np.load(tmp_path / "mp_step.npz")

    # single-process reference, same fixed batch, all 8 rows local
    sys.path.insert(0, HERE)
    from mp_worker import fixed_batch
    import jax
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.parallel.mesh import make_mesh, shard_batch, \
        shard_params
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)
    cfg, batch = fixed_batch(8)
    mesh = make_mesh(n_data=8)
    params = shard_params(M.init_params(jax.random.PRNGKey(0), cfg), mesh)
    state = init_train_state(params, jax.random.PRNGKey(1))
    step_fn = make_jitted_train_step(cfg, TrainHyper(base_lr=1e-3,
                                                     max_iter=10), mesh)
    state, metrics = step_fn(state, shard_batch(batch, mesh))
    loss = float(metrics["loss"])
    flat = np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(state.params)])

    np.testing.assert_allclose(mp["loss"], loss, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mp["flat"], flat, rtol=2e-4, atol=1e-6)


@pytest.fixture()
def workdir(tmp_path):
    from vitcap_tpu.data.tsv import tsv_writer

    def b64(rng):
        from PIL import Image
        arr = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG")
        return base64.b64encode(buf.getvalue()).decode()

    d = tmp_path / "data" / "tinycoco"
    rng = np.random.RandomState(0)
    keys = [f"im{i}" for i in range(6)]
    caps = ["a dog runs", "a cat sits", "a man walks", "a bird flies",
            "a car drives", "a child plays"]
    for split in ["train", "test"]:
        tsv_writer(((k, "0", b64(rng)) for k in keys),
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
    enc = tmp_path / "tiny_encoder"
    enc.mkdir()
    cfgj = {"hidden_size": 32, "num_attention_heads": 4,
            "intermediate_size": 64, "num_hidden_layers": 2,
            "max_position_embeddings": 96, "type_vocab_size": 2,
            "vocab_size": 30522, "layer_norm_eps": 1e-12,
            "attention_probs_dropout_prob": 0.0}
    (enc / "config.json").write_text(json.dumps(cfgj))
    import shutil
    shutil.copy(VOCAB, enc / "vocab.txt")
    return tmp_path


def test_two_process_pipeline_predict_merge(workdir):
    """Full tiny train+predict+evaluate across 2 processes: rank-specific
    predict shards are concatenated, deduped (tail duplication from the
    distributed sampler) and reordered into dataset key order by rank 0;
    the merged predictions must equal a single-process predict from the
    SAME final checkpoint (greedy decode is deterministic)."""
    param = {
        "data": "tinycoco", "test_data": "tinycoco", "test_split": "test",
        "net": "tiny", "expid": "mp",
        "data_root": str(workdir / "data"),
        "output_root": str(workdir / "output"),
        "text_encoder_type": str(workdir / "tiny_encoder"),
        "train_crop_size": 32, "test_crop_size": 32,
        "max_seq_length": 26, "max_seq_a_length": 6, "max_gen_length": 6,
        "topk": 5, "split_blocks": 1, "decoder_layers": 2,
        "effective_batch_size": 4,   # 2 per rank; 4 rows on 4 global devs
        "test_batch_size": 2,
        "max_iter": 2, "snapshot_steps": 2, "log_step": 1,
        "base_lr": 1e-3, "drop_out": 0.0, "num_workers": 0,
        "encode": "bert",
        "pipeline_type": {
            "from":
                "src.pipelines.tagger_caption_uni_pipeline_expanding_bertemb",
            "import": "CaptionUniPipeline"},
    }
    (workdir / "param.json").write_text(json.dumps(param))
    _spawn("pipeline", str(workdir))

    out = workdir / "output" / "tinycoco_tiny_mp" / "snapshot"
    final = out / "model_iter_0000002.ckpt"
    assert final.is_file()
    preds = list(out.glob("*.predict.tsv"))
    assert len(preds) == 1, list(out.iterdir())
    rows = [l.split("\t") for l in
            preds[0].read_text().strip().split("\n")]
    # merged + deduped + reordered: exactly the 6 dataset keys in order
    assert [r[0] for r in rows] == [f"im{i}" for i in range(6)]
    # no leftover per-rank shard TSVs (the per-rank .speed.yaml reports
    # legitimately remain, reference uni_pipeline.py:804)
    assert not list(out.glob("*predict.tsv_*_*.tsv")), list(out.iterdir())

    # single-process predict from the same checkpoint must agree row-wise
    import run as R
    pip = R.create_pipeline(dict(param, expid="mp_sp"))
    sp_file = str(out / "sp.predict.tsv")
    pip.predict(str(final), sp_file)
    sp_rows = [l.split("\t") for l in
               open(sp_file).read().strip().split("\n")]
    assert [r[0] for r in sp_rows] == [r[0] for r in rows]
    for (k1, v1), (k2, v2) in zip(rows, sp_rows):
        c1 = json.loads(v1)[0]["caption"]
        c2 = json.loads(v2)[0]["caption"]
        assert c1 == c2, (k1, c1, c2)
