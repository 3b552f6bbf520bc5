"""demo_e2e.py: detections->constraints->CBS production path, tiny model."""

import json
import shutil
import sys

import numpy as np
import pytest

VOCAB = "/root/reference/yaml/VILT-L12-H784-uncased_16_384/vocab.txt"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo_e2e")
    enc = root / "enc"
    enc.mkdir()
    (enc / "config.json").write_text(json.dumps({
        "hidden_size": 32, "num_attention_heads": 4,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "max_position_embeddings": 96, "type_vocab_size": 2,
        "vocab_size": 30522, "layer_norm_eps": 1e-12,
        "attention_probs_dropout_prob": 0.0}))
    shutil.copy(VOCAB, enc / "vocab.txt")

    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (48, 64, 3), np.uint8))
    img.save(root / "photo.jpg")

    import jax
    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.config import ModelConfig
    cfg = ModelConfig(hidden_size=32, num_attention_heads=4,
                      intermediate_size=64, num_hidden_layers=2,
                      split_blocks=2,
                      vocab_size=30522, tag_vocab_size=30522,
                      max_position_embeddings=96, img_size=32)
    p = M.init_params(jax.random.PRNGKey(0), cfg)
    from vitcap_tpu.solver.checkpointing import save_state
    save_state(str(root / "model.ckpt"), {"params": p})

    det = {"detections": [
        {"class": "dog", "conf": 0.97, "rect": [0, 0, 30, 30]},
        {"class": "bench", "conf": 0.8, "rect": [5, 5, 40, 20]},
        {"class": "dog", "conf": 0.6, "rect": [1, 1, 29, 29]},
    ]}
    (root / "det.json").write_text(json.dumps(det))
    return root, enc


def test_demo_e2e_with_detections(setup):
    root, enc = setup
    import demo_e2e as DE
    cap = DE.main(["--checkpoint", str(root / "model.ckpt"),
                   "--image", str(root / "photo.jpg"),
                   "--detections", str(root / "det.json"),
                   "--encoder-dir", str(enc),
                   "--crop-size", "32", "--beams", "2",
                   "--min-constraints", "1"])
    assert isinstance(cap, str)


def test_demo_e2e_detector_free(setup):
    root, enc = setup
    import demo_e2e as DE
    cap = DE.main(["--checkpoint", str(root / "model.ckpt"),
                   "--image", str(root / "photo.jpg"),
                   "--encoder-dir", str(enc),
                   "--crop-size", "32", "--beams", "2",
                   "--min-constraints", "1", "--max-constraints", "2"])
    assert isinstance(cap, str)
