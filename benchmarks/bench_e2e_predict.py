"""End-to-end predict throughput from REAL bytes (VERDICT round-1 #4).

Measures captions/sec from base64-JPEG TSV rows to predict.tsv through the
actual pipeline predict path — JPEG decode, resize/crop, host patchify, tag
tensorization, batching (N loader workers), device decode, tokenizer
detokenize, TSV write — i.e. everything `ensure_predict` does except
checkpoint load.  Compare against bench.py's device-only greedy line to see
the host-input-pipeline tax.

Flagship geometry: ViT-B/16-384, seq 70 / seq_a 20 / topk 50 (the live
YAML layout, reference TaxCocoCaption vit_base_patch16_384 recipe).

Usage: python benchmarks/bench_e2e_predict.py
           [--n 256] [--batch 64] [--workers 8] [--loader thread|grain]
Prints one JSON line.
"""

import argparse
import base64
import io
import json
import os
import os.path as op
import shutil
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from vitcap_tpu.utils.common import asset_path

VOCAB = asset_path("VILT-L12-H784-uncased_16_384", "vocab.txt")
CLASSES = ["dog", "cat", "car", "person", "tree", "house", "bird", "chair",
           "table", "horse", "boat", "train", "bottle", "plant", "sheep"]


def make_dataset(root: str, n: int, size: int = 500) -> None:
    """n base64-JPEG rows at real camera-ish resolution (size x size)."""
    from PIL import Image
    from vitcap_tpu.data.tsv import tsv_writer
    d = op.join(root, "data", "benchcoco")
    rng = np.random.RandomState(0)
    keys = [f"im{i}" for i in range(n)]

    def rows():
        for k in keys:
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            yield k, "0", base64.b64encode(buf.getvalue()).decode()

    tsv_writer(rows(), op.join(d, "test.tsv"))
    tsv_writer(((k, json.dumps([{"height": size, "width": size}]))
                for k in keys), op.join(d, "test.hw.tsv"))
    tsv_writer(((k, json.dumps([{"class": c, "conf": 0.9}
                                for c in rng.choice(CLASSES, 8,
                                                    replace=False)]))
                for k in keys), op.join(d, "test.label.tsv"))
    tsv_writer(((k, json.dumps([{"caption": "a thing"}])) for k in keys),
               op.join(d, "test.caption.tsv"))
    tsv_writer(((k, "1") for k in keys),
               op.join(d, "test.num_caption.tsv"))


def make_encoder_dir(root: str) -> str:
    """bert-base config.json + the real vocab (full-size text stack)."""
    enc = op.join(root, "bert_base_encoder")
    os.makedirs(enc, exist_ok=True)
    cfg = {"hidden_size": 768, "num_attention_heads": 12,
           "intermediate_size": 3072, "num_hidden_layers": 12,
           "max_position_embeddings": 512, "type_vocab_size": 2,
           "vocab_size": 30522, "layer_norm_eps": 1e-12,
           "attention_probs_dropout_prob": 0.1}
    with open(op.join(enc, "config.json"), "w") as f:
        json.dump(cfg, f)
    shutil.copy(VOCAB, op.join(enc, "vocab.txt"))
    return enc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--loader", default="thread",
                    choices=["thread", "grain"])
    ap.add_argument("--root", default="/tmp/vitcap_e2e_bench")
    args = ap.parse_args()

    stamp = op.join(args.root, f"ready_{args.n}")
    if not op.exists(stamp):
        make_dataset(args.root, args.n)
        open(stamp, "w").close()
    enc = make_encoder_dir(args.root)

    from vitcap_tpu.pipelines.caption_pipeline import CaptionUniPipeline
    from vitcap_tpu.utils.meters import MetricLogger
    from vitcap_tpu.data.tsv import tsv_writer

    param = {
        "data": "benchcoco", "test_data": "benchcoco",
        "test_split": "test",
        "net": "TaxCocoCaption_B_Vit16",
        "expid": "e2ebench",
        "data_root": op.join(args.root, "data"),
        "output_root": op.join(args.root, "output"),
        "text_encoder_type": enc,
        "image_encoder_type": "VitEmb_vit_base_patch16_384",
        "test_crop_size": 384,
        "train_crop_size": 384,
        "max_seq_length": 70,
        "max_seq_a_length": 20,
        "max_gen_length": 20,
        "topk": 50,
        "split_blocks": 4,
        "decoder_layers": 4,
        "test_batch_size": args.batch,
        "num_workers": args.workers,
        "encode": "bert",
        "pad_to_max": True,
        "fp16": True,
    }
    if args.loader == "grain":
        param["loader"] = "grain"
        param["grain_workers"] = args.workers

    pipe = CaptionUniPipeline(**param)
    pipe._ensure_initialized()

    import jax
    from vitcap_tpu.models import vitcap as M
    params = M.init_params(jax.random.PRNGKey(0), pipe.model_cfg)

    out_tsv = op.join(args.root, "predict.tsv")

    def one_pass():
        dataset = pipe.get_dataset(is_train=False)
        loader = pipe.get_data_loader(is_train=False, dataset=dataset)
        meters = MetricLogger()
        tsv_writer(pipe.predict_iter(loader, params, meters), out_tsv)
        return meters

    one_pass()                       # warm-up: compile + worker spin-up
    t0 = time.perf_counter()
    meters = one_pass()
    dt = time.perf_counter() - t0
    rate = args.n / dt

    with open(out_tsv) as f:
        rows = sum(1 for _ in f)
    assert rows == args.n, (rows, args.n)

    print(json.dumps({
        "metric": (f"e2e predict captions/sec/chip (real JPEG bytes, "
                   f"B={args.batch}, {args.loader} x{args.workers})"),
        "value": round(rate, 2),
        "unit": "captions/s",
        "detail": str(meters),
    }))


if __name__ == "__main__":
    main()
