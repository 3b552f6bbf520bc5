"""Single-image captioning demo (the reference `Loading Script.ipynb` path).

Usage:
  python demo.py --checkpoint ckpt.pt|ckpt.ckpt --image photo.jpg \
      [--encoder-dir yaml/VILT-L12-H784-uncased_16_384] [--beams 1]

Loads the model (torch .pt through the checkpoint bridge, or a native
checkpoint), runs the test image transform, and greedy/beam-decodes one
caption with predicted concept tags.
"""

from __future__ import annotations

import argparse
import json
import os.path as op

from vitcap_tpu.utils.common import asset_path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--encoder-dir",
                    default=asset_path("VILT-L12-H784-uncased_16_384"))
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--crop-size", type=int, default=384)
    ap.add_argument("--topk-tags", type=int, default=20)
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.data.transforms import TestImageTransform
    from vitcap_tpu.models import decode as D
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.config import ModelConfig

    j = json.load(open(op.join(args.encoder_dir, "config.json")))
    cfg = ModelConfig(
        hidden_size=j["hidden_size"],
        num_attention_heads=j["num_attention_heads"],
        intermediate_size=j["intermediate_size"],
        num_hidden_layers=j["num_hidden_layers"],
        vocab_size=j["vocab_size"], tag_vocab_size=j["vocab_size"],
        max_position_embeddings=j["max_position_embeddings"],
        img_size=args.crop_size,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tokenizer = BertTokenizer(op.join(args.encoder_dir, "vocab.txt"))

    params = M.init_params(jax.random.PRNGKey(0), cfg)
    if args.checkpoint.endswith((".pt", ".pth")):
        from vitcap_tpu.solver.checkpoint_bridge import (
            load_params_from_torch, load_torch_state_dict)
        params, report = load_params_from_torch(
            params, load_torch_state_dict(args.checkpoint))
        print(f"loaded {len(report['matched'])} tensors from torch ckpt "
              f"({len(report['missing'])} missing, "
              f"{len(report['shape_mismatch'])} shape-skipped)")
    else:
        from vitcap_tpu.solver.checkpointing import load_state
        state = load_state(args.checkpoint)
        params = state["params"] if "params" in state else state

    img = Image.open(args.image).convert("RGB")
    x = TestImageTransform(crop_size=args.crop_size)(img)[None]

    od_len = cfg.max_seq_len - cfg.max_seq_a_len
    od_ids = jnp.zeros((1, od_len), jnp.int32)
    seq_len = jnp.full((1,), cfg.max_seq_a_len, jnp.int32)
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           num_beams=args.beams,
                           od_labels_start_posid=cfg.max_seq_a_len)
    out = jax.jit(lambda p, im: D.generate(p, im, od_ids, None, seq_len,
                                           cfg, opts))(params,
                                                       jnp.asarray(x))
    ids = np.asarray(out["ids"])[0, 0]
    caption = tokenizer.decode(ids.tolist(), skip_special_tokens=True)
    conf = float(np.exp(np.asarray(out["logprobs"])[0, 0]))
    tags = tokenizer.convert_ids_to_tokens(
        np.asarray(out["pred_topk"])[0][: args.topk_tags].tolist()) \
        if "pred_topk" in out else []
    print(f"caption: {caption!r}  (conf {conf:.3f})")
    print(f"top tags: {tags}")
    return caption


if __name__ == "__main__":
    main()
