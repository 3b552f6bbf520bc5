"""Production end-to-end captioning demo: detections -> constrained decode.

The reference's captioning_e2e.py (src/tools/captioning/captioning_e2e.py)
chains an external maskrcnn detector (the `mmask` package, not vendored)
with the captioner: detected boxes/labels become od-label text plus CBS
constraint words.  This demo keeps the same seam but takes the detector's
output as data — a detections JSON from any detector — or, detector-free,
uses the model's own predicted concept tags as constraints.

Usage:
  python demo_e2e.py --checkpoint ckpt.pt --image photo.jpg \
      [--detections det.json] [--beams 5] [--min-constraints 2] \
      [--hierarchy hierarchy.json] [--wordforms wordforms.tsv]

det.json: {"detections": [{"class": "dog", "conf": 0.97,
                           "rect": [x1, y1, x2, y2]}, ...]}
"""

from __future__ import annotations

import argparse
import json
import os.path as op

from vitcap_tpu.utils.common import asset_path

import numpy as np


def load_model(checkpoint: str, encoder_dir: str, crop_size: int):
    import jax
    from vitcap_tpu.data.tokenization import BertTokenizer
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models.config import ModelConfig

    j = json.load(open(op.join(encoder_dir, "config.json")))
    cfg = ModelConfig(
        hidden_size=j["hidden_size"],
        num_attention_heads=j["num_attention_heads"],
        intermediate_size=j["intermediate_size"],
        num_hidden_layers=j["num_hidden_layers"],
        vocab_size=j["vocab_size"], tag_vocab_size=j["vocab_size"],
        max_position_embeddings=j["max_position_embeddings"],
        img_size=crop_size,
        split_blocks=min(4, j["num_hidden_layers"]),
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tokenizer = BertTokenizer(op.join(encoder_dir, "vocab.txt"))
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    if checkpoint.endswith((".pt", ".pth")):
        from vitcap_tpu.solver.checkpoint_bridge import (
            load_params_from_torch, load_torch_state_dict)
        params, _ = load_params_from_torch(
            params, load_torch_state_dict(checkpoint))
    else:
        from vitcap_tpu.solver.checkpointing import load_state
        state = load_state(checkpoint)
        params = state["params"] if "params" in state else state
    import jax.numpy as jnp
    # device arrays: lax.scan bodies index these with tracers
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return params, cfg, tokenizer


class _NoHierarchyFilter:
    """ConstraintFilter fallback without the Open-Images hierarchy json:
    blacklist + confidence sort + dedup (no NMS)."""

    def __init__(self, max_given_constraints: int = 3):
        self._max = max_given_constraints

    def __call__(self, boxes, class_names, scores):
        from vitcap_tpu.models.cbs import BLACKLIST, REPLACEMENTS
        pairs = [(c, s) for c, s in zip(class_names, scores)
                 if s > 0 and c not in BLACKLIST]
        pairs.sort(key=lambda t: -t[1])
        # dedup BEFORE truncating (like ConstraintFilter's NMS) so duplicate
        # detections don't eat constraint slots
        names = list(dict.fromkeys(REPLACEMENTS.get(c, c) for c, _ in pairs))
        return names[: self._max]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--detections", default=None,
                    help="detector-output json; omitted = use predicted "
                         "concept tags as constraints")
    ap.add_argument("--encoder-dir",
                    default=asset_path("VILT-L12-H784-uncased_16_384"))
    ap.add_argument("--hierarchy", default=None,
                    help="Open-Images hierarchy json for constraint NMS")
    ap.add_argument("--wordforms", default=None,
                    help="constraint wordforms tsv (word\\tforms,comma,sep)")
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--max-constraints", type=int, default=3)
    ap.add_argument("--min-constraints", type=int, default=2)
    ap.add_argument("--crop-size", type=int, default=384)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from vitcap_tpu.data.transforms import TestImageTransform
    from vitcap_tpu.models import cbs as C
    from vitcap_tpu.models import decode as D

    params, cfg, tokenizer = load_model(args.checkpoint, args.encoder_dir,
                                        args.crop_size)
    img = Image.open(args.image).convert("RGB")
    x = jnp.asarray(TestImageTransform(crop_size=args.crop_size)(img)[None])

    # ---- constraint words ----
    od_len = cfg.max_seq_len - cfg.max_seq_a_len
    if args.detections:
        det = json.load(open(args.detections))["detections"]
        boxes = np.array([d.get("rect", [0, 0, 1, 1]) for d in det],
                         np.float32).reshape(-1, 4)
        names = [d["class"].lower() for d in det]
        scores = np.array([d.get("conf", 1.0) for d in det], np.float32)
        if args.hierarchy:
            filt = C.ConstraintFilter(
                args.hierarchy, max_given_constraints=args.max_constraints)
        else:
            filt = _NoHierarchyFilter(args.max_constraints)
        constraints = filt(boxes, names, scores)
        # detected classes also serve as od-label text (reference
        # IdentifyTextAB path)
        od_tokens = []
        for n in sorted(set(names)):
            od_tokens += tokenizer.tokenize(n)
        od_tokens = od_tokens[:od_len]
        od_id_list = tokenizer.convert_tokens_to_ids(od_tokens)
    else:
        # detector-free: the CTN's own top tags are the constraints
        from vitcap_tpu.models import vitcap as M
        enc = jax.jit(lambda p, im: M.encode_images(p, im, cfg))(params, x)
        top = np.asarray(enc["pred_topk"])[0][:8].tolist()
        words = [w for w in tokenizer.convert_ids_to_tokens(top)
                 if w.isalpha() and len(w) > 2]
        constraints = words[: args.max_constraints]
        od_id_list = []
    print(f"constraints: {constraints}")

    # ---- FSM ----
    if args.wordforms:
        wordforms = C.load_wordforms(args.wordforms)
    else:
        wordforms = {c: sorted({c, c + "s"}) for c in constraints}
    c2t = {c: tokenizer.tokenize(c) or [c] for c in constraints}
    builder = C.FiniteStateMachineBuilder(
        tokenizer, c2t, wordforms,
        max_given_constraints=args.max_constraints)
    fsm, _ = builder.build(constraints)

    # ---- constrained decode ----
    od_ids = np.zeros((1, od_len), np.int32)
    od_ids[0, :len(od_id_list)] = od_id_list
    seq_len = jnp.full((1,), cfg.max_seq_a_len + len(od_id_list), jnp.int32)
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    out = C.constrained_beam_search(
        params, x, jnp.asarray(od_ids), None, seq_len,
        jnp.asarray(fsm[None]), cfg, opts, beam_size=args.beams)
    best, lp = C.select_best_beam_with_constraints(
        np.asarray(out["ids"])[:, :, :, 1:], np.asarray(out["logprobs"]),
        np.asarray([len(constraints)]), args.min_constraints,
        [cfg.sep_token_id])
    caption = tokenizer.decode(best[0].tolist(), skip_special_tokens=True)
    print(f"caption: {caption!r}  (logprob {float(lp[0]):.3f})")
    return caption


if __name__ == "__main__":
    main()
