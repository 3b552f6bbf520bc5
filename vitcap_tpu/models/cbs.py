"""Constrained Beam Search over a finite-state machine of constraint words.

Re-implementation of the reference CBS stack
(/root/reference/src/tools/captioning/utils_cbs.py): ConstrainedBeamSearch
(:26-375), select_best_beam_with_constraints (:377-446), ConstraintFilter
(:492-645, incl. the Open-Images blacklist/replacements and hierarchy NMS),
FiniteStateMachineBuilder (:646-872), wired to modeling_bert.py:1035-1057
(`use_cbs` in generate).

TPU-native differences:
- the search runs as one `lax.scan` over steps with the per-beam caption
  cache + shared per-image context cache from models.decode (the reference
  re-runs the full model per step);
- beams carry their token buffers directly and are gathered on reorder
  (no host-side backpointer reconstruction);
- the FSM is a dense (S, S, V) uint8 adjacency built with numpy on host
  (identical layout to the reference) and shipped to device once.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import ModelConfig
from . import decode as D

NEG_INF = float("-inf")
STEP_MASK = -1e20          # reference uses masked_fill(-1e20) inside steps


# ---------------------------------------------------------------------------
# constraint filtering (host)
# ---------------------------------------------------------------------------

BLACKLIST = [
    "auto part", "bathroom accessory", "bicycle wheel", "boy", "building",
    "clothing", "door handle", "fashion accessory", "footwear", "girl",
    "hiking equipment", "human arm", "human beard", "human body",
    "human ear", "human eye", "human face", "human foot", "human hair",
    "human hand", "human head", "human leg", "human mouth", "human nose",
    "land vehicle", "mammal", "man", "person", "personal care", "plant",
    "plumbing fixture", "seat belt", "skull", "sports equipment", "tire",
    "tree", "vehicle registration plate", "wheel", "woman", "__background__",
]

REPLACEMENTS = {
    "band-aid": "bandaid",
    "wood-burning stove": "wood burning stove",
    "kitchen & dining room table": "table",
    "salt and pepper shakers": "salt and pepper",
    "power plugs and sockets": "power plugs",
    "luggage and bags": "luggage",
}


def _node_heights(hierarchy: dict) -> List[Tuple[str, int]]:
    """[(LabelName lower, height)] in PREORDER (reference anytree findall
    traversal order; first substring match wins)."""
    out: List[Tuple[str, int]] = []

    def height(node) -> int:
        return 1 + max((height(c) for c in node.get("Subcategory", [])),
                       default=-1)

    def walk(node):
        name = node.get("LabelName", "").lower()
        if name:
            out.append((name, height(node)))
        for c in node.get("Subcategory", []):
            walk(c)

    walk(hierarchy)
    return out


class ConstraintFilter:
    """blacklist -> hierarchy NMS (IoU>=thr: finer class suppresses coarser)
    -> top-k by confidence -> replacements -> dedup."""

    def __init__(self, hierarchy_jsonpath: str, nms_threshold: float = 0.85,
                 max_given_constraints: int = 3):
        self._heights = _node_heights(json.load(open(hierarchy_jsonpath)))
        self._nms_threshold = nms_threshold
        self._max_given_constraints = max_given_constraints

    def _height(self, class_name: str) -> int:
        # reference: findall(node.LabelName.lower() in c)[0].height — first
        # preorder node whose name is a substring of the class name
        for name, h in self._heights:
            if name and name in class_name:
                return h
        return 0

    def __call__(self, boxes: np.ndarray, class_names: List[str],
                 scores: np.ndarray) -> List[str]:
        keep = [i for i in range(len(class_names))
                if scores[i] > 0 and class_names[i] not in BLACKLIST]
        boxes = boxes[keep] if len(boxes) else boxes
        class_names = [class_names[i] for i in keep]
        scores = scores[keep] if len(scores) else scores

        keep = self._nms(boxes, class_names)
        boxes = boxes[keep] if len(boxes) else boxes
        class_names = [class_names[i] for i in keep]
        scores = scores[keep] if len(scores) else scores

        pairs = sorted(zip(class_names, scores), key=lambda t: -t[1])
        pairs = pairs[: self._max_given_constraints]
        names = [REPLACEMENTS.get(c, c) for c, _ in pairs]
        return list(set(names))

    def _nms(self, boxes: np.ndarray, class_names: List[str]) -> List[int]:
        if len(class_names) == 0:
            return []
        heights = np.array([self._height(c) for c in class_names])
        order = heights.argsort()
        x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
        areas = (x2 - x1 + 1) * (y2 - y1 + 1)
        keep: List[int] = []
        while order.size > 0:
            cur = order[0]
            keep.append(int(cur))
            xx1 = np.maximum(x1[cur], x1[order[1:]])
            yy1 = np.maximum(y1[cur], y1[order[1:]])
            xx2 = np.minimum(x2[cur], x2[order[1:]])
            yy2 = np.minimum(y2[cur], y2[order[1:]])
            inter = np.maximum(0.0, xx2 - xx1 + 1) * \
                np.maximum(0.0, yy2 - yy1 + 1)
            union = areas[cur] + areas[order[1:]] - inter
            cond = np.logical_or(heights[order[1:]] >= heights[cur],
                                 inter / union <= self._nms_threshold)
            order = order[1:][np.where(cond)[0]]
        return keep


def load_wordforms(path: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    with open(path) as fp:
        for line in fp:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                out[parts[0]] = parts[1].split(",")
    return out


# ---------------------------------------------------------------------------
# FSM builder (host, numpy)
# ---------------------------------------------------------------------------

class FiniteStateMachineBuilder:
    def __init__(self, tokenizer, constraint2tokens: Dict[str, List[str]],
                 wordforms: Dict[str, List[str]],
                 max_given_constraints: int = 3,
                 max_words_per_constraint: int = 4):
        self._tokenizer = tokenizer
        self._constraint2tokens = constraint2tokens
        self._wordforms = wordforms
        self._max_given_constraints = max_given_constraints
        self._max_words_per_constraint = max_words_per_constraint
        self._num_main_states = 2 ** max_given_constraints
        self._num_total_states = self._num_main_states * \
            max_words_per_constraint

    def build(self, constraints: List[str]) -> Tuple[np.ndarray, int]:
        assert len(constraints) <= self._max_given_constraints
        S, V = self._num_total_states, self._tokenizer.vocab_size
        m = self._num_main_states
        fsm = np.zeros((S, S, V), dtype=np.uint8)
        fsm[range(m), range(m), :] = 1                # main self-loops
        substate_idx = m
        for i, c in enumerate(constraints):
            substate_idx = self._add_nth_constraint(fsm, i + 1,
                                                    substate_idx, c)
        return fsm, substate_idx

    def _add_nth_constraint(self, fsm, n, substate_idx, constraint):
        words: List[str] = []
        for w in constraint.split():
            words.extend(self._constraint2tokens.get(w, [w]))
        words = words[: self._max_words_per_constraint]
        stride = 2 ** (n - 1)
        from_state = 0
        while from_state < self._num_main_states:
            for _ in range(stride):
                word_from = from_state
                for i, word in enumerate(words):
                    if i != len(words) - 1:
                        self._connect(fsm, word_from, substate_idx, word,
                                      reset_state=from_state)
                        word_from = substate_idx
                        substate_idx += 1
                    else:
                        self._connect(fsm, word_from, from_state + stride,
                                      word, reset_state=from_state)
                from_state += 1
            from_state += stride
        return substate_idx

    def _connect(self, fsm, from_state, to_state, word, reset_state=None):
        wordforms = self._wordforms.get(word, [word])
        ids = self._tokenizer.convert_tokens_to_ids(wordforms)
        for wi in ids:
            fsm[from_state, to_state, wi] = 1
            fsm[from_state, from_state, wi] = 0
        if reset_state is not None:
            # NOTE: applied to MAIN states too (reference utils_cbs.py:860-
            # 869): re-writes the whole self-loop row, which re-enables
            # self-loops for earlier constraints' wordforms — reproduced
            # exactly for parity
            fsm[from_state, from_state, :] = 0
            fsm[from_state, reset_state, :] = 1
            for wi in ids:
                fsm[from_state, reset_state, wi] = 0


# ---------------------------------------------------------------------------
# constrained beam search (device)
# ---------------------------------------------------------------------------

def constrained_beam_search(params, images: jnp.ndarray, od_ids: jnp.ndarray,
                            od_token_type_ids: Optional[jnp.ndarray],
                            seq_len: jnp.ndarray, fsm: jnp.ndarray,
                            cfg: ModelConfig, opts: D.DecodeOptions,
                            beam_size: int = 5,
                            decoding_constraint: bool = False,
                            bad_ending_ids: Optional[Sequence[int]] = None
                            ) -> Dict[str, jnp.ndarray]:
    """fsm: (B, S, S, V) uint8.  Returns ids (B, S, beam, A) sorted by
    likelihood within each state, and logprobs (B, S, beam).

    Position 0 holds BOS; per_node_beam_size = beam_size (reference
    default)."""
    A = opts.max_length
    nb = beam_size
    B, S, _, V = fsm.shape
    G = S * nb                                     # beams per image
    ctx = D.build_decode_context(params, images, od_ids, od_token_type_ids,
                                 seq_len, cfg, opts)
    params = D._decode_params_cast(params, cfg)   # once, outside the scan
    cap_k, cap_v = D._init_caps(B * G, cfg.decoder_layers, A,
                                cfg.hidden_size, cfg.compute_dtype,
                                cfg.num_attention_heads)
    fsm_f = fsm.astype(jnp.bool_)

    tokens = jnp.full((B, G, A), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.cls_token_id)

    # ---- first step: BOS probe, transitions from state 0 ----
    prev = tokens[:, :, 0].reshape(B * G)
    logits, cap_k, cap_v = D.decode_step(params, cap_k, cap_v, ctx, prev,
                                         jnp.asarray(1), cfg)
    logp0 = jax.nn.log_softmax(logits.reshape(B, G, V)[:, 0], axis=-1)
    # (B, S, V): fill -inf where fsm[0, s] disallows
    start = jnp.where(fsm_f[:, 0], logp0[:, None, :], NEG_INF)
    last_lp, first_tok = jax.lax.top_k(start, nb)       # (B, S, nb)
    tokens = tokens.at[:, :, 1].set(first_tok.reshape(B, G))

    bad = jnp.asarray(list(bad_ending_ids or []), jnp.int32)

    def step(carry, t):
        tokens, last_lp, cap_k, cap_v = carry
        prev = jax.lax.dynamic_index_in_dim(tokens, t - 1, axis=2,
                                            keepdims=False).reshape(B * G)
        logits, cap_k, cap_v = D.decode_step(params, cap_k, cap_v, ctx,
                                             prev, t, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, S, nb, V)
        prev_r = prev.reshape(B, S, nb)

        if decoding_constraint:
            logp = logp - 1e20 * jax.nn.one_hot(prev_r, V)
        if bad.size:
            prev_bad = jnp.isin(prev_r, bad)
            eos_pen = jnp.zeros((V,)).at[cfg.sep_token_id].set(1.0)
            logp = logp - jnp.where(prev_bad[..., None], 1e20, 0.0) * eos_pen

        finished = (prev_r == cfg.sep_token_id)
        after_end = jnp.full((V,), NEG_INF).at[cfg.sep_token_id].set(0.0)
        logp = jnp.where(finished[..., None], after_end, logp)

        # per target state: mask by fsm[:, s_from, s_to, :], topk per
        # (s_from, beam) over vocab, add running lp, flatten, topk nb
        allow = fsm_f.transpose(0, 2, 1, 3)[:, :, :, None, :]  # (B,St,Sf,1,V)
        masked = jnp.where(allow, logp[:, None], STEP_MASK)    # (B,St,Sf,nb,V)
        # chunked exact top-k (decode.exact_top_k): lax.top_k sorts each of
        # the B*S*S*nb vocab-wide rows (~ms/step at real sizes)
        from .decode import exact_top_k
        lead = masked.shape[:-1]
        top_lp, top_tok = exact_top_k(masked.reshape(-1, V), nb)
        top_lp = top_lp.reshape(*lead, nb)
        top_tok = top_tok.reshape(*lead, nb)
        summed = top_lp + last_lp[:, None, :, :, None]  # (B,S_to,S_from,nb,nb)
        flat = summed.reshape(B, S, S * nb * nb)
        new_lp, idx = jax.lax.top_k(flat, nb)           # (B, S_to, nb)
        back = idx // nb                                # flat (s_from, beam)
        word = jnp.take_along_axis(
            top_tok.reshape(B, S, S * nb * nb), idx, axis=2)

        # gather token buffers + caches by backpointer (global beam index)
        flat_back = back.reshape(B, G)                  # in [0, G)
        tokens = jnp.take_along_axis(tokens, flat_back[..., None], axis=1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, word.reshape(B, G, 1).astype(jnp.int32), t, axis=2)
        gidx = (jnp.arange(B)[:, None] * G + flat_back).reshape(B * G)
        cap_k = [k[gidx] for k in cap_k]
        cap_v = [v[gidx] for v in cap_v]
        return (tokens, new_lp, cap_k, cap_v), None

    if A > 2:
        (tokens, last_lp, _, _), _ = jax.lax.scan(
            step, (tokens, last_lp, cap_k, cap_v), jnp.arange(2, A))
    return {"ids": tokens.reshape(B, S, nb, A), "logprobs": last_lp,
            "tag_logits": ctx["tag_logits"]}


class ConstraintBoxesReader:
    """Detected-boxes TSV: key -> {boxes, class_names, scores}
    (reference utils_cbs.py:458-489)."""

    def __init__(self, boxes_tsvpath: str):
        self._m: Dict[str, Dict[str, Any]] = {}
        with open(boxes_tsvpath) as fp:
            for line in fp:
                parts = line.strip().split("\t")
                labels = json.loads(parts[1])
                boxes = np.array([b["rect"] for b in labels]) \
                    if labels else np.zeros((0, 4))
                self._m[parts[0]] = {
                    "boxes": boxes,
                    "class_names": [b["class"].lower() for b in labels],
                    "scores": np.array([b["conf"] for b in labels]),
                }

    def __len__(self):
        return len(self._m)

    def __getitem__(self, key):
        return self._m.get(key, {"boxes": np.array([]), "class_names": [],
                                 "scores": np.array([])})


class CbsDecoder:
    """End-to-end CBS decoding: per-image constraints -> FSM -> device
    search -> best-beam selection.  The FSM keeps the full static
    (num_total_states) dimension so the jitted search compiles once
    (the reference trims unused sub-states per batch instead)."""

    def __init__(self, tokenizer, constraint_filter: ConstraintFilter,
                 fsm_builder: FiniteStateMachineBuilder,
                 boxes_reader: ConstraintBoxesReader,
                 min_constraints_to_satisfy: int = 2, beam_size: int = 5):
        self.tokenizer = tokenizer
        self.filter = constraint_filter
        self.builder = fsm_builder
        self.boxes = boxes_reader
        self.min_constraints = min_constraints_to_satisfy
        self.beam_size = beam_size

    def build_batch_fsm(self, keys: Sequence[str]
                        ) -> Tuple[np.ndarray, np.ndarray]:
        fsms, n_cons = [], []
        for k in keys:
            b = self.boxes[k]
            constraints = self.filter(b["boxes"], b["class_names"],
                                      b["scores"])
            fsm, _ = self.builder.build(constraints)
            fsms.append(fsm)
            n_cons.append(len(constraints))
        return np.stack(fsms), np.asarray(n_cons)

    def decode(self, params, images, od_ids, od_tt, seq_len, keys,
               cfg: ModelConfig, opts: D.DecodeOptions
               ) -> Tuple[np.ndarray, np.ndarray]:
        fsm, n_cons = self.build_batch_fsm(keys)
        out = constrained_beam_search(
            params, images, od_ids, od_tt, seq_len, jnp.asarray(fsm), cfg,
            opts, beam_size=self.beam_size)
        return select_best_beam_with_constraints(
            np.asarray(out["ids"])[:, :, :, 1:], np.asarray(out["logprobs"]),
            n_cons, self.min_constraints, [cfg.sep_token_id])


def select_best_beam_with_constraints(
        beams: np.ndarray, beam_log_probabilities: np.ndarray,
        given_constraints: np.ndarray, min_constraints_to_satisfy: int,
        eos_token_ids: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Pick, per image, the most likely top beam among FSM states satisfying
    at least min(given, min_to_satisfy) constraints, length-normalized
    (reference utils_cbs.py:377-446)."""
    beams = np.asarray(beams)
    lps = np.asarray(beam_log_probabilities)
    B, num_states, beam_size, A = beams.shape
    best_b, best_lp = [], []
    for i in range(B):
        valid_states = [
            s for s in range(2 ** int(given_constraints[i]))
            if bin(s).count("1") >= min(int(given_constraints[i]),
                                        min_constraints_to_satisfy)]
        vb = beams[i, valid_states, 0, :]
        vlen = np.ones_like(vb)
        for eos in eos_token_ids:
            vlen = vlen * (vb != eos)
        vlen = vlen.sum(1) + 1
        vlp = lps[i, valid_states, 0] / vlen
        j = int(np.argmax(vlp))
        best_b.append(vb[j])
        best_lp.append(vlp[j])
    return np.stack(best_b), np.asarray(best_lp)
