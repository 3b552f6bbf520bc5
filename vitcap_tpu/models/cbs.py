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


# ---------------------------------------------------------------------------
# sparse FSM + search: the production full-vocab path
# ---------------------------------------------------------------------------
#
# Every FSM row the builder can produce decomposes as "one DEFAULT target
# state that receives (almost) the whole vocabulary, minus a small set of
# REMOVED words, plus a small set of EXCEPTION edges (word -> other
# state)".  The dense search ships a (B, S, S, V) adjacency (31 MB/image
# at V=30522, S=32) and materializes a (B, S, S, nb, V) masked tensor per
# step; the sparse search ships a few-KB descriptor and the only V-wide
# device work is ONE top-K per live beam — the same asymptotics as
# unconstrained beam search.

class SparseFSM:
    """Per-image compact FSM: default_to (S,) int32 (-1 = no default row),
    removed (S, <=R) word ids excluded from the default flow, and
    exception edges (from, to, word).  Exactly equivalent to the dense
    (S, S, V) adjacency (see `densify`)."""

    def __init__(self, S: int, V: int):
        self.S, self.V = S, V
        self.default_to = np.full(S, -1, np.int64)
        self.removed: List[set] = [set() for _ in range(S)]
        self.edges: set = set()              # (from, to, word)

    # dense-op mirrors ------------------------------------------------
    def set1(self, f: int, t: int, w: int):
        if self.default_to[f] == t:
            self.removed[f].discard(w)
        else:
            self.edges.add((f, t, w))

    def set0(self, f: int, t: int, w: int):
        if self.default_to[f] == t:
            self.removed[f].add(w)
        self.edges.discard((f, t, w))

    def clear_row(self, f: int, t: int):
        if self.default_to[f] == t:
            self.default_to[f] = -1
            self.removed[f] = set()
        self.edges = {e for e in self.edges
                      if not (e[0] == f and e[1] == t)}

    def fill_row(self, f: int, t: int):
        # a full row subsumes any explicit edges into it
        self.default_to[f] = t
        self.removed[f] = set()
        self.edges = {e for e in self.edges
                      if not (e[0] == f and e[1] == t)}

    def densify(self) -> np.ndarray:
        fsm = np.zeros((self.S, self.S, self.V), np.uint8)
        for f in range(self.S):
            d = self.default_to[f]
            if d >= 0:
                fsm[f, d, :] = 1
                for w in self.removed[f]:
                    fsm[f, d, w] = 0
        for f, t, w in self.edges:
            fsm[f, t, w] = 1
        return fsm


def build_sparse_fsm(builder: "FiniteStateMachineBuilder",
                     constraints: List[str]) -> SparseFSM:
    """`FiniteStateMachineBuilder.build` mirrored onto the SparseFSM ops —
    identical adjacency (tested via densify), no (S, S, V) allocation."""
    assert len(constraints) <= builder._max_given_constraints
    S = builder._num_total_states
    m = builder._num_main_states
    fsm = SparseFSM(S, builder._tokenizer.vocab_size)
    fsm.default_to[:m] = np.arange(m)              # main self-loops

    def connect(from_state, to_state, word, reset_state=None):
        wordforms = builder._wordforms.get(word, [word])
        ids = builder._tokenizer.convert_tokens_to_ids(wordforms)
        for wi in ids:
            fsm.set1(from_state, to_state, wi)
            fsm.set0(from_state, from_state, wi)
        if reset_state is not None:
            fsm.clear_row(from_state, from_state)
            fsm.fill_row(from_state, reset_state)
            for wi in ids:
                fsm.set0(from_state, reset_state, wi)

    substate_idx = m
    for n, c in enumerate(constraints, start=1):
        words: List[str] = []
        for w in c.split():
            words.extend(builder._constraint2tokens.get(w, [w]))
        words = words[: builder._max_words_per_constraint]
        stride = 2 ** (n - 1)
        from_state = 0
        while from_state < m:
            for _ in range(stride):
                word_from = from_state
                for i, word in enumerate(words):
                    if i != len(words) - 1:
                        connect(word_from, substate_idx, word,
                                reset_state=from_state)
                        word_from = substate_idx
                        substate_idx += 1
                    else:
                        connect(word_from, from_state + stride, word,
                                reset_state=from_state)
                from_state += 1
            from_state += stride
    return fsm


def dense_to_sparse(fsm: np.ndarray) -> SparseFSM:
    """Decompose an arbitrary dense (S, S, V) adjacency into the
    default/removed/edges form.  Per source state, the target whose row
    covers more than half the vocab (if any) becomes the default; all
    other set bits become exception edges."""
    S, _, V = fsm.shape
    sp = SparseFSM(S, V)
    for f in range(S):
        counts = fsm[f].sum(axis=1)
        d = int(counts.argmax())
        if counts[d] > V // 2:
            sp.default_to[f] = d
            sp.removed[f] = set(np.nonzero(fsm[f, d] == 0)[0].tolist())
        else:
            d = -1
        for t in range(S):
            if t == d:
                continue
            for w in np.nonzero(fsm[f, t])[0]:
                sp.edges.add((f, t, int(w)))
    return sp


def sparse_batch(fsms: Sequence[SparseFSM], pad_mult: int = 16
                 ) -> Dict[str, np.ndarray]:
    """Batch per-image SparseFSMs into padded device arrays.  Pads E/R to
    a multiple of pad_mult so the jitted search compiles per bucket, not
    per batch."""
    B = len(fsms)
    S = fsms[0].S

    def _pad(n):
        return max(pad_mult, -(-n // pad_mult) * pad_mult)

    E = _pad(max((len(f.edges) for f in fsms), default=1))
    R = _pad(max((max((len(r) for r in f.removed), default=0)
                  for f in fsms), default=1))
    default_to = np.stack([f.default_to for f in fsms]).astype(np.int32)
    exc = np.full((B, E, 3), -1, np.int32)
    removed = np.full((B, S, R), -1, np.int32)
    for b, f in enumerate(fsms):
        for i, (fr, to, w) in enumerate(sorted(f.edges)):
            exc[b, i] = (fr, to, w)
        for s, rw in enumerate(f.removed):
            removed[b, s, :len(rw)] = sorted(rw)
    return {"default_to": default_to, "exc_from": exc[:, :, 0],
            "exc_to": exc[:, :, 1], "exc_word": exc[:, :, 2],
            "removed": removed}


def constrained_beam_search_sparse(
        params, images: jnp.ndarray, od_ids: jnp.ndarray,
        od_token_type_ids: Optional[jnp.ndarray], seq_len: jnp.ndarray,
        sfsm: Dict[str, jnp.ndarray], cfg: ModelConfig, opts: D.DecodeOptions,
        beam_size: int = 5, decoding_constraint: bool = False,
        bad_ending_ids: Optional[Sequence[int]] = None
        ) -> Dict[str, jnp.ndarray]:
    """Sparse-FSM constrained beam search; same beam sets as the dense
    `constrained_beam_search` (live beams; dead-beam filler scores use
    finite sentinels rather than -inf).  All shapes static given
    (S, E, R, beam_size), so one executable serves every batch."""
    A = opts.max_length
    nb = beam_size
    V = cfg.vocab_size
    default_to = sfsm["default_to"]                 # (B, S)
    exc_from = sfsm["exc_from"]                     # (B, E)
    exc_to = sfsm["exc_to"]
    exc_word = sfsm["exc_word"]
    removed = sfsm["removed"]                       # (B, S, R)
    B, S = default_to.shape
    E = exc_from.shape[1]
    R = removed.shape[2]
    G = S * nb
    K = nb + R      # top-K per beam: dropping <=R removed words leaves nb
    DEAD = -1e12    # finite so exact_top_k's finite-row precondition holds

    ctx = D.build_decode_context(params, images, od_ids, od_token_type_ids,
                                 seq_len, cfg, opts)
    params = D._decode_params_cast(params, cfg)
    cap_k, cap_v = D._init_caps(B * G, cfg.decoder_layers, A,
                                cfg.hidden_size, cfg.compute_dtype,
                                cfg.num_attention_heads)

    tokens = jnp.full((B, G, A), cfg.pad_token_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(cfg.cls_token_id)

    exc_valid = exc_from >= 0
    exc_from_c = jnp.maximum(exc_from, 0)
    exc_word_c = jnp.maximum(exc_word, 0)

    def pool_topk(scores, toks, targets, backs):
        """Per target state: top-nb over the candidate pool.
        scores/toks/targets/backs: (B, P)."""
        per_t = jnp.where(targets[:, None, :] == jnp.arange(S)[None, :, None],
                          scores[:, None, :], DEAD)         # (B, S, P)
        new_lp, idx = jax.lax.top_k(per_t, nb)              # (B, S, nb)
        word = jnp.take_along_axis(toks[:, None].repeat(S, 1), idx, axis=2)
        back = jnp.take_along_axis(backs[:, None].repeat(S, 1), idx, axis=2)
        return new_lp, word, back

    # ---- first step: BOS probe, transitions from state 0 ----
    prev = tokens[:, :, 0].reshape(B * G)
    logits, cap_k, cap_v = D.decode_step(params, cap_k, cap_v, ctx, prev,
                                         jnp.asarray(1), cfg)
    logp0 = jax.nn.log_softmax(
        logits.astype(jnp.float32).reshape(B, G, V)[:, 0], axis=-1)  # (B, V)
    top_lp, top_tok = D.exact_top_k(logp0, K)               # (B, K)
    rem0 = removed[:, 0]                                    # (B, R)
    hit = (top_tok[:, :, None] == rem0[:, None, :]) \
        & (rem0 >= 0)[:, None, :]
    d0 = default_to[:, 0]                                   # (B,)
    d_scores = jnp.where(hit.any(-1) | (d0 < 0)[:, None], DEAD, top_lp)
    d_targets = jnp.broadcast_to(jnp.maximum(d0, 0)[:, None], top_tok.shape)
    e_scores = jnp.where(exc_valid & (exc_from == 0),
                         jnp.take_along_axis(logp0, exc_word_c, axis=1),
                         DEAD)                              # (B, E)
    scores = jnp.concatenate([d_scores, e_scores], 1)       # (B, K+E)
    toks = jnp.concatenate([top_tok, exc_word_c], 1)
    targets = jnp.concatenate([d_targets, jnp.maximum(exc_to, 0)], 1)
    backs = jnp.zeros_like(toks)
    last_lp, first_tok, _ = pool_topk(scores, toks, targets, backs)
    tokens = tokens.at[:, :, 1].set(first_tok.reshape(B, G))

    bad = jnp.asarray(list(bad_ending_ids or []), jnp.int32)
    s_of_beam = jnp.arange(G) // nb                         # (G,)

    def step(carry, t):
        tokens, last_lp, cap_k, cap_v = carry
        prev = jax.lax.dynamic_index_in_dim(tokens, t - 1, axis=2,
                                            keepdims=False).reshape(B * G)
        logits, cap_k, cap_v = D.decode_step(params, cap_k, cap_v, ctx,
                                             prev, t, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, G, V)
        prev_r = prev.reshape(B, G)

        if decoding_constraint:
            logp = logp - 1e20 * jax.nn.one_hot(prev_r, V)
        if bad.size:
            prev_bad = jnp.isin(prev_r, bad)
            eos_pen = jnp.zeros((V,)).at[cfg.sep_token_id].set(1.0)
            logp = logp - jnp.where(prev_bad[..., None], 1e20, 0.0) * eos_pen

        finished = (prev_r == cfg.sep_token_id)
        after_end = jnp.full((V,), DEAD).at[cfg.sep_token_id].set(0.0)
        logp = jnp.where(finished[..., None], after_end, logp)

        # ONE V-wide top-K per live beam (the entire per-step V cost)
        top_lp, top_tok = D.exact_top_k(logp.reshape(B * G, V), K)
        top_lp = top_lp.reshape(B, G, K)
        top_tok = top_tok.reshape(B, G, K)

        # default-flow candidates: beam (s, j) -> default_to[s]
        beam_rm = removed[:, s_of_beam]                     # (B, G, R)
        hit = (top_tok[..., None] == beam_rm[:, :, None, :]) \
            & (beam_rm >= 0)[:, :, None, :]                 # (B, G, K, R)
        beam_d = default_to[:, s_of_beam]                   # (B, G)
        d_scores = jnp.where(hit.any(-1) | (beam_d < 0)[..., None], DEAD,
                             last_lp.reshape(B, G)[..., None] + top_lp)
        d_targets = jnp.broadcast_to(jnp.maximum(beam_d, 0)[..., None],
                                     top_tok.shape)
        d_backs = jnp.broadcast_to(jnp.arange(G)[None, :, None],
                                   top_tok.shape)

        # exception candidates: edge e x source beam j in [0, nb)
        src_beam = exc_from_c[:, :, None] * nb \
            + jnp.arange(nb)[None, None, :]                 # (B, E, nb)
        flat_src = src_beam.reshape(B, E * nb)
        flat_word = jnp.broadcast_to(
            exc_word_c[:, :, None], src_beam.shape).reshape(B, E * nb)
        # logp[b, src_beam, exc_word] + running lp of the source beam
        lp_edge = logp[jnp.arange(B)[:, None], flat_src, flat_word]
        e_scores = jnp.take_along_axis(
            last_lp.reshape(B, G), flat_src, axis=1) + lp_edge
        e_scores = jnp.where(
            jnp.broadcast_to(exc_valid[:, :, None],
                             src_beam.shape).reshape(B, -1),
            e_scores, DEAD)
        e_toks = flat_word
        e_targets = jnp.broadcast_to(jnp.maximum(exc_to, 0)[:, :, None],
                                     src_beam.shape).reshape(B, -1)
        e_backs = src_beam.reshape(B, -1)

        scores = jnp.concatenate([d_scores.reshape(B, -1), e_scores], 1)
        toks = jnp.concatenate([top_tok.reshape(B, -1), e_toks], 1)
        targets = jnp.concatenate([d_targets.reshape(B, -1), e_targets], 1)
        backs = jnp.concatenate([d_backs.reshape(B, -1), e_backs], 1)

        new_lp, word, back = pool_topk(scores, toks, targets, backs)

        flat_back = back.reshape(B, G)
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
                 min_constraints_to_satisfy: int = 2, beam_size: int = 5,
                 sparse: bool = True):
        self.tokenizer = tokenizer
        self.filter = constraint_filter
        self.builder = fsm_builder
        self.boxes = boxes_reader
        self.min_constraints = min_constraints_to_satisfy
        self.beam_size = beam_size
        self.sparse = sparse
        # device placement hook: the predict pipeline points this at a
        # batch-sharded device_put when a local data-parallel mesh is up
        # (every search input is batch-leading and row-independent, so
        # the search scales across local chips like greedy decode)
        self.put = jnp.asarray
        self._jit_cache: Dict[Any, Any] = {}

    def _constraints(self, keys: Sequence[str]):
        out = []
        for k in keys:
            b = self.boxes[k]
            out.append(self.filter(b["boxes"], b["class_names"],
                                   b["scores"]))
        return out

    def build_batch_fsm(self, keys: Sequence[str]
                        ) -> Tuple[np.ndarray, np.ndarray]:
        cons = self._constraints(keys)
        fsms = [self.builder.build(c)[0] for c in cons]
        return np.stack(fsms), np.asarray([len(c) for c in cons])

    def build_batch_fsm_sparse(self, keys: Sequence[str]
                               ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        cons = self._constraints(keys)
        fsms = [build_sparse_fsm(self.builder, c) for c in cons]
        return sparse_batch(fsms), np.asarray([len(c) for c in cons])

    def dispatch(self, params, images, od_ids, od_tt, seq_len, keys,
                 cfg: ModelConfig, opts: D.DecodeOptions):
        """Host FSM build + async device search dispatch.  Returns
        (device out dict, n_cons) WITHOUT synchronizing, so the caller can
        overlap the next batch's host work (FSM build, tokenizer decode)
        with device compute — jax dispatch is async; only the np.asarray
        in collect() blocks.

        Sparse (default): few-KB FSM descriptors, search cost ~=
        unconstrained beam search — the dense (B, S, S, V) path is kept
        for parity testing and opt-out (`sparse=False`)."""
        if self.sparse:
            sfsm, n_cons = self.build_batch_fsm_sparse(keys)
            key = ("sparse", sfsm["exc_from"].shape[1],
                   sfsm["removed"].shape[2])
            if key not in self._jit_cache:
                @jax.jit
                def run(params, images, od_ids, od_tt, seq_len, sfsm):
                    out = constrained_beam_search_sparse(
                        params, images, od_ids, od_tt, seq_len, sfsm, cfg,
                        opts, beam_size=self.beam_size)
                    return out["ids"], out["logprobs"]
                self._jit_cache[key] = run
            ids, logprobs = self._jit_cache[key](
                params, self.put(images), self.put(od_ids),
                self.put(od_tt), self.put(seq_len),
                {k: self.put(v) for k, v in sfsm.items()})
            return (ids, logprobs), n_cons
        fsm, n_cons = self.build_batch_fsm(keys)
        if "dense" not in self._jit_cache:
            # compile once per decoder: the FSM keeps its full static
            # state dimension, so every batch shares one executable
            @jax.jit
            def run(params, images, od_ids, od_tt, seq_len, fsm):
                out = constrained_beam_search(
                    params, images, od_ids, od_tt, seq_len, fsm, cfg,
                    opts, beam_size=self.beam_size)
                return out["ids"], out["logprobs"]
            self._jit_cache["dense"] = run
        ids, logprobs = self._jit_cache["dense"](
            params, self.put(images), self.put(od_ids), self.put(od_tt),
            self.put(seq_len), self.put(fsm))
        return (ids, logprobs), n_cons

    def collect(self, out, n_cons, cfg: ModelConfig
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch the device results (blocks) and select the best
        constraint-satisfying beam per image."""
        ids, logprobs = out
        return select_best_beam_with_constraints(
            np.asarray(ids)[:, :, :, 1:], np.asarray(logprobs),
            n_cons, self.min_constraints, [cfg.sep_token_id])

    def decode(self, params, images, od_ids, od_tt, seq_len, keys,
               cfg: ModelConfig, opts: D.DecodeOptions
               ) -> Tuple[np.ndarray, np.ndarray]:
        out, n_cons = self.dispatch(params, images, od_ids, od_tt, seq_len,
                                    keys, cfg, opts)
        return self.collect(out, n_cons, cfg)


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
