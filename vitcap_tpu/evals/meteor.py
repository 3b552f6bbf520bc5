"""METEOR 1.5 (native): exact / stem / synonym / paraphrase matcher stages.

JVM-free reimplementation of the Meteor 1.5 scorer the reference invokes
through pycocoevalcap (`meteor-1.5.jar`, wired at
/root/reference/src/tools/captioning/utils_caption_evaluate.py:95-107).
English defaults (Denkowski & Lavie 2014, "Meteor Universal"):

    alpha=0.85  beta=0.2  gamma=0.6  delta=0.75
    module weights: exact 1.0, stem 0.6, synonym 0.8, paraphrase 0.6

    Fmean   = P*R / (alpha*P + (1-alpha)*R)   (weighted P over hyp, R over ref)
    Penalty = gamma * (chunks / matches)^beta
    Score   = (1 - Penalty) * Fmean

Word weights: content words count delta, function words (1-delta).

Fidelity notes (documented deviation sources, see STATUS.md):
- SYNONYMY: Meteor ships the full WordNet synonym database; this image has
  no WordNet data and no network, so we ship a compact curated table
  (data/meteor_synonyms.txt, one synonym group per line) centered on the
  captioning domain plus common English groups.  Coverage is strictly
  smaller than WordNet -> native METEOR is a LOWER bound on jar METEOR
  along the synonym axis.
- PARAPHRASE: the 60MB paraphrase-en.gz table is not shippable; the stage
  runs by default on a compact curated caption-domain table
  (data/meteor_paraphrases.txt, same "phrase\tphrase" line format —
  progressive/simple-present verb phrases, locatives, quantifiers,
  open/closed compounds).  Coverage is strictly smaller than the real
  table, so coco_eval publishes a measured on/off sensitivity band for
  this axis next to the synonym band.  paraphrase_file= overrides.
- ALIGNMENT: Meteor beam-searches the alignment that maximizes weighted
  coverage and THEN minimizes chunks; we use stage-ordered matching with
  an adjacency-preferring tie-break, which reproduces the chunk-minimal
  alignment on typical caption-length sentences but is not exhaustive.
- NORMALIZATION: the jar is invoked with `-norm` (tokenize + lowercase);
  inputs here arrive PTB-tokenized by evals/ptb.py, matching that.
"""

from __future__ import annotations

import os.path as op
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Meteor 1.5 English parameters (meteor-1.5/README, language 'en')
ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
W_EXACT, W_STEM, W_SYN, W_PAR = 1.0, 0.6, 0.8, 0.6

_DATA_DIR = op.join(op.dirname(__file__), "data")

# Closed-class English function words (approximates meteor-1.5's
# corpus-derived function.words list: articles, prepositions, conjunctions,
# pronouns, auxiliaries, particles).
FUNCTION_WORDS = frozenset("""
a an the this that these those some any each every no neither either
i you he she it we they me him her us them my your his its our their
mine yours hers ours theirs myself yourself himself herself itself
ourselves themselves who whom whose which what
and or but nor so yet for because although though while if unless until
since when whenever where wherever why how as than whether
in on at by with from to of about against between into through during
before after above below up down out off over under again further then
once here there all both few more most other such only own same too very
be am is are was were been being have has had having do does did doing
will would shall should may might must can could
not n't 's 'm 're 've 'll 'd
""".split())


@lru_cache(maxsize=1)
def _synonym_groups(path: Optional[str] = None) -> Dict[str, int]:
    """word -> synonym-set id (a word may appear in one group; groups are
    merged transitively at load)."""
    path = path or op.join(_DATA_DIR, "meteor_synonyms.txt")
    word2gid: Dict[str, int] = {}
    gid = 0
    if not op.isfile(path):            # pragma: no cover
        return word2gid
    with open(path) as f:
        for line in f:
            words = line.split("#", 1)[0].split()
            if len(words) < 2:
                continue
            # merge with any group already containing one of the words
            tgt = None
            for w in words:
                if w in word2gid:
                    tgt = word2gid[w]
                    break
            if tgt is None:
                tgt = gid
                gid += 1
            for w in words:
                word2gid.setdefault(w, tgt)
    return word2gid


@lru_cache(maxsize=1)
def _synonym_groups_by_stem(path: Optional[str] = None) -> Dict[str, int]:
    """Porter-stem -> synonym-set id, restricted to stems that map to ONE
    group.  Lets inflected forms ('dogs', 'puppies') reach the table, whose
    keys are base forms — the jar lemmatizes before the WordNet synset
    lookup, so a surface-only lookup under-matches.  Stems shared by two
    different groups are dropped (ambiguous)."""
    _ensure_stemmer()
    stem2gid: Dict[str, int] = {}
    ambiguous = set()
    for w, g in _synonym_groups(path).items():
        s = _stem(w)
        if stem2gid.setdefault(s, g) != g:
            ambiguous.add(s)
    for s in ambiguous:
        del stem2gid[s]
    return stem2gid


@lru_cache(maxsize=4)
def _paraphrases(path: str) -> Dict[Tuple[str, ...], set]:
    """phrase -> set of equivalent phrases; file lines 'p1<TAB>p2'."""
    table: Dict[Tuple[str, ...], set] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 2:
                continue
            a = tuple(parts[0].split())
            b = tuple(parts[1].split())
            table.setdefault(a, set()).add(b)
            table.setdefault(b, set()).add(a)
    return table


@lru_cache(maxsize=65536)
def _stem(w: str) -> str:
    from nltk.stem.porter import PorterStemmer
    return _stem._st.stem(w)


def _ensure_stemmer():
    if not hasattr(_stem, "_st"):
        from nltk.stem.porter import PorterStemmer
        _stem._st = PorterStemmer()


def _word_weight(w: str) -> float:
    return (1.0 - DELTA) if w in FUNCTION_WORDS else DELTA


def _align(hyp: List[str], ref: List[str],
           syn: Dict[str, int],
           par: Optional[Dict[Tuple[str, ...], set]],
           syn_stem: Optional[Dict[str, int]] = None
           ) -> Tuple[List[Tuple[int, int, float]], int]:
    """Stage-ordered alignment.

    Returns (matches, chunks): matches is a list of
    (hyp_idx, ref_idx, module_weight) single-word pairs (paraphrase
    matches contribute one pair per covered word at W_PAR), chunks is the
    count of maximal runs monotone-adjacent on both sides.

    Within a stage, each unmatched hyp word picks an unmatched ref
    occurrence, preferring the one adjacent to its neighbor's alignment
    (Meteor's tie-break is chunk-minimality; adjacency preference is the
    linear-time version of that)."""
    _ensure_stemmer()
    m = [-1] * len(hyp)                # hyp idx -> ref idx
    mw = [0.0] * len(hyp)
    used = [False] * len(ref)

    def stage_match(eq_h, eq_r, weight):
        for i in range(len(hyp)):
            if m[i] >= 0:
                continue
            cands = [j for j in range(len(ref))
                     if not used[j] and eq_h[i] is not None
                     and eq_h[i] == eq_r[j]]
            if not cands:
                continue
            # adjacency preference: continue the neighbor's chunk
            pick = None
            if i > 0 and m[i - 1] >= 0 and (m[i - 1] + 1) in cands:
                pick = m[i - 1] + 1
            else:
                # else earliest candidate (jar scans left-to-right)
                pick = cands[0]
            m[i], mw[i] = pick, weight
            used[pick] = True

    # stage 1: exact
    stage_match(hyp, ref, W_EXACT)
    # stage 2: stem
    stage_match([_stem(w) for w in hyp], [_stem(w) for w in ref], W_STEM)
    # stage 3: synonym (shared synonym-set id).  Surface lookup first,
    # then the stem-indexed fallback: the jar lemmatizes (WordNet morphy)
    # before the synset lookup, so inflected forms ('dogs', 'running')
    # must still reach the base-form-keyed table — without this the
    # native synonym stage under-matches the jar AND the published
    # synonym_coverage (which counts stem hits) would overstate reach.
    if syn:
        ss = syn_stem or {}

        def gid(w):
            g = syn.get(w)
            return g if g is not None else ss.get(_stem(w))
        hs = [gid(w) for w in hyp]
        rs = [gid(w) for w in ref]
        stage_match(hs, rs, W_SYN)
    # stage 4: paraphrase (phrase spans up to 4 words, longest-first)
    if par:
        for L in (4, 3, 2, 1):
            for i in range(len(hyp) - L + 1):
                span = tuple(hyp[i: i + L])
                if span not in par or any(m[k] >= 0
                                          for k in range(i, i + L)):
                    continue
                for alt in par[span]:
                    Lr = len(alt)
                    hit = None
                    for j in range(len(ref) - Lr + 1):
                        if tuple(ref[j: j + Lr]) == alt and \
                                not any(used[k] for k in range(j, j + Lr)):
                            hit = j
                            break
                    if hit is None:
                        continue
                    # map each hyp word of the span; extra ref words are
                    # consumed (marked used) without a pair
                    for k in range(L):
                        jj = hit + min(k, Lr - 1)
                        m[i + k], mw[i + k] = jj, W_PAR
                    for k in range(Lr):
                        used[hit + k] = True
                    break

    pairs = [(i, m[i], mw[i]) for i in range(len(hyp)) if m[i] >= 0]
    chunks = 0
    prev = None
    for i, j, _ in pairs:
        if prev is None or j != prev[1] + 1 or i != prev[0] + 1:
            chunks += 1
        prev = (i, j)
    return pairs, chunks


def meteor_sentence(hyp_words: Sequence[str], ref_words: Sequence[str],
                    syn: Dict[str, int],
                    par: Optional[Dict[Tuple[str, ...], set]] = None,
                    syn_stem: Optional[Dict[str, int]] = None) -> float:
    hyp = [w.lower() for w in hyp_words]
    ref = [w.lower() for w in ref_words]
    if not hyp or not ref:
        return 0.0
    pairs, chunks = _align(hyp, ref, syn, par, syn_stem)
    if not pairs:
        return 0.0
    wsum_h = sum(_word_weight(w) for w in hyp)
    wsum_r = sum(_word_weight(w) for w in ref)
    p = sum(wm * _word_weight(hyp[i]) for i, _, wm in pairs) / max(
        wsum_h, 1e-9)
    r = sum(wm * _word_weight(ref[j]) for _, j, wm in pairs) / max(
        wsum_r, 1e-9)
    if p + r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    # Pen = gamma * (ch/m)^beta (Meteor Universal eq. 2).  With the
    # rank-tuned beta=0.2 even a perfect contiguous match keeps a
    # penalty (identical 5-word sentences score ~0.565) — that is the
    # real meteor-1.5 scale, which saturates near 0.56, not 1.0.
    frag = chunks / len(pairs)
    pen = GAMMA * (frag ** BETA)
    return (1.0 - pen) * fmean


def synonym_coverage(words: Sequence[str],
                     synonym_file: Optional[str] = None) -> Dict[str, float]:
    """Measured coverage of the shipped synonym table over a vocabulary.

    Returns {n_words, n_content, in_table, in_table_by_stem, coverage}:
    `coverage` = fraction of distinct CONTENT words (function words never
    synonym-match in Meteor scoring practice — their weight is 0.25 and
    they nearly always exact-match) reachable by the synonym stage, either
    directly or through the stem-indexed fallback (both lookups are wired
    into the live stage-3 alignment — see _align — so this number measures
    the actual matcher, for METEOR and SPICE alike).  Published in `.report`
    `_impl` so the METEOR/SPICE deviation vs the WordNet-complete jar is a
    number, not an assertion (jar's WordNet covers ~100% of open-class
    English; our gap on this vocabulary is 1 - coverage)."""
    _ensure_stemmer()
    syn = _synonym_groups(synonym_file)
    syn_stem = _synonym_groups_by_stem(synonym_file)
    uniq = {w.lower() for w in words if w and w.isalpha()}
    content = {w for w in uniq if w not in FUNCTION_WORDS}
    hit = {w for w in content if w in syn}
    hit_stem = {w for w in content - hit if _stem(w) in syn_stem}
    n = max(len(content), 1)
    return {"n_words": len(uniq), "n_content": len(content),
            "in_table": len(hit), "in_table_by_stem": len(hit_stem),
            "coverage": round((len(hit) + len(hit_stem)) / n, 4)}


def meteor(gts: Dict, res: Dict, synonym_file: Optional[str] = None,
           paraphrase_file: Optional[str] = None,
           use_synonyms: bool = True,
           use_paraphrases: bool = True) -> Tuple[float, np.ndarray]:
    """COCOEvalCap-shaped entry: gts/res map key -> list of sentences.
    Per key: max over references (the jar aligns against each reference
    and keeps the best-scoring one).

    use_synonyms=False / use_paraphrases=False disable those matcher
    stages — used by coco_eval to publish a measured sensitivity band
    [score_stage_off, score_stage_on] per axis next to the score (the
    shipped synonym/paraphrase tables under-cover WordNet /
    paraphrase-en.gz, so the stage-on value lower-bounds the jar along
    that axis; the band width shows how much the axis moves the number
    on THIS data).  paraphrase_file defaults to the shipped curated
    caption-domain table (data/meteor_paraphrases.txt)."""
    syn = _synonym_groups(synonym_file) if use_synonyms else {}
    syn_stem = _synonym_groups_by_stem(synonym_file) if use_synonyms else {}
    if paraphrase_file is None and use_paraphrases:
        paraphrase_file = op.join(_DATA_DIR, "meteor_paraphrases.txt")
    par = _paraphrases(paraphrase_file) \
        if (paraphrase_file and use_paraphrases) else None
    scores = []
    for k in gts:
        hyp = res[k][0].split()
        best = 0.0
        for rs in gts[k]:
            best = max(best, meteor_sentence(hyp, rs.split(), syn, par,
                                             syn_stem))
        scores.append(best)
    arr = np.array(scores)
    return float(np.mean(arr)) if len(arr) else 0.0, arr
