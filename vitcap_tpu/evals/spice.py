"""SPICE-lite: JVM-free semantic-propositional caption scoring.

The reference evaluates SPICE through the external Java
`spice-1.0.jar` (reference src/tools/captioning/utils_caption_evaluate.py's
COCOEvalCap path; the jar is a user-side download the repo shells out to).
SPICE (Anderson et al., ECCV 2016) parses captions into scene graphs —
objects, (object, attribute) and (subject, relation, object) tuples — and
scores the F1 of tuple matching between a candidate and the union of its
references, with lemma-level matching.

This module reimplements that *semantic-tuple F1* without a dependency
parser: a compact rule-based POS tagger (closed-class lexicon + suffix
heuristics, captions are syntactically simple) feeds an NP-chunker and
pattern-based relation extractor, and tuples match on Porter stems.  It
tracks Java SPICE's ranking behavior, not its absolute values — reported as
`SPICE` in .report files with this caveat documented (see coco_eval.py).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# rule-based POS tagging (captions only need a coarse tagset)
# ---------------------------------------------------------------------------

_DT = {"a", "an", "the", "this", "that", "these", "those", "some", "any",
       "no", "each", "every", "another", "other", "its", "his", "her",
       "their", "our", "my", "your"}
_IN = {"of", "in", "on", "at", "with", "by", "from", "to", "for", "over",
       "under", "near", "above", "below", "behind", "between", "through",
       "against", "during", "without", "inside", "outside", "across",
       "around", "along", "onto", "upon", "beside", "among", "into", "off",
       "up", "down", "atop", "towards", "toward", "underneath", "beneath",
       "amongst", "past", "beyond"}
_CC = {"and", "or", "but", "nor"}
_PRP = {"he", "she", "it", "they", "them", "him", "we", "you", "i", "who",
        "which", "there"}
_AUX = {"is", "are", "was", "were", "be", "been", "being", "has", "have",
        "had", "does", "do", "did", "can", "could", "will", "would",
        "shall", "should", "may", "might", "must"}
_ADJ = {"red", "green", "blue", "yellow", "black", "white", "brown",
        "orange", "purple", "pink", "gray", "grey", "golden", "silver",
        "dark", "light", "bright", "colorful",
        "big", "small", "large", "little", "huge", "tiny", "giant",
        "old", "young", "new", "tall", "short", "long", "wide", "narrow",
        "high", "low", "thin", "thick", "round", "square",
        "wooden", "metal", "plastic", "glass", "stone", "brick", "leather",
        "empty", "full", "open", "closed", "dirty", "clean", "wet", "dry",
        "hot", "cold", "warm", "fresh", "busy", "crowded", "quiet",
        "beautiful", "pretty", "cute", "happy", "sad", "angry", "smiling",
        "striped", "spotted", "checkered", "shiny", "rusty", "broken",
        "modern", "vintage", "several", "many", "few", "various", "different",
        "one", "two", "three", "four", "five", "six", "seven", "eight",
        "nine", "ten"}
_JJ_SUFFIX = ("ful", "ous", "ive", "able", "ible", "less", "ish", "ed")
_COMMON_VERBS = {"sit", "sits", "sitting", "stand", "stands", "standing",
                 "walk", "walks", "walking", "run", "runs", "running",
                 "ride", "rides", "riding", "hold", "holds", "holding",
                 "wear", "wears", "wearing", "eat", "eats", "eating",
                 "play", "plays", "playing", "look", "looks", "looking",
                 "fly", "flies", "flying", "jump", "jumps", "jumping",
                 "drive", "drives", "driving", "carry", "carries",
                 "carrying", "hang", "hangs", "hanging", "lay", "lays",
                 "laying", "lie", "lies", "lying", "park", "parked",
                 "filled", "covered", "topped", "surrounded", "perched",
                 "placed", "stacked", "leaning", "grazing", "posing",
                 "watching", "talking", "sleeping", "swimming", "cooking",
                 "reading", "writing", "smiling", "pointing", "reaching"}


def _tag(tokens: Sequence[str]) -> List[Tuple[str, str]]:
    """Coarse tagset: DT, IN, CC, PRP, AUX, VB, JJ, RB, NN."""
    out = []
    for i, w in enumerate(tokens):
        lw = w.lower()
        if lw in _DT:
            t = "DT"
        elif lw in _IN:
            t = "IN"
        elif lw in _CC:
            t = "CC"
        elif lw in _PRP:
            t = "PRP"
        elif lw in _AUX:
            t = "AUX"
        elif lw in _COMMON_VERBS:
            t = "VB"
        elif lw in _ADJ:
            t = "JJ"
        elif lw.endswith("ly") and len(lw) > 3:
            t = "RB"
        elif lw.endswith("ing") and len(lw) > 4:
            t = "VB"          # gerunds: mostly verbal in captions
        elif lw.endswith(_JJ_SUFFIX) and len(lw) > 4:
            t = "JJ"
        elif lw.isalpha():
            t = "NN"
        else:
            t = "SYM"
        out.append((lw, t))
    return out


# ---------------------------------------------------------------------------
# scene-graph tuple extraction
# ---------------------------------------------------------------------------

def _chunk_nps(tagged: List[Tuple[str, str]]
               ) -> List[Tuple[int, int, str, List[str]]]:
    """Greedy NP chunks (DT? (JJ|VB-participle)* NN+); returns
    (start, end, head_noun, attrs).  A VB directly before a noun acts as a
    participial modifier ('running water')."""
    nps = []
    i, n = 0, len(tagged)
    while i < n:
        j = i
        if j < n and tagged[j][1] == "DT":
            j += 1
        attrs = []
        while j < n and tagged[j][1] in ("JJ", "RB"):
            if tagged[j][1] == "JJ":
                attrs.append(tagged[j][0])
            j += 1
        # participial modifier only counts when a noun follows
        if j < n and tagged[j][1] == "VB" and j + 1 < n \
                and tagged[j + 1][1] == "NN":
            attrs.append(tagged[j][0])
            j += 1
        nouns = []
        while j < n and tagged[j][1] == "NN":
            nouns.append(tagged[j][0])
            j += 1
        if nouns:
            nps.append((i, j, nouns[-1], attrs + nouns[:-1]))
            i = j
        else:
            i = max(j, i + 1)
    return nps


def extract_tuples(tokens: Sequence[str]) -> Set[Tuple[str, ...]]:
    """Scene-graph tuples of a tokenized caption: {(obj), (obj, attr),
    (subj, pred, obj)} over Porter stems."""
    from .meteor import _ensure_stemmer, _stem
    _ensure_stemmer()
    tagged = _tag(list(tokens))
    nps = _chunk_nps(tagged)
    tuples: Set[Tuple[str, ...]] = set()

    def stem(w: str) -> str:
        return _stem(w)

    for _, _, head, attrs in nps:
        tuples.add((stem(head),))
        for a in attrs:
            tuples.add((stem(head), stem(a)))

    # relations between consecutive NPs: NP (AUX)? (VB)? (IN)? NP
    for a, b in zip(nps, nps[1:]):
        gap = tagged[a[1]:b[0]]
        words = [w for w, t in gap if t in ("VB", "IN")]
        kinds = {t for _, t in gap}
        if not gap or kinds - {"VB", "IN", "AUX", "RB"}:
            continue                       # something else intervenes
        if not words:
            continue
        pred = " ".join(stem(w) for w in words[:2])
        tuples.add((stem(a[2]), pred, stem(b[2])))
    return tuples


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def spice(gts: Dict[str, List[str]], res: Dict[str, List[str]]
          ) -> Tuple[float, np.ndarray]:
    """Mean per-image tuple F1 (SPICE-lite).  gts/res: key -> [sentences]
    (PTB-tokenized strings, same surface as the other metrics)."""
    scores = []
    for k in gts:
        cand = extract_tuples(res[k][0].split())
        ref: Set[Tuple[str, ...]] = set()
        for r in gts[k]:
            ref |= extract_tuples(r.split())
        if not cand or not ref:
            scores.append(0.0)
            continue
        matched = len(cand & ref)
        p = matched / len(cand)
        r = matched / len(ref)
        scores.append(0.0 if p + r == 0 else 2 * p * r / (p + r))
    arr = np.array(scores)
    return float(np.mean(arr)) if len(arr) else 0.0, arr
