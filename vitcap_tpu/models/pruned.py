"""Pruned-variant shape manifests (the reference zoo's
pytorch_image_models/timm/models/pruned/*.txt, consumed by
helpers.py:361-418 `adapt_model_from_string`).

Each manifest is a `key:[shape]***key:[shape]` state-dict shape map that
re-dimensions every conv/bn of a parent architecture (the pruning method
of arxiv 2002.08258).  The .txt files under assets/pruned/ are verbatim
DATA copies of the reference manifests — the channel widths ARE the
architecture definition, exactly like the CBS blacklist tables.

The plan builders (efficientnet.effnet_plan, backbones.init_resnet)
consume these shapes to re-dimension their per-block channel plans; the
torch state-dict loaders need nothing special (they are shape-driven).
"""

from __future__ import annotations

import os.path as op
from functools import lru_cache
from typing import Dict, List

_DIR = op.join(op.dirname(op.dirname(op.abspath(__file__))),
               "assets", "pruned")

PRUNED_VARIANTS = (
    "efficientnet_b1_pruned", "efficientnet_b2_pruned",
    "efficientnet_b3_pruned", "ecaresnet50d_pruned",
    "ecaresnet101d_pruned",
)


@lru_cache(maxsize=None)
def pruned_shapes(variant: str) -> Dict[str, List[int]]:
    """Parse `key:[d0, d1, ...]***...` into {state-dict key: shape}
    (helpers.py:362-370 split semantics; empty shape lists — the
    num_batches_tracked scalars — are dropped)."""
    out: Dict[str, List[int]] = {}
    with open(op.join(_DIR, variant + ".txt")) as f:
        for item in f.read().split("***"):
            key, shape = item.split(":")
            shape = shape.strip()[1:-1]
            if shape:
                out[key] = [int(x) for x in shape.split(",")]
    return out
