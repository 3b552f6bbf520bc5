"""Pruned-variant shape manifests (derived from the reference zoo's
pytorch_image_models/timm/models/pruned/*.txt, consumed there by
helpers.py:361-418 `adapt_model_from_string`).

Each reference manifest is a `key:[shape]***...` state-dict shape map
that re-dimensions every conv/bn of a parent architecture (the pruning
method of arxiv 2002.08258).  assets/pruned/*.json hold the DERIVED
subset this package actually consumes — only the conv/SE weight shapes,
re-encoded as JSON (the channel widths are the architecture definition,
like the CBS blacklist tables; bn/num_batches entries are redundant
with the conv dims and dropped).

The plan builders (efficientnet.effnet_plan, backbones.init_resnet)
consume these shapes to re-dimension their per-block channel plans; the
torch state-dict loaders need nothing special (they are shape-driven).
"""

from __future__ import annotations

import json
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
    """{torch state-dict key: weight shape} for the pruned variant."""
    with open(op.join(_DIR, variant + ".json")) as f:
        return json.load(f)
