"""TPU kernel ops (Pallas) + backend selection.

VITCAP_PALLAS env var: '1' force the Pallas flash-attention kernel,
'interpret' run it in interpreter mode (CPU correctness testing),
'0'/'auto' (default) use the XLA attention path.

Measured on TPU v5e (greedy captioning bench, ViT-B/16-384, B=32):
XLA 319.6 captions/s vs Pallas 297 — at the ViTCAP regime (L~577-650,
dh=64, bf16) XLA's fused attention outruns this kernel, so XLA is the
default and the kernel is an opt-in for larger-sequence experiments.
"""

import os


def attention_backend() -> str:
    """'pallas' | 'pallas_interpret' | 'xla'."""
    mode = os.environ.get("VITCAP_PALLAS", "auto").lower()
    if mode == "interpret":
        return "pallas_interpret"
    if mode == "1":
        return "pallas"
    return "xla"
