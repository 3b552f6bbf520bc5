"""TPU kernel ops (Pallas) + backend selection.

VITCAP_PALLAS env var: '1' force the Pallas flash-attention kernel,
'interpret' run it in interpreter mode (CPU correctness testing), '0' force
the XLA attention path, 'auto' (default) pick per platform.

'auto' resolves to the Pallas kernel on TPU and XLA elsewhere: the one-pass
heads-per-cell kernel (flash_attention._flash_fwd_onepass) measures 370.6
captions/s vs XLA's 355 on the greedy bench (ViT-B/16-384, B=32, v5e), and
its f32 score accumulation is *more* exact than the bf16-scores XLA path.
CPU (tests, golden parity) stays on the XLA reference path.
"""

import contextlib
import functools
import os

_INFERENCE_DEPTH = 0


@contextlib.contextmanager
def inference_mode():
    """Marks a trace as inference: 'auto' resolves to the Pallas kernel
    inside (its recompute-based backward makes training ~20% slower, so the
    kernel only auto-engages where no gradient will flow)."""
    global _INFERENCE_DEPTH
    _INFERENCE_DEPTH += 1
    try:
        yield
    finally:
        _INFERENCE_DEPTH -= 1


@functools.lru_cache(None)
def _on_tpu() -> bool:
    try:
        import jax
        return jax.default_backend() not in ("cpu",)
    except Exception:                                  # pragma: no cover
        return False


def attention_backend() -> str:
    """'pallas' | 'pallas_interpret' | 'xla'."""
    mode = os.environ.get("VITCAP_PALLAS", "auto").lower()
    if mode == "interpret":
        return "pallas_interpret"
    if mode == "1":
        return "pallas"
    if mode == "auto" and _INFERENCE_DEPTH and _on_tpu():
        return "pallas"
    return "xla"


def train_attention_backend() -> str:
    """Backend for gradient-carrying attention (the training forward):
    'pallas' routes self-attention without prob-dropout through the fused
    flash kernel with the PALLAS BACKWARD (ops.flash_attention._bwd
    one-pass dq/dk/dv) instead of XLA's materialized-probs attention.
    Measured (v5e, B=64 trunk shape, fwd+bwd): XLA 16 ms/block -> pallas
    ~4 ms/block — XLA's backward reads/writes the (B, 12, L, L) prob
    tensor, ~10 GB/step of HBM traffic at B=64.

    VITCAP_TRAIN_PALLAS: '1' force, '0' XLA, 'interpret' CPU-test mode,
    'auto' (default) = pallas on TPU."""
    mode = os.environ.get("VITCAP_TRAIN_PALLAS", "auto").lower()
    if mode == "interpret":
        return "pallas_interpret"
    if mode == "1":
        return "pallas"
    if mode == "0":
        return "xla"
    return "pallas" if _on_tpu() else "xla"
