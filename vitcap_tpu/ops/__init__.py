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
