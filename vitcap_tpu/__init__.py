"""vitcap_tpu: a TPU-native JAX framework with the capabilities of ViTCAP.

Re-designed from scratch for TPU (jax/XLA/pallas/pjit); behavioral reference is
jacobswan1/ViTCAP (see SURVEY.md).  The compute path is pure JAX; the runtime
around it (TSV IO, tokenization hot loops) has native C++ components.
"""

__version__ = "0.1.0"
