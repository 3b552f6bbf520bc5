"""HF-style `save_pretrained` / `from_pretrained` for the ViTCAP model.

Behavioral reference: ViTCAP src/layers/bert/modeling_utils.py —
`PretrainedConfig.save_pretrained`/`from_pretrained` (:80-123) and
`PreTrainedModel.save_pretrained`/`from_pretrained` (:324-533).  The
reference persists a directory of `config.json` + `pytorch_model.bin`;
loading re-reads the config, instantiates the model, and fuzzy-loads the
weights.

This implementation keeps that directory contract while staying
interoperable in BOTH directions:

- `config.json` carries the standard BertConfig keys at the top level (the
  same schema `CaptionUniPipeline.model_cfg` ingests from
  `text_encoder_type`, caption_pipeline.py) plus the full ModelConfig as a
  `"vitcap"` section for exact round-trips.
- weights are written as `pytorch_model.bin` — a torch-layout state dict
  produced by the checkpoint bridge, so the reference's own
  `from_pretrained`/`Checkpointer` can read what we save.  When torch is
  unavailable the weights fall back to flax msgpack (`model.msgpack`);
  `from_pretrained` auto-detects either file.
- loading goes through the bridge's suffix-matching, shape-tolerant path
  (checkpoint.py:18-83 semantics), so DDP `module.` prefixes and foreign
  key layouts load like they do in the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as op
import shutil
from typing import Any, Dict, Optional, Tuple

from .config import ModelConfig

Params = Dict[str, Any]

CONFIG_NAME = "config.json"
WEIGHTS_NAME = "pytorch_model.bin"      # reference modeling_utils.py:31
NATIVE_WEIGHTS_NAME = "model.msgpack"
VOCAB_NAME = "vocab.txt"


def config_to_json_dict(cfg: ModelConfig) -> Dict[str, Any]:
    """BertConfig-schema dict + a `vitcap` section with every ModelConfig
    field (exact round-trip)."""
    full = dataclasses.asdict(cfg)
    return {
        "model_type": "bert",
        "hidden_size": cfg.hidden_size,
        "num_attention_heads": cfg.num_attention_heads,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "type_vocab_size": cfg.type_vocab_size,
        "layer_norm_eps": cfg.bert_layer_norm_eps,
        "hidden_dropout_prob": cfg.hidden_dropout_prob,
        "attention_probs_dropout_prob": cfg.attention_probs_dropout_prob,
        "vitcap": full,
    }


def config_from_json_dict(j: Dict[str, Any], **overrides) -> ModelConfig:
    """Rebuild a ModelConfig.  Prefers the exact `vitcap` section; falls
    back to the plain BertConfig keys (foreign config.json files, e.g. the
    reference's VILT dir) with ModelConfig defaults for the rest."""
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    if "vitcap" in j:
        kw = {k: v for k, v in j["vitcap"].items() if k in fields}
    else:
        kw = {k: v for k, v in j.items() if k in fields}
        if "layer_norm_eps" in j:
            kw["bert_layer_norm_eps"] = j["layer_norm_eps"]
    unknown = set(overrides) - fields
    if unknown:
        raise ValueError(f"unknown ModelConfig overrides: {sorted(unknown)}")
    kw.update(overrides)
    return ModelConfig(**kw)


def save_pretrained(save_directory: str, params: Params, cfg: ModelConfig,
                    vocab_path: Optional[str] = None) -> None:
    """Write config.json + weights (+ optional vocab.txt copy) to
    `save_directory` so the directory round-trips through
    `from_pretrained` — and, via the torch-layout .bin, through the
    reference's loaders too."""
    os.makedirs(save_directory, exist_ok=True)
    with open(op.join(save_directory, CONFIG_NAME), "w") as f:
        json.dump(config_to_json_dict(cfg), f, indent=2, sort_keys=True)
    try:
        import torch
        from ..solver.checkpoint_bridge import params_to_torch_state_dict
        # the bridge emits reference-DDP `module.` prefixes (the .pt
        # snapshot convention); save_pretrained dirs are module-free
        # (reference modeling_utils.py:332 saves the unwrapped module)
        sd = {(k[len("module."):] if k.startswith("module.") else k):
              torch.from_numpy(v.copy())
              for k, v in params_to_torch_state_dict(params).items()}
        torch.save(sd, op.join(save_directory, WEIGHTS_NAME))
    except ImportError:
        from ..solver.checkpointing import save_state
        save_state(op.join(save_directory, NATIVE_WEIGHTS_NAME),
                   {"params": params})
    if vocab_path:
        shutil.copyfile(vocab_path, op.join(save_directory, VOCAB_NAME))


def from_pretrained(pretrained_dir: str, rng=None,
                    **config_overrides) -> Tuple[Params, ModelConfig]:
    """Load (params, cfg) from a `save_pretrained` directory (or any
    directory holding a BertConfig-style config.json next to a torch
    state-dict / msgpack weights file).  `config_overrides` update the
    config before the model is built, mirroring the reference's
    `from_pretrained(..., **kwargs)` override semantics
    (modeling_utils.py:110-123)."""
    import jax
    from . import vitcap as M

    cfg_file = (op.join(pretrained_dir, CONFIG_NAME)
                if op.isdir(pretrained_dir) else pretrained_dir)
    with open(cfg_file) as f:
        cfg = config_from_json_dict(json.load(f), **config_overrides)
    params = M.init_params(
        rng if rng is not None else jax.random.PRNGKey(0), cfg)

    base = op.dirname(cfg_file) if not op.isdir(pretrained_dir) \
        else pretrained_dir
    bin_path = op.join(base, WEIGHTS_NAME)
    native_path = op.join(base, NATIVE_WEIGHTS_NAME)
    if op.exists(bin_path):
        from ..solver.checkpoint_bridge import (load_params_from_torch,
                                                load_torch_state_dict)
        params, _ = load_params_from_torch(params,
                                           load_torch_state_dict(bin_path))
    elif op.exists(native_path):
        from ..solver.checkpointing import load_state
        state = load_state(native_path)
        params = jax.tree_util.tree_map(
            lambda ref, v: v, params, state["params"])
    else:
        raise FileNotFoundError(
            f"no {WEIGHTS_NAME} or {NATIVE_WEIGHTS_NAME} in {base}")
    return params, cfg
