"""Torch `.pt` checkpoint <-> JAX param-tree bridge.

Reads the reference's checkpoint format ({'model': state_dict, ...} or a bare
state_dict) and maps it onto the vitcap_tpu param tree, reproducing the
reference loader's tolerant semantics: DDP `module.` prefixes are irrelevant
because target names are resolved by longest-suffix matching, and
shape-mismatched tensors are skipped with a warning.

Behavioral reference: ViTCAP src/tools/opt/checkpoint.py
(align_and_update_state_dicts :18-83) and src/tools/torch_common.py
(load_model_state_ignore_mismatch :283-316).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Tuple

import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# param-tree flattening
# ---------------------------------------------------------------------------

def flatten_params(params: Params, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = params
    return out


def set_by_path(params: Params, path: str, value: Any) -> None:
    parts = path.split("/")
    cur = params
    for p in parts[:-1]:
        cur = cur[int(p)] if isinstance(cur, (list, tuple)) else cur[p]
    last = parts[-1]
    if isinstance(cur, (list, tuple)):
        cur[int(last)] = value
    else:
        cur[last] = value


# ---------------------------------------------------------------------------
# jax-path -> torch-name translation
# ---------------------------------------------------------------------------

_LEAF_MAP = {
    "scale": "weight",      # LayerNorm scale
    "kernel": "weight",     # Dense / Conv kernel (transposed)
}


def jax_path_to_torch_name(path: str) -> Tuple[str, str]:
    """Translate a flattened param path to (torch name suffix, transform).

    transform in {'linear_t', 'conv_whio_to_oihw', 'none'}.
    """
    parts = path.split("/")
    leaf = parts[-1]
    transform = "none"
    torch_parts: List[str] = []

    if parts[0] == "image_encoder":
        # our flat image encoder <- InputAsDict(timm ViT) 'image_encoder.module.'
        torch_parts = ["image_encoder", "module"]
        if parts[1] == "patch_proj":
            torch_parts += ["patch_embed", "proj", _LEAF_MAP.get(leaf, leaf)]
            if leaf == "kernel":
                transform = "conv_hwio_to_oihw"
        else:  # cls_token / pos_embed
            torch_parts += [parts[1]]
        return ".".join(torch_parts), transform

    if parts[0] == "encoder":
        # module.bert.encoder.{blocks,tag_blocks}.N....
        torch_parts = ["bert", "encoder", parts[1], parts[2]] + parts[3:-1]
        torch_parts.append(_LEAF_MAP.get(leaf, leaf))
        if leaf == "kernel":
            transform = "linear_t"
        return ".".join(torch_parts), transform

    if parts[0] in ("embeddings", "extra_embeddings"):
        torch_parts = ["bert", parts[0]] + parts[1:-1]
        if parts[1] in ("word_embeddings", "position_embeddings",
                        "token_type_embeddings"):
            # embedding matrices keep (num, dim) layout; leaf IS the module
            torch_parts = ["bert", parts[0], parts[1], "weight"]
            return ".".join(torch_parts), "none"
        torch_parts.append(_LEAF_MAP.get(leaf, leaf))
        if leaf == "kernel":
            transform = "linear_t"
        return ".".join(torch_parts), transform

    if parts[0] in ("pooler", "caption_pooler"):
        torch_parts = ["bert", parts[0]] + parts[1:-1]
        torch_parts.append(_LEAF_MAP.get(leaf, leaf))
        if leaf == "kernel":
            transform = "linear_t"
        return ".".join(torch_parts), transform

    if parts[0] == "tag_logit" or parts[0] == "cls":
        head = ["bert", "tag_logit"] if parts[0] == "tag_logit" else ["cls"]
        if parts[1] == "decoder":
            if leaf == "bias":
                return ".".join(head + ["predictions", "bias"]), "none"
            return ".".join(head + ["predictions", "decoder", "weight"]), \
                "linear_t"
        torch_parts = head + ["predictions"] + parts[1:-1]
        torch_parts.append(_LEAF_MAP.get(leaf, leaf))
        if leaf == "kernel":
            transform = "linear_t"
        return ".".join(torch_parts), transform

    if parts[0] == "decoder":
        torch_parts = ["bert", "decoder"] + parts[1:-1]
        torch_parts.append(_LEAF_MAP.get(leaf, leaf))
        if leaf == "kernel":
            transform = "linear_t"
        return ".".join(torch_parts), transform

    raise KeyError(f"no torch mapping for param path {path!r}")


def _apply_transform(arr: np.ndarray, transform: str) -> np.ndarray:
    if transform == "linear_t":
        return np.ascontiguousarray(arr.T)
    if transform == "conv_hwio_to_oihw":
        # torch conv (O, I, kh, kw) -> jax HWIO (kh, kw, I, O)
        return np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
    return arr


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a .pt and return {name: numpy array}; unwraps the
    {'model': ...} container (reference checkpoint.py:170-190)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(
            ckpt["model"], dict):
        sd = ckpt["model"]
    else:
        sd = ckpt
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _suffix_match(target: str, keys: List[str]) -> str | None:
    """Longest-suffix key matching (reference checkpoint.py:18-83): pick the
    state-dict key whose dot-suffix equals the target (DDP prefixes vary)."""
    best = None
    best_len = -1
    for k in keys:
        if k == target or k.endswith("." + target):
            if len(target) > best_len:
                best = k
                best_len = len(target)
    return best


def load_params_from_torch(params: Params, sd: Dict[str, np.ndarray],
                           strict: bool = False) -> Tuple[Params, Dict]:
    """Fill the param tree from a torch state dict.  Returns (params, report)
    where report lists matched / missing / shape-skipped entries."""
    import jax.numpy as jnp

    flat = flatten_params(params)
    keys = list(sd.keys())
    report = {"matched": [], "missing": [], "shape_mismatch": [],
              "unused": set(keys)}
    for path, cur in flat.items():
        torch_name, transform = jax_path_to_torch_name(path)
        src_key = _suffix_match(torch_name, keys)
        if src_key is None:
            report["missing"].append((path, torch_name))
            continue
        arr = _apply_transform(np.asarray(sd[src_key]), transform)
        if tuple(arr.shape) != tuple(cur.shape):
            report["shape_mismatch"].append(
                (path, src_key, tuple(arr.shape), tuple(cur.shape)))
            report["unused"].discard(src_key)
            continue
        set_by_path(params, path, jnp.asarray(arr, dtype=cur.dtype))
        report["matched"].append((path, src_key))
        report["unused"].discard(src_key)
    if report["missing"]:
        logging.info("checkpoint bridge: %d params had no torch source: %s",
                     len(report["missing"]),
                     [m[1] for m in report["missing"]][:10])
    if report["shape_mismatch"]:
        logging.warning("checkpoint bridge: shape-skipped %s",
                        report["shape_mismatch"][:10])
    if strict and (report["missing"] or report["shape_mismatch"]):
        raise ValueError(f"strict load failed: {report}")
    return params, report


def params_to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Export the param tree as a reference-named torch state dict (for
    interop / writing .pt checkpoints the reference can read)."""
    out: Dict[str, np.ndarray] = {}
    for path, arr in flatten_params(params).items():
        torch_name, transform = jax_path_to_torch_name(path)
        a = np.asarray(arr)
        if transform == "linear_t":
            a = np.ascontiguousarray(a.T)
        elif transform == "conv_hwio_to_oihw":
            a = np.ascontiguousarray(a.transpose(3, 2, 0, 1))
        prefix = "module." if not torch_name.startswith("image_encoder") else ""
        out[prefix + torch_name] = a
    return out


def convert_vit_cls_state_dict_to_caption(sd: Dict[str, np.ndarray]
                                          ) -> Dict[str, np.ndarray]:
    """Re-key a classification-pretrained ViT state dict into the caption
    checkpoint namespace (reference convert_vit_cls_model_to_caption,
    …expanding.py:89-106 / torch_common.py:374-391): transformer blocks go
    under 'module.bert.encoder.', everything else (patch embed, cls token,
    pos embed) under 'image_encoder.module.'."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        while k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("blocks."):
            out["module.bert.encoder." + k] = v
        else:
            out["image_encoder.module." + k] = v
    return out
