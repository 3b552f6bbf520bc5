"""Native checkpointing with reference-compatible layout.

Mirrors the reference Checkpointer semantics
(/root/reference/src/tools/opt/checkpoint.py:152-273):
`snapshot/model_iter_{:07d}.ckpt` naming, a `last_checkpoint` pointer file,
`recover_or_load(basemodel, model_only=True)` that prefers the last snapshot
and otherwise initializes from a base model (either a torch `.pt` through
solver.checkpoint_bridge, or a native ckpt).

Serialization is flax msgpack over the pure pytree state (params + AdamW
moments + iteration) written atomically (tmp + rename, like the reference's
tsv writers).
"""

from __future__ import annotations

import logging
import os
import os.path as op
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..utils.common import ensure_directory

Params = Dict[str, Any]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_state(path: str, state: Dict[str, Any]) -> None:
    ensure_directory(op.dirname(path))
    blob = serialization.msgpack_serialize(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_state(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        ensure_directory(save_dir)

    def checkpoint_path(self, iteration: int) -> str:
        return op.join(self.save_dir, f"model_iter_{iteration:07d}.ckpt")

    @property
    def pointer_file(self) -> str:
        return op.join(self.save_dir, "last_checkpoint")

    def save(self, iteration: int, state: Dict[str, Any]) -> str:
        path = self.checkpoint_path(iteration)
        save_state(path, dict(state, iteration=np.int64(iteration)))
        with open(self.pointer_file + ".tmp", "w") as f:
            f.write(path)
        os.replace(self.pointer_file + ".tmp", self.pointer_file)
        logging.info("saved %s", path)
        return path

    def has_checkpoint(self) -> bool:
        return op.isfile(self.pointer_file)

    def last_checkpoint(self) -> Optional[str]:
        if not self.has_checkpoint():
            return None
        with open(self.pointer_file) as f:
            path = f.read().strip()
        return path if op.isfile(path) else None

    def recover_or_load(self, basemodel: Optional[str], params: Params
                        ) -> Tuple[Params, Optional[Dict[str, Any]], int]:
        """Returns (params, full_state_or_None, start_iteration).

        Priority: last snapshot (full resume) > basemodel (.pt torch or
        native .ckpt, params only) > given init params.
        """
        last = self.last_checkpoint()
        if last:
            state = load_state(last)
            logging.info("recovered %s", last)
            return state["params"], state, int(state.get("iteration", 0))
        if basemodel:
            if basemodel.endswith(".pt") or basemodel.endswith(".pth"):
                from .checkpoint_bridge import load_torch_state_dict, \
                    load_params_from_torch
                sd = load_torch_state_dict(basemodel)
                params, report = load_params_from_torch(params, sd)
                logging.info(
                    "loaded torch basemodel %s (matched=%d missing=%d "
                    "mismatch=%d)", basemodel, len(report["matched"]),
                    len(report["missing"]), len(report["shape_mismatch"]))
            else:
                state = load_state(basemodel)
                params = state["params"] if "params" in state else state
                logging.info("loaded native basemodel %s", basemodel)
        return params, None, 0
