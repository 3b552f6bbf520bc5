"""Native checkpointing with reference-compatible layout.

Mirrors the reference Checkpointer semantics
(/root/reference/src/tools/opt/checkpoint.py:152-273):
`snapshot/model_iter_{:07d}.ckpt` naming, a `last_checkpoint` pointer file,
`recover_or_load(basemodel, model_only=True)` that prefers the last snapshot
and otherwise initializes from a base model (either a torch `.pt` through
solver.checkpoint_bridge, or a native ckpt).

Serialization backends:
- `msgpack` (default): flax msgpack over the pure pytree state (params +
  AdamW moments + iteration), one file, written atomically (tmp + rename,
  like the reference's tsv writers).
- `orbax`: orbax.checkpoint StandardCheckpointer directories — the
  TPU-native format (sharded-array aware, multi-host coordinated), with
  optional async saves that overlap serialization with training
  (`Checkpointer(..., backend='orbax', async_save=True)`).
Loading auto-detects the format (file = msgpack, directory = orbax), so
the two interoperate behind the same `last_checkpoint` pointer.
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
    if op.isdir(path):                        # orbax checkpoint directory
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ck:
            return ck.restore(op.abspath(path))
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class Checkpointer:
    def __init__(self, save_dir: str, backend: str = "msgpack",
                 async_save: bool = False):
        assert backend in ("msgpack", "orbax"), backend
        self.save_dir = save_dir
        self.backend = backend
        self.async_save = async_save
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp
            # StandardCheckpointer is itself async under the hood; in sync
            # mode we block right after save so `last_checkpoint` is
            # immediately loadable
            self._orbax = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()) if async_save \
                else ocp.StandardCheckpointer()
        ensure_directory(save_dir)

    def checkpoint_path(self, iteration: int) -> str:
        suffix = ".orbax" if self.backend == "orbax" else ".ckpt"
        return op.join(self.save_dir, f"model_iter_{iteration:07d}{suffix}")

    @property
    def pointer_file(self) -> str:
        return op.join(self.save_dir, "last_checkpoint")

    def save(self, iteration: int, state: Dict[str, Any]) -> str:
        path = self.checkpoint_path(iteration)
        full = dict(state, iteration=np.int64(iteration))
        if self._orbax is not None:
            # orbax manages its own atomic tmp-then-rename; async handlers
            # return immediately and serialize in the background
            self._orbax.save(op.abspath(path), full, force=True)
            if not self.async_save:
                self._orbax.wait_until_finished()
        else:
            save_state(path, full)
        with open(self.pointer_file + ".tmp", "w") as f:
            f.write(path)
        os.replace(self.pointer_file + ".tmp", self.pointer_file)
        logging.info("saved %s", path)
        return path

    def save_tagged(self, tag: str, iteration: int,
                    state: Dict[str, Any]) -> str:
        """Diagnostic snapshot (e.g. `NaN_context_<rank>`, reference
        trainer.py:134-137) that does NOT advance `last_checkpoint`:
        resume keeps pointing at the last healthy snapshot instead of a
        post-NaN state."""
        suffix = ".orbax" if self.backend == "orbax" else ".ckpt"
        path = op.join(self.save_dir, f"{tag}{suffix}")
        full = dict(state, iteration=np.int64(iteration))
        if self._orbax is not None:
            self._orbax.save(op.abspath(path), full, force=True)
            if not self.async_save:
                self._orbax.wait_until_finished()
        else:
            save_state(path, full)
        logging.info("saved tagged snapshot %s (pointer unchanged)", path)
        return path

    def wait_until_finished(self) -> None:
        """Block on in-flight async orbax saves (call before exit)."""
        if self._orbax is not None and hasattr(self._orbax,
                                               "wait_until_finished"):
            self._orbax.wait_until_finished()

    def has_checkpoint(self) -> bool:
        return op.isfile(self.pointer_file)

    def last_checkpoint(self) -> Optional[str]:
        if not self.has_checkpoint():
            return None
        with open(self.pointer_file) as f:
            path = f.read().strip()
        if op.exists(path):
            return path
        # the pointer may name an async orbax save that never finalized
        # (crash mid-save) — fall back to the newest snapshot that actually
        # exists instead of discarding all earlier valid checkpoints
        import glob
        done = sorted(glob.glob(op.join(self.save_dir, "model_iter_*.ckpt"))
                      + glob.glob(op.join(self.save_dir,
                                          "model_iter_*.orbax")))
        return done[-1] if done else None

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
