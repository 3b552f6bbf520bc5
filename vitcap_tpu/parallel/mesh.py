"""Device mesh + sharding rules.

TPU-native replacement for the reference's DDP/NCCL layer
(/root/reference/src/tools/torch_common.py:125-142,
uni_pipeline.py:497-505): instead of per-process NCCL process groups and
gradient all-reduce hooks, we build one `jax.sharding.Mesh` with ("data",
"model") axes and annotate shardings; XLA inserts the collectives over ICI.

- Data parallelism: batch sharded on "data"; replicated params make grad
  psum implicit in the jitted step (the analogue of DDP's backward hook).
- Tensor parallelism (optional; the model fits on one chip, but the axis is
  first-class): Megatron-style column/row sharding of attention and MLP
  kernels via `param_partition_specs`, with XLA inserting the all-reduces.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_multiprocess_mesh(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a batch data-sharded on the mesh.

    Single-process: plain device_put.  Multi-process: each process holds
    its RANK'S rows (the DistributedSampler already shards per rank,
    uni_pipeline.get_data_loader), so the local arrays are stitched into
    one global array via host_local_array_to_global_array — the JAX
    analogue of DDP's per-rank batches + implicit gradient all-reduce."""
    if is_multiprocess_mesh(mesh):
        import numpy as _np
        from jax.experimental import multihost_utils
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                _np.asarray(x), mesh, P(DATA_AXIS)), batch)
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def _leaf_spec(path, leaf) -> P:
    """Megatron-style specs for transformer kernels; everything else
    replicated.  Kernels are stored (in, out)."""
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
    name = "/".join(parts)
    nd = getattr(leaf, "ndim", 0)
    if nd == 2:
        # column-parallel: qkv fused proj, q/k/v, mlp up
        if any(k in name for k in ("attn/qkv", "self/query", "self/key",
                                   "self/value", "mlp/fc1",
                                   "intermediate/dense")):
            if name.endswith("kernel"):
                return P(None, MODEL_AXIS)
        # row-parallel: attention out-proj, mlp down
        if any(k in name for k in ("attn/proj", "attention/output/dense",
                                   "mlp/fc2", "output/dense")):
            if name.endswith("kernel"):
                return P(MODEL_AXIS, None)
    if nd == 1:
        # biases of column-parallel layers are sharded on the same axis
        if any(k in name for k in ("attn/qkv", "self/query", "self/key",
                                   "self/value", "mlp/fc1",
                                   "intermediate/dense")) \
                and name.endswith("bias"):
            return P(MODEL_AXIS)
    return P()


def param_partition_specs(params: Params) -> Params:
    return jax.tree_util.tree_map_with_path(_leaf_spec, params)


def shard_params(params: Params, mesh: Mesh,
                 tensor_parallel: bool = False) -> Params:
    if tensor_parallel:
        specs = param_partition_specs(params)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs)
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)
