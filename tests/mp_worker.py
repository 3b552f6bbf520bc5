"""Subprocess worker for the true multi-process tests
(test_multiprocess.py).  Each instance is one `jax.distributed` process
joining a 2-process CPU cluster (Gloo collectives), with
MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK provided via env — exercising
ensure_init_distributed's reference-style env plumbing
(/root/reference/src/tools/common.py:528-548).

Modes:
  step     — one jitted DP train step over the GLOBAL mesh on a fixed
             synthetic batch (this rank holds its contiguous row slice);
             dumps loss + updated params for exact comparison with a
             single-process step.
  pipeline — full tiny train/predict/evaluate through run.py's
             pipeline_train_eval_multi: per-rank TSV shard write + rank-0
             concat/dedup/reorder merge (uni_pipeline.predict).
"""

import json
import os
import sys


def main():
    mode, rank, world, port, workdir = sys.argv[1:6]
    rank, world = int(rank), int(world)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["MASTER_ADDR"] = "127.0.0.1"
    os.environ["MASTER_PORT"] = port
    os.environ["WORLD_SIZE"] = str(world)
    os.environ["RANK"] = str(rank)
    sys.path.insert(0, "/root/repo")

    import jax
    jax.config.update("jax_platforms", "cpu")
    from vitcap_tpu.parallel.distributed import ensure_init_distributed
    ensure_init_distributed()
    assert jax.process_count() == world, jax.process_count()

    if mode == "step":
        run_step(rank, world, workdir)
    elif mode == "pipeline":
        run_pipeline(rank, world, workdir)
    else:
        raise SystemExit(f"unknown mode {mode}")


def fixed_batch(B):
    import numpy as np
    from vitcap_tpu.models.config import tiny_config
    cfg = tiny_config(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    rng = np.random.RandomState(0)
    T, A = cfg.max_seq_len, cfg.max_seq_a_len
    batch = {
        "image": rng.randn(B, cfg.img_size, cfg.img_size, 3).astype(
            np.float32),
        "input_ids": rng.randint(4, cfg.vocab_size, (B, T)).astype(np.int32),
        "token_type_ids": np.concatenate(
            [np.zeros((B, A), np.int32), np.ones((B, T - A), np.int32)], 1),
        "seq_a_len": np.full((B,), A, np.int32),
        "seq_len": np.full((B,), T, np.int32),
        "masked_pos": np.zeros((B, T), np.int32),
        "masked_ids": np.zeros((B, cfg.max_masked_tokens), np.int32),
        "label": (rng.rand(B, cfg.tag_vocab_size) < 0.05).astype(np.float32),
    }
    batch["masked_pos"][:, 1] = 1
    batch["masked_ids"][:, 0] = 7
    return cfg, batch


def run_step(rank, world, workdir):
    import numpy as np
    import jax
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.parallel.mesh import make_mesh, shard_batch, \
        shard_params
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)

    B = 8
    cfg, batch = fixed_batch(B)
    lo, hi = rank * (B // world), (rank + 1) * (B // world)
    local = {k: v[lo:hi] for k, v in batch.items()}

    mesh = make_mesh(n_data=jax.device_count())
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    state = init_train_state(params, jax.random.PRNGKey(1))
    hyper = TrainHyper(base_lr=1e-3, max_iter=10)
    step_fn = make_jitted_train_step(cfg, hyper, mesh)
    dev = shard_batch(local, mesh)
    state, metrics = step_fn(state, dev)
    loss = float(metrics["loss"])
    leaves = jax.tree_util.tree_leaves(state.params)
    flat = np.concatenate([np.asarray(x).ravel() for x in leaves])
    if rank == 0:
        np.savez(os.path.join(workdir, "mp_step.npz"), loss=loss, flat=flat)
    print(f"rank {rank}: step loss {loss}", flush=True)


def run_pipeline(rank, world, workdir):
    import run as R
    with open(os.path.join(workdir, "param.json")) as f:
        param = json.load(f)
    all_test = [{"test_data": param["test_data"],
                 "test_split": param["test_split"]}]
    results = R.pipeline_train_eval_multi(all_test, param)
    # exit together: rank 0 evaluates for minutes after the others are
    # done; a peer exiting early trips jax.distributed's shutdown-barrier
    # timeout and kills the run
    from vitcap_tpu.parallel.distributed import barrier
    barrier("pipeline_done")
    print(f"rank {rank}: pipeline done {results}", flush=True)


if __name__ == "__main__":
    main()
