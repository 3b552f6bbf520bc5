"""Constrained-beam-search throughput on the real chip (beam 5, S=32).

Sparse-FSM search (the production path): per-image constraints become a
few-KB descriptor; the search costs one V-wide top-K per live beam, like
unconstrained beam search.  `--dense 1` opts into the (B, S, S, V)
adjacency path for comparison (infeasible at the real vocab beyond tiny
batch sizes).

Usage: python benchmarks/bench_cbs.py [--batch 8]
Prints one JSON line.
"""

import argparse
import json
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from vitcap_tpu.utils.common import asset_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dense", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.models import decode as D
    from vitcap_tpu.models import cbs as C
    from vitcap_tpu.models.layers import patchify_host
    from vitcap_tpu.data.tokenization import BertTokenizer

    cfg = ModelConfig(dtype="bfloat16")
    B = args.batch
    OD = cfg.max_seq_len - cfg.max_seq_a_len
    opts = D.DecodeOptions(max_length=cfg.max_gen_length,
                           od_labels_start_posid=cfg.max_seq_a_len)
    params = M.init_params(jax.random.PRNGKey(0), cfg)

    tok = BertTokenizer(
        asset_path("VILT-L12-H784-uncased_16_384", "vocab.txt"))
    builder = C.FiniteStateMachineBuilder(
        tok, {}, {"dog": ["dog", "dogs"], "cat": ["cat", "cats"],
                  "car": ["car", "cars"]}, max_given_constraints=3)
    cons = [["dog", "cat", "car"], ["dog", "cat"], ["car"]]
    sparse_fsms = [C.build_sparse_fsm(builder, cons[i % len(cons)])
                   for i in range(B)]
    sfsm_np = C.sparse_batch(sparse_fsms)
    sfsm = {k: jnp.asarray(v) for k, v in sfsm_np.items()}

    rng = np.random.RandomState(0)
    raw = rng.randn(B, cfg.img_size, cfg.img_size, 3).astype(np.float32)
    images = jnp.asarray(np.stack([patchify_host(r, cfg.patch_size)
                                   for r in raw]))
    od_ids = jnp.asarray(rng.randint(999, 9000, (B, OD)), jnp.int32)
    seq_len = jnp.full((B,), cfg.max_seq_len, jnp.int32)

    if args.dense:
        fsm = jnp.asarray(np.stack([f.densify() for f in sparse_fsms]))

        @jax.jit
        def run(params, images, od_ids, seq_len, fsm):
            out = C.constrained_beam_search(
                params, images, od_ids, None, seq_len, fsm, cfg, opts,
                beam_size=5)
            return out["ids"], out["logprobs"]

        fargs = (params, images, od_ids, seq_len, fsm)
        label = "dense"
    else:
        @jax.jit
        def run(params, images, od_ids, seq_len, sfsm):
            out = C.constrained_beam_search_sparse(
                params, images, od_ids, None, seq_len, sfsm, cfg, opts,
                beam_size=5)
            return out["ids"], out["logprobs"]

        fargs = (params, images, od_ids, seq_len, sfsm)
        label = "sparse"

    ids, lp = run(*fargs)       # compile
    np.asarray(ids)             # host fetch = authoritative sync
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ids, lp = run(*fargs)
    np.asarray(ids)
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": f"CBS beam-5 captions/sec/chip ({label}, S=32, B={B})",
        "value": round(B / dt, 2),
        "unit": "captions/s",
    }))


if __name__ == "__main__":
    main()
