"""SCST (self-critical sequence training): CIDEr-optimization fine-tuning.

Re-design of the reference SCST branch
(/root/reference/src/pipelines/tagger_caption_uni_pipeline_expanding.py:404-478)
and ScstRewardCriterion
(/root/reference/src/tools/captioning/utils_caption_evaluate.py:162-241) as a
TPU-friendly three-phase step:

1. DECODE (jit, no grad): greedy baseline (B) + multinomial samples (B*K)
   through the cached decode engine (models.decode) — the reference instead
   backprops through an eager token loop.
2. REWARD (host): captions -> ' <eos>'-wrapped strings -> CiderD rewards
   (precomputed-df pickle or corpus mode); advantage = sample - greedy
   baseline (or leave-one-out mean for baseline_type='sample').
3. GRAD (jit): differentiable re-scoring of the sampled ids with a
   UniLM-style probe layout — one dense forward where slot A+t holds a MASK
   probe at position t attending [w_<t, itself, context], exactly
   reproducing the per-step MASK-peek distribution of the decode loop —
   then loss = mean(-mean_token_logprob * advantage).

Difference from the reference: sampling runs without dropout (the reference
samples in train mode, so its sampled logprobs see dropout noise); scoring
here is deterministic, which only changes the exploration distribution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import decode as D
from ..models import vitcap as M
from ..models.config import ModelConfig
from ..models.layers import NEG_MASK_VALUE, bert_embeddings
from ..evals.metrics import CiderD

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# reward (host side)
# ---------------------------------------------------------------------------

def wrap_sentence(s: str) -> str:
    """reference _wrap_sentence (utils_caption_evaluate.py:236-241)."""
    r = s.strip()
    if r.endswith("."):
        r = r[:-1]
    return r + " <eos>"


class ScstReward:
    def __init__(self, cider_cached_tokens: str = "corpus",
                 baseline_type: str = "greedy"):
        self.scorer = CiderD(df=cider_cached_tokens) \
            if cider_cached_tokens != "corpus" else CiderD(df="corpus")
        assert baseline_type in ("greedy", "sample")
        self.baseline_type = baseline_type
        self._cur_score: Optional[float] = None

    def __call__(self, gt_res: List[List[str]], greedy_res: List[str],
                 sample_res: List[str]) -> np.ndarray:
        """Returns per-sample advantage (B*K,)."""
        B = len(gt_res)
        K = len(sample_res) // B
        gen = list(sample_res)
        gt_idx = [i // K for i in range(len(sample_res))]
        if self.baseline_type == "greedy":
            gen += list(greedy_res)
            gt_idx += list(range(B))
        gts = {i: [wrap_sentence(c) for c in gt_res[gt_idx[i]]]
               for i in range(len(gen))}
        res = {i: [wrap_sentence(g)] for i, g in enumerate(gen)}
        _, scores = self.scorer.compute_score(gts, res)
        if self.baseline_type == "greedy":
            baseline = scores[-B:][:, None]
        else:
            sc = scores[: B * K].reshape(B, K)
            baseline = (sc.sum(1, keepdims=True) - sc) / (K - 1)
        reward = scores[: B * K].reshape(B, K)
        self._cur_score = float(reward.mean())
        return (reward - baseline).reshape(-1).astype(np.float32)

    def get_score(self) -> Optional[float]:
        return self._cur_score


# ---------------------------------------------------------------------------
# differentiable sequence scoring (probe layout)
# ---------------------------------------------------------------------------

def score_caption_logprobs(params: Params, images: jnp.ndarray,
                           od_ids: jnp.ndarray,
                           od_token_type_ids: Optional[jnp.ndarray],
                           seq_len: jnp.ndarray,
                           caption_ids: jnp.ndarray,
                           cfg: ModelConfig, opts: D.DecodeOptions,
                           target_ids: Optional[jnp.ndarray] = None,
                           visual_token_idx: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """Mean per-token logprob of a caption (Bk, A) under the model,
    Bk = B * num_return (images are repeated internally).  Matches the
    decode loop's normalization: sum logp over steps where the sentence was
    still unfinished / count (modeling_utils.py:870-874).

    target_ids: (Bk, A-1) raw per-step tokens (decode out['raw_tokens']).
    The loop's final step may force EOS into caption_ids while having
    recorded the logprob of the raw sampled token — attention uses
    caption_ids, targets use target_ids.  Defaults to caption_ids[:, 1:].
    """
    A = opts.max_length
    Bk = caption_ids.shape[0]
    B = images.shape[0]
    K = Bk // B

    ce = D.build_context_embeddings(params, images, od_ids,
                                    od_token_type_ids, seq_len, cfg, opts,
                                    visual_token_idx,
                                    inference=False)  # grads flow here
    ctx, ctx_valid = ce["ctx"], ce["ctx_valid"]
    if K > 1:
        ctx = jnp.repeat(ctx, K, axis=0)
        ctx_valid = jnp.repeat(ctx_valid, K, axis=0)
    S = ctx.shape[1]
    od_len = ce["od_len"]
    dtype = cfg.compute_dtype

    # text block: [real tokens (A) | MASK probes (A)], both at positions 0..A-1
    p = params["embeddings"]
    probe_ids = jnp.full((Bk, A), cfg.mask_token_id, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(A)[None], (Bk, A))
    real_emb = bert_embeddings(p, caption_ids, pos, jnp.zeros_like(pos),
                               cfg.bert_layer_norm_eps, dtype=dtype)
    probe_emb = bert_embeddings(p, probe_ids, pos, jnp.zeros_like(pos),
                                cfg.bert_layer_norm_eps, dtype=dtype)
    seq = jnp.concatenate([real_emb, probe_emb, ctx], axis=1)  # (Bk, 2A+S, H)
    L = 2 * A + S

    # mask: real_t -> real_<=t + ctx; probe_t -> real_<t + itself + ctx;
    # od rows -> valid od + tagCLS+vis; tagCLS/vis rows -> tagCLS+vis
    i = jnp.arange(A)
    allow = jnp.zeros((Bk, L, L), bool)
    tri = i[:, None] >= i[None, :]                  # real causal (incl self)
    allow = allow.at[:, :A, :A].set(tri[None])
    allow = allow.at[:, A:2 * A, :A].set((i[:, None] > i[None, :])[None])
    eye = jnp.eye(A, dtype=bool)
    allow = allow.at[:, A:2 * A, A:2 * A].set(eye[None])
    allow = allow.at[:, : 2 * A, 2 * A:].set(ctx_valid[:, None, :])
    is_od = jnp.arange(S) < od_len
    ctx_rows = jnp.where(is_od[None, :, None],
                         ctx_valid[:, None, :] & True,
                         (~is_od)[None, None, :])
    allow = allow.at[:, 2 * A:, 2 * A:].set(ctx_rows)
    bias = jnp.where(allow, 0.0, NEG_MASK_VALUE)[:, None]

    hidden = M.fusion_decoder(params, seq, bias, cfg)
    logits = M.caption_logits(params, hidden[:, A: 2 * A], cfg)  # (Bk, A, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # probe_t predicts token at position t, for t = 1..A-1
    tok = caption_ids[:, 1:] if target_ids is None else target_ids
    lp = jnp.take_along_axis(logp[:, 1:], tok[..., None],
                             axis=-1)[..., 0]              # (Bk, A-1)
    # unfinished weighting: step t counts if no EOS among w_1..w_{t-1}
    eos_before = jnp.cumsum(
        (caption_ids[:, 1:] == cfg.sep_token_id).astype(jnp.int32), axis=1)
    unfin = jnp.concatenate(
        [jnp.ones((Bk, 1)), (eos_before[:, :-1] == 0).astype(jnp.float32)],
        axis=1)                                            # (Bk, A-1)
    total = jnp.sum(lp * unfin, axis=1)
    count = jnp.maximum(jnp.sum(unfin, axis=1), 1.0)
    return total / count


# ---------------------------------------------------------------------------
# SCST train step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ScstConfig:
    num_return: int = 2               # cfg.scst_num_return
    baseline_type: str = "greedy"
    cider_cached_tokens: str = "corpus"
    # TokenSample: fraction of visual tokens kept during SCST (reference
    # cfg.random_token_sample, ~0.7 per README, for memory relief)
    visual_token_ratio: float = 1.0


def make_scst_fns(cfg: ModelConfig, opts: D.DecodeOptions,
                  scst: ScstConfig, hyper, mesh=None
                  ) -> Tuple[Callable, Callable]:
    """Returns (jit decode_fn, jit grad_step_fn).

    decode_fn(params, images, od_ids, tt, seq_len, rng) ->
        (greedy_ids (B,A), sample_ids (B*K,A))
    grad_step_fn(state, batch, sample_ids, advantages) -> (state, metrics)
    """
    from .train_step import TrainState
    from .optimization import (AdamWConfig, adamw_update,
                               caption_param_hypers, clip_by_global_norm,
                               warmup_linear)

    greedy_opts = dataclasses.replace(opts, num_beams=1, do_sample=False,
                                      num_return_sequences=1)
    sample_opts = dataclasses.replace(opts, num_beams=1, do_sample=True,
                                      num_return_sequences=scst.num_return)

    n_vis = cfg.num_visual_tokens
    keep = int(round(scst.visual_token_ratio * n_vis)) \
        if scst.visual_token_ratio < 1.0 else n_vis

    def decode_fn(params, images, od_ids, tt, seq_len, rng):
        r_tok, rng = jax.random.split(rng)
        vidx = M.sample_visual_token_idx(
            r_tok, images.shape[0], n_vis, keep) if keep < n_vis else None
        ctx = D.build_decode_context(params, images, od_ids, tt, seq_len,
                                     cfg, greedy_opts, vidx)
        g = D.generate_greedy(params, images, od_ids, tt, seq_len, cfg,
                              greedy_opts, ctx=ctx)
        s = D.generate_greedy(params, images, od_ids, tt, seq_len, cfg,
                              sample_opts, rng=rng, ctx=ctx)
        A = sample_opts.max_length
        if vidx is None:
            vidx = jnp.zeros((images.shape[0], 0), jnp.int32)
        return (g["ids"][:, 0], s["ids"].reshape(-1, A),
                s["raw_tokens"].reshape(-1, A - 1), vidx)

    schedule = warmup_linear(hyper.warmup_steps, hyper.max_iter)
    opt_cfg = AdamWConfig(base_lr=hyper.base_lr, eps=hyper.eps,
                          grad_clip=hyper.grad_clip)

    # SCST's backward runs the fusion decoder over B*K sequences at the
    # 2A+S probe length (672 padded) ON TOP of the B-image trunk; with the
    # split-train custom_vjp kernels, whose residuals XLA's rematerializer
    # cannot drop, the un-rematerialized backward overflows the 16 GB chip
    # at B=64 K=2 (measured r5: HLO temps of pre1/slab residuals alone
    # ~12 GB).  Per-block remat bounds live residuals to one block and
    # recomputes the (fast) split-kernel forwards in the backward — the
    # r4-prescribed experiment, now also the memory-correctness fix.
    score_cfg = cfg.replace(remat="fusion")

    def grad_step(state: TrainState, batch, sample_ids, raw_tokens,
                  advantages, vidx):
        rng, _ = jax.random.split(state.rng)
        vti = vidx if vidx.shape[1] > 0 else None

        def lossf(p):
            lp = score_caption_logprobs(
                p, batch["image"], batch["od_ids"],
                batch.get("od_token_type_ids"), batch["seq_len"],
                sample_ids, score_cfg, opts, target_ids=raw_tokens,
                visual_token_idx=vti)
            return jnp.mean(-lp * advantages), lp

        (loss, lp), grads = jax.value_and_grad(lossf, has_aux=True)(
            state.params)
        grads, gnorm = clip_by_global_norm(grads, hyper.grad_clip)
        lr_tree, wd_tree = caption_param_hypers(
            state.params, cfg.split_blocks, cfg.num_hidden_layers,
            weight_decay=hyper.weight_decay,
            lr_multiplier=hyper.lr_multiplier)
        new_params, new_opt = adamw_update(
            grads, state.opt, state.params, lr_tree, wd_tree, opt_cfg,
            schedule)
        metrics = {"scst_loss": loss, "grad_norm": gnorm,
                   "mean_logprob": jnp.mean(lp)}
        return TrainState(new_params, new_opt, rng), metrics

    return jax.jit(decode_fn), jax.jit(grad_step, donate_argnums=(0,))


def scst_train_step(decode_fn, grad_step_fn, reward: ScstReward,
                    tokenizer, state, batch: Dict[str, Any],
                    gt_captions: List[List[str]], rng,
                    mesh=None) -> Tuple[Any, Dict]:
    """One full SCST iteration (decode -> host reward -> grad).

    mesh: when given, the host-computed advantages are placed data-sharded
    on it (the batch rows already are — decode outputs inherit the batch
    sharding through the jit); rewards are host-side strings either way.
    """
    greedy_ids, sample_ids, raw_tokens, vidx = decode_fn(
        state.params, batch["image"], batch["od_ids"],
        batch.get("od_token_type_ids"), batch["seq_len"], rng)
    multiproc = False
    if mesh is not None:
        from ..parallel.mesh import is_multiprocess_mesh
        multiproc = is_multiprocess_mesh(mesh)
    if multiproc:
        # each process scores ITS shard's rows (gt_captions came from the
        # rank's own data shard — reference DDP-SCST semantics) and the
        # per-row advantages are stitched back into a global array
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as _P
        g_host = multihost_utils.global_array_to_host_local_array(
            greedy_ids, mesh, _P("data"))
        s_host = multihost_utils.global_array_to_host_local_array(
            sample_ids, mesh, _P("data"))
    else:
        g_host, s_host = greedy_ids, sample_ids
    greedy = [tokenizer.decode(list(map(int, r)), skip_special_tokens=True)
              for r in np.asarray(g_host)]
    samples = [tokenizer.decode(list(map(int, r)), skip_special_tokens=True)
               for r in np.asarray(s_host)]
    adv = reward(gt_captions, greedy, samples)
    if multiproc:
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as _P
        adv = multihost_utils.host_local_array_to_global_array(
            adv, mesh, _P("data"))
    else:
        adv = jnp.asarray(adv)
        if mesh is not None:
            from ..parallel.mesh import batch_sharding
            adv = jax.device_put(adv, batch_sharding(mesh))
    state, metrics = grad_step_fn(state, batch, sample_ids, raw_tokens,
                                  adv, vidx)
    metrics = dict(metrics)
    metrics["cider_score"] = reward.get_score()
    return state, metrics
