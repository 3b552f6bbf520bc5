"""Optimizer + LR schedules, exact math parity with the reference solver.

Behavioral references (re-implemented, math only):
- AdamW ("MAdamW"): /root/reference/src/solver/optimization.py:128-210 —
  denom = sqrt(v) + eps (eps outside the bias correction), bias correction
  folded into step_size, decoupled weight decay scaled by the *group lr*
  (which includes the per-group multiplier but not the schedule? — no: the
  torch scheduler mutates group['lr'] in place, so decay IS schedule-scaled;
  we match that).
- WarmupLinearSchedule & friends: optimization.py:34-124.
- Param groups: tagger_caption_uni_pipeline_expanding_bertemb.py:280-356 —
  weight_decay 0 for any '*bias*' and for 'LayerNorm.weight' (note: timm ViT
  norms are named norm1/norm2 so their scales DO get weight decay, matching
  the reference's string test); lr multiplier (default 0.1) on share_blocks
  (= encoder blocks below the fork), tag_blocks, (tag) pooler and tag_logit.

Implemented as a pure functional transform over the param pytree: state is
(step, mu, nu) with the same dtypes/shapes as params; per-leaf scalar
multipliers (lr_mult, weight_decay) are precomputed trees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# schedules (multiplier on base lr, like torch LambdaLR)
# ---------------------------------------------------------------------------

def warmup_linear(warmup_steps: int, t_total: int) -> Callable:
    """optimization.py:69-82 (live config: scheduler_type 'linear')."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps))
        return jnp.where(step < warmup_steps, warm, decay)
    return f


def warmup_constant(warmup_steps: int) -> Callable:
    """optimization.py:53-66."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_steps,
                         step / jnp.maximum(1.0, warmup_steps), 1.0)
    return f


def warmup_cosine(warmup_steps: int, t_total: int, cycles: float = 0.5
                  ) -> Callable:
    """optimization.py:85-100."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, t_total - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress)))
        return jnp.where(step < warmup_steps, warm, cos)
    return f


def warmup_cosine_hard_restarts(warmup_steps: int, t_total: int,
                                cycles: float = 1.0) -> Callable:
    """WarmupCosineWithHardRestartsSchedule (reference
    optimization.py:104-124): `cycles` cosine decays, each restarting at 1."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, t_total - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * ((cycles * progress) % 1.0))))
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return jnp.where(step < warmup_steps, warm, cos)
    return f


def warmup_cosine_annealing(max_iter: int, warmup_steps: int = 500,
                            min_lr_ratio: float = 0.0,
                            warmup_factor: float = 1.0 / 3) -> Callable:
    """WarmupCosineAnnealingLR (reference src/solver/lr_scheduler.py:59-103,
    linear-warmup method); min_lr expressed as a ratio of base_lr so the
    schedule stays a pure multiplier."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = step / jnp.maximum(1.0, warmup_steps)
        warm = warmup_factor * (1 - alpha) + alpha
        cos = min_lr_ratio + (1.0 - min_lr_ratio) * \
            (1.0 + jnp.cos(jnp.pi * step / max_iter)) / 2.0
        return jnp.where(step < warmup_steps, warm, cos)
    return f


def constant_schedule() -> Callable:
    return lambda step: jnp.asarray(1.0, jnp.float32)


# registry entries share the (warmup_steps, t_total) calling convention the
# train step uses (train_step.py builds SCHEDULES[type](warmup, max_iter))
SCHEDULES = {
    "linear": warmup_linear,
    "warmup_constant": lambda warmup_steps, t_total=None:
        warmup_constant(warmup_steps),
    "warmup_cosine": warmup_cosine,
    "warmup_cosine_hard_restarts": warmup_cosine_hard_restarts,
    "cosine_annealing": lambda warmup_steps, t_total:
        warmup_cosine_annealing(t_total, warmup_steps=warmup_steps),
}


# ---------------------------------------------------------------------------
# per-leaf hyper trees (param groups)
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def caption_param_hypers(params: Params, split_blocks: int,
                         num_hidden_layers: int,
                         weight_decay: float = 0.05,
                         lr_multiplier: float = 0.1,
                         bias_no_weight_decay: bool = True,
                         ln_no_weight_decay: bool = True
                         ) -> Tuple[Params, Params]:
    """Returns (lr_mult_tree, weight_decay_tree) mirroring the reference's
    9-group construction (…bertemb.py:306-356)."""
    fork = num_hidden_layers - split_blocks

    def hyp(path_key, leaf):
        path = _path_str(path_key)
        parts = path.split("/")
        wd = weight_decay
        if bias_no_weight_decay and "bias" in parts[-1]:
            wd = 0.0
        # torch test is 'LayerNorm.weight' in name — only BERT-style LN
        if ln_no_weight_decay and len(parts) >= 2 \
                and parts[-2] == "LayerNorm" and parts[-1] == "scale":
            wd = 0.0
        mult = 1.0
        if parts[0] == "encoder" and parts[1] == "blocks" \
                and int(parts[2]) < fork:
            mult = lr_multiplier                      # share_blocks
        elif parts[0] == "encoder" and parts[1] == "tag_blocks":
            mult = lr_multiplier
        elif parts[0] in ("pooler", "tag_logit"):
            mult = lr_multiplier
        return (mult, wd)

    both = jax.tree_util.tree_map_with_path(hyp, params)
    lr_tree = jax.tree_util.tree_map(lambda x: x[0], both,
                                     is_leaf=lambda x: isinstance(x, tuple))
    wd_tree = jax.tree_util.tree_map(lambda x: x[1], both,
                                     is_leaf=lambda x: isinstance(x, tuple))
    return lr_tree, wd_tree


def uniform_hypers(params: Params, weight_decay: float = 0.0
                   ) -> Tuple[Params, Params]:
    ones = jax.tree_util.tree_map(lambda _: 1.0, params)
    wds = jax.tree_util.tree_map(lambda _: weight_decay, params)
    return ones, wds


# ---------------------------------------------------------------------------
# AdamW
# ---------------------------------------------------------------------------

class AdamWState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    mu: Params
    nu: Params


@dataclasses.dataclass(frozen=True)
class AdamWConfig:
    base_lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8          # pipeline passes eps=1e-8 (…bertemb.py:351)
    correct_bias: bool = True
    grad_clip: float = 1.0     # global norm (trainer.py clip_grad_norm_)


def adamw_init(params: Params) -> AdamWState:
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    z2 = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamWState(jnp.zeros((), jnp.int32), z, z2)


def global_norm(tree: Params) -> jnp.ndarray:
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree_util.tree_leaves(tree)))


def clip_by_global_norm(grads: Params, max_norm: float
                        ) -> Tuple[Params, jnp.ndarray]:
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    max_norm/(norm+1e-6) only when norm > max_norm."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(
        lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype), grads), norm


def adamw_update(grads: Params, state: AdamWState, params: Params,
                 lr_mult: Params, wd: Params, cfg: AdamWConfig,
                 schedule: Callable) -> Tuple[Params, AdamWState]:
    """One reference-AdamW step.  Returns (new_params, new_state)."""
    step = state.step + 1
    sched = schedule(state.step)    # torch LambdaLR: iter k uses lambda(k)
    b1, b2 = cfg.beta1, cfg.beta2

    if cfg.correct_bias:
        t = step.astype(jnp.float32)
        bias_c = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
    else:
        bias_c = jnp.asarray(1.0)

    def upd(p, g, m, v, mult, w):
        g = g.astype(jnp.float32)
        pf = p.astype(jnp.float32)
        m = m * b1 + g * (1.0 - b1)
        v = v * b2 + g * g * (1.0 - b2)
        lr = cfg.base_lr * mult * sched
        newp = pf - (lr * bias_c) * m / (jnp.sqrt(v) + cfg.eps)
        # decoupled decay applied to the post-adam value, scaled by group lr
        # (the reference mutates p in place before the decay add_)
        newp = newp - lr * w * newp
        return newp.astype(p.dtype), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_lm = treedef.flatten_up_to(lr_mult)
    flat_wd = treedef.flatten_up_to(wd)
    out = [upd(p, g, m, v, lm, w) for p, g, m, v, lm, w in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lm, flat_wd)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamWState(step, new_m, new_v)


def warmup_multi_step(warmup_steps: int, milestones, gamma: float = 0.1,
                      warmup_factor: float = 1.0 / 3) -> Callable:
    """WarmupMultiStepLR (reference src/solver/lr_scheduler.py:60-103):
    linear warmup from warmup_factor, then gamma^len(passed milestones)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def f(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.where(warmup_steps > 0,
                          step / jnp.maximum(1.0, warmup_steps), 1.0)
        warm = jnp.where(step < warmup_steps,
                         warmup_factor * (1 - alpha) + alpha, 1.0)
        decay = gamma ** jnp.sum(step >= ms)
        return warm * decay
    return f


# registry entry follows the (warmup_steps, t_total) train-step convention;
# default milestones use the maskrcnn 2/3 + 8/9 rule.  Call
# warmup_multi_step directly for explicit milestones.
SCHEDULES["multistep"] = lambda warmup_steps, t_total: warmup_multi_step(
    warmup_steps, (int(t_total * 2 / 3), int(t_total * 8 / 9)))
