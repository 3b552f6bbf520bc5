"""Multi-label tag loss family.

Math-parity re-implementation of /root/reference/src/layers/loss.py:5-104:
FocalLossWithLogitsNegLoss (the live tag loss, also in models.vitcap),
Distill / Soft / Smooth variants used by alternative tagger recipes.
All return ELEMENTWISE losses like the reference modules (callers .sum()
or .mean() per their recipe; the live pipeline sums the focal loss,
modeling_bert.py:789)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_neg_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   alpha: float = 0.5, gamma: float = 1.0) -> jnp.ndarray:
    """FocalLossWithLogitsNegLoss (loss.py:5-22)."""
    p = jax.nn.sigmoid(pred)
    pos = (target == 1) * alpha * jnp.power(1.0 - p, gamma) * \
        jax.nn.log_sigmoid(pred)
    neg = (target == 0) * (1 - alpha) * jnp.power(p, gamma) * \
        jax.nn.log_sigmoid(-pred)
    return -(pos + neg)


def distill_focal_neg_loss(pred: jnp.ndarray, target: jnp.ndarray,
                           guide: jnp.ndarray, alpha: float = 0.5,
                           gamma: float = 1.0, t: float = 1.0) -> jnp.ndarray:
    """DistillFocalLossWithLogitsNegLoss (loss.py:25-50): teacher-guided
    soft targets (sigmoid(guide/T)) with |p - target|^gamma focusing."""
    weight = jnp.where(target == 0, 1.0 - alpha, 0.0)
    weight = jnp.where(target > 1e-5, alpha, weight)
    p = jax.nn.sigmoid(pred)
    pg = jax.nn.sigmoid(guide / t)
    coef = weight * jnp.power(jnp.abs(p - target), gamma)
    loss = pg * jax.nn.log_sigmoid(pred) + \
        (1.0 - pg) * jax.nn.log_sigmoid(-pred)
    return -(coef * loss)


def soft_focal_neg_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        alpha: float = 0.5, gamma: float = 1.0
                        ) -> jnp.ndarray:
    """FocalLossWithLogitsNegSoftLoss (loss.py:53-79): soft (possibly
    fractional) targets."""
    weight = jnp.where(target == 0, 1.0 - alpha, 0.0)
    weight = jnp.where(target > 1e-5, alpha, weight)
    p = jax.nn.sigmoid(pred)
    coef = weight * jnp.power(jnp.abs(p - target), gamma)
    loss = target * jax.nn.log_sigmoid(pred) + \
        (1.0 - target) * jax.nn.log_sigmoid(-pred)
    return -(coef * loss)


def smooth_focal_bce_loss(logits: jnp.ndarray, target: jnp.ndarray,
                          alpha: float = 0.5, gamma: float = 1.0,
                          pos: float = 0.9, neg: float = 0.1) -> jnp.ndarray:
    """FocalSmoothBCEWithLogitsNegLoss (loss.py:82-104): label-smoothed
    focal BCE with distinct positive/negative soft values."""
    p = jax.nn.sigmoid(logits)
    ls, lsi = jax.nn.log_sigmoid(logits), jax.nn.log_sigmoid(-logits)
    coef_p = (target == 1) * alpha * jnp.power(jnp.abs(pos - p), gamma)
    loss = coef_p * (pos * ls + (1 - pos) * lsi)
    coef_n = (target == 0) * (1 - alpha) * jnp.power(jnp.abs(p - neg), gamma)
    loss = loss + coef_n * (neg * ls + (1 - neg) * lsi)
    return -loss
