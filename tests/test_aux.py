"""Aux subsystem golden tests: focal-loss variants and tag meters vs the
reference implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

import reference_harness as RH


@pytest.fixture(scope="module")
def torch_mod():
    RH.install()
    import torch
    return torch


def test_focal_variants_match_reference(torch_mod):
    torch = torch_mod
    from src.layers.loss import (
        DistillFocalLossWithLogitsNegLoss, FocalLossWithLogitsNegLoss,
        FocalLossWithLogitsNegSoftLoss, FocalSmoothBCEWithLogitsNegLoss)
    from vitcap_tpu.models import losses as L

    rng = np.random.RandomState(0)
    pred = rng.randn(4, 16).astype(np.float32)
    target = (rng.rand(4, 16) < 0.3).astype(np.float32)
    guide = rng.randn(4, 16).astype(np.float32)
    tp, tt, tg = map(torch.from_numpy, (pred, target, guide))
    jp, jt, jg = map(jnp.asarray, (pred, target, guide))

    ref = FocalLossWithLogitsNegLoss(0.5, 1.0)(tp, tt).numpy()
    np.testing.assert_allclose(np.asarray(L.focal_neg_loss(jp, jt)), ref,
                               rtol=1e-5, atol=1e-6)

    ref = DistillFocalLossWithLogitsNegLoss(0.5, 2.0, t=2.0)(
        tp, tt, tg).numpy()
    mine = float(np.asarray(
        L.distill_focal_neg_loss(jp, jt, jg, 0.5, 2.0, 2.0)).sum())
    np.testing.assert_allclose(mine, ref, rtol=1e-5)

    ref = FocalLossWithLogitsNegSoftLoss(0.5, 2.0)(tp, tt).numpy()
    mine = float(np.asarray(L.soft_focal_neg_loss(jp, jt, 0.5, 2.0)).sum())
    np.testing.assert_allclose(mine, ref, rtol=1e-5)

    ref = FocalSmoothBCEWithLogitsNegLoss(0.5, 1.0, 0.9, 0.1)(
        tp, tt).numpy()
    np.testing.assert_allclose(
        np.asarray(L.smooth_focal_bce_loss(jp, jt, 0.5, 1.0, 0.9, 0.1)),
        ref, rtol=1e-5, atol=1e-6)


def test_multilabel_accuracy_matches_reference(torch_mod):
    torch = torch_mod
    from src.tools.metric import MultiLabelAccuracy as RefAcc
    from vitcap_tpu.utils.metric import MultiLabelAccuracy

    rng = np.random.RandomState(1)
    out = rng.randn(8, 30).astype(np.float32)
    tgt = (rng.rand(8, 30) < 0.2).astype(np.float32)
    ref = RefAcc()
    ref.calc(torch.from_numpy(out), torch.from_numpy(tgt))
    mine = MultiLabelAccuracy()
    mine.calc(out, tgt)
    np.testing.assert_allclose(mine.prec(), ref.prec(), rtol=1e-5)


def test_map_meter_matches_reference(torch_mod):
    torch = torch_mod
    from src.tools.metric import mAPMeter as RefMap
    from vitcap_tpu.utils.metric import mAPMeter

    rng = np.random.RandomState(2)
    out = rng.rand(16, 10).astype(np.float32)
    tgt = (rng.rand(16, 10) < 0.3).astype(np.int64)
    tgt[:, 0] = 0                    # class with no positives
    ref = RefMap()
    ref.add(torch.from_numpy(out), torch.from_numpy(tgt))
    mine = mAPMeter()
    mine.add(out, tgt)
    np.testing.assert_allclose(mine.value(), float(ref.value()), rtol=1e-4)


def test_probe_helpers():
    from vitcap_tpu.utils.metric import label_to_label, logit_to_label
    vocab = {i: f"tok{i}" for i in range(6)}
    logits = np.array([[5.0, -2.0, 3.0, -5.0, 0.0, -1.0]])
    tags = logit_to_label(logits, vocab, topk=2)
    assert tags == [["tok0", "tok2"]]
    labs = label_to_label(np.array([[0, 1, 0, 1, 0, 0]]), vocab)
    assert labs == [["tok1", "tok3"]]
