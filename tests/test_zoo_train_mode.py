"""Zoo train-mode golden parity vs the reference's vendored timm in
`model.train()` mode (VERDICT round-2 item #6).

Covers, per family (resnet / efficientnet / mobilenetv3 / regnet + the
hybrid-ViT BN stems):
- forward on BATCH statistics (torch _BatchNorm train semantics),
- the running-stat update (momentum blend, unbiased batch variance),
- gradients through the batch statistics (the part eval-BN never
  exercises),
and the stochastic pieces (drop_path per reference layers/drop.py:140-157,
head dropout per resnet.py:641-642) semantically — torch RNG streams can't
be replicated bit-wise, so those check the exact transform given the mask
and the mask distribution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitcap_tpu.models import registry as R
from vitcap_tpu.models.backbones import (bn_updated_params, zoo_train_mode)


def _torch_train_model(name, module="resnet"):
    from reference_harness import install
    install()
    import importlib
    import torch
    TR = importlib.import_module(f"timm.models.{module}")
    torch.manual_seed(0)
    tm = getattr(TR, name)(pretrained=False)
    tm.train()
    sd = dict(tm.state_dict())
    g = torch.Generator().manual_seed(1)
    for k in list(sd.keys()):
        if k.endswith("running_mean"):
            sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = 1.0 + 0.1 * torch.rand(sd[k].shape, generator=g)
    tm.load_state_dict(sd)
    return tm, sd


def _jax_model_from(tm_state, name):
    import tempfile
    import os.path as op
    import torch
    with tempfile.TemporaryDirectory() as d:
        pt = op.join(d, "m.pt")
        torch.save(tm_state, pt)
        return R.create_model(name, checkpoint_path=pt)


def _collect_bn_buffers(tm):
    """name -> (running_mean, running_var) AFTER forwards, torch order."""
    import torch
    out = {}
    for mod_name, mod in tm.named_modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            out[mod_name] = (mod.running_mean.detach().numpy().copy(),
                             mod.running_var.detach().numpy().copy())
    return out


def _jax_bn_leaves(tree, path=""):
    """Flatten BN leaf dicts {mean,var,scale,bias} with their tree paths."""
    found = {}
    if isinstance(tree, dict):
        if set(tree.keys()) >= {"mean", "var", "scale", "bias"}:
            found[path] = tree
        else:
            for k, v in tree.items():
                found.update(_jax_bn_leaves(v, f"{path}.{k}" if path else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            found.update(_jax_bn_leaves(v, f"{path}.{i}"))
    return found


class TestTrainForwardParity:
    """Batch-stat forward + running-stat update + input grads vs torch
    train() (drop rates 0 so the comparison is deterministic)."""

    def _compare(self, name, module, img=64, batch=4, rtol=2e-3, atol=2e-3,
                 grad_atol=2e-4):
        import torch
        tm, sd = _torch_train_model(name, module)
        m = _jax_model_from(sd, name)
        x = np.random.RandomState(0).randn(batch, img, img, 3) \
            .astype(np.float32) * 0.5

        xt = torch.from_numpy(x).permute(0, 3, 1, 2).requires_grad_(True)
        t_out = tm(xt)
        t_out.sum().backward()
        t_grad = xt.grad.permute(0, 2, 3, 1).numpy()

        def fwd(images):
            with zoo_train_mode() as tmode:
                logits = m.apply(m.params, images, head=True)
                new_params = bn_updated_params(m.params, tmode)
            return jnp.sum(logits), (logits, new_params)

        j_grad, (j_out, new_params) = jax.grad(
            fwd, has_aux=True)(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(j_out),
                                   t_out.detach().numpy(),
                                   rtol=rtol, atol=atol)
        # gradients THROUGH the batch statistics
        np.testing.assert_allclose(np.asarray(j_grad), t_grad,
                                   rtol=5e-2, atol=grad_atol)

        # running stats after one train-mode forward: compare as sorted
        # multisets of vectors (torch names and our tree paths differ;
        # exact pairing is already covered by eval parity tests)
        t_stats = _collect_bn_buffers(tm)
        j_bns = _jax_bn_leaves(new_params)
        assert len(t_stats) == len(j_bns), (len(t_stats), len(j_bns))
        t_means = sorted(np.concatenate(
            [v[0] for v in t_stats.values()]).tolist())
        j_means = sorted(np.concatenate(
            [np.asarray(v["mean"], np.float64) for v in
             j_bns.values()]).tolist())
        np.testing.assert_allclose(j_means, t_means, rtol=1e-3, atol=1e-4)
        t_vars = sorted(np.concatenate(
            [v[1] for v in t_stats.values()]).tolist())
        j_vars = sorted(np.concatenate(
            [np.asarray(v["var"], np.float64) for v in
             j_bns.values()]).tolist())
        np.testing.assert_allclose(j_vars, t_vars, rtol=1e-3, atol=1e-4)

    def test_resnet50_train(self):
        self._compare("resnet50", "resnet")

    def test_efficientnet_b0_train(self):
        self._compare("efficientnet_b0", "efficientnet")

    @pytest.mark.slow
    def test_mobilenetv3_large_100_train(self):
        self._compare("mobilenetv3_large_100", "mobilenetv3")

    @pytest.mark.slow
    def test_regnety_004_train(self):
        self._compare("regnety_004", "regnet")

    # VERDICT r4 item #8: grad-level train parity for three more families —
    # sknet (whose train-mode forward failed the r4 sweep), densenet
    # (dense concat topology), and a NASNet-class cell net.

    @pytest.mark.slow
    def test_skresnet50_train(self):
        self._compare("skresnet50", "sknet")

    @pytest.mark.slow
    def test_densenet121_train(self):
        self._compare("densenet121", "densenet")

    @pytest.mark.slow
    def test_pnasnet5large_train(self):
        self._compare("pnasnet5large", "pnasnet", img=96)


class TestHybridStemTrain:
    """vit_small_resnet26d_224: the BN resnet-d stem under the ViT runs on
    batch stats in train mode (the ViT layers are mode-free at drop 0)."""

    @pytest.mark.slow
    def test_hybrid_stem_train_forward(self):
        import torch
        tm, sd = _torch_train_model("vit_small_resnet26d_224",
                                    "vision_transformer")
        m = _jax_model_from(sd, "vit_small_resnet26d_224")
        x = np.random.RandomState(0).randn(2, 224, 224, 3) \
            .astype(np.float32) * 0.5
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        with zoo_train_mode() as tmode:
            j_out = m.apply(m.params, jnp.asarray(x), head=True)
            new_params = bn_updated_params(m.params, tmode)
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=2e-3, atol=2e-3)
        # stem BN stats did update
        bns = _jax_bn_leaves(new_params)
        assert bns, "hybrid stem exposes no BN leaves"
        old = _jax_bn_leaves(m.params)
        moved = any(not np.allclose(np.asarray(bns[k]["mean"]),
                                    np.asarray(old[k]["mean"]))
                    for k in bns)
        assert moved, "running stats unchanged after train forward"


class TestStochasticPieces:
    def test_drop_path_semantics(self):
        """Per-sample all-or-nothing scaled by 1/keep; linear depth scaling;
        identity in eval (drop.py:150-157)."""
        from vitcap_tpu.models.backbones import _drop_path
        x = jnp.ones((512, 3, 3, 8))
        assert (np.asarray(_drop_path(x)) == 1.0).all()   # eval: identity
        with zoo_train_mode(jax.random.PRNGKey(0), drop_path_rate=0.4):
            y = np.asarray(_drop_path(x, rate_scale=1.0))
        per_sample = y.reshape(512, -1)
        kept = per_sample[:, 0] > 0
        # surviving samples are exactly x/keep, dropped exactly 0
        np.testing.assert_allclose(per_sample[kept], 1.0 / 0.6, rtol=1e-6)
        assert (per_sample[~kept] == 0.0).all()
        assert 0.5 < kept.mean() < 0.7                    # ~0.6 keep rate
        with zoo_train_mode(jax.random.PRNGKey(0), drop_path_rate=0.4):
            y0 = np.asarray(_drop_path(x, rate_scale=0.0))
        np.testing.assert_array_equal(y0, np.asarray(x))  # block 0: rate 0

    def test_head_dropout_semantics(self):
        from vitcap_tpu.models.backbones import _head_dropout
        x = jnp.ones((64, 128))
        assert (np.asarray(_head_dropout(x)) == 1.0).all()
        with zoo_train_mode(jax.random.PRNGKey(1), drop_rate=0.25):
            y = np.asarray(_head_dropout(x))
        vals = np.unique(y)
        np.testing.assert_allclose(
            vals, [0.0, 1.0 / 0.75], rtol=1e-6)
        assert 0.70 < (y > 0).mean() < 0.80

    def test_drop_path_grad_flows(self):
        from vitcap_tpu.models.backbones import _drop_path

        def f(x):
            with zoo_train_mode(jax.random.PRNGKey(2), drop_path_rate=0.5):
                return jnp.sum(_drop_path(x))

        x = jnp.ones((64, 4))
        g = np.asarray(jax.grad(f)(x))
        kept = g[:, 0] > 0
        np.testing.assert_allclose(g[kept], 2.0, rtol=1e-6)
        assert (g[~kept] == 0.0).all()

    def test_effnet_drop_path_changes_output_train_only(self):
        """drop_path is live in the efficientnet residual blocks and a
        no-op in eval."""
        m = R.create_model("efficientnet_b0")
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(4, 64, 64, 3).astype(np.float32))
        base = m.apply(m.params, x, head=True)
        with zoo_train_mode(jax.random.PRNGKey(0), drop_path_rate=0.9):
            y1 = m.apply(m.params, x, head=True)
        with zoo_train_mode(jax.random.PRNGKey(7), drop_path_rate=0.9):
            y2 = m.apply(m.params, x, head=True)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        base2 = m.apply(m.params, x, head=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(base2))


class TestTrainModeJit:
    def test_train_step_under_jit(self):
        """The context is trace-time: a jitted train step (loss + BN-stat
        update + grads) compiles and the updated stats come out as real
        outputs."""
        m = R.create_model("resnet18")
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(4, 64, 64, 3).astype(np.float32))

        @jax.jit
        def step(params, images, rng):
            def loss_fn(p):
                with zoo_train_mode(rng, drop_path_rate=0.1,
                                    drop_rate=0.1) as tmode:
                    logits = m.apply(p, images, head=True)
                    new_p = bn_updated_params(p, tmode)
                return jnp.mean(logits ** 2), new_p

            (loss, new_p), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            return loss, new_p, grads

        loss, new_p, grads = step(m.params, x, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        old = _jax_bn_leaves(m.params)
        new = _jax_bn_leaves(new_p)
        assert any(not np.allclose(np.asarray(new[k]["mean"]),
                                   np.asarray(old[k]["mean"])) for k in new)
        gnorm = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b)), grads, 0.0)
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
