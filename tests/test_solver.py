"""Solver parity: AdamW vs reference MAdamW (+ LambdaLR schedule), plus a
data-parallel train-step smoke test on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vitcap_tpu.solver.optimization import (
    AdamWConfig, adamw_init, adamw_update, caption_param_hypers,
    clip_by_global_norm, warmup_linear, warmup_cosine,
)

import reference_harness as RH


def test_warmup_linear_matches_reference():
    RH.install()
    import torch
    from src.solver.optimization import WarmupLinearSchedule
    p = torch.nn.Parameter(torch.zeros(1))
    optt = torch.optim.SGD([p], lr=1.0)
    sched = WarmupLinearSchedule(optt, warmup_steps=3, t_total=10)
    mine = warmup_linear(3, 10)
    for step in range(10):
        np.testing.assert_allclose(float(mine(step)),
                                   optt.param_groups[0]["lr"], rtol=1e-6)
        optt.step()
        sched.step()


def test_adamw_matches_reference():
    RH.install()
    import torch
    from src.solver.optimization import AdamW as RefAdamW, \
        WarmupLinearSchedule

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(4).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    base_lr = 1e-3
    opt = RefAdamW([
        {"params": [tw], "lr": base_lr * 0.1, "weight_decay": 0.05},
        {"params": [tb], "lr": base_lr, "weight_decay": 0.0},
    ], lr=base_lr, eps=1e-8)
    sched = WarmupLinearSchedule(opt, warmup_steps=2, t_total=8)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = adamw_init(params)
    lr_mult = {"w": 0.1, "b": 1.0}
    wd = {"w": 0.05, "b": 0.0}
    cfg = AdamWConfig(base_lr=base_lr, eps=1e-8)
    mysched = warmup_linear(2, 8)

    for step in range(6):
        gw = rng.randn(4, 3).astype(np.float32)
        gb = rng.randn(4).astype(np.float32)
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()
        sched.step()
        params, state = adamw_update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params,
            lr_mult, wd, cfg, mysched)

    np.testing.assert_allclose(np.array(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.array(params["b"]), tb.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_clip_matches_torch():
    import torch
    rng = np.random.RandomState(1)
    gs = [rng.randn(5, 2).astype(np.float32) * 3,
          rng.randn(7).astype(np.float32)]
    tps = [torch.nn.Parameter(torch.zeros(5, 2)),
           torch.nn.Parameter(torch.zeros(7))]
    for p, g in zip(tps, gs):
        p.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_(tps, 1.0)
    mine, norm = clip_by_global_norm(
        {"a": jnp.asarray(gs[0]), "b": jnp.asarray(gs[1])}, 1.0)
    np.testing.assert_allclose(np.array(mine["a"]), tps[0].grad.numpy(),
                               rtol=1e-5)
    np.testing.assert_allclose(np.array(mine["b"]), tps[1].grad.numpy(),
                               rtol=1e-5)


def test_caption_param_hypers_groups():
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    cfg = tiny_config()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    lr_tree, wd_tree = caption_param_hypers(
        params, cfg.split_blocks, cfg.num_hidden_layers)
    # share blocks (below fork) get the multiplier; caption blocks don't
    fork = cfg.num_hidden_layers - cfg.split_blocks
    assert lr_tree["encoder"]["blocks"][0]["attn"]["qkv"]["kernel"] == 0.1
    assert lr_tree["encoder"]["blocks"][fork]["attn"]["qkv"]["kernel"] == 1.0
    assert lr_tree["encoder"]["tag_blocks"][0]["mlp"]["fc1"]["kernel"] == 0.1
    assert lr_tree["pooler"]["dense"]["kernel"] == 0.1
    assert lr_tree["caption_pooler"]["dense"]["kernel"] == 1.0
    assert lr_tree["tag_logit"]["transform"]["dense"]["kernel"] == 0.1
    assert lr_tree["cls"]["transform"]["dense"]["kernel"] == 1.0
    # wd: biases 0 everywhere; BERT LayerNorm scale 0; ViT norm scale 0.05
    # (the reference string-match quirk)
    assert wd_tree["decoder"]["layer"][0]["output"]["LayerNorm"]["scale"] == 0
    assert wd_tree["decoder"]["layer"][0]["output"]["LayerNorm"]["bias"] == 0
    assert wd_tree["encoder"]["blocks"][0]["norm1"]["scale"] == 0.05
    assert wd_tree["encoder"]["blocks"][0]["norm1"]["bias"] == 0.0
    assert wd_tree["embeddings"]["word_embeddings"] == 0.05


def _tiny_batch(cfg, B, rng):
    T = cfg.max_seq_len
    return dict(
        image=jnp.asarray(rng.randn(B, cfg.img_size, cfg.img_size, 3),
                          jnp.float32),
        input_ids=jnp.asarray(
            rng.randint(1, cfg.vocab_size, (B, T)), jnp.int32),
        token_type_ids=jnp.zeros((B, T), jnp.int32),
        seq_a_len=jnp.full((B,), cfg.max_seq_a_len, jnp.int32),
        seq_len=jnp.full((B,), T, jnp.int32),
        masked_pos=jnp.zeros((B, T), jnp.int32).at[:, 1].set(1),
        masked_ids=jnp.zeros((B, cfg.max_masked_tokens), jnp.int32)
        .at[:, 0].set(7),
        label=jnp.zeros((B, cfg.tag_vocab_size), jnp.float32)
        .at[:, 3].set(1.0),
    )


def test_data_parallel_train_step_runs_and_learns():
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = tiny_config(hidden_dropout_prob=0.0)
    mesh = make_mesh(n_data=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    state = init_train_state(params, jax.random.PRNGKey(1))
    hyper = TrainHyper(base_lr=1e-3, max_iter=50)
    step = make_jitted_train_step(cfg, hyper, mesh)

    rng = np.random.RandomState(0)
    batch = shard_batch(_tiny_batch(cfg, 16, rng), mesh)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_tensor_parallel_matches_data_parallel():
    from vitcap_tpu.models.config import tiny_config
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from vitcap_tpu.solver.train_step import (
        TrainHyper, init_train_state, make_jitted_train_step)

    cfg = tiny_config(hidden_dropout_prob=0.0,
                      attention_probs_dropout_prob=0.0)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    hyper = TrainHyper(base_lr=1e-3, max_iter=50)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(cfg, 8, rng)

    mesh_dp = make_mesh(n_data=8, n_model=1)
    st = init_train_state(shard_params(params, mesh_dp), jax.random.PRNGKey(1))
    st, m_dp = make_jitted_train_step(cfg, hyper, mesh_dp)(
        st, shard_batch(batch, mesh_dp))

    mesh_tp = make_mesh(n_data=4, n_model=2)
    # fresh copy: the DP step donated its (possibly aliased) buffers
    params2 = M.init_params(jax.random.PRNGKey(0), cfg)
    st2 = init_train_state(
        shard_params(params2, mesh_tp, tensor_parallel=True),
        jax.random.PRNGKey(1))
    st2, m_tp = make_jitted_train_step(cfg, hyper, mesh_tp)(
        st2, shard_batch(batch, mesh_tp))

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
    w1 = np.array(st.params["decoder"]["layer"][0]["intermediate"]["dense"]
                  ["kernel"])
    w2 = np.array(st2.params["decoder"]["layer"][0]["intermediate"]["dense"]
                  ["kernel"])
    np.testing.assert_allclose(w1, w2, rtol=2e-4, atol=1e-6)


def test_warmup_cosine_hard_restarts_matches_reference():
    RH.install()
    import torch
    from src.solver.optimization import WarmupCosineWithHardRestartsSchedule
    from vitcap_tpu.solver.optimization import warmup_cosine_hard_restarts
    p = torch.nn.Parameter(torch.zeros(1))
    optt = torch.optim.SGD([p], lr=1.0)
    sched = WarmupCosineWithHardRestartsSchedule(
        optt, warmup_steps=3, t_total=20, cycles=2.0)
    mine = warmup_cosine_hard_restarts(3, 20, cycles=2.0)
    for step in range(22):
        np.testing.assert_allclose(float(mine(step)),
                                   optt.param_groups[0]["lr"],
                                   rtol=1e-5, atol=1e-7, err_msg=f"step {step}")
        optt.step()
        sched.step()


def test_warmup_cosine_annealing_matches_reference():
    RH.install()
    import torch
    from src.solver.lr_scheduler import WarmupCosineAnnealingLR
    from vitcap_tpu.solver.optimization import warmup_cosine_annealing
    p = torch.nn.Parameter(torch.zeros(1))
    optt = torch.optim.SGD([p], lr=2.0)
    sched = WarmupCosineAnnealingLR(optt, max_iter=30, min_lr=0.2,
                                    warmup_iters=4, warmup_method="linear")
    mine = warmup_cosine_annealing(30, warmup_steps=4, min_lr_ratio=0.1)
    for step in range(30):
        np.testing.assert_allclose(2.0 * float(mine(step)),
                                   optt.param_groups[0]["lr"],
                                   rtol=1e-5, atol=1e-7, err_msg=f"step {step}")
        optt.step()
        sched.step()


def test_schedule_registry_calling_convention():
    """Every SCHEDULES entry accepts (warmup_steps, t_total) positionally —
    the train step's calling convention (a swapped-signature registration
    once produced a warmup-forever schedule)."""
    from vitcap_tpu.solver.optimization import (SCHEDULES,
                                                warmup_cosine_annealing)
    for name, f in SCHEDULES.items():
        sched = f(3, 30)
        start, end = float(sched(0)), float(sched(29))
        assert 0.0 <= start <= 1.0 and 0.0 <= end <= 1.0, name
    # cosine_annealing through the registry == direct keyword call
    reg = SCHEDULES["cosine_annealing"](4, 30)
    direct = warmup_cosine_annealing(30, warmup_steps=4)
    for s in (0, 4, 15, 29):
        np.testing.assert_allclose(float(reg(s)), float(direct(s)))
    # and it must actually decay, not warm up forever
    assert float(reg(29)) < 0.05


def test_train_rng_is_rbg():
    from vitcap_tpu.solver.train_step import train_rng
    for src in (7, jax.random.PRNGKey(7)):
        k = train_rng(src)
        assert "rbg" in str(jax.random.key_impl(k)).lower()
        jax.random.bernoulli(k, 0.5, (4,))       # usable key
