"""Fused whole-epoch training kernel (ops/fused_train.py) vs the XLA path.

The kernel must reproduce the trainer's exact update semantics —
``optax.chain(clip_by_global_norm, scale_by_adam, [add_decayed_weights])``
+ ``p - lr*u`` (training/trainer.py:236-266) and training-mode BatchNorm1d
with running-stat EMA (nn/layers.py:166-193) — for the
[Linear→BatchNorm1d→ReLU]×k→Linear ensemble family.  All kernel runs here
use the Pallas interpreter (CPU CI mesh); the on-chip path is exercised by
bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

# interpret-mode Pallas kernel sweeps: multi-minute on CPU
pytestmark = pytest.mark.slow

from nnueehcs_tpu.model_builder import EnsembleModelBuilder
from nnueehcs_tpu.ops import fused_train as ft


def _arch(d=5, width=32, hidden=2, out=1):
    arch = [{'Linear': {'args': [d, width]}},
            {'BatchNorm1d': {'args': [width]}}, {'ReLU': {}}]
    for _ in range(hidden - 1):
        arch += [{'Linear': {'args': [width, width]}},
                 {'BatchNorm1d': {'args': [width]}}, {'ReLU': {}}]
    arch.append({'Linear': {'args': [width, out]}})
    return arch


def _build(M=3, d=5, loss='l1_loss', per_member=False):
    tc = {'loss': loss}
    if per_member:
        tc['ensemble_loss'] = 'per_member'
    model = EnsembleModelBuilder(_arch(d=d), {'num_models': M},
                                 train_config=tc).build()
    model.init(jax.random.PRNGKey(0), (d,))
    return model


def _reference_run(model, x, y, S, B, lr, clip, wd):
    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(optax.scale_by_adam())
    if wd:
        chain.append(optax.add_decayed_weights(wd))
    tx = optax.chain(*chain)
    opt = tx.init(model.params)
    params, state = model.params, model.state
    losses = []
    for s in range(S):
        xb, yb = x[s * B:(s + 1) * B], y[s * B:(s + 1) * B]
        (loss, state), grads = jax.value_and_grad(
            model.training_loss, has_aux=True)(params, state, (xb, yb),
                                               jax.random.PRNGKey(0))
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p - lr * u,
                                        params, updates)
        losses.append(float(loss))
    return params, state, opt, np.asarray(losses)


def _fused_run(model, plan, x, y, S, B, lr, step0=0):
    theta = ft.pack_tree(plan, model.params)
    sigma = ft.pack_state(plan, model.state)
    xs, ys = ft.gather_epoch_batches(plan, x, y, jnp.arange(S * B))
    return ft.fused_epoch(plan, theta, jnp.zeros_like(theta),
                          jnp.zeros_like(theta), sigma, xs, ys, lr, step0,
                          drops=ft.drop_rates(model.net), interpret=True)


@pytest.mark.parametrize('loss,per_member,wd', [
    ('l1_loss', False, 0.0),
    ('mse_loss', False, 0.01),
    ('l1_loss', True, 0.0),
])
def test_epoch_matches_xla_path(loss, per_member, wd):
    M, B, S, d = 3, 16, 6, 5
    model = _build(M=M, d=d, loss=loss, per_member=per_member)
    plan = ft.plan_fused_train(model.net, M, B, loss=loss,
                               per_member=per_member, clip=5.0,
                               weight_decay=wd)
    assert plan is not None

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(S * B, 1)), jnp.float32)

    params, state, opt, losses_ref = _reference_run(
        model, x, y, S, B, 1e-3, 5.0, wd)
    theta2, m2, v2, sigma2, losses = _fused_run(model, plan, x, y, S, B, 1e-3)

    # per-step losses and both Adam moments are tight; raw parameters are
    # compared loosely (Adam divides by sqrt of near-zero second moments in
    # the first steps, amplifying last-bit differences along low-signal
    # directions — the loss trajectory below pins the behaviour that counts)
    np.testing.assert_allclose(np.asarray(losses), losses_ref, atol=5e-6)
    adam = opt[1] if len(opt) > 1 else opt[0]
    np.testing.assert_allclose(np.asarray(ft.pack_tree(plan, adam.mu)),
                               np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ft.pack_tree(plan, adam.nu)),
                               np.asarray(v2), atol=1e-6)

    s2 = ft.unpack_state(plan, sigma2, model.state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    p2 = ft.unpack_tree(plan, theta2, model.params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_loss_trajectory_tracks_long_run():
    """60 steps on a learnable target: the fused trajectory must stay on
    the XLA path's loss curve (not merely start there)."""
    M, B, S, d = 3, 16, 60, 5
    model = _build(M=M, d=d)
    plan = ft.plan_fused_train(model.net, M, B, loss='l1_loss', clip=5.0)

    rng = np.random.default_rng(0)
    xall = rng.normal(size=(S * B, d)).astype(np.float32)
    yall = (xall.sum(axis=1, keepdims=True)
            + 0.1 * rng.normal(size=(S * B, 1))).astype(np.float32)
    x, y = jnp.asarray(xall), jnp.asarray(yall)

    _, _, _, losses_ref = _reference_run(model, x, y, S, B, 1e-3, 5.0, 0.0)
    _, _, _, _, losses = _fused_run(model, plan, x, y, S, B, 1e-3)
    np.testing.assert_allclose(np.asarray(losses), losses_ref,
                               rtol=1e-4, atol=1e-5)
    # and training actually learned something
    assert losses_ref[-5:].mean() < 0.6 * losses_ref[:5].mean()


def test_step0_bias_correction_continues_across_epochs():
    """Epoch 2 must continue Adam's bias-correction counter, matching one
    long XLA run split at the same point."""
    M, B, d = 2, 8, 5
    S1, S2 = 3, 3
    model = _build(M=M, d=d)
    plan = ft.plan_fused_train(model.net, M, B, loss='l1_loss', clip=5.0)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=((S1 + S2) * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=((S1 + S2) * B, 1)), jnp.float32)

    _, _, _, losses_ref = _reference_run(model, x, y, S1 + S2, B,
                                         1e-3, 5.0, 0.0)

    theta = ft.pack_tree(plan, model.params)
    sigma = ft.pack_state(plan, model.state)
    m = jnp.zeros_like(theta)
    v = jnp.zeros_like(theta)
    xs1, ys1 = ft.gather_epoch_batches(plan, x[:S1 * B], y[:S1 * B],
                                       jnp.arange(S1 * B))
    theta, m, v, sigma, l1 = ft.fused_epoch(plan, theta, m, v, sigma,
                                            xs1, ys1, 1e-3, 0,
                                            interpret=True)
    xs2, ys2 = ft.gather_epoch_batches(plan, x[S1 * B:], y[S1 * B:],
                                       jnp.arange(S2 * B))
    theta, m, v, sigma, l2 = ft.fused_epoch(plan, theta, m, v, sigma,
                                            xs2, ys2, 1e-3, S1,
                                            interpret=True)
    got = np.concatenate([np.asarray(l1), np.asarray(l2)])
    np.testing.assert_allclose(got, losses_ref, atol=5e-6)


def test_pack_unpack_roundtrip():
    M, B, d = 2, 8, 5
    model = _build(M=M, d=d)
    plan = ft.plan_fused_train(model.net, M, B)
    theta = ft.pack_tree(plan, model.params)
    p2 = ft.unpack_tree(plan, theta, model.params)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sigma = ft.pack_state(plan, model.state)
    s2 = ft.unpack_state(plan, sigma, model.state)
    for a, b in zip(jax.tree_util.tree_leaves(model.state),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plan_rejections():
    from nnueehcs_tpu.nn.network import build_network
    M, B = 2, 16
    # dropout *before* a Linear is fusable (MC dropout family) …
    net = build_network([{'Linear': {'args': [5, 16]}},
                         {'BatchNorm1d': {'args': [16]}},
                         {'Dropout': {'args': [0.1]}},
                         {'Linear': {'args': [16, 1]}}])
    plan = ft.plan_fused_train(net, M, B)
    assert plan is not None and plan.n_drop == 1
    # … but a trailing Dropout (after the last Linear) is not
    net = build_network([{'Linear': {'args': [5, 16]}},
                         {'BatchNorm1d': {'args': [16]}}, {'ReLU': {}},
                         {'Linear': {'args': [16, 1]}},
                         {'Dropout': {'args': [0.1]}}])
    assert ft.plan_fused_train(net, M, B) is None
    # unstacked (member_stacked=False) only makes sense for one member
    good_drop = build_network([{'Linear': {'args': [5, 16]}},
                               {'BatchNorm1d': {'args': [16]}}, {'ReLU': {}},
                               {'Dropout': {'args': [0.25]}},
                               {'Linear': {'args': [16, 1]}}])
    assert ft.plan_fused_train(good_drop, 2, B,
                               member_stacked=False) is None
    assert ft.plan_fused_train(good_drop, 1, B,
                               member_stacked=False) is not None
    # non-final Linear without BatchNorm → not fusable
    net = build_network([{'Linear': {'args': [5, 16]}}, {'ReLU': {}},
                         {'Linear': {'args': [16, 1]}}])
    assert ft.plan_fused_train(net, M, B) is None
    # width beyond one lane tile → not fusable
    net = build_network([{'Linear': {'args': [5, 256]}},
                         {'BatchNorm1d': {'args': [256]}}, {'ReLU': {}},
                         {'Linear': {'args': [256, 1]}}])
    assert ft.plan_fused_train(net, M, B) is None
    # unsupported loss / odd batch
    good = build_network(_arch())
    assert ft.plan_fused_train(good, M, B, loss='huber_loss') is None
    # batch rows must fill whole sublane tiles (padded rows would enter
    # the BatchNorm batch statistics)
    assert ft.plan_fused_train(good, M, 24) is not None
    assert ft.plan_fused_train(good, M, 12) is None
    # blowing the VMEM budget (many members) → None
    assert ft.plan_fused_train(good, 4096, B) is None


# ---------------------------------------------------------------------------
# Trainer integration: fused_epochs='force' engages the kernel off-TPU
# (interpreter) and must land in the same place as the XLA scan path
# ---------------------------------------------------------------------------
def _fit(fused, seed=7, epochs=3):
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)
    model = _build(M=2, d=5)
    dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                    drop_last=True)
    vdl = DataLoader(ArrayDataset(x, y), batch_size=16)
    tr = Trainer('t/fused', {'accelerator': 'cpu', 'max_epochs': epochs,
                             'gradient_clip_val': 5.0, 'seed': seed,
                             'fused_epochs': 'force' if fused else False},
                 callbacks=[EarlyStopping(patience=100)],
                 log_dir=None if False else '/tmp/_fused_it',
                 version=f'v{int(fused)}')
    tr.fit(model, dl, vdl)
    return model, tr


def test_trainer_engages_kernel_and_matches_scan_path(tmp_path):
    m_fused, tr_fused = _fit(True)
    m_scan, tr_scan = _fit(False)
    # identical shuffle/seed/loss semantics → the two paths track tightly
    assert abs(tr_fused.callback_metrics['val_loss']
               - tr_scan.callback_metrics['val_loss']) < 1e-3
    x = np.random.default_rng(1).normal(size=(32, 5)).astype(np.float32)
    p1, _ = m_fused(x, return_ue=True)
    p2, _ = m_scan(x, return_ue=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=0.1, atol=0.05)


def test_trainer_kernel_to_scan_handoff():
    """A hook that asks for training batches on a later epoch forces the
    trainer to hand the kernel's Adam state back to optax mid-fit."""
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    from nnueehcs_tpu.training.hooks import TrainerHook

    seen = []

    class LateBatchHook(TrainerHook):
        def on_train_batch_end(self, trainer, model, batch, batch_idx):
            seen.append((trainer.current_epoch, batch_idx))

        def wants_train_batches(self, epoch):
            return epoch == 2

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)
    model = _build(M=2, d=5)
    dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                    drop_last=True)
    tr = Trainer('t/handoff', {'accelerator': 'cpu', 'max_epochs': 4,
                               'gradient_clip_val': 5.0,
                               'fused_epochs': 'force'},
                 callbacks=[EarlyStopping(patience=100), LateBatchHook()],
                 log_dir='/tmp/_fused_it', version='v2')
    LateBatchHook.wants_train_batches = lambda self, epoch: epoch == 2
    tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
    # the hook observed epoch 2's batches and training completed
    assert {e for e, _ in seen} == {2}
    assert 'val_loss' in tr.callback_metrics


# ---------------------------------------------------------------------------
# MC-dropout family: unstacked single net, in-kernel dropout masks
# ---------------------------------------------------------------------------
def _build_mc(p, d=5, num_samples=4):
    from nnueehcs_tpu.model_builder import MCDropoutModelBuilder
    model = MCDropoutModelBuilder(
        _arch(d=d), {'num_samples': num_samples, 'dropout_percent': p},
        train_config={'loss': 'l1_loss'}).build()
    model.init(jax.random.PRNGKey(0), (d,))
    return model


def _mc_plan(model, B, p0_expected=None):
    plan = ft.plan_fused_train(model.net, 1, B, loss='l1_loss', clip=5.0,
                               member_stacked=False)
    assert plan is not None and not plan.member_stacked
    if p0_expected is not None:
        assert plan.n_drop == p0_expected
    return plan


def test_mcdropout_unstacked_roundtrip():
    model = _build_mc(0.3)
    plan = _mc_plan(model, 16, p0_expected=1)
    theta = ft.pack_tree(plan, model.params)
    p2 = ft.unpack_tree(plan, theta, model.params)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape          # no stray member axis
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sigma = ft.pack_state(plan, model.state)
    s2 = ft.unpack_state(plan, sigma, model.state)
    for a, b in zip(jax.tree_util.tree_leaves(model.state),
                    jax.tree_util.tree_leaves(s2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mcdropout_p0_matches_xla_exactly():
    """dropout_percent=0 makes both paths deterministic: the fused epoch
    must reproduce the XLA trajectory exactly (pins the unstacked packing
    and single-sweep loss/grad path end-to-end)."""
    B, S, d = 16, 8, 5
    model = _build_mc(0.0)
    # the Dropout layer still gets a mask slot (slots are structural so a
    # dropout_percent sweep shares one compiled program); rate 0 at
    # runtime makes the mask exactly identity
    plan = _mc_plan(model, B, p0_expected=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(S * B, 1)), jnp.float32)

    _, _, _, losses_ref = _reference_run(model, x, y, S, B, 1e-3, 5.0, 0.0)
    _, _, _, _, losses = _fused_run(model, plan, x, y, S, B, 1e-3)
    np.testing.assert_allclose(np.asarray(losses), losses_ref, atol=5e-6)


def test_mcdropout_seed_semantics():
    """Same seed → bit-identical epoch; different seed → different masks
    (and so a different trajectory)."""
    B, S, d = 16, 6, 5
    model = _build_mc(0.5)
    plan = _mc_plan(model, B, p0_expected=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(S * B, 1)), jnp.float32)
    xs, ys = ft.gather_epoch_batches(plan, x, y, jnp.arange(S * B))

    def run(seed):
        theta = ft.pack_tree(plan, model.params)
        sigma = ft.pack_state(plan, model.state)
        out = ft.fused_epoch(plan, theta, jnp.zeros_like(theta),
                             jnp.zeros_like(theta), sigma, xs, ys, 1e-3, 0,
                             seed=seed, drops=ft.drop_rates(model.net),
                             interpret=True)
        return np.asarray(out[4]), np.asarray(out[0])

    l_a, th_a = run(123)
    l_b, th_b = run(123)
    l_c, _ = run(456)
    np.testing.assert_array_equal(l_a, l_b)
    np.testing.assert_array_equal(th_a, th_b)
    assert not np.allclose(l_a, l_c)


def test_mcdropout_dropout_epoch_trains():
    """With active dropout the fused trajectory still learns, and lands in
    the neighbourhood of the XLA dropout path (different PRNG streams —
    trajectories are compared loosely on the smoothed tail)."""
    B, S, d = 16, 60, 5
    model = _build_mc(0.2)
    plan = _mc_plan(model, B, p0_expected=1)

    rng = np.random.default_rng(0)
    xall = rng.normal(size=(S * B, d)).astype(np.float32)
    yall = (xall.sum(axis=1, keepdims=True)
            + 0.1 * rng.normal(size=(S * B, 1))).astype(np.float32)
    x, y = jnp.asarray(xall), jnp.asarray(yall)

    # lr=1e-2: decisive convergence for both paths (at 1e-3 the XLA dropout
    # path itself only reaches ~0.69 head→tail in 60 steps)
    _, _, _, losses_ref = _reference_run(model, x, y, S, B, 1e-2, 5.0, 0.0)
    _, _, _, _, losses = _fused_run(model, plan, x, y, S, B, 1e-2)
    losses = np.asarray(losses)
    assert losses[-5:].mean() < 0.6 * losses[:5].mean()
    # tail means agree within dropout-noise tolerance
    ref_tail = losses_ref[-10:].mean()
    assert abs(losses[-10:].mean() - ref_tail) < 0.35 * ref_tail


def test_trainer_fuses_mcdropout(tmp_path):
    """Trainer engages the kernel for MCDropoutModel and the result is a
    usable model (val_loss tracks the scan path loosely)."""
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)

    def fit(fused):
        model = _build_mc(0.1)
        dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                        drop_last=True)
        tr = Trainer('t/fmc', {'accelerator': 'cpu', 'max_epochs': 3,
                               'gradient_clip_val': 5.0, 'seed': 7,
                               'fused_epochs': 'force' if fused else False},
                     callbacks=[EarlyStopping(patience=100)],
                     log_dir=str(tmp_path), version=f'mc{int(fused)}')
        tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
        return model, tr

    m_fused, tr_fused = fit(True)
    m_scan, tr_scan = fit(False)
    assert tr_fused.fused_epochs_used == 3
    assert tr_scan.fused_epochs_used == 0
    vf = tr_fused.callback_metrics['val_loss']
    vs = tr_scan.callback_metrics['val_loss']
    assert np.isfinite(vf)
    assert abs(vf - vs) < 0.5 * max(vs, 0.1)


# ---------------------------------------------------------------------------
# Δ-UQ / PAGER: doubled stochastic-centering batches through the kernel
# ---------------------------------------------------------------------------
def _build_duq(d=5, pager=False):
    from nnueehcs_tpu.model_builder import (DeltaUQMLPModelBuilder,
                                            PAGERModelBuilder)
    cls = PAGERModelBuilder if pager else DeltaUQMLPModelBuilder
    return cls(_arch(d=d), {'estimator': 'std'},
               train_config={'loss': 'l1_loss'}).build()


def test_delta_uq_fused_matches_scan_exactly():
    """The anchored gather replicates the scan path's per-step key
    derivation, so Δ-UQ is *bit-identically* stochastic on both paths —
    per-step losses must match to f32 tolerance."""
    B, S, d = 8, 6, 5
    model = _build_duq(d=d)
    plan = ft.plan_fused_train(model.net, 1, 2 * B, loss='l1_loss',
                               clip=5.0, member_stacked=False)
    assert plan is not None and plan.batch == 2 * B

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(S * B, 1)), jnp.float32)
    epoch_rng = jax.random.PRNGKey(42)

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.scale_by_adam())
    opt = tx.init(model.params)
    params, state = model.params, model.state
    losses_ref = []
    for s in range(S):
        xb, yb = x[s * B:(s + 1) * B], y[s * B:(s + 1) * B]
        rng_s = jax.random.fold_in(epoch_rng, s)
        (loss, state), grads = jax.value_and_grad(
            model.training_loss, has_aux=True)(params, state, (xb, yb),
                                               rng_s)
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree_util.tree_map(lambda p, u: p - 1e-3 * u,
                                        params, updates)
        losses_ref.append(float(loss))

    theta = ft.pack_tree(plan, model.params)
    sigma = ft.pack_state(plan, model.state)
    xs, ys = ft.gather_anchored_epoch_batches(plan, x, y,
                                              jnp.arange(S * B), epoch_rng)
    assert xs.shape[:2] == (S, 2 * B)
    th2, _, _, sg2, losses = ft.fused_epoch(
        plan, theta, jnp.zeros_like(theta), jnp.zeros_like(theta), sigma,
        xs, ys, 1e-3, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_ref),
                               atol=5e-6)
    p2 = ft.unpack_tree(plan, th2, model.params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


@pytest.mark.parametrize('pager', [False, True])
def test_trainer_fuses_delta_uq(tmp_path, pager):
    """Epoch 0 runs the scan path (the anchor hook observes batches);
    epochs 1+ run the kernel.  Anchor draws are identical on both paths,
    so the two trainers land on (near-)identical val losses."""
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)

    def fit(fused):
        model = _build_duq(pager=pager)
        dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                        drop_last=True)
        tr = Trainer('t/fduq', {'accelerator': 'cpu', 'max_epochs': 3,
                                'gradient_clip_val': 5.0, 'seed': 7,
                                'fused_epochs': 'force' if fused else False},
                     callbacks=([EarlyStopping(patience=100)]
                                + model.get_callbacks()),
                     log_dir=str(tmp_path), version=f'duq{int(fused)}')
        tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
        return model, tr

    m_fused, tr_fused = fit(True)
    m_scan, tr_scan = fit(False)
    assert tr_fused.fused_epochs_used == 2       # epoch 0 = anchor epoch
    assert tr_scan.fused_epochs_used == 0
    assert m_fused.anchors is not None and m_scan.anchors is not None
    vf = tr_fused.callback_metrics['val_loss']
    vs = tr_scan.callback_metrics['val_loss']
    assert abs(vf - vs) < 1e-3


def test_trainer_fuses_kde(tmp_path):
    """KDE models train as plain single-net MLPs through the kernel; the
    density fit rides the epoch-0 hook on the scan path."""
    from nnueehcs_tpu.model_builder import KDEModelBuilder
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)
    model = KDEModelBuilder(_arch(), {'rtol': 1000},
                            train_config={'loss': 'l1_loss'}).build()
    dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                    drop_last=True)
    tr = Trainer('t/fkde', {'accelerator': 'cpu', 'max_epochs': 3,
                            'gradient_clip_val': 5.0, 'seed': 7,
                            'fused_epochs': 'force'},
                 callbacks=([EarlyStopping(patience=100)]
                            + model.get_callbacks()),
                 log_dir=str(tmp_path), version='kde')
    tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
    assert tr.fused_epochs_used == 2          # epoch 0 = KDE-fit epoch
    _, ue = model(x[:8], return_ue=True)      # density fitted and scoring
    assert np.asarray(ue).shape == (8,)


def test_dropout_sweep_shares_one_plan():
    """Rates are runtime inputs: models differing only in dropout_percent
    produce EQUAL plans, so a BO sweep hits one jit/XLA entry."""
    p_a = _mc_plan(_build_mc(0.1), 16)
    p_b = _mc_plan(_build_mc(0.3), 16)
    assert p_a == p_b
    np.testing.assert_allclose(
        np.asarray(ft.drop_rates(_build_mc(0.3).net)), 0.3)


# ---------------------------------------------------------------------------
# MVE: Gaussian-NLL head (mu, raw variance) through the kernel
# ---------------------------------------------------------------------------
def _build_mve(d=5):
    from nnueehcs_tpu.model_builder import MVEModelBuilder
    return MVEModelBuilder(_arch(d=d),
                           train_config={'loss': 'l1_loss'}).build()


def test_mve_fused_matches_xla_exactly():
    """MVE is deterministic, so the NLL kernel must reproduce the XLA
    trajectory (loss curve + Adam moments) to f32 tolerance."""
    B, S, d = 16, 8, 5
    model = _build_mve(d=d)
    plan = ft.plan_fused_train(model.net, 1, B, loss='gaussian_nll',
                               clip=5.0, member_stacked=False)
    assert plan is not None and plan.lins[-1].out_w == 2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S * B, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(S * B, 1)), jnp.float32)

    _, _, _, losses_ref = _reference_run(model, x, y, S, B, 1e-3, 5.0, 0.0)
    _, _, _, _, losses = _fused_run(model, plan, x, y, S, B, 1e-3)
    np.testing.assert_allclose(np.asarray(losses), losses_ref, atol=1e-5)
    # the NLL head requires exactly 2 outputs
    m2 = _build(M=1, d=d)     # out_w == 1
    assert ft.plan_fused_train(m2.net, 1, B, loss='gaussian_nll',
                               member_stacked=False) is None


def test_trainer_fuses_mve(tmp_path):
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)

    def fit(fused):
        model = _build_mve()
        dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                        drop_last=True)
        tr = Trainer('t/fmve', {'accelerator': 'cpu', 'max_epochs': 3,
                                'gradient_clip_val': 5.0, 'seed': 7,
                                'fused_epochs': 'force' if fused else False},
                     callbacks=[EarlyStopping(patience=100)],
                     log_dir=str(tmp_path), version=f'mve{int(fused)}')
        tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
        return model, tr

    m_f, tr_f = fit(True)
    m_s, tr_s = fit(False)
    assert tr_f.fused_epochs_used == 3 and tr_s.fused_epochs_used == 0
    # deterministic family: both paths track closely (f32 reassociation
    # through the 1/var head grows ~1e-3 over 18 steps; the kernel-vs-XLA
    # per-step parity itself is pinned at 1e-5 above)
    assert abs(tr_f.callback_metrics['val_loss']
               - tr_s.callback_metrics['val_loss']) < 5e-3
    pred, sigma = m_f(x[:8], return_ue=True)
    assert np.asarray(sigma).shape == (8, 1)
    assert float(np.min(np.asarray(sigma))) > 0


# ---------------------------------------------------------------------------
# Whole-fit: every epoch in ONE device dispatch (while_loop over fused
# epochs + on-device plateau-LR / early-stop / best-checkpoint)
# ---------------------------------------------------------------------------
def _fit_traj(tmp_path, whole, version, epochs=4, es_patience=100,
              es_min_delta=0.0, model_fn=None, seed=7):
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping, ModelSavingCallback)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(axis=1, keepdims=True).astype(np.float32)
    model = (model_fn or (lambda: _build(M=2, d=5)))()
    dl = DataLoader(ArrayDataset(x, y), batch_size=16, shuffle=True,
                    drop_last=True)
    tr = Trainer('t/wf', {'accelerator': 'cpu', 'max_epochs': epochs,
                          'gradient_clip_val': 5.0, 'seed': seed,
                          'fused_epochs': 'force', 'whole_fit': whole},
                 callbacks=[EarlyStopping(patience=es_patience,
                                          min_delta=es_min_delta),
                            ModelSavingCallback(defer_serialization=True)],
                 log_dir=str(tmp_path), version=version)
    tr.fit(model, dl, DataLoader(ArrayDataset(x, y), batch_size=16))
    import csv
    vls = []
    with open(f'{tr.logger.log_dir}/metrics.csv') as f:
        for row in csv.DictReader(f):
            if row.get('val_loss'):
                vls.append(float(row['val_loss']))
    return model, tr, vls


def test_whole_fit_matches_per_epoch_kernel(tmp_path):
    m_w, tr_w, vls_w = _fit_traj(tmp_path, True, 'w')
    m_e, tr_e, vls_e = _fit_traj(tmp_path, False, 'e')
    assert tr_w.whole_fit_dispatches == 1
    assert tr_e.whole_fit_dispatches == 0
    assert tr_w.fused_epochs_used == tr_e.fused_epochs_used == 4
    # identical val trajectory (same kernels, same RNG streams, same math)
    np.testing.assert_allclose(vls_w, vls_e, rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_w.params),
                    jax.tree_util.tree_leaves(m_e.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # best-checkpoint pin exists and reloads (deferred ModelSavingCallback)
    from nnueehcs_tpu.training import load_model
    m2 = load_model(f'{tr_w.logger.log_dir}/model.pth')
    x = np.random.default_rng(1).normal(size=(8, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m2(x)),
                               np.asarray(load_model(
                                   f'{tr_e.logger.log_dir}/model.pth')(x)),
                               atol=1e-6)


def test_whole_fit_early_stop_matches(tmp_path):
    """A huge min_delta makes every epoch a non-improvement, so patience=1
    must stop after epoch 1 on the device exactly as on the host path."""
    m_w, tr_w, vls_w = _fit_traj(tmp_path, True, 'ws', epochs=12,
                                 es_patience=1, es_min_delta=1e6)
    m_e, tr_e, vls_e = _fit_traj(tmp_path, False, 'es', epochs=12,
                                 es_patience=1, es_min_delta=1e6)
    assert len(vls_w) == len(vls_e) == 2       # stop after epoch 1
    np.testing.assert_allclose(vls_w, vls_e, rtol=0, atol=1e-6)
    assert tr_w.current_epoch == tr_e.current_epoch == 1


def test_whole_fit_mcdropout(tmp_path):
    """MC dropout through the whole-fit dispatch: same trajectory as the
    per-epoch kernel path (the stateless mask stream is identical)."""
    m_w, tr_w, vls_w = _fit_traj(tmp_path, True, 'wm',
                                 model_fn=lambda: _build_mc(0.2))
    m_e, tr_e, vls_e = _fit_traj(tmp_path, False, 'em',
                                 model_fn=lambda: _build_mc(0.2))
    assert tr_w.whole_fit_dispatches == 1
    np.testing.assert_allclose(vls_w, vls_e, rtol=0, atol=1e-6)


def test_whole_fit_failure_falls_back(tmp_path, monkeypatch):
    """An injected whole-fit dispatch failure (the compile-OOM shape seen
    on-chip) must not kill the fit: the trainer latches whole-fit off for
    that PROGRAM SHAPE, surfaces the fallback in the metrics, and
    completes the identical fit on the per-epoch kernel path, preserving
    the packed Adam state.  Differently-shaped programs still get the
    whole-fit path (the latch is per-shape, not process-global)."""
    from nnueehcs_tpu.training.trainer import Trainer
    monkeypatch.setattr(Trainer, '_whole_fit_broken_shapes', set())
    real_jit = jax.jit

    def sabotaged_jit(fun, *a, **k):
        if getattr(fun, '__name__', '') == 'whole_fit_kernel':
            def boom(*args, **kw):
                raise RuntimeError('injected compile OOM')
            return boom
        return real_jit(fun, *a, **k)

    monkeypatch.setattr(jax, 'jit', sabotaged_jit)
    m_f, tr_f, vls_f = _fit_traj(tmp_path, True, 'fb')
    monkeypatch.setattr(jax, 'jit', real_jit)
    assert Trainer._whole_fit_broken_shapes
    assert tr_f.whole_fit_dispatches == 0
    assert tr_f.fused_epochs_used == 4
    # the degradation is visible to the trial record, not just stderr
    assert tr_f.callback_metrics.get('whole_fit_fallback') == 1.0
    # a later fit with the SAME program shape must not attempt it again
    m_2, tr_2, vls_2 = _fit_traj(tmp_path, True, 'fb2')
    assert tr_2.whole_fit_dispatches == 0
    # ... but a DIFFERENT shape (longer epoch budget) still engages
    m_3, tr_3, vls_3 = _fit_traj(tmp_path, True, 'fb3', epochs=5)
    assert tr_3.whole_fit_dispatches == 1
    # the degraded fit is numerically identical to the per-epoch path
    monkeypatch.setattr(Trainer, '_whole_fit_broken_shapes', set())
    m_e, tr_e, vls_e = _fit_traj(tmp_path, False, 'eb')
    np.testing.assert_allclose(vls_f, vls_e, rtol=0, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_f.params),
                    jax.tree_util.tree_leaves(m_e.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bf16_mixed_tracks_f32_loosely():
    """bf16 GEMM operands (f32 accumulation/master weights): the loss curve
    must track the f32 path within mixed-precision tolerance."""
    M, B, S, d = 2, 16, 20, 5
    model = _build(M=M, d=d)
    plan32 = ft.plan_fused_train(model.net, M, B, loss='l1_loss', clip=5.0)
    plan16 = ft.plan_fused_train(model.net, M, B, loss='l1_loss', clip=5.0,
                                 bf16=True)
    assert plan16.bf16 and not plan32.bf16

    rng = np.random.default_rng(0)
    xall = rng.normal(size=(S * B, d)).astype(np.float32)
    yall = xall.sum(axis=1, keepdims=True).astype(np.float32)
    x, y = jnp.asarray(xall), jnp.asarray(yall)

    _, _, _, _, l32 = _fused_run(model, plan32, x, y, S, B, 1e-3)
    _, _, _, _, l16 = _fused_run(model, plan16, x, y, S, B, 1e-3)
    l32, l16 = np.asarray(l32), np.asarray(l16)
    # same trajectory within bf16 resolution, and learning still happens
    np.testing.assert_allclose(l16, l32, rtol=0.1, atol=0.05)
    assert l16[-5:].mean() < 0.9 * l16[:5].mean()


def test_whole_fit_auto_heuristic(tmp_path):
    """whole_fit: 'auto' (the default) engages only when the remaining
    epochs clear the measured break-even point, and — with EarlyStopping
    present — only after the fit has survived WHOLE_FIT_AUTO_DELAY epochs,
    so short early-stopped fits never pay the compile premium."""
    from nnueehcs_tpu.training import Trainer

    # short fit: remaining < break-even -> never engages
    _, tr, _ = _fit_traj(tmp_path, 'auto', 'a1', epochs=4)
    assert tr.whole_fit_dispatches == 0
    assert tr.fused_epochs_used == 4

    # long fit (thresholds scaled down to keep the test fast): engages
    # exactly once the survival delay passes, and the trajectory matches
    # the pure per-epoch kernel path
    old = (Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS, Trainer.WHOLE_FIT_AUTO_DELAY)
    Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS = 3
    Trainer.WHOLE_FIT_AUTO_DELAY = 2
    try:
        _, tr_a, vls_a = _fit_traj(tmp_path, 'auto', 'a2', epochs=8)
        _, tr_e, vls_e = _fit_traj(tmp_path, False, 'a3', epochs=8)
        assert tr_a.whole_fit_dispatches == 1
        assert tr_a.fused_epochs_used == 8
        np.testing.assert_allclose(vls_a, vls_e, rtol=0, atol=1e-6)
    finally:
        (Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS,
         Trainer.WHOLE_FIT_AUTO_DELAY) = old


def test_whole_fit_auto_engages_early_with_compilation_cache(tmp_path):
    """With the persistent XLA compilation cache enabled (run_bo_experiment
    turns it on), the compile premium is paid once per program shape per
    BO cell, so 'auto' uses the lower cached break-even and skips the
    early-stop survival delay — the in-device while_loop stop means an
    engaged fit never wastes epochs."""
    import jax
    from nnueehcs_tpu.training import Trainer

    old = (Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS,
           Trainer.WHOLE_FIT_AUTO_DELAY,
           Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS_CACHED)
    # uncached thresholds far out of reach: engagement can only come from
    # the cached branch
    Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS = 10_000
    Trainer.WHOLE_FIT_AUTO_DELAY = 10_000
    Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS_CACHED = 3
    prev_dir = jax.config.jax_compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', str(tmp_path / 'xc'))
    try:
        _, tr_a, vls_a = _fit_traj(tmp_path, 'auto', 'c1', epochs=8)
        _, tr_e, vls_e = _fit_traj(tmp_path, False, 'c2', epochs=8)
        assert tr_a.whole_fit_dispatches == 1
        np.testing.assert_allclose(vls_a, vls_e, rtol=0, atol=1e-6)
    finally:
        jax.config.update('jax_compilation_cache_dir', prev_dir)
        (Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS,
         Trainer.WHOLE_FIT_AUTO_DELAY,
         Trainer.WHOLE_FIT_BREAK_EVEN_EPOCHS_CACHED) = old


@pytest.mark.parametrize('family', ['delta_uq', 'pager', 'mve'])
def test_whole_fit_all_hooked_families(tmp_path, family):
    """Whole-fit through the anchor-capturing (ΔUQ/PAGER) and NLL (MVE)
    families: epoch 0 stays on the scan path for the batch hooks, the
    remaining epochs run as one dispatch, and the val trajectory matches
    the per-epoch kernel path exactly (incl. ΔUQ's capped validation)."""
    import csv
    from nnueehcs_tpu.model_builder import (DeltaUQMLPModelBuilder,
                                            PAGERModelBuilder,
                                            MVEModelBuilder)
    from nnueehcs_tpu.training import (Trainer, DataLoader, ArrayDataset,
                                       EarlyStopping, ModelSavingCallback)
    builders = {
        'delta_uq': (DeltaUQMLPModelBuilder,
                     {'estimator': 'std', 'num_anchors': 8,
                      'val_num_anchors': 4}),
        'pager': (PAGERModelBuilder, {'estimator': 'std', 'num_anchors': 8}),
        'mve': (MVEModelBuilder, {'min_variance': 1e-6}),
    }
    builder, kw = builders[family]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, 5)).astype(np.float32)
    y = x.sum(1, keepdims=True).astype(np.float32)
    descr = [{'Linear': {'args': [5, 16]}}, {'BatchNorm1d': {'args': [16]}},
             {'ReLU': {}}, {'Linear': {'args': [16, 1]}}]

    def fit(whole, version):
        m = builder(descr, dict(kw), train_config={'loss': 'l1_loss'}).build()
        tr = Trainer('t/wf_fam', {'accelerator': 'cpu', 'max_epochs': 5,
                                  'gradient_clip_val': 5.0, 'seed': 7,
                                  'fused_epochs': 'force',
                                  'whole_fit': whole},
                     callbacks=m.get_callbacks() + [
                         EarlyStopping(patience=100),
                         ModelSavingCallback(defer_serialization=True)],
                     log_dir=str(tmp_path), version=version)
        tr.fit(m, DataLoader(ArrayDataset(x, y), 16, shuffle=True,
                             drop_last=True),
               DataLoader(ArrayDataset(x, y), 16))
        vls = []
        with open(f'{tr.logger.log_dir}/metrics.csv') as f:
            for row in csv.DictReader(f):
                if row.get('val_loss'):
                    vls.append(float(row['val_loss']))
        return tr, vls

    tr_w, vls_w = fit(True, f'w_{family}')
    tr_e, vls_e = fit(False, f'e_{family}')
    assert tr_w.whole_fit_dispatches == 1
    assert tr_e.whole_fit_dispatches == 0
    np.testing.assert_allclose(vls_w, vls_e, rtol=0, atol=1e-6)
