"""Training loop: loss semantics vs numpy oracle, jitted train step learns,
curriculum schedule, eval metrics."""
import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.graph import stack_graphs
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.training import loss as loss_lib
from mswe_gnn_tpu.training.train import (
    Trainer, TrainerOptions, curriculum_rollout_steps, eval_step,
    make_optimizer, pushforward_loss, train_step,
)
from tests.test_models import make_samples
from tests.test_rollout import make_model


def test_loss_oracle_rmse_only_where_water(rng):
    """Masked RMSE equals the reference compact-rows formulation."""
    samples, _ = make_samples()
    g = samples[0]
    n = g.num_nodes
    preds = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    target = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    # zero out some rows entirely so where_water excludes them
    zero_rows = rng.integers(0, n, 20)
    preds = preds.at[zero_rows].set(0)
    target = target.at[zero_rows].set(0)

    sums, count, _ = loss_lib.step_loss_sums(
        preds, target, g, type_loss="RMSE", only_where_water=True,
        multiscale=True)
    got = np.asarray(loss_lib.finalize_error(sums, count, "RMSE"))

    fs = g.spec.node_slice(0)
    diff = np.asarray(preds - target)[fs]
    nmask = np.asarray(g.node_mask)[fs] > 0
    www = (diff != 0).any(1)
    sel = diff[nmask & www]
    want = np.sqrt((sel ** 2).mean(0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_velocity_scaler_weighting():
    s = loss_lib.loss_variable_scaler(7.0)
    err = jnp.asarray([1.0, 2.0])
    got = float(jnp.dot(err, s) / s.sum())
    assert abs(got - (1.0 + 14.0) / 8.0) < 1e-6


def test_conservation_residual_zero_for_exact_balance():
    """If predicted volume change equals inflow (plus ghost correction),
    the residual vanishes."""
    samples, _ = make_samples()
    g = samples[0]
    n = g.num_nodes
    input_wd = jnp.zeros((n, 1))
    bc_now = jnp.asarray(np.ones(g.bc_nodes.shape[0], np.float32))
    inflow_vol = float(jnp.sum(bc_now * g.bc_edge_length * g.bc_mask) * 60.0 * g.temporal_res)
    # distribute the inflow volume over exactly one finest-scale interior cell
    fs = g.spec.node_slice(0)
    cell = int(np.setdiff1d(np.arange(fs.start, fs.stop),
                            np.asarray(g.bc_nodes))[0])
    dh = inflow_vol / float(g.area[cell])
    pred_wd = jnp.zeros((n, 1)).at[cell, 0].set(dh)
    res = loss_lib.conservation_residual(pred_wd, input_wd, g, bc_now)
    assert abs(float(res)) < 1e-4


def test_curriculum_schedule():
    opts = TrainerOptions(curriculum_epoch=20, max_rollout_steps=6)
    assert curriculum_rollout_steps(0, opts) == 1
    assert curriculum_rollout_steps(19, opts) == 1
    assert curriculum_rollout_steps(20, opts) == 2
    assert curriculum_rollout_steps(1000, opts) == 6
    opts0 = TrainerOptions(curriculum_epoch=0, max_rollout_steps=6)
    assert curriculum_rollout_steps(0, opts0) == 6


def test_train_step_decreases_loss():
    samples, _ = make_samples(rollout=2)
    batch = stack_graphs(samples[:4])
    g = samples[0]
    cfg, params = make_model(g, K=1, hid=8)
    opts = TrainerOptions(batch_size=4, learning_rate=1e-2, velocity_scaler=1.0,
                          only_where_water=True)
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(25):
        params, opt_state, loss = train_step(
            params, opt_state, batch, apply_fn=apply_msgnn, cfg=cfg,
            rollout_steps=2, opts=opts, multiscale=True, optimizer=optimizer)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.95, losses


def test_eval_step_metrics_keys():
    samples, _ = make_samples(rollout=3)
    batch = stack_graphs(samples[:2])
    cfg, params = make_model(samples[0], K=1, hid=8)
    m = eval_step(params, batch, apply_fn=apply_msgnn, cfg=cfg, steps=3,
                  opts=TrainerOptions(), multiscale=True)
    assert set(m) == {"val_loss", "val_CSI_005", "val_CSI_03"}
    assert np.isfinite(float(m["val_loss"]))


def test_eval_step_per_graph_matches_singletons():
    """Per-simulation curves from a concat batch equal per-graph eval runs."""
    from mswe_gnn_tpu.graph import concat_graphs

    samples, _ = make_samples(rollout=3)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions()
    batch = concat_graphs(samples[:2])
    m = eval_step(params, batch, apply_fn=apply_msgnn, cfg=cfg, steps=3,
                  opts=opts, multiscale=True, per_graph=True)
    assert m["per_graph_CSI_005"].shape == (2,)
    assert m["per_graph_loss"].shape == (2, 2)
    for i in range(2):
        mi = eval_step(params, samples[i], apply_fn=apply_msgnn, cfg=cfg,
                       steps=3, opts=opts, multiscale=True)
        np.testing.assert_allclose(float(m["per_graph_CSI_005"][i]),
                                   float(mi["val_CSI_005"]), rtol=1e-4,
                                   atol=1e-5)


def test_tune_batch_size_returns_candidate():
    from mswe_gnn_tpu.training.train import tune_batch_size

    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(max_rollout_steps=2)
    best, rates = tune_batch_size(apply_msgnn, cfg, params, samples[:4], opts,
                                  candidates=(1, 2), reps=1)
    assert best in (1, 2)
    assert set(rates) == {1, 2}
    assert all(r > 0 for r in rates.values())


def test_validation_includes_ragged_tail():
    """validate() must evaluate EVERY val graph: with 3 val graphs and
    batch_size 2 the tail graph gets its own batch (the train loop, by
    contrast, drops ragged tails for static per-epoch shapes)."""
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_rollout_steps=2)
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:3])
    val_batches = list(tr._batches(tr.val_graphs, 2, False, drop_tail=False))
    assert [b.num_graphs for b in val_batches] == [2, 1]
    train_batches = list(tr._batches(tr.train_graphs, 2, True))
    assert [b.num_graphs for b in train_batches] == [2, 2]
    m = tr.validate()
    assert np.isfinite(m["val_loss"])


def test_trainer_fit_smoke():
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=2, curriculum_epoch=1,
                          max_rollout_steps=2, learning_rate=1e-3)
    tr = Trainer(apply_msgnn, cfg, params, opts,
                 train_graphs=samples[:4], val_graphs=samples[:2])
    hist = tr.fit(max_epochs=2)
    assert len(hist) == 2
    assert "val_loss" in hist[-1]


def test_trainer_watch_logs_param_and_update_norms():
    """watch_every logs per-module param/update L2 norms (the reference's
    wandb watch(log='all') analog, reference main.py:95)."""
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=2, curriculum_epoch=1,
                          max_rollout_steps=2, learning_rate=1e-3,
                          watch_every=1)
    tr = Trainer(apply_msgnn, cfg, params, opts,
                 train_graphs=samples[:4], val_graphs=samples[:2])
    seen = []
    tr.watch_fn = lambda p, e: seen.append(e)
    hist = tr.fit(max_epochs=2)
    norm_keys = [k for k in hist[-1] if k.startswith("watch/")]
    assert any(k.endswith("_norm") and not k.endswith("_update_norm")
               for k in norm_keys)
    assert any(k.endswith("_update_norm") for k in norm_keys)
    assert all(np.isfinite(hist[-1][k]) for k in norm_keys)
    # an epoch of training must produce a nonzero net update
    assert sum(hist[-1][k] for k in norm_keys
               if k.endswith("_update_norm")) > 0
    assert seen == [0, 1]


def test_spike_rollback_restores_best_params():
    """The divergence guard restores best-val params on a loss spike or a
    non-finite loss, and stays quiet on normal fluctuations."""
    samples, _ = make_samples(rollout=2)
    g = samples[0]
    cfg, params = make_model(g, K=1, hid=8)
    opts = TrainerOptions(batch_size=2, spike_rollback_factor=10.0,
                          spike_window=4)
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:2], samples[:1])
    golden = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                    tr.params)
    tr.best_params = golden
    tr.best_score = 0.5  # a validation has happened

    # normal epochs: no rollback
    for loss in (0.10, 0.11, 0.09, 0.12):
        assert not tr._maybe_rollback(loss)
    # corrupt live params, then spike
    tr.params = jax.tree_util.tree_map(lambda x: x + 100.0, tr.params)
    assert tr._maybe_rollback(5.0)  # > 10x median(0.09..0.12)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(golden)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # non-finite loss triggers regardless of history
    tr.params = jax.tree_util.tree_map(lambda x: x + 100.0, tr.params)
    assert tr._maybe_rollback(float("nan"))
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(golden)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # guard disabled -> never triggers
    tr.opts = TrainerOptions(spike_rollback_factor=0.0)
    for loss in (0.1, 0.1, 0.1, 50.0, float("nan")):
        assert not tr._maybe_rollback(loss)

    # no validation yet (no best params) -> no rollback on spike
    tr2 = Trainer(apply_msgnn, cfg, params, opts, samples[:2], samples[:1])
    for loss in (0.1, 0.1, 0.1):
        tr2._maybe_rollback(loss)
    assert not tr2._maybe_rollback(99.0)


def test_validate_weights_batches_per_graph(monkeypatch):
    """validate() weights each batch's metrics by its graph count: with a
    ragged tail (batches of 2 and 1 graphs) the aggregate is the per-graph
    mean, not the per-batch mean (VERDICT r1 weak #7)."""
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_rollout_steps=2)
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:3])

    import mswe_gnn_tpu.training.train as train_mod

    def fake_eval_step(params, batch, **kw):
        # metric = 1.0 per graph in the first (full) batch, 4.0 in the tail
        v = 1.0 if int(batch.num_graphs) == 2 else 4.0
        return {"val_loss": v, "val_CSI_005": v, "val_CSI_03": v}

    monkeypatch.setattr(train_mod, "eval_step", fake_eval_step)
    m = tr.validate()
    # per-graph mean = (1+1+4)/3 = 2.0; per-batch mean would be 2.5
    assert abs(m["val_loss"] - 2.0) < 1e-9


def test_heartbeat_file_written_during_fit(tmp_path):
    """fit() touches <ckpt>/heartbeat per batch so an external stall
    watchdog can distinguish long epochs from a wedged process."""
    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=1, max_rollout_steps=2)
    ckpt = str(tmp_path / "autosave")
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                 checkpoint_dir=ckpt)
    tr._last_heartbeat = 0.0
    tr.fit(max_epochs=1)
    import os
    assert os.path.exists(os.path.join(ckpt, "heartbeat"))


def test_best_checkpoint_selected_on_csi_not_loss(monkeypatch):
    """Best-params selection follows opts.best_metric (default val_CSI_005).

    Regression for the runs/accuracy2 failure: with noisy full-rollout
    val_loss, a single low-loss fluke at a mediocre-CSI epoch froze the
    'best' checkpoint ~0.2 CSI below the end-of-training params."""
    samples, _ = make_samples(rollout=2)
    g = samples[0]
    cfg, params = make_model(g, K=1, hid=8)

    # scripted validations: epoch 0 = low loss / low CSI (the fluke),
    # epoch 1 = higher loss / high CSI (the genuinely better model)
    script = [{"val_loss": 0.40, "val_CSI_005": 0.55, "val_CSI_03": 0.4},
              {"val_loss": 0.60, "val_CSI_005": 0.82, "val_CSI_03": 0.7}]

    def run(best_metric):
        opts = TrainerOptions(batch_size=2, max_epochs=2, curriculum_epoch=1,
                              max_rollout_steps=2, learning_rate=1e-3,
                              best_metric=best_metric)
        tr = Trainer(apply_msgnn, cfg, params, opts, samples[:2], samples[:1])
        seq = iter([dict(s) for s in script])
        marks = []

        def fake_validate():
            m = next(seq)
            # tag the live params so we can identify which epoch's params
            # were captured as best
            marks.append(float(np.asarray(
                jax.tree_util.tree_leaves(tr.params)[0]).ravel()[0]))
            return m

        monkeypatch.setattr(tr, "validate", fake_validate)
        tr.fit(max_epochs=2)
        best_mark = float(np.asarray(
            jax.tree_util.tree_leaves(tr.best_params)[0]).ravel()[0])
        return marks, best_mark, tr.best_score

    marks, best_mark, score = run("val_CSI_005")
    assert best_mark == marks[1], "CSI criterion must pick the high-CSI epoch"
    assert score == 0.82
    marks, best_mark, score = run("val_loss")
    assert best_mark == marks[0], "val_loss criterion keeps reference behavior"
    assert score == 0.40
