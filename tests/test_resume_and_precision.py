"""Crash-recovery resume and bf16 mixed-precision training."""
import os

import jax
import numpy as np

from mswe_gnn_tpu.graph import stack_graphs
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.training.train import (
    Trainer, TrainerOptions, make_optimizer, train_step,
)
from tests.test_models import make_samples


def test_trainer_checkpoint_resume(tmp_path):
    samples, _ = make_samples(rollout=2)
    from tests.test_rollout import make_model

    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=4, curriculum_epoch=2,
                          max_rollout_steps=2, learning_rate=1e-3)
    ckpt = str(tmp_path / "autosave")
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                 checkpoint_dir=ckpt, checkpoint_every=2)
    tr.fit(max_epochs=3)
    assert os.path.exists(os.path.join(ckpt, "meta.json"))

    # fresh trainer resumes from epoch 2 and continues to 4
    tr2 = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                  checkpoint_dir=ckpt, checkpoint_every=100)
    start = tr2.resume(ckpt)
    assert start == 2
    hist = tr2.fit(max_epochs=4)
    assert hist[-1]["epoch"] == 3
    # restored params match the checkpointed ones before further training
    tr3 = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2])
    tr3.resume(ckpt)
    a = jax.tree_util.tree_leaves(tr3.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in a)


def test_best_val_params_survive_resume(tmp_path):
    """The best-validation params persist to <autosave>/best_val and are
    restored by resume(), so a supervisor restarting bounded-lifetime
    processes (examples/train_supervised.sh — the workaround for the axon
    client's per-transfer host-memory leak) keeps the GLOBAL best, not just
    the best of the final process."""
    samples, _ = make_samples(rollout=2)
    from tests.test_rollout import make_model

    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=4, curriculum_epoch=2,
                          max_rollout_steps=2, learning_rate=1e-3)
    ckpt = str(tmp_path / "autosave")
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                 checkpoint_dir=ckpt, checkpoint_every=2)
    tr.fit(max_epochs=2)
    assert os.path.exists(os.path.join(ckpt, "best_val", "meta.json"))
    best_loss = tr.best_val_loss
    golden = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.best_params)]

    tr2 = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                  checkpoint_dir=ckpt)
    tr2.resume(ckpt)
    assert tr2.best_val_loss == best_loss
    for a, b in zip(jax.tree_util.tree_leaves(tr2.best_params), golden):
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0)


def test_bf16_training_step_runs_and_learns():
    samples, _ = make_samples(rollout=2)
    batch = stack_graphs(samples[:4])
    g = samples[0]
    cfg = MSGNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                      num_edge_features=g.edge_attr.shape[1], num_scales=3,
                      hid_features=16, K=1, previous_t=2,
                      learned_residuals=True, with_WL=True,
                      compute_dtype="bfloat16")
    params = init_msgnn(jax.random.PRNGKey(0), cfg)
    opts = TrainerOptions(batch_size=4, learning_rate=1e-2)
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(15):
        params, opt_state, loss = train_step(
            params, opt_state, batch, apply_fn=apply_msgnn, cfg=cfg,
            rollout_steps=2, opts=opts, multiscale=True, optimizer=optimizer)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # params remain f32 master copies (mixed precision, not low-precision state)
    assert all(np.asarray(x).dtype == np.float32
               for x in jax.tree_util.tree_leaves(params))


def test_bf16_forward_close_to_f32():
    samples, _ = make_samples(rollout=1)
    g = samples[0]
    base = dict(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                num_edge_features=g.edge_attr.shape[1], num_scales=3,
                hid_features=16, K=2, previous_t=2, learned_residuals=True,
                with_WL=True)
    cfg32 = MSGNNConfig(**base)
    cfg16 = MSGNNConfig(**base, compute_dtype="bfloat16")
    params = init_msgnn(jax.random.PRNGKey(0), cfg32)
    o32 = np.asarray(apply_msgnn(params, cfg32, g))
    o16 = np.asarray(apply_msgnn(params, cfg16, g))
    # bf16 has ~3 decimal digits; outputs should agree loosely
    denom = np.maximum(np.abs(o32), 0.05)
    assert np.median(np.abs(o16 - o32) / denom) < 0.05


def test_early_stop_state_survives_resume(tmp_path):
    """The CSI patience counter and best CSI persist through the autosave,
    so --epoch-budget relaunches cannot reset early stopping (ADVICE r1):
    with budget < patience the counter previously restarted at 0 every
    process and early stop could never fire."""
    samples, _ = make_samples(rollout=2)
    from tests.test_rollout import make_model

    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=4, max_rollout_steps=2,
                          learning_rate=1e-3)
    ckpt = str(tmp_path / "autosave")
    tr = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                 checkpoint_dir=ckpt)
    tr.fit(max_epochs=2)
    tr.best_val_csi = 0.75
    tr.epochs_without_improvement = 7
    tr.save(ckpt, 2)

    tr2 = Trainer(apply_msgnn, cfg, params, opts, samples[:4], samples[:2],
                  checkpoint_dir=ckpt)
    tr2.resume(ckpt)
    assert tr2.best_val_csi == 0.75
    assert tr2.epochs_without_improvement == 7
