"""Adaptive curriculum modes and the batch-size finder."""
import numpy as np

from mswe_gnn_tpu.training.train import (
    CurriculumController, TrainerOptions, find_max_batch_size,
)


def test_epoch_mode_matches_reference_schedule():
    opts = TrainerOptions(curriculum_epoch=10, max_rollout_steps=4)
    c = CurriculumController(opts, mode="epoch")
    got = [c.on_epoch_start(e) for e in range(45)]
    want = [min(e // 10 + 1, 4) for e in range(45)]
    assert got == want


def test_loss_mode_grows_below_threshold():
    opts = TrainerOptions(curriculum_epoch=10, max_rollout_steps=3)
    c = CurriculumController(opts, mode="loss", loss_threshold=0.1)
    assert c.on_epoch_start(0) == 1
    c.on_epoch_end(0.5)
    assert c.on_epoch_start(1) == 1
    c.on_epoch_end(0.05)
    assert c.on_epoch_start(2) == 2
    c.on_epoch_end(0.01)
    c.on_epoch_end(0.01)
    assert c.on_epoch_start(4) == 3
    c.on_epoch_end(0.001)
    assert c.on_epoch_start(5) == 3  # capped at max


def test_plateau_mode_grows_on_stall():
    opts = TrainerOptions(max_rollout_steps=3)
    c = CurriculumController(opts, mode="plateau", patience=2)
    for loss in [1.0, 0.9, 0.8]:
        c.on_epoch_end(loss)
    assert c.rollout_steps == 1  # still improving
    c.on_epoch_end(0.8)
    c.on_epoch_end(0.8)
    assert c.rollout_steps == 2  # stalled for `patience` epochs


def test_find_max_batch_size_smoke():
    from mswe_gnn_tpu.models.msgnn import apply_msgnn
    from tests.test_models import make_samples
    from tests.test_rollout import make_model

    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=1, max_rollout_steps=2)
    bs = find_max_batch_size(apply_msgnn, cfg, params, samples[:4], opts,
                             start=1, limit=4)
    assert bs in (1, 2, 4)
    assert bs >= 1
