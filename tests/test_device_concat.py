"""DeviceConcatPlan: on-device batch assembly must reproduce concat_graphs
exactly (bitwise for floats, value-equal for index arrays) — it replaces the
host concat + transfer on the training hot path (zero per-batch transfers)."""
import jax
import numpy as np

from mswe_gnn_tpu.data.dataset import (fit_dataset_scalers, make_spec,
                                       process_record, to_temporal_samples,
                                       union_spec)
from mswe_gnn_tpu.data.synthetic import generate_simulation_record
from mswe_gnn_tpu.graph import DeviceConcatPlan, concat_graphs, stack_graphs
from tests.test_models import SCALER_KINDS, make_samples


def _assert_graphs_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert a.spec == b.spec and a.num_graphs == b.num_graphs
    assert a.previous_t == b.previous_t and a.bc_kind == b.bc_kind


def test_device_concat_matches_concat_graphs_same_mesh():
    samples, _ = make_samples(rollout=2)
    stacked = stack_graphs(samples)
    plan = DeviceConcatPlan(samples[0].spec, 3)
    for idx in ([0, 1, 2], [2, 0, 1], [1, 1, 3]):
        got = plan(stacked, np.asarray(idx))
        want = concat_graphs([samples[i] for i in idx])
        _assert_graphs_equal(got, want)


def test_device_concat_matches_across_meshes():
    """Samples from different triangulated meshes (different BC nodes and
    ELL tables) under one union spec: the on-device remap must equal the
    host LUT remap entry for entry."""
    recs = [generate_simulation_record(i, nx=10, ny=10, num_scales=2,
                                       total_hours=4, substeps=2,
                                       mesh_type="triangulated")
            for i in range(2)]
    scalers = fit_dataset_scalers(recs, SCALER_KINDS)
    spec = union_spec([make_spec(r.mesh, len(r.mesh.ghosts.ghost_nodes),
                                 pad_multiple=8) for r in recs])
    graphs = [g for r in recs
              for g in to_temporal_samples(process_record(r, scalers), spec,
                                           previous_t=2, rollout_steps=1)[:2]]
    stacked = stack_graphs(graphs)
    plan = DeviceConcatPlan(spec, 2)
    for idx in ([0, 2], [2, 1], [3, 3]):
        got = plan(stacked, np.asarray(idx))
        want = concat_graphs([graphs[i] for i in idx])
        _assert_graphs_equal(got, want)


def test_trainer_batches_device_equals_host():
    """Trainer._batches with the device-resident dataset must yield the same
    batches (same shuffle order, same values) as the host concat path."""
    from mswe_gnn_tpu.models.msgnn import apply_msgnn
    from mswe_gnn_tpu.training.train import Trainer, TrainerOptions
    from tests.test_rollout import make_model

    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, seed=7)
    a = Trainer(apply_msgnn, cfg, params, opts, samples[:5], samples[:2],
                device_dataset=True)
    b = Trainer(apply_msgnn, cfg, params, opts, samples[:5], samples[:2],
                device_dataset=False)
    for ga, gb in zip(a._batches(a.train_graphs, 2, True),
                      b._batches(b.train_graphs, 2, True)):
        _assert_graphs_equal(ga, gb)


def test_device_concat_identity_for_b1():
    samples, _ = make_samples(rollout=2)
    stacked = stack_graphs(samples)
    plan = DeviceConcatPlan(samples[0].spec, 1)
    got = plan(stacked, np.asarray([1]))
    la = jax.tree_util.tree_leaves(got)
    lb = jax.tree_util.tree_leaves(samples[1])
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
