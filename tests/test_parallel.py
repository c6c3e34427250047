"""Multi-device tests on the 8-way virtual CPU mesh: GSPMD-sharded training
step and shard_map halo aggregation vs single-device references."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mswe_gnn_tpu.graph import stack_graphs
from mswe_gnn_tpu.models.msgnn import apply_msgnn
from mswe_gnn_tpu.parallel.halo import (
    make_spmd_aggregate, partition_edges_by_dst,
)
from mswe_gnn_tpu.parallel.sharding import make_mesh, replicate, shard_batch
from mswe_gnn_tpu.training.train import TrainerOptions, make_optimizer, train_step
from mswe_gnn_tpu.ops.segment import segment_sum
from tests.test_models import make_samples
from tests.test_rollout import make_model


def test_halo_aggregate_matches_dense(rng):
    mesh = make_mesh(2, 4)
    n, f = 64, 16
    e = 200
    x = rng.normal(size=(n, f)).astype(np.float32)
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)

    want = np.asarray(segment_sum(jnp.asarray(x)[src] * jnp.asarray(w)[:, None],
                                  jnp.asarray(dst), n))

    src_g, dst_l, attr, mask = partition_edges_by_dst(
        np.stack([src, dst]), w[:, None], np.ones(e), n, 4)
    agg = make_spmd_aggregate(mesh)
    got = np.asarray(agg(jnp.asarray(x), jnp.asarray(src_g),
                         jnp.asarray(dst_l),
                         jnp.asarray(attr[..., 0] * mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gspmd_sharded_train_step_matches_single_device():
    samples, _ = make_samples(rollout=2)
    batch = stack_graphs(samples[:4])
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=4, learning_rate=1e-2)
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    # independent copies: train_step donates its params/opt_state buffers and
    # the replicated arrays may alias the originals' device-0 shard
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), t)
    mesh = make_mesh(2, 4)
    batch_s = shard_batch(batch, mesh, shard_graph=True)
    params_r = replicate(copy(params), mesh)
    opt_state_r = replicate(copy(opt_state), mesh)

    p1, _, loss1 = train_step(params, opt_state, batch, apply_fn=apply_msgnn,
                              cfg=cfg, rollout_steps=2, opts=opts,
                              multiscale=True, optimizer=optimizer)

    p2, _, loss2 = train_step(params_r, opt_state_r, batch_s,
                              apply_fn=apply_msgnn, cfg=cfg, rollout_steps=2,
                              opts=opts, multiscale=True, optimizer=optimizer)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_union_sharded_train_step_matches_single_device():
    """Concat-batched (union graph) training step, node/edge axes sharded
    over the whole mesh, equals the unsharded step."""
    from mswe_gnn_tpu.graph import concat_graphs
    from mswe_gnn_tpu.parallel.sharding import shard_union_batch

    samples, _ = make_samples(rollout=2)
    batch = concat_graphs(samples[:4])
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=4, learning_rate=1e-2)
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    opt_state = optimizer.init(params)

    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), t)
    mesh = make_mesh(2, 4)
    batch_s = shard_union_batch(batch, mesh)
    params_r = replicate(copy(params), mesh)
    opt_state_r = replicate(copy(opt_state), mesh)

    p1, _, loss1 = train_step(params, opt_state, batch, apply_fn=apply_msgnn,
                              cfg=cfg, rollout_steps=2, opts=opts,
                              multiscale=True, optimizer=optimizer)
    p2, _, loss2 = train_step(params_r, opt_state_r, batch_s,
                              apply_fn=apply_msgnn, cfg=cfg, rollout_steps=2,
                              opts=opts, multiscale=True, optimizer=optimizer)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_trainer_with_mesh_fits():
    """Trainer(mesh=...) places batches/params on the mesh and trains."""
    from mswe_gnn_tpu.training.train import Trainer

    samples, _ = make_samples(rollout=2)
    cfg, params = make_model(samples[0], K=1, hid=8)
    opts = TrainerOptions(batch_size=2, max_epochs=1, curriculum_epoch=1,
                          max_rollout_steps=2, learning_rate=1e-3)
    mesh = make_mesh(2, 4)
    tr = Trainer(apply_msgnn, cfg, params, opts,
                 train_graphs=samples[:4], val_graphs=samples[:2], mesh=mesh)
    hist = tr.fit(max_epochs=1)
    assert np.isfinite(hist[-1]["train_loss"])


def test_shard_batch_places_on_mesh():
    samples, _ = make_samples(rollout=2)
    batch = stack_graphs(samples[:4])
    mesh = make_mesh(4, 2)
    bs = shard_batch(batch, mesh)
    sh = bs.x_static.sharding
    assert sh.spec[0] == "data"
