"""Banded MXU hop kernel (ops/band_hop.py): planner + kernel parity.

The kernel must reproduce the XLA slot-gather hop exactly (the one-hot
matmul selects rows bit-exactly); these tests run the Pallas interpreter on
the CPU mesh. Hardware timing lives in bench.py (BENCH_BAND=1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.ops.band_hop import (
    TILE,
    BandPlan,
    attach_band_plan,
    band_hop,
    band_hop_reference,
    plan_band,
)


def _banded_problem(n=512, d_max=4, bw=40, feat=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    src = np.clip(np.arange(n)[:, None]
                  + rng.integers(-bw, bw + 1, (n, d_max)), 0, n - 1)
    mask = (rng.random((n, d_max)) < 0.85).astype(np.float32)
    state = rng.normal(size=(n, feat)).astype(np.float32)
    state[rng.random(n) < 0.3] = 0.0                       # dry rows
    s_tab = rng.normal(size=(n, d_max * feat)).astype(np.float32)
    # flux of masked slots is zeroed upstream (_edge_flux_slots)
    s_tab *= np.repeat(mask, feat, axis=1)
    return (src, mask, jnp.asarray(state, dtype),
            jnp.asarray(s_tab, dtype))


def _abs_indices(plan, n):
    rel = np.asarray(plan.idx_rel)
    win_rep = np.repeat(np.asarray(plan.win), TILE, axis=0)
    ws = np.asarray(plan.ws)[None, :]
    band = rel + win_rep
    return np.where(rel < ws, band, rel - ws + (n - plan.we))


def test_plan_band_covers_all_slots():
    src, mask, _, _ = _banded_problem()
    plan = plan_band(src, mask, 512)
    assert plan is not None and plan.we == 0
    assert all(w <= 256 for w in plan.ws)
    own = np.arange(512)[:, None]
    expect = np.where(mask > 0, src, own)
    np.testing.assert_array_equal(_abs_indices(plan, 512), expect)
    assert np.asarray(plan.idx_rel).min() >= 0
    assert (np.asarray(plan.idx_rel)
            < np.asarray(plan.ws)[None, :] + plan.we).all()


def test_plan_band_ghost_tail_window():
    """Boundary cells anywhere in the mesh read ghost sources at the block
    end; the shared tail window covers them without widening the band."""
    n, d = 1024, 4
    src = np.clip(np.arange(n)[:, None] + np.array([[-1, 1, -2, 2]]), 0, n - 1)
    mask = np.ones((n, d), np.float32)
    # every 64th node's last slot reads a "ghost" in the final 128 rows
    ghost_rows = np.arange(0, n, 64)
    src[ghost_rows, 3] = n - 16
    plan = plan_band(src, mask, n)
    assert plan is not None and plan.we == TILE
    assert all(w <= 256 for w in plan.ws)
    own = np.arange(n)[:, None]
    np.testing.assert_array_equal(_abs_indices(plan, n),
                                  np.where(mask > 0, src, own))


def test_plan_band_per_slot_windows():
    """Slots with different neighbourhood directions get individual widths
    (the point of per-slot windows: half the one-hot area on real meshes)."""
    n = 1024
    nx = 100
    src = np.clip(np.arange(n)[:, None]
                  + np.array([[-nx, -1, 1, nx]]), 0, n - 1)
    mask = np.ones((n, 4), np.float32)
    plan = plan_band(src, mask, n)
    assert plan is not None
    # +-1 slots need only ~TILE-wide windows; +-nx slots ~TILE+2nx
    assert plan.ws[1] < plan.ws[0] and plan.ws[2] < plan.ws[3]
    own = np.arange(n)[:, None]
    np.testing.assert_array_equal(_abs_indices(plan, n), src)


def test_plan_band_rejects_unbanded():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 4096, (4096, 4))                 # random = full span
    mask = np.ones((4096, 4), np.float32)
    assert plan_band(src, mask, 4096, max_w=1024) is None
    # non-128-multiple block
    assert plan_band(src[:100], mask[:100], 100) is None


def test_plan_band_masked_slots_point_home():
    """Masked slots alias edge 0 (a far-away node); the plan must ignore them
    or the band would explode to the full block."""
    n, d = 512, 4
    src = np.clip(np.arange(n)[:, None] + np.array([[-1, 1, -2, 2]]), 0, n - 1)
    mask = np.ones((n, d), np.float32)
    src[:, 3] = 0                                          # alias to node 0
    mask[:, 3] = 0.0
    plan = plan_band(src, mask, n)
    assert plan is not None and max(plan.ws) <= 256


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("with_gradient,upwind",
                         [(True, False), (True, True), (False, False)])
def test_band_hop_matches_reference(dtype, with_gradient, upwind):
    src, mask, state, s_tab = _banded_problem(dtype=dtype)
    plan = plan_band(src, mask, 512)
    got = band_hop(state, s_tab, plan.idx_rel, plan.win, ws=plan.ws,
                   with_gradient=with_gradient, upwind=upwind, interpret=True)
    want = band_hop_reference(state, s_tab, plan.idx_rel, plan.win, ws=plan.ws,
                              with_gradient=with_gradient, upwind=upwind)
    assert got.dtype == state.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-6, atol=2e-6)


def test_band_hop_reference_equals_slot_gather():
    """The emulation itself implements the documented hop semantics."""
    src, mask, state, s_tab = _banded_problem(feat=16)
    plan = plan_band(src, mask, 512)
    got = band_hop_reference(state, s_tab, plan.idx_rel, plan.win, ws=plan.ws)
    feat = 16
    dst_act = (np.asarray(state).sum(1, keepdims=True) != 0)
    acc = np.zeros((512, feat), np.float32)
    own = np.arange(512)
    s_np, st = np.asarray(s_tab), np.asarray(state)
    for d in range(4):
        idx = np.where(mask[:, d] > 0, src[:, d], own)
        nb = st[idx]
        act = (nb.sum(1, keepdims=True) != 0) | dst_act
        acc += np.where(act, (st - nb) * s_np[:, d * feat:(d + 1) * feat], 0.0)
    np.testing.assert_allclose(np.asarray(got), acc, rtol=2e-6, atol=2e-6)


def _tiny_sample(nx=24, ny=24, num_scales=2, previous_t=2):
    from mswe_gnn_tpu.data.dataset import (SimulationRecord,
                                           fit_dataset_scalers, make_spec,
                                           process_record, to_temporal_samples)
    from mswe_gnn_tpu.data.simulate import random_dem_fn
    from mswe_gnn_tpu.data.synthetic import make_multiscale_grid

    rng = np.random.default_rng(0)
    dem_fn = random_dem_fn(rng, extent=nx * 100.0, relief=2.0)
    mesh = make_multiscale_grid(nx, ny, 100.0, num_scales, dem_fn, n_bc=2)
    n, T = mesh.num_nodes, 8
    rec = SimulationRecord(
        mesh=mesh,
        wd=np.abs(rng.normal(0.3, 0.2, (n, T))).astype(np.float32),
        vx=rng.normal(0, 0.2, (n, T)).astype(np.float32),
        vy=rng.normal(0, 0.2, (n, T)).astype(np.float32),
        bc_per_length=np.abs(rng.normal(0.2, 0.1, (len(mesh.ghosts.ghost_nodes), T))).astype(np.float32),
        temporal_res=120.0)
    scalers = fit_dataset_scalers([rec], {"area_scaler": "standard",
                                          "edge_length_scaler": "standard"})
    proc = process_record(rec, scalers)
    spec = make_spec(mesh, len(mesh.ghosts.ghost_nodes), pad_multiple=TILE)
    return to_temporal_samples(proc, spec, previous_t=previous_t,
                               rollout_steps=2)[0], num_scales, previous_t


def test_msgnn_band_plan_end_to_end():
    """apply_msgnn with an attached band plan equals the XLA slot path."""
    from mswe_gnn_tpu.models import build_model

    sample, num_scales, previous_t = _tiny_sample()
    cfg, params, apply_fn = build_model(
        {"model_type": "MSGNN", "hid_features": 16, "K": 3, "mlp_layers": 2,
         "learned_residuals": True, "with_WL": True},
        num_node_features=sample.x_static.shape[1] + sample.x_dynamic.shape[1],
        num_edge_features=sample.edge_attr.shape[1], num_scales=num_scales,
        previous_t=previous_t)
    banded = attach_band_plan(sample, min_nodes=TILE)
    assert banded.band_meta is not None
    assert banded.band_meta[0] is not None, "finest grid scale must be banded"
    want = jax.jit(apply_fn, static_argnums=1)(params, cfg, sample)
    got = jax.jit(apply_fn, static_argnums=1)(params, cfg, banded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    assert not np.allclose(np.asarray(got), 0.0)


def test_band_plan_survives_rollout():
    """The plan rides the FloodGraph pytree through jit + scan."""
    from mswe_gnn_tpu.models import build_model
    from mswe_gnn_tpu.training.rollout import rollout

    sample, num_scales, previous_t = _tiny_sample()
    cfg, params, apply_fn = build_model(
        {"model_type": "MSGNN", "hid_features": 16, "K": 2, "mlp_layers": 2},
        num_node_features=sample.x_static.shape[1] + sample.x_dynamic.shape[1],
        num_edge_features=sample.edge_attr.shape[1], num_scales=num_scales,
        previous_t=previous_t)
    banded = attach_band_plan(sample, min_nodes=TILE)
    roll = jax.jit(lambda p, g: rollout(apply_fn, p, cfg, g, steps=3))
    want = roll(params, sample)
    got = roll(params, banded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_gradient,upwind,we_tail",
                         [(True, False, False), (True, True, False),
                          (False, False, False), (True, False, True)])
def test_band_hop_grad_matches_reference(with_gradient, upwind, we_tail):
    """Custom VJP (pallas backward, interpret mode on CPU) vs jax.vjp of the
    pure-jnp emulation: grads wrt state and the flux table must agree."""
    if we_tail:
        n, d = 1024, 4
        src = np.clip(np.arange(n)[:, None] + np.array([[-1, 1, -2, 2]]),
                      0, n - 1)
        rng = np.random.default_rng(3)
        ghost_rows = rng.integers(0, n - TILE, 40)
        src[ghost_rows, 0] = rng.integers(n - 8, n, 40)     # tail sources
        mask = np.ones((n, d), np.float32)
        state = rng.normal(size=(n, 16)).astype(np.float32)
        s_tab = (rng.normal(size=(n, d * 16)).astype(np.float32)
                 * np.repeat(mask, 16, axis=1))
        state_j, s_j = jnp.asarray(state), jnp.asarray(s_tab)
        plan = plan_band(src, mask, n)
        assert plan is not None and plan.we > 0
    else:
        src, mask, state_j, s_j = _banded_problem()
        plan = plan_band(src, mask, 512)

    def f_kernel(st, s):
        return band_hop(st, s, plan.idx_rel, plan.win, ws=plan.ws,
                        we=plan.we, with_gradient=with_gradient,
                        upwind=upwind).astype(jnp.float32).sum()

    def f_ref(st, s):
        return band_hop_reference(st, s, plan.idx_rel, plan.win, ws=plan.ws,
                                  we=plan.we, with_gradient=with_gradient,
                                  upwind=upwind).astype(jnp.float32).sum()

    g_st, g_s = jax.grad(f_kernel, argnums=(0, 1))(state_j, s_j)
    w_st, w_s = jax.grad(f_ref, argnums=(0, 1))(state_j, s_j)
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(w_st),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(w_s),
                               rtol=1e-5, atol=1e-5)


def test_band_plan_trains_end_to_end():
    """A train step on a band-planned graph runs (custom VJP) and moves the
    params the same way as the XLA slot path."""
    from mswe_gnn_tpu.models import build_model

    sample, num_scales, previous_t = _tiny_sample()
    cfg, params, apply_fn = build_model(
        {"model_type": "MSGNN", "hid_features": 16, "K": 2, "mlp_layers": 2,
         "with_WL": True},
        num_node_features=sample.x_static.shape[1] + sample.x_dynamic.shape[1],
        num_edge_features=sample.edge_attr.shape[1], num_scales=num_scales,
        previous_t=previous_t)
    banded = attach_band_plan(sample, min_nodes=TILE)
    assert banded.band_meta is not None

    def loss(p, g):
        return (jax.jit(apply_fn, static_argnums=1)(p, cfg, g)
                .astype(jnp.float32) ** 2).mean()

    from jax.flatten_util import ravel_pytree

    g_band = jax.grad(loss)(params, banded)
    g_ref = jax.grad(loss)(params, sample)
    flat_b, _ = ravel_pytree(g_band)
    flat_r, _ = ravel_pytree(g_ref)
    np.testing.assert_allclose(np.asarray(flat_b), np.asarray(flat_r),
                               rtol=5e-4, atol=5e-5)
    assert float(jnp.abs(flat_b).max()) > 0.0
