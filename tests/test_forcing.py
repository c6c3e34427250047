"""Exogenous storm forcing (wind stress WX/WY + pressure P) — the TPU-native
equivalent of the reference's storm-surge extension
(reference utils/adforce_dataset.py:80, 243-260, new_main.py:1-107): per-node
time-varying forcing fields carried through scaling, temporal windowing, and
appended to the static features at each rollout step."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.data.dataset import (
    fit_dataset_scalers, make_spec, process_record, to_temporal_samples,
)
from mswe_gnn_tpu.data.io import load_records, save_records
from mswe_gnn_tpu.data.synthetic import add_storm_forcing, generate_simulation_record
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.training.rollout import rollout, with_step_forcing
from mswe_gnn_tpu.training.train import TrainerOptions, pushforward_loss

SCALERS = {"area_scaler": "standard", "edge_length_scaler": "standard",
           "forcing_scaler": "standard"}


def make_forced_samples(previous_t=2, rollout_steps=3):
    rec = generate_simulation_record(0, nx=10, ny=10, num_scales=2,
                                     total_hours=6, substeps=4)
    rec = add_storm_forcing(rec, seed=1)
    scalers = fit_dataset_scalers([rec], SCALERS)
    proc = process_record(rec, scalers)
    spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes), pad_multiple=8)
    samples = to_temporal_samples(proc, spec, previous_t=previous_t,
                                  rollout_steps=rollout_steps)
    return rec, proc, samples


def test_wind_setup_piles_water_downwind():
    """Uniform wind over a flat pond pushes water downwind (setup), without
    creating or destroying mass."""
    from mswe_gnn_tpu.data.meshing import grid_mesh
    from mswe_gnn_tpu.data.simulate import run_diffusive_wave

    mesh = grid_mesh(12, 12, 100.0, lambda x, y: np.zeros_like(x))
    F = mesh.num_faces
    T = 12
    hydro = np.zeros(T)          # no inflow: a still 1 m pond
    bc = np.asarray([0])
    h0 = np.ones(F)
    calm = run_diffusive_wave(mesh, bc, hydro, dt_minutes=60.0, substeps=20,
                              h0=h0)
    wind = np.zeros((F, 2, T), np.float32)
    wind[:, 0, :] = 2.0  # steady +x stress
    windy = run_diffusive_wave(mesh, bc, hydro, dt_minutes=60.0, substeps=20,
                               wind=wind, h0=h0)
    # mass identical (wind moves water, never adds it)
    vol_c = (calm.wd[:, -1] * mesh.area).sum()
    vol_w = (windy.wd[:, -1] * mesh.area).sum()
    np.testing.assert_allclose(vol_w, vol_c, rtol=1e-6)
    # downwind (+x) half ends deeper than upwind half only in the windy run
    x = mesh.face_xy[:, 0]
    lo, hi = x < np.median(x), x >= np.median(x)
    tilt_w = windy.wd[hi, -1].mean() - windy.wd[lo, -1].mean()
    tilt_c = calm.wd[hi, -1].mean() - calm.wd[lo, -1].mean()
    assert tilt_w > tilt_c + 1e-3, (tilt_w, tilt_c)


def test_inverse_barometer_draws_water_to_low_pressure():
    """A static low-pressure anomaly raises the local water level."""
    from mswe_gnn_tpu.data.meshing import grid_mesh
    from mswe_gnn_tpu.data.simulate import run_diffusive_wave

    mesh = grid_mesh(12, 12, 100.0, lambda x, y: np.zeros_like(x))
    F = mesh.num_faces
    T = 12
    hydro = np.zeros(T)          # still 1 m pond
    bc = np.asarray([0])
    h0 = np.ones(F)
    xy = mesh.face_xy
    c = xy.mean(axis=0)
    r2 = ((xy - c) ** 2).sum(axis=1)
    p = np.zeros((F, T), np.float32)
    low = -1500.0 * np.exp(-r2 / (2 * (300.0 ** 2)))
    p[:] = low[:, None]
    calm = run_diffusive_wave(mesh, bc, hydro, dt_minutes=60.0, substeps=20,
                              h0=h0)
    stormy = run_diffusive_wave(mesh, bc, hydro, dt_minutes=60.0, substeps=20,
                                pressure=p, h0=h0)
    center = r2 < (250.0 ** 2)
    bump = stormy.wd[center, -1].mean() - calm.wd[center, -1].mean()
    assert bump > 1e-3, bump  # water piles up under the low
    # mass unchanged
    np.testing.assert_allclose((stormy.wd[:, -1] * mesh.area).sum(),
                               (calm.wd[:, -1] * mesh.area).sum(), rtol=1e-6)


def test_generate_record_with_driving_storm():
    """storm=True attaches pooled forcing AND changes the simulated water."""
    calm = generate_simulation_record(5, nx=10, ny=10, num_scales=2,
                                      total_hours=6, substeps=6)
    stormy = generate_simulation_record(5, nx=10, ny=10, num_scales=2,
                                        total_hours=6, substeps=6, storm=True)
    assert calm.forcing is None and stormy.forcing is not None
    assert stormy.forcing.shape == (stormy.mesh.num_nodes, 3, stormy.wd.shape[1])
    assert stormy.forcing_names == ("WX", "WY", "P")
    # same mesh/hydrograph seed; the storm visibly changes the water field
    assert calm.wd.shape == stormy.wd.shape
    assert np.abs(calm.wd - stormy.wd).max() > 1e-3


def test_storm_forcing_fields_shape_and_pooling():
    rec = generate_simulation_record(0, nx=10, ny=10, num_scales=2,
                                     total_hours=6, substeps=4)
    forced = add_storm_forcing(rec, seed=1)
    T = rec.wd.shape[1]
    assert forced.forcing.shape == (rec.mesh.num_nodes, 3, T)
    assert forced.forcing_names == ("WX", "WY", "P")
    assert np.isfinite(forced.forcing).all()
    # coarse scales are pooled from the finest, so they carry signal too
    n0 = rec.mesh.node_ptr[1]
    assert np.abs(forced.forcing[n0:]).max() > 0
    # pressure anomaly is negative inside the vortex
    assert forced.forcing[:, 2].min() < 0


def test_forcing_io_roundtrip(tmp_path):
    rec = add_storm_forcing(generate_simulation_record(
        0, nx=8, ny=8, num_scales=2, total_hours=4, substeps=4), seed=2)
    path = str(tmp_path / "rec.h5")
    save_records(path, [rec, dataclasses.replace(rec, forcing=None,
                                                 forcing_names=())])
    back = load_records(path, seed=0)  # keep on-disk order
    np.testing.assert_allclose(back[0].forcing, rec.forcing, rtol=1e-6)
    assert back[0].forcing_names == ("WX", "WY", "P")
    assert back[1].forcing is None


def test_forcing_window_alignment():
    """Column t + previous_t - 1 of a sample's forcing window is the scaled
    field at absolute simulation time init + t (dry-bed padding = p-1 zero
    columns, same as the BC series)."""
    p = 2
    rec, proc, samples = make_forced_samples(previous_t=p, rollout_steps=3)
    # node padding is per scale; the finest scale's raw rows stay contiguous
    # at the front of the padded layout
    n0 = int(rec.mesh.node_ptr[1])
    for init in (0, 2):
        g = samples[init]
        assert g.forcing.shape[1:] == (3, p + 3)
        win = np.asarray(g.forcing)[:n0]
        # rollout step t reads window column t + p - 1 = padded column
        # init + t + p - 1; with p - 1 dry-bed zero columns prepended that is
        # unpadded simulation time init + t
        for t in range(3):
            np.testing.assert_allclose(win[:, :, t + p - 1],
                                       proc.forcing[:n0, :, init + t],
                                       rtol=1e-6, atol=1e-7)
        # dry-bed zeros fill columns before the first real input step
        if init == 0:
            assert np.abs(win[:, :, 0]).max() == 0
    # scaling was actually applied (standard scaler recenters)
    assert not np.allclose(proc.forcing, rec.forcing)


def test_with_step_forcing_appends_current_column():
    _, proc, samples = make_forced_samples()
    g = samples[1]
    s0 = g.x_static.shape[1]
    gt = with_step_forcing(g, jnp.asarray(1))
    assert gt.x_static.shape[1] == s0 + 3
    np.testing.assert_allclose(
        np.asarray(gt.x_static[:, s0:]),
        np.asarray(g.forcing[:, :, 1 + g.previous_t - 1]), rtol=1e-6)
    # without forcing: passthrough
    g_plain = g.replace(forcing=None)
    assert with_step_forcing(g_plain, jnp.asarray(1)) is g_plain


def test_forced_model_rollout_and_training_step():
    _, _, samples = make_forced_samples()
    g = samples[0]
    cfg = MSGNNConfig(
        num_node_features=(g.x_static.shape[1] + g.forcing.shape[1]
                           + g.x_dynamic.shape[1]),
        num_edge_features=g.edge_attr.shape[1], num_scales=2,
        hid_features=8, K=2, previous_t=g.previous_t,
        learned_residuals=True, with_WL=True)
    params = init_msgnn(jax.random.PRNGKey(0), cfg)

    preds = jax.jit(lambda p, gr: rollout(apply_msgnn, p, cfg, gr, 3))(params, g)
    assert preds.shape == (g.num_nodes, 2, 3)
    assert np.isfinite(np.asarray(preds)).all()

    # the forcing influences the prediction (same state, zeroed forcing)
    g0 = g.replace(forcing=jnp.zeros_like(g.forcing))
    preds0 = jax.jit(lambda p, gr: rollout(apply_msgnn, p, cfg, gr, 3))(params, g0)
    assert np.abs(np.asarray(preds) - np.asarray(preds0)).max() > 0

    # gradients flow through the forced pushforward loss
    opts = TrainerOptions()
    loss, grads = jax.value_and_grad(
        lambda p: pushforward_loss(apply_msgnn, p, cfg, g, 3, opts, True))(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
