"""Raw map-NetCDF ingestion: write a synthetic grid simulation as a D-HYDRO
style ``mesh2d_*`` file, ingest it back, and check mesh topology, dynamics,
BC bookkeeping, and solver timings (VERDICT r1 item 5; reference
database/graph_creation.py:650-702, 1483-1582, utils/miscellaneous.py:70-108).
"""
import numpy as np
import pytest

from mswe_gnn_tpu.data.netcdf import (
    mesh_from_map_netcdf, numerical_times, record_from_map_netcdf,
    write_grid_map_netcdf,
)
from mswe_gnn_tpu.data.simulate import random_dem_fn, random_hydrograph, \
    run_diffusive_wave
from mswe_gnn_tpu.data.meshing import grid_mesh


def _grid_sim(nx=8, ny=8, dx=100.0, hours=6, seed=0):
    rng = np.random.default_rng(seed)
    dem_fn = random_dem_fn(rng, extent=nx * dx, relief=2.0)
    mesh = grid_mesh(nx, ny, dx, dem_fn)
    hydro = random_hydrograph(rng, total_hours=hours, dt_minutes=60.0)
    bc_faces = np.asarray([ny // 2, ny // 2 + 1], np.int64)  # i = 0 column
    sim = run_diffusive_wave(mesh, bc_faces, hydro, dt_minutes=60.0,
                             substeps=8)
    return mesh, hydro, bc_faces, sim


def test_map_netcdf_round_trip(tmp_path):
    mesh, hydro, bc_faces, sim = _grid_sim()
    path = str(tmp_path / "output_0_map.nc")
    write_grid_map_netcdf(path, 8, 8, 100.0, sim.wd, sim.vx, sim.vy,
                          bc_faces, dem=mesh.dem)

    got, got_bc, got_len = mesh_from_map_netcdf(path)
    assert got.num_faces == mesh.num_faces
    np.testing.assert_allclose(got.face_xy, mesh.face_xy, atol=1e-9)
    np.testing.assert_allclose(got.area, mesh.area, rtol=1e-9)
    np.testing.assert_allclose(got.dem, mesh.dem, rtol=1e-6)
    assert sorted(got_bc.tolist()) == sorted(bc_faces.tolist())
    np.testing.assert_allclose(got_len, 100.0)
    # dual graphs equal as edge sets
    want = set(map(tuple, np.asarray(mesh.dual_edge_index).T.tolist()))
    have = set(map(tuple, np.asarray(got.dual_edge_index).T.tolist()))
    assert want == have

    rec = record_from_map_netcdf(path, hydro, temporal_res=60.0,
                                 solver_seconds=12.5)
    n_phys = mesh.num_faces
    np.testing.assert_allclose(rec.wd[:n_phys], sim.wd, rtol=1e-6)
    np.testing.assert_allclose(rec.vx[:n_phys], sim.vx, rtol=1e-6, atol=1e-9)
    assert rec.solver_seconds == 12.5
    # ghost rows mirror their BC faces
    np.testing.assert_allclose(rec.wd[n_phys:], sim.wd[bc_faces], rtol=1e-6)
    # BC series: total inflow / n_ghost / wall length
    np.testing.assert_allclose(
        rec.bc_per_length, np.tile(hydro / 2 / 100.0, (2, 1)), rtol=1e-9)


def test_map_netcdf_multiscale_ingestion(tmp_path):
    """num_scales > 1 re-meshes coarser scales from the boundary polygon via
    the native CDT engine and pools the dynamics by containment."""
    mesh, hydro, bc_faces, sim = _grid_sim(nx=12, ny=12)
    path = str(tmp_path / "output_1_map.nc")
    write_grid_map_netcdf(path, 12, 12, 100.0, sim.wd, sim.vx, sim.vy,
                          bc_faces, dem=mesh.dem)
    rec = record_from_map_netcdf(path, hydro, temporal_res=60.0, num_scales=3)
    ms = rec.mesh
    assert ms.num_scales == 3
    # coarser scales get progressively smaller
    counts = [m.num_faces for m in ms.meshes]
    assert counts[0] > counts[1] > counts[2] > 0
    # every coarse scale conserves the pooled wet signal's magnitude order
    n0 = counts[0]
    assert rec.wd.shape[0] == ms.num_nodes
    assert np.isfinite(rec.wd).all()
    # the record feeds the standard pipeline end to end
    from mswe_gnn_tpu.data.dataset import (
        fit_dataset_scalers, make_spec, process_record, to_temporal_samples)

    scalers = fit_dataset_scalers([rec], {"area_scaler": "standard",
                                          "edge_length_scaler": "standard"})
    proc = process_record(rec, scalers)
    spec = make_spec(ms, len(ms.ghosts.ghost_nodes), pad_multiple=8)
    samples = to_temporal_samples(proc, spec, previous_t=2, rollout_steps=1)
    assert len(samples) >= 1
    assert samples[0].y is not None


def test_numerical_times_overview(tmp_path):
    p = tmp_path / "overview.csv"
    p.write_text("seed,mesh_num_faces,simulation_time[h],computation_time[s]\n"
                 "101,22880,96.0,427.638\n102,22880,96.0,608.3828\n")
    t = numerical_times(str(p), [101, 102])
    np.testing.assert_allclose(t, [427.638, 608.3828])
    # rescaled to a modelled horizon (reference misc.py:103-108)
    t48 = numerical_times(str(p), [102], model_hours=48.0)
    np.testing.assert_allclose(t48, [608.3828 * 0.5])


def test_load_map_folder_end_to_end(tmp_path):
    """Folder ingestion: output_<i>_map.nc + overview.csv -> records with
    solver timings; without hydrograph sidecars the BC series is
    reconstructed from stored volume changes; prepare_data consumes the
    folder via dataset_parameters.map_folder."""
    for i, seed in enumerate((0, 1, 2, 3)):
        mesh, hydro, bc_faces, sim = _grid_sim(seed=seed)
        write_grid_map_netcdf(str(tmp_path / f"output_{i}_map.nc"),
                              8, 8, 100.0, sim.wd, sim.vx, sim.vy,
                              bc_faces, dem=mesh.dem)
    (tmp_path / "overview.csv").write_text(
        "seed,mesh_num_faces,simulation_time[h],computation_time[s]\n"
        + "".join(f"{i},64,6.0,{10.0 + i}\n" for i in range(4)))

    from mswe_gnn_tpu.data.netcdf import load_map_folder

    recs = load_map_folder(str(tmp_path), temporal_res=60.0)
    assert len(recs) == 4
    assert [r.solver_seconds for r in recs] == [10.0, 11.0, 12.0, 13.0]
    # reconstructed inflow is close in cumulative volume to the true one
    mesh, hydro, bc_faces, sim = _grid_sim(seed=0)
    got = recs[0].bc_per_length.sum(0) * 100.0  # total inflow series
    assert got.sum() > 0

    cfg = {
        "dataset_parameters": {"temporal_res": 60.0, "val_prcnt": 0.34,
                               "map_folder": str(tmp_path), "seed": 0},
        "temporal_dataset_parameters": {"rollout_steps": 1, "previous_t": 2},
        "synthetic_data": {"num_scales": 1, "pad_multiple": 8},
        "scalers": {"area_scaler": "standard",
                    "edge_length_scaler": "standard"},
        "selected_node_features": {"area": True, "DEM": True},
        "selected_edge_features": {"edge_length": True},
    }
    from mswe_gnn_tpu import config as config_lib
    from mswe_gnn_tpu.main import prepare_data

    train, val, test, scalers, test_records = prepare_data(
        config_lib.with_defaults(cfg))
    assert len(train) >= 1 and len(val) >= 1 and len(test) >= 1
    assert test_records[0].solver_seconds == 13.0


def test_dem_file_interpolation_modes(tmp_path):
    """DEM from an x y z text file onto cell centers: nearest vs linear
    (reference Mesh._import_DEM + interpolate_variable,
    graph_creation.py:834-845, 1046-1070). On a planar DEM sampled densely,
    linear interpolation is exact at interior cell centers."""
    mesh, hydro, bc_faces, sim = _grid_sim()
    path = str(tmp_path / "output_0_map.nc")
    write_grid_map_netcdf(path, 8, 8, 100.0, sim.wd, sim.vx, sim.vy,
                          bc_faces, dem=mesh.dem)
    # dense planar point cloud covering the domain
    rng = np.random.default_rng(0)
    pts = rng.uniform(-50, 850, size=(800, 2))
    z = 1.5 + 0.002 * pts[:, 0] - 0.001 * pts[:, 1]
    dem_file = tmp_path / "dem.xyz"
    np.savetxt(dem_file, np.column_stack([pts, z]))

    got_lin, _, _ = mesh_from_map_netcdf(path, dem_file=str(dem_file),
                                         dem_interp="linear")
    want = 1.5 + 0.002 * got_lin.face_xy[:, 0] - 0.001 * got_lin.face_xy[:, 1]
    np.testing.assert_allclose(got_lin.dem, want, atol=1e-9)

    got_near, _, _ = mesh_from_map_netcdf(path, dem_file=str(dem_file),
                                          dem_interp="nearest")
    # nearest picks each center's closest sample exactly
    from scipy.spatial import cKDTree

    _, idx = cKDTree(pts).query(got_near.face_xy)
    np.testing.assert_allclose(got_near.dem, z[idx], atol=1e-12)
