"""End-to-end synthetic dataset generation (mesh + simulation + record).

The equivalent of the reference's offline pipeline "random polygon -> mesh ->
Perlin DEM -> hydrograph -> D-HYDRO -> NetCDF -> PyG Data"
(reference database/dhydro_utils.py:286-397, graph_creation.py:1483-1623),
self-contained: regular multiscale grid meshes, random cosine-mode terrain,
Weibull hydrographs, and the diffusive-wave solver from data/simulate.py.
"""
from __future__ import annotations

from typing import List

import numpy as np

from mswe_gnn_tpu.data.dataset import SimulationRecord, pool_to_scales
from mswe_gnn_tpu.data.meshing import (
    Mesh, MultiscaleMesh, add_ghost_cells, grid_mesh, stack_meshes,
)
from mswe_gnn_tpu.data.simulate import (
    random_dem_fn, random_hydrograph, run_diffusive_wave,
)

# Bump when generated records change meaning (main._generate_cached keys its
# disk cache on this, so stale caches can't silently poison new runs).
# v2: BC/forcing series are zero-order-hold aligned — column t holds the
# forcing of the interval (t, t+1] (see generate_simulation_record).
GENERATOR_VERSION = 2


def make_multiscale_grid(nx: int, ny: int, dx: float, num_scales: int,
                         dem_fn, n_bc: int = 2, type_bc: int = 2
                         ) -> MultiscaleMesh:
    """L-level grid hierarchy with ghost cells on the finest scale.

    BC faces sit on the left boundary mid-height (a breach inflow, like the
    reference's random boundary location, dhydro_utils.py:134-150).
    """
    meshes: List[Mesh] = []
    base = grid_mesh(nx, ny, dx, dem_fn)
    # BC faces: contiguous run on the left edge (i = 0), centered in y
    j0 = ny // 2 - n_bc // 2
    bc_faces = np.asarray([0 * ny + (j0 + k) for k in range(n_bc)], dtype=np.int64)
    finest, ghosts = add_ghost_cells(base, bc_faces, type_bc=type_bc)
    meshes.append(finest)
    for s in range(1, num_scales):
        f = 2 ** s
        meshes.append(grid_mesh(max(nx // f, 1), max(ny // f, 1), dx * f, dem_fn))
    return stack_meshes(meshes, ghosts=ghosts)


def make_multiscale_tri(rng: np.random.Generator, dem_fn, num_scales: int,
                        avg_radius: float, target_edge: float,
                        n_bc: int = 2, type_bc: int = 2,
                        with_dike: bool = False) -> MultiscaleMesh:
    """Random-polygon triangulated hierarchy with ghost cells
    (the reference's MeshKernel path, graph_creation.py:473-528)."""
    from mswe_gnn_tpu.data.triangulate import triangulated_hierarchy

    meshes = triangulated_hierarchy(rng, dem_fn, num_scales=num_scales,
                                    avg_radius=avg_radius,
                                    target_edge=target_edge,
                                    with_dike=with_dike)
    base = meshes[0]
    # BC faces: boundary cells nearest a random boundary location
    # (reference dhydro_utils.py:134-150)
    bfaces = base.boundary_faces
    anchor = bfaces[int(rng.integers(0, len(bfaces)))]
    d = np.linalg.norm(base.face_xy[bfaces] - base.face_xy[anchor], axis=1)
    bc_faces = np.sort(bfaces[np.argsort(d)[:n_bc]]).astype(np.int64)
    finest, ghosts = add_ghost_cells(base, bc_faces, type_bc=type_bc)
    return stack_meshes([finest] + meshes[1:], ghosts=ghosts)


def _strip_ghosts(mesh_with_ghosts: Mesh, n_ghost: int) -> Mesh:
    """Physical sub-mesh: drop the trailing ghost cells and their edges."""
    n_phys = mesh_with_ghosts.num_faces - n_ghost
    keep = ((mesh_with_ghosts.dual_edge_index[0] < n_phys)
            & (mesh_with_ghosts.dual_edge_index[1] < n_phys))
    return Mesh(
        face_xy=mesh_with_ghosts.face_xy[:n_phys],
        area=mesh_with_ghosts.area[:n_phys],
        dem=mesh_with_ghosts.dem[:n_phys],
        dual_edge_index=mesh_with_ghosts.dual_edge_index[:, keep],
        face_distance=mesh_with_ghosts.face_distance[keep],
        face_relative_distance=mesh_with_ghosts.face_relative_distance[keep],
        edge_slope=mesh_with_ghosts.edge_slope[keep],
        shared_length=mesh_with_ghosts.shared_length[keep],
        boundary_faces=mesh_with_ghosts.boundary_faces)


def generate_simulation_record(
    seed: int,
    nx: int = 32,
    ny: int = 32,
    dx: float = 100.0,
    num_scales: int = 3,
    total_hours: float = 48.0,
    temporal_res: float = 60.0,
    n_bc: int = 2,
    peak_discharge: float = 150.0,
    substeps: int = 20,
    mesh_type: str = "grid",
    storm: bool = False,
    storm_wind_scale: float = 2.0,
    storm_pressure_scale: float = 1500.0,
) -> SimulationRecord:
    """One full synthetic simulation on a multiscale mesh.

    ``mesh_type``: 'grid' (regular quad cells) or 'triangulated' (random
    irregular polygon + Delaunay hierarchy).

    ``storm=True`` generates a translating cyclone (wind stress + pressure
    anomaly) that DRIVES the solver — wind setup and inverse barometer — and
    records the fields on ``SimulationRecord.forcing`` so the model can learn
    the forcing response (reference's storm-surge extension,
    utils/adforce_dataset.py). Defaults are storm-magnitude: ~2 N/m^2 peak
    stress (~30 m/s wind) and 15 hPa pressure low.
    """
    import time as _time

    rng = np.random.default_rng(seed)
    dem_fn = random_dem_fn(rng, extent=nx * dx, relief=4.0)
    if mesh_type == "grid":
        mesh = make_multiscale_grid(nx, ny, dx, num_scales, dem_fn, n_bc=n_bc)
    elif mesh_type == "triangulated":
        mesh = make_multiscale_tri(rng, dem_fn, num_scales,
                                   avg_radius=nx * dx / 2.0, target_edge=dx,
                                   n_bc=n_bc)
    else:
        raise ValueError(f"unknown mesh_type {mesh_type!r}")
    ghosts = mesh.ghosts
    finest = mesh.meshes[0]

    hydro = random_hydrograph(rng, total_hours=total_hours,
                              dt_minutes=temporal_res,
                              peak_discharge=peak_discharge)
    # simulate on the physical (non-ghost) cells of the finest mesh
    phys = _strip_ghosts(finest, len(ghosts.ghost_nodes))
    fields = None
    if storm:
        fields = make_storm_fields(phys.face_xy, len(hydro), rng,
                                   wind_scale=storm_wind_scale,
                                   pressure_scale=storm_pressure_scale)
    t0 = _time.time()
    sim = run_diffusive_wave(
        phys, ghosts.bc_faces, hydro,
        dt_minutes=temporal_res, substeps=substeps,
        wind=fields[:, :2] if fields is not None else None,
        pressure=fields[:, 2] if fields is not None else None)
    solver_seconds = _time.time() - t0

    # ghost rows mirror their BC face (reference graph_creation.py:1466-1481)
    def with_ghosts(a):
        return np.concatenate([a, a[ghosts.bc_faces]], axis=0)

    wd0 = with_ghosts(sim.wd)
    vx0 = with_ghosts(sim.vx)
    vy0 = with_ghosts(sim.vy)

    wd = pool_to_scales(wd0, mesh)
    vx = pool_to_scales(vx0, mesh)
    vy = pool_to_scales(vy0, mesh)

    # Zero-order-hold alignment: our solver stores wd[:, t] = state at the
    # END of interval t, driven by the piecewise-constant inflow hydro[t].
    # The rollout injects the BC series sampled at the LAST INPUT frame's
    # timestamp (reference utils/dataset.py:456, 486-497) — so column t of the
    # recorded series must hold the inflow of the interval (t, t+1] being
    # predicted, i.e. hydro[t+1]. Without this shift the model receives the
    # PREVIOUS interval's inflow (one step stale) and structurally cannot
    # predict the first wet frame (measured: CSI(step 0) = 0, and a lagging
    # wet front throughout). The reference's D-HYDRO data doesn't need this
    # because its BC series is instantaneous samples of a smooth hydrograph.
    # Per-ghost inflow per unit BC-edge length (reference utils/dataset.py:275).
    hydro_zoh = np.concatenate([hydro[1:], hydro[-1:]])
    per_ghost = hydro_zoh[None, :] / max(len(ghosts.ghost_nodes), 1)
    bc_per_length = per_ghost / ghosts.edge_bc_length[:, None]

    forcing, forcing_names = None, ()
    if storm:
        # same zero-order-hold shift: fields[:, :, t] drives interval t, and
        # with_step_forcing feeds the column at the last input frame's time
        f0 = with_ghosts(np.concatenate([fields[:, :, 1:], fields[:, :, -1:]],
                                        axis=2))       # [N0, 3, T]
        forcing = np.stack([pool_to_scales(f0[:, f], mesh) for f in range(3)],
                           axis=1).astype(np.float32)
        forcing_names = ("WX", "WY", "P")

    return SimulationRecord(mesh=mesh, wd=wd, vx=vx, vy=vy,
                            bc_per_length=bc_per_length,
                            temporal_res=temporal_res,
                            solver_seconds=solver_seconds,
                            forcing=forcing, forcing_names=forcing_names)


def generate_dataset(n_sims: int, seed: int = 0, **kwargs) -> List[SimulationRecord]:
    return [generate_simulation_record(seed + i, **kwargs) for i in range(n_sims)]


def make_storm_fields(xy: np.ndarray, T: int, rng: np.random.Generator,
                      wind_scale: float = 0.5,
                      pressure_scale: float = 500.0) -> np.ndarray:
    """Translating smooth cyclone -> [N, 3, T] (WX, WY wind stress [N/m^2],
    P pressure anomaly [Pa]) at the points ``xy`` — the exogenous fields of
    the reference's storm-surge extension
    (reference utils/adforce_dataset.py:80, 243-260).

    Spatially coherent (Gaussian envelope around a moving center, cyclonic
    tangential wind) and temporally smooth (straight-line track across the
    domain over the simulation).
    """
    lo, hi = xy.min(axis=0), xy.max(axis=0)
    extent = float(np.max(hi - lo))
    p0 = lo + rng.uniform(0.1, 0.4, 2) * (hi - lo)
    p1 = lo + rng.uniform(0.6, 0.9, 2) * (hi - lo)
    radius = extent * rng.uniform(0.2, 0.35)
    fields = np.zeros((xy.shape[0], 3, T), np.float32)
    for t in range(T):
        c = p0 + (p1 - p0) * (t / max(T - 1, 1))
        d = xy - c[None, :]
        r2 = (d ** 2).sum(axis=1)
        envelope = np.exp(-r2 / (2 * radius ** 2))
        # cyclonic rotation: wind tangential to the radius vector
        fields[:, 0, t] = wind_scale * envelope * (-d[:, 1] / radius)
        fields[:, 1, t] = wind_scale * envelope * (d[:, 0] / radius)
        fields[:, 2, t] = -pressure_scale * envelope
    return fields


def add_storm_forcing(rec: SimulationRecord, seed: int = 0,
                      wind_scale: float = 0.5,
                      pressure_scale: float = 500.0) -> SimulationRecord:
    """Attach synthetic storm forcing fields to an existing record (input
    features only — the recorded water dynamics are unchanged). For storms
    that actually DRIVE the solver, use
    ``generate_simulation_record(storm=True)``."""
    import dataclasses

    rng = np.random.default_rng(seed)
    mesh = rec.mesh
    xy = mesh.meshes[0].face_xy  # [N0, 2] incl. ghost rows (mirrored BC faces)
    fields = make_storm_fields(xy, rec.wd.shape[1], rng,
                               wind_scale=wind_scale,
                               pressure_scale=pressure_scale)
    pooled = np.stack([pool_to_scales(fields[:, f], mesh)
                       for f in range(3)], axis=1).astype(np.float32)
    return dataclasses.replace(rec, forcing=pooled,
                               forcing_names=("WX", "WY", "P"))
