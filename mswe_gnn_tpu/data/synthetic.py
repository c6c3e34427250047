"""End-to-end synthetic dataset generation (mesh + simulation + record).

The equivalent of the reference's offline pipeline "random polygon -> mesh ->
Perlin DEM -> hydrograph -> D-HYDRO -> NetCDF -> PyG Data"
(reference database/dhydro_utils.py:286-397, graph_creation.py:1483-1623),
self-contained: regular multiscale grid meshes, random cosine-mode terrain,
Weibull hydrographs, and the diffusive-wave solver from data/simulate.py.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from mswe_gnn_tpu.data.dataset import SimulationRecord, pool_to_scales
from mswe_gnn_tpu.data.meshing import (
    GhostCells, Mesh, MultiscaleMesh, add_ghost_cells, grid_mesh, stack_meshes,
)
from mswe_gnn_tpu.data.simulate import (
    random_dem_fn, random_hydrograph, run_diffusive_wave,
)


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
) -> SimulationRecord:
    """One full synthetic simulation on a multiscale mesh."""
    rng = np.random.default_rng(seed)
    dem_fn = random_dem_fn(rng, extent=nx * dx, relief=4.0)
    mesh = make_multiscale_grid(nx, ny, dx, num_scales, dem_fn, n_bc=n_bc)
    ghosts = mesh.ghosts
    finest = mesh.meshes[0]

    hydro = random_hydrograph(rng, total_hours=total_hours,
                              dt_minutes=temporal_res,
                              peak_discharge=peak_discharge)
    # simulate on the physical (non-ghost) cells of the finest mesh
    n_phys = finest.num_faces - len(ghosts.ghost_nodes)
    phys = grid_mesh(nx, ny, dx, dem_fn)
    sim = run_diffusive_wave(phys, ghosts.bc_faces, hydro,
                             dt_minutes=temporal_res, substeps=substeps)

    # ghost rows mirror their BC face (reference graph_creation.py:1466-1481)
    def with_ghosts(a):
        return np.concatenate([a, a[ghosts.bc_faces]], axis=0)

    wd0 = with_ghosts(sim.wd)
    vx0 = with_ghosts(sim.vx)
    vy0 = with_ghosts(sim.vy)

    wd = pool_to_scales(wd0, mesh)
    vx = pool_to_scales(vx0, mesh)
    vy = pool_to_scales(vy0, mesh)

    # per-ghost inflow per unit BC-edge length (reference utils/dataset.py:275)
    per_ghost = hydro[None, :] / max(len(ghosts.ghost_nodes), 1)
    bc_per_length = per_ghost / ghosts.edge_bc_length[:, None]

    return SimulationRecord(mesh=mesh, wd=wd, vx=vx, vy=vy,
                            bc_per_length=bc_per_length,
                            temporal_res=temporal_res)


def generate_dataset(n_sims: int, seed: int = 0, **kwargs) -> List[SimulationRecord]:
    return [generate_simulation_record(seed + i, **kwargs) for i in range(n_sims)]
