"""Experiment driver: config -> data -> train -> evaluate -> report.

The counterpart of the reference entry points ``main.py`` (train + eval) and
``test_model.py`` (eval-only), reference main.py:22-197, test_model.py:19-121:

  python -m mswe_gnn_tpu.main train  --config configs/synthetic.yaml --out runs/x
  python -m mswe_gnn_tpu.main eval   --config ... --ckpt runs/x/best --out runs/x_eval

Data comes from the built-in synthetic generator (``synthetic_data`` config
group) or, when paths are given, reference-format pickles via
compat.torch_data (Zenodo datasets).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from mswe_gnn_tpu import config as config_lib
from mswe_gnn_tpu.data.dataset import (
    fit_dataset_scalers, make_spec, process_record, to_temporal_samples,
    union_spec,
)
from mswe_gnn_tpu.data.synthetic import generate_dataset
from mswe_gnn_tpu.graph import FloodGraph
from mswe_gnn_tpu.models import build_model
from mswe_gnn_tpu.models.registry import count_params
from mswe_gnn_tpu.training.checkpoint import (
    restore_params_only, save_checkpoint,
)
from mswe_gnn_tpu.training.rollout import rollout
from mswe_gnn_tpu.training.train import Trainer, TrainerOptions
from mswe_gnn_tpu.utils.analysis import SpatialAnalysis
from mswe_gnn_tpu.utils.logging import MetricLogger


def _generate_cached(sd: Dict, temporal_res: float):
    """Synthetic records with a content-keyed HDF5 disk cache, so resumed
    runs and parameter sweeps skip regeneration (cache dir overridable via
    MSWE_DATA_CACHE; delete the dir to invalidate)."""
    import hashlib

    from mswe_gnn_tpu.data.io import load_records, save_records

    from mswe_gnn_tpu.data.synthetic import GENERATOR_VERSION

    key_src = json.dumps({**sd, "temporal_res": temporal_res,
                          "gen_version": GENERATOR_VERSION}, sort_keys=True)
    cache_dir = os.environ.get("MSWE_DATA_CACHE", "runs/data_cache")
    path = os.path.join(cache_dir,
                        hashlib.sha256(key_src.encode()).hexdigest()[:16] + ".h5")
    if os.path.exists(path):
        return load_records(path, seed=0)  # keep generation order (caller splits)
    # Multi-host: every process may reach here concurrently (generation is
    # deterministic, so any writer's output is valid). Each writes its OWN
    # temp file — two h5py handles on a shared temp name deadlock on the
    # HDF5 file lock under load (reproduced in tests/test_multihost_main.py)
    # — and the atomic os.replace makes the last finisher win harmlessly.
    records = generate_dataset(
        sd["n_sims"], seed=sd.get("seed", 0), nx=sd["nx"], ny=sd["ny"],
        dx=sd.get("dx", 100.0), num_scales=sd["num_scales"],
        total_hours=sd["total_hours"], temporal_res=temporal_res,
        n_bc=sd.get("n_bc", 2), substeps=sd.get("substeps", 20),
        mesh_type=sd.get("mesh_type", "grid"),
        # inflow scale: triangulated domains need ~30 m^3/s to stay in the
        # reference's O(1-5 m) depth regime (see configs/finetune.yaml);
        # this key was previously in the cache key but silently unused
        peak_discharge=float(sd.get("peak_discharge", 150.0)),
        # solver-driving storm forcing (wind setup + inverse barometer);
        # fields land on record.forcing as model inputs. Part of the cache
        # key via sd. (Reference's storm-surge extension, utils/adforce_dataset.py)
        storm=bool(sd.get("storm_forcing", False)))
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        save_records(tmp, records)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return records


def _solver_label(cfg: Dict) -> str:
    """Which solver produced the test records' ``solver_seconds``: real
    D-HYDRO wall times ('dhydro' — speed-ups comparable with the reference's
    242-1223x, reference results/overview.csv) for map-NetCDF/pickle data,
    the built-in generator ('synthetic_solver' — NOT comparable) otherwise."""
    dp = cfg.get("dataset_parameters", {})
    return ("dhydro" if dp.get("map_folder") or dp.get("dataset_folder")
            else "synthetic_solver")


def _load_reference_split(dp: Dict):
    """Reference pickle datasets with the reference's exact split semantics
    (reference utils/dataset.py:292-331): train pickle from
    ``<dataset_folder>/train/<train_dataset_name>.pkl`` shuffled by ``seed``
    and truncated to ``train_size``; test pickle from ``.../test/`` with
    size 100, seed 0 (no shuffle); validation split off the train set."""
    from sklearn.model_selection import train_test_split

    from mswe_gnn_tpu.data.torch_compat import load_reference_pickle

    folder = dp["dataset_folder"]
    seed = dp.get("seed", 42)
    train_records = load_reference_pickle(
        os.path.join(folder, "train", dp["train_dataset_name"] + ".pkl"),
        size=dp.get("train_size", 100), seed=seed)
    test_records = load_reference_pickle(
        os.path.join(folder, "test",
                     dp.get("test_dataset_name", dp["train_dataset_name"])
                     + ".pkl"),
        size=100, seed=0)
    val_prcnt = dp.get("val_prcnt", 0.25)
    if val_prcnt:
        train_records, val_records = train_test_split(
            train_records, test_size=val_prcnt, random_state=seed)
    else:
        val_records = train_records
    return train_records, val_records, test_records


def prepare_data(cfg: Dict) -> Tuple[List[FloodGraph], List[FloodGraph],
                                     List[FloodGraph], Dict, object]:
    """Build train/val/test temporal datasets (reference main.py:26-56)."""
    sd = cfg["synthetic_data"]
    dp = cfg["dataset_parameters"]
    tdp = cfg["temporal_dataset_parameters"]
    rng = np.random.default_rng(dp.get("seed", 0))

    if dp.get("dataset_folder"):
        train_records, val_records, test_records = _load_reference_split(dp)
        records = train_records + val_records + test_records
    else:
        if dp.get("map_folder"):
            # raw D-HYDRO map-NetCDF folder (data/netcdf.py): solver outputs
            # + overview.csv timings, no pickles needed
            from mswe_gnn_tpu.data.netcdf import load_map_folder

            records = load_map_folder(
                dp["map_folder"], dp["temporal_res"],
                num_scales=sd.get("num_scales", 1),
                overview_file=dp.get("overview_file"),
                dem_folder=dp.get("dem_folder"),
                hydrograph_folder=dp.get("hydrograph_folder"),
                limit=dp.get("train_size"))
        else:
            records = _generate_cached(sd, dp["temporal_res"])

        n = len(records)
        n_test = max(1, int(round(n * 0.2)))
        test_records = records[-n_test:]
        pool = records[:-n_test]
        n_val = max(1, int(round(len(pool) * dp.get("val_prcnt", 0.25))))
        perm = rng.permutation(len(pool))
        val_records = [pool[i] for i in perm[:n_val]]
        train_records = [pool[i] for i in perm[n_val:]]

    scalers = fit_dataset_scalers(train_records, cfg["scalers"])
    feats = dict(node_features=cfg["selected_node_features"],
                 edge_features=cfg["selected_edge_features"],
                 slope_method=dp.get("slope_method", "edge"))
    spec = union_spec([
        make_spec(r.mesh, len(r.mesh.ghosts.ghost_nodes),
                  pad_multiple=sd.get("pad_multiple", 64))
        for r in records])

    def build(records_, rollout_steps, params=None):
        params = params if params is not None else tdp
        out = []
        for r in records_:
            proc = process_record(r, scalers, **feats)
            out += to_temporal_samples(
                proc, spec, previous_t=params["previous_t"],
                rollout_steps=rollout_steps,
                time_start=params.get("time_start", 0),
                time_stop=params.get("time_stop", -1))
        return out

    train = build(train_records, tdp["rollout_steps"])
    val = build(val_records, -1)     # full-rollout validation (reference train.py:157)
    # test windowing falls back to train params minus rollout_steps
    # (reference utils/dataset.py:547-557)
    test_params = dict(config_lib.temporal_test_parameters(cfg),
                       previous_t=tdp["previous_t"])
    test = build(test_records, -1, params=test_params)
    return train, val, test, scalers, test_records


def build_experiment_model(cfg: Dict, sample: FloodGraph):
    tdp = cfg["temporal_dataset_parameters"]
    # num_scales from the data itself (reference main.py:60 takes it from
    # train_dataset[0].mesh.num_meshes) — works for synthetic AND pickle data
    n_forcing = sample.forcing.shape[1] if sample.forcing is not None else 0
    return build_model(
        cfg["models"],
        num_node_features=(sample.x_static.shape[1] + n_forcing
                           + sample.x_dynamic.shape[1]),
        num_edge_features=sample.edge_attr.shape[1],
        num_scales=sample.spec.num_scales,
        previous_t=tdp["previous_t"])


def trainer_options(cfg: Dict) -> TrainerOptions:
    to, lr = cfg["trainer_options"], cfg["lr_info"]
    return TrainerOptions(
        type_loss=to["type_loss"], only_where_water=to["only_where_water"],
        batch_size=to["batch_size"], conservation=to["conservation"],
        velocity_scaler=to["velocity_scaler"],
        curriculum_epoch=to["curriculum_epoch"], patience=to["patience"],
        max_epochs=to["max_epochs"],
        best_metric=to.get("best_metric", "val_CSI_005"),
        watch_every=int(to.get("watch_every", 0)),
        # rematerialize the pushforward forward (activation memory ~1/K at
        # ~30% step cost) — required on 16 GB chips when corpus padding x
        # batch x rollout depth outgrow HBM (observed: the triangulated
        # accuracy corpus OOMs at the 2->3 curriculum boundary without it)
        remat=bool(to.get("remat", False)),
        max_rollout_steps=cfg["temporal_dataset_parameters"]["rollout_steps"],
        learning_rate=lr["learning_rate"], weight_decay=lr["weight_decay"],
        gamma=lr["gamma"], step_size=lr["step_size"])


def evaluate(apply_fn, model_cfg, params, test: List[FloodGraph],
             opts: TrainerOptions, out_dir: Optional[str] = None,
             numerical_times: Optional[List[float]] = None,
             test_records=None, render: bool = True,
             solver_label: str = "solver",
             eval_batch_size: int = 1) -> Dict:
    """Timed full-rollout test evaluation + spatial analysis
    (reference main.py:138-166). With ``test_records`` (the SimulationRecords
    carrying the meshes) and ``render``, also writes the reference's rollout
    figure set for the best/worst simulations (reference main.py:171-181).

    ``eval_batch_size`` > 1 times concat-union batches at the measured
    per-chip throughput sweet spot (batch 2 on v5e — BENCH r4/r5 curves)
    and attributes elapsed/b to each simulation, so
    ``mean_prediction_time_s`` reflects the serving configuration
    (VERDICT r4 #9); per-graph predictions and metrics are identical
    (disconnected union)."""
    import jax

    from mswe_gnn_tpu.graph import concat_graphs

    rollouts, times = [], []
    steps = int(test[0].y.shape[-1])
    roll = jax.jit(lambda p, g: rollout(apply_fn, p, model_cfg, g, steps=steps))
    # warm-up compile on the first graph (excluded from timing)
    np.asarray(roll(params, test[0]))

    def split_union(pred, spec, b):
        """[N_tiled, 2, T] union prediction -> b per-graph [N, 2, T]."""
        base_counts = [c // b for c in spec.node_counts]
        ptr = np.asarray(spec.node_ptr)
        outs = []
        for g_ in range(b):
            parts = [pred[ptr[s] + g_ * base_counts[s]:
                          ptr[s] + (g_ + 1) * base_counts[s]]
                     for s in range(spec.num_scales)]
            outs.append(np.concatenate(parts, axis=0))
        return outs

    b = max(1, int(eval_batch_size))
    i = 0
    warmed = set()
    while i < len(test):
        chunk = test[i:i + b]
        if len(chunk) > 1:
            union = concat_graphs(chunk)
            if len(chunk) not in warmed:     # exclude this size's compile
                np.asarray(roll(params, union))
                warmed.add(len(chunk))
            t0 = time.time()
            pred = np.asarray(roll(params, union))
            dt = (time.time() - t0) / len(chunk)
            rollouts += split_union(pred, union.spec, len(chunk))
            times += [dt] * len(chunk)
        else:
            t0 = time.time()
            pred = np.asarray(roll(params, chunk[0]))
            times.append(time.time() - t0)
            rollouts.append(pred)
        i += len(chunk)

    analysis = SpatialAnalysis(rollouts, test, prediction_times=times,
                               numerical_times=numerical_times,
                               solver_label=solver_label)
    summary = analysis.summary()
    if out_dir:
        analysis.save_reports(out_dir)
        if render and test_records is not None:
            _render_rollout_reports(analysis, rollouts, test, test_records,
                                    out_dir)
    return summary


def _render_rollout_reports(analysis, rollouts, test, test_records,
                            out_dir: str) -> None:
    """Best/worst-simulation figure set (reference main.py:171-181 +
    PlotRollout panels, utils/visualization.py:515-1156): rollout frames,
    FAT, CSI/F1, Froude, mass-conservation panel; videos for the best one."""
    from mswe_gnn_tpu.utils.visualization import PlotRollout

    rank = analysis.ranking()
    cons = analysis.mass_conservation_series()
    for label in ("best", "worst"):
        i = rank[label]
        rec = test_records[i]
        g = test[i]
        pr = PlotRollout(rec.mesh, rollouts[i], np.asarray(g.y),
                         temporal_res=float(rec.temporal_res),
                         node_ptr=np.asarray(g.spec.node_ptr))
        t_wet = int(np.argmax(np.asarray(g.y)[:rec.mesh.meshes[0].num_faces,
                                              0].sum(0)))
        pr.frame(t_wet, out_path=os.path.join(out_dir, f"rollout_{label}.png"))
        pr.fat_comparison(out_path=os.path.join(out_dir, f"fat_{label}.png"))
        pr.csi_f1_panel(out_path=os.path.join(out_dir, f"csi_f1_{label}.png"))
        pr.froude_map(out_path=os.path.join(out_dir, f"froude_{label}.png"))
        pr.conservation_panel(
            cons[i], inflow_series=analysis.inflow_volume_series(i),
            out_path=os.path.join(out_dir, f"conservation_{label}.png"))
        if label == "best":
            pr.create_video(os.path.join(out_dir, "rollout_best.gif"))
            pr.create_multiscale_video(
                os.path.join(out_dir, "rollout_best_multiscale.gif"))


def _maybe_init_distributed(args) -> bool:
    """Multi-host launch (VERDICT r2 task 7): bring this process into a
    jax.distributed cluster BEFORE any backend touch.

    Three triggers:
      --dist-num-processes N --dist-process-id I [--dist-coordinator H:P]
          explicit fake-cluster / manual launch (the CPU 2-process test);
      MSWE_MULTIHOST=1
          auto-detected environment (TPU pods / SLURM — jax reads the
          cluster env itself, reference has no counterpart);
    otherwise single-process (the default).
    """
    import jax

    if getattr(args, "dist_num_processes", None):
        jax.distributed.initialize(
            coordinator_address=(args.dist_coordinator or "localhost:12355"),
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id or 0)
        return True
    if os.environ.get("MSWE_MULTIHOST") == "1":
        jax.distributed.initialize()
        return True
    return False


def run_training(cfg: Dict, out_dir: str,
                 epoch_budget: Optional[int] = None) -> Dict:
    import jax

    cfg = config_lib.with_defaults(cfg)
    # multi-host: every process builds the identical dataset and runs the
    # identical step sequence (deterministic seeds); only process 0 touches
    # the filesystem (logs, checkpoints, figures). Global batches are
    # assembled per process with make_array_from_process-local callbacks
    # (parallel/sharding.global_put).
    is_main = jax.process_index() == 0
    if jax.process_count() > 1:
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    logger = MetricLogger(out_dir, config=cfg) if is_main else None
    train, val, test, scalers, test_records = prepare_data(cfg)
    print(f"dataset: {len(train)} train / {len(val)} val / {len(test)} test samples")

    model_cfg, params, apply_fn = build_experiment_model(cfg, train[0])
    print(f"model: {cfg['models']['model_type']}, {count_params(params)} params")
    if cfg.get("saved_model"):
        params = restore_params_only(cfg["saved_model"], params)
        print(f"warm-started from {cfg['saved_model']}")

    opts = trainer_options(cfg)
    multiscale = cfg["models"]["model_type"] == "MSGNN"
    mesh = None
    # parallel: {mode: gspmd|ring_halo, data: N, graph: M}
    #   gspmd     — XLA-inserted collectives from named shardings (default)
    #   ring_halo — hand-scheduled boundary-row halo exchange per hop
    #               (parallel/dist_swegnn.py); large-single-mesh regime:
    #               every sample must share one mesh topology (the
    #               reference's dijkring fine-tune, config_finetune.yaml)
    par = cfg.get("parallel") or {}
    n_data, n_graph = int(par.get("data", 1)), int(par.get("graph", 1))
    mode = par.get("mode", "gspmd")
    if mode == "ring_halo" and n_graph > 1:
        from mswe_gnn_tpu.parallel.dist_train import (
            make_dist_apply_fn, prepare_ring_graphs)
        from mswe_gnn_tpu.parallel.sharding import make_mesh

        dist_apply = None
        if multiscale:
            train, _ = prepare_ring_graphs(train, n_graph)
            val, _ = prepare_ring_graphs(val, n_graph)
            test, _ = prepare_ring_graphs(test, n_graph)
            dist_apply = make_dist_apply_fn(
                make_mesh(n_data, n_graph), model_cfg, train[0], n_graph,
                # overlap halo exchange with interior slot aggregation
                # (parallel/dist_swegnn.py pack_halo_slots; VERDICT r1 #10)
                overlap=bool(par.get("overlap", False)),
                # width-W halos: one boundary exchange per W hops
                # (dist_swegnn.build_wide_halo_plan; VERDICT r4 #5)
                halo_width=int(par.get("halo_width", 1)))
        if dist_apply is None:
            print("ring_halo unavailable (non-MSGNN model or ring plan "
                  "failure); falling back to GSPMD")
            mode = "gspmd"
        else:
            apply_fn = dist_apply
            if opts.batch_size != 1:
                # one partitioned graph per step: the halo plans are built
                # for the single-mesh template, not a batched union
                print("ring_halo: forcing batch_size=1")
                opts = dataclasses.replace(opts, batch_size=1)
            print(f"ring-halo graph parallelism: {n_graph}-way")
    if mode == "gspmd" and n_data * n_graph > 1:
        from mswe_gnn_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(n_data, n_graph)
        print(f"device mesh: data={mesh.shape['data']} x "
              f"graph={mesh.shape['graph']}")
    tr = Trainer(apply_fn, model_cfg, params, opts, train, val,
                 multiscale=multiscale,
                 log_fn=logger.log if logger else None,
                 # non-main processes never write; they resume/read only
                 checkpoint_dir=(os.path.join(out_dir, "autosave")
                                 if is_main else None),
                 mesh=mesh,
                 batch_layout=cfg["trainer_options"].get("batch_layout",
                                                         "concat"))
    if logger is not None and opts.watch_every > 0:
        tr.watch_fn = logger.watch   # wandb histograms (no-op local-first)
    autosave_dir = os.path.join(out_dir, "autosave")
    if os.path.exists(os.path.join(autosave_dir, "meta.json")):
        resumed = tr.resume(autosave_dir)   # every process: identical params
        print(f"resumed from epoch {resumed}")

    # Epoch budget: train at most this many epochs in THIS process, autosave,
    # and signal the supervisor to relaunch (exit 75). Works around the axon
    # PJRT client leaking host memory on every host<->device transfer
    # (~1.1 GB/epoch on the accuracy config; 130 GB OOM at epoch ~108):
    # bounded-lifetime processes + restart-from-autosave keep the run alive.
    stop_at = (opts.max_epochs if epoch_budget is None
               else min(opts.max_epochs, tr.start_epoch + epoch_budget))
    tr.fit(max_epochs=stop_at)
    reached = (int(tr.history[-1]["epoch"]) + 1) if tr.history else tr.start_epoch
    if is_main:
        tr.save(autosave_dir, reached)
    if reached >= stop_at and stop_at < opts.max_epochs:
        print(f"epoch budget exhausted at {reached}/{opts.max_epochs}; "
              "relaunch to continue")
        return {"__resume__": True, "epoch": reached}

    if jax.process_count() > 1:
        # all processes finished the identical step sequence; rendezvous
        # here AND after process 0's solo evaluation — a non-main process
        # exiting while process 0 still evaluates trips the 30 s
        # coordination-service shutdown barrier and kills the whole job
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mswe_training_done")
    if not is_main:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mswe_run_complete")
        return {"non_main_process": True, "epochs": reached}

    try:
        save_checkpoint(os.path.join(out_dir, "best"), tr.best_params,
                        epoch=len(tr.history), history=tr.history)
        save_checkpoint(os.path.join(out_dir, "last"), tr.params,
                        epoch=len(tr.history), history=tr.history)

        summary = evaluate(apply_fn, model_cfg, tr.best_params, test, opts,
                           out_dir=out_dir,
                           numerical_times=[r.solver_seconds
                                            for r in test_records],
                           test_records=test_records,
                           solver_label=_solver_label(cfg),
                           # serving sweet spot (batch 2 on v5e); ring_halo
                           # templates are single-graph — keep them unbatched
                           eval_batch_size=(1 if mode == "ring_halo"
                                            and n_graph > 1 else
                                            int(cfg["trainer_options"].get(
                                                "eval_batch_size", 1))))
        summary["n_params"] = count_params(tr.best_params)
        logger.summary(summary)
        logger.close()
    finally:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("mswe_run_complete")
    print(json.dumps(summary, indent=2, default=float))
    return summary


def run_sweep(base_cfg: Dict, sweep_id: str, out_dir: str,
              count: int = 1) -> None:
    """wandb sweep-agent entry (reference main.py:189-196: the module runs
    under a sweep agent, `fix_dict_in_config(wandb)` re-nests the agent's
    dotted-key overrides and training reads wandb.config). Here the agent
    calls run_training once per trial with the overrides deep-merged over
    the base YAML; metric names match the reference's dashboards."""
    import wandb

    def _merge(dst: Dict, src: Dict) -> Dict:
        out = dict(dst)
        for k, v in src.items():
            out[k] = (_merge(out[k], v)
                      if isinstance(v, dict) and isinstance(out.get(k), dict)
                      else v)
        return out

    def _one():
        run = wandb.init()
        overrides = config_lib.fix_dotted_keys(dict(run.config))
        cfg = _merge(base_cfg, overrides)
        try:
            # MetricLogger attaches to the live run (wandb.run), so every
            # epoch's val_CSI_005/val_loss reaches the sweep controller —
            # bayes/hyperband sweeps need the objective metric per trial.
            run_training(cfg, os.path.join(out_dir, f"trial_{run.id}"))
        finally:
            run.finish()

    wandb.agent(sweep_id, function=_one, count=count)


def run_eval(cfg: Dict, ckpt: str, out_dir: str) -> Dict:
    cfg = config_lib.with_defaults(cfg)
    _, _, test, scalers, test_records = prepare_data(cfg)
    model_cfg, params, apply_fn = build_experiment_model(cfg, test[0])
    params = restore_params_only(ckpt, params)
    summary = evaluate(apply_fn, model_cfg, params, test, trainer_options(cfg),
                       out_dir=out_dir,
                       numerical_times=[r.solver_seconds for r in test_records],
                       test_records=test_records,
                       solver_label=_solver_label(cfg),
                       eval_batch_size=int(cfg["trainer_options"].get(
                           "eval_batch_size", 1)))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps(summary, indent=2, default=float))
    return summary


def _setup_cache():
    from mswe_gnn_tpu.cache import enable_compilation_cache

    enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser(description="mswe_gnn_tpu experiment driver")
    ap.add_argument("mode", choices=["train", "eval", "sweep"])
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (eval mode)")
    ap.add_argument("--sweep-id", default=None,
                    help="wandb sweep id (sweep mode): entity/project/id")
    ap.add_argument("--count", type=int, default=1,
                    help="trials to run under the sweep agent (sweep mode)")
    ap.add_argument("--out", default="runs/latest")
    ap.add_argument("--epoch-budget", type=int, default=None,
                    help="max epochs in this process; exits 75 when hit "
                         "(supervisor relaunches and training resumes "
                         "from the autosave)")
    ap.add_argument("--dist-coordinator", default=None,
                    help="coordinator host:port for an explicit multi-host "
                         "launch (default localhost:12355)")
    ap.add_argument("--dist-num-processes", type=int, default=None,
                    help="total processes in the cluster; presence of this "
                         "flag triggers jax.distributed.initialize")
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. 'cpu'). Needed on this "
                         "image because sitecustomize preloads the axon TPU "
                         "plugin and overrides JAX_PLATFORMS (verify-skill "
                         "gotcha); fake-cluster tests use --platform cpu")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # distributed init must precede ANY backend touch (incl. the compile
    # cache setup below)
    _maybe_init_distributed(args)
    _setup_cache()
    cfg = config_lib.read_config(args.config) if args.config else {}
    cfg = config_lib.fix_dotted_keys(cfg)
    if args.mode == "train":
        result = run_training(cfg, args.out, epoch_budget=args.epoch_budget)
        if result.get("__resume__"):
            sys.exit(75)
    elif args.mode == "sweep":
        assert args.sweep_id, "--sweep-id required for sweep"
        run_sweep(cfg, args.sweep_id, args.out, count=args.count)
    else:
        assert args.ckpt, "--ckpt required for eval"
        run_eval(cfg, args.ckpt, args.out)


if __name__ == "__main__":
    main()
