"""End-to-end multi-host launch of the TRAIN ENTRY POINT (VERDICT r2 task 7).

Launches ``python -m mswe_gnn_tpu.main train`` as a 2-process fake cluster
(4 virtual CPU devices per process, jax.distributed over localhost) with an
8-way data-parallel GSPMD mesh. Process 0 must write the checkpoints and
summary; process 1 must train in lockstep and exit cleanly. This is the
production multi-host code path — tests/test_multiprocess.py covers the
primitives, this covers main.py wiring.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG = """
dataset_parameters:
  temporal_res : 60
  val_prcnt    : 0.34
  seed         : 7
temporal_dataset_parameters:
  rollout_steps : 1
  previous_t    : 2
models:
  model_type   : 'MSGNN'
  hid_features : 8
  K            : 1
  mlp_layers   : 2
  seed         : 1
trainer_options:
  batch_size      : 4
  max_epochs      : 2
  curriculum_epoch: 1
  patience        : 5
  velocity_scaler : 1
  conservation    : 0
lr_info:
  learning_rate: 0.003
  gamma        : 0.7
  step_size    : 20
synthetic_data:
  n_sims      : 4
  nx          : 8
  ny          : 8
  num_scales  : 2
  total_hours : 6.0
  substeps    : 2
  seed        : 0
  pad_multiple: 8
parallel:
  mode : gspmd
  data : 8
  graph: 1
"""


def test_main_train_runs_as_two_process_cluster(tmp_path):
    cfg_path = tmp_path / "mh.yaml"
    cfg_path.write_text(CONFIG)
    out_dir = tmp_path / "run"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS=(env.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=4"),
               MSWE_DATA_CACHE=str(tmp_path / "cache"),
               PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mswe_gnn_tpu.main", "train",
             "--config", str(cfg_path), "--out", str(out_dir),
             "--platform", "cpu",
             "--dist-coordinator", "localhost:29433",
             "--dist-num-processes", "2", "--dist-process-id", str(pid)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    assert "multi-host: process 0/2" in outs[0] + outs[1]
    # process 0 wrote the artifacts; metrics flowed
    assert (out_dir / "best" / "meta.json").exists()
    assert (out_dir / "summary.json").exists() or \
        (out_dir / "metrics.csv").exists()
    hist = [l for l in (outs[0] + outs[1]).splitlines() if "val_loss" in l]
    assert hist, "training epochs must log validation metrics"
