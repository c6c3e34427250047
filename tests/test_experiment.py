"""End-to-end experiment pipeline on a micro config: train -> checkpoint ->
evaluate -> reports, plus checkpoint round-trip and config plumbing."""
import json
import os

import numpy as np
import pytest

from mswe_gnn_tpu import config as config_lib
from mswe_gnn_tpu.main import run_eval, run_training

MICRO = {
    "dataset_parameters": {"temporal_res": 60, "val_prcnt": 0.5, "seed": 1},
    "temporal_dataset_parameters": {"rollout_steps": 2, "previous_t": 2,
                                    "time_start": 0, "time_stop": -1},
    "models": {"hid_features": 8, "mlp_layers": 2, "K": 1},
    "trainer_options": {"batch_size": 2, "max_epochs": 2, "curriculum_epoch": 1,
                        "patience": 100},
    "synthetic_data": {"n_sims": 5, "nx": 10, "ny": 10, "num_scales": 2,
                       "total_hours": 5, "substeps": 2, "pad_multiple": 8},
}


def test_config_defaults_and_dotted_keys():
    cfg = config_lib.with_defaults({"models": {"K": 9}})
    assert cfg["models"]["K"] == 9
    assert cfg["models"]["hid_features"] == 64  # default preserved
    nested = config_lib.fix_dotted_keys({"models.K": 3, "lr_info.gamma": 0.5})
    assert nested["models"]["K"] == 3 and nested["lr_info"]["gamma"] == 0.5


def test_temporal_test_parameters_fallback():
    cfg = config_lib.with_defaults({})
    t = config_lib.temporal_test_parameters(cfg)
    assert "rollout_steps" not in t
    assert t["previous_t"] == 3


def test_run_training_end_to_end(tmp_path):
    out = str(tmp_path / "run")
    summary = run_training(MICRO, out)
    assert np.isfinite(summary["test_MAE_WD"])
    assert "test_CSI_005" in summary
    assert os.path.exists(os.path.join(out, "best", "meta.json"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "csi_curves.png"))
    assert os.path.exists(os.path.join(out, "summary.json"))

    # eval-only path restores the checkpoint and reproduces metrics
    out2 = str(tmp_path / "eval")
    summary2 = run_eval(MICRO, os.path.join(out, "best"), out2)
    assert abs(summary2["test_MAE_WD"] - summary["test_MAE_WD"]) < 1e-5

    # batched test evaluation (eval_batch_size, VERDICT r4 #9): identical
    # per-graph predictions/metrics through the concat-union split path
    import copy

    cfg_b = copy.deepcopy(MICRO)
    cfg_b["trainer_options"]["eval_batch_size"] = 2
    out3 = str(tmp_path / "eval_b2")
    summary3 = run_eval(cfg_b, os.path.join(out, "best"), out3)
    assert abs(summary3["test_MAE_WD"] - summary["test_MAE_WD"]) < 1e-4
    assert abs(summary3["test_CSI_005"] - summary["test_CSI_005"]) < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from mswe_gnn_tpu.training.checkpoint import restore_checkpoint, save_checkpoint

    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "b": [{"w": np.ones((2, 2), np.float32)}]}
    path = str(tmp_path / "ck")
    save_checkpoint(path, params, epoch=5, history=[{"epoch": 0}])
    restored, _, meta = restore_checkpoint(path, params)
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(restored["a"]), params["a"])
    np.testing.assert_array_equal(np.asarray(restored["b"][0]["w"]),
                                  params["b"][0]["w"])
