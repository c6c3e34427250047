"""Experiment-driver data modes: reference-pickle ingestion through
``prepare_data`` (reference utils/dataset.py:292-331 split semantics) and the
synthetic-data disk cache."""
import os
import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from mswe_gnn_tpu import config as config_lib
from mswe_gnn_tpu.main import _generate_cached, build_experiment_model, prepare_data
from tests.test_torch_compat import _fake_pyg_modules, _reference_shaped_data


def _write_pickle_tree(tmp_path, n_train=6, n_test=3):
    mods, Data = _fake_pyg_modules()
    try:
        rng = np.random.default_rng(0)
        np.random.seed(7)
        for sub, n in (("train", n_train), ("test", n_test)):
            os.makedirs(tmp_path / sub, exist_ok=True)
            ds = [_reference_shaped_data(Data) for _ in range(n)]
            with open(tmp_path / sub / "ds.pkl", "wb") as f:
                pickle.dump(ds, f)
    finally:
        for m in mods:
            sys.modules.pop(m, None)


def test_prepare_data_reference_pickles(tmp_path):
    _write_pickle_tree(tmp_path)
    cfg = config_lib.with_defaults({
        "dataset_parameters": {
            "dataset_folder": str(tmp_path),
            "train_dataset_name": "ds",
            "test_dataset_name": "ds",
            "train_size": 6,
            "val_prcnt": 0.34,
            "seed": 42,
        },
        "temporal_dataset_parameters": {"rollout_steps": 2, "previous_t": 2},
    })
    train, val, test, scalers, test_records = prepare_data(cfg)
    # 6 train sims -> 2 val sims (34%) leaves 4 train sims; test pickle has 3
    assert len(test_records) == 3
    assert train and val and test
    # all samples share one padded union spec (batchable)
    specs = {g.spec for g in train + val + test}
    assert len(specs) == 1
    # model builds with num_scales taken from the data (2-scale fixture)
    assert train[0].spec.num_scales == 2
    cfg["models"]["K"] = 2
    cfg["models"]["hid_features"] = 8
    cfg["models"]["mlp_layers"] = 1
    model_cfg, params, apply_fn = build_experiment_model(cfg, train[0])
    out = apply_fn(params, model_cfg, train[0])
    assert out.shape == (train[0].x_static.shape[0], 2)
    assert np.isfinite(np.asarray(out)).all()


def test_synthetic_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("MSWE_DATA_CACHE", str(tmp_path / "cache"))
    sd = {"n_sims": 2, "nx": 8, "ny": 8, "dx": 100.0, "num_scales": 2,
          "total_hours": 4.0, "n_bc": 1, "substeps": 4, "seed": 3,
          "pad_multiple": 16}
    first = _generate_cached(sd, 60.0)
    files = os.listdir(tmp_path / "cache")
    assert len(files) == 1 and not files[0].endswith(".tmp")
    second = _generate_cached(sd, 60.0)  # served from disk, original order
    assert len(second) == len(first) == 2
    for a, b in zip(first, second):
        np.testing.assert_allclose(a.wd, b.wd, rtol=1e-6)
        np.testing.assert_allclose(a.bc_per_length, b.bc_per_length, rtol=1e-6)
        assert a.mesh.num_nodes == b.mesh.num_nodes
    # a different key generates (and caches) separately
    _generate_cached({**sd, "seed": 4}, 60.0)
    assert len(os.listdir(tmp_path / "cache")) == 2
