"""Lazy-dataset workflow demo (the reference's new_main.py counterpart).

Generates a few synthetic simulations, stores them in the HDF5 dataset
format, then trains from the lazy loader without materializing the whole
temporal dataset in memory.

Run: python examples/lazy_dataset_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from mswe_gnn_tpu.data.dataset import fit_dataset_scalers
from mswe_gnn_tpu.data.io import LazyFloodDataset, save_records
from mswe_gnn_tpu.data.synthetic import generate_dataset
from mswe_gnn_tpu.graph import stack_graphs
from mswe_gnn_tpu.models import build_model
from mswe_gnn_tpu.training.train import TrainerOptions, make_optimizer, train_step
from mswe_gnn_tpu.models.msgnn import apply_msgnn


def main():
    path = "/tmp/mswe_lazy_demo.h5"
    records = generate_dataset(4, seed=0, nx=16, ny=16, num_scales=2,
                               total_hours=8, substeps=4)
    save_records(path, records)
    print(f"stored {len(records)} simulations -> {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)")

    scalers = fit_dataset_scalers(records, {"area_scaler": "standard",
                                            "edge_length_scaler": "standard"})
    lazy = LazyFloodDataset([path], scalers, previous_t=2, rollout_steps=2,
                            pad_multiple=16)
    print(f"lazy dataset: {len(lazy)} temporal samples, spec {lazy.spec.node_counts}")

    g = lazy[0]
    cfg, params, apply_fn = build_model(
        {"model_type": "MSGNN", "hid_features": 16, "K": 2,
         "learned_residuals": True, "with_WL": True},
        num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
        num_edge_features=g.edge_attr.shape[1], num_scales=2, previous_t=2)

    opts = TrainerOptions(batch_size=4, learning_rate=3e-3)
    optimizer = make_optimizer(opts, steps_per_epoch=len(lazy) // 4)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    for step in range(6):
        idx = rng.choice(len(lazy), size=4, replace=False)
        batch = stack_graphs([lazy[int(i)] for i in idx])
        params, opt_state, loss = train_step(
            params, opt_state, batch, apply_fn=apply_msgnn, cfg=cfg,
            rollout_steps=2, opts=opts, multiscale=True, optimizer=optimizer)
        print(f"step {step}: loss {float(loss):.4f}")
    lazy.close()
    print("done")


if __name__ == "__main__":
    main()
