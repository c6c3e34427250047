"""Experiment metric logging: JSONL + CSV always, wandb when available.

Replaces the reference's hard wandb dependency (reference main.py:86-196,
training/train.py self.log calls) with a local-first writer using the same
metric names (train_loss, val_loss, val_CSI_005, val_CSI_03, rollout_steps,
test metrics) so dashboards stay comparable.
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False,
                 wandb_project: Optional[str] = None, config: Optional[dict] = None):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self.csv_path = os.path.join(out_dir, "metrics.csv")
        self._csv_fields = None
        self._wandb = None
        self._owns_wandb = False
        try:
            import wandb

            if wandb.run is not None and (
                    use_wandb or getattr(wandb.run, "sweep_id", None)):
                # a live run already exists (wandb sweep agent: the run is
                # opened by the agent before run_training constructs this
                # logger) — attach so log()/summary() reach the sweep
                # controller's objective metric; the opener finishes it.
                # Only attach when asked to (use_wandb) or the run belongs to
                # a sweep: an unrelated run open in the host process must not
                # silently receive every epoch metric (ADVICE r4).
                self._wandb = wandb.run
            elif use_wandb:
                self._wandb = wandb.init(project=wandb_project or "mswe-gnn-tpu",
                                         config=config)
                self._owns_wandb = True
        except Exception:
            self._wandb = None
        if config is not None:
            with open(os.path.join(out_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict) -> None:
        rec = {"time": time.time(), **{k: (float(v) if hasattr(v, "__float__") else v)
                                       for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self._csv_fields is None:
            self._csv_fields = list(rec)
            with open(self.csv_path, "w", newline="") as f:
                csv.DictWriter(f, self._csv_fields).writeheader()
        with open(self.csv_path, "a", newline="") as f:
            csv.DictWriter(f, self._csv_fields, extrasaction="ignore").writerow(rec)
        # echo to stdout so a live `tail -f` of the run log shows progress
        # (the reference's Lightning progress output analog)
        print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                          for k, v in metrics.items()}), flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics)

    def watch(self, params, step: int) -> None:
        """Full parameter histograms to wandb when a run is live (the
        reference's wandb_logger.watch(model, log='all'), main.py:95).
        Local-first runs get the scalar per-module norms the Trainer logs
        via ``watch_norms`` instead; this adds the histogram view only
        where a wandb dashboard exists to render it."""
        if self._wandb is None:
            return
        import numpy as _np
        import wandb

        import jax

        hists = {"epoch": step}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            hists[f"watch/{name}"] = wandb.Histogram(
                _np.asarray(leaf, dtype=_np.float32).ravel())
        # no explicit step=: wandb's internal step is auto-incrementing and
        # already ahead of the epoch counter (log() is called per epoch with
        # several metrics), so step=epoch would be non-monotonic and the
        # histograms silently dropped.
        self._wandb.log(hists)

    def summary(self, metrics: Dict) -> None:
        with open(os.path.join(self.out_dir, "summary.json"), "w") as f:
            json.dump({k: (float(v) if hasattr(v, "__float__") else v)
                       for k, v in metrics.items()}, f, indent=2)
        if self._wandb is not None:
            for k, v in metrics.items():
                self._wandb.summary[k] = v

    def close(self) -> None:
        self.jsonl.close()
        if self._wandb is not None and self._owns_wandb:
            self._wandb.finish()
