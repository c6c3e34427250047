"""MetricLogger wandb wiring (ADVICE r3 medium: sweep trials must log their
objective metric to the live sweep run; reference main.py:86-196 wires
WandbLogger into the Trainer).

Uses a fake ``wandb`` module — the real package (if present) is never
initialized in tests.
"""
import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self, sweep_id="sweep123"):
        # a wandb.agent trial run carries its sweep id; MetricLogger only
        # auto-attaches to sweep runs (ADVICE r4: an unrelated live run must
        # not silently receive metrics)
        self.sweep_id = sweep_id
        self.logged = []
        self.summary = {}
        self.finished = False

    def log(self, metrics, **kw):
        self.logged.append((dict(metrics), dict(kw)))

    def finish(self):
        self.finished = True


class _Histogram:
    def __init__(self, values):
        self.values = np.asarray(values)


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.run = None
    mod.Histogram = _Histogram

    def init(**kw):
        mod.run = _FakeRun()
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_logger_attaches_to_active_sweep_run(tmp_path, fake_wandb):
    from mswe_gnn_tpu.utils.logging import MetricLogger

    run = fake_wandb.init()                      # the sweep agent's live run
    m = MetricLogger(str(tmp_path), config={"a": 1})   # use_wandb NOT set
    m.log({"epoch": 0, "val_CSI_005": 0.5})
    m.summary({"test_CSI_005": 0.6})
    m.close()
    # metrics reached the sweep run...
    assert any("val_CSI_005" in rec for rec, _ in run.logged)
    assert run.summary["test_CSI_005"] == 0.6
    # ...and the logger did NOT finish a run it does not own (wandb.agent
    # manages the trial lifecycle)
    assert not run.finished


def test_logger_ignores_unrelated_live_run(tmp_path, fake_wandb):
    """ADVICE r4: a live NON-sweep run open in the host process must not
    silently receive every epoch metric when use_wandb is False."""
    from mswe_gnn_tpu.utils.logging import MetricLogger

    fake_wandb.run = _FakeRun(sweep_id=None)     # unrelated user run
    m = MetricLogger(str(tmp_path))
    m.log({"epoch": 0, "val_loss": 1.0})
    m.summary({"test_CSI_005": 0.6})
    m.close()
    assert fake_wandb.run.logged == []
    assert fake_wandb.run.summary == {}
    assert not fake_wandb.run.finished


def test_logger_owns_run_when_asked(tmp_path, fake_wandb):
    from mswe_gnn_tpu.utils.logging import MetricLogger

    m = MetricLogger(str(tmp_path), use_wandb=True, config={})
    run = fake_wandb.run
    assert run is not None
    m.log({"val_loss": 1.0})
    m.close()
    assert run.finished                          # created it -> finishes it


def test_watch_histograms_logged_without_explicit_step(tmp_path, fake_wandb):
    """Explicit step=epoch is non-monotonic vs wandb's auto step and gets
    silently dropped (ADVICE r3 low) — watch() must log hists step-free with
    the epoch as a plain metric."""
    import jax.numpy as jnp

    from mswe_gnn_tpu.utils.logging import MetricLogger

    fake_wandb.init()
    m = MetricLogger(str(tmp_path))
    m.log({"epoch": 0, "val_loss": 1.0})         # advances the auto step
    m.watch({"encoder": {"w": jnp.ones((3, 2))}}, step=0)
    rec, kw = fake_wandb.run.logged[-1]
    assert "step" not in kw
    assert rec["epoch"] == 0
    assert any(k.startswith("watch/") for k in rec)


def test_logger_without_wandb(tmp_path, monkeypatch):
    """No wandb importable: logger still writes JSONL/CSV."""
    monkeypatch.setitem(sys.modules, "wandb", None)  # import -> TypeError
    from mswe_gnn_tpu.utils.logging import MetricLogger

    m = MetricLogger(str(tmp_path))
    m.log({"epoch": 0, "val_loss": 2.0})
    m.close()
    assert (tmp_path / "metrics.jsonl").exists()
