"""Multi-process (fake multi-host) distributed test.

Launches a 2-process jax.distributed cluster on localhost — each process
contributes 4 virtual CPU devices — and runs a data-parallel training step on
the global 8-device mesh. This exercises the multi-host code path (process
coordination, global mesh construction, cross-process collectives) without
pod hardware (SURVEY.md §4 distributed-test plan).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:29431",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))

# global batch sharded over all 8 devices; per-process data creation
def make_global(shape, fn):
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(sharding, fn(), shape)

B, F = 16, 8
local = np.arange(B * F, dtype=np.float32).reshape(B, F)[
    proc_id * (B // 2):(proc_id + 1) * (B // 2)]
x = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), local, (B, F))

@jax.jit
def step(x):
    return (x ** 2).sum()  # global reduction across processes

val = float(step(x))
expected = float((np.arange(B * F, dtype=np.float32) ** 2).sum())
assert abs(val - expected) < 1e-3, (val, expected)
print(f"proc {proc_id}: global sum ok ({val})", flush=True)

# --- full data-parallel training step across the 2-process cluster ---
sys.path.insert(0, r"%(repo)s")
from mswe_gnn_tpu.graph import stack_graphs
from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
from mswe_gnn_tpu.training.train import TrainerOptions, make_optimizer, train_step
from mswe_gnn_tpu.data.synthetic import generate_simulation_record
from mswe_gnn_tpu.data.dataset import (fit_dataset_scalers, make_spec,
                                       process_record, to_temporal_samples)

rec = generate_simulation_record(0, nx=8, ny=8, num_scales=2, total_hours=12,
                                 substeps=2)
scalers = fit_dataset_scalers([rec], {})
proc = process_record(rec, scalers)
spec = make_spec(rec.mesh, len(rec.mesh.ghosts.ghost_nodes), pad_multiple=8)
samples = to_temporal_samples(proc, spec, previous_t=2, rollout_steps=1)
# global batch of 8 graphs; this process owns 4 of them
mine = samples[proc_id * 4:(proc_id + 1) * 4]
local_batch = stack_graphs(mine)

def globalize(leaf):
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(leaf), (8,) + leaf.shape[1:])

gbatch = jax.tree_util.tree_map(globalize, local_batch)
g0 = samples[0]
cfg = MSGNNConfig(num_node_features=g0.x_static.shape[1] + g0.x_dynamic.shape[1],
                  num_edge_features=g0.edge_attr.shape[1], num_scales=2,
                  hid_features=8, K=1, previous_t=2, learned_residuals=True,
                  with_WL=True)
params = init_msgnn(jax.random.PRNGKey(0), cfg)
rep = NamedSharding(mesh, P())
params = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), params)
opts = TrainerOptions(batch_size=8)
optimizer = make_optimizer(opts, 1)
opt_state = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                   optimizer.init(params))
new_params, _, loss = train_step(params, opt_state, gbatch,
                                 apply_fn=apply_msgnn, cfg=cfg,
                                 rollout_steps=1, opts=opts, multiscale=True,
                                 optimizer=optimizer)
jax.block_until_ready(new_params)
import math
assert math.isfinite(float(loss))
print(f"proc {proc_id}: distributed train step ok (loss {float(loss):.4f})",
      flush=True)
jax.distributed.shutdown()
"""


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cluster_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))})
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "global sum ok" in out
        assert "distributed train step ok" in out
