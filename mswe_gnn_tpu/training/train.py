"""Jitted training: pushforward rollout loss, AdamW + StepLR, curriculum.

Re-design of the reference Lightning trainer (reference training/train.py:97-251):
- ``training_step``'s Python unroll becomes a ``lax.scan`` over rollout steps
  inside one jitted function; pushforward curriculum selects among a handful
  of compiled scan lengths (one per distinct ``rollout_steps``).
- AdamW + StepLR + gradient clip 1.0 (reference training/train.py:147-155,
  main.py:109-110) via optax.
- validation = full scan rollout + masked rollout loss + CSI (reference
  training/train.py:157-180).
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mswe_gnn_tpu.graph import FloodGraph, concat_graphs, stack_graphs
from mswe_gnn_tpu.training import loss as loss_lib
from mswe_gnn_tpu.training.rollout import (
    bc_step_inflow,
    bc_window,
    inject_bc,
    rollout,
    rollout_batch,
    shift_prediction,
    with_step_forcing,
)
from mswe_gnn_tpu.utils.metrics import get_csi, get_rollout_loss


@dataclasses.dataclass(frozen=True)
class TrainerOptions:
    """Mirrors the ``trainer_options`` + ``lr_info`` config groups
    (reference config.yaml:60-75)."""
    type_loss: str = "RMSE"
    only_where_water: bool = True
    batch_size: int = 4
    conservation: float = 0.0
    velocity_scaler: float = 1.0
    curriculum_epoch: int = 20
    patience: int = 100
    max_epochs: int = 200
    max_rollout_steps: int = 6
    learning_rate: float = 3e-3
    weight_decay: float = 0.0
    gamma: float = 0.7
    step_size: int = 20
    grad_clip: float = 1.0
    seed: int = 42
    remat: bool = False   # rematerialize the forward in the rollout scan
                          # (trade FLOPs for activation memory on big meshes)
    # divergence guard: if an epoch's train loss exceeds this factor times
    # the recent-epoch median (or goes non-finite), restore the best-val
    # params and reset the optimizer moments instead of training onward from
    # a blown-up state (observed at pushforward-curriculum transitions:
    # one bad autoregressive batch can undo ~100 epochs). 0 disables.
    spike_rollback_factor: float = 10.0
    spike_window: int = 8
    # Best-checkpoint selection metric. The reference checkpoints on
    # val_loss (reference main.py:90-92) but early-stops on val_CSI_005
    # (main.py:94); with full-rollout validation, val_loss is noisy and a
    # single low-loss fluke can pin the "best" checkpoint at a mediocre-CSI
    # epoch for the rest of the run (observed on runs/accuracy2: best_val
    # froze at epoch 131 / CSI 0.59 while epochs 190+ reached CSI 0.82 —
    # the round-2 val/test "gap" was exactly this). Default aligns selection
    # with the early-stop/headline metric; set "val_loss" for the
    # reference's literal behavior.
    best_metric: str = "val_CSI_005"
    # Parameter/update monitoring cadence in epochs (the reference's
    # wandb_logger.watch(model, log="all") analog, reference main.py:95).
    # Every N epochs the fit loop logs per-module L2 norms of the params and
    # of the epoch's net update; MetricLogger additionally forwards full
    # histograms to wandb when a run is live. 0 disables.
    watch_every: int = 0


def watch_norms(params, prev=None, prefix: str = "watch") -> Dict[str, float]:
    """Per-top-level-module L2 norms of the parameters and (when ``prev`` is
    given) of the net update since ``prev`` — the gradient/parameter
    monitoring the reference gets from wandb's watch(log='all')
    (reference main.py:95), local-first: scalars keep the JSONL/CSV readable
    while MetricLogger.watch forwards full histograms to wandb when live."""
    if jax.process_count() > 1:
        # sharded params are not fully addressable on any one host; eager
        # float() on a leaf would raise. Per-module norms are a single-host
        # observability feature — skip rather than crash multi-host training.
        return {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sq: Dict[str, float] = {}
    dsq: Dict[str, float] = {}
    prev_flat = (jax.tree_util.tree_flatten_with_path(prev)[0]
                 if prev is not None else None)
    for i, (path, leaf) in enumerate(flat):
        key = str(getattr(path[0], "key", path[0])) if path else "params"
        sq[key] = sq.get(key, 0.0) + float(jnp.sum(
            jnp.square(leaf.astype(jnp.float32))))
        if prev_flat is not None:
            d = leaf.astype(jnp.float32) - prev_flat[i][1].astype(jnp.float32)
            dsq[key] = dsq.get(key, 0.0) + float(jnp.sum(jnp.square(d)))
    out = {f"{prefix}/{k}_norm": float(np.sqrt(v)) for k, v in sq.items()}
    out.update({f"{prefix}/{k}_update_norm": float(np.sqrt(v))
                for k, v in dsq.items()})
    return out


def make_optimizer(opts: TrainerOptions, steps_per_epoch: int):
    """AdamW with epoch-staircase StepLR decay and global-norm clipping."""
    schedule = optax.exponential_decay(
        init_value=opts.learning_rate,
        transition_steps=max(1, opts.step_size * steps_per_epoch),
        decay_rate=opts.gamma,
        staircase=True,
    )
    return optax.chain(
        optax.clip_by_global_norm(opts.grad_clip),
        optax.adamw(schedule, weight_decay=opts.weight_decay),
    )


def curriculum_rollout_steps(epoch: int, opts: TrainerOptions) -> int:
    """Pushforward curriculum, 'epoch' mode (reference training/train.py:231-241)."""
    if opts.curriculum_epoch == 0:
        return opts.max_rollout_steps
    return min(epoch // opts.curriculum_epoch + 1, opts.max_rollout_steps)


class CurriculumController:
    """Adaptive curriculum modes the reference declares ('loss', 'plateau',
    reference training/train.py:211-241 — only 'epoch' is implemented there).

    - 'epoch'  : grow every ``curriculum_epoch`` epochs
    - 'loss'   : grow when train loss drops below ``loss_threshold``
    - 'plateau': grow after ``patience`` epochs without loss improvement
    """

    def __init__(self, opts: TrainerOptions, mode: str = "epoch",
                 loss_threshold: float = 0.01, patience: int = 5,
                 min_rel_improvement: float = 1e-3):
        assert mode in ("epoch", "loss", "plateau"), mode
        self.opts = opts
        self.mode = mode
        self.loss_threshold = loss_threshold
        self.patience = patience
        self.min_rel_improvement = min_rel_improvement
        self.rollout_steps = 1 if opts.curriculum_epoch or mode != "epoch" \
            else opts.max_rollout_steps
        self._best = float("inf")
        self._stall = 0

    def on_epoch_start(self, epoch: int) -> int:
        if self.mode == "epoch":
            self.rollout_steps = curriculum_rollout_steps(epoch, self.opts)
        return self.rollout_steps

    def on_epoch_end(self, train_loss: float) -> None:
        grow = False
        if self.mode == "loss":
            grow = train_loss < self.loss_threshold
        elif self.mode == "plateau":
            if train_loss < self._best * (1 - self.min_rel_improvement):
                self._best = train_loss
                self._stall = 0
            else:
                self._stall += 1
                if self._stall >= self.patience:
                    grow = True
        if grow and self.rollout_steps < self.opts.max_rollout_steps:
            self.rollout_steps += 1
            self._best = float("inf")
            self._stall = 0


def find_max_batch_size(apply_fn, cfg, params, graphs, opts: TrainerOptions,
                        multiscale: bool = True, start: int = 1,
                        limit: int = 256) -> int:
    """Double the batch size at max rollout until compilation/execution fails
    (the reference's CurriculumBatchSizeFinder, training/train.py:243-251)."""
    best = 0
    bs = start
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    while bs <= min(limit, len(graphs)):
        try:
            batch = stack_graphs(graphs[:bs])
            p = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
            train_step(p, optimizer.init(p), batch, apply_fn=apply_fn, cfg=cfg,
                       rollout_steps=opts.max_rollout_steps, opts=opts,
                       multiscale=multiscale, optimizer=optimizer)
            best = bs
            bs *= 2
        except Exception:
            break
    return max(best, start)


def tune_batch_size(apply_fn, cfg, params, graphs, opts: TrainerOptions,
                    multiscale: bool = True,
                    candidates=(1, 2, 4, 8, 16), reps: int = 3):
    """Throughput-based batch tuner: probe the jitted train step across
    concat batch sizes and return (best_batch, {bs: simulations/s}).

    Complements :func:`find_max_batch_size` (which finds the memory limit):
    per-chip throughput peaks well below the memory limit on big meshes
    (HBM pressure from the flux tables), so the right batch is the
    *fastest*, not the largest."""
    optimizer = make_optimizer(opts, steps_per_epoch=1)
    rates: Dict[int, float] = {}
    best, best_rate = candidates[0], 0.0
    for bs in candidates:
        if bs > len(graphs):
            break
        try:
            batch = concat_graphs(list(graphs[:bs]))
            p = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
            st = optimizer.init(p)
            p, st, loss = train_step(
                p, st, batch, apply_fn=apply_fn, cfg=cfg,
                rollout_steps=opts.max_rollout_steps, opts=opts,
                multiscale=multiscale, optimizer=optimizer)
            float(loss)  # sync (compile + warm)
            t0 = time.time()
            for _ in range(reps):
                p, st, loss = train_step(
                    p, st, batch, apply_fn=apply_fn, cfg=cfg,
                    rollout_steps=opts.max_rollout_steps, opts=opts,
                    multiscale=multiscale, optimizer=optimizer)
            float(loss)  # sync
            rates[bs] = bs * reps / (time.time() - t0)
        except Exception:
            break
        if rates[bs] > best_rate:
            best, best_rate = bs, rates[bs]
    return best, rates


def pushforward_loss(
    apply_fn: Callable,
    params,
    cfg,
    batch: FloodGraph,
    rollout_steps: int,
    opts: TrainerOptions,
    multiscale: bool,
) -> jax.Array:
    """Mean over rollout steps of the batch-aggregated step loss
    (reference training/train.py:125-145).

    Accepts either a vmap-stacked batch (leading batch axis) or a
    concat-batched union graph (2D leaves, ``num_graphs`` >= 1) — the latter
    is the TPU-preferred layout."""

    fwd = (jax.checkpoint(lambda p, gt: apply_fn(p, cfg, gt))
           if opts.remat else (lambda p, gt: apply_fn(p, cfg, gt)))

    def per_graph(g: FloodGraph):
        from mswe_gnn_tpu.models import prepare_graph

        # hoist loop-invariant tables/encodings out of the pushforward scan
        g = prepare_graph(params, cfg, g)

        def step_fn(x_dyn, t):
            x_dyn = inject_bc(x_dyn, g, bc_window(g, t))
            gt = with_step_forcing(g, t).replace(x_dynamic=x_dyn)
            pred = fwd(params, gt)
            target = jax.lax.dynamic_index_in_dim(g.y, t, axis=-1, keepdims=False)
            sums, count, cons = loss_lib.step_loss_sums(
                pred, target, gt,
                type_loss=opts.type_loss,
                only_where_water=opts.only_where_water,
                multiscale=multiscale,
                bc_now=(bc_step_inflow(g, t)
                        if opts.conservation != 0.0 else None),
                conservation=opts.conservation,
            )
            x_next = shift_prediction(x_dyn, pred, g.previous_t)
            return x_next, (sums, count, cons)

        _, (sums, counts, cons) = jax.lax.scan(
            step_fn, g.x_dynamic, jnp.arange(rollout_steps))
        return sums, counts, cons  # [T,2], [T], [T] or [T,B]

    if batch.x_static.ndim == 2:
        # concat-batched union graph: one scan, aggregation across graphs is
        # inherent in the node concatenation (reference concat-then-mean)
        sums, counts, cons = per_graph(batch)         # [T,2], [T], [T(,B)]
        err = loss_lib.finalize_error(sums, counts[:, None], opts.type_loss)
        cons_mean = cons.mean(-1) if cons.ndim > 1 else cons
    else:
        sums, counts, cons = jax.vmap(per_graph)(batch)  # [B,T,2], [B,T], [B,T]
        err = loss_lib.finalize_error(sums.sum(0), counts.sum(0)[:, None],
                                      opts.type_loss)    # [T,2]
        cons_mean = cons.mean(0)
    scaler = loss_lib.loss_variable_scaler(opts.velocity_scaler)
    per_step = err @ scaler / scaler.sum()            # [T]
    if opts.conservation != 0.0:
        per_step = per_step + opts.conservation * jnp.abs(cons_mean)
    return per_step.mean()


@functools.partial(jax.jit, static_argnames=(
    "apply_fn", "cfg", "rollout_steps", "opts", "multiscale", "optimizer"),
    donate_argnames=("params", "opt_state"))
def train_step(params, opt_state, batch: FloodGraph, *, apply_fn, cfg,
               rollout_steps: int, opts: TrainerOptions, multiscale: bool,
               optimizer):
    loss, grads = jax.value_and_grad(
        lambda p: pushforward_loss(apply_fn, p, cfg, batch, rollout_steps,
                                   opts, multiscale))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("apply_fn", "cfg", "steps", "opts",
                                             "multiscale", "per_graph"))
def eval_step(params, batch: FloodGraph, *, apply_fn, cfg, steps: int,
              opts: TrainerOptions, multiscale: bool, per_graph: bool = False):
    """Full-rollout validation metrics (reference training/train.py:157-180).

    Metrics are computed on the finest scale only for multiscale graphs.
    Accepts vmap-stacked batches (leading batch axis) or concat-batched
    union graphs (2D leaves). With ``per_graph`` (concat batches), also
    returns per-simulation curves: the tiled spec keeps each scale's
    sub-graphs back to back, so the finest block reshapes to [B, n0, ...]
    (the reference's per-simulation SpatialAnalysis view,
    utils/miscellaneous.py:311)."""
    if batch.x_static.ndim == 2:
        preds = rollout(apply_fn, params, cfg, batch, steps)    # [N,2,T]
        real = batch.y[..., :steps]
        fs = batch.spec.node_slice(0)
        if multiscale:
            preds, real = preds[fs], real[fs]
            nmask = batch.node_mask[fs]
        else:
            nmask = batch.node_mask
        val_loss = get_rollout_loss(preds, real, nmask, type_loss=opts.type_loss,
                                    only_where_water=opts.only_where_water).mean()
        csi005 = get_csi(preds, real, nmask, water_threshold=0.05)
        csi03 = get_csi(preds, real, nmask, water_threshold=0.3)
        out = {"val_loss": val_loss,
               "val_CSI_005": jnp.nanmean(csi005),
               "val_CSI_03": jnp.nanmean(csi03)}
        if per_graph and batch.num_graphs > 1:
            b = batch.num_graphs
            n0 = preds.shape[0] // b
            pg = preds.reshape(b, n0, *preds.shape[1:])
            rg = real.reshape(b, n0, *real.shape[1:])
            mg = nmask.reshape(b, n0)
            out["per_graph_CSI_005"] = jnp.nanmean(
                get_csi(pg, rg, mg, water_threshold=0.05), axis=-1)   # [B]
            out["per_graph_CSI_03"] = jnp.nanmean(
                get_csi(pg, rg, mg, water_threshold=0.3), axis=-1)
            out["per_graph_loss"] = get_rollout_loss(
                pg, rg, mg, type_loss=opts.type_loss,
                only_where_water=opts.only_where_water)               # [B,2]
        return out
    preds = rollout_batch(apply_fn, params, cfg, batch, steps)  # [B,N,2,T]
    real = batch.y[..., :steps]
    if multiscale:
        fs = batch.spec.node_slice(0)
        preds = preds[:, fs]
        real = real[:, fs]
        nmask = batch.node_mask[:, fs]
    else:
        nmask = batch.node_mask
    val_loss = get_rollout_loss(preds, real, nmask, type_loss=opts.type_loss,
                                only_where_water=opts.only_where_water).mean()
    csi005 = get_csi(preds, real, nmask, water_threshold=0.05)
    csi03 = get_csi(preds, real, nmask, water_threshold=0.3)
    return {"val_loss": val_loss,
            "val_CSI_005": jnp.nanmean(csi005),
            "val_CSI_03": jnp.nanmean(csi03)}


class Trainer:
    """Minimal experiment driver: curriculum fit + validation + early stop.

    Host-side replacement for Lightning (reference main.py:87-126): batches
    are same-spec stacked graphs, all device work happens in the two jitted
    step functions above.
    """

    def __init__(self, apply_fn, cfg, params, opts: TrainerOptions,
                 train_graphs: List[FloodGraph], val_graphs: List[FloodGraph],
                 multiscale: bool = True, log_fn: Optional[Callable] = None,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every: int = 25,
                 curriculum_mode: str = "epoch",
                 batch_layout: str = "concat",
                 mesh=None,
                 device_dataset: bool = True):
        self.apply_fn = apply_fn
        self.cfg = cfg
        self.mesh = mesh   # optional jax.sharding.Mesh ('data','graph'):
        #   vmap batches   -> batch axis on 'data', node/edge axes on 'graph'
        #   concat batches -> the union graph's node/edge axes over all devices
        # params/opt state replicated; XLA GSPMD inserts the collectives.
        # own a private copy: train_step donates its params buffers, and the
        # caller may hold (and reuse) the originals
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params)
        self.opts = opts
        self.train_graphs = train_graphs
        self.val_graphs = val_graphs
        self.multiscale = multiscale
        self.steps_per_epoch = max(1, len(train_graphs) // opts.batch_size)
        self.optimizer = make_optimizer(opts, self.steps_per_epoch)
        self.opt_state = self.optimizer.init(params)
        if mesh is not None:
            from mswe_gnn_tpu.parallel.sharding import replicate

            self.params = replicate(self.params, mesh)
            self.opt_state = replicate(self.opt_state, mesh)
        self.rng = np.random.default_rng(opts.seed)
        self.log_fn = log_fn or (lambda m: None)
        # optional histogram sink, called (params, epoch) every
        # opts.watch_every epochs (MetricLogger.watch when wandb is live)
        self.watch_fn: Optional[Callable] = None
        self.history: List[Dict] = []
        self.best_params = params
        self.best_val_loss = float("inf")
        self.best_val_csi = -float("inf")
        self.best_score: Optional[float] = None   # under opts.best_metric
        self.epochs_without_improvement = 0
        self._recent_losses: List[float] = []
        self._last_heartbeat = 0.0
        self.start_epoch = 0
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.curriculum = CurriculumController(opts, mode=curriculum_mode)
        assert batch_layout in ("concat", "vmap"), batch_layout
        self.batch_layout = batch_layout
        # Device-resident dataset: the sample lists live in HBM as ONE stacked
        # pytree each; batches are assembled on device (DeviceConcatPlan) so
        # the per-batch host<->device traffic is an index vector, not the
        # batch itself (concat_graphs on device-backed samples reads every
        # field back to host and re-uploads the union — ~1 GB/epoch on the
        # accuracy config, which the axon client additionally never frees).
        self._dev_stacked: Dict[int, tuple] = {}
        self._dev_plans: Dict[tuple, "object"] = {}
        self._device_dataset = (device_dataset and mesh is None
                                and batch_layout == "concat")

    def _device_stacked(self, graphs) -> Optional[FloodGraph]:
        """Stacked device copy of a sample list (train or val), built once.
        Returns None (and disables itself) when samples don't share a spec.
        The cache retains the list itself: keying on id() alone risks CPython
        id reuse handing a stale stacked pytree to a different list."""
        key = id(graphs)
        hit = self._dev_stacked.get(key)
        if hit is None or hit[0] is not graphs:
            g0 = graphs[0]
            ok = all(g.spec == g0.spec and g.previous_t == g0.previous_t
                     and g.bc_kind == g0.bc_kind
                     and (g.y is None) == (g0.y is None)
                     and (g.y is None or g.y.shape == g0.y.shape)
                     for g in graphs)
            hit = (graphs, stack_graphs(graphs) if ok else None)
            self._dev_stacked[key] = hit
        return hit[1]

    def _device_plan(self, spec, b):
        from mswe_gnn_tpu.graph import DeviceConcatPlan

        key = (spec, b)
        if key not in self._dev_plans:
            self._dev_plans[key] = DeviceConcatPlan(spec, b)
        return self._dev_plans[key]

    def _maybe_rollback(self, train_loss: float) -> bool:
        """Divergence guard: on a loss spike (>= factor x recent median) or a
        non-finite loss, restore the best-validation params. Returns True
        when a rollback happened.

        Motivation: in pushforward training one divergent autoregressive
        batch can produce gradients that (even clipped) knock the model off a
        good optimum — observed as a 15x train-loss jump right after a
        curriculum rollout-length increase, costing ~0.5 CSI. The reference
        has no such guard; its best-checkpoint reload only rescues the final
        artifact, not the remaining training epochs.

        The optimizer state is kept on purpose: re-initializing it would
        rewind the LR schedule to its full initial rate, and the spike-
        inflated Adam second moment usefully damps the first steps after the
        restore.
        """
        factor = self.opts.spike_rollback_factor
        triggered = False
        if factor and np.isfinite(train_loss):
            recent = self._recent_losses[-self.opts.spike_window:]
            if len(recent) >= 3:
                ref = float(np.median(recent))
                triggered = train_loss > factor * max(ref, 1e-12)
        elif factor and not np.isfinite(train_loss):
            triggered = True
        if triggered and self.best_score is not None:
            self.params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), self.best_params)
            if self.mesh is not None:
                from mswe_gnn_tpu.parallel.sharding import replicate

                self.params = replicate(self.params, self.mesh)
            self._recent_losses.clear()
            return True
        if np.isfinite(train_loss):
            self._recent_losses.append(train_loss)
        return False

    def save(self, path: str, epoch: int) -> None:
        """Periodic checkpoint for crash recovery (params + opt state).
        Early-stop state rides along so a relaunched bounded-lifetime process
        (--epoch-budget) keeps the patience counter instead of resetting it."""
        from mswe_gnn_tpu.training.checkpoint import save_checkpoint

        save_checkpoint(path, self.params, opt_state=self.opt_state,
                        epoch=epoch, history=self.history,
                        extra={"best_val_csi": self.best_val_csi,
                               "best_val_loss": self.best_val_loss,
                               "best_score": self.best_score,
                               "best_metric": self.opts.best_metric,
                               "epochs_without_improvement":
                                   self.epochs_without_improvement})

    def resume(self, path: str) -> int:
        """Restore params/opt_state/epoch from a crash checkpoint and return
        the epoch to continue from (restart-from-latest recovery)."""
        from mswe_gnn_tpu.training.checkpoint import restore_checkpoint

        params, opt_state, meta = restore_checkpoint(path, self.params,
                                                     self.opt_state)
        self.params = params
        if opt_state is not None:
            self.opt_state = opt_state
        self.history = meta.get("history", [])
        self.start_epoch = int(meta.get("epoch", 0))
        best_dir = os.path.join(path, "best_val")
        if os.path.exists(os.path.join(best_dir, "meta.json")):
            best, _, bmeta = restore_checkpoint(best_dir, self.params)
            self.best_params = best
            self.best_val_loss = float(bmeta.get("best_val_loss", float("inf")))
            if bmeta.get("best_metric", "val_loss") == self.opts.best_metric:
                bs = bmeta.get("best_score", bmeta.get("best_val_loss"))
                self.best_score = None if bs is None else float(bs)
            else:
                # checkpoint written under a different selection metric
                # (e.g. a pre-fix val_loss checkpoint resumed with the CSI
                # criterion): keep the params but reset the score so the
                # next validation re-establishes the best under the NEW
                # metric instead of freezing on a stale one
                self.best_score = None
            hist_csi = [r.get("val_CSI_005", 0.0) for r in self.history]
            self.best_val_csi = max(hist_csi) if hist_csi else 0.0
        # early-stop state persisted by save(); fall back to history-derived
        # values for checkpoints written before these keys existed
        if "best_val_csi" in meta:
            self.best_val_csi = float(meta["best_val_csi"])
        if "best_val_loss" in meta:
            self.best_val_loss = float(meta["best_val_loss"])
        if (meta.get("best_score") is not None
                and meta.get("best_metric") == self.opts.best_metric):
            self.best_score = float(meta["best_score"])
        self.epochs_without_improvement = int(
            meta.get("epochs_without_improvement", 0))
        return self.start_epoch

    def _place(self, batch: FloodGraph) -> FloodGraph:
        if self.mesh is None:
            return batch
        from mswe_gnn_tpu.parallel.sharding import (shard_batch,
                                                    shard_union_batch)

        if batch.x_static.ndim == 2:
            return shard_union_batch(batch, self.mesh)
        return shard_batch(batch, self.mesh, shard_graph=True)

    def _batches(self, graphs, batch_size, shuffle, drop_tail=True):
        idx = np.arange(len(graphs))
        if shuffle:
            self.rng.shuffle(idx)
        stacked = (self._device_stacked(graphs)
                   if self._device_dataset and len(graphs) > 1 else None)
        if stacked is not None:
            build = lambda sel: self._device_plan(graphs[0].spec, len(sel))(
                stacked, np.asarray(sel, np.int32))
        else:
            host = (concat_graphs if self.batch_layout == "concat"
                    else stack_graphs)
            build = lambda sel: host([graphs[j] for j in sel])
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            yield self._place(build(idx[i:i + batch_size]))
        rem = len(idx) % batch_size
        if rem and len(idx) >= batch_size:
            if not drop_tail:  # one extra compile per distinct tail size
                yield self._place(build(idx[len(idx) - rem:]))
            # training drops the ragged tail: static batch shapes per epoch
        elif rem:
            yield self._place(build(idx))

    def _heartbeat(self) -> None:
        """Touch <checkpoint_dir>/heartbeat (throttled): proof the training
        loop advances within an epoch, for stall watchdogs whose per-epoch
        metrics file would otherwise false-positive on long epochs."""
        if not self.checkpoint_dir:
            return
        now = time.time()
        if now - self._last_heartbeat >= 10.0:
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            with open(os.path.join(self.checkpoint_dir, "heartbeat"), "w") as f:
                f.write(f"{now}\n")
            self._last_heartbeat = now

    def fit(self, max_epochs: Optional[int] = None, val_every: int = 1):
        opts = self.opts
        max_epochs = max_epochs if max_epochs is not None else opts.max_epochs
        prev_steps = None
        for epoch in range(self.start_epoch, max_epochs):
            rollout_steps = self.curriculum.on_epoch_start(epoch)
            if prev_steps is not None and rollout_steps != prev_steps:
                # curriculum boundary: drop the stale scan-length executables
                # BEFORE compiling the new one. Each pushforward depth is a
                # distinct compiled program; on a 16 GB chip the accumulated
                # executables + compile workspace + the device-resident
                # dataset can exhaust HBM at the transition (observed:
                # RESOURCE_EXHAUSTED at epoch 32 = the 2->3 boundary of the
                # triangulated accuracy corpus, round 5). Costs one
                # re-compile of the eval/concat programs per boundary.
                jax.clear_caches()
                self._dev_plans.clear()
            prev_steps = rollout_steps
            t0 = time.time()
            watching = (opts.watch_every > 0
                        and epoch % opts.watch_every == 0)
            if watching:
                # copy, not alias: train_step donates its params buffers
                prev_params = jax.tree_util.tree_map(
                    lambda x: jnp.array(x, copy=True), self.params)
            losses = []
            for batch in self._batches(self.train_graphs, opts.batch_size, True):
                self.params, self.opt_state, loss = train_step(
                    self.params, self.opt_state, batch,
                    apply_fn=self.apply_fn, cfg=self.cfg,
                    rollout_steps=rollout_steps, opts=opts,
                    multiscale=self.multiscale, optimizer=self.optimizer)
                losses.append(loss)
                self._heartbeat()
            train_loss = float(jnp.stack(losses).mean()) if losses else float("nan")
            self.curriculum.on_epoch_end(train_loss)
            record = {"epoch": epoch, "rollout_steps": rollout_steps,
                      "train_loss": train_loss, "epoch_time": time.time() - t0}
            if watching:
                record.update(watch_norms(self.params, prev_params))
                if self.watch_fn is not None:
                    self.watch_fn(self.params, epoch)  # wandb histograms
            if self._maybe_rollback(train_loss):
                record["spike_rollback"] = 1

            if self.val_graphs and (epoch % val_every == 0 or epoch == max_epochs - 1):
                metrics = self.validate()
                record.update(metrics)
                self.best_val_loss = min(self.best_val_loss,
                                         metrics["val_loss"])
                score = metrics.get(self.opts.best_metric)
                mode_min = "loss" in self.opts.best_metric
                improved = (score is not None and np.isfinite(score)
                            and (self.best_score is None
                                 or (score < self.best_score if mode_min
                                     else score > self.best_score)))
                if improved:
                    self.best_score = float(score)
                    # deep copy: train_step donates its params buffers, so a
                    # bare alias would be deleted by the next step (TPU only —
                    # CPU ignores donation, which is why tests can't catch it)
                    self.best_params = jax.tree_util.tree_map(
                        lambda x: jnp.array(x, copy=True), self.params)
                    if self.checkpoint_dir:
                        # persist best params so restart-from-autosave
                        # recovery keeps the global best across processes
                        from mswe_gnn_tpu.training.checkpoint import \
                            save_checkpoint

                        save_checkpoint(
                            os.path.join(self.checkpoint_dir, "best_val"),
                            self.best_params, epoch=epoch,
                            extra={"best_metric": self.opts.best_metric,
                                   "best_score": self.best_score,
                                   "best_val_loss": metrics["val_loss"]})
                # early stop on CSI@0.05 as the reference does (main.py:94);
                # the counter lives on self so --epoch-budget relaunches
                # resume it (persisted in save()/resume())
                if metrics["val_CSI_005"] > self.best_val_csi + 1e-12:
                    self.best_val_csi = metrics["val_CSI_005"]
                    self.epochs_without_improvement = 0
                else:
                    self.epochs_without_improvement += val_every
                if self.epochs_without_improvement >= opts.patience:
                    self.history.append(record)
                    self.log_fn(record)
                    break
            self.history.append(record)
            self.log_fn(record)
            if (self.checkpoint_dir
                    and (epoch + 1) % self.checkpoint_every == 0):
                self.save(self.checkpoint_dir, epoch + 1)
        return self.history

    def validate(self) -> Dict[str, float]:
        steps = int(self.val_graphs[0].y.shape[-1])
        agg, weights = [], []
        bs = min(self.opts.batch_size, len(self.val_graphs))
        # keep the ragged tail: every validation graph counts (the train
        # loop drops tails for static per-epoch shapes; here fidelity wins)
        for batch in self._batches(self.val_graphs, bs, False,
                                   drop_tail=False):
            m = eval_step(self.params, batch, apply_fn=self.apply_fn,
                          cfg=self.cfg, steps=steps, opts=self.opts,
                          multiscale=self.multiscale)
            agg.append({k: float(v) for k, v in m.items()})
            weights.append(float(batch.num_graphs))
        # weight each batch by its graph count so a ragged tail batch does
        # not get the same vote as a full batch (per-graph aggregation)
        out = {}
        w = np.asarray(weights, np.float64)
        for k in agg[0]:
            vals = np.asarray([m[k] for m in agg], np.float64)
            ok = np.isfinite(vals)
            out[k] = (float((vals[ok] * w[ok]).sum() / w[ok].sum())
                      if ok.any() else float("nan"))
        return out
