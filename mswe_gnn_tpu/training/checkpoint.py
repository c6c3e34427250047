"""Checkpoint / resume via orbax (reference: Lightning ModelCheckpoint +
best-ckpt reload, main.py:90-122; fine-tune warm start, main.py:103-104).

Saves (params, opt_state, epoch, history) so training resumes exactly;
``restore_params_only`` implements the fine-tuning recipe (restore weights,
fresh optimizer — reference config_finetune.yaml semantics).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    history: Optional[list] = None,
                    extra: Optional[Dict] = None) -> None:
    """Write a checkpoint directory (orbax if available, npz fallback).

    Multi-host: only process 0 calls this (main.run_training gates it), so
    orbax — whose save() runs a cross-process barrier internally — must NOT
    be used then: a barrier only one process enters stalls it ~30 s and the
    skew breaks the next Gloo collective-context rendezvous (observed in
    tests/test_multihost_main.py). Params are replicated, so the pure-host
    npz writer loses nothing."""
    os.makedirs(path, exist_ok=True)
    try:
        if jax.process_count() > 1:
            raise RuntimeError("npz path for multi-host single-writer saves")
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "params"),
                   _to_numpy_tree(params), force=True)
        if opt_state is not None:
            ckptr.save(os.path.join(os.path.abspath(path), "opt_state"),
                       _to_numpy_tree(opt_state), force=True)
        ckptr.wait_until_finished()
    except Exception:
        leaves, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(params))
        np.savez(os.path.join(path, "params.npz"),
                 **{f"leaf_{i}": l for i, l in enumerate(leaves)})
        if opt_state is not None:
            oleaves, _ = jax.tree_util.tree_flatten(_to_numpy_tree(opt_state))
            np.savez(os.path.join(path, "opt_state.npz"),
                     **{f"leaf_{i}": l for i, l in enumerate(oleaves)})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"epoch": epoch, "history": history or [],
                   **(extra or {})}, f)


def restore_checkpoint(path: str, params_template, opt_state_template=None
                       ) -> Tuple[Any, Any, Dict]:
    """Restore (params, opt_state, meta); templates give the pytree structure."""
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.join(os.path.abspath(path), "params"),
                               _to_numpy_tree(params_template))
        opt_state = None
        if opt_state_template is not None and os.path.exists(
                os.path.join(path, "opt_state")):
            opt_state = ckptr.restore(
                os.path.join(os.path.abspath(path), "opt_state"),
                _to_numpy_tree(opt_state_template))
        return params, opt_state, meta
    except Exception:
        data = np.load(os.path.join(path, "params.npz"))
        leaves, treedef = jax.tree_util.tree_flatten(params_template)
        restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
        params = jax.tree_util.tree_unflatten(treedef, restored)
        opt_state = None
        opt_npz = os.path.join(path, "opt_state.npz")
        if opt_state_template is not None and os.path.exists(opt_npz):
            odata = np.load(opt_npz)
            oleaves, otreedef = jax.tree_util.tree_flatten(opt_state_template)
            opt_state = jax.tree_util.tree_unflatten(
                otreedef, [odata[f"leaf_{i}"] for i in range(len(oleaves))])
        return params, opt_state, meta


def restore_params_only(path: str, params_template):
    """Fine-tune warm start: weights only, fresh optimizer state."""
    params, _, _ = restore_checkpoint(path, params_template)
    return params
