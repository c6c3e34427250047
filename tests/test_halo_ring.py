"""Boundary-only ring halo exchange vs dense aggregation."""
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.ops.segment import segment_sum
from mswe_gnn_tpu.parallel.halo import (
    build_ring_halo_plan, make_ring_halo_aggregate, remap_sources_to_halo,
)
from mswe_gnn_tpu.parallel.sharding import make_mesh


def ring_graph_edges(n, reach=2, rng=None):
    """1D-ish locality graph: edges within +-reach (wraps excluded)."""
    src, dst = [], []
    for i in range(n):
        for d in range(1, reach + 1):
            if i + d < n:
                src += [i, i + d]
                dst += [i + d, i]
    return np.asarray([src, dst])


def test_ring_halo_matches_dense(rng):
    n, f, parts = 64, 16, 4
    ei = ring_graph_edges(n, reach=2)
    plan = build_ring_halo_plan(ei, n, parts)
    assert plan is not None
    src_l, dst_l, emask = remap_sources_to_halo(ei, plan, parts)

    x = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=ei.shape[1]).astype(np.float32)
    want = np.asarray(segment_sum(jnp.asarray(x)[ei[0]] * jnp.asarray(w)[:, None],
                                  jnp.asarray(ei[1]), n))

    # per-part padded weights aligned with the remapped edges
    owner = ei[1] // plan["block"]
    emax = src_l.shape[1]
    wp = np.zeros((parts, emax), np.float32)
    for p in range(parts):
        sel = np.where(owner == p)[0]
        wp[p, :len(sel)] = w[sel]

    mesh = make_mesh(2, 4)
    agg = make_ring_halo_aggregate(mesh, plan["halo"])
    got = np.asarray(agg(jnp.asarray(x), jnp.asarray(plan["send_next"]),
                         jnp.asarray(plan["send_prev"]), jnp.asarray(src_l),
                         jnp.asarray(dst_l), jnp.asarray(wp * emask)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_plan_rejects_nonlocal_graphs(rng):
    """Random (non-local) graphs violate the ring assumption -> None."""
    n, parts = 64, 4
    src = rng.integers(0, n, 200)
    dst = rng.integers(0, n, 200)
    plan = build_ring_halo_plan(np.stack([src, dst]), n, parts)
    assert plan is None
