"""SWEGNN layer parity vs a from-scratch numpy oracle of the reference math
(reference models/gnn.py:387-445): per hop, compact the active edges, run the
edge MLP on the concatenated endpoint features, L2-normalize with NaN->0,
multiply by the hydraulic gradient, scatter-sum, apply the filter matrix.

The framework computes the flux once per layer (hop-invariant) and uses
masked-dense aggregation — values must match the reference's per-hop
recompute + compaction exactly (up to float reassociation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.models.activations import apply_activation
from mswe_gnn_tpu.models.swegnn import SWEGNNConfig, apply_swegnn, init_swegnn


def numpy_mlp(params, x, activation):
    for lin, act in zip(params["layers"], params["acts"]):
        x = x @ np.asarray(lin["w"])
        if "b" in lin:
            x = x + np.asarray(lin["b"])
        x = np.asarray(apply_activation(activation, act, jnp.asarray(x)))
    return x


def oracle_swegnn(params, cfg, x_s, x_d, src, dst, edge_attr):
    """Direct transcription of the documented reference semantics."""
    n = x_d.shape[0]
    if cfg.with_filter_matrix:
        out = x_d @ np.asarray(params["filters"][0]["w"])
    else:
        out = x_d.copy()
    for k in range(cfg.K):
        node_active = out.sum(1) != 0
        active = node_active[src] | node_active[dst]
        s_idx, d_idx = src[active], dst[active]
        feats = [x_s[s_idx], x_s[d_idx], x_d[s_idx], x_d[d_idx]]
        if cfg.edge_features > 0:
            feats.append(edge_attr[active])
        e_ij = np.concatenate(feats, axis=1)
        s_ij = numpy_mlp(params["edge_mlp"], e_ij, cfg.mlp_activation)
        if cfg.normalize:
            nrm = np.linalg.norm(s_ij, axis=1, keepdims=True)
            with np.errstate(invalid="ignore", divide="ignore"):
                s_ij = s_ij / nrm
            s_ij[~np.isfinite(s_ij)] = 0.0
        if cfg.with_gradient:
            grad = out[d_idx] - out[s_idx]
            if cfg.upwind_mode:
                grad = np.maximum(grad, 0.0)
            msg = grad * s_ij
        else:
            msg = s_ij * out[s_idx]
        agg = np.zeros((n, out.shape[1]), out.dtype)
        np.add.at(agg, d_idx, msg)
        if cfg.with_filter_matrix:
            agg = agg @ np.asarray(params["filters"][k + 1]["w"])
        out = out + agg
    return out


def make_problem(rng, n=20, e=60, s=4, d=6, fe=3, wet_fraction=0.5):
    x_s = rng.normal(size=(n, s)).astype(np.float32)
    x_d = rng.normal(size=(n, d)).astype(np.float32)
    # some dry nodes: zero dynamic features (wet-front mask must bite)
    dry = rng.random(n) > wet_fraction
    x_d[dry] = 0.0
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    ea = rng.normal(size=(e, fe)).astype(np.float32)
    return x_s, x_d, src, dst, ea


@pytest.mark.parametrize("normalize,with_filter,with_grad,upwind", [
    (True, True, True, False),
    (False, True, True, False),
    (True, False, True, False),
    (True, True, False, False),
    (True, True, True, True),
])
def test_swegnn_matches_oracle(rng, normalize, with_filter, with_grad, upwind):
    cfg = SWEGNNConfig(static_node_features=4, dynamic_node_features=6,
                       edge_features=3, K=3, normalize=normalize,
                       with_filter_matrix=with_filter, with_gradient=with_grad,
                       upwind_mode=upwind, mlp_layers=2, mlp_activation="prelu")
    params = init_swegnn(jax.random.PRNGKey(0), cfg)
    x_s, x_d, src, dst, ea = make_problem(rng)
    want = oracle_swegnn(params, cfg, x_s, x_d, src, dst, ea)
    got = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ea)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_swegnn_no_edge_features(rng):
    """The intra-scale (un-pooling) configuration: fe=0, K=1, no filter,
    no gradient (reference models/gnn.py:216-220)."""
    cfg = SWEGNNConfig(static_node_features=5, dynamic_node_features=5,
                       edge_features=0, K=1, normalize=True,
                       with_filter_matrix=False, with_gradient=False,
                       mlp_layers=2, mlp_activation="prelu")
    params = init_swegnn(jax.random.PRNGKey(1), cfg)
    x_s, x_d, src, dst, _ = make_problem(rng, s=5, d=5)
    want = oracle_swegnn(params, cfg, x_s, x_d, src, dst, None)
    got = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src), jnp.asarray(dst), None, dst_sorted=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_swegnn_padded_edges_are_noops(rng):
    """Appending masked padding edges must not change any output."""
    cfg = SWEGNNConfig(static_node_features=4, dynamic_node_features=6,
                       edge_features=3, K=2)
    params = init_swegnn(jax.random.PRNGKey(2), cfg)
    x_s, x_d, src, dst, ea = make_problem(rng)
    base = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ea),
        edge_mask=jnp.ones(len(src))))
    # pad with junk edges pointing at the last node, mask 0
    pad = 16
    src_p = np.concatenate([src, np.full(pad, len(x_s) - 1, np.int32)])
    dst_p = np.concatenate([dst, np.full(pad, len(x_s) - 1, np.int32)])
    ea_p = np.concatenate([ea, rng.normal(size=(pad, 3)).astype(np.float32)])
    mask = np.concatenate([np.ones(len(src)), np.zeros(pad)]).astype(np.float32)
    got = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(ea_p),
        edge_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-7)


def test_flat_hop_matches_per_slot():
    """flat_hop_threshold (one [Nd, D, F] gather per hop, for launch-bound
    small blocks) must match the per-slot ELL hop on a full MSGNN forward."""
    from mswe_gnn_tpu.models.msgnn import MSGNNConfig, apply_msgnn, init_msgnn
    from tests.test_models import make_samples

    samples, _ = make_samples()
    g = samples[1]
    kw = dict(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
              num_edge_features=g.edge_attr.shape[1], num_scales=3,
              hid_features=16, K=2, previous_t=2,
              learned_residuals=True, with_WL=True)
    cfg_a = MSGNNConfig(**kw)
    cfg_b = MSGNNConfig(flat_hop_threshold=10 ** 9, **kw)
    params = init_msgnn(jax.random.PRNGKey(3), cfg_a)
    a = np.asarray(apply_msgnn(params, cfg_a, g))
    b = np.asarray(apply_msgnn(params, cfg_b, g))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_swegnn_dst_range_restriction(rng):
    """Restricting aggregation to a static node range that contains all the
    edges must equal the unrestricted computation."""
    cfg = SWEGNNConfig(static_node_features=4, dynamic_node_features=6,
                       edge_features=3, K=2)
    params = init_swegnn(jax.random.PRNGKey(3), cfg)
    n = 24
    x_s, x_d, _, _, _ = make_problem(rng, n=n)
    lo, hi = 8, 20
    e = 40
    src = rng.integers(lo, hi, size=e).astype(np.int32)
    dst = np.sort(rng.integers(lo, hi, size=e).astype(np.int32))
    ea = rng.normal(size=(e, 3)).astype(np.float32)
    full = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ea)))
    ranged = np.asarray(apply_swegnn(
        params, cfg, jnp.asarray(x_s), jnp.asarray(x_d),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(ea),
        src_range=(lo, hi), dst_range=(lo, hi)))
    np.testing.assert_allclose(ranged, full, rtol=1e-5, atol=1e-6)
