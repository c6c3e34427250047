"""Baseline conv layers (Cheb / TAG / GAT) vs dense numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.models.convs import (
    ChebConfig, GATConfig, TAGConfig,
    apply_cheb, apply_gat, apply_tag,
    init_cheb, init_gat, init_tag,
)


def make_graph(rng, n=20, e=70):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    # dedupe to keep the dense adjacency well-defined
    seen = set()
    keep = []
    for i, (s, d) in enumerate(zip(src, dst)):
        if (s, d) not in seen and s != d:
            seen.add((s, d))
            keep.append(i)
    src, dst = src[keep], dst[keep]
    x = rng.normal(size=(n, 6)).astype(np.float32)
    return x, src.astype(np.int32), dst.astype(np.int32)


def dense_norm_adj(src, dst, n):
    a = np.zeros((n, n))
    a[dst, src] = 1.0  # y = A x aggregates src -> dst
    deg = a.sum(1)  # in-degree per dst == out-contributions... use both-sided
    # sym normalization with in-degree on both endpoints (matches impl: deg over dst)
    dinv = np.where(deg > 0, 1 / np.sqrt(deg), 0)
    return dinv[:, None] * a * dinv[None, :]


def test_cheb_matches_dense(rng):
    x, src, dst = make_graph(rng)
    n = x.shape[0]
    cfg = ChebConfig(6, 4, K=3)
    params = init_cheb(jax.random.PRNGKey(0), cfg)
    got = np.asarray(apply_cheb(params, cfg, jnp.asarray(x), jnp.asarray(src),
                                jnp.asarray(dst), jnp.ones(len(src))))
    A = dense_norm_adj(src, dst, n)
    L_hat = -A  # lambda_max=2 scaling of the normalized Laplacian
    t0, t1 = x, L_hat @ x
    ws = [np.asarray(l["w"]) for l in params["lins"]]
    want = t0 @ ws[0] + t1 @ ws[1] + (2 * L_hat @ t1 - t0) @ ws[2]
    want = want + np.asarray(params["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_tag_matches_dense(rng):
    x, src, dst = make_graph(rng)
    n = x.shape[0]
    cfg = TAGConfig(6, 4, K=2)
    params = init_tag(jax.random.PRNGKey(1), cfg)
    got = np.asarray(apply_tag(params, cfg, jnp.asarray(x), jnp.asarray(src),
                               jnp.asarray(dst), jnp.ones(len(src))))
    A = dense_norm_adj(src, dst, n)
    ws = [np.asarray(l["w"]) for l in params["lins"]]
    want = x @ ws[0] + (A @ x) @ ws[1] + (A @ A @ x) @ ws[2] + np.asarray(params["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gat_matches_dense(rng):
    x, src, dst = make_graph(rng)
    n = x.shape[0]
    cfg = GATConfig(6, 4)
    params = init_gat(jax.random.PRNGKey(2), cfg)
    got = np.asarray(apply_gat(params, cfg, jnp.asarray(x), jnp.asarray(src),
                               jnp.asarray(dst), jnp.ones(len(src))))
    h = x @ np.asarray(params["lin"]["w"])
    alpha = h @ np.asarray(params["att_src"])
    beta = h @ np.asarray(params["att_dst"])
    e = alpha[src] + beta[dst]
    e = np.where(e >= 0, e, 0.2 * e)  # leaky relu
    want = np.zeros((n, 4))
    for i in range(n):
        sel = np.where(dst == i)[0]
        if len(sel) == 0:
            continue
        w = np.exp(e[sel] - e[sel].max())
        w = w / w.sum()
        want[i] = (h[src[sel]] * w[:, None]).sum(0)
    want = want + np.asarray(params["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
