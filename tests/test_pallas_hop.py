"""Pallas fused-hop kernel vs the XLA node-major hop (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mswe_gnn_tpu.ops.pallas_hop import fused_hop, supported


def xla_hop(out, src_tab, s_tab, dst_lo, with_gradient=True, upwind=False):
    n_dst = s_tab.shape[0]
    out_dst = jax.lax.dynamic_slice_in_dim(out, dst_lo, n_dst, axis=0)
    nb = jnp.take(out, src_tab, axis=0)
    act = jnp.maximum((nb.sum(-1) != 0).astype(out.dtype),
                      (out_dst.sum(-1) != 0).astype(out.dtype)[:, None])
    if with_gradient:
        diff = out_dst[:, None, :] - nb
        if upwind:
            diff = jnp.maximum(diff, 0.0)
        msg = diff * s_tab
    else:
        msg = s_tab * nb
    return (msg * act[..., None]).sum(1)


@pytest.mark.parametrize("with_gradient,upwind", [(True, False), (True, True),
                                                  (False, False)])
def test_fused_hop_matches_xla(rng, with_gradient, upwind):
    n, f, d = 600, 32, 8
    n_dst, lo = 512, 64
    out = rng.normal(size=(n, f)).astype(np.float32)
    out[rng.random(n) > 0.6] = 0.0  # dry nodes
    src_tab = rng.integers(0, n, (n_dst, d)).astype(np.int32)
    s_tab = rng.normal(size=(n_dst, d, f)).astype(np.float32)
    s_tab[rng.random((n_dst, d)) > 0.7] = 0.0  # masked slots

    want = np.asarray(xla_hop(jnp.asarray(out), jnp.asarray(src_tab),
                              jnp.asarray(s_tab), lo, with_gradient, upwind))
    got = np.asarray(fused_hop(jnp.asarray(out), jnp.asarray(src_tab),
                               jnp.asarray(s_tab), lo, with_gradient, upwind,
                               tile=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_supported_gate():
    assert supported(30000, 64, interpret=True)
    assert not supported(10_000_000, 64, interpret=True)
    assert not supported(100, 63, interpret=True)
    assert not supported(30000, 64)  # hardware path disabled (Mosaic gather)


def test_fused_hop_ragged_tile(rng):
    """n_dst not a multiple of the tile size."""
    n, f, d = 300, 16, 4
    n_dst, lo = 200, 50
    out = rng.normal(size=(n, f)).astype(np.float32)
    src_tab = rng.integers(0, n, (n_dst, d)).astype(np.int32)
    s_tab = rng.normal(size=(n_dst, d, f)).astype(np.float32)
    want = np.asarray(xla_hop(jnp.asarray(out), jnp.asarray(src_tab),
                              jnp.asarray(s_tab), lo))
    got = np.asarray(fused_hop(jnp.asarray(out), jnp.asarray(src_tab),
                               jnp.asarray(s_tab), lo, tile=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
