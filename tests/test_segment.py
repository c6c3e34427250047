import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.ops.segment import (
    segment_max, segment_mean, segment_sum, sort_edges_by_dst,
)


def test_segment_sum_matches_numpy(rng):
    n, e, f = 13, 40, 5
    data = rng.normal(size=(e, f)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    want = np.zeros((n, f), np.float32)
    np.add.at(want, ids, data)
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_segment_mean_empty_segments_zero(rng):
    n, e, f = 10, 20, 3
    data = rng.normal(size=(e, f)).astype(np.float32)
    ids = rng.integers(0, 5, size=e)  # segments 5..9 stay empty
    got = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), n))
    assert np.all(got[5:] == 0)
    for s in range(5):
        sel = data[ids == s]
        np.testing.assert_allclose(got[s], sel.mean(0), rtol=1e-5, atol=1e-6)


def test_segment_mean_weights_exclude_padding(rng):
    n, e, f = 4, 12, 2
    data = rng.normal(size=(e, f)).astype(np.float32)
    ids = rng.integers(0, n, size=e)
    w = (rng.random(e) > 0.4).astype(np.float32)
    got = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), n,
                                  weights=jnp.asarray(w)))
    for s in range(n):
        sel = data[(ids == s) & (w > 0)]
        want = sel.mean(0) if len(sel) else np.zeros(f)
        np.testing.assert_allclose(got[s], want, rtol=1e-5, atol=1e-6)


def test_segment_max(rng):
    n, e, f = 6, 30, 4
    data = rng.normal(size=(e, f)).astype(np.float32)
    ids = rng.integers(0, 4, size=e)
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(ids), n))
    assert np.all(got[4:] == 0)
    for s in range(4):
        np.testing.assert_allclose(got[s], data[ids == s].max(0), rtol=1e-6)


def test_sort_edges_by_dst(rng):
    ei = rng.integers(0, 9, size=(2, 25))
    attr = rng.normal(size=(25, 3))
    out, attr_s, order = sort_edges_by_dst(ei, attr)
    assert np.all(np.diff(out[1]) >= 0)
    np.testing.assert_array_equal(out, ei[:, order])
    np.testing.assert_array_equal(attr_s, attr[order])
