"""prepare_graph: the hoisted loop-invariant ELL cache must change nothing
numerically — same ops, computed once outside the rollout scan."""
import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.models import prepare_graph
from mswe_gnn_tpu.models.msgnn import apply_msgnn
from mswe_gnn_tpu.training.train import TrainerOptions, pushforward_loss
from tests.test_models import make_samples
from tests.test_rollout import make_model


def test_cached_msgnn_forward_is_exact():
    samples, _ = make_samples()
    g = samples[1]
    cfg, params = make_model(g, K=3, hid=16)
    base = np.asarray(apply_msgnn(params, cfg, g))
    gp = prepare_graph(params, cfg, g)
    assert gp.ell_cache is not None
    cached = np.asarray(apply_msgnn(params, cfg, gp))
    np.testing.assert_array_equal(base, cached)
    # idempotent
    assert prepare_graph(params, cfg, gp) is gp


def test_cached_forward_with_flat_hop():
    """The prepared (ell_cache) path must agree with the per-slot hop when
    flat_hop_threshold routes small blocks through the flat gather."""
    import dataclasses

    samples, _ = make_samples()
    g = samples[1]
    cfg, params = make_model(g, K=3, hid=16)
    cfg_flat = dataclasses.replace(cfg, flat_hop_threshold=10 ** 9)
    base = np.asarray(apply_msgnn(params, cfg, g))
    gp = prepare_graph(params, cfg_flat, g)
    flat_cached = np.asarray(apply_msgnn(params, cfg_flat, gp))
    np.testing.assert_allclose(base, flat_cached, rtol=2e-5, atol=2e-6)


def test_cached_gnn_forward_is_exact():
    from mswe_gnn_tpu.models.gnn import GNNConfig, apply_gnn, init_gnn

    samples, _ = make_samples(num_scales=1)
    g = samples[0]
    cfg = GNNConfig(num_node_features=g.x_static.shape[1] + g.x_dynamic.shape[1],
                    num_edge_features=g.edge_attr.shape[1],
                    hid_features=8, K=2, previous_t=2, n_gnn_layers=2,
                    learned_residuals=True, with_WL=True)
    params = init_gnn(jax.random.PRNGKey(0), cfg)
    base = np.asarray(apply_gnn(params, cfg, g))
    gp = prepare_graph(params, cfg, g)
    assert gp.ell_cache is not None
    cached = np.asarray(apply_gnn(params, cfg, gp))
    np.testing.assert_array_equal(base, cached)


def test_gradients_flow_through_cache():
    """The edge encoder is used only inside prepare_graph on the cached path;
    its gradient must survive the hoist."""
    samples, _ = make_samples(rollout=2)
    g = samples[0]
    cfg, params = make_model(g, K=1, hid=8)
    opts = TrainerOptions()
    loss, grads = jax.value_and_grad(
        lambda p: pushforward_loss(apply_msgnn, p, cfg, g, 2, opts, True))(params)
    assert np.isfinite(float(loss))
    ge = grads["edge_encoder"]
    assert any(float(jnp.abs(x).max()) > 0
               for x in jax.tree_util.tree_leaves(ge))
