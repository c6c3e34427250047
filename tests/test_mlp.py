"""MLP parity vs a torch oracle built from the reference recipe
(Linear[-LayerNorm][-Dropout]-activation stacks, reference models/models.py:121-146)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from mswe_gnn_tpu.models.mlp import apply_mlp, init_mlp, mlp_sizes


def torch_mlp_from_params(params, activation, bias):
    layers = []
    for lin in params["layers"]:
        w = np.asarray(lin["w"])
        tl = torch.nn.Linear(w.shape[0], w.shape[1], bias=bias)
        with torch.no_grad():
            tl.weight.copy_(torch.tensor(w.T))
            if bias:
                tl.bias.copy_(torch.tensor(np.asarray(lin["b"])))
        layers.append(tl)
        if activation == "prelu":
            act = torch.nn.PReLU()
            with torch.no_grad():
                act.weight.fill_(0.25)
            layers.append(act)
        elif activation == "tanh":
            layers.append(torch.nn.Tanh())
        elif activation == "relu":
            layers.append(torch.nn.ReLU())
    return torch.nn.Sequential(*layers)


def test_mlp_sizes():
    assert mlp_sizes(5, 2, 16, 1) == [(5, 2)]
    assert mlp_sizes(5, 2, 16, 3) == [(5, 16), (16, 16), (16, 2)]


def test_mlp_matches_torch(rng):
    for act in ["prelu", "tanh", "relu"]:
        for n_layers, bias in [(1, True), (2, False), (3, True)]:
            params = init_mlp(jax.random.PRNGKey(0), 7, 4, 16,
                              n_layers=n_layers, bias=bias, activation=act)
            x = rng.normal(size=(11, 7)).astype(np.float32)
            got = np.asarray(apply_mlp(params, jnp.asarray(x), activation=act))
            oracle = torch_mlp_from_params(params, act, bias)
            want = oracle(torch.tensor(x)).detach().numpy()
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_prelu_param_used():
    params = init_mlp(jax.random.PRNGKey(1), 3, 3, 8, n_layers=1,
                      bias=False, activation="prelu")
    params["acts"][0]["alpha"] = jnp.asarray([0.0])
    x = jnp.asarray(-np.ones((2, 3), np.float32) * 100)
    out = apply_mlp(params, x, activation="prelu")
    assert np.all(np.asarray(out) >= 0)
