"""Independent numpy oracle of the full MSGNN forward pass.

Follows the reference semantics literally (reference models/gnn.py:267-350):
runtime ptr slicing on unpadded arrays, scale-mask multiplies, scatter-mean
pooling that replaces the whole feature array, compacted active-edge SWEGNN
hops (via tests.test_swegnn.oracle_swegnn). Used to cross-check the padded
static-slice JAX implementation, including with imported reference weights.
"""
import numpy as np

from mswe_gnn_tpu.models.msgnn import MSGNNConfig
from tests.test_swegnn import numpy_mlp, oracle_swegnn


def scatter_mean_full(src_vals, index, size):
    out = np.zeros((size, src_vals.shape[1]), src_vals.dtype)
    cnt = np.zeros(size)
    np.add.at(out, index, src_vals)
    np.add.at(cnt, index, 1.0)
    nz = cnt > 0
    out[nz] = out[nz] / cnt[nz, None]
    out[~nz] = 0.0
    return out


def apply_act(name, x):
    if name == "tanh":
        return np.tanh(x)
    if name == "relu":
        return np.maximum(x, 0)
    if name is None:
        return x
    raise NotImplementedError(name)


def oracle_msgnn_forward(params, cfg: MSGNNConfig, x, edge_index, edge_attr,
                         node_ptr, edge_ptr, intra_edge_index, intra_edge_ptr):
    """x [N, S + 2*previous_t] raw (unpadded); indices in raw numbering."""
    L = cfg.num_scales
    N = x.shape[0]
    mask = np.zeros(N, dtype=int)
    for i in range(L):
        mask[node_ptr[i]: node_ptr[i + 1]] = i

    if cfg.edge_mlp:
        edge_attr = numpy_mlp(params["edge_encoder"], edge_attr, cfg.mlp_activation)

    x0 = x
    n_s = cfg.static_node_features - int(cfg.with_WL)
    x_s, x_d = x[:, :n_s], x[:, n_s:]
    if cfg.with_WL:
        wl = x_s[:, -1] + x_d[:, -cfg.out_dim]
        x_s = np.concatenate([x_s, wl[:, None]], 1)
    x_s = numpy_mlp(params["static_node_encoder"], x_s, cfg.mlp_activation)
    x_d = numpy_mlp(params["dynamic_node_encoder"], x_d, cfg.mlp_activation)

    x_down = np.zeros_like(x_d)
    x_up = np.zeros_like(x_d)
    ks = cfg.k_schedule

    def edges(i):
        sl = slice(edge_ptr[i], edge_ptr[i + 1])
        return edge_index[0, sl], edge_index[1, sl], edge_attr[sl]

    for i in range(L - 1):
        src, dst, ea = edges(i)
        x_d = oracle_swegnn(params["gnn_processor"][i], cfg.processor_cfg(ks[i]),
                            x_s, x_d, src, dst, ea)
        x_down = x_down + x_d * (mask == i)[:, None]
        sl = slice(intra_edge_ptr[i], intra_edge_ptr[i + 1])
        coarse, fine = intra_edge_index[:, sl]
        x_d = scatter_mean_full(x_d[fine], coarse, N)
    x_down = x_down + x_d

    for i in range(L):
        gnn_id = L - 1 + i
        scale = L - 1 - i
        src, dst, ea = edges(scale)
        x_d = oracle_swegnn(params["gnn_processor"][gnn_id],
                            cfg.processor_cfg(ks[gnn_id]), x_s, x_d, src, dst, ea)
        x_up = x_up + x_d * (mask == scale)[:, None]
        if i < L - 1:
            sl = slice(intra_edge_ptr[scale - 1], intra_edge_ptr[scale])
            ie = intra_edge_index[:, sl]
            x_d = oracle_swegnn(params["intra_scale_gnn"][i], cfg.intra_cfg(),
                                x_s, x_d, ie[0], ie[1], None)
            if cfg.skip_connections:
                x_d = x_d + x_down * (mask == scale - 1)[:, None]

    h = apply_act(cfg.gnn_activation, x_up)
    out = numpy_mlp(params["node_decoder"], h, cfg.mlp_activation)

    # residual + relu + small-WD masking (reference models/models.py:50-91)
    if cfg.learned_residuals is True:
        p = cfg.previous_t
        hist = x0[:, -p * 2:].reshape(N, p, 2)
        rw = np.asarray(params["residual_weights"])[:, 0]
        out = out + np.einsum("npv,p->nv", hist, rw)
    elif cfg.learned_residuals is False:
        out = out + x0[:, -2:]
    out = np.maximum(out, 0)
    wd = out[:, 0] * (np.abs(out[:, 0]) > 0.0001)
    v = out[:, 1] * (wd != 0)
    return np.stack([wd, v], 1)
