"""Pallas TPU kernel: fused SWEGNN hop (ELL gather + flux product + reduce).

One hop of the SWEGNN node update (models/swegnn.py node-major path):

    agg[n] = sum_d  act(n,d) * (out[n] - out[src_tab[n,d]]) * s_tab[n,d]

The XLA path materializes the [N, D, F] neighbor and message tensors in HBM
(3 x ~50 MB of traffic per hop at dk15 scale). This kernel keeps the full
``out`` array resident in VMEM (N*F*4 bytes — 7.7 MB for the dk15-class mesh,
well under the ~16 MB budget), gathers neighbor rows from VMEM, and writes
only the [tile, F] aggregate back — the message tensor never exists in HBM.

The K-hop loop stays outside (the filter matmul between hops is an MXU op XLA
handles well); ``fused_hop`` is one pallas_call per hop.

STATUS: interpret-mode verified; disabled on hardware. Mosaic's gather
lowering currently only supports same-shape gathers
(``indices.shape == input.shape + (1,)`` in ``_gather_lowering_rule``), so an
arbitrary [tile, F] row-gather from the [N, F] VMEM-resident array cannot be
expressed; per-row async-DMA gathering (~180k row DMAs/hop at dk15 scale)
would be slower than XLA's HBM gather, which measures ~360 GB/s effective on
v5e. ``supported()`` therefore returns False outside interpret mode and the
node-major XLA path (models/swegnn.py) remains the production hop. Revisit
when Mosaic grows a general dynamic-gather.

SUPERSEDED: ``ops/band_hop.py`` is the working hardware kernel — it routes
the gather through the MXU as a banded one-hot matmul instead of needing
Mosaic's (unsupported) dynamic gather, is hardware-validated bit-exact, and
has a custom VJP for training. This module is kept as the documented
negative result that motivated that design; do not count it as a working
kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident `out` array (leave room for tiles + scratch)
_VMEM_OUT_BYTES = 10 * 1024 * 1024


def supported(num_nodes: int, feat: int, dtype=jnp.float32,
              interpret: bool = False) -> bool:
    if not interpret:
        return False  # Mosaic gather limitation — see module docstring
    itemsize = jnp.dtype(dtype).itemsize
    return num_nodes * feat * itemsize <= _VMEM_OUT_BYTES and feat % 8 == 0


def _hop_kernel(out_ref, src_tab_ref, s_tab_ref, out_dst_ref, agg_ref, *,
                with_gradient: bool, upwind: bool):
    """One node tile: gather D neighbor blocks from the VMEM-resident out.

    out_ref     [N, F]      full array (VMEM)
    src_tab_ref [T, D]      neighbor node ids for this tile
    s_tab_ref   [T, D*F]    flux table for this tile (D blocks of F)
    out_dst_ref [T, F]      this tile's own rows
    agg_ref     [T, F]      output aggregate
    """
    tile = out_dst_ref.shape[0]
    d_max = src_tab_ref.shape[1]
    out_dst = out_dst_ref[:]
    dst_active = (jnp.sum(out_dst, axis=1, keepdims=True) != 0).astype(out_dst.dtype)

    acc = jnp.zeros_like(out_dst)
    feat = out_dst.shape[1]
    out_full = out_ref[:]
    for d in range(d_max):  # D is small (4-8); unrolled
        idx = src_tab_ref[:, d]
        # VMEM row gather via take_along_axis (Mosaic dynamic-gather pattern)
        idx2 = jax.lax.broadcast_in_dim(idx, (tile, feat), (0,))
        nb = jnp.take_along_axis(out_full, idx2, axis=0)         # [T, F]
        s = s_tab_ref[:, d * out_dst.shape[1]:(d + 1) * out_dst.shape[1]]
        src_active = (jnp.sum(nb, axis=1, keepdims=True) != 0).astype(out_dst.dtype)
        act = jnp.maximum(src_active, dst_active)
        if with_gradient:
            diff = out_dst - nb
            if upwind:
                diff = jnp.maximum(diff, 0.0)
            acc = acc + diff * s * act
        else:
            acc = acc + nb * s * act
    agg_ref[:] = acc


def fused_hop(
    out: jax.Array,        # [N, F]
    src_tab: jax.Array,    # [Nd, D] global node ids
    s_tab: jax.Array,      # [Nd, D, F] flux (already masked)
    dst_lo: int,
    with_gradient: bool = True,
    upwind: bool = False,
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One fused hop -> aggregate [Nd, F] for the dst range starting at dst_lo."""
    n_dst, d_max, feat = s_tab.shape
    n_dst_pad = -(-n_dst // tile) * tile
    if n_dst_pad != n_dst:
        src_tab = jnp.pad(src_tab, ((0, n_dst_pad - n_dst), (0, 0)))
        s_tab = jnp.pad(s_tab, ((0, n_dst_pad - n_dst), (0, 0), (0, 0)))
    s_tab2 = s_tab.reshape(n_dst_pad, d_max * feat)
    out_dst = jax.lax.dynamic_slice_in_dim(out, dst_lo, n_dst, axis=0)
    if n_dst_pad != n_dst:
        out_dst = jnp.pad(out_dst, ((0, n_dst_pad - n_dst), (0, 0)))

    kernel = functools.partial(_hop_kernel, with_gradient=with_gradient,
                               upwind=upwind)
    agg = pl.pallas_call(
        kernel,
        grid=(n_dst_pad // tile,),
        in_specs=[
            pl.BlockSpec(out.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_max), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_max * feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, feat), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, feat), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_dst_pad, feat), out.dtype),
        interpret=interpret,
    )(out, src_tab, s_tab2, out_dst)
    return agg[:n_dst]
