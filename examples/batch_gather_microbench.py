"""Batched-hop gather microbench — the round-5 batching-vehicle data.

Round-4 root cause (results_repo/rollout_profile_r4.json): the concat-union
batch table outgrows the gather unit's VMEM staging sweet spot past ~92k rows
(batch 4), so the batch curve inverts at batch 8. This measures the three
candidate hop formulations at the real dk15 finest-scale shape (n=23168,
F=64, D=4 ELL slots, bf16):

OUTCOME (results_repo/batch_gather_microbench.json + ROADMAP r5): vmap
batching loses 2.3x at every batch; per-graph 'sliced' wins THIS bare
microbench at b=8 (+29%) but the advantage does not transfer to the real
rollout, where XLA fuses the gathers into the flux elementwise chain —
chunked hops measured at three granularities all lose to the fused
single-block hop (models/swegnn.py HOP_CHUNK_TARGET_ROWS comment). Kept as
the decision record and for re-probing other table-size regimes.

  concat   — one [b*n, F] state, D gathers of b*n rows     (current path)
  batched  — [b, n, F] state, D vmapped gathers (XLA batched gather)
  sliced   — [b, n, F] state, b*D unrolled per-graph gathers (static slices)

Each formulation runs the full hop body (gather, wet-front mask, gradient,
flux multiply, accumulate) inside an in-jit scan; the rate comes from the
difference between a long and a short scan so dispatch overhead cancels
(same methodology as bench.py:measure_gather_rate).

Run on the TPU:  python examples/batch_gather_microbench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("MB_N", "23168"))
F = int(os.environ.get("MB_F", "64"))
D = int(os.environ.get("MB_D", "4"))
DTYPE = jnp.bfloat16 if os.environ.get("MB_DTYPE", "bf16") == "bf16" else jnp.float32


def hop_body(out, src_slots, s_slots):
    """One SWEGNN hop on a [*, n, F]-or-[n, F] state (mirrors
    models/swegnn.py per-slot loop: gather, wet-front, gradient, flux)."""
    dst_act = (out.sum(axis=-1, keepdims=True) != 0).astype(out.dtype)
    agg = jnp.zeros_like(out)
    for d in range(len(src_slots)):
        nb = jnp.take(out, src_slots[d], axis=0)
        act = jnp.maximum((nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype), dst_act)
        agg = agg + (out - nb) * s_slots[d] * act
    return out + agg * 0.0009765625  # keep values bounded across reps


def make_concat(b, reps):
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(b * N, F)), DTYPE)
    # within-graph sources: local idx + graph offset
    srcs = [jnp.asarray((rng.integers(0, N, (b, N)) +
                         np.arange(b)[:, None] * N).reshape(-1), jnp.int32)
            for _ in range(D)]
    ss = [jnp.asarray(rng.normal(size=(b * N, F)), DTYPE) for _ in range(D)]

    @jax.jit
    def run(out, srcs, ss):
        def body(c, _):
            return hop_body(c, srcs, ss), None
        return jax.lax.scan(lambda c, x: body(c, x), out, None, length=reps)[0]
    return run, (out, srcs, ss)


def make_batched(b, reps):
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(b, N, F)), DTYPE)
    srcs = [jnp.asarray(rng.integers(0, N, (b, N)), jnp.int32) for _ in range(D)]
    ss = [jnp.asarray(rng.normal(size=(b, N, F)), DTYPE) for _ in range(D)]

    def hop(out):
        dst_act = (out.sum(axis=-1, keepdims=True) != 0).astype(out.dtype)
        agg = jnp.zeros_like(out)
        take = jax.vmap(lambda o, i: jnp.take(o, i, axis=0))
        for d in range(D):
            nb = take(out, srcs[d])
            act = jnp.maximum((nb.sum(axis=-1, keepdims=True) != 0).astype(out.dtype), dst_act)
            agg = agg + (out - nb) * ss[d] * act
        return out + agg * 0.0009765625

    @jax.jit
    def run(out):
        return jax.lax.scan(lambda c, _: (hop(c), None), out, None, length=reps)[0]
    return run, (out,)


def make_sliced(b, reps):
    rng = np.random.default_rng(0)
    out = jnp.asarray(rng.normal(size=(b, N, F)), DTYPE)
    srcs = [jnp.asarray(rng.integers(0, N, (b, N)), jnp.int32) for _ in range(D)]
    ss = [jnp.asarray(rng.normal(size=(b, N, F)), DTYPE) for _ in range(D)]

    def hop(out):
        dst_act = (out.sum(axis=-1, keepdims=True) != 0).astype(out.dtype)
        parts = []
        for g in range(b):
            o = out[g]
            agg = jnp.zeros_like(o)
            for d in range(D):
                nb = jnp.take(o, srcs[d][g], axis=0)
                act = jnp.maximum((nb.sum(axis=-1, keepdims=True) != 0).astype(o.dtype),
                                  dst_act[g])
                agg = agg + (o - nb) * ss[d][g] * act
            parts.append(o + agg * 0.0009765625)
        return jnp.stack(parts, 0)

    @jax.jit
    def run(out):
        return jax.lax.scan(lambda c, _: (hop(c), None), out, None, length=reps)[0]
    return run, (out,)


def main():
    from mswe_gnn_tpu.cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"devices: {jax.devices()}  n={N} F={F} D={D} dtype={DTYPE.__name__}",
          flush=True)
    results = {}
    reps = (20, 120)
    for b in (1, 4, 8, 16, 20):
        for name, maker in (("concat", make_concat), ("batched", make_batched),
                            ("sliced", make_sliced)):
            if name == "sliced" and b != 8:
                continue  # unroll cost explodes; only relevant if it wins at 8
            mk = lambda r: maker(b, r)
            (lo_run, lo_args) = mk(reps[0])
            (hi_run, hi_args) = mk(reps[1])
            jax.block_until_ready(lo_run(*lo_args))
            jax.block_until_ready(hi_run(*hi_args))
            t_lo = t_hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter(); jax.block_until_ready(lo_run(*lo_args))
                t_lo = min(t_lo, time.perf_counter() - t0)
                t0 = time.perf_counter(); jax.block_until_ready(hi_run(*hi_args))
                t_hi = min(t_hi, time.perf_counter() - t0)
            dt = t_hi - t_lo
            hops = reps[1] - reps[0]
            rows = b * N * D * hops
            rate = rows / dt / 1e9
            us_per_hop_per_graph = dt / hops / b * 1e6
            results[f"{name}_b{b}"] = {
                "g_rows_per_sec": round(rate, 4),
                "us_per_hop_per_graph": round(us_per_hop_per_graph, 2)}
            print(f"b={b:2d} {name:8s}: {rate:7.3f} G rows/s   "
                  f"{us_per_hop_per_graph:8.2f} us/hop/graph", flush=True)
    out = {"n": N, "feat": F, "slots": D, "dtype": DTYPE.__name__,
           "results": results}
    path = os.environ.get("MB_OUT", "results_repo/batch_gather_microbench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
