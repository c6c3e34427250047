"""On-device microbench: banded MXU hop kernel vs the XLA slot-gather hop.

Validates the round-2 prediction (ops/band_hop.py header): at F=64 the
one-hot matmul pads the MXU's 128-lane output and the kernel only reaches
parity with XLA's fused gather; at F=128 the matmul is full-width and the
kernel should win. Also times the backward pass through the new custom VJP.

Timing uses >=200 in-jit lax.scan reps with a chained data dependence so the
~25 ms remote-platform dispatch is amortized (verify-skill round-2 note).

Run (TPU):  python examples/band_microbench.py
Writes results_repo/band_hop_microbench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mswe_gnn_tpu.cache import enable_compilation_cache
from mswe_gnn_tpu.ops.band_hop import band_hop, plan_band


def banded_problem(n, d_max, bw, feat, seed=0, dtype=jnp.bfloat16):
    """dk15-class band profile: sources within +-bw rows (RCM/grid row-major
    ordering of the bench mesh gives per-slot bands ~ the grid row width)."""
    rng = np.random.default_rng(seed)
    src = np.clip(np.arange(n)[:, None]
                  + rng.integers(-bw, bw + 1, (n, d_max)), 0, n - 1)
    mask = (rng.random((n, d_max)) < 0.9).astype(np.float32)
    state = np.abs(rng.normal(size=(n, feat))).astype(np.float32)
    state[rng.random(n) < 0.3] = 0.0
    s_tab = (rng.normal(size=(n, d_max * feat)).astype(np.float32)
             * np.repeat(mask, feat, axis=1))
    plan = plan_band(src, mask, n)
    assert plan is not None, "bench problem must be band-limited"
    return (jnp.asarray(state, dtype), jnp.asarray(s_tab, dtype), plan, src,
            mask)


def timed(fn, *args, reps=3):
    float(fn(*args))                          # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0)
    return best


def bench_feat(feat: int, n: int = 23168, d_max: int = 4, bw: int = 160,
               scan_reps: int = 200):
    state, s_tab, plan, src, mask = banded_problem(n, d_max, bw, feat)
    src_j = jnp.asarray(np.where(mask > 0, src, np.arange(n)[:, None]),
                        jnp.int32)

    def xla_hop(st, s):
        """The production per-slot gather hop (models/swegnn.py agg path)."""
        dst_act = (st.sum(axis=1, keepdims=True) != 0)
        acc = jnp.zeros((n, feat), jnp.float32)
        for d in range(d_max):
            nb = jnp.take(st, src_j[:, d], axis=0)
            act = jnp.logical_or(nb.sum(axis=1, keepdims=True) != 0, dst_act)
            msg = (st - nb) * s[:, d * feat:(d + 1) * feat]
            acc = acc + jnp.where(act, msg, 0.0).astype(jnp.float32)
        return acc.astype(st.dtype)

    def pallas_hop(st, s):
        return band_hop(st, s, plan.idx_rel, plan.win, ws=plan.ws, we=plan.we,
                        with_gradient=True, interpret=False)

    def scan_reps_of(hop):
        @jax.jit
        def run(st, s):
            def body(c, _):
                r = hop(st + c, s)
                return r.astype(jnp.float32).sum() * 1e-30, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=scan_reps)
            return out
        return run

    def grad_reps_of(hop):
        def loss(st, s, c):
            return hop(st + c, s).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(st, s):
            def body(c, _):
                gs, gt = g(st, s, c)
                return (gs.astype(jnp.float32).sum()
                        + gt.astype(jnp.float32).sum()) * 1e-30, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=max(scan_reps // 4, 25))
            return out
        return run

    out = {"feat": feat, "n": n, "d_max": d_max,
           "ws": list(plan.ws), "we": plan.we}
    t_x = timed(scan_reps_of(xla_hop), state, s_tab) / scan_reps
    t_p = timed(scan_reps_of(pallas_hop), state, s_tab) / scan_reps
    out["xla_us_per_hop"] = round(t_x * 1e6, 1)
    out["pallas_us_per_hop"] = round(t_p * 1e6, 1)
    out["fwd_speedup_pallas_vs_xla"] = round(t_x / t_p, 3)
    gr = max(scan_reps // 4, 25)
    t_xg = timed(grad_reps_of(xla_hop), state, s_tab) / gr
    t_pg = timed(grad_reps_of(pallas_hop), state, s_tab) / gr
    out["xla_us_per_grad"] = round(t_xg * 1e6, 1)
    out["pallas_us_per_grad"] = round(t_pg * 1e6, 1)
    out["grad_speedup_pallas_vs_xla"] = round(t_xg / t_pg, 3)

    # hardware correctness spot-check (fwd bit-exactness vs the gather hop)
    a = np.asarray(pallas_hop(state, s_tab), np.float32)
    b = np.asarray(xla_hop(state, s_tab), np.float32)
    out["fwd_max_abs_err_vs_xla"] = float(np.abs(a - b).max())
    print(json.dumps(out), flush=True)
    return out


def main():
    enable_compilation_cache()
    print(f"platform: {jax.devices()[0].platform} "
          f"{jax.devices()[0].device_kind}", file=sys.stderr, flush=True)
    rows = [bench_feat(64), bench_feat(128)]
    os.makedirs("results_repo", exist_ok=True)
    with open("results_repo/band_hop_microbench.json", "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
