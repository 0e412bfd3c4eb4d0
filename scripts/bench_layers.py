"""On-chip throughput of the stochastic and Lyapunov drivers (VERDICT r3 #7).

Prints one JSON line per measurement, BENCH_NOTES-ready. All timings use
the MARGINAL-YEARS scheme settled in round 3 (BENCH_NOTES "equilibrate
A/B"): two calls differing ONLY in `years`, same dispatch chunking, so the
per-call fixed costs (terminal claim, compile, result assembly) cancel and
the quotient is steady-state model-yr/day. Keep the host idle while this
runs (concurrent host work inflates dispatch-path timings ~15%, CLAUDE.md).

Run (background, let it exit — never timeout-kill the TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_layers.py
Knobs: EBM_BENCH_K (default 8192), EBM_BENCH_SCAN_K (default 8192).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax  # noqa: E402

try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import energybalancemodel_jl_tpu as ebm  # noqa: E402

BASELINE = 2.2e4  # reference model-yr/day (BASELINE.md)


def _attractors(st, par, F, dtype):
    warm = ebm.equilibrate("MIZ", st, F + 15.0, par, ebm.zeros_init(st),
                           max_years=40, tol=0.0, dtype=dtype)
    cold = ebm.equilibrate("MIZ", st, F - 25.0, par, ebm.zeros_init(st),
                           max_years=40, tol=0.0, dtype=dtype)
    return warm, cold


def bench_transitions(engine, K, y1, y2, ypd):
    st = ebm.SpaceTime.sin(180, 2000, 1)   # canonical MIZ benchmark grid
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    F = 0.0
    warm, cold = _attractors(st, par, F, "float32")
    kw = dict(sigma=4.0, tau=0.05, K=K, seed=7, dtype="float32",
              engine=engine, years_per_dispatch=ypd)

    def run(years):
        t0 = time.time()
        r = ebm.transitions("MIZ", st, F, par, warm, cold, years=years,
                            **kw)
        np.asarray(r.areas)  # sync (block_until_ready is a no-op on axon)
        return time.time() - t0

    run(y1)                      # claim + compile warmup
    t1, t2 = run(y1), run(y2)
    sec_per_year = (t2 - t1) / (y2 - y1)
    myd = K * 86400.0 / sec_per_year
    print(json.dumps({
        "metric": f"transitions_{engine}", "value": myd,
        "unit": "model-yr/day", "vs_baseline": myd / BASELINE,
        "K": K, "marginal_s_per_year": sec_per_year,
        "t_y1": t1, "t_y2": t2, "y1": y1, "y2": y2, "ypd": ypd,
    }), flush=True)
    return myd


def bench_lyapunov(n_modes, years1, years2, ypd):
    st = ebm.SpaceTime.sin(180, 2000, 1)
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    eq = ebm.equilibrate("MIZ", st, 0.0, par, ebm.zeros_init(st),
                         max_years=40, tol=0.0, dtype="float32")
    kw = dict(n_modes=n_modes, dtype="float32", years_per_dispatch=ypd)

    def run(years):
        t0 = time.time()
        r = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                         years=years, **kw)
        np.asarray(r.history)
        return time.time() - t0

    run(years1)
    t1, t2 = run(years1), run(years2)
    sec_per_year = (t2 - t1) / (years2 - years1)
    yps = 1.0 / sec_per_year
    print(json.dumps({
        "metric": f"lyapunov_modes{n_modes}", "value": yps,
        "unit": "years/s", "marginal_s_per_year": sec_per_year,
        "year_equivalents_per_year": 1 + n_modes,
        "t_y1": t1, "t_y2": t2, "y1": years1, "y2": years2, "ypd": ypd,
    }), flush=True)
    return yps


def main():
    print(f"devices: {jax.devices()}", flush=True)
    K = int(os.environ.get("EBM_BENCH_K", "8192"))
    scan_K = int(os.environ.get("EBM_BENCH_SCAN_K", "8192"))

    # claim the device with a trivial dispatch before timing anything
    # (terminal-claim latency, BENCH_NOTES "Cold-start anatomy")
    import jax.numpy as jnp
    np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    f = bench_transitions("fused", K, y1=24, y2=48, ypd=24)
    s = bench_transitions("scan", scan_K, y1=4, y2=8, ypd=4)
    print(json.dumps({"metric": "transitions_fused_vs_scan",
                      "value": f / s, "unit": "x"}), flush=True)
    bench_lyapunov(1, years1=12, years2=24, ypd=4)
    bench_lyapunov(4, years1=8, years2=16, ypd=4)


if __name__ == "__main__":
    main()
