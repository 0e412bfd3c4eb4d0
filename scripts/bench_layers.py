"""On-chip throughput of the stochastic and Lyapunov drivers — A/B doctrine.

Round 5 (VERDICT r4 #4) codifies the repo's measurement doctrine IN the
script instead of prose: the noisy path's absolute throughput swings ~40%
between chip windows while the deterministic kernel floor holds
0.537-0.550 s/yr (BENCH_NOTES "Noise-operand anatomy"), so every arm is
measured INTERLEAVED with a deterministic fused-kernel CONTROL in the
same process, over multiple cycles, and every emitted row carries its
in-window control marginal and the control-normalized ratio ``x_det``.
Quote ``x_det`` (and the control value) in docs — never a lone absolute.

All timings use the MARGINAL-YEARS scheme settled in round 3 (BENCH_NOTES
"equilibrate A/B"): two calls differing ONLY in ``years``, same dispatch
chunking, so per-call fixed costs (terminal claim, compile, result
assembly) cancel. Keep the host idle while this runs (concurrent host
work inflates dispatch-path timings ~15%, CLAUDE.md).

Run (background, let it exit — never timeout-kill the TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_layers.py
Knobs: EBM_BENCH_K (default 8192), EBM_BENCH_SCAN_K (default 8192),
EBM_BENCH_CYCLES (default 3), EBM_BENCH_LAYERS (comma list from
{transitions, lyapunov}; default both).
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
ST = None  # canonical grid, built in main() after backend init


def _attractors(st, par, F, dtype):
    warm = ebm.equilibrate("MIZ", st, F + 15.0, par, ebm.zeros_init(st),
                           max_years=40, tol=0.0, dtype=dtype)
    cold = ebm.equilibrate("MIZ", st, F - 25.0, par, ebm.zeros_init(st),
                           max_years=40, tol=0.0, dtype=dtype)
    return warm, cold


class Arm:
    """One measurement arm: ``run(years) -> wall seconds`` plus the
    (y1, y2) marginal pair. ``measure()`` returns marginal s/yr."""

    def __init__(self, name, run, y1, y2, K):
        self.name, self.run, self.y1, self.y2, self.K = name, run, y1, y2, K

    def warmup(self):
        self.run(self.y1)  # claim + compile

    def measure(self):
        t1, t2 = self.run(self.y1), self.run(self.y2)
        return (t2 - t1) / (self.y2 - self.y1)


def _det_control_arm(st, par, K):
    """The deterministic fused-kernel control: chunked lax.scan of the
    whole-year 'xk' kernel (the production integrate/equilibrate dispatch
    shape; floor 0.537-0.550 s/yr at K=8192 across all round-4 windows)."""
    import jax.numpy as jnp
    from jax import lax

    from energybalancemodel_jl_tpu.models.base import (
        StepConfig, get_model)
    from energybalancemodel_jl_tpu.ops.pallas_year import pallas_miz_year
    from energybalancemodel_jl_tpu.utils.collection import Collection

    dtype = jnp.float32
    cfg = StepConfig(solver="pcr", newton_abstol=0.5, newton_reltol=1e-4,
                     newton_max_step=50.0)
    par_j = Collection({k: jnp.asarray(v, dtype) for k, v in par.items()})
    par_j["D"] = jnp.asarray(np.linspace(0.55, 0.65, K), dtype)
    spec = get_model("MIZ")
    carry0 = spec.init_carry(ebm.zeros_init(st), st, dtype)
    carry0 = Collection({k: jnp.broadcast_to(v, (K,) + v.shape)
                         for k, v in carry0.items()})
    fyear = jnp.zeros(st.nt, dtype=dtype)

    @jax.jit
    def chunk(c, seas, f_years):
        def body(cs, fy):
            c, _ = cs
            c, seas, _conv, _ = pallas_miz_year(c, par_j, fy, st, cfg,
                                                layout="xk")
            return (c, seas), None

        (c, seas), _ = lax.scan(body, (c, seas), f_years)
        return c, seas

    state = {}

    def run(years):
        t0 = time.time()
        if "seas" not in state:
            c, seas, _conv, _ = pallas_miz_year(carry0, par_j, fyear, st,
                                                cfg, layout="xk")
            state["c0"], state["seas"] = c, seas
        c, seas = state["c0"], state["seas"]
        done = 0
        while done < years:
            n = min(24, years - done)
            c, seas = chunk(c, seas, jnp.zeros((n, st.nt), dtype))
            done += n
        np.asarray(seas.avg["E"])  # sync (block_until_ready no-op on axon)
        return time.time() - t0

    return Arm("det_control", run, 24, 48, K)


def _transitions_arm(name, st, par, warm, cold, K, y1, y2, ypd, engine,
                     ou_impl=None, force_table=False):
    kw = dict(sigma=4.0, tau=0.05, K=K, seed=7, dtype="float32",
              engine=engine, years_per_dispatch=ypd)
    if ou_impl is not None:
        kw["ou_impl"] = ou_impl

    def run(years):
        if force_table:
            os.environ["EBM_FUSED_NOISE"] = "table"
        t0 = time.time()
        try:
            r = ebm.transitions("MIZ", st, 0.0, par, warm, cold,
                                years=years, **kw)
            np.asarray(r.areas)
        finally:
            if force_table:
                os.environ.pop("EBM_FUSED_NOISE", None)
        return time.time() - t0

    return Arm(name, run, y1, y2, K)


def bench_transitions_family(st, K, scan_K, cycles):
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    warm, cold = _attractors(st, par, 0.0, "float32")

    arms = [
        _det_control_arm(st, par, K),
        _transitions_arm("noisy_keys_serial", st, par, warm, cold, K,
                         24, 48, 24, "fused", ou_impl="serial"),
        _transitions_arm("noisy_keys_assoc", st, par, warm, cold, K,
                         24, 48, 24, "fused", ou_impl="assoc"),
        _transitions_arm("noisy_table_serial", st, par, warm, cold, K,
                         24, 48, 24, "fused", ou_impl="serial",
                         force_table=True),
        _transitions_arm("noisy_scan", st, par, warm, cold, scan_K,
                         4, 8, 4, "scan"),
    ]
    for a in arms:
        a.warmup()
    results = {a.name: [] for a in arms}
    for _ in range(cycles):
        for a in arms:  # interleaved: every cycle samples every arm
            results[a.name].append(a.measure())

    ctrl = float(np.median(results["det_control"]))
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    for a in arms:
        vals = results[a.name]
        med = float(np.median(vals))
        myd = a.K * 86400.0 / med
        print(json.dumps({
            "metric": f"transitions_{a.name}", "value": myd,
            "unit": "model-yr/day", "vs_baseline": myd / BASELINE,
            "K": a.K, "marginal_s_per_year": med,
            "samples_s_per_year": [round(v, 4) for v in vals],
            "x_det": med / ctrl, "control_s_per_year": ctrl,
            "window": stamp,
        }), flush=True)
    return results


def bench_lyapunov_family(st, cycles):
    """Lyapunov rows (VERDICT r4 #3): solo spectra (dispatch-bound),
    the ADAPTIVE default chunking (weak #3: does it actually reach the
    ~15 s target for solo runs?), and the ensemble claim — (K,) par
    leaves riding at K-fold throughput, measured instead of asserted."""
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    eq = ebm.equilibrate("MIZ", st, 0.0, par, ebm.zeros_init(st),
                         max_years=40, tol=0.0, dtype="float32")

    def lyap_arm(name, n_modes, y1, y2, ypd, par_sweep=None, K=1):
        p = ebm.Collection(par)
        init = eq.state
        if par_sweep is not None:
            p["F"] = np.linspace(0.0, 0.5, K)

        def run(years):
            t0 = time.time()
            r = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), p, init,
                             years=years, n_modes=n_modes,
                             dtype="float32", years_per_dispatch=ypd)
            np.asarray(r.history)
            return time.time() - t0

        return Arm(name, run, y1, y2, K)

    arms = [
        lyap_arm("solo_modes1", 1, 12, 24, 4),
        lyap_arm("solo_modes4", 4, 8, 16, 4),
        # the adaptive default (years_per_dispatch=None): weak #3 asks
        # whether the ~15 s chunk target is actually reached solo
        lyap_arm("solo_modes1_adaptive", 1, 12, 24, None),
        # the ensemble claim: K-fold throughput on (K,) par leaves
        lyap_arm("ensemble_K1024_modes2", 2, 4, 8, 4,
                 par_sweep="F", K=1024),
    ]
    for a in arms:
        a.warmup()
    results = {a.name: [] for a in arms}
    for _ in range(cycles):
        for a in arms:
            results[a.name].append(a.measure())

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    for a in arms:
        vals = results[a.name]
        med = float(np.median(vals))
        print(json.dumps({
            "metric": f"lyapunov_{a.name}", "value": 1.0 / med,
            "unit": "years/s", "marginal_s_per_year": med,
            "samples_s_per_year": [round(v, 4) for v in vals],
            "member_years_per_s": a.K / med, "K": a.K,
            "window": stamp,
        }), flush=True)
    return results


def main():
    global ST
    print(f"devices: {jax.devices()}", flush=True)
    K = int(os.environ.get("EBM_BENCH_K", "8192"))
    scan_K = int(os.environ.get("EBM_BENCH_SCAN_K", "8192"))
    cycles = int(os.environ.get("EBM_BENCH_CYCLES", "3"))
    layers = os.environ.get("EBM_BENCH_LAYERS",
                            "transitions,lyapunov").split(",")

    # claim the device with a trivial dispatch before timing anything
    # (terminal-claim latency, BENCH_NOTES "Cold-start anatomy")
    import jax.numpy as jnp
    np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))

    ST = ebm.SpaceTime.sin(180, 2000, 1)  # canonical MIZ benchmark grid
    if "transitions" in layers:
        bench_transitions_family(ST, K, scan_K, cycles)
    if "lyapunov" in layers:
        bench_lyapunov_family(ST, cycles)


if __name__ == "__main__":
    main()
