"""Benchmark: model-years/day per chip on the seasonal MIZ configuration.

Runs a batch-native ensemble of independent canonical MIZ runs
(``SpaceTime{sin}(180, 2000, ...)``, the configuration behind the reference's
only published throughput number — 511.24 steps/s ≈ 2.2e4 model-yr/day on a
single CPU core, /root/reference/src/EnergyBalanceModel.jl:59-61) in float32
with seasonal-only storage, times steady-state years after a compile warmup,
and prints ONE JSON line.

Environment knobs: EBM_BENCH_K (ensemble size, default 8192),
EBM_BENCH_YEARS (timed years, default 48; fused mode rounds up to a whole number of EBM_BENCH_YPD-year dispatch chunks, default 24 — the measured amortization knee, BENCH_NOTES "years_per_dispatch amortization"), EBM_BENCH_DTYPE (float32|float64),
EBM_BENCH_SOLVER (pcr_fused|pcr|thomas|pallas), EBM_BENCH_ENGINE
(fused|batched|vmap; fused = whole-year Pallas kernel), EBM_BENCH_BLOCK_K,
EBM_BENCH_MODE (integrate|equilibrate|transitions — equilibrate times the
fixed-point driver: the fused kernel inside the convergence while_loop,
measured faster per model-year than the integrate path since no host year
loop remains; transitions times the noisy path: OU-forced escape
ensembles through the fused engine with in-kernel draw generation,
EBM_BENCH_NOISE="sigma,tau" and EBM_OU_IMPL=serial|assoc knobs; see
BENCH_NOTES.md), EBM_BENCH_MODEL (MIZ|Classic — Classic
times the WE15 fused kernel on the same canonical grid/sweep; the
headline metric stays MIZ).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        # under deferred/remote compile the CLIENT-side compile time is
        # sub-second even for the big fused kernels, so any non-zero
        # threshold silently excludes them from the persistent cache
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import energybalancemodel_jl_tpu as ebm
    from energybalancemodel_jl_tpu.models.base import StepConfig, get_model
    from energybalancemodel_jl_tpu.parallel import ensemble as ens
    from energybalancemodel_jl_tpu.utils.collection import Collection

    K = int(os.environ.get("EBM_BENCH_K", "8192"))
    years = int(os.environ.get("EBM_BENCH_YEARS", "48"))
    dtype = jnp.dtype(os.environ.get("EBM_BENCH_DTYPE", "float32"))
    solver = os.environ.get("EBM_BENCH_SOLVER", "pcr_fused")
    engine = os.environ.get("EBM_BENCH_ENGINE", "fused")
    mode = os.environ.get("EBM_BENCH_MODE", "integrate")

    if mode == "equilibrate":
        return bench_equilibrate(K, dtype)
    if mode == "transitions":
        return bench_transitions(K, dtype)
    if mode != "integrate":
        raise SystemExit(f"unknown EBM_BENCH_MODE {mode!r}")

    model = os.environ.get("EBM_BENCH_MODEL", "MIZ")
    st = ebm.SpaceTime.sin(180, 2000, 1)
    # realistic bifurcation sweep: spread diffusivity across members
    par_b = Collection(ebm.default_parameters(model))
    par_b["D"] = np.linspace(0.55, 0.65, K)

    if dtype == jnp.float64:
        cfg = StepConfig(solver=solver, newton_abstol=1e-11, newton_reltol=1e-9)
    else:
        cfg = StepConfig(solver=solver, newton_abstol=0.5, newton_reltol=1e-4,
                         newton_max_step=50.0)
    spec = get_model(model)
    par_j = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par_b.items()})
    if engine == "fused":
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            default_interpret, pallas_classic_year, pallas_miz_year,
        )

        block_k = int(os.environ.get("EBM_BENCH_BLOCK_K", "128"))
        layout = os.environ.get("EBM_BENCH_LAYOUT", "auto")
        layout = None if layout == "auto" else layout
        interp = default_interpret()
        year_kernel = (pallas_miz_year if model == "MIZ"
                       else pallas_classic_year)

        def run_year(carry, p, fy):
            return year_kernel(carry, p, fy, st, cfg, block_k=block_k,
                               interpret=interp, layout=layout)
    elif engine == "batched":
        par_j = ens._augment_batched(par_j)
        run_year = ens._native_year_fn(model, st, cfg, dtype.name, False, False)
    else:
        axes = ens._param_axes(par_j)
        run_year = ens._batched_year_fn(
            model, st, cfg, dtype.name, False,
            ens._AxesKey(tuple(sorted(axes.items()))), False,
        )

    if model == "MIZ":
        init = ebm.zeros_init(st)
    else:
        # classic needs a Tg = E/cw-consistent warm init (a cold shock from
        # zeros lands in the snowball attractor; throughput is identical,
        # but keep the benched trajectory physical)
        E0 = np.full(st.nx, 30.0)
        init = Collection(E=E0, Tg=E0 / float(par_b["cw"]))
    carry = spec.init_carry(init, st, dtype)
    carry = Collection({k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in carry.items()})
    fyear = jnp.zeros(st.nt, dtype=dtype)

    def sync(x):
        return float(np.asarray(x).sum())  # host transfer = real synchronization

    # the production fused path dispatches years_per_dispatch-year chunks
    # (one lax.scan of the whole-year kernel per dispatch) — time the same
    # shape here: per-year host dispatches over the tunnel cost ~0.2 s each,
    # which is ~25% of the budget at K=8192. Chunks stay well under the
    # remote watchdog's ~2 min dispatch limit (8 yr ~ 3 s at K=8192).
    ypd = max(1, int(os.environ.get("EBM_BENCH_YPD", "24")))
    if engine == "fused" and ypd > 1:
        # one compiled chunk length only: a sub-ypd remainder would pay a
        # second compile inside the timed loop
        years = ((years + ypd - 1) // ypd) * ypd
        from jax import lax

        @jax.jit
        def run_chunk(c, seas, f_years):
            # the seasonal rides the scan CARRY (overwritten each year),
            # exactly like the production equilibrate loop — stacking ypd
            # years of seasonal output would materialize ~1.4 GB of HBM
            # stacks per dispatch at the default K that production never
            # writes
            def body(cs, fy):
                c, _ = cs
                c, seas, _conv, _ = run_year(c, par_j, fy)
                return (c, seas), None

            (c, seas), _ = lax.scan(body, (c, seas), f_years)
            return c, seas

        seas_state = [None]

        def advance(c, n):
            if seas_state[0] is None:
                # one extra untimed year seeds the seasonal carry
                # structure (keeps a single compiled chunk length)
                c, seas_state[0], _conv, _ = run_year(c, par_j, fyear)
            c, seas_state[0] = run_chunk(
                c, seas_state[0], jnp.zeros((n, st.nt), dtype=dtype))
            return c, seas_state[0]
    else:
        ypd = 1

        def advance(c, n):
            for _ in range(n):
                c, seas, _conv, _ = run_year(c, par_j, fyear)
            return c, seas

    # claim the device first with a trivial dispatch: on remote/tunneled
    # TPU backends the first execution of ANY program pays the terminal
    # claim/handshake (measured 100-620 s here, independent of program
    # complexity), which would otherwise masquerade as kernel compile time
    t0 = time.time()
    sync(jnp.ones((8, 128), dtype) + 1.0)
    claim_s = time.time() - t0

    # warmup: compile + spin into a seasonally active state
    t0 = time.time()
    carry, seasonal = advance(carry, ypd)
    sync(seasonal.avg["E"])
    compile_s = time.time() - t0
    carry, seasonal = advance(carry, ypd)
    sync(seasonal.avg["E"])

    t0 = time.time()
    done = 0
    while done < years:
        n = min(ypd, years - done)
        carry, seasonal = advance(carry, n)
        done += n
    checksum = sync(seasonal.avg["E"])
    elapsed = time.time() - t0

    finite = bool(np.isfinite(np.asarray(seasonal.avg["E"])).all())
    model_years = K * years
    years_per_day = model_years / elapsed * 86400.0
    steps_per_sec = model_years * st.nt / elapsed
    baseline = 2.2e4  # reference: single-core CPU, derived in BASELINE.md

    print(
        json.dumps(
            {
                "metric": f"{model.lower()}_model_years_per_day_per_chip",
                "value": round(years_per_day, 1),
                "unit": "model-years/day",
                "vs_baseline": round(years_per_day / baseline, 2),
            }
        )
    )
    print(
        f"# model={model} K={K} years={years} ypd={ypd} dtype={dtype.name} solver={solver} engine={engine} "
        f"elapsed={elapsed:.3f}s claim={claim_s:.1f}s compile={compile_s:.1f}s "
        f"steps/s={steps_per_sec:.0f} "
        f"finite={finite} checksum={checksum:.6g} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_equilibrate(K, dtype):
    """Fixed-point throughput: a fixed-horizon equilibration (tol=0 pins
    the year count) of a K-member forcing sweep through the fused-kernel
    convergence loop, timed after a compile/claim warmup run."""
    import time

    import jax
    import jax.numpy as jnp

    import energybalancemodel_jl_tpu as ebm
    from energybalancemodel_jl_tpu.utils.collection import Collection

    years = int(os.environ.get("EBM_BENCH_YEARS", "100"))
    st = ebm.SpaceTime.sin(180, 2000, 1)
    par = Collection(ebm.default_parameters("MIZ"))
    par["F"] = np.linspace(0.0, 6.0, K)
    init = ebm.zeros_init(st)

    # claim + compile warmup (2 years covers init_fn and chunk_fn)
    t0 = time.time()
    float(np.asarray(jnp.ones((8, 128), dtype) + 1.0).sum())
    claim_s = time.time() - t0
    t0 = time.time()
    ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par, init, tol=0.0,
                    max_years=2, dtype=dtype.name, engine="fused")
    compile_s = time.time() - t0

    t0 = time.time()
    res = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par, init, tol=0.0,
                          max_years=years, dtype=dtype.name, engine="fused")
    elapsed = time.time() - t0

    E = np.nan_to_num(np.asarray(res.seasonal.avg["E"]))
    finite = bool(np.isfinite(np.asarray(res.seasonal.avg["E"])).all())
    years_per_day = K * int(res.years) / elapsed * 86400.0
    baseline = 2.2e4

    print(json.dumps({
        "metric": "miz_equilibration_model_years_per_day_per_chip",
        "value": round(years_per_day, 1),
        "unit": "model-years/day",
        "vs_baseline": round(years_per_day / baseline, 2),
    }))
    print(
        f"# mode=equilibrate K={K} years={int(res.years)} dtype={dtype.name} "
        f"elapsed={elapsed:.3f}s claim={claim_s:.1f}s compile={compile_s:.1f}s "
        f"finite={finite} checksum={float(E.sum()):.6g} "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


def bench_transitions(K, dtype):
    """Noisy-path throughput (VERDICT r4 #6): OU-forced transitions
    through the fused engine — in-kernel draw generation, the production
    chunk shape (fixed years_per_dispatch), fixed seed. The checksum
    (sum of all per-year areas + final etas) depends only on
    (seed, config), so it is stable round over round; ``EBM_BENCH_NOISE``
    = "sigma,tau" (default "2.0,0.02"), ``EBM_OU_IMPL`` picks the OU
    evaluation (default = the transitions() default)."""
    import time

    import jax
    import jax.numpy as jnp

    import energybalancemodel_jl_tpu as ebm
    from energybalancemodel_jl_tpu.utils.collection import Collection

    years = int(os.environ.get("EBM_BENCH_YEARS", "48"))
    ypd = max(1, int(os.environ.get("EBM_BENCH_YPD", "24")))
    years = ((years + ypd - 1) // ypd) * ypd
    sig_tau = os.environ.get("EBM_BENCH_NOISE", "2.0,0.02").split(",")
    sigma, tau = float(sig_tau[0]), float(sig_tau[1])

    st = ebm.SpaceTime.sin(180, 2000, 1)
    par = Collection(ebm.default_parameters("MIZ"))
    init = ebm.zeros_init(st)

    t0 = time.time()
    float(np.asarray(jnp.ones((8, 128), dtype) + 1.0).sum())
    claim_s = time.time() - t0

    # attractor references: 1-year equilibrate results OUTSIDE the timed
    # region (their seasonal stores classify; throughput is the subject)
    a = ebm.equilibrate("MIZ", st, ebm.Forcing(5.0), par, init, tol=0.0,
                        max_years=1, dtype=dtype.name)
    b = ebm.equilibrate("MIZ", st, ebm.Forcing(-15.0), par, init, tol=0.0,
                        max_years=1, dtype=dtype.name)

    common = dict(sigma=sigma, tau=tau, K=K, seed=0, dtype=dtype.name,
                  engine="fused", years_per_dispatch=ypd)
    # warmup: compiles the ypd-chunk graph (years == one chunk)
    t0 = time.time()
    ebm.transitions("MIZ", st, ebm.Forcing(0.0), par, a, b, years=ypd,
                    **common)
    compile_s = time.time() - t0

    t0 = time.time()
    res = ebm.transitions("MIZ", st, ebm.Forcing(0.0), par, a, b,
                          years=years, **common)
    elapsed = time.time() - t0

    finite = bool(np.isfinite(res.areas).all())
    checksum = float(np.nan_to_num(res.areas).sum() + res.eta.sum())
    years_per_day = K * years / elapsed * 86400.0
    baseline = 2.2e4

    print(json.dumps({
        "metric": "miz_noisy_model_years_per_day_per_chip",
        "value": round(years_per_day, 1),
        "unit": "model-years/day",
        "vs_baseline": round(years_per_day / baseline, 2),
    }))
    print(
        f"# mode=transitions K={K} years={years} ypd={ypd} sigma={sigma} "
        f"tau={tau} dtype={dtype.name} engine={res.engine} "
        f"elapsed={elapsed:.3f}s claim={claim_s:.1f}s "
        f"compile={compile_s:.1f}s finite={finite} "
        f"checksum={checksum:.6g} device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
