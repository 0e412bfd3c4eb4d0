"""Combined on-chip validation of the analysis layer (run on real TPU).

The round-2 second half (Anderson acceleration, continuation + stability
along the path, multi-start calibration, equilibrium persistence) was
verified on CPU during a tunnel outage; this script re-exercises every one
of those paths on the real chip with small, watchdog-safe configurations
and prints one PASS/FAIL line per stage plus a summary.

Run (background, let it exit on its own — never timeout-kill the TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/tpu_check.py
"""
import os
import sys
import tempfile
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax  # noqa: E402
import energybalancemodel_jl_tpu as ebm  # noqa: E402

try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

FAILURES = []


def stage(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                fn()
                print(f"PASS  {name}  ({time.time()-t0:.1f}s)", flush=True)
            except Exception as e:
                FAILURES.append(name)
                print(f"FAIL  {name}  ({time.time()-t0:.1f}s): "
                      f"{type(e).__name__}: {e}", flush=True)
                traceback.print_exc()
        return run
    return deco


ST = ebm.SpaceTime.sin(16, 1000, 1)
PAR = ebm.Collection(ebm.default_parameters("MIZ"))
PAR["F"] = np.linspace(0.0, 4.0, 8)  # virtual forcing sweep, K=8
INIT = ebm.zeros_init(ST)
STATE = {}  # cross-stage handoffs


@stage("claim: trivial dispatch on the chip")
def s_claim():
    import jax.numpy as jnp
    y = np.asarray(jnp.ones((8, 128), jnp.float32) + 1.0)
    assert float(y.sum()) == 8 * 128 * 2
    assert jax.devices()[0].platform != "cpu", jax.devices()


@stage("equilibrate engine=auto resolves to fused and converges")
def s_fused():
    res = ebm.equilibrate("MIZ", ST, ebm.Forcing(0.0), PAR, INIT,
                          tol=5e-2, max_years=400)
    # the warmest members sit on the O(1e-2) ice-edge wobble attractor at
    # f32 — full convergence at tol=1e-2 is config-dependent; the on-chip
    # claim is "most members converge, everything stays finite"
    conv = np.atleast_1d(np.asarray(res.converged))
    assert conv.sum() >= 6, res
    E = np.asarray(res.seasonal.avg["E"])
    assert np.isfinite(E).all()
    STATE["picard"] = res
    print(f"      {res!r}", flush=True)


@stage("XLA batched engine agrees with fused (coarse)")
def s_batched():
    res = ebm.equilibrate("MIZ", ST, ebm.Forcing(0.0), PAR, INIT,
                          tol=5e-2, max_years=400, engine="batched")
    conv = (np.atleast_1d(np.asarray(res.converged))
            & np.atleast_1d(np.asarray(STATE["picard"].converged)))
    assert conv.sum() >= 4, res
    a = np.nan_to_num(np.asarray(res.seasonal.avg["phi"]))[conv]
    b = np.nan_to_num(np.asarray(STATE["picard"].seasonal.avg["phi"]))[conv]
    err = float(np.abs(a - b).max())
    assert err < 0.1, f"fused vs batched phi mismatch {err}"


@stage("Anderson acceleration converges on-chip")
def s_anderson():
    res = ebm.equilibrate("MIZ", ST, ebm.Forcing(0.0), PAR, INIT,
                          tol=5e-2, max_years=400, anderson=5)
    conv = (np.atleast_1d(np.asarray(res.converged))
            & np.atleast_1d(np.asarray(STATE["picard"].converged)))
    assert conv.sum() >= 3, res
    # AA may land elsewhere on the MIZ equilibrium manifold; compare the
    # observable coarsely (hemispheric mean ice fraction), converged
    # members only
    from energybalancemodel_jl_tpu.utils.numerics import hemispheric_mean
    a = np.asarray(hemispheric_mean(
        np.nan_to_num(np.asarray(res.seasonal.avg["phi"])), ST.x))[conv]
    b = np.asarray(hemispheric_mean(
        np.nan_to_num(np.asarray(
            STATE["picard"].seasonal.avg["phi"])), ST.x))[conv]
    err = float(np.abs(a - b).max())
    assert err < 0.2, f"AA vs Picard mean-phi mismatch {err}"
    print(f"      anderson years={res.years} vs picard "
          f"{STATE['picard'].years}", flush=True)


@stage("continuation round_trip traces both legs")
def s_continuation():
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    cont = ebm.continuation("MIZ", ST, [0.0, 1.5, 3.0, 4.5], par, INIT,
                            vary="F", round_trip=True, tol=1e-2,
                            max_years=400)
    assert len(cont.results) == 7, cont
    assert np.asarray(cont.converged).sum() >= 6, cont
    area = cont.ice_area()
    assert np.isfinite(area).all()
    STATE["cont"] = cont


@stage("stability along the continuation path (n_modes=2)")
def s_path_stability():
    stabs = STATE["cont"].stability(n_iter=30, n_modes=2)
    lead = np.asarray([np.max(np.atleast_1d(r.growth)) for r in stabs])
    assert np.isfinite(lead).all()
    # raw f32 spectra are NOT gated: at f32 the frozen-cell Ew/phi
    # families can carry spurious linearization gain (measured |lambda|
    # ~20 where f64 reads 1.5 and the projected estimate 1.005 —
    # stability() docstring); the observable-dynamics check is the
    # PROJECTED growth
    proj = STATE["cont"].stability(n_iter=30, project=("Ew", "phi"))
    plead = np.asarray([np.max(np.atleast_1d(r.growth)) for r in proj])
    conv = np.asarray(STATE["cont"].converged)
    assert (plead[conv] < 1.1).all(), plead
    print(f"      raw |lambda|: {np.array2string(lead, precision=4)}\n"
          f"      projected:    {np.array2string(plead, precision=4)}",
          flush=True)


@stage("projected stability exposes the physical contraction")
def s_projected():
    res = STATE["picard"]
    proj = ebm.stability("MIZ", ST, ebm.Forcing(0.0), PAR, res.state,
                         n_iter=40, project=("Ew", "phi"))
    g = np.atleast_1d(proj.growth)
    assert np.isfinite(g).all()
    # tol=5e-2 states are loose linearization points, and the F-sweep
    # crosses a genuinely weakly-non-attracting wobble regime (f64 reads
    # |lambda| ~ 1.5 there) — gate the bulk, bound the worst
    conv = np.atleast_1d(np.asarray(res.converged))
    assert (g[conv] < 1.6).all(), g
    assert np.median(g[conv]) < 1.05, g
    print(f"      projected growth: {np.array2string(g, precision=4)}",
          flush=True)


@stage("save/load round-trips the ContinuationResult")
def s_io():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cont.h5")
        ebm.save(STATE["cont"], path)
        back = ebm.load(path)
        a, b = STATE["cont"].ice_area(), back.ice_area()
        assert np.allclose(a, b, atol=1e-6), (a, b)


@stage("multi-start calibrate runs on-chip")
def s_calibrate():
    import warnings
    stc = ebm.SpaceTime.sin(16, 1000, 3)
    base = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(stc.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(base["cw"]))
    sol = ebm.integrate("Classic", stc, ebm.Forcing(2.0), base, init,
                        raw_mode="none")
    target = {"T": np.asarray(sol.seasonal.avg["T"])}
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fit = ebm.calibrate("Classic", stc, ebm.Forcing(2.0), base, init,
                            target=target, vary=("A",), steps=5,
                            n_starts=2, learning_rate=0.5)
    assert np.isfinite(fit.losses[-1]), fit.losses
    assert np.isfinite(float(np.asarray(fit.params["A"]))), fit.params


@stage("fold tracking composes with the fused engine")
def s_fold():
    st = ebm.SpaceTime.sin(16, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    par["D"] = np.array([0.45, 0.75])
    E0 = np.full(st.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
    res = ebm.fold("Classic", st, par, init, lo=-10.0, hi=20.0, steps=4,
                   tol=0.5, max_years=150)
    assert res.ok.all(), res
    assert res.values[0] < res.values[1], res  # fold rises with D
    expect = 30.0 / 2 ** 4
    assert np.allclose(res.width, expect), res.width
    print(f"      {res!r}", flush=True)


@stage("basin-boundary bisection composes with the fused engine")
def s_edge():
    st = ebm.SpaceTime.sin(16, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    par["F"] = np.array([8.0, 12.0])
    cw = float(par["cw"])
    warm = ebm.Collection(E=np.full(st.nx, 40.0),
                          Tg=np.full(st.nx, 40.0 / cw))
    cold = ebm.Collection(E=np.full(st.nx, -300.0),
                          Tg=np.full(st.nx, -300.0 / cw))
    res = ebm.edge("Classic", st, par, warm, cold, forcing=0.0, steps=4,
                   tol=0.5, max_years=200)
    assert res.ok.all(), res
    assert np.allclose(res.width, 2.0 ** -4), res.width
    assert np.all((0.0 < res.values) & (res.values < 1.0)), res
    print(f"      {res!r}", flush=True)


@stage("edge_state saddle refinement composes with the fused engine")
def s_edge_state():
    # f32 smoke: the tracker + polish complete and land strictly between
    # the endpoint attractors' ice areas; the spectrum/floor claims belong
    # to the f64 CPU tests (test_basins.py::TestEdgeState)
    from energybalancemodel_jl_tpu.fold import seasonal_ice_area
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    warm = ebm.Collection(E=np.full(st.nx, 40.0),
                          Tg=np.full(st.nx, 40.0 / cw))
    cold = ebm.Collection(E=np.full(st.nx, -300.0),
                          Tg=np.full(st.nx, -300.0 / cw))
    eq = ebm.equilibrate("Classic", st, 10.0, par,
                         ebm.stack_states([warm, cold]), tol=0.5,
                         max_years=200)
    areas = np.sort(np.asarray(seasonal_ice_area(eq.seasonal.avg, st)))
    res = ebm.edge_state("Classic", st, par, warm, cold, forcing=10.0,
                         commit_years=200, commit_tol=0.5,
                         stability_check=False)
    assert np.isfinite(res.resid), res
    assert areas[0] < res.area < areas[1], (res.area, areas)
    print(f"      saddle area {res.area:.3f} in ({areas[0]:.3f}, "
          f"{areas[1]:.3f}), resid {res.resid:.2f}", flush=True)


@stage("high-res singles run FUSED to nx=4096; extreme nx falls back")
def s_highres():
    import jax.numpy as jnp

    from energybalancemodel_jl_tpu.ops.pallas_year import fused_unfit
    par = ebm.Collection(ebm.default_parameters("Classic"))
    ramp = ebm.Forcing(0.0, 1.0, 0.0, (0, 0), (1.0, -1.0))
    for nx, years in ((1024, 2), (4096, 1)):
        st = ebm.SpaceTime.sin(nx, 1000, years)
        E0 = np.full(nx, 30.0)
        init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
        reason = fused_unfit("Classic", st, jnp.float32)
        assert reason is None, reason  # kx separable insolation (r3)
        sol = ebm.integrate("Classic", st, ramp, par, init,
                            raw_mode="none", engine="auto",
                            dtype="float32", progress=False)
        E = np.asarray(sol.seasonal.avg["E"])
        assert np.isfinite(E).all(), nx
        print(f"      nx={nx}: fused single run finite", flush=True)
    # the fallback boundary now sits at wide ensembles / extreme nx
    st = ebm.SpaceTime.sin(4096, 1000, 1)
    assert fused_unfit("MIZ", st, jnp.float32, K=1024) is not None
    st = ebm.SpaceTime.sin(16384, 1000, 1)
    assert fused_unfit("MIZ", st, jnp.float32) is not None
    # a single high-nt MIZ year (the nt ~ nx^2 stability route) is fused
    st = ebm.SpaceTime.sin(512, 16000, 1)
    assert fused_unfit("MIZ", st, jnp.float32) is None
    sol = ebm.integrate("MIZ", st, ebm.Forcing(0.0),
                        ebm.default_parameters("MIZ"), ebm.zeros_init(st),
                        raw_mode="none", engine="fused", dtype="float32",
                        progress=False)
    E = np.asarray(sol.seasonal.avg["E"])
    assert np.isfinite(E).all()
    print("      MIZ nx=512/nt=16000 fused single run finite", flush=True)


@stage("sensitivity adjoint runs on-chip (f32 smoke: finite only)")
def s_sensitivity():
    # f32 gradients through the frozen-cell lanes are noisy by design
    # (stability docstring) — the on-chip claim is only that the IFT
    # adjoint dispatch completes and returns finite numbers; trustworthy
    # values come from the f64 CPU path (test_sensitivity.py)
    import warnings
    st = ebm.SpaceTime.sin(16, 150, 1)
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    init = ebm.zeros_init(st)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = ebm.sensitivity("MIZ", st, ebm.Forcing(0.0), par, init,
                              of="mean", var="E", tol=1e-4, max_years=200)
    assert np.isfinite(res.value)
    assert all(np.isfinite(v) for v in res.grads.values()), res.grads
    print(f"      {res!r}", flush=True)


@stage("right-side (physical) stability modes on-chip")
def s_right_side():
    res = STATE["picard"]
    r = ebm.stability("MIZ", ST, ebm.Forcing(0.0), PAR, res.state,
                      n_iter=15, side="right", project=("Ew", "phi"))
    assert r.side == "right"
    g = np.atleast_1d(r.growth)
    assert np.isfinite(g).all()
    # the mode is a unit physical pattern per member
    nrm = np.sqrt(sum((np.asarray(v) ** 2).sum(axis=-1)
                      for v in r.mode.values()))
    assert np.allclose(nrm, 1.0, atol=1e-3), nrm
    print(f"      projected right-side growth: "
          f"{np.array2string(g, precision=4)}", flush=True)


@stage("fused integrate chunks (bench-shaped scan) stay finite")
def s_integrate_chunks():
    st16 = ebm.SpaceTime.sin(16, 1000, 16)
    par1 = ebm.Collection(ebm.default_parameters("MIZ"))
    sol = ebm.integrate("MIZ", st16, ebm.Forcing(0.0), par1, INIT,
                        raw_mode="none", engine="fused",
                        years_per_dispatch=8)
    E = np.asarray(sol.seasonal.avg["E"])
    assert np.isfinite(E).all()


@stage("lyapunov Benettin/QR runs on-chip (f32 smoke: finite only)")
def s_lyapunov():
    # like the sensitivity stage: f32 tangents through the frozen-cell
    # lanes are noisy by design (stability docstring) — the on-chip claim
    # is that the forward+transpose year dispatches complete and return
    # finite log growths; trustworthy exponents come from the f64 CPU
    # path (test_lyapunov.py)
    st = ebm.SpaceTime.sin(16, 150, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(st.nx, 30.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
    # years_per_dispatch deliberately omitted: exercises the adaptive
    # (watchdog-safe) default chunking path on the chip (VERDICT r3 #2)
    lya = ebm.lyapunov("Classic", st, ebm.Forcing(0.0), par, init,
                       years=6, transient=2, dtype="float32")
    assert np.isfinite(lya.history).all()
    print(f"      lambda_1 = {float(lya.exponents[0]):+.3f}/yr (f32 "
          "smoke)", flush=True)


@stage("noise-forced transitions run on-chip (chunking bitwise)")
def s_transitions():
    # the OU noise rides the forcing row; the on-chip claims are (1) the
    # noisy year dispatches complete with finite areas and (2) dispatch
    # chunking is bitwise-invariant (absolute-year-keyed draws) ON THE
    # CHIP, not just under XLA:CPU
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=60, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=60, tol=2.0, dtype="float32")
    kw = dict(sigma=8.0, tau=0.05, years=4, K=8, seed=1,
              dtype="float32", track=("E",))
    r1 = ebm.transitions("Classic", st, 10.0, par, a, b, **kw)
    r2 = ebm.transitions("Classic", st, 10.0, par, a, b,
                         years_per_dispatch=2, **kw)
    # engine='auto' must resolve to the fused noisy kernel on the chip —
    # the chunking invariance below is then a FUSED-engine on-chip claim
    assert r1.engine == "fused" and r2.engine == "fused", (
        r1.engine, r2.engine)
    assert np.isfinite(r1.areas).all()
    np.testing.assert_array_equal(r1.areas, r2.areas)
    np.testing.assert_array_equal(r1.tracked["E"], r2.tracked["E"])
    spread = float(np.std(np.asarray(r1.tracked["E"])[-1]))
    assert spread > 0.0
    print(f"      chunking bitwise; member E-spread {spread:.2f}",
          flush=True)


@stage("fused transitions: sigma=0 bitwise vs det kernel; default chunking")
def s_transitions_fused():
    # two on-chip claims for the round-4 fused noisy engine:
    # (1) a ZERO noise table is bitwise-inert — transitions(sigma=0)
    #     reproduces the deterministic fused year EXACTLY on the chip
    #     (the CPU test only covers Mosaic interpret mode);
    # (2) the DEFAULT adaptive dispatch chunking (no years_per_dispatch)
    #     completes a production-scale escape ensemble watchdog-safely
    #     (VERDICT r3 weak #1 / next #2).
    import jax.numpy as jnp

    from energybalancemodel_jl_tpu.models.base import (default_step_config,
                                                       get_model)
    from energybalancemodel_jl_tpu.ops.pallas_year import pallas_classic_year
    from energybalancemodel_jl_tpu.utils.collection import Collection

    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=60, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=60, tol=2.0, dtype="float32")

    res = ebm.transitions("Classic", st, 10.0, par, a, b, sigma=0.0,
                          years=1, K=2, seed=0, dtype="float32")
    assert res.engine == "fused"
    dtype = jnp.dtype("float32")
    spec = get_model("Classic")
    cfg = default_step_config(dtype.name)
    carry = spec.init_carry(a.state, st, dtype)
    carry = Collection({k: jnp.broadcast_to(v, (2,) + v.shape)
                        for k, v in carry.items()})
    parj = Collection({k: jnp.asarray(v, dtype) for k, v in par.items()})
    parj["F"] = jnp.zeros((2,), dtype)
    fyear = jnp.full((st.nt,), 10.0, dtype)
    det = pallas_classic_year(carry, parj, fyear, st, cfg, layout="xk")
    for k in res.state:
        np.testing.assert_array_equal(np.asarray(res.state[k]),
                                      np.asarray(det[0][k]))

    rbig = ebm.transitions("Classic", st, 10.0, par, a, b, sigma=8.0,
                           tau=0.05, years=16, K=2048, seed=3,
                           dtype="float32")
    assert rbig.engine == "fused"
    assert np.isfinite(rbig.areas).all()
    frac = float(np.mean(np.asarray(rbig.labels)[-1]))
    print(f"      sigma=0 bitwise == det kernel; default chunking "
          f"K=2048/16yr ok (escaped frac {frac:.2f})", flush=True)


@stage("in-kernel draws: Mosaic threefry+erfinv BITWISE vs jax.random")
def s_inkernel_draws():
    # THE round-5 contract (VERDICT r4 #1): the draws the compiled Mosaic
    # kernel generates must equal jax.random.normal's bit for bit ON THE
    # CHIP (CPU interpret only proves the XLA:CPU contraction context;
    # Mosaic's float pipeline is the open question). Two layers:
    # (1) direct: a gen-only pallas kernel's (nt, 128) table vs the
    #     vmapped jax.random.normal oracle, bitwise;
    # (2) end-to-end: transitions keys-mode vs table-mode trajectories
    #     bitwise (any draw bit would chaotically diverge them).
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from energybalancemodel_jl_tpu.ops.pallas_year import _gen_noise_xk

    nt, Kt = 2000, 128
    nt_pad = ((nt + 7) // 8) * 8
    base = jax.random.PRNGKey(11)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(Kt, dtype=jnp.uint32))

    def kern(keys_ref, out_ref):
        _gen_noise_xk(out_ref, keys_ref, nt_pad)

    tab = np.asarray(pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nt_pad, Kt), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(keys.T))[:nt]
    oracle = np.asarray(jax.vmap(
        lambda k: jax.random.normal(k, (nt,), jnp.float32),
        out_axes=1)(keys))
    neq = int((tab.view(np.int32) != oracle.view(np.int32)).sum())
    assert neq == 0, (
        f"{neq}/{tab.size} generated draws differ from jax.random.normal "
        f"on-chip — the Mosaic float pipeline contracts differently; "
        f"max ulp {np.max(np.abs(tab.view(np.int32).astype(np.int64) - oracle.view(np.int32)))}")

    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=60, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=60, tol=2.0, dtype="float32")
    kw = dict(sigma=8.0, tau=0.05, years=3, K=8, seed=4, dtype="float32")
    try:
        os.environ["EBM_FUSED_NOISE"] = "keys"
        r_k = ebm.transitions("Classic", st, 10.0, par, a, b, **kw)
        os.environ["EBM_FUSED_NOISE"] = "table"
        r_t = ebm.transitions("Classic", st, 10.0, par, a, b, **kw)
    finally:
        # a failure here must not leak table mode into later stages
        os.environ.pop("EBM_FUSED_NOISE", None)
    assert r_k.engine == "fused" and r_t.engine == "fused"
    np.testing.assert_array_equal(r_k.areas, r_t.areas)
    np.testing.assert_array_equal(r_k.eta, r_t.eta)
    print("      Mosaic draws bitwise == jax.random.normal "
          "(direct table + trajectories)", flush=True)


@stage("assoc OU path on-chip: sigma=0 bitwise det; serial parity")
def s_assoc_ou():
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=60, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=60, tol=2.0, dtype="float32")
    kw = dict(sigma=8.0, tau=0.05, years=3, K=8, seed=4, dtype="float32")
    r_s = ebm.transitions("Classic", st, 10.0, par, a, b,
                          ou_impl="serial", **kw)
    r_a = ebm.transitions("Classic", st, 10.0, par, a, b,
                          ou_impl="assoc", **kw)
    np.testing.assert_allclose(r_a.eta, r_s.eta, rtol=1e-4, atol=1e-5)
    k0 = dict(kw, sigma=0.0, years=2)
    r0s = ebm.transitions("Classic", st, 10.0, par, a, b,
                          ou_impl="serial", **k0)
    r0a = ebm.transitions("Classic", st, 10.0, par, a, b,
                          ou_impl="assoc", **k0)
    np.testing.assert_array_equal(r0s.areas, r0a.areas)
    for k in r0s.state:
        np.testing.assert_array_equal(np.asarray(r0s.state[k]),
                                      np.asarray(r0a.state[k]))
    print("      assoc: sigma=0 bitwise det; eta within tree round-off",
          flush=True)


@stage("fused transitions + mesh: sharded == unsharded (1-chip mesh)")
def s_fused_mesh():
    from jax.sharding import Mesh

    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=60, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=60, tol=2.0, dtype="float32")
    kw = dict(sigma=8.0, tau=0.05, years=3, K=8, seed=4,
              dtype="float32", engine="fused", track=("E",))
    r0 = ebm.transitions("Classic", st, 10.0, par, a, b, **kw)
    mesh = Mesh(np.array(jax.devices()[:1]), ("members",))
    r1 = ebm.transitions("Classic", st, 10.0, par, a, b, mesh=mesh, **kw)
    np.testing.assert_array_equal(r0.areas, r1.areas)
    np.testing.assert_array_equal(r0.eta, r1.eta)
    np.testing.assert_array_equal(r0.tracked["E"], r1.tracked["E"])
    print("      fused+mesh bitwise == unsharded on-chip", flush=True)


@stage("subyear crossing detector lowers and detects on-chip")
def s_subyear():
    # the round-5 in-kernel first-crossing detector (per-step weighted
    # area reduction + running first-step record) must LOWER in Mosaic
    # and agree with the year-mean classifier's direction on real
    # escapes; interpret mode only proves XLA semantics
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 5.5, par, mk(30.0),
                        max_years=120, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 5.5, par, mk(-30.0),
                        max_years=120, tol=2.0, dtype="float32")
    r = ebm.transitions("Classic", st, 5.5, par, a, b, sigma=24.0,
                        tau=0.05, years=25, K=32, seed=0,
                        dtype="float32", subyear=True)
    assert r.engine == "fused"
    cs = r.crossing_step
    assert ((cs == -1) | ((cs >= 0) & (cs < r.nt))).all()
    esc = r.escaped
    assert esc.sum() >= 1
    fps = r.first_passage_subyear()
    assert np.all(fps[esc] <= r.first_passage[esc])
    print(f"      {int(esc.sum())}/32 escapes refined to sub-year "
          f"(min lead {float(np.min(r.first_passage[esc] - fps[esc])):.3f} yr)",
          flush=True)


@stage("ramped subyear: evolving threshold, chunking bitwise on-chip")
def s_subyear_ramped():
    # round-5b: under a ramp the crossing threshold EVOLVES with the
    # sigma-zero companions (lag-1 midpoint carried in-scan; chunk
    # boundaries re-derive it via the bitwise host twin _thr_sgn_rows).
    # The chunk-layout invariance must hold ON-CHIP — it spans the
    # device/host boundary (f32 scalar add/div parity), which interpret
    # mode cannot prove.
    import warnings

    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        E=np.full(st.nx, e), Tg=np.full(st.nx, e) / cw)
    a = ebm.equilibrate("Classic", st, 10.0, par, mk(30.0),
                        max_years=120, tol=2.0, dtype="float32")
    b = ebm.equilibrate("Classic", st, 10.0, par, mk(-30.0),
                        max_years=120, tol=2.0, dtype="float32")
    ramp = ebm.Forcing(10.0, 11.0, -5.0, (1, 1), (1.0, -1.0))
    kw = dict(sigma=10.0, tau=0.05, years=20, K=8, seed=3,
              dtype="float32", engine="fused", subyear=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r1 = ebm.transitions("Classic", st, ramp, par, a, b,
                             years_per_dispatch=1, **kw)
        r3 = ebm.transitions("Classic", st, ramp, par, a, b,
                             years_per_dispatch=3, **kw)
    np.testing.assert_array_equal(r1.areas, r3.areas)
    np.testing.assert_array_equal(r1.crossing_step, r3.crossing_step)
    hits = int((r1.crossing_step >= 0).sum())
    assert hits >= 1
    print(f"      chunking bitwise across the host re-derivation; "
          f"{hits} member-year crossings recorded", flush=True)


@stage("kx separable insolation rebuild is BITWISE vs table mode")
def s_separable_bitwise():
    # the round-3 'kx' in-kernel insolation rebuild must reproduce the
    # statics table EXACTLY on the chip (BENCH_NOTES round-3b addendum;
    # the CPU test only asserts a tolerance — interpret-mode jit graphs
    # may differ by FMA contraction). Runs LAST: forcing separable mode
    # means clearing the jit caches, which would recompile later stages.
    import energybalancemodel_jl_tpu.ops.pallas_year as py
    st = ebm.SpaceTime.sin(40, 200, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(40, 30.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
    kw = dict(progress=False, raw_mode="none", dtype="float32",
              engine="fused")
    budget = py._KX_TABLE_BUDGET
    try:
        a = np.asarray(ebm.integrate("Classic", st, ebm.Forcing(0.0), par,
                                     init, **kw).seasonal.avg["E"])
        py._KX_TABLE_BUDGET = 0
        jax.clear_caches()  # the mode is baked in at trace time
        b = np.asarray(ebm.integrate("Classic", st, ebm.Forcing(0.0), par,
                                     init, **kw).seasonal.avg["E"])
    finally:
        py._KX_TABLE_BUDGET = budget
        jax.clear_caches()
    np.testing.assert_array_equal(a, b)
    print("      separable == table, bitwise", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    stages = [s_claim, s_fused, s_batched, s_anderson, s_continuation,
              s_path_stability, s_projected, s_io, s_calibrate,
              s_fold, s_edge, s_edge_state, s_highres, s_sensitivity,
              s_right_side, s_integrate_chunks, s_lyapunov,
              s_transitions, s_transitions_fused, s_inkernel_draws,
              s_assoc_ou, s_fused_mesh, s_subyear, s_subyear_ramped,
              s_separable_bitwise]
    for fn in stages:
        fn()
    n = len(stages) - len(FAILURES)
    print(f"\n{n}/{len(stages)} stages passed" + (
        f"; FAILED: {FAILURES}" if FAILURES else " — on-chip validation OK"),
        flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
