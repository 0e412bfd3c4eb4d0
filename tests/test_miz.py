"""MIZ model parity vs the independent NumPy/SciPy oracle."""
import numpy as np
import pytest

from energybalancemodel_jl_tpu import (
    Collection,
    Forcing,
    SpaceTime,
    default_parameters,
    integrate,
    zeros_init,
)

from ref_impl import MIZRef

VARS = ("E", "T", "h", "Ei", "Ew", "Ti", "Tw", "D", "phi", "n")


def zero_nans(a):
    """The reference regression zeroes NaNs before comparing
    (/root/reference/test/runtests.jl:42-43)."""
    a = np.array(a, copy=True)
    a[np.isnan(a)] = 0.0
    return a


@pytest.mark.parametrize("solver", ["thomas", "pcr"])
def test_full_year_matches_oracle(solver):
    """A full seasonal cycle from zero init on a small sin grid: every stored
    variable matches the active-set-solved oracle at every one of the 200
    steps (observed agreement ~2e-10)."""
    nx, nt = 40, 200
    st = SpaceTime.sin(nx, nt, 1)
    par = default_parameters("MIZ")
    sols = integrate(
        "MIZ", st, Forcing(0.0), par, zeros_init(st), lastonly=False,
        progress=False, solver=solver,
    )
    ref = MIZRef(nx, nt, "sin", dict(par)).run(nt)
    for k in VARS:
        np.testing.assert_allclose(
            zero_nans(sols.raw[k]), zero_nans(ref[k]), rtol=5e-9, atol=5e-9,
            err_msg=f"variable {k} (solver {solver})",
        )


def test_canonical_config_window():
    """First 80 steps of the canonical config match the oracle pointwise.
    (Beyond ~step 82 the near-equator pancake dynamics — the ill-conditioned
    number-weighted average as n + dn -> 0 — amplify fp round-off into
    macroscopic differences between any two implementations; the reference's
    own CI compares only step 10, /root/reference/test/runtests.jl:40-46.)"""
    st = SpaceTime.sin(180, 2000, 1)
    par = default_parameters("MIZ")
    sols = integrate("MIZ", st, Forcing(0.0), par, zeros_init(st), progress=False)
    nsteps = 80
    ref = MIZRef(180, 2000, "sin", dict(par)).run(nsteps)
    for k in VARS:
        np.testing.assert_allclose(
            zero_nans(sols.raw[k][:nsteps]), zero_nans(ref[k]),
            rtol=1e-7, atol=1e-8, err_msg=f"variable {k}",
        )
        # the reference CI's own bar: raw step 10 at Julia's isapprox
        # default tolerance (~1.49e-8), NaNs zeroed
        # (/root/reference/test/runtests.jl:37-46)
        np.testing.assert_allclose(
            zero_nans(sols.raw[k][9]), zero_nans(ref[k][9]),
            rtol=1.5e-8, atol=1e-10, err_msg=f"step-10 variable {k}",
        )


def test_midwinter_window_matches_oracle():
    """Resume both implementations from the oracle's fully-developed winter
    state and compare a 40-step window — validates the ice-covered-season
    physics (lateral fluxes, welding, pancakes) beyond the freeze-up."""
    nx, nt = 40, 200
    st = SpaceTime.sin(nx, nt, 1)
    par = default_parameters("MIZ")
    oracle = MIZRef(nx, nt, "sin", dict(par))
    full = oracle.run(130)  # winter state, past freeze-up
    init = Collection({k: full[k][-1].copy() for k in ("Ei", "Ew", "h", "D", "phi")})
    # continue the oracle 40 more steps (its in-year clock keeps running)
    oracle2 = MIZRef(nx, nt, "sin", dict(par))
    oracle2.T0 = oracle.T0.copy()
    cont = {k: [] for k in VARS}
    Ei, Ew, h, D, phi = (init[k].copy() for k in ("Ei", "Ew", "h", "D", "phi"))
    for ti in range(130, 170):
        out = oracle2.step(Ei, Ew, h, D, phi, oracle2.t[ti % nt], 0.0)
        Ei, Ew, h, D, phi = out["Ei"], out["Ew"], out["h"], out["D"], out["phi"]
        for k in VARS:
            cont[k].append(out[k])
    # framework over the same window, stepped manually so the in-year clock
    # matches the resumed oracle
    from energybalancemodel_jl_tpu.models.base import StepConfig, get_model
    import jax.numpy as jnp

    spec = get_model("MIZ")
    cfg = StepConfig(solver="pcr", newton_abstol=1e-11, newton_reltol=1e-9)
    stat = spec.statics(st, {k: jnp.float64(v) for k, v in par.items()}, jnp.float64)
    insol = np.asarray(stat.insol)
    c = spec.init_carry(init, st, jnp.float64)
    c["T0"] = jnp.asarray(oracle.T0)
    for i, ti in enumerate(range(130, 170)):
        xs = dict(insol=jnp.asarray(insol[ti % nt]), f=jnp.float64(0.0))
        c, out = spec.step(c, xs, stat, {k: jnp.float64(v) for k, v in par.items()}, cfg)
        for k in VARS:
            np.testing.assert_allclose(
                zero_nans(np.asarray(out[k])), zero_nans(cont[k][i]),
                rtol=5e-9, atol=1e-9, err_msg=f"step {ti} variable {k}",
            )


def test_nan_presentation_semantics():
    """Ti is NaN where Ei == 0 and Tw is NaN where phi > 0.99 in *stored*
    output (miz.jl:193-194), while the integration itself stays finite."""
    nx, nt = 40, 200
    st = SpaceTime.sin(nx, nt, 1)
    par = default_parameters("MIZ")
    sols = integrate("MIZ", st, Forcing(0.0), par, zeros_init(st), lastonly=False,
                     progress=False)
    Ti = sols.raw["Ti"]
    Ei = sols.raw["Ei"]
    assert np.isnan(Ti[Ei == 0.0]).all()
    assert np.isfinite(Ti[Ei != 0.0]).all()
    Tw = sols.raw["Tw"]
    phi = sols.raw["phi"]
    assert np.isnan(Tw[phi > 0.99]).all()
    # prognostic fields never go NaN
    for k in ("E", "Ei", "Ew", "h", "D", "phi"):
        assert np.isfinite(sols.raw[k]).all(), k


def test_seasonal_ice_cycle():
    """Physical sanity on a 5-year run: ice appears at high latitudes, the
    concentration cycles seasonally, floe sizes stay within [Dmin, Dmax]."""
    st = SpaceTime.sin(60, 400, 5)
    par = default_parameters("MIZ")
    sols = integrate("MIZ", st, Forcing(0.0), par, zeros_init(st), progress=False)
    phi = sols.raw["phi"]
    assert phi.max() > 0.5  # substantial ice cover appears
    assert (phi >= 0.0).all() and (phi <= 1.0).all()
    D = sols.raw["D"]
    has_ice = D > 0
    assert (D[has_ice] >= par.Dmin - 1e-12).all()
    assert (D[has_ice] <= par.Dmax + 1e-12).all()
    h = sols.raw["h"]
    assert (h >= 0).all()
    # winter has more ice than summer at the end of the run
    winter_area = np.nansum(sols.seasonal.winter["phi"][-1])
    summer_area = np.nansum(sols.seasonal.summer["phi"][-1])
    assert winter_area > summer_area


def test_float32_runs_stable():
    """Throughput config: float32 stays finite, bounded, and statistically
    close to float64 (pointwise parity is impossible — the ice-edge dynamics
    flip discrete masks under f32 round-off within a few steps)."""
    st = SpaceTime.sin(40, 400, 2)
    par = default_parameters("MIZ")
    s64 = integrate("MIZ", st, Forcing(0.0), par, zeros_init(st), progress=False)
    s32 = integrate("MIZ", st, Forcing(0.0), par, zeros_init(st), progress=False,
                    dtype="float32")
    for k in ("E", "h", "phi", "Ei", "Ew"):
        assert np.isfinite(zero_nans(s32.raw[k])).all(), k
    phi32 = s32.raw["phi"]
    assert (phi32 >= 0).all() and (phi32 <= 1).all()
    # aggregate ice area over the final year agrees within 20%
    a64 = zero_nans(s64.raw["phi"]).mean()
    a32 = zero_nans(s32.raw["phi"]).mean()
    assert abs(a32 - a64) / max(a64, 1e-3) < 0.2
