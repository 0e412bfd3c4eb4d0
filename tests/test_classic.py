"""Classic (WE15) model parity vs the independent NumPy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from energybalancemodel_jl_tpu import (
    Collection,
    Forcing,
    SpaceTime,
    default_parameters,
    integrate,
)

from ref_impl import ClassicRef


def run_ref(st, par, E0, Tg0, nsteps, f=0.0):
    ref = ClassicRef(st.nx, st.nt, st.grid, dict(par))
    E, Tg = E0.copy(), Tg0.copy()
    outs = {"E": [], "T": [], "h": []}
    for ti in range(nsteps):
        iz = ti % st.nt
        E, Tg, T, h = ref.step(E, Tg, iz, f)
        outs["E"].append(E.copy())
        outs["T"].append(T.copy())
        outs["h"].append(h.copy())
    return {k: np.stack(v) for k, v in outs.items()}


@pytest.mark.parametrize("grid", ["identity", "sin"])
@pytest.mark.parametrize("solver", ["thomas", "pcr"])
def test_trajectory_matches_oracle(grid, solver, rng):
    # nt must sit above the scheme's stability limit (dt*M/cw <= ~1, i.e.
    # nt >= ~1000 with default parameters) or round-off differences between
    # the two implementations amplify exponentially.
    nx, nt = 50, 1000
    nsteps = 300
    st = SpaceTime.identity(nx, nt, 1) if grid == "identity" else SpaceTime.sin(nx, nt, 1)
    par = default_parameters("Classic")
    E0 = rng.normal(20.0, 30.0, nx)  # mix of ice (E<0) and water states
    Tg0 = rng.normal(0.0, 5.0, nx)
    init = Collection(E=E0, Tg=Tg0)
    sols = integrate(
        "Classic", st, Forcing(0.0), par, init,
        lastonly=False, progress=False, solver=solver,
    )
    ref = run_ref(st, par, E0, Tg0, nsteps)
    for k in ("E", "T", "h"):
        np.testing.assert_allclose(
            sols.raw[k][:nsteps], ref[k], rtol=1e-8, atol=1e-8,
            err_msg=f"variable {k} ({grid}, {solver})",
        )


def test_albedo_hole_at_E_zero():
    """E == 0 gives zero co-albedo — reproduced quirk (classic.jl:47)."""
    nx, nt = 20, 50
    st = SpaceTime.identity(nx, nt, 1)
    par = default_parameters("Classic")
    init = Collection(E=np.zeros(nx), Tg=np.zeros(nx))
    sols = integrate("Classic", st, Forcing(0.0), par, init, lastonly=False, progress=False)
    ref = run_ref(st, par, np.zeros(nx), np.zeros(nx), 5)
    np.testing.assert_allclose(sols.raw["E"][:5], ref["E"][:5], rtol=1e-10, atol=1e-12)
    # step 1: C = -A (no absorbed solar), E += dt*(C - M*T + Fb) uniform
    np.testing.assert_allclose(
        sols.raw["E"][0], (par.Fb - par.A) * st.dt, rtol=1e-12
    )


def test_classic_accepts_verbose():
    """The reference classic step crashes on integrate's verbose kwarg
    (SURVEY.md §2 'latent classic-path bug'); the rebuild accepts it."""
    st = SpaceTime.identity(10, 20, 1)
    par = default_parameters("Classic")
    init = Collection(E=np.ones(10), Tg=np.zeros(10))
    sols = integrate("Classic", st, Forcing(0.0), par, init, verbose=True, progress=False)
    assert sols.raw["E"].shape == (20, 10)


def test_multiyear_spinup_reaches_seasonal_cycle():
    """Multi-century-style spin-up sanity: the classic model approaches a
    repeating seasonal cycle (year-to-year drift shrinks)."""
    nx, nt = 40, 1000
    st = SpaceTime.identity(nx, nt, 30)
    par = default_parameters("Classic")
    # Tg must start consistent with T = E/cw: the ghost layer couples with
    # cg/tau ~ 1e4, so a lagged Tg delivers a one-step cold shock that kicks
    # the model into its (genuine) snowball attractor.
    E0 = np.full(nx, 50.0)
    init = Collection(E=E0, Tg=E0 / par.cw)
    sols = integrate("Classic", st, Forcing(0.0), par, init, progress=False)
    avg = sols.seasonal.avg["T"]
    drift_early = np.abs(avg[5] - avg[4]).max()
    drift_late = np.abs(avg[-1] - avg[-2]).max()
    assert drift_late < drift_early
    assert drift_late < 0.05
    # ice exists at the pole, open water at the equator in equilibrium
    E_last = sols.raw["E"][-1]
    assert E_last[0] > 0 and E_last[-1] < 0
