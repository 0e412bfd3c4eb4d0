"""Independent-oracle anchoring of the stochastic layer (VERDICT r3 #4).

Two layers, mirroring what `test_oracle_equilibrium.py` does for the
equilibrium layer:

(a) TRAJECTORY: a pure-numpy OU recursion built from the documented keying
    contract (stochastic.py module docstring: member key = fold_in(seed
    key, member), year draws = normal(fold_in(member key, absolute year),
    nt)) feeds the SAME noisy forcing step-by-step into the independent
    `ref_impl.ClassicRef` stepper (dense `np.linalg.solve`, no JAX in the
    dynamics). The transitions() trajectory must match at the classic
    oracle tolerance, and the final OU value bitwise.

(b) PHYSICS: the escape rate obeys the Kramers/Arrhenius picture —
    ln(rate) approximately linear in 1/sigma^2 in the low-noise regime.
    Measured (seed 0, classic nx=8/nt=1000, F=6.5, tau=0.05, 300 years):
    rates 2.1e-4 / 9.4e-4 / 2.0e-3 at sigma 9/11/13, correlation of
    ln(rate) with 1/sigma^2 = -0.9994. The draws are a pure function of
    the seed (threefry), so these are deterministic measurements, not
    flaky statistics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.stochastic import transitions
from energybalancemodel_jl_tpu.utils.numerics import hemispheric_mean

from ref_impl import ClassicRef


def _classic_setup(nx=8, nt=1000):
    st = ebm.SpaceTime.sin(nx, nt, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        {"E": np.full(nx, e), "Tg": np.full(nx, e) / cw})
    return st, par, mk


def _numpy_ou_path(seed, member, years, nt, sigma, tau):
    """The documented keying contract, re-derived host-side: the OU
    recursion itself is plain float64 numpy — only the raw normal draws
    come from jax.random (the contract names that generator)."""
    base = jax.random.PRNGKey(seed)
    mkey = jax.random.fold_in(base, member)
    dt = 1.0 / nt
    if tau > 0.0:
        rho = float(np.exp(-dt / tau))
        scale = sigma * float(np.sqrt(max(0.0, 1.0 - rho * rho)))
    else:
        rho, scale = 0.0, sigma
    eta = 0.0
    path = np.empty(years * nt, dtype=np.float64)
    i = 0
    for y in range(years):
        xi = np.asarray(jax.random.normal(
            jax.random.fold_in(mkey, y), (nt,), jnp.float64))
        for z in xi:
            eta = rho * eta + scale * float(z)
            path[i] = eta
            i += 1
    return path


class TestTrajectoryOracle:
    def test_noisy_classic_matches_ref_impl(self):
        """transitions() vs ClassicRef consuming the identical OU path."""
        st, par, mk = _classic_setup()
        F, sigma, tau, years, seed = 10.0, 4.0, 0.05, 2, 11
        a = ebm.equilibrate("Classic", st, F, par, mk(30.0),
                            max_years=120, tol=2.0)
        b = ebm.equilibrate("Classic", st, F, par, mk(-30.0),
                            max_years=120, tol=2.0)
        res = transitions("Classic", st, F, par, a, b, sigma=sigma,
                          tau=tau, years=years, K=1, seed=seed,
                          track=("E", "T"))

        path = _numpy_ou_path(seed, 0, years, st.nt, sigma, tau)
        # final OU value: bitwise (same recursion, same f64 arithmetic)
        np.testing.assert_array_equal(res.eta, path[-1:])

        # oracle stepping: dense-solve ClassicRef under f_t = F + eta_t
        ref = ClassicRef(st.nx, st.nt, st.grid, dict(par))
        E = np.asarray(a.state["E"], dtype=np.float64).copy()
        Tg = np.asarray(a.state["Tg"], dtype=np.float64).copy()
        x = np.asarray(st.x)
        for y in range(years):
            Es, Ts = [], []
            for j in range(st.nt):
                E, Tg, T, h = ref.step(E, Tg, j, F + path[y * st.nt + j])
                Es.append(E.copy())
                Ts.append(T.copy())
            E_avg = np.mean(Es, axis=0)
            T_avg = np.mean(Ts, axis=0)
            # same reductions transitions applies to its seasonal store
            mean_E = float(hemispheric_mean(E_avg, x))
            mean_T = float(hemispheric_mean(T_avg, x))
            area = 2.0 * np.pi * float(hemispheric_mean(
                (E_avg < 0.0).astype(np.float64), x))
            assert abs(res.tracked["E"][y, 0] - mean_E) < 1e-7, y
            assert abs(res.tracked["T"][y, 0] - mean_T) < 1e-7, y
            assert res.areas[y, 0] == pytest.approx(area, abs=1e-10)

    def test_keying_contract_is_chunk_free(self):
        """The numpy path depends only on (seed, member, absolute year) —
        re-deriving years 2..3 standalone equals slicing a 4-year path."""
        full = _numpy_ou_path(3, 1, 4, 200, 2.0, 0.05)
        nt = 200
        # recompute the tail with the eta carried over (the year0 resume
        # contract): same draws, same recursion
        base = jax.random.PRNGKey(3)
        mkey = jax.random.fold_in(base, 1)
        rho = float(np.exp(-(1.0 / nt) / 0.05))
        scale = 2.0 * float(np.sqrt(1.0 - rho * rho))
        eta = full[2 * nt - 1]
        out = []
        for y in (2, 3):
            xi = np.asarray(jax.random.normal(
                jax.random.fold_in(mkey, y), (nt,), jnp.float64))
            for z in xi:
                eta = rho * eta + scale * float(z)
                out.append(eta)
        np.testing.assert_array_equal(np.asarray(out), full[2 * nt:])


class TestKramers:
    def test_arrhenius_scaling(self):
        """ln(escape rate) ~ a - b / sigma^2 in the low-noise regime.

        Classic at F=6.5 (a deeper warm basin than the F=5.5 escape tests
        — there the activation regime sits below sigma~9 where 300 years
        yield no escapes). Pinned measurement (module docstring): rates
        increase 2.1e-4 -> 2.0e-3 over sigma 9 -> 13 with ln-rate vs
        1/sigma^2 correlation -0.9994."""
        st, par, mk = _classic_setup()
        F = 6.5
        warm = ebm.equilibrate("Classic", st, F, par, mk(30.0),
                               max_years=120, tol=2.0)
        snow = ebm.equilibrate("Classic", st, F, par, mk(-30.0),
                               max_years=120, tol=2.0)
        assert warm.converged and snow.converged
        levels = np.array([9.0, 11.0, 13.0])
        reps = 32
        sigma = np.repeat(levels, reps)
        r = transitions("Classic", st, F, par, warm, snow, sigma=sigma,
                        tau=0.05, years=300, K=sigma.size, seed=0)
        assert r.newton_ok
        rates = []
        for i in range(levels.size):
            sl = slice(i * reps, (i + 1) * reps)
            fin = r.finite[sl]
            esc = r.escaped[sl] & fin
            obs = np.where(esc, r.first_passage[sl], float(r.years))
            rates.append(np.count_nonzero(esc) / obs[fin].sum())
        rates = np.array(rates)
        # activated regime: every level produced escapes, strictly more
        # per member-year the stronger the noise
        assert np.all(rates > 0.0)
        assert np.all(np.diff(rates) > 0.0)
        # Arrhenius: ln(rate) linear in 1/sigma^2 (negative slope, tight
        # correlation; measured -0.9994 at this seed)
        xs = 1.0 / levels**2
        lr = np.log(rates)
        slope = np.polyfit(xs, lr, 1)[0]
        corr = np.corrcoef(xs, lr)[0, 1]
        assert slope < 0.0
        assert corr < -0.98
