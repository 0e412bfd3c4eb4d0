"""Oracle-anchored validation of the equilibrium layer (VERDICT r2 #7).

The dynamical-systems layer (equilibrate / sensitivity) was previously
validated only intra-framework — dense ``jacrev`` spectra and finite
differences OF THE SAME PRIMAL. These tests anchor it to
``tests/ref_impl.py``, the independent NumPy/SciPy transcription of the
reference equations with a different solver (SciPy hybr vs the
framework's Newton): the oracle is integrated to its attractor by brute
force and compared against

- the fixed point :func:`equilibrate` converges to (one test per model),
- :func:`sensitivity`'s one-reverse-pass IFT adjoint, against a central
  finite difference of the ORACLE's equilibrium (classic, ice-free —
  where the model is linear, the FD is clean, and the analytic answer
  ``d<E>/dA = -cw/B`` pins BOTH implementations independently).

Tolerances are physical, not numerical: the classic attractor carries
the documented O(1) albedo-hole wobble at ice-edge cells (CLAUDE.md),
so classic state fields compare at that scale (measured max |dE| = 1.53
between a 300-year oracle run and the equilibrate fixed point); the MIZ
attractor is tight (measured max |dE| = 0.0054, |dphi| = 2.2e-6).

Normalization note: the reference's ``hemispheric_mean``
(/root/reference/src/utilities.jl:397-403) is a trapezoid INTEGRAL over
x; ``sensitivity(of="mean")`` divides by the cell-center span
``x[-1]-x[0]`` to report a mean — the oracle side below matches that
definition (a mismatch here once masqueraded as a 12% "error").
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import energybalancemodel_jl_tpu as ebm  # noqa: E402
from energybalancemodel_jl_tpu.fold import seasonal_ice_area  # noqa: E402
from energybalancemodel_jl_tpu.utils.numerics import \
    hemispheric_mean  # noqa: E402
from ref_impl import ClassicRef, MIZRef  # noqa: E402


def _classic_oracle_year_averages(par, forcing, years, nx, nt, E0,
                                  grid="sin"):
    """Integrate the oracle classic model ``years`` years; return the
    final year's per-step-averaged E, the final carry (E, Tg), and the
    final year's minimum E (ice detector)."""
    ref = ClassicRef(nx, nt, grid, dict(par))
    E = np.full(nx, float(E0))
    Tg = E / float(par["cw"])
    Esum, Emin = np.zeros(nx), np.inf
    for _ in range(years):
        Esum, Emin = np.zeros(nx), np.inf
        for i in range(nt):
            E, Tg, _, _ = ref.step(E, Tg, i, forcing)
            Esum += E
            Emin = min(Emin, float(E.min()))
    return Esum / nt, E, Tg, Emin


class TestClassicEquilibriumOracle:
    NX, NT, F = 8, 1000, 10.0

    def test_warm_fixed_point_matches_oracle(self):
        st = ebm.SpaceTime.sin(self.NX, self.NT, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        avg_o, E_o, _, _ = _classic_oracle_year_averages(
            par, self.F, 150, self.NX, self.NT, E0=40.0)
        eq = ebm.equilibrate(
            "Classic", st, self.F, par,
            ebm.Collection(E=np.full(self.NX, 40.0),
                           Tg=np.full(self.NX, 40.0) / float(par["cw"])),
            tol=0.5, max_years=300)
        assert bool(np.asarray(eq.converged))
        avg_f = np.asarray(eq.seasonal.avg["E"])
        # same attractor up to the albedo-hole wobble (O(1) at ice-edge
        # cells; measured 1.53 for this config)
        assert float(np.max(np.abs(avg_o - avg_f))) < 2.5
        assert float(np.max(np.abs(E_o - np.asarray(eq.state["E"])))) < 2.5
        # the ice-area diagnostic is cell-quantized at nx=8 and must
        # agree EXACTLY (both sit at the warm attractor, area 1.0538)
        area_o = 2.0 * np.pi * float(hemispheric_mean(
            (avg_o < 0.0).astype(np.float64), st.x))
        area_f = float(seasonal_ice_area(eq.seasonal.avg, st))
        assert abs(area_o - area_f) < 1e-9
        assert abs(area_f - 1.0538) < 0.05


class TestMIZEquilibriumOracle:
    NX, NT = 16, 150

    def test_fixed_point_matches_oracle(self):
        st = ebm.SpaceTime.sin(self.NX, self.NT, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        out = MIZRef(self.NX, self.NT, "sin", dict(par)).run(
            100 * self.NT, forcing_value=0.0)
        avg_E_o = out["E"][-self.NT:].mean(axis=0)
        avg_phi_o = np.nan_to_num(out["phi"][-self.NT:]).mean(axis=0)
        eq = ebm.equilibrate("MIZ", st, 0.0, par, ebm.zeros_init(st),
                             tol=1e-3, max_years=200)
        assert bool(np.asarray(eq.converged))
        avg_E_f = np.asarray(eq.seasonal.avg["E"])
        avg_phi_f = np.nan_to_num(np.asarray(eq.seasonal.avg["phi"]))
        # the MIZ attractor is tight: measured 0.0054 / 2.2e-6 / 7.7e-7
        assert float(np.max(np.abs(avg_E_o - avg_E_f))) < 0.05
        assert float(np.max(np.abs(avg_phi_o - avg_phi_f))) < 1e-4
        area_o = 2.0 * np.pi * float(hemispheric_mean(avg_phi_o, st.x))
        area_f = float(seasonal_ice_area(eq.seasonal.avg, st))
        assert abs(area_o - area_f) < 1e-3


class TestSensitivityOracleFD:
    """The IFT adjoint against an oracle finite difference that shares
    NOTHING with the framework's primal — and against the analytic
    answer, which pins both."""

    NX, NT, F = 8, 1000, 45.0  # ice-free at this forcing: E > 37 all year

    def _oracle_mean_E(self, par, A, st):
        p = ebm.Collection(par)
        p["A"] = A
        avg, _, _, Emin = _classic_oracle_year_averages(
            p, self.F, 120, self.NX, self.NT, E0=100.0)
        assert Emin > 0.0, "config must stay ice-free for a clean FD"
        # sensitivity(of='mean') normalizes the trapezoid integral by
        # the cell-center span — match that definition exactly
        x = st.x
        return float(hemispheric_mean(avg, x)) / float(x[-1] - x[0])

    def test_adjoint_matches_oracle_fd_and_analytic(self):
        st = ebm.SpaceTime.sin(self.NX, self.NT, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        A0, h = float(par["A"]), 0.5
        fd = (self._oracle_mean_E(par, A0 + h, st)
              - self._oracle_mean_E(par, A0 - h, st)) / (2.0 * h)
        init = ebm.Collection(
            E=np.full(self.NX, 100.0),
            Tg=np.full(self.NX, 100.0) / float(par["cw"]))
        sens = ebm.sensitivity("Classic", st, self.F, par, init,
                               of="mean", var="E", wrt=["A"])
        grad = float(np.asarray(sens.grads["A"]))
        # cross-implementation: measured agreement ~2e-4 relative
        assert grad == pytest.approx(fd, rel=2e-3)
        # analytic: the ice-free classic model is linear and its
        # annual-hemispheric-mean energy obeys d<E>/dA = -cw/B exactly
        assert grad == pytest.approx(
            -float(par["cw"]) / float(par["B"]), rel=1e-3)
