"""Pinned facts of the MIZ saddle hunt (VERDICT r3 #5).

Round 2's bistability_map sweep concluded "MIZ has no real hysteresis
window at defaults" from leg gaps < 0.1 over F in [-6, 8], D in
[0.05, 0.7]. The round-4 hunt (scripts/miz_saddle_hunt.py, artifact
scripts/miz_saddle_hunt.json) shows that conclusion was an artifact of
the BOX, not the model: the forcing path never went cold enough to enter
the snowball. Extending the path below F ~ -12 reveals a wide snowball
hysteresis window at the reference's own default parameters — measured
at nx=40/nt=1000 f64: D=0.6 bistable for F in [-16, +8] and beyond,
D=0.45 for [-18, +8], D=0.3 for [-22, +8], while D <= 0.2 is monostable
everywhere in the box (the snowball branch does not survive at weak
diffusion: each latitude thaws on its own as soon as local insolation
allows, instead of the albedo feedback being shared globally).

These tests pin the smallest-grid version of those facts (nx=16, the
probe grid that agrees with nx=40 on every qualitative call) plus the
saddle produced between the coexisting states. All marked slow: each
runs hundreds of implicit-coupled MIZ years on CPU f64.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402

pytestmark = pytest.mark.slow

NX, NT = 16, 1000


def _st():
    return ebm.SpaceTime.sin(NX, NT, 1)


def _par(D):
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    par["D"] = float(D)
    return par


def _attractors(st, par, F, deep=-24.0):
    """The two candidate attractors AT forcing F: the warm branch
    (equilibrated from the standard init) and the snowball branch
    (continued up from a deep freeze — warm starts keep the solve in
    the snowball's basin iff that basin exists at F)."""
    kw = dict(tol=1e-3, max_years=400)
    warm = ebm.equilibrate("MIZ", st, F, par, ebm.zeros_init(st), **kw)
    cold = ebm.continuation("MIZ", st, np.array([deep, F]), par,
                            ebm.zeros_init(st), **kw)
    return warm, cold.results[-1]


def _area(res, st):
    from energybalancemodel_jl_tpu.fold import seasonal_ice_area

    return float(np.asarray(
        seasonal_ice_area(res.seasonal.avg, st)).reshape(-1)[0])


class TestSnowballWindow:
    def test_default_D_is_bistable_at_F0(self):
        """At the reference defaults (D=0.6) and F=0, the warm branch and
        the snowball coexist: the state continued up from F=-24 stays
        fully ice-covered while the standard init equilibrates nearly
        ice-free (measured leg gap ~5 of a 2*pi max)."""
        st = _st()
        warm, cold = _attractors(st, _par(0.6), 0.0)
        a_w, a_c = _area(warm, st), _area(cold, st)
        assert a_w < 1.5, a_w
        assert a_c > 5.0, a_c

    def test_weak_diffusion_is_monostable(self):
        """At D=0.1 the same protocol lands both solves on the SAME
        attractor: the snowball branch does not exist there (measured
        gap 0 for D <= 0.2 over the whole F box)."""
        st = _st()
        warm, cold = _attractors(st, _par(0.1), 0.0)
        assert abs(_area(warm, st) - _area(cold, st)) < 0.5

    def test_round2_box_never_saw_the_snowball(self):
        """Reconciliation with the round-2 'no window' measurement: inside
        the old box (F >= -6) the descending warm branch never freezes,
        so a return leg started there cannot be on the snowball branch —
        the window was invisible, not absent."""
        st = _st()
        par = _par(0.6)
        down = ebm.continuation(
            "MIZ", st, np.array([8.0, 0.0, -6.0]), par,
            ebm.zeros_init(st), tol=1e-3, max_years=400)
        areas = np.asarray(down.ice_area()).reshape(3, -1)[:, 0]
        assert areas[-1] < 3.0, areas  # still mostly open at F=-6


class TestSnowballSaddle:
    def test_edge_state_is_an_unstable_boundary_object(self):
        """The edge state between the coexisting attractors at (D=0.6,
        F=0) is a genuine UNSTABLE boundary object: its ice area lies
        strictly between the attractors' and the year-map spectrum at the
        state (side='right') carries at least one |lambda| > 1 escape
        mode. It is NOT a year-map fixed point — measured at this config
        the polish floors at ||year(x)-x|| ~ 1e2 enthalpy units (vs the
        classic boundary saddle's ~0.7) and boundary states escape within
        ~1-2 years: the MIZ snowball boundary is razor-thin through the
        thin-ice channel (per-step gain dTb/dEi ~ (Ti-Tw)/(Lf h)), so the
        middle branch is characterized by the boundary crossing
        (examples/miz_hysteresis.py), not by `unstable_branch`
        continuation (which is classic-only in practice — its polish
        lands on attractors here)."""
        st = _st()
        par = _par(0.6)
        warm, cold = _attractors(st, par, 0.0)
        saddle = ebm.edge_state("MIZ", st, par, warm.state, cold.state,
                                forcing=0.0, stages=3, tol=5.0)
        a_w, a_c = _area(warm, st), _area(cold, st)
        lo, hi = min(a_w, a_c), max(a_w, a_c)
        assert lo + 0.1 < saddle.area < hi - 0.1, (lo, saddle.area, hi)
        lam = np.abs(np.asarray(saddle.stability.eigenvalues))
        lam = lam[np.isfinite(lam)]
        assert lam.max() > 1.0, lam
