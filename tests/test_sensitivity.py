"""ebm.sensitivity: equilibrium parameter sensitivities in one reverse
pass (IFT adjoint through the year-map fixed point). FD-validated; no
reference analog (the reference reruns sweeps per parameter by hand)."""
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm

# nx=16/nt=150: an equilibrium WITH an active ice edge — at coarser
# configs (nx=12/nt=100 was tried) zeros_init lands on a fully frozen,
# locally FLAT attractor where every gradient (and the FD) is exactly
# zero and the parity assertions compare 0 == 0 (review r7)
ST = ebm.SpaceTime.sin(16, 150, 1)
KW = dict(tol=1e-9, max_years=500)


def _cfg():
    return (ebm.Collection(ebm.default_parameters("MIZ")),
            ebm.zeros_init(ST))


@pytest.fixture(scope="module")
def result():
    par, init = _cfg()
    return ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init, **KW)


class TestSensitivity:
    def test_gradient_matches_finite_difference(self, result):
        from energybalancemodel_jl_tpu.fold import seasonal_ice_area

        par, init = _cfg()

        def area_at(A):
            p = ebm.Collection(par)
            p["A"] = A
            eq = ebm.equilibrate("MIZ", ST, ebm.Forcing(0.0), p, init,
                                 tol=1e-9, max_years=400)
            return float(seasonal_ice_area(eq.seasonal.avg, ST))

        A0, eps = float(par["A"]), 1e-4
        fd = (area_at(A0 + eps) - area_at(A0 - eps)) / (2 * eps)
        np.testing.assert_allclose(result.grads["A"], fd, rtol=5e-3)

    def test_every_parameter_and_forcing_reported(self, result):
        par, _ = _cfg()
        for k in par:
            assert k in result.grads, k
            assert np.isfinite(result.grads[k]), k
        assert "F" in result.grads and np.isfinite(result.grads["F"])
        # the config must be gradient-ALIVE, or every comparison in this
        # file is vacuous (review r7)
        assert any(abs(result.grads[k]) > 1e-6 for k in result.grads)

    def test_top_ranks_by_elasticity(self, result):
        rows = result.top(5)
        mags = [abs(e) for _, _, e in rows]
        assert mags == sorted(mags, reverse=True)
        assert "SensitivityResult" in repr(result)
        assert np.isfinite(result.value) and result.value > 0

    def test_wrt_subset(self):
        par, init = _cfg()
        res = ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                              wrt=("A", "D", "F"), **KW)
        assert sorted(res.grads) == ["A", "D", "F"]

    def test_mean_objective(self):
        par, init = _cfg()
        res = ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                              of="mean", var="E", **KW)
        assert res.of == "mean(E)"
        assert np.isfinite(res.value)
        assert np.isfinite(res.grads["A"])
        # warming forcing raises mean enthalpy: dg/dF > 0
        assert res.grads["F"] > 0

    def test_ensemble_members_match_solo(self):
        # lockstep vmapped members == independent solo calls: sweep the
        # virtual forcing key and compare per-member grads
        par, init = _cfg()
        par["F"] = np.array([0.0, 1.0])
        ens = ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                              **KW)
        assert np.asarray(ens.value).shape == (2,)
        assert np.asarray(ens.grads["A"]).shape == (2,)
        for i, F in enumerate((0.0, 1.0)):
            solo = ebm.sensitivity("MIZ", ST, ebm.Forcing(F), _cfg()[0],
                                   init, **KW)
            np.testing.assert_allclose(ens.value[i], solo.value,
                                       rtol=1e-10)
            np.testing.assert_allclose(ens.grads["A"][i], solo.grads["A"],
                                       rtol=1e-7)
            np.testing.assert_allclose(ens.grads["F"][i], solo.grads["F"],
                                       rtol=1e-6)
        # ranking and repr handle member axes
        rows = ens.top(3)
        assert len(rows) == 3
        assert "members" in repr(ens)

    def test_scalar_F_in_par_folds_into_forcing(self):
        par, init = _cfg()
        par["F"] = 1.0
        res = ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init, **KW)
        base = ebm.sensitivity("MIZ", ST, ebm.Forcing(1.0), _cfg()[0],
                               init, **KW)
        np.testing.assert_allclose(res.value, base.value, rtol=1e-10)


class TestSensitivityValidation:
    def test_ramp_forcing_rejected(self):
        par, init = _cfg()
        ramp = ebm.Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        with pytest.raises(ValueError, match="constant"):
            ebm.sensitivity("MIZ", ST, ramp, par, init)

    def test_inconsistent_ensemble_sizes_rejected(self):
        par, init = _cfg()
        par["D"] = np.array([0.5, 0.6])
        par["A"] = np.array([193.0, 195.0, 197.0])
        with pytest.raises(ValueError, match="inconsistent"):
            ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init)

    def test_classic_ice_area_rejected(self):
        par = ebm.Collection(ebm.default_parameters("Classic"))
        E0 = np.full(ST.nx, 40.0)
        init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
        with pytest.raises(ValueError, match="zero gradient"):
            ebm.sensitivity("Classic", ST, ebm.Forcing(2.0), par, init)

    def test_mean_needs_known_var(self):
        par, init = _cfg()
        with pytest.raises(ValueError, match="var="):
            ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                            of="mean")

    def test_unknown_objective(self):
        par, init = _cfg()
        with pytest.raises(ValueError, match="unknown objective"):
            ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                            of="nope")

    def test_unknown_wrt(self):
        par, init = _cfg()
        with pytest.raises(ValueError, match="wrt"):
            ebm.sensitivity("MIZ", ST, ebm.Forcing(0.0), par, init,
                            wrt=("nope",), **KW)


class TestPlotSensitivity:
    """plot_sensitivity renders tornado charts from synthetic results
    (matplotlib Agg; the solve itself is covered above)."""

    @staticmethod
    def _synthetic(K=1):
        rng = np.random.default_rng(3)
        shape = () if K == 1 else (K,)
        grads = ebm.Collection({
            "A": rng.standard_normal(shape) - 2.0,
            "D": rng.standard_normal(shape) + 5.0,
            "Tm": rng.standard_normal(shape) * 0.01,
            "F": rng.standard_normal(shape),
        })
        par = ebm.Collection(A=193.0, D=0.5, Tm=273.15)
        value = 2.5 if K == 1 else np.full((K,), 2.5)
        return ebm.SensitivityResult(of="ice_area", value=value,
                                     grads=grads, par=par)

    def test_solo_bars_and_ranking(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        res = self._synthetic()
        fig = ebm.plot_sensitivity(res, n=3)
        ax = fig.axes[0]
        labels = [t.get_text() for t in ax.get_yticklabels()]
        assert len(labels) == 3
        assert labels[0] == res.top(1)[0][0]  # ranking agrees with top()
        assert "elasticity" in ax.get_xlabel()
        import matplotlib.pyplot as plt
        plt.close(fig)

    def test_raw_mode_and_ensemble_dots(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        res = self._synthetic(K=4)
        fig = ebm.plot_sensitivity(res, raw=True)
        ax = fig.axes[0]
        assert "dg/dp" in ax.get_xlabel()
        # one dot-line per parameter row (ensemble spread)
        dot_lines = [ln for ln in ax.lines if ln.get_marker() == "."]
        assert len(dot_lines) == len(res.grads)
        # raw=True ranks by |gradient|: D's ~5 beats Tm's elasticity win
        labels = [t.get_text() for t in ax.get_yticklabels()]
        assert labels[0] == "D"
        plt.close(fig)

    def test_empty_grads_rejected(self):
        res = ebm.SensitivityResult(of="ice_area", value=0.0,
                                    grads=ebm.Collection(),
                                    par=ebm.Collection())
        with pytest.raises(ValueError, match="no gradients"):
            ebm.plot_sensitivity(res)
