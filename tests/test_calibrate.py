"""Gradient-based calibration (calibrate.py) — no reference analog."""
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm


def classic_setup():
    st = ebm.SpaceTime.sin(30, 1000, 1)
    base = ebm.default_parameters("Classic")
    E0 = np.full(st.nx, 40.0)  # ice-free warm init: smooth, convex misfit
    init = ebm.Collection(E=E0, Tg=E0 / float(base["cw"]))
    return st, base, init


class TestCalibrate:
    def test_classic_recovers_olr_constant(self):
        """Synthetic-target identification: generate the target with
        A = 196, start the fit at the default A = 193, recover it."""
        st, base, init = classic_setup()
        par_true = ebm.Collection(base)
        par_true["A"] = 196.0
        sols = ebm.integrate("Classic", st, ebm.Forcing(0.0), par_true, init,
                             progress=False, raw_mode="none")
        target = {"E": np.asarray(sols.seasonal.avg["E"][-1])}

        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, target=target,
                            vary=("A",), steps=120, learning_rate=0.1)
        assert abs(float(res.params["A"]) - 196.0) < 0.05
        assert res.losses[-1] < 1e-6 * res.losses[0]
        # the fitted par Collection reproduces under the standard driver
        refit = ebm.integrate("Classic", st, ebm.Forcing(0.0), res.par, init,
                              progress=False, raw_mode="none")
        np.testing.assert_allclose(
            np.asarray(refit.seasonal.avg["E"][-1]), target["E"], atol=1e-2
        )
        assert "A=" in repr(res)

    def test_miz_descends_with_finite_grads(self):
        """MIZ misfit landscapes are jagged in the parameters (module
        docstring), so assert the DESCENT property, not global recovery:
        loss decreases and gradients stay finite through the implicit-diff
        Newton VJP."""
        st = ebm.SpaceTime.sin(24, 150, 1)
        base = ebm.default_parameters("MIZ")
        sols = ebm.integrate("MIZ", st, ebm.Forcing(0.0), base,
                             ebm.zeros_init(st), progress=False,
                             raw_mode="none")
        target = {"E": np.nan_to_num(np.asarray(sols.seasonal.avg["E"][-1])) + 1.0}
        par0 = ebm.Collection(base)
        par0["D"] = 0.58
        res = ebm.calibrate("MIZ", st, ebm.Forcing(0.0), par0,
                            ebm.zeros_init(st), target=target,
                            vary=("D", "A"), steps=10, learning_rate=1e-3)
        assert np.isfinite(res.losses).all()
        assert res.losses[-1] < res.losses[0]
        assert np.isfinite(float(res.grads["D"]))
        assert np.isfinite(float(res.grads["A"]))

    def test_custom_loss(self):
        """A callable objective over the final year's Seasonal store."""
        import jax.numpy as jnp

        st, base, init = classic_setup()

        def loss(seasonal):
            # drive the global-mean enthalpy toward 45
            return (jnp.mean(seasonal.avg["E"]) - 45.0) ** 2

        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, loss=loss,
                            vary=("A",), steps=80, learning_rate=0.5)
        assert res.losses[-1] < 1e-3 * res.losses[0]

    def test_nan_target_is_harmless(self):
        """The module's own usage example passes a T target; seasonal avg T
        carries presentation NaNs — they must contribute zero, not poison
        the loss (review r2)."""
        st, base, init = classic_setup()
        target = {"T": np.full(st.nx, np.nan)}
        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, target=target,
                            vary=("A",), steps=2, learning_rate=0.01)
        assert np.isfinite(res.losses).all()
        assert np.isfinite(float(res.params["A"]))

    def test_one_sided_nan_cells_are_masked(self):
        """A cell that is NaN in the target but finite in the prediction
        (ice edge moved) must be EXCLUDED from the misfit, not scored
        against 0.0 (review r3)."""
        import jax.numpy as jnp

        from energybalancemodel_jl_tpu.calibrate import _default_loss
        from energybalancemodel_jl_tpu.solutions import Seasonal
        from energybalancemodel_jl_tpu.utils.collection import Collection

        pred = jnp.array([5.0, 2.0, 3.0])
        tgt = np.array([np.nan, 2.0, 3.0])  # cell 0: target-side NaN only
        seasonal = Seasonal(
            winter=Collection(T=pred), summer=Collection(T=pred),
            avg=Collection(T=pred),
        )
        loss = _default_loss({"T": tgt})(seasonal)
        # matched finite cells agree -> exact zero; the old one-sided
        # zeroing scored (5.0 - 0)^2 / 3 here
        assert float(loss) == 0.0

    def test_steps_zero_repr(self):
        st, base, init = classic_setup()
        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init,
                            target={"E": np.zeros(st.nx)}, vary=("A",),
                            steps=0)
        assert "0 steps" in repr(res)
        assert float(res.params["A"]) == float(base["A"])

    def test_explicit_f64_without_x64_raises(self, monkeypatch):
        from types import SimpleNamespace

        import sys

        # the package exports the FUNCTION under the same name, shadowing
        # the submodule attribute — resolve the module via sys.modules
        cal_mod = sys.modules["energybalancemodel_jl_tpu.calibrate"]

        st, base, init = classic_setup()
        # jax.config.jax_enable_x64 has no setter; stub the module's view
        monkeypatch.setattr(
            cal_mod, "jax",
            SimpleNamespace(config=SimpleNamespace(jax_enable_x64=False)),
        )
        with pytest.raises(ValueError, match="jax_enable_x64"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target={"E": np.zeros(st.nx)}, vary=("A",),
                          dtype="float64")

    def test_validation(self):
        st, base, init = classic_setup()
        with pytest.raises(ValueError, match="exactly one"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init)
        with pytest.raises(ValueError, match="not in par"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target={"E": np.zeros(st.nx)}, vary=("bogus",))
        with pytest.raises(ValueError, match="target variables"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target={"nope": np.zeros(st.nx)}, vary=("A",))


class TestMultiStart:
    """Multi-start calibration: S vmapped optimizations in one compiled
    program, best final loss wins (the on-chip sweep-then-polish recipe)."""

    def test_classic_multistart_recovers_and_reports(self):
        st, base, init = classic_setup()
        par_true = ebm.Collection(base)
        par_true["A"] = 196.0
        sols = ebm.integrate("Classic", st, ebm.Forcing(0.0), par_true, init,
                             progress=False, raw_mode="none")
        target = {"E": np.asarray(sols.seasonal.avg["E"][-1])}
        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, target=target,
                            vary=("A",), steps=60, learning_rate=0.3,
                            n_starts=3, start_spread=0.02, seed=1)
        assert res.best is not None and 0 <= res.best < 3
        assert res.start_losses.shape == (3,)
        assert np.asarray(res.start_params["A"]).shape == (3,)
        assert res.losses.shape == (60,)
        # the reported best IS the argmin of the final per-start losses
        assert res.best == int(np.argmin(res.start_losses))
        assert abs(float(res.params["A"]) - 196.0) < 0.5
        assert "starts" in repr(res)

    def test_theta0_explicit_starts(self):
        st, base, init = classic_setup()
        target = {"E": np.full(st.nx, 40.0)}
        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, target=target,
                            vary=("A", "B"), steps=2, learning_rate=0.05,
                            theta0={"A": np.array([192.0, 194.0]),
                                    "B": np.array([2.0, 2.2])})
        assert res.start_losses.shape == (2,)
        assert np.isfinite(res.start_losses).all()

    def test_equilibrium_multistart(self):
        """vmap composes with the implicit-gradient fixed point."""
        st = ebm.SpaceTime.sin(16, 150, 1)
        base = ebm.default_parameters("MIZ")
        truth = ebm.Collection(base)
        truth["A"] = 195.5
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), truth,
                             ebm.zeros_init(st), tol=1e-8, max_years=400)
        res = ebm.calibrate("MIZ", st, ebm.Forcing(0.0), ebm.Collection(base),
                            ebm.zeros_init(st),
                            target={"E": np.asarray(eq.seasonal.avg["E"])},
                            vary=("A",), steps=10, learning_rate=0.3,
                            equilibrium=True, equilibrium_tol=1e-8,
                            equilibrium_max_years=400,
                            theta0={"A": np.array([194.0, 195.4])})
        assert np.isfinite(res.start_losses).all()
        assert res.losses.shape == (10,)

    def test_diverged_start_never_wins(self):
        """A start that drives the run non-finite (cw -> 0 divides the
        classic temperature by zero) must not be selected as best: its
        NaN prediction is an infinite loss under the default objective
        (not a masked-to-zero one), and non-finite losses/fitted values
        are excluded from the argmin."""
        st, base, init = classic_setup()
        target = {"E": np.full(st.nx, 40.0)}
        res = ebm.calibrate("Classic", st, ebm.Forcing(0.0),
                            ebm.Collection(base), init, target=target,
                            vary=("cw",), steps=3, learning_rate=1e-4,
                            theta0={"cw": np.array([float(base["cw"]), 0.0])})
        assert res.best == 0
        assert np.isfinite(float(res.params["cw"]))
        assert not np.isfinite(res.start_losses[1])

    def test_divergence_penalty_vs_presentation_mask(self):
        """NaN predictions: infinite loss for ordinary variables
        (divergence), masked out for presentation-NaN variables."""
        import jax.numpy as jnp

        from energybalancemodel_jl_tpu.calibrate import _default_loss
        from energybalancemodel_jl_tpu.solutions import Seasonal
        from energybalancemodel_jl_tpu.utils.collection import Collection

        pred = jnp.array([np.nan, 2.0, 3.0])
        tgt = np.array([1.0, 2.0, 3.0])
        seasonal = Seasonal(
            winter=Collection(E=pred, Ti=pred),
            summer=Collection(E=pred, Ti=pred),
            avg=Collection(E=pred, Ti=pred),
        )
        assert float(_default_loss({"E": tgt}, nan_ok=("Ti", "Tw"))(
            seasonal)) == np.inf
        assert float(_default_loss({"Ti": tgt}, nan_ok=("Ti", "Tw"))(
            seasonal)) == 0.0

    def test_multistart_validation(self):
        st, base, init = classic_setup()
        t = {"E": np.zeros(st.nx)}
        with pytest.raises(ValueError, match="n_starts must be"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target=t, vary=("A",), n_starts=0)
        with pytest.raises(ValueError, match="missing varied names"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target=t, vary=("A", "B"),
                          theta0={"A": np.array([1.0])})
        with pytest.raises(ValueError, match="share one length"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target=t, vary=("A", "B"),
                          theta0={"A": np.array([1.0, 2.0]),
                                  "B": np.array([1.0, 2.0, 3.0])})
        with pytest.raises(ValueError, match="conflicts with theta0"):
            ebm.calibrate("Classic", st, ebm.Forcing(0.0), base, init,
                          target=t, vary=("A",), n_starts=3,
                          theta0={"A": np.array([1.0, 2.0])})
