"""Persistence tests: save/load round-trips, collision rename, safehouse
integration (reference semantics /root/reference/src/io.jl)."""
import os

import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm


@pytest.fixture
def sols():
    st = ebm.SpaceTime.sin(12, 20, 2)
    return ebm.integrate(
        "MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
        ebm.zeros_init(st), progress=False,
    )


class TestRoundTrip:
    def test_solutions(self, sols, tmp_path):
        path = str(tmp_path / "sols.h5")
        assert ebm.save(sols, path) == path
        loaded = ebm.load(path)
        assert loaded.spacetime == sols.spacetime
        assert loaded.forcing.constant and loaded.forcing.base == 0.0
        assert loaded.lastonly == sols.lastonly
        for k in sols.raw:
            np.testing.assert_array_equal(loaded.raw[k], sols.raw[k], err_msg=k)
        for season in ("winter", "summer", "avg"):
            for k in sols.raw:
                np.testing.assert_array_equal(
                    getattr(loaded.seasonal, season)[k],
                    getattr(sols.seasonal, season)[k],
                )
        for k in sols.parameters:
            assert loaded.parameters[k] == sols.parameters[k]

    def test_ramp_forcing_roundtrip(self, tmp_path):
        st = ebm.SpaceTime.sin(8, 400, 4)
        ramp = ebm.Forcing(0.0, 2.0, -2.0, (1, 1), (2.0, -2.0))
        sols = ebm.integrate("MIZ", st, ramp, ebm.default_parameters("MIZ"),
                             ebm.zeros_init(st), progress=False)
        path = str(tmp_path / "r.h5")
        ebm.save(sols, path)
        loaded = ebm.load(path)
        assert loaded.forcing.domain == ramp.domain
        assert not loaded.forcing.constant

    def test_string_and_array(self, tmp_path):
        p1 = str(tmp_path / "s.h5")
        ebm.save("Hello World", p1)
        assert ebm.load(p1) == "Hello World"
        p2 = str(tmp_path / "a.h5")
        arr = np.arange(12.0).reshape(3, 4)
        ebm.save(arr, p2)
        np.testing.assert_array_equal(ebm.load(p2), arr)

    def test_dict(self, tmp_path):
        p = str(tmp_path / "d.h5")
        ebm.save(ebm.Collection(a=1.0, b=np.ones(3)), p)
        out = ebm.load(p)
        assert out["a"] == 1.0
        np.testing.assert_array_equal(out["b"], np.ones(3))


class TestCollisionSemantics:
    def test_existing_file_renamed(self, tmp_path):
        """The EXISTING file is renamed, the new object lands at the original
        path (reference /root/reference/src/io.jl:37-52)."""
        path = str(tmp_path / "greeting.h5")
        ebm.save("Hello World", path)
        with pytest.warns(UserWarning, match="has been renamed"):
            ebm.save("Hello again", path)
        assert ebm.load(path) == "Hello again"
        renamed = [f for f in os.listdir(tmp_path) if f.startswith("greeting_")]
        assert len(renamed) == 1
        assert ebm.load(str(tmp_path / renamed[0])) == "Hello World"

    def test_unsafesave_warns(self, tmp_path):
        with pytest.warns(UserWarning, match="unsafesave"):
            ebm.unsafesave("x", str(tmp_path / "x.h5"))


class TestLoadInto:
    def test_houses_existing(self, tmp_path):
        path = str(tmp_path / "v.h5")
        ebm.save("new value", path)
        ns = {"v": "old value"}
        with pytest.warns(UserWarning, match="safehouse"):
            ebm.load_into("v", path, ns)
        assert ns["v"] == "new value"
        housed = ebm.retrieve("v", ebm.safehouse(ns))
        assert housed[-1].value == "old value"

    def test_fresh_name_no_warning(self, tmp_path):
        path = str(tmp_path / "v.h5")
        ebm.save("value", path)
        ns = {}
        out = ebm.load_into("v", path, ns)
        assert out == "value" and ns["v"] == "value"


class TestEnsembleRoundTrip:
    def test_ensemble_solutions(self, tmp_path):
        from energybalancemodel_jl_tpu.parallel import ensemble_integrate
        from energybalancemodel_jl_tpu.parallel.ensemble import batched_parameters

        st = ebm.SpaceTime.sin(10, 20, 2)
        par_b = batched_parameters(ebm.default_parameters("MIZ"), {"D": [0.5, 0.7]})
        ens = ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par_b,
                                 ebm.zeros_init(st), raw_mode="last")
        path = str(tmp_path / "ens.h5")
        ebm.save(ens, path)
        loaded = ebm.load(path)
        assert loaded.n_members == 2
        assert loaded.spacetime == ens.spacetime
        np.testing.assert_array_equal(loaded.parameters["D"], [0.5, 0.7])
        for k in ("E", "phi"):
            np.testing.assert_array_equal(
                loaded.seasonal.avg[k], ens.seasonal.avg[k], err_msg=k
            )
            np.testing.assert_array_equal(loaded.raw[k], ens.raw[k], err_msg=k)


class TestEquilibriumRoundTrip:
    """EquilibriumResult / ContinuationResult persistence (no reference
    analog — the reference only persists trajectories)."""

    def test_equilibrium_solo(self, tmp_path):
        st = ebm.SpaceTime.sin(10, 100, 1)
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                             ebm.default_parameters("MIZ"),
                             ebm.zeros_init(st), tol=0.0, max_years=3)
        path = str(tmp_path / "eq.h5")
        ebm.save(eq, path)
        loaded = ebm.load(path)
        assert type(loaded).__name__ == "EquilibriumResult"
        assert loaded.years == eq.years and loaded.tol == eq.tol
        assert isinstance(loaded.resid, float)
        assert isinstance(loaded.converged, bool)
        assert loaded.member_years is None
        for k in eq.state:
            np.testing.assert_array_equal(
                np.asarray(loaded.state[k]), np.asarray(eq.state[k]),
                err_msg=k)
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(loaded.seasonal.avg["E"])),
            np.nan_to_num(np.asarray(eq.seasonal.avg["E"])))
        # the loaded state warm-starts a continuation, as documented
        eq2 = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                              ebm.default_parameters("MIZ"), loaded.state,
                              tol=0.0, max_years=1)
        assert eq2.years == 1

    def test_equilibrium_ensemble(self, tmp_path):
        st = ebm.SpaceTime.sin(10, 100, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["A"] = np.array([193.0, 196.0])
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                             ebm.zeros_init(st), tol=0.0, max_years=3)
        path = str(tmp_path / "eq_ens.h5")
        ebm.save(eq, path)
        loaded = ebm.load(path)
        assert loaded.member_years is not None
        np.testing.assert_array_equal(loaded.member_years, eq.member_years)
        np.testing.assert_array_equal(loaded.resid, eq.resid)
        np.testing.assert_array_equal(loaded.converged, eq.converged)

    def test_continuation(self, tmp_path):
        st = ebm.SpaceTime.sin(10, 100, 1)
        cont = ebm.continuation("MIZ", st, [0.0, 2.0],
                                ebm.default_parameters("MIZ"),
                                ebm.zeros_init(st), round_trip=True,
                                tol=0.0, max_years=2)
        path = str(tmp_path / "cont.h5")
        ebm.save(cont, path)
        loaded = ebm.load(path)
        assert type(loaded).__name__ == "ContinuationResult"
        assert loaded.vary == "F"
        assert loaded.spacetime == cont.spacetime
        np.testing.assert_array_equal(loaded.values, cont.values)
        np.testing.assert_array_equal(loaded.direction, cont.direction)
        assert len(loaded.results) == 3
        np.testing.assert_allclose(loaded.ice_area(), cont.ice_area())
        assert repr(loaded) == repr(cont)


class TestAnalysisResultRoundTrip:
    """StabilityResult / SensitivityResult persistence — every analysis
    object the package returns survives ebm.save/load."""

    def test_stability_roundtrip(self, tmp_path):
        st = ebm.SpaceTime.sin(10, 100, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["A"] = np.array([193.0, 196.0])
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                             ebm.zeros_init(st), tol=0.0, max_years=3)
        stab = ebm.stability("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                             n_iter=5, n_modes=2)
        path = str(tmp_path / "stab.h5")
        ebm.save(stab, path)
        back = ebm.load(path)
        assert isinstance(back, ebm.StabilityResult)
        np.testing.assert_array_equal(np.asarray(back.growth),
                                      np.asarray(stab.growth))
        np.testing.assert_array_equal(back.history, stab.history)
        np.testing.assert_array_equal(np.asarray(back.converged),
                                      np.asarray(stab.converged))
        assert back.n_modes == stab.n_modes and back.rtol == stab.rtol
        assert back.side == stab.side
        assert back.eigenvalues is not None
        np.testing.assert_array_equal(np.asarray(back.eigenvalues),
                                      np.asarray(stab.eigenvalues))
        assert np.asarray(back.eigenvalues).dtype == \
            np.asarray(stab.eigenvalues).dtype  # complex survives HDF5
        for k in stab.mode:
            np.testing.assert_array_equal(np.asarray(back.mode[k]),
                                          np.asarray(stab.mode[k]))
        assert repr(back) == repr(stab)

    def test_sensitivity_roundtrip(self, tmp_path):
        # SensitivityResult is a plain dataclass and the writer never
        # touches the solver — a synthetic instance exercises the
        # identical IO path in milliseconds where a real adjoint solve
        # costs minutes (the solve itself is covered by
        # test_sensitivity.py); shapes mirror a real ensemble result
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        rng = np.random.default_rng(0)
        grads = ebm.Collection(
            {k: rng.standard_normal(2) for k in list(par)[:5]})
        grads["F"] = rng.standard_normal(2)
        res = ebm.SensitivityResult(
            of="ice_area", value=np.asarray([2.5, 2.7]), grads=grads,
            par=ebm.Collection({k: par[k] for k in list(par)[:5]}))
        path = str(tmp_path / "sens.h5")
        ebm.save(res, path)
        back = ebm.load(path)
        assert isinstance(back, ebm.SensitivityResult)
        assert back.of == res.of
        np.testing.assert_allclose(np.asarray(back.value),
                                   np.asarray(res.value))
        for k in res.grads:
            np.testing.assert_allclose(back.grads[k], res.grads[k],
                                       err_msg=k)
        assert back.top(3)[0][0] == res.top(3)[0][0]
        assert repr(back) == repr(res)


class TestResultCompleteness:
    """Every public ``*Result`` type must survive ``ebm.save``/``ebm.load``
    (review r2: ``CalibrationResult`` shipped unpersistable and crashed on
    save). The factory registry below builds a small synthetic instance of
    each; a ``*Result`` name appearing in ``__all__`` without a factory
    FAILS the registry test, so the next result type cannot ship without a
    round-trip."""

    @staticmethod
    def _seasonal(rng, K=None):
        from energybalancemodel_jl_tpu.solutions import Seasonal
        shape = (3,) if K is None else (K, 3)
        mk = lambda: ebm.Collection(
            {v: rng.standard_normal(shape) for v in ("E", "T", "phi")})
        return Seasonal(winter=mk(), summer=mk(), avg=mk())

    @classmethod
    def _equilibrium(cls, rng, K=None):
        state = ebm.Collection(
            {v: rng.standard_normal((3,) if K is None else (K, 3))
             for v in ("E", "Tg")})
        return ebm.EquilibriumResult(
            state=state, seasonal=cls._seasonal(rng, K), years=7,
            resid=1e-4 if K is None else rng.random(K),
            converged=True if K is None else np.ones(K, dtype=bool),
            member_years=None if K is None else np.full(K, 7.0),
            newton_ok=True, tol=1e-3)

    @classmethod
    def factories(cls):
        st = ebm.SpaceTime.sin(3, 10, 1)
        par = ebm.Collection({"D": 0.5, "A": 193.0})
        rng = np.random.default_rng(7)
        state = lambda K=None: ebm.Collection(
            {v: rng.standard_normal((3,) if K is None else (K, 3))
             for v in ("E", "Tg")})
        return {
            "EquilibriumResult": lambda: cls._equilibrium(rng),
            "ContinuationResult": lambda: ebm.ContinuationResult(
                values=np.array([0.0, 1.0]),
                direction=np.array([1.0, 1.0]),
                results=[cls._equilibrium(rng) for _ in range(2)],
                vary="F", spacetime=st, model="MIZ", par=par,
                forcing=ebm.Forcing(0.0)),
            "StabilityResult": lambda: ebm.StabilityResult(
                growth=0.97, history=rng.random(5), converged=True,
                mode=state(), rtol=1e-6, n_modes=2,
                eigenvalues=np.array([0.97 + 0.01j, 0.9 - 0.01j]),
                side="right"),
            "SensitivityResult": lambda: ebm.SensitivityResult(
                of="ice_area", value=2.5,
                grads=ebm.Collection({"D": 0.1, "A": -0.2}), par=par),
            "CalibrationResult": lambda: ebm.CalibrationResult(
                params=ebm.Collection({"D": 0.55}), par=par,
                losses=rng.random(4),
                grads=ebm.Collection({"D": 1e-5}), best=1,
                start_params=ebm.Collection({"D": rng.random(3)}),
                start_losses=rng.random(3)),
            "FoldResult": lambda: ebm.FoldResult(
                lo=rng.random(2), hi=1.0 + rng.random(2),
                history=rng.random((4, 2, 2)),
                survived=np.ones((4, 2), dtype=bool),
                probe_converged=np.ones((4, 2), dtype=bool),
                vary="F", anchor=cls._equilibrium(rng, K=2),
                spacetime=st, par=par),
            "BasinResult": lambda: ebm.BasinResult(
                labels=np.array([0, 1, 0, -1]), areas=rng.random(4),
                centroids=np.array([0.1, 2.9]), counts=np.array([2, 1]),
                season="avg", gap=0.5,
                result=cls._equilibrium(rng, K=4), spacetime=st, par=par),
            "EdgeResult": lambda: ebm.EdgeResult(
                wa=rng.random(2), wb=1.0 + rng.random(2),
                history=rng.random((4, 2, 2)),
                in_a=np.ones((4, 2), dtype=bool),
                probe_converged=np.ones((4, 2), dtype=bool),
                probe_finite=np.ones((4, 2), dtype=bool),
                area_a=rng.random(2), area_b=2.0 + rng.random(2),
                a=state(), b=state(),
                result_a=cls._equilibrium(rng, K=2),
                result_b=cls._equilibrium(rng, K=2),
                spacetime=st, season="avg", par=par),
            "LyapunovResult": lambda: ebm.LyapunovResult(
                exponents=rng.standard_normal(2),
                history=rng.standard_normal((6, 2)),
                state=state(), modes=state(), transient=2, n_modes=2,
                years=6),
            "TransitionResult": lambda: ebm.TransitionResult(
                areas=rng.random((5, 3)),
                labels=rng.integers(-1, 2, (5, 3)).astype(np.int8),
                first_passage=np.array([2.0, np.nan, 4.0]),
                finite=np.array([True, True, False]),
                state=state(K=3), eta=rng.standard_normal(3),
                tracked=ebm.Collection({"E": rng.random((5, 3))}),
                area_a=np.array([0.8]), area_b=np.array([3.1]),
                start="a", sigma=6.0, tau=0.05, years=5, season="avg",
                seed=3, newton_ok=True),
            "EdgeStateResult": lambda: ebm.EdgeStateResult(
                state=state(), area=1.3, resid=2e-4,
                drift=np.array([np.nan, 0.5, 0.01]),
                tracked_years=np.array([12, 40, 40]),
                separation=rng.random(3), converged=True, polish_nfev=69,
                stability=ebm.StabilityResult(
                    growth=1.4, history=rng.random(5), converged=True,
                    mode=state(), rtol=1e-6, side="right"),
                spacetime=st, season="avg", par=par),
        }

    def test_registry_covers_all_public_result_types(self):
        public = sorted(n for n in ebm.__all__ if n.endswith("Result"))
        missing = [n for n in public if n not in self.factories()]
        assert not missing, (
            f"public result types {missing} have no persistence-test "
            f"factory — add one here AND a writer/reader pair in io.py")

    @pytest.mark.parametrize(
        "name", sorted(n for n in dir(ebm) if n.endswith("Result")
                       and isinstance(getattr(ebm, n), type)))
    def test_round_trip(self, name, tmp_path):
        import dataclasses
        import warnings as _warnings

        obj = self.factories()[name]()
        path = str(tmp_path / f"{name}.h5")
        with _warnings.catch_warnings():
            _warnings.simplefilter("error")  # generic-array fallthrough warns
            ebm.save(obj, path)
        back = ebm.load(path)
        assert type(back).__name__ == name

        def check(a, b, key=""):
            if dataclasses.is_dataclass(a):
                for f in dataclasses.fields(a):
                    check(getattr(a, f.name), getattr(b, f.name),
                          f"{key}.{f.name}")
            elif isinstance(a, dict):
                assert set(a) == set(b), key
                for k in a:
                    check(a[k], b[k], f"{key}[{k}]")
            elif isinstance(a, (list, tuple)):
                assert len(a) == len(b), key
                for i, (x, y) in enumerate(zip(a, b)):
                    check(x, y, f"{key}[{i}]")
            elif a is None or isinstance(a, (str, ebm.SpaceTime)):
                assert a == b, key
            elif isinstance(a, ebm.Forcing):
                assert repr(a) == repr(b), key
            else:
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=key)

        check(obj, back)
