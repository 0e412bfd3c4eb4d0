"""Steady-state equilibration (equilibrium.py) — no reference analog; the
reference reaches equilibria by integrating a long hand-chosen dur.

Tolerance notes (module docstring has the details): MIZ relaxes cleanly;
classic's discrete E==0 albedo hole leaves an O(0.1) irregular wobble at
ice-edge cells, so its year map has a fixed point only to that resolution —
classic tests use tol=0.5 (arrival at the attractor), MIZ tests 1e-3.
"""
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm


def classic_setup():
    st = ebm.SpaceTime.sin(24, 1000, 1)
    base = ebm.default_parameters("Classic")
    E0 = np.full(st.nx, 40.0)  # ice-free warm init (stability notes)
    init = ebm.Collection(E=E0, Tg=E0 / float(base["cw"]))
    return st, base, init


class TestEquilibrate:
    def test_classic_matches_integrate_at_equal_years(self):
        """The loop is the same year graph integrate runs: at equal year
        counts the states agree to rounding (~1e-12 measured)."""
        st, base, init = classic_setup()
        res = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), base, init,
                              tol=0.5, max_years=500)
        assert res.converged
        assert 2 <= res.years < 500
        long_st = ebm.SpaceTime.sin(24, 1000, res.years)
        sols = ebm.integrate("Classic", long_st, ebm.Forcing(0.0), base, init,
                             progress=False, raw_mode="none")
        np.testing.assert_allclose(
            np.asarray(res.seasonal.avg["E"]),
            np.asarray(sols.seasonal.avg["E"][-1]),
            rtol=0, atol=1e-9,
        )

    def test_warm_start_continuation(self):
        """Re-equilibrating from a converged state must be immediate."""
        st, base, init = classic_setup()
        res = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), base, init,
                              tol=0.5, max_years=500)
        res2 = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), base,
                               res.state, tol=0.5, max_years=500)
        assert res2.converged and res2.years <= 3

    def test_miz_converges_tight(self):
        st = ebm.SpaceTime.sin(16, 150, 1)
        res = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                              ebm.default_parameters("MIZ"),
                              ebm.zeros_init(st), tol=1e-3, max_years=400)
        assert res.converged
        assert res.newton_ok
        assert float(res.resid) <= 1e-3

    def test_miz_ensemble_F_sweep_matches_solo(self):
        """Members with per-member forcing offsets equilibrate in lockstep
        and match solo runs with the offset folded into the forcing."""
        st = ebm.SpaceTime.sin(16, 150, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["F"] = np.array([0.0, 2.0])
        init = ebm.zeros_init(st)
        ens = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par, init,
                              tol=1e-3, max_years=400)
        assert ens.member_years is not None and ens.member_years.shape == (2,)
        assert ens.converged.all()
        assert (ens.member_years > 0).all()
        for i, F in enumerate([0.0, 2.0]):
            solo = ebm.equilibrate(
                "MIZ", st, ebm.Forcing(F), ebm.default_parameters("MIZ"),
                init, tol=1e-3, max_years=400,
            )
            # the ensemble stops when the SLOWEST member converges, so the
            # faster member runs extra years past its own convergence —
            # compare states, not trajectories, to attractor resolution
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(ens.seasonal.avg["E"][i])),
                np.nan_to_num(np.asarray(solo.seasonal.avg["E"])),
                rtol=0, atol=5e-2, err_msg=f"member {i}",
            )
        # the two forcing levels must land on different states
        dE = np.abs(np.asarray(ens.seasonal.avg["E"][0])
                    - np.asarray(ens.seasonal.avg["E"][1]))
        assert dE.max() > 1.0

    def test_scalar_F_on_single_run_is_constant_forcing(self):
        st, base, init = classic_setup()
        par = ebm.Collection(base)
        par["F"] = 2.0
        res = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), par, init,
                              tol=0.5, max_years=300)
        res_f = ebm.equilibrate("Classic", st, ebm.Forcing(2.0), base, init,
                                tol=0.5, max_years=300)
        np.testing.assert_array_equal(
            np.asarray(res.seasonal.avg["E"]),
            np.asarray(res_f.seasonal.avg["E"]),
        )

    def test_max_years_bound(self):
        st, base, init = classic_setup()
        res = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), base, init,
                              tol=1e-12, max_years=3)
        assert res.years == 3
        assert not res.converged
        assert "NOT converged" in repr(res)

    def test_validation(self):
        st, base, init = classic_setup()
        ramp = ebm.Forcing(0.0, 2.0, -2.0, (1, 1), (1.0, -1.0))
        with pytest.raises(ValueError, match="constant"):
            ebm.equilibrate("Classic", st, ramp, base, init)
        with pytest.raises(ValueError, match="metric"):
            ebm.equilibrate("Classic", st, ebm.Forcing(0.0), base, init,
                            metric=("nope",))

    def test_float_forcing_accepted(self):
        st, base, init = classic_setup()
        res = ebm.equilibrate("Classic", st, 0.0, base, init, tol=0.5,
                              max_years=300)
        assert res.converged
        assert "converged" in repr(res)


class TestFusedEngine:
    """equilibrate(engine='fused') runs the whole-year Pallas kernel inside
    the convergence while_loop (interpret mode on CPU). Parity runs pin the
    year count with tol=0 so both engines simulate exactly max_years years;
    f32 engine agreement measured at 1e-4..5e-3 after 3 years (Newton
    tolerance + layout differences, ops/pallas_year.py docstrings)."""

    KW = dict(tol=0.0, max_years=3, dtype="float32")

    @staticmethod
    def _dmax(a, b):
        return np.nanmax(np.abs(np.nan_to_num(np.asarray(a))
                                - np.nan_to_num(np.asarray(b))))

    def test_miz_single_matches_batched(self):
        st = ebm.SpaceTime.sin(16, 100, 1)
        par = ebm.default_parameters("MIZ")
        a = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), engine="batched", **self.KW)
        b = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), engine="fused", **self.KW)
        assert a.years == b.years == 3
        assert b.seasonal.avg["E"].shape == (st.nx,)
        assert self._dmax(a.seasonal.avg["E"], b.seasonal.avg["E"]) < 0.5
        assert self._dmax(a.state["Ei"], b.state["Ei"]) < 0.5

    def test_miz_ensemble_F_sweep_matches_batched(self):
        st = ebm.SpaceTime.sin(16, 100, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["F"] = np.array([0.0, 1.0, 2.0])
        a = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), engine="batched", **self.KW)
        b = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), engine="fused", **self.KW)
        assert b.seasonal.avg["E"].shape == (3, st.nx)
        assert self._dmax(a.seasonal.avg["E"], b.seasonal.avg["E"]) < 0.5
        # the F offsets must actually reach the kernel's forcing lane
        assert self._dmax(b.seasonal.avg["E"][0],
                          b.seasonal.avg["E"][2]) > 1e-3

    def test_classic_single_matches_batched(self):
        st = ebm.SpaceTime.sin(16, 1000, 1)
        par = ebm.default_parameters("Classic")
        init = ebm.Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx))
        a = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), par, init,
                            engine="batched", **self.KW)
        b = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), par, init,
                            engine="fused", **self.KW)
        assert self._dmax(a.seasonal.avg["E"], b.seasonal.avg["E"]) < 0.5

    def test_fused_converges_and_reports(self):
        """The fused loop's convergence accounting (resid/member_years/
        newton flag) behaves like the batched one's."""
        st = ebm.SpaceTime.sin(16, 100, 1)
        res = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                              ebm.default_parameters("MIZ"),
                              ebm.zeros_init(st), tol=1e-2, max_years=300,
                              dtype="float32", engine="fused")
        assert res.converged
        assert res.newton_ok
        assert 2 <= res.years < 300

    def test_auto_resolves_to_batched_off_tpu(self):
        import jax

        assert jax.default_backend() != "tpu"
        st = ebm.SpaceTime.sin(16, 100, 1)
        res = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                              ebm.default_parameters("MIZ"),
                              ebm.zeros_init(st), engine="auto", **self.KW)
        assert res.years == 3  # just exercises the resolver + batched run

    def test_unknown_engine_raises(self):
        st = ebm.SpaceTime.sin(16, 100, 1)
        with pytest.raises(ValueError, match="unknown engine"):
            ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                            ebm.default_parameters("MIZ"),
                            ebm.zeros_init(st), engine="turbo")


class TestMeshEngine:
    """equilibrate(mesh=...): members shard across the (virtual 8-device)
    mesh, each chip runs the fused kernel on its local shard inside the
    convergence loop. Spread vs the single-launch fused run is layout-level
    (local shards pick 'kx' where the global launch may pick 'xk')."""

    def test_mesh_matches_single_fused(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        mesh = ensemble_mesh()
        assert mesh.size == 8
        st = ebm.SpaceTime.sin(16, 100, 1)
        K = 16
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["F"] = np.linspace(0.0, 2.0, K)
        kw = dict(tol=0.0, max_years=3, dtype="float32")
        a = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), engine="fused", **kw)
        b = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), mesh=mesh, **kw)
        assert b.seasonal.avg["E"].shape == (K, st.nx)
        d = np.nanmax(np.abs(np.nan_to_num(np.asarray(a.seasonal.avg["E"]))
                             - np.nan_to_num(np.asarray(b.seasonal.avg["E"]))))
        assert d < 0.5, d

    def test_mesh_engine_conflicts_raise(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        mesh = ensemble_mesh()
        st = ebm.SpaceTime.sin(16, 100, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["F"] = np.linspace(0.0, 2.0, 16)
        with pytest.raises(ValueError, match="engine='fused'"):
            ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                            ebm.zeros_init(st), mesh=mesh, engine="batched")
        with pytest.raises(ValueError, match="ensemble"):
            ebm.equilibrate("MIZ", st, ebm.Forcing(0.0),
                            ebm.default_parameters("MIZ"),
                            ebm.zeros_init(st), mesh=mesh)
        par_bad = ebm.Collection(ebm.default_parameters("MIZ"))
        par_bad["F"] = np.linspace(0.0, 2.0, 12)  # 12 % 8 != 0
        with pytest.raises(ValueError, match="divisible"):
            ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par_bad,
                            ebm.zeros_init(st), mesh=mesh)


class TestImplicitGradients:
    """Implicit-function-theorem adjoint through the fixed point — validated
    against finite differences (measured rel err ~4e-4 at eps=1e-4; the FD
    noise floor of two 1e-10-tolerance equilibria)."""

    def test_ift_gradient_matches_finite_difference(self):
        import jax
        import jax.numpy as jnp

        from energybalancemodel_jl_tpu.equilibrium import (
            make_equilibrium_seasonal_fn,
        )
        from energybalancemodel_jl_tpu.models.base import (
            default_step_config,
            get_model,
        )

        st = ebm.SpaceTime.sin(16, 150, 1)
        spec = get_model("MIZ")
        cfg = default_step_config("float64")
        fn = make_equilibrium_seasonal_fn("MIZ", st, cfg, "float64",
                                          tol=1e-10, max_years=600)
        base = ebm.default_parameters("MIZ")
        frow = jnp.zeros(st.nt)
        carry0 = spec.init_carry(ebm.zeros_init(st), st, jnp.float64)

        def g(A):
            par = ebm.Collection(
                {k: jnp.float64(v) for k, v in base.items()}
            )
            par["A"] = A
            s = fn(par, frow, carry0)
            return jnp.sum(jnp.nan_to_num(s.avg["E"]))

        A0 = jnp.float64(base["A"])
        grad = jax.grad(g)(A0)
        eps = 1e-4
        fd = (g(A0 + eps) - g(A0 - eps)) / (2 * eps)
        assert np.isfinite(float(grad))
        np.testing.assert_allclose(float(grad), float(fd), rtol=5e-3)

    def test_calibrate_to_equilibrium_recovers_A(self):
        """calibrate(equilibrium=True): fit the OLR constant so the MIZ
        equilibrium matches a synthetic equilibrium target — the horizon-
        free objective the unrolled dur-year fit cannot provide."""
        st = ebm.SpaceTime.sin(16, 150, 1)
        base = ebm.default_parameters("MIZ")
        truth = ebm.Collection(base)
        truth["A"] = 196.0
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), truth,
                             ebm.zeros_init(st), tol=1e-8, max_years=600)
        assert eq.converged
        target = {"E": np.asarray(eq.seasonal.avg["E"])}
        res = ebm.calibrate("MIZ", st, ebm.Forcing(0.0),
                            ebm.Collection(base), ebm.zeros_init(st),
                            target=target, vary=("A",), steps=60,
                            learning_rate=0.2, equilibrium=True,
                            equilibrium_tol=1e-8,
                            equilibrium_max_years=600)
        assert np.isfinite(res.losses).all()
        assert res.losses[-1] < 1e-2 * res.losses[0]
        # moved decisively toward the generating value
        assert abs(float(res.params["A"]) - 196.0) < 1.0

    def test_equilibrium_requires_constant_forcing(self):
        st = ebm.SpaceTime.sin(16, 150, 1)
        base = ebm.default_parameters("MIZ")
        ramp = ebm.Forcing(0.0, 2.0, -2.0, (1, 1), (1.0, -1.0))
        with pytest.raises(ValueError, match="constant"):
            ebm.calibrate("MIZ", st, ramp, base, ebm.zeros_init(st),
                          target={"E": np.zeros(st.nx)}, vary=("A",),
                          equilibrium=True)
