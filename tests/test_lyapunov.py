"""Lyapunov-spectrum validation.

The load-bearing cross-check: at a converged EQUILIBRIUM the trajectory is
stationary, so the Benettin exponents must equal ``log |lambda_i|`` of the
year-map spectrum that :func:`ebm.stability` estimates by a completely
different recipe (adjoint power iteration at a frozen linearization point
vs forward QR propagation along the moving trajectory). The ice-free
classic configuration makes this exact — the model is linear there
(`tests/test_oracle_equilibrium.py` uses the same fact), so the year-map
Jacobian is state-independent and the per-year log growths are literally
constant once the tangent has aligned.
"""
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm


def _icefree_setup(nx=8, nt=1000, F=45.0):
    """Strongly forced classic config that stays ice-free (E > 0 all
    year): the dynamics are LINEAR there, so the year map has a constant
    Jacobian. Same config family as TestSensitivityOracleFD."""
    st = ebm.SpaceTime.sin(nx, nt, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(nx, 100.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
    return st, par, init, ebm.Forcing(F)


class TestFixedPointAgreement:
    def test_matches_stability_at_icefree_classic_equilibrium(self):
        st, par, init, forcing = _icefree_setup()
        eq = ebm.equilibrate("Classic", st, forcing, par, init,
                             tol=1e-9, max_years=400)
        assert eq.converged
        assert float(np.min(np.asarray(eq.seasonal.winter["E"]))) > 0.0

        stab = ebm.stability("Classic", st, forcing, par, eq.state,
                             n_iter=60)
        assert stab.converged
        lya = ebm.lyapunov("Classic", st, forcing, par, eq.state,
                           years=60, transient=30)
        assert lya.exponents.shape == (1,)
        assert lya.history.shape == (60, 1)
        # the two estimates share no machinery beyond the year map
        assert float(lya.exponents[0]) == pytest.approx(
            float(np.log(stab.growth)), abs=1e-6)
        # linear model + aligned tangent => constant per-year growth
        assert float(np.std(lya.history[30:, 0])) < 1e-10
        # and the running estimate has flattened
        run = lya.running()
        assert run.shape == (30, 1)
        assert abs(float(run[-1, 0] - run[-2, 0])) < 1e-9

    def test_unstable_regime_reads_positive(self):
        # nt=400 puts the classic explicit step in its dt*M/cw > 1
        # regime (CLAUDE.md invariant; stability reads growth 5-50
        # there) — the tangent must GROW from year one
        st = ebm.SpaceTime.sin(24, 400, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        E0 = np.full(st.nx, 40.0)
        init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
        lya = ebm.lyapunov("Classic", st, ebm.Forcing(0.0), par, init,
                           years=2)
        assert float(lya.history[0, 0]) > 0.5


class TestMIZNeutralModes:
    def test_neutral_raw_contracting_projected(self):
        st = ebm.SpaceTime.sin(16, 150, 1)
        par = ebm.default_parameters("MIZ")
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                             ebm.zeros_init(st), tol=1e-7, max_years=400)
        assert eq.converged
        # raw leading exponent: the frozen-cell Ew/phi integrator
        # families are exactly neutral -> lambda_1 = 0 (log 1); the
        # power-iteration tail (physical contraction ~0.89 per
        # stability's measurements) bounds the residual alignment error
        lya = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                           years=45, transient=30)
        assert abs(float(lya.exponents[0])) < 0.02
        # projecting the frozen families: the projected spectrum at this
        # config is itself near-neutral (stability's projected growth
        # reads ~1.000 here — its own test asserts < 1.05, not a clear
        # contraction; measured lyapunov +0.00045), so the contract is
        # (a) the exponent agrees with log of stability's projected
        # growth, and (b) the tangent carries no frozen-cell mass
        proj = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                            years=45, transient=30,
                            project=("Ew", "phi"))
        assert abs(float(proj.exponents[0])) < 0.02
        stab = ebm.stability("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                             n_iter=45, project=("Ew", "phi"))
        assert float(proj.exponents[0]) == pytest.approx(
            float(np.log(stab.growth)), abs=0.02)
        full_ice = np.asarray(eq.state["phi"]) >= 0.99
        mE = np.asarray(proj.modes["Ew"])
        assert (mE[..., full_ice] ** 2).sum() < 1e-8 * (mE ** 2).sum()


class TestEnsembleAndChunking:
    def test_lockstep_members_equal_solo(self):
        st, par, init, forcing = _icefree_setup(nx=8, nt=500)
        K = 3
        Ds = np.linspace(0.45, 0.65, K)
        rng = np.random.default_rng(3)
        v_ens = {"E": rng.standard_normal((K, st.nx)),
                 "Tg": rng.standard_normal((K, st.nx))}

        parK = ebm.Collection(par)
        parK["D"] = Ds
        ens = ebm.lyapunov("Classic", st, forcing, parK, init,
                           years=12, transient=6,
                           v0=ebm.Collection(v_ens))
        assert ens.exponents.shape == (K, 1)
        assert ens.history.shape == (12, K, 1)
        for i in range(K):
            p = ebm.Collection(par)
            p["D"] = float(Ds[i])
            solo = ebm.lyapunov(
                "Classic", st, forcing, p, init, years=12, transient=6,
                v0=ebm.Collection({k: v[i] for k, v in v_ens.items()}))
            np.testing.assert_allclose(
                ens.history[:, i, 0], solo.history[:, 0],
                rtol=0, atol=1e-10)

    def test_dispatch_chunking_is_invariant(self):
        st, par, init, forcing = _icefree_setup(nx=8, nt=500)
        a = ebm.lyapunov("Classic", st, forcing, par, init, years=10,
                         seed=5)
        b = ebm.lyapunov("Classic", st, forcing, par, init, years=10,
                         seed=5, years_per_dispatch=3)
        np.testing.assert_array_equal(a.history, b.history)
        for k in a.state:
            np.testing.assert_array_equal(a.state[k], b.state[k])

    def test_mesh_sharded_matches_unsharded(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        mesh = ensemble_mesh()
        assert mesh.size == 8
        st, par, init, forcing = _icefree_setup(nx=8, nt=200)
        K = 8
        parK = ebm.Collection(par)
        parK["F"] = np.linspace(0.0, 4.0, K)
        kw = dict(years=6, transient=2, seed=11)
        a = ebm.lyapunov("Classic", st, forcing, parK, init, **kw)
        b = ebm.lyapunov("Classic", st, forcing, parK, init, mesh=mesh,
                         **kw)
        np.testing.assert_allclose(a.history, b.history, rtol=0,
                                   atol=1e-11)
        with pytest.raises(ValueError, match="ensemble"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=2,
                         mesh=mesh)

    def test_multimode_spectrum_is_ordered(self):
        st, par, init, forcing = _icefree_setup(nx=8, nt=500)
        eq = ebm.equilibrate("Classic", st, forcing, par, init,
                             tol=1e-9, max_years=400)
        lya = ebm.lyapunov("Classic", st, forcing, par, eq.state,
                           years=40, transient=25, n_modes=3)
        ex = np.asarray(lya.exponents)
        assert ex.shape == (3,)
        # QR exponents come out ordered for a constant Jacobian
        assert ex[0] >= ex[1] >= ex[2]
        # cross-check the top mode against stability's 3-mode spectrum
        stab = ebm.stability("Classic", st, forcing, par, eq.state,
                             n_iter=60, n_modes=3)
        np.testing.assert_allclose(
            ex, np.log(np.abs(np.asarray(stab.growth))), atol=1e-4)


class TestPlotLyapunov:
    """plot_lyapunov renders running-estimate convergence charts from
    synthetic results (matplotlib Agg; the solve is covered above)."""

    @staticmethod
    def _synthetic(K=None, m=2, years=8, transient=3):
        rng = np.random.default_rng(5)
        shape = (years, m) if K is None else (years, K, m)
        hist = rng.standard_normal(shape) * 0.05 - 0.2
        state = ebm.Collection(E=rng.standard_normal(4))
        return ebm.LyapunovResult(
            exponents=hist[transient:].mean(axis=0), history=hist,
            state=state, modes=state, transient=transient, n_modes=m,
            years=years)

    def test_solo_lines_and_yearly_dots(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        res = self._synthetic()
        fig = ebm.plot_lyapunov(res)
        ax = fig.axes[0]
        solid = [ln for ln in ax.lines if ln.get_linestyle() == "-"
                 and ln.get_marker() in ("", "None", None)]
        dots = [ln for ln in ax.lines if ln.get_marker() == "."]
        assert len(solid) >= res.n_modes
        assert len(dots) == 1  # yearly scatter, leading mode
        assert "1/yr" in ax.get_ylabel()
        plt.close(fig)

    def test_ensemble_one_line_per_member_per_mode(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        K, m = 3, 2
        res = self._synthetic(K=K, m=m)
        fig = ebm.plot_lyapunov(res, title="demo")
        ax = fig.axes[0]
        dots = [ln for ln in ax.lines if ln.get_marker() == "."]
        assert not dots  # ensembles skip the yearly scatter
        curves = [ln for ln in ax.lines
                  if ln.get_linestyle() == "-"
                  and len(ln.get_xdata()) == res.years - res.transient]
        assert len(curves) == K * m
        assert ax.get_title() == "demo"
        plt.close(fig)

    def test_no_counted_years_rejected(self):
        res = self._synthetic()
        res = ebm.LyapunovResult(
            exponents=res.exponents, history=res.history[:3],
            state=res.state, modes=res.modes, transient=3, n_modes=2,
            years=3)
        with pytest.raises(ValueError, match="counted"):
            ebm.plot_lyapunov(res)


class TestValidationAndRepr:
    def test_validation_errors(self):
        st, par, init, forcing = _icefree_setup(nx=8, nt=200)
        with pytest.raises(ValueError, match="years"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=0)
        with pytest.raises(ValueError, match="transient"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=5,
                         transient=5)
        ramp = ebm.Forcing(0.0, 1.0, 0.0, (0, 0), (1.0, -1.0))
        with pytest.raises(ValueError, match="constant"):
            ebm.lyapunov("Classic", st, ramp, par, init, years=2)
        with pytest.raises(ValueError, match="phi"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=2,
                         project=("Tg",))
        with pytest.raises(ValueError, match="n_modes"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=2,
                         n_modes=0)
        with pytest.raises(ValueError, match="v0"):
            ebm.lyapunov("Classic", st, forcing, par, init, years=2,
                         v0=ebm.Collection({"E": np.zeros(st.nx)}))

    def test_repr_running_sem(self):
        st, par, init, forcing = _icefree_setup(nx=8, nt=200)
        lya = ebm.lyapunov("Classic", st, forcing, par, init, years=6,
                           transient=2)
        assert "lambda_1" in repr(lya)
        assert "4 counted years" in repr(lya)
        assert lya.running().shape == (4, 1)
        assert lya.sem.shape == (1,)
        assert np.isfinite(lya.sem).all()


class TestMemberChunk:
    """Round-5 `member_chunk=`: slabbed ensemble tangent propagation —
    the memory lever past the ~K=1024 whole-batch remat envelope. The
    year map is member-diagonal, so a single slab (C == K) must be
    BITWISE the unslabbed graph; multiple slabs differ by contraction
    ulps that positive finite-time growth amplifies (engine-parity
    per-year growths, same exponents statistically)."""

    def _setup(self):
        st = ebm.SpaceTime.sin(12, 300, 1)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["F"] = np.linspace(0.0, 1.0, 8)
        eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                             ebm.zeros_init(st), tol=0.0, max_years=5)
        return st, par, eq.state

    def test_single_slab_is_bitwise(self):
        st, par, state = self._setup()
        kw = dict(years=3, n_modes=2, dtype="float32",
                  years_per_dispatch=3)
        full = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, state, **kw)
        one = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, state,
                           member_chunk=8, **kw)
        np.testing.assert_array_equal(one.history, full.history)
        for k in full.state:
            np.testing.assert_array_equal(one.state[k], full.state[k])

    def test_multi_slab_first_year_tight(self):
        st, par, state = self._setup()
        kw = dict(years=2, n_modes=2, dtype="float32",
                  years_per_dispatch=2)
        full = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, state, **kw)
        slab = ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, state,
                            member_chunk=4, **kw)
        # before chaotic amplification sets in, the slabbed growths sit
        # at contraction round-off from the full batch
        np.testing.assert_allclose(slab.history[0], full.history[0],
                                   rtol=1e-4, atol=1e-5)
        # the forward trajectory is the SAME plain scan either way
        for k in full.state:
            np.testing.assert_array_equal(slab.state[k], full.state[k])

    def test_validation(self):
        st, par, state = self._setup()
        with pytest.raises(ValueError, match="divide"):
            ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), par, state,
                         years=2, member_chunk=3)
        solo_par = ebm.Collection(ebm.default_parameters("MIZ"))
        with pytest.raises(ValueError, match="ensemble|member-batched"):
            ebm.lyapunov("MIZ", st, ebm.Forcing(0.0), solo_par,
                         ebm.zeros_init(st), years=2, member_chunk=2)
