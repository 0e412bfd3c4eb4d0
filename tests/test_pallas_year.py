"""Fused whole-year Pallas kernel (ops/pallas_year.py) vs the XLA path.

The kernel calls ``models.miz.step`` itself, so per-step semantics are shared
by construction; what needs testing is (a) the lane/member padding is inert,
(b) the in-kernel year loop (storage accumulation, snapshot ticks, Newton
grouping) reproduces the XLA seasonal storage path, (c) the ensemble-engine
integration. Comparisons are tolerance-based: the kernel and the scan are
different compiled graphs, and the MIZ trajectory amplifies even
fusion-level rounding (see CLAUDE.md), so with a *fixed* Newton iteration
count the two paths agree to ~1e-3 absolute over a 200-step year — asserted
with 10x headroom.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.models import miz
from energybalancemodel_jl_tpu.models.base import StepConfig, get_model
from energybalancemodel_jl_tpu.ops.pallas_year import pallas_miz_year
from energybalancemodel_jl_tpu.parallel import ensemble as ens
from energybalancemodel_jl_tpu.utils.collection import Collection

DTYPE = jnp.dtype("float32")
K = 8

# fixed iteration count (tol = 0 never satisfied) removes Newton-grouping
# noise: both paths do identical per-step work
FIXED_CFG = StepConfig(
    solver="pcr", newton_abstol=0.0, newton_reltol=0.0,
    newton_max_step=50.0, newton_max_iter=8,
)


def small_setup(nx=40, nt=200, k=K):
    st = ebm.SpaceTime.sin(nx, nt, 1)
    par = Collection(
        {k_: jnp.asarray(v, DTYPE) for k_, v in ebm.default_parameters("MIZ").items()}
    )
    par["D"] = jnp.asarray(np.linspace(0.55, 0.65, k), DTYPE)
    spec = get_model("MIZ")
    carry = spec.init_carry(ebm.zeros_init(st), st, DTYPE)
    carry = Collection(
        {k_: jnp.broadcast_to(v, (k,) + v.shape) for k_, v in carry.items()}
    )
    fyear = jnp.zeros(st.nt, dtype=DTYPE)
    return st, par, carry, fyear


@pytest.fixture(scope="module")
def year_pair():
    st, par, carry, fyear = small_setup()
    run_year = ens._native_year_fn("MIZ", st, FIXED_CFG, DTYPE.name, False, False)
    xla = run_year(carry, ens._augment_batched(par), fyear)
    fused = pallas_miz_year(carry, par, fyear, st, FIXED_CFG, interpret=True)
    return xla, fused


class TestPadInvariance:
    def test_step_lane_padding_is_bitwise_inert(self, rng):
        """Identity-padded lanes decouple exactly: a padded step equals the
        unpadded step bitwise on the real lanes (the kernel relies on this)."""
        nx, nxp = 40, 128
        st = ebm.SpaceTime.sin(nx, 200, 1)
        par = Collection(
            {k: jnp.asarray(v, DTYPE) for k, v in ebm.default_parameters("MIZ").items()}
        )
        stat = miz.statics(st, par, DTYPE)

        T0 = jnp.asarray(rng.normal(0, 5, (K, nx)), DTYPE)
        h = jnp.asarray(np.abs(rng.normal(1, 0.5, (K, nx))), DTYPE)
        Tw = jnp.asarray(rng.normal(0, 3, (K, nx)), DTYPE)
        phi = jnp.asarray(rng.uniform(0, 1, (K, nx)), DTYPE)
        carry = Collection(
            Ei=-jnp.abs(Tw) * 3, Ew=jnp.abs(T0), h=h,
            D=jnp.full((K, nx), 100.0, DTYPE), phi=phi, T0=T0,
        )
        xs = Collection(insol=stat.insol[17], f=jnp.zeros((), DTYPE))
        c_u, o_u = miz.step(carry, xs, stat, par, FIXED_CFG)

        pad = lambda v: jnp.pad(v, ((0, 0), (0, nxp - nx)))
        pl_ = lambda v: jnp.pad(v, (0, nxp - nx))
        stat_p = Collection(
            insol=None, aw=pl_(stat.aw), glo=pl_(stat.glo), gdi=pl_(stat.gdi),
            gup=pl_(stat.gup), dt=stat.dt, Tm_pow_m2=stat["Tm_pow_m2"],
        )
        c_p, o_p = miz.step(
            Collection({k: pad(v) for k, v in carry.items()}),
            Collection(insol=pl_(xs["insol"]), f=xs["f"]),
            stat_p, par, FIXED_CFG,
        )
        for k in c_u:
            np.testing.assert_array_equal(
                np.asarray(c_u[k]), np.asarray(c_p[k])[:, :nx], err_msg=k
            )
        for k in ("E", "T", "n"):
            np.testing.assert_array_equal(
                np.asarray(o_u[k]), np.asarray(o_p[k])[:, :nx], err_msg=k
            )


class TestFusedYear:
    def test_carry_matches_xla(self, year_pair):
        (c_x, _, _, _), (c_p, _, _, _) = year_pair
        for k in c_x:
            np.testing.assert_allclose(
                np.asarray(c_x[k]), np.asarray(c_p[k]), atol=0.5, err_msg=k
            )

    def test_seasonal_matches_xla(self, year_pair):
        (_, s_x, _, _), (_, s_p, _, _) = year_pair
        for name in ("winter", "summer", "avg"):
            cx, cp = getattr(s_x, name), getattr(s_p, name)
            for k in cx:
                a, b = np.asarray(cx[k]), np.asarray(cp[k])
                np.testing.assert_array_equal(
                    np.isnan(a), np.isnan(b), err_msg=f"{name}.{k} NaN pattern"
                )
                np.testing.assert_allclose(
                    np.nan_to_num(a), np.nan_to_num(b), atol=0.05,
                    err_msg=f"{name}.{k}",
                )

    def test_convergence_flag(self, year_pair):
        # tol = 0 is unsatisfiable: both paths must report non-convergence
        (_, _, conv_x, _), (_, _, conv_p, _) = year_pair
        assert float(np.asarray(conv_x)) == 0.0
        assert float(np.asarray(conv_p)) == 0.0

    def test_blocking_invariance(self):
        """Members are independent: splitting the batch into blocks must not
        change results (fixed iterations make grouping irrelevant)."""
        st, par, carry, fyear = small_setup(k=24)
        one = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                              block_k=24, interpret=True)
        many = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                               block_k=8, interpret=True)
        for k in one[0]:
            np.testing.assert_allclose(
                np.asarray(one[0][k]), np.asarray(many[0][k]), atol=1e-4,
                err_msg=k,
            )
        for k in one[1].avg:
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(one[1].avg[k])),
                np.nan_to_num(np.asarray(many[1].avg[k])),
                atol=1e-4, err_msg=k,
            )

    def test_scalar_D_broadcasts(self):
        st, par, carry, fyear = small_setup()
        par = Collection(par)
        par["D"] = jnp.asarray(0.6, DTYPE)
        c, seas, conv, _ = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                                           interpret=True)
        assert c["Ei"].shape == (K, st.nx)
        # identical members -> identical rows
        e = np.asarray(seas.avg["E"])
        np.testing.assert_array_equal(e, np.broadcast_to(e[:1], e.shape))

    def test_sweeps_any_physical_param(self):
        """Non-table parameters sweep per member inside the kernel — e.g. an
        OLR-intercept (A) sweep matches the batch-native XLA engine."""
        st, par, carry, fyear = small_setup()
        par = Collection(par)
        par["A"] = jnp.asarray(np.linspace(190, 196, K), DTYPE)
        run_year = ens._native_year_fn("MIZ", st, FIXED_CFG, DTYPE.name, False, False)
        c_x, s_x, _, _ = run_year(carry, ens._augment_batched(par), fyear)
        c_p, s_p, _, _ = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                                         interpret=True)
        # members differ (the sweep took effect) ...
        e = np.asarray(s_p.avg["E"])
        assert not np.allclose(e[0], e[-1])
        # ... and match the XLA engine per member
        for key in ("E", "h", "phi"):
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(s_x.avg[key])),
                np.nan_to_num(np.asarray(s_p.avg[key])),
                atol=0.05, err_msg=key,
            )

    def test_kx_rejects_swept_table_params(self):
        st, par, carry, fyear = small_setup()
        par = Collection(par)
        par["S0"] = jnp.asarray(np.linspace(415, 425, K), DTYPE)
        with pytest.raises(ValueError, match="scalar parameter 'S0'"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG, interpret=True,
                            layout="kx")

    def test_xk_sweeps_table_params(self):
        """The transposed layout rebuilds the separable insolation from
        per-member rows, so S0/S1/S2/a0/a2 sweep like any parameter (the
        default layout resolves to 'xk' when they are swept). Each swept
        member must equal a uniform-ensemble run at its parameter value."""
        st, par, carry, fyear = small_setup()
        par = Collection(par)
        par["D"] = jnp.asarray(0.6, DTYPE)
        sweep = np.linspace(415, 425, K).astype(np.float32)
        par_s = Collection(par)
        par_s["S0"] = jnp.asarray(sweep, DTYPE)
        swept = pallas_miz_year(carry, par_s, fyear, st, FIXED_CFG,
                                interpret=True)
        for i in (0, K - 1):
            par_i = Collection(par)
            par_i["S0"] = jnp.asarray(sweep[i], DTYPE)
            solo = pallas_miz_year(carry, par_i, fyear, st, FIXED_CFG,
                                   interpret=True, layout="xk")
            for k in swept[0]:
                np.testing.assert_allclose(
                    np.asarray(swept[0][k])[i], np.asarray(solo[0][k])[i],
                    atol=1e-5, err_msg=f"member {i} {k}",
                )


class TestShardedFused:
    def test_matches_unsharded_on_virtual_mesh(self):
        """Each chip runs the whole-year kernel on its ensemble shard; pure
        DP must reproduce the unsharded kernel (fixed iterations make block
        grouping irrelevant)."""
        from energybalancemodel_jl_tpu.parallel.sharding import (
            ensemble_mesh, shard_map_fused_year_fn,
        )

        k = 32
        st, par, carry, fyear = small_setup(k=k)
        mesh = ensemble_mesh(8)
        fn = shard_map_fused_year_fn(st, mesh, par, DTYPE.name, FIXED_CFG)
        c_s, seas_s, conv_s = fn(carry, par, fyear)
        c_u, seas_u, conv_u, _ = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True
        )
        assert float(np.asarray(conv_s)) == float(np.asarray(conv_u))
        for key in c_u:
            np.testing.assert_allclose(
                np.asarray(c_s[key]), np.asarray(c_u[key]), atol=1e-4,
                err_msg=key,
            )
        for key in ("E", "h", "phi"):
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(seas_s.avg[key])),
                np.nan_to_num(np.asarray(seas_u.avg[key])),
                atol=1e-4, err_msg=key,
            )


class TestFusedEngine:
    def test_matches_batched_engine(self):
        # dur=1: over longer horizons the adaptive-Newton grouping difference
        # amplifies chaotically at the ice edge (documented in CLAUDE.md)
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        par["D"] = np.linspace(0.55, 0.65, K)
        init = ebm.zeros_init(st)
        kw = dict(dtype=DTYPE, newton_max_iter=8)
        sols_f = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, init, n_members=K,
            engine="fused", **kw,
        )
        sols_b = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, init, n_members=K,
            engine="batched", **kw,
        )
        assert sols_f.seasonal.avg["E"].shape == (K, st.dur, st.nx)
        for k in ("E", "h", "phi", "T"):
            a = np.nan_to_num(sols_b.seasonal.avg[k])
            b = np.nan_to_num(sols_f.seasonal.avg[k])
            np.testing.assert_allclose(a, b, atol=0.5, err_msg=k)

    def test_raw_last_year_fallback(self):
        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.default_parameters("MIZ")
        par["D"] = np.linspace(0.55, 0.65, K)
        sols = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            n_members=K, engine="fused", raw_mode="last", dtype=DTYPE,
        )
        assert sols.raw["E"].shape == (K, st.nt, st.nx)
        assert np.isfinite(np.nan_to_num(sols.raw["E"])).all()

    def test_classic_fused_matches_batched(self):
        """The classic (WE15) model has its own whole-year kernel."""
        st = ebm.SpaceTime.sin(40, 1000, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        par["D"] = np.linspace(0.55, 0.65, K)
        init = Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx))
        kw = dict(n_members=K, dtype=DTYPE)
        sols_f = ens.ensemble_integrate(
            "Classic", st, ebm.Forcing(0.0), par, init, engine="fused", **kw
        )
        sols_b = ens.ensemble_integrate(
            "Classic", st, ebm.Forcing(0.0), par, init, engine="batched", **kw
        )
        assert sols_f.seasonal.avg["E"].shape == (K, st.dur, st.nx)
        for k in ("E", "T", "h"):
            np.testing.assert_allclose(
                sols_b.seasonal.avg[k], sols_f.seasonal.avg[k], atol=0.05,
                err_msg=k,
            )

    def test_auto_engine_prefers_fused_on_tpu(self, monkeypatch):
        """engine='auto' resolves to the fused kernel on TPU backends (and
        still runs here: the kernel drops to interpret mode off-TPU)."""
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        par["D"] = np.linspace(0.55, 0.65, K)
        kw = dict(n_members=K, dtype=DTYPE)
        explicit = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="fused", **kw,
        )
        import energybalancemodel_jl_tpu.ops.pallas_year as pyear

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        # the backend patch above would also flip default_interpret; keep
        # the kernels in interpret mode (we are still on CPU)
        monkeypatch.setattr(pyear, "default_interpret", lambda: True)
        auto = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="auto", **kw,
        )
        for k in ("E", "T"):
            np.testing.assert_array_equal(
                np.nan_to_num(explicit.seasonal.avg[k]),
                np.nan_to_num(auto.seasonal.avg[k]), err_msg=k,
            )
        # thomas solver is an XLA-engine feature: auto must not pick fused
        sols = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="auto", solver="thomas", **kw,
        )
        assert np.isfinite(np.nan_to_num(sols.seasonal.avg["E"])).all()

    def test_rejects_model_without_kernel(self):
        from energybalancemodel_jl_tpu.models.base import (
            ModelSpec, register_model,
        )
        import energybalancemodel_jl_tpu.models.base as base

        spec = ModelSpec(
            name="_NoKernel", statics=None, init_carry=None, step=None,
            step_inputs=None, solution_vars=("E",), init_vars=(),
        )
        register_model(spec)
        try:
            st = ebm.SpaceTime.sin(40, 200, 1)
            with pytest.raises(ValueError, match="no whole-year kernel"):
                ens.ensemble_integrate(
                    "_NoKernel", st, ebm.Forcing(0.0),
                    ebm.default_parameters("MIZ"), Collection(),
                    n_members=4, engine="fused", dtype=DTYPE,
                )
        finally:
            base._REGISTRY.pop("_NoKernel", None)

    def test_rejects_unknown_engine(self):
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        with pytest.raises(ValueError, match="unknown engine"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
                n_members=4, engine="bogus", dtype=DTYPE,
            )

    def test_fused_rejects_raw_mode_all(self):
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        with pytest.raises(ValueError, match="raw_mode"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
                n_members=4, raw_mode="all", engine="fused", dtype=DTYPE,
            )

    def test_raw_mode_all_memory_guard(self):
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        with pytest.raises(ValueError, match="GiB"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
                n_members=4, raw_mode="all", dtype=DTYPE,
                raw_memory_limit=1024,
            )

    def test_ensemble_progress_renders(self, capsys, monkeypatch):
        import energybalancemodel_jl_tpu.utils.progress as prog_mod

        rendered = []
        real = prog_mod.Progress.update

        def spy(self, current=None, feedargs=()):
            rendered.append(current)
            return real(self, current, feedargs)

        monkeypatch.setattr(prog_mod.Progress, "update", spy)
        st = ebm.SpaceTime.sin(40, 200, 3)
        par = ebm.default_parameters("MIZ")
        ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            n_members=4, dtype=DTYPE,
        )
        assert rendered and rendered[-1] == st.dur

    def test_table_param_sweep_matches_vmap(self):
        """engine='fused' sweeps table parameters through the 'xk' kernel
        (seasonal storage); members must match the vmap engine."""
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        par["S0"] = np.linspace(415, 425, K)
        kw = dict(n_members=K, dtype=DTYPE)
        sols_f = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="fused", **kw,
        )
        sols_v = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="vmap", **kw,
        )
        # the engines differ in Newton grouping and the f32 trajectory
        # amplifies solver noise at the ice edge (~2/320 outliers): same
        # tolerance as the carry-level kernel-vs-XLA comparison
        for k in ("E", "T", "phi"):
            np.testing.assert_allclose(
                np.nan_to_num(sols_v.seasonal.avg[k]),
                np.nan_to_num(sols_f.seasonal.avg[k]),
                atol=0.5, err_msg=k,
            )

    def test_classic_table_param_sweep_matches_vmap(self):
        st = ebm.SpaceTime.sin(40, 1000, 1)
        par = ebm.default_parameters("Classic")
        par["S0"] = np.linspace(415, 425, K)
        init = Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx))
        kw = dict(n_members=K, dtype=DTYPE)
        sols_f = ens.ensemble_integrate(
            "Classic", st, ebm.Forcing(0.0), par, init, engine="fused", **kw
        )
        sols_v = ens.ensemble_integrate(
            "Classic", st, ebm.Forcing(0.0), par, init, engine="vmap", **kw
        )
        for k in ("E", "T", "h"):
            np.testing.assert_allclose(
                sols_v.seasonal.avg[k], sols_f.seasonal.avg[k], atol=0.05,
                err_msg=k,
            )

    def test_table_param_sweep_with_raw_collection(self):
        # the raw-collect year falls back to the vmap engine for table
        # sweeps (the batch-native fallback shares one insolation table);
        # with dur=1 the raw year starts from identical init in both
        # engines, so the fallback must reproduce the vmap engine exactly
        # (beyond one year the carries differ at solver-noise level and the
        # trajectories amplify pointwise — see CLAUDE.md)
        st = ebm.SpaceTime.sin(40, 200, 1)
        par = ebm.default_parameters("MIZ")
        par["S0"] = np.linspace(415, 425, K)
        kw = dict(n_members=K, raw_mode="last", dtype=DTYPE)
        sols_f = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="fused", **kw,
        )
        sols_v = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="vmap", **kw,
        )
        assert sols_f.raw["E"].shape == (K, st.nt, st.nx)
        np.testing.assert_allclose(
            np.nan_to_num(sols_v.raw["E"]), np.nan_to_num(sols_f.raw["E"]),
            atol=1e-5,
        )

    def test_table_and_F_sweep_with_raw_multiyear(self):
        # fused seasonal year -> vmap raw-fallback year, with per-member
        # forcing offsets riding alongside the table sweep
        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.default_parameters("MIZ")
        par["S0"] = np.linspace(415, 425, K)
        par["F"] = np.linspace(-1.0, 1.0, K)
        sols = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            n_members=K, engine="fused", raw_mode="last", dtype=DTYPE,
        )
        assert sols.raw["E"].shape == (K, st.nt, st.nx)
        assert np.isfinite(np.nan_to_num(sols.raw["E"])).all()
        assert sols.seasonal.avg["E"].shape == (K, st.dur, st.nx)


def test_vmem_guard_rejects_oversize_working_sets():
    # since the separable-insolation rebuild (round 3) there is no table
    # to reject — the guard bounds the per-block working set. A wide
    # ensemble at nx=1024 (60 planes x 128 rows x 1024 lanes x 4 B =
    # 31.5 MB) exceeds the 28 MB budget in BOTH layouts; forcing 'kx'
    # must raise the fit reason rather than fail inside Mosaic. (K=8 at
    # this nx/nt now correctly FITS — the old 16 MB table is gone.)
    st = ebm.SpaceTime.sin(1024, 4000, 1)
    par = ebm.default_parameters("MIZ")
    spec = get_model("MIZ")
    carry = spec.init_carry(ebm.zeros_init(st), st, DTYPE)
    carry = Collection({k: jnp.broadcast_to(v, (128,) + v.shape)
                        for k, v in carry.items()})
    with pytest.raises(ValueError, match="VMEM budget"):
        pallas_miz_year(carry, Collection({k: jnp.asarray(v, DTYPE) for k, v in par.items()}),
                        jnp.zeros(st.nt, DTYPE), st, FIXED_CFG,
                        interpret=True, layout="kx")


class TestIntegrateFused:
    def test_single_run_matches_scan(self):
        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.default_parameters("MIZ")
        init = ebm.zeros_init(st)
        kw = dict(progress=False, dtype=DTYPE, newton_max_iter=8)
        s_scan = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par, init, **kw)
        s_fused = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par, init,
                                engine="fused", **kw)
        # final-year raw comes from the scan fallback in both runs; the
        # carry handed to it went through the fused year -> tolerance-level
        for k in ("E", "h", "phi"):
            np.testing.assert_allclose(
                np.nan_to_num(s_scan.seasonal.avg[k]),
                np.nan_to_num(s_fused.seasonal.avg[k]),
                atol=0.5, err_msg=k,
            )
        assert s_fused.raw["E"].shape == (st.nt, st.nx)

    def test_classic_single_run(self):
        st = ebm.SpaceTime.sin(40, 1000, 2)
        par = ebm.default_parameters("Classic")
        init = Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx))
        s = ebm.integrate("Classic", st, ebm.Forcing(0.0), par, init,
                          engine="fused", progress=False, dtype=DTYPE)
        assert np.isfinite(s.seasonal.avg["E"]).all()
        assert s.raw["E"].shape == (st.nt, st.nx)

    def test_auto_engine_on_tpu(self, monkeypatch):
        """integrate's default engine='auto' resolves to fused on TPU for
        f32 runs, and to the scan graph when a debug hook needs it."""
        import energybalancemodel_jl_tpu.ops.pallas_year as pyear

        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.default_parameters("MIZ")
        init = ebm.zeros_init(st)
        kw = dict(progress=False, dtype=DTYPE, newton_max_iter=8,
                  raw_mode="none")
        explicit = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par, init,
                                 engine="fused", **kw)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(pyear, "default_interpret", lambda: True)
        auto = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par, init, **kw)
        np.testing.assert_array_equal(
            np.nan_to_num(explicit.seasonal.avg["E"]),
            np.nan_to_num(auto.seasonal.avg["E"]),
        )
        # a debug hook is a scan-only feature: auto must pick scan and
        # record the diagnostic rather than raising
        dbg = ebm.integrate(
            "MIZ", st, ebm.Forcing(0.0), par, init,
            debug=lambda vars_, p: vars_["phi"].sum(), **kw,
        )
        assert "debug" in dbg.seasonal.avg

    def test_rejects_debug_hook(self):
        st = ebm.SpaceTime.sin(40, 200, 1)
        with pytest.raises(ValueError, match="debug"):
            ebm.integrate("MIZ", st, ebm.Forcing(0.0),
                          ebm.default_parameters("MIZ"), ebm.zeros_init(st),
                          engine="fused", debug=lambda v, p: v["E"],
                          progress=False, dtype=DTYPE)

    def test_rejects_unknown_engine(self):
        st = ebm.SpaceTime.sin(40, 200, 1)
        with pytest.raises(ValueError, match="unknown engine"):
            ebm.integrate("MIZ", st, ebm.Forcing(0.0),
                          ebm.default_parameters("MIZ"), ebm.zeros_init(st),
                          engine="bogus", progress=False, dtype=DTYPE)


class TestMeshedFusedEngine:
    def test_high_level_api_on_virtual_mesh(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["D"] = np.linspace(0.55, 0.65, 16)
        kw = dict(n_members=16, dtype=DTYPE, newton_max_iter=8)
        meshed = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="fused", mesh=ensemble_mesh(8), **kw,
        )
        local = ens.ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            engine="fused", **kw,
        )
        assert meshed.seasonal.avg["E"].shape == (16, st.dur, st.nx)
        assert meshed.seasonal.avg["E"].shape == (16, st.dur, st.nx)
        # shard_map groups the adaptive Newton over 2-member shards, so the
        # interpret-mode graph difference is larger than in the local case;
        # compare the pre-amplification year only (hardware is bitwise vs
        # the unchunked meshed run)
        for k in ("E", "h", "phi"):
            assert np.isfinite(np.nan_to_num(meshed.seasonal.avg[k])).all(), k
            np.testing.assert_allclose(
                np.nan_to_num(meshed.seasonal.avg[k][:, 0]),
                np.nan_to_num(local.seasonal.avg[k][:, 0]),
                atol=0.5, err_msg=k,
            )

    def test_mesh_requires_fused(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        st = ebm.SpaceTime.sin(40, 200, 1)
        with pytest.raises(ValueError, match="mesh= requires"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
                ebm.zeros_init(st), n_members=8, engine="batched",
                mesh=ensemble_mesh(8), dtype=DTYPE,
            )

    def test_mesh_rejects_raw(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        st = ebm.SpaceTime.sin(40, 200, 1)
        with pytest.raises(ValueError, match="raw_mode='none'"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
                ebm.zeros_init(st), n_members=8, engine="fused",
                mesh=ensemble_mesh(8), raw_mode="last", dtype=DTYPE,
            )


def test_padded_members_do_not_poison_convergence():
    """Zero-padded parameter rows used to make the Newton residual 0/0 and
    force converged=0.0 for any padded K (including all single runs)."""
    st = ebm.SpaceTime.sin(40, 200, 1)
    par = Collection(
        {k: jnp.asarray(v, DTYPE) for k, v in ebm.default_parameters("MIZ").items()}
    )
    cfg = StepConfig(solver="pcr", newton_abstol=0.5, newton_reltol=1e-4,
                     newton_max_step=50.0)
    spec = get_model("MIZ")
    for k in (1, 3):
        carry = spec.init_carry(ebm.zeros_init(st), st, DTYPE)
        carry = Collection(
            {n: jnp.broadcast_to(v, (k,) + v.shape) for n, v in carry.items()}
        )
        _, _, conv, _ = pallas_miz_year(
            carry, par, jnp.zeros(st.nt, DTYPE), st, cfg, interpret=True
        )
        assert float(np.asarray(conv)) == 1.0, k


class TestFusedYearsPerDispatch:
    """Multi-year fused dispatch: a lax.scan feeds the carry through the
    unchanged Pallas year kernel. On hardware the kernel is an opaque custom
    call, so chunked results are BITWISE identical to the per-year fused path
    (verified on a real TPU chip: max |diff| = 0.0 over 4 years, K=8).
    Interpret mode (these CPU tests) re-traces the kernel body inside the
    scan, so XLA:CPU fuses the two graphs differently and FMA-level rounding
    amplifies through the chaotic MIZ dynamics — here we assert the
    semantic properties that survive that: year-1 closeness (a chunk
    off-by-one or dropped accumulator would blow past these tolerances by
    orders of magnitude), chunk-boundary shapes, and checkpoint-key
    compatibility."""

    def _run(self, model, dur, raw_mode="none", **kw):
        st = ebm.SpaceTime.sin(40, 200 if model == "MIZ" else 1000, dur)
        par = ebm.default_parameters(model)
        init = (ebm.zeros_init(st) if model == "MIZ"
                else Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx)))
        return ebm.integrate(model, st, ebm.Forcing(0.0), par, init,
                             engine="fused", raw_mode=raw_mode, progress=False,
                             dtype=DTYPE, newton_max_iter=8, **kw)

    @staticmethod
    def assert_chunk_equiv(a, b, atol_by_year):
        for store in ("avg", "winter", "summer"):
            for k, va in getattr(a, store).items():
                vb = getattr(b, store)[k]
                assert va.shape == vb.shape, f"{store}.{k}"
                for y, atol in enumerate(atol_by_year):
                    np.testing.assert_allclose(
                        np.nan_to_num(va[..., y, :]),
                        np.nan_to_num(vb[..., y, :]),
                        atol=atol, err_msg=f"{store}.{k} year {y}",
                    )

    @pytest.mark.parametrize("model,atols", [
        ("MIZ", (0.2, 2.0)),       # chaotic: graph-rounding amplifies
        ("Classic", (1e-3, 1e-3)), # stable: rounding stays at float32 level
    ])
    def test_single_run_chunk_equivalence(self, model, atols):
        a = self._run(model, dur=2)
        b = self._run(model, dur=2, years_per_dispatch=2)
        self.assert_chunk_equiv(a.seasonal, b.seasonal, atols)

    def test_chunk_boundaries_and_raw_fallback(self):
        # dur=5 with ypd=2 and a raw final year: chunks 2+2, then the
        # raw-collect year takes the scan fallback — shapes must line up
        a = self._run("MIZ", dur=5, raw_mode="last")
        b = self._run("MIZ", dur=5, raw_mode="last", years_per_dispatch=2)
        assert b.raw["E"].shape == (200, 40)
        assert b.seasonal.avg["E"].shape == (5, 40)
        self.assert_chunk_equiv(a.seasonal, b.seasonal, (0.2,))
        assert all(np.isfinite(np.nan_to_num(v)).all()
                   for v in b.seasonal.avg.values())

    def test_checkpoint_resume_mixes_chunkings(self, tmp_path):
        """engine='fused' keeps ypd out of the checkpoint key (hardware
        chunking invariance): a run checkpointed per-year resumes under a
        chunked dispatch without a config-mismatch restart, and the two
        resumed continuations agree."""
        import warnings as _warnings

        ck = str(tmp_path / "fused_ypd.h5")
        st = ebm.SpaceTime.sin(40, 200, 3)
        par = ebm.default_parameters("MIZ")
        kw = dict(progress=False, dtype=DTYPE, newton_max_iter=8,
                  engine="fused", raw_mode="none")

        # 1-year prefix checkpoint grafted under the 3-year key (dur is keyed)
        from energybalancemodel_jl_tpu import checkpoint as ckpt_mod

        st1 = ebm.SpaceTime.sin(40, 200, 1)
        ebm.integrate("MIZ", st1, ebm.Forcing(0.0), par, ebm.zeros_init(st1),
                      checkpoint=ck, **kw)
        carry, years, accs, key = ckpt_mod.read_checkpoint(ck)
        ckpt_mod.write_checkpoint(ck, carry, years, accs,
                                  key.replace(repr(st1), repr(st)))

        def resume(**extra):
            with _warnings.catch_warnings(record=True) as caught:
                _warnings.simplefilter("always")
                out = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par,
                                    ebm.zeros_init(st), checkpoint=ck,
                                    resume=True, **extra, **kw)
            assert not any("does not match" in str(w.message) for w in caught)
            return out

        plain = resume()
        # rewrite the prefix checkpoint, then resume chunked: the ypd must
        # NOT enter the key (a mismatch would warn and restart from init)
        ckpt_mod.write_checkpoint(ck, carry, years, accs,
                                  key.replace(repr(st1), repr(st)))
        chunked = resume(years_per_dispatch=2, checkpoint_every=4)
        # year 1 comes verbatim from the checkpoint in both: exact
        for k, v in plain.seasonal.avg.items():
            np.testing.assert_array_equal(
                np.nan_to_num(chunked.seasonal.avg[k][0]),
                np.nan_to_num(v[0]), err_msg=k,
            )
        self.assert_chunk_equiv(plain.seasonal, chunked.seasonal,
                                (0.0, 0.2, 2.0))

    def test_ensemble_chunk_equivalence(self):
        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["D"] = np.linspace(0.55, 0.65, 8)
        kw = dict(n_members=8, dtype=DTYPE, newton_max_iter=8, engine="fused")
        a = ens.ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par,
                                   ebm.zeros_init(st), **kw)
        b = ens.ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par,
                                   ebm.zeros_init(st), years_per_dispatch=2,
                                   **kw)
        assert b.seasonal.avg["E"].shape == (8, st.dur, st.nx)
        self.assert_chunk_equiv(a.seasonal, b.seasonal, (0.2, 2.0))

    def test_ensemble_chunked_on_virtual_mesh(self):
        from energybalancemodel_jl_tpu.parallel.sharding import ensemble_mesh

        st = ebm.SpaceTime.sin(40, 200, 2)
        par = ebm.Collection(ebm.default_parameters("MIZ"))
        par["D"] = np.linspace(0.55, 0.65, 16)
        kw = dict(n_members=16, dtype=DTYPE, newton_max_iter=8, engine="fused")
        local = ens.ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par,
                                       ebm.zeros_init(st), **kw)
        meshed = ens.ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par,
                                        ebm.zeros_init(st),
                                        mesh=ensemble_mesh(8),
                                        years_per_dispatch=2, **kw)
        assert meshed.seasonal.avg["E"].shape == (16, st.dur, st.nx)
        # shard_map groups the adaptive Newton over 2-member shards, so the
        # interpret-mode graph difference is larger than in the local case;
        # compare the pre-amplification year only (hardware is bitwise vs
        # the unchunked meshed run)
        for k in ("E", "h", "phi"):
            assert np.isfinite(np.nan_to_num(meshed.seasonal.avg[k])).all(), k
            np.testing.assert_allclose(
                np.nan_to_num(meshed.seasonal.avg[k][:, 0]),
                np.nan_to_num(local.seasonal.avg[k][:, 0]),
                atol=0.5, err_msg=k,
            )

    def test_ensemble_rejects_ypd_for_xla_engines(self):
        st = ebm.SpaceTime.sin(40, 200, 2)
        with pytest.raises(ValueError, match="years_per_dispatch"):
            ens.ensemble_integrate(
                "MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
                ebm.zeros_init(st), n_members=8, engine="batched",
                years_per_dispatch=2, dtype=DTYPE,
            )


class TestMemberSlabs:
    """Ensembles beyond MAX_LAUNCH_K padded members split into independent
    launch slabs (XLA's compile-time scoped-VMEM accounting rejects single
    launches past ~8192 members); the split must be invisible."""

    def test_slab_schedule(self):
        from energybalancemodel_jl_tpu.ops import pallas_year as py

        assert py._member_slabs(256, 128) == [(0, 256)] or py.MAX_LAUNCH_K < 256
        old = py.MAX_LAUNCH_K
        try:
            py.MAX_LAUNCH_K = 100
            assert py._member_slabs(256, 64) == [(0, 64), (64, 64), (128, 64), (192, 64)]
            py.MAX_LAUNCH_K = 128
            assert py._member_slabs(384, 64) == [(0, 128), (128, 128), (256, 128)]
        finally:
            py.MAX_LAUNCH_K = old

    def test_slab_split_matches_single_launch(self, monkeypatch):
        from energybalancemodel_jl_tpu.ops import pallas_year as py

        st, par, carry, fyear = small_setup(k=24)
        one = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                              block_k=8, interpret=True)
        monkeypatch.setattr(py, "MAX_LAUNCH_K", 16)
        pallas_miz_year.clear_cache()
        many = py.pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                                  block_k=8, interpret=True)
        # same block size in both -> identical per-block kernel work; the
        # tolerance absorbs interpret-mode fusion differences around the
        # slice/concat (test_blocking_invariance calibration)
        for k in one[0]:
            np.testing.assert_allclose(
                np.asarray(one[0][k]), np.asarray(many[0][k]), atol=1e-4,
                err_msg=k,
            )
        for k in one[1].avg:
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(one[1].avg[k])),
                np.nan_to_num(np.asarray(many[1].avg[k])), atol=1e-4,
                err_msg=k,
            )
        assert float(np.asarray(many[2])) == float(np.asarray(one[2]))
        pallas_miz_year.clear_cache()

    def test_classic_slab_split_matches(self, monkeypatch):
        from energybalancemodel_jl_tpu.ops import pallas_year as py
        from energybalancemodel_jl_tpu.ops.pallas_year import pallas_classic_year

        st = ebm.SpaceTime.sin(40, 1000, 1)
        par = Collection({k: jnp.asarray(v, DTYPE)
                          for k, v in ebm.default_parameters("Classic").items()})
        par["D"] = jnp.asarray(np.linspace(0.55, 0.65, 24), DTYPE)
        spec = get_model("Classic")
        carry = spec.init_carry(
            Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx)), st, DTYPE
        )
        carry = Collection(
            {k: jnp.broadcast_to(v, (24,) + v.shape) for k, v in carry.items()}
        )
        fyear = jnp.zeros(st.nt, dtype=DTYPE)
        cfg = StepConfig(solver="pcr")
        one = pallas_classic_year(carry, par, fyear, st, cfg,
                                  block_k=8, interpret=True)
        monkeypatch.setattr(py, "MAX_LAUNCH_K", 16)
        pallas_classic_year.clear_cache()
        many = pallas_classic_year(carry, par, fyear, st, cfg,
                                   block_k=8, interpret=True)
        for k in one[0]:
            np.testing.assert_allclose(
                np.asarray(one[0][k]), np.asarray(many[0][k]), atol=1e-4,
                err_msg=k,
            )
        pallas_classic_year.clear_cache()


class TestTransposedLayout:
    """layout='xk' (grid on sublanes, members on lanes) vs layout='kx'."""

    def test_miz_xk_matches_kx(self):
        st, par, carry, fyear = small_setup()
        kx = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                             interpret=True, layout="kx")
        xk = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                             interpret=True, layout="xk")
        # the layouts differ in PCR pad width (lane vs sublane rounding), and
        # the f32 trajectory amplifies that at the ice edge — same tolerance
        # as the kernel-vs-XLA comparison above
        for k in kx[0]:
            np.testing.assert_allclose(
                np.asarray(kx[0][k]), np.asarray(xk[0][k]), atol=0.5,
                err_msg=k,
            )
        for name in ("winter", "summer", "avg"):
            ck, cx = getattr(kx[1], name), getattr(xk[1], name)
            for k in ck:
                a, b = np.asarray(ck[k]), np.asarray(cx[k])
                np.testing.assert_array_equal(
                    np.isnan(a), np.isnan(b), err_msg=f"{name}.{k} NaN pattern"
                )
                np.testing.assert_allclose(
                    np.nan_to_num(a), np.nan_to_num(b), atol=0.05,
                    err_msg=f"{name}.{k}",
                )

    def test_miz_xk_adaptive_agrees(self):
        """Default adaptive-Newton config: the layouts group convergence
        identically (same 128-member blocks), so they agree to solver noise."""
        st, par, carry, fyear = small_setup()
        cfg = StepConfig(solver="pcr", newton_abstol=0.5, newton_reltol=1e-4,
                         newton_max_step=50.0)
        kx = pallas_miz_year(carry, par, fyear, st, cfg,
                             interpret=True, layout="kx")
        xk = pallas_miz_year(carry, par, fyear, st, cfg,
                             interpret=True, layout="xk")
        # adaptive iteration counts differ between layouts (the convergence
        # max includes the padded grid region, 88 lanes in 'kx' vs 0 rows in
        # 'xk' here), and the f32 trajectory amplifies that at a couple of
        # ice-edge cells — bound the typical field and the outlier count
        for k in kx[0]:
            a, b = np.asarray(kx[0][k]), np.asarray(xk[0][k])
            outliers = np.abs(a - b) > 0.5
            assert outliers.mean() < 0.02, (
                f"{k}: {outliers.sum()} elements differ by more than 0.5"
            )
        assert float(np.asarray(xk[2])) == 1.0

    def test_classic_xk_is_bitwise(self):
        """No adaptive loop in the classic kernel: the transposed layout is
        elementwise the same arithmetic (separable S columns are built with
        the table's exact op order; PCR's extra padded sweeps are exact
        no-ops), so results must be bitwise identical."""
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            pallas_classic_year,
        )

        st = ebm.SpaceTime.sin(40, 1000, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        par["D"] = jnp.asarray(np.linspace(0.55, 0.65, K), DTYPE)
        cw = float(np.asarray(par["cw"]))
        E0 = np.tile(np.linspace(5.0, -5.0, st.nx), (K, 1))
        carry = Collection(
            E=jnp.asarray(E0, DTYPE), Tg=jnp.asarray(E0 / cw, DTYPE)
        )
        fyear = jnp.zeros(st.nt, DTYPE)
        kx = pallas_classic_year(carry, par, fyear, st, FIXED_CFG,
                                 interpret=True, layout="kx")
        xk = pallas_classic_year(carry, par, fyear, st, FIXED_CFG,
                                 interpret=True, layout="xk")
        for k in kx[0]:
            np.testing.assert_array_equal(
                np.asarray(kx[0][k]), np.asarray(xk[0][k]), err_msg=k
            )
        for name in ("winter", "summer", "avg"):
            ck, cx = getattr(kx[1], name), getattr(xk[1], name)
            for k in ck:
                np.testing.assert_array_equal(
                    np.asarray(ck[k]), np.asarray(cx[k]),
                    err_msg=f"{name}.{k}",
                )

    def test_xk_scalar_broadcast_and_member_padding(self):
        # K=8 pads to a 128-lane block; identical members must stay identical
        st, par, carry, fyear = small_setup()
        par = Collection(par)
        par["D"] = jnp.asarray(0.6, DTYPE)
        c, seas, conv, _ = pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                                           interpret=True, layout="xk")
        assert c["Ei"].shape == (K, st.nx)
        e = np.asarray(seas.avg["E"])
        np.testing.assert_array_equal(e, np.broadcast_to(e[:1], e.shape))

    def test_xk_rejects_non_lane_block(self):
        st, par, carry, fyear = small_setup()
        with pytest.raises(ValueError, match="multiple of 128"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            block_k=64, interpret=True, layout="xk")

    def test_xk_vmem_guard(self):
        st = ebm.SpaceTime.sin(2048, 200, 1)
        par = ebm.default_parameters("MIZ")
        spec = get_model("MIZ")
        carry = spec.init_carry(ebm.zeros_init(st), st, DTYPE)
        carry = Collection(
            {k: jnp.broadcast_to(v, (8,) + v.shape) for k, v in carry.items()}
        )
        with pytest.raises(ValueError, match="VMEM budget"):
            pallas_miz_year(
                carry,
                Collection({k: jnp.asarray(v, DTYPE) for k, v in par.items()}),
                jnp.zeros(st.nt, DTYPE), st, FIXED_CFG,
                interpret=True, layout="xk",
            )

    def test_rejects_unknown_layout(self):
        st, par, carry, fyear = small_setup()
        with pytest.raises(ValueError, match="layout"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="bogus")


class TestFusedFitPredicate:
    """``fused_unfit`` — the single predicate engine='auto' resolvers use to
    fall back to the XLA engines when no whole-year-kernel layout can launch
    (advisor finding r1: auto used to raise at high resolution)."""

    def test_canonical_config_fits(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import fused_unfit

        st = ebm.SpaceTime.sin(180, 2000, 1)
        assert fused_unfit("MIZ", st, jnp.float32) is None
        assert fused_unfit("Classic", st, jnp.float32) is None

    def test_fit_scales_with_member_count(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import fused_unfit

        # since the 'kx' separable-insolation rebuild (round 3) no layout
        # holds an (nt, nx) table, so nt never matters and the 'kx' bound
        # scales with the MEMBER block: nx=1024/nt=4000 f32 fits a single
        # run in 'kx' (60 planes x 8 sublanes x 1024 lanes = 2 MB) while a
        # wide MIZ ensemble (Kt=128 -> 31.5 MB) fits no layout ('xk' is
        # 31.5 MB too); the classic working set is half and fits both ways
        st = ebm.SpaceTime.sin(1024, 4000, 1)
        assert fused_unfit("MIZ", st, jnp.float32) is None          # K=1
        assert fused_unfit("MIZ", st, jnp.float32, K=1024) is not None
        assert fused_unfit("Classic", st, jnp.float32) is None
        assert fused_unfit("Classic", st, jnp.float32, K=1024) is None

    def test_table_sweep_requires_xk(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import fused_unfit

        st = ebm.SpaceTime.sin(1024, 4000, 1)
        par = Collection(S0=jnp.asarray(np.linspace(410.0, 430.0, 8)))
        # classic fits via 'xk' even with swept table parameters...
        assert fused_unfit("Classic", st, jnp.float32, par) is None
        # ...MIZ cannot (xk working set over budget)
        assert fused_unfit("MIZ", st, jnp.float32, par) is not None

    def test_single_run_boundaries(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import fused_unfit

        # K=1 'kx' working-set boundaries (f32, 28 MB budget): MIZ
        # 60 planes x 8 x nxp x 4 B crosses at nxp > 15288, classic
        # (30 planes) at nxp > 30576
        assert fused_unfit("MIZ", ebm.SpaceTime.sin(8192, 1000, 1),
                           jnp.float32) is None
        assert fused_unfit("MIZ", ebm.SpaceTime.sin(16384, 1000, 1),
                           jnp.float32) is not None
        assert fused_unfit("Classic", ebm.SpaceTime.sin(16384, 1000, 1),
                           jnp.float32) is None
        assert fused_unfit("Classic", ebm.SpaceTime.sin(32768, 1000, 1),
                           jnp.float32) is not None

    def test_auto_resolver_picks_kx_where_xk_is_over_budget(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            XK_PLANES_MIZ, _resolve_layout,
        )

        # single high-res run: the 'xk' working set (60 x 4096 x 128 x 4 B
        # = 126 MB) is far over budget, 'kx' (60 x 8 x 4096 x 4 B = 7.9 MB)
        # fits — the resolver must land on 'kx', whose launch guard accepts
        assert _resolve_layout(None, 1, 4096, 128, 4,
                               XK_PLANES_MIZ) == "kx"

    def test_resolver_never_picks_a_layout_its_guard_rejects(self):
        """An auto-selected layout must pass its own launch guard (review
        r3b): in a window around MIZ f32 nx~900 / K~129 the tile heuristic
        preferred 'kx' while only 'xk' fits the VMEM budget, so
        engine='auto' (whose fused_unfit admitted the config) crashed on
        the 'kx' guard. Sweep the window for both models."""
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            XK_PLANES_CLASSIC, XK_PLANES_MIZ, _kx_fits, _resolve_layout,
            _xk_fits,
        )

        checked = 0
        for planes, nxs in ((XK_PLANES_MIZ, (896, 904, 952)),
                            (XK_PLANES_CLASSIC, (1800, 1856, 1908))):
            for nx in nxs:
                for K in (64, 121, 129, 160, 225, 256):
                    xk = _xk_fits(nx, 128, 4, planes)
                    kx = _kx_fits(nx, K, 128, 4, planes)
                    if xk is not None and kx is not None:
                        continue  # fused_unfit rejects: resolver unused
                    layout = _resolve_layout(None, K, nx, 128, 4, planes)
                    fit = xk if layout == "xk" else kx
                    assert fit is None, (nx, K, layout, fit)
                    checked += 1
        assert checked  # the window must actually be exercised

    def test_integrate_auto_falls_back_to_scan(self, monkeypatch):
        """A default integrate() at a resolution the kernels cannot launch
        must run on the scan engine instead of raising (advisor r1). The TPU
        branch is forced by faking the backend; 'unfit' is forced by zeroing
        the VMEM budgets so the config itself can stay tiny."""
        from energybalancemodel_jl_tpu.ops import pallas_year as py

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(py, "_xk_fits", lambda *a, **k: "forced unfit")
        monkeypatch.setattr(py, "_kx_fits", lambda *a, **k: "forced unfit")
        st = ebm.SpaceTime.sin(16, 30, 1)
        sols = ebm.integrate(
            "MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
            ebm.zeros_init(st), progress=False, raw_mode="none",
            dtype=jnp.float32,
        )
        assert sols.seasonal.avg["E"].shape == (1, st.nx)

    def test_ensemble_auto_excludes_float64(self, monkeypatch):
        """Advisor r1 medium: the x64 parity config must never route to the
        fused kernel under engine='auto' (Mosaic has no practical f64 path)."""
        from energybalancemodel_jl_tpu.parallel.ensemble import (
            ensemble_integrate,
        )

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

        def boom(*a, **kw):  # any fused-path touch is a wrong engine choice
            raise AssertionError("auto selected the fused engine for float64")

        from energybalancemodel_jl_tpu.ops import pallas_year as py

        monkeypatch.setattr(py, "pallas_miz_year", boom)
        st = ebm.SpaceTime.sin(16, 30, 1)
        par = Collection(ebm.default_parameters("MIZ"))
        par["D"] = np.linspace(0.55, 0.65, 4)
        out = ensemble_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
            n_members=4, dtype=jnp.float64, progress=False,
        )
        assert out.seasonal.avg["E"].shape == (4, 1, st.nx)


class TestInKernelOU:
    """The round-4 ``noise_ou`` kernel mode: the OU recurrence computed
    IN-KERNEL from a white-noise table must match feeding the kernel the
    XLA-precomputed OU path as a plain ``noise`` table (same per-step
    forcing offsets, so identical trajectories up to the two graphs'
    contraction-level rounding), and the 4th return value must be the
    year-end eta row. Both MIZ and classic 'xk' kernels."""

    def _ou_inputs(self, st, k, seed=3):
        rng = np.random.default_rng(seed)
        xi = jnp.asarray(rng.normal(size=(st.nt, k)), DTYPE)  # (nt, K)
        rho = jnp.asarray(0.97, DTYPE)
        scale = jnp.asarray(np.linspace(0.5, 2.0, k), DTYPE)  # per-member
        eta0 = jnp.asarray(rng.normal(size=(k,)), DTYPE)

        def ou(e, z):
            e = rho * e + scale * z
            return e, e

        eta_end, etas = jax.lax.scan(ou, eta0, xi)
        return xi, etas, eta_end, rho, scale, eta0

    def test_miz_ou_mode_matches_precomputed_table(self):
        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        xi, etas, eta_end, rho, scale, eta0 = self._ou_inputs(st, 4)
        c_tab, s_tab, conv_tab, none4 = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=etas)
        assert none4 is None
        c_ou, s_ou, conv_ou, eta_ret = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=xi, noise_ou=(rho, scale, eta0))
        assert eta_ret is not None and eta_ret.shape == (4,)
        np.testing.assert_allclose(np.asarray(eta_ret),
                                   np.asarray(eta_end), rtol=1e-5)
        for key in c_tab:
            np.testing.assert_allclose(
                np.asarray(c_ou[key]), np.asarray(c_tab[key]),
                atol=1e-3, err_msg=key)
        np.testing.assert_allclose(
            np.asarray(s_ou.avg["E"]), np.asarray(s_tab.avg["E"]), atol=1e-3)

    def test_classic_ou_mode_matches_precomputed_table(self):
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            pallas_classic_year,
        )

        st = ebm.SpaceTime.sin(16, 48, 1)
        par = Collection(
            {k_: jnp.asarray(v, DTYPE)
             for k_, v in ebm.default_parameters("Classic").items()}
        )
        k = 4
        par["D"] = jnp.asarray(np.linspace(0.55, 0.65, k), DTYPE)
        spec = get_model("Classic")
        E0 = np.full(st.nx, 30.0)
        init = Collection(E=E0, Tg=E0 / float(par["cw"]))
        carry = spec.init_carry(init, st, DTYPE)
        carry = Collection(
            {k_: jnp.broadcast_to(v, (k,) + v.shape)
             for k_, v in carry.items()}
        )
        fyear = jnp.zeros(st.nt, dtype=DTYPE)
        xi, etas, eta_end, rho, scale, eta0 = self._ou_inputs(st, k)
        c_tab, s_tab, _, _ = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=etas)
        c_ou, s_ou, _, eta_ret = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=xi, noise_ou=(rho, scale, eta0))
        assert eta_ret is not None and eta_ret.shape == (k,)
        np.testing.assert_allclose(np.asarray(eta_ret),
                                   np.asarray(eta_end), rtol=1e-5)
        # classic at nt=48 sits below its nt~1000 stability floor
        # (dt*M/cw > 1, CLAUDE.md), so the two graphs' FMA-contraction
        # differences amplify along the year — the per-step forcing
        # equivalence is pinned by the bitwise-tight eta match above;
        # the trajectory check is a coarse same-dynamics guard
        np.testing.assert_allclose(
            np.asarray(c_ou["E"]), np.asarray(c_tab["E"]),
            rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(s_ou.avg["T"]), np.asarray(s_tab.avg["T"]),
            rtol=1e-3, atol=1e-2)

    def test_ou_without_table_raises(self):
        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        with pytest.raises(ValueError, match="noise_ou requires"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="xk",
                            noise_ou=(0.9, 1.0, jnp.zeros((4,), DTYPE)))


class TestInKernelDraws:
    """The round-5 ``noise_keys`` kernel mode: the kernel GENERATES its
    white-noise table from per-member keys (ops/prng.py threefry+erfinv
    replication). Correctness contract: a keys-mode launch must be
    BITWISE identical to a table-mode launch fed the XLA-side oracle
    ``prng.normal_table`` of the same keys (any draw-bit difference would
    diverge the chaotic trajectories). ``ou_assoc`` precomputes the eta
    path by log-depth scan — engine-parity (not bitwise) vs serial, and
    exactly deterministic at scale = eta0 = 0."""

    def _keys(self, k, seed=7, year=2):
        base = jax.random.PRNGKey(seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
            jnp.arange(k, dtype=jnp.uint32))
        return jax.vmap(lambda key: jax.random.fold_in(key, year))(keys)

    def test_miz_keys_mode_bitwise_vs_oracle_table(self):
        from energybalancemodel_jl_tpu.ops import prng

        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        yk = self._keys(4)
        table = prng.normal_table(yk, st.nt)
        rho = jnp.asarray(0.9, DTYPE)
        scale = jnp.asarray(np.linspace(0.5, 2.0, 4), DTYPE)
        eta0 = jnp.zeros((4,), DTYPE)
        c_tab, s_tab, _, eta_tab = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=table, noise_ou=(rho, scale, eta0))
        c_gen, s_gen, _, eta_gen = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk, noise_ou=(rho, scale, eta0))
        for key in c_tab:
            np.testing.assert_array_equal(
                np.asarray(c_gen[key]), np.asarray(c_tab[key]),
                err_msg=key)
        np.testing.assert_array_equal(np.asarray(s_gen.avg["E"]),
                                      np.asarray(s_tab.avg["E"]))
        np.testing.assert_array_equal(np.asarray(eta_gen),
                                      np.asarray(eta_tab))

    def test_classic_keys_mode_bitwise_vs_oracle_table(self):
        from energybalancemodel_jl_tpu.ops import prng
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            pallas_classic_year,
        )

        st = ebm.SpaceTime.sin(16, 48, 1)
        par = Collection(
            {k_: jnp.asarray(v, DTYPE)
             for k_, v in ebm.default_parameters("Classic").items()})
        spec = get_model("Classic")
        E0 = np.full(st.nx, 30.0)
        init = Collection(E=E0, Tg=E0 / float(par["cw"]))
        carry = spec.init_carry(init, st, DTYPE)
        carry = Collection(
            {k_: jnp.broadcast_to(v, (4,) + v.shape)
             for k_, v in carry.items()})
        fyear = jnp.zeros(st.nt, dtype=DTYPE)
        yk = self._keys(4, seed=1)
        table = prng.normal_table(yk, st.nt)
        rho = jnp.asarray(0.9, DTYPE)
        scale = jnp.asarray(1.5, DTYPE)
        eta0 = jnp.zeros((4,), DTYPE)
        c_tab, s_tab, _, eta_tab = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=table, noise_ou=(rho, scale, eta0))
        c_gen, s_gen, _, eta_gen = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk, noise_ou=(rho, scale, eta0))
        for key in c_tab:
            np.testing.assert_array_equal(
                np.asarray(c_gen[key]), np.asarray(c_tab[key]),
                err_msg=key)
        np.testing.assert_array_equal(np.asarray(eta_gen),
                                      np.asarray(eta_tab))

    def test_plain_noise_keys_mode_rejected(self):
        """keys WITHOUT noise_ou is rejected (round-5 review): padded
        lanes replicate the last member's keys, so their generated
        draws would be live white-noise forcing with no zero-padded OU
        scale to neutralize it — fictitious-lane dynamics would feed
        the MIZ block-min Newton flag. Plain white-noise offsets take
        the explicit (zero-padded) noise= table instead."""
        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        yk = self._keys(4, seed=5)
        with pytest.raises(ValueError, match="requires noise_ou"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="xk", noise_keys=yk)

    def test_assoc_matches_serial_at_roundoff(self):
        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        yk = self._keys(4)
        rho = jnp.asarray(0.9, DTYPE)
        scale = jnp.asarray(np.linspace(0.5, 2.0, 4), DTYPE)
        eta0 = jnp.asarray([0.3, -0.2, 0.0, 1.0], DTYPE)
        c_s, _, _, eta_s = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk, noise_ou=(rho, scale, eta0))
        c_a, _, _, eta_a = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk, noise_ou=(rho, scale, eta0), ou_assoc=True)
        # the tree-regrouped eta is a ~1 ulp twin of the serial chain
        np.testing.assert_allclose(np.asarray(eta_a), np.asarray(eta_s),
                                   rtol=1e-5, atol=1e-6)
        for key in c_s:
            np.testing.assert_allclose(
                np.asarray(c_a[key]), np.asarray(c_s[key]),
                atol=1e-3, err_msg=key)

    def test_assoc_eta_path_matches_xla_scan(self):
        """The log-depth in-kernel OU path == the XLA serial scan at
        round-off, pinned directly through the plain-noise equivalence:
        assoc eta output vs a numpy serial recurrence on oracle draws."""
        from energybalancemodel_jl_tpu.ops import prng

        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        yk = self._keys(4, seed=9)
        xi = np.asarray(prng.normal_table(yk, st.nt), np.float64)
        rho, eta0 = 0.93, np.array([0.5, -1.0, 0.0, 2.0])
        scale = np.linspace(0.5, 2.0, 4)
        eta = eta0.copy()
        for t_ in range(st.nt):
            eta = rho * eta + scale * xi[t_]
        _, _, _, eta_a = pallas_miz_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk,
            noise_ou=(jnp.asarray(rho, DTYPE), jnp.asarray(scale, DTYPE),
                      jnp.asarray(eta0, DTYPE)),
            ou_assoc=True)
        np.testing.assert_allclose(np.asarray(eta_a), eta,
                                   rtol=1e-4, atol=1e-5)

    def test_error_paths(self):
        st, par, carry, fyear = small_setup(nx=16, nt=48, k=4)
        yk = self._keys(4)
        table = jnp.zeros((st.nt, 4), DTYPE)
        with pytest.raises(ValueError, match="mutually exclusive"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="xk", noise=table,
                            noise_keys=yk)
        with pytest.raises(ValueError, match="requires noise_keys"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="xk", noise=table,
                            noise_ou=(0.9, 1.0, jnp.zeros((4,), DTYPE)),
                            ou_assoc=True)
        with pytest.raises(ValueError, match="uint32 key-data"):
            pallas_miz_year(carry, par, fyear, st, FIXED_CFG,
                            interpret=True, layout="xk",
                            noise_keys=jnp.zeros((4, 2), jnp.int32),
                            noise_ou=(0.9, 1.0, jnp.zeros((4,), DTYPE)))

    def test_multi_chunk_generation_fills_every_row(self):
        """nt above _GEN_CHUNK exercises the chunked fill's tail
        (regression: a floor-divided chunk count left rows >= 1024
        uninitialized at the canonical nt=2000)."""
        from energybalancemodel_jl_tpu.ops import prng
        from energybalancemodel_jl_tpu.ops.pallas_year import (
            _GEN_CHUNK, pallas_classic_year,
        )

        nt = _GEN_CHUNK + 512
        st = ebm.SpaceTime.sin(8, nt, 1)
        par = Collection(
            {k_: jnp.asarray(v, DTYPE)
             for k_, v in ebm.default_parameters("Classic").items()})
        spec = get_model("Classic")
        E0 = np.full(st.nx, 30.0)
        init = Collection(E=E0, Tg=E0 / float(par["cw"]))
        carry = spec.init_carry(init, st, DTYPE)
        carry = Collection(
            {k_: jnp.broadcast_to(v, (3,) + v.shape)
             for k_, v in carry.items()})
        fyear = jnp.zeros(st.nt, dtype=DTYPE)
        yk = self._keys(3, seed=2)
        rho = jnp.asarray(0.9, DTYPE)
        scale = jnp.asarray(0.5, DTYPE)
        eta0 = jnp.zeros((3,), DTYPE)
        c_tab, _, _, eta_tab = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise=prng.normal_table(yk, nt), noise_ou=(rho, scale, eta0))
        c_gen, _, _, eta_gen = pallas_classic_year(
            carry, par, fyear, st, FIXED_CFG, interpret=True, layout="xk",
            noise_keys=yk, noise_ou=(rho, scale, eta0))
        assert np.isfinite(np.asarray(eta_gen)).all()
        np.testing.assert_array_equal(np.asarray(eta_gen),
                                      np.asarray(eta_tab))
        for key in c_tab:
            np.testing.assert_array_equal(
                np.asarray(c_gen[key]), np.asarray(c_tab[key]),
                err_msg=key)
