"""2-D mesh (members x grid) ensemble integration — parallel/grid2d.py."""
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.parallel import ensemble_integrate
from energybalancemodel_jl_tpu.parallel.grid2d import (
    ensemble_spatial_integrate,
    grid2d_mesh,
)

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)

ST = ebm.SpaceTime.sin(16, 50, 2)
PAR = ebm.default_parameters("MIZ")


def swept_par(K=6):
    par = ebm.Collection(PAR)
    par["D"] = np.linspace(0.55, 0.65, K)
    return par


class TestGrid2D:
    def test_matches_unsharded_batched_ensemble(self):
        """members x grid sharding reproduces the single-device batched
        engine to SPIKE-reduction rounding (~1e-13 at f64) — the same bound
        as the 1-D spatial path."""
        par = swept_par()
        init = ebm.zeros_init(ST)
        ens = ensemble_integrate("MIZ", ST, ebm.Forcing(0.0), par, init,
                                 engine="batched", raw_mode="last",
                                 progress=False)
        ens2 = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par, init, mesh=grid2d_mesh(2, 4),
            raw_mode="last", progress=False,
        )
        assert ens2.n_members == 6
        for k in ("E", "h", "phi", "T", "Ti", "Tw"):
            for store in ("avg", "winter", "summer"):
                a = np.nan_to_num(np.asarray(getattr(ens.seasonal, store)[k]))
                b = np.nan_to_num(np.asarray(getattr(ens2.seasonal, store)[k]))
                np.testing.assert_allclose(
                    b, a, rtol=1e-10, atol=1e-11, err_msg=f"{store}.{k}"
                )
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(ens2.raw["E"])),
            np.nan_to_num(np.asarray(ens.raw["E"])),
            rtol=1e-10, atol=1e-11,
        )

    def test_mesh_shapes(self):
        m = grid2d_mesh(4, 2)
        assert m.shape["k"] == 4 and m.shape["x"] == 2
        with pytest.raises(ValueError, match="devices"):
            grid2d_mesh(4, 4)

    def test_classic_on_2d_mesh(self):
        st = ebm.SpaceTime.identity(16, 1000, 1)
        par = ebm.Collection(ebm.default_parameters("Classic"))
        par["A"] = np.linspace(190.0, 196.0, 4)
        E0 = np.full(st.nx, 30.0)
        init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
        ens = ensemble_integrate("Classic", st, ebm.Forcing(0.0), par, init,
                                 engine="batched", progress=False)
        ens2 = ensemble_spatial_integrate(
            "Classic", st, ebm.Forcing(0.0), par, init,
            mesh=grid2d_mesh(2, 4), progress=False,
        )
        np.testing.assert_allclose(
            np.asarray(ens2.seasonal.avg["E"]),
            np.asarray(ens.seasonal.avg["E"]), rtol=1e-10, atol=1e-11,
        )

    def test_checkpoint_resume_bit_exact(self, tmp_path):
        par = swept_par()
        init = ebm.zeros_init(ST)
        mesh = grid2d_mesh(2, 4)
        full = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par, init, mesh=mesh,
            progress=False,
        )
        ck = str(tmp_path / "g2d.ckpt.h5")
        st1 = ebm.SpaceTime.sin(16, 50, 1)
        ensemble_spatial_integrate(
            "MIZ", st1, ebm.Forcing(0.0), par, ebm.zeros_init(st1),
            mesh=mesh, progress=False, checkpoint=ck,
        )
        # graft the 1-year state under the 2-year key and resume
        from energybalancemodel_jl_tpu import checkpoint as ckpt

        carry, years, acc, _ = ckpt.read_checkpoint(ck)
        key2 = ckpt.config_key(
            "grid2d2x4", "MIZ", ST, ebm.Forcing(0.0), par, "float64", "pcr",
            30, ("K=6",),
        )
        ck2 = str(tmp_path / "g2d2.ckpt.h5")
        ckpt.write_checkpoint(ck2, carry, years, acc, key2)
        resumed = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par, init, mesh=mesh,
            progress=False, checkpoint=ck2, resume=True,
        )
        for k in ("E", "h", "phi"):
            np.testing.assert_array_equal(
                np.nan_to_num(resumed.seasonal.avg[k]),
                np.nan_to_num(full.seasonal.avg[k]), err_msg=k,
            )

    def test_virtual_F_sweep_matches_ensemble(self):
        """The virtual forcing-offset sweep 'F' must be realized as
        per-member forcing rows, exactly as in ensemble_integrate — no
        model reads par['F'], so passing it through would silently return
        identical members (review r2)."""
        par = ebm.Collection(PAR)
        par["F"] = np.linspace(-1.0, 3.0, 6)
        init = ebm.zeros_init(ST)
        ens = ensemble_integrate("MIZ", ST, ebm.Forcing(0.0), par, init,
                                 engine="batched", progress=False)
        ens2 = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par, init, mesh=grid2d_mesh(2, 4),
            progress=False,
        )
        E = np.nan_to_num(np.asarray(ens2.seasonal.avg["E"]))
        # members must differ (F applied) and match the 1-D ensemble
        assert np.abs(E[0] - E[-1]).max() > 1.0
        np.testing.assert_allclose(
            E, np.nan_to_num(np.asarray(ens.seasonal.avg["E"])),
            rtol=1e-10, atol=1e-11,
        )
        # scalar F is a shared offset, also applied
        par_s = ebm.Collection(PAR)
        par_s["F"] = 2.0
        par_v = ebm.Collection(PAR)
        par_v["F"] = np.full(6, 2.0)
        e_s = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par_s, init, n_members=6,
            mesh=grid2d_mesh(2, 4), progress=False,
        )
        e_v = ensemble_spatial_integrate(
            "MIZ", ST, ebm.Forcing(0.0), par_v, init,
            mesh=grid2d_mesh(2, 4), progress=False,
        )
        np.testing.assert_array_equal(
            np.nan_to_num(np.asarray(e_s.seasonal.avg["E"])),
            np.nan_to_num(np.asarray(e_v.seasonal.avg["E"])),
        )

    def test_K_collides_with_nt(self):
        """K == nt must not confuse the statics specs: the old shape
        heuristic read the (nt, nx) insolation table's leading axis as the
        member axis and split it across member rows (trace-time scan crash,
        review r3). Detection is now exact (batched-vs-unbatched
        eval_shape), so this config must run and match the 1-D ensemble."""
        st = ebm.SpaceTime.sin(16, 50, 1)  # nt == 50
        par = ebm.Collection(PAR)
        par["D"] = np.linspace(0.55, 0.65, 50)  # K == nt == 50
        init = ebm.zeros_init(st)
        ens2 = ensemble_spatial_integrate(
            "MIZ", st, ebm.Forcing(0.0), par, init, mesh=grid2d_mesh(2, 4),
            progress=False,
        )
        E = np.nan_to_num(np.asarray(ens2.seasonal.avg["E"]))
        assert E.shape == (50, 1, 16) and np.isfinite(E).all()
        ens = ensemble_integrate("MIZ", st, ebm.Forcing(0.0), par, init,
                                 engine="batched", progress=False)
        np.testing.assert_allclose(
            E, np.nan_to_num(np.asarray(ens.seasonal.avg["E"])),
            rtol=1e-10, atol=1e-11,
        )

    def test_raw_all_budget_guard(self):
        par = swept_par()
        with pytest.raises(ValueError, match="raw_memory_limit"):
            ensemble_spatial_integrate(
                "MIZ", ST, ebm.Forcing(0.0), par, ebm.zeros_init(ST),
                mesh=grid2d_mesh(2, 4), raw_mode="all", raw_memory_limit=64,
                progress=False,
            )

    def test_validation(self):
        par = swept_par()
        init = ebm.zeros_init(ST)
        with pytest.raises(ValueError, match="member rows"):
            ensemble_spatial_integrate(
                "MIZ", ST, ebm.Forcing(0.0), swept_par(5), init,
                mesh=grid2d_mesh(2, 4), progress=False,
            )
        with pytest.raises(ValueError, match="grid columns"):
            st = ebm.SpaceTime.sin(18, 50, 1)
            ensemble_spatial_integrate(
                "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
                mesh=grid2d_mesh(2, 4), progress=False,
            )
        with pytest.raises(ValueError, match="insolation-table"):
            p = ebm.Collection(PAR)
            p["S0"] = np.linspace(415.0, 425.0, 6)
            ensemble_spatial_integrate(
                "MIZ", ST, ebm.Forcing(0.0), p, init,
                mesh=grid2d_mesh(2, 4), progress=False,
            )
