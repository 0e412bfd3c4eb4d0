"""SpaceTime / Forcing / parameter tests against reference-documented values
(/root/reference/src/infrastructure.jl docstrings and constants)."""
import numpy as np
import pytest

from energybalancemodel_jl_tpu import (
    Forcing,
    SpaceTime,
    classic_paramset,
    default_parameters,
    default_parval,
    miz_paramset,
)


class TestSpaceTime:
    def test_identity_grid_values(self):
        # docstring example: SpaceTime(100, 2000, 30) -> x = [0.005, 0.015, ...]
        st = SpaceTime.identity(100, 2000, 30)
        np.testing.assert_allclose(st.x[:3], [0.005, 0.015, 0.025], atol=1e-15)
        np.testing.assert_allclose(st.x[-1], 0.995, atol=1e-15)
        np.testing.assert_allclose(st.t[0], 0.00025, atol=1e-18)
        np.testing.assert_allclose(st.t[-1], 0.99975, atol=1e-15)

    def test_sin_grid_values(self):
        # docstring example: SpaceTime{sin}(180, 2000, 30)
        st = SpaceTime.sin(180, 2000, 30)
        np.testing.assert_allclose(st.x[0], 0.00436331, rtol=1e-6)
        np.testing.assert_allclose(st.x[1], 0.0130896, rtol=1e-6)
        np.testing.assert_allclose(st.x[-1], 0.99999, rtol=1e-6)
        assert st.nx == 180 and st.nt == 2000 and st.dur == 30

    def test_time_series(self):
        st = SpaceTime.identity(10, 100, 3)
        assert len(st.T) == 300
        np.testing.assert_allclose(st.T[0], st.dt / 2)
        np.testing.assert_allclose(st.T[-1], 3 - st.dt / 2)

    def test_seasonal_tick_indices(self):
        # nt*0.26125 = 522.5 -> banker's rounding -> 522 (Julia round-to-even)
        st = SpaceTime.sin(180, 2000, 1)
        assert st.winter_inx == 522
        assert st.summer_inx == 1548

    def test_hashable_for_jit_cache(self):
        a = SpaceTime.sin(180, 2000, 1)
        b = SpaceTime.sin(180, 2000, 1)
        assert a == b and hash(a) == hash(b)

    def test_validation(self):
        with pytest.raises(ValueError):
            SpaceTime(0, 10, 1)
        with pytest.raises(ValueError):
            SpaceTime(10, 10, 1, grid="nope")


class TestForcing:
    def test_constant(self):
        f = Forcing(0.0)
        assert f.constant
        assert f(123.4) == 0.0
        np.testing.assert_array_equal(f(np.array([1.0, 2.0])), [0.0, 0.0])

    def test_ramp_docstring_example(self):
        # reference docstring (/root/reference/src/infrastructure.jl:193-206)
        f = Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        assert f.domain == (0, 10, 20, 30, 50)
        assert f(17.57) == pytest.approx(3.785)
        assert f(5.0) == 0.0
        assert f(25.0) == 5.0
        assert f(35.0) == pytest.approx(5.0 - 0.5 * 5.0)
        assert f(60.0) == -5.0

    def test_validation(self):
        with pytest.raises(ValueError):  # non-integer warming time
            Forcing(0.0, 5.0, -5.0, (10, 10), (0.4, -0.5))
        with pytest.raises(ValueError):  # wrong-sign cooling rate
            Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, 0.5))

    def test_table(self):
        st = SpaceTime.identity(4, 10, 60)
        f = Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        tab = f.table(st)
        assert tab.shape == (60, 10)
        np.testing.assert_allclose(tab[5], 0.0)
        np.testing.assert_allclose(tab[25], 5.0)
        np.testing.assert_allclose(tab[59], -5.0)

    def test_annual_mean(self):
        st = SpaceTime.identity(4, 100, 60)
        f = Forcing(0.0, 5.0, -5.0, (10, 10), (0.5, -0.5))
        # year 15 is mid-warming: mean of 0.5*(t-10) over t in [14, 15] = 2.25
        assert f.annual_mean(st, 15) == pytest.approx(2.25, abs=1e-10)


class TestParameters:
    def test_subset_sizes(self):
        assert len(default_parameters("MIZ")) == 22
        assert len(default_parameters("Classic")) == 16
        # any non-MIZ symbol selects classic (reference :473-474)
        assert set(default_parameters("whatever")) == set(classic_paramset)

    def test_reference_values(self):
        p = default_parval
        assert p.D == 0.6 and p.A == 193.0 and p.B == 2.1
        assert p.m1 == pytest.approx(1.6e-6 * 31536000)
        assert p.kappa == pytest.approx(0.01 * 31536000)
        assert p.cg == pytest.approx(0.098)

    def test_paramsets_match_reference(self):
        assert "F" in classic_paramset and "F" not in miz_paramset
        assert "kappa" in miz_paramset and "kappa" not in classic_paramset


def test_custom_grid_callable():
    """SpaceTime accepts an arbitrary monotone grid map (the reference's
    type parameter F can be any function, infrastructure.jl:75-77)."""
    import math

    def quad(u):
        return np.asarray(u) ** 2

    st = SpaceTime(16, 10, 1, grid=quad, urange=(0.0, 1.0))
    np.testing.assert_allclose(st.x, st.u**2)
    from energybalancemodel_jl_tpu.ops.diffusion import diffusion_bands

    geom = diffusion_bands(st)  # general-grid flux form
    assert geom.lo[0] == 0.0 and geom.up[-1] == 0.0
