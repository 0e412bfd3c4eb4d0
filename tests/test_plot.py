"""Plot layer tests (Agg backend; figures render without error and carry the
expected structure — reference /root/reference/src/plot.jl)."""
import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.plot import Layout, classic_layout, miz_layout


@pytest.fixture(scope="module")
def miz_sols():
    st = ebm.SpaceTime.sin(12, 400, 3)
    return ebm.integrate("MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
                         ebm.zeros_init(st), progress=False)


@pytest.fixture(scope="module")
def classic_sols():
    st = ebm.SpaceTime.identity(12, 1000, 3)
    init = ebm.Collection(E=np.full(12, 30.0), Tg=np.zeros(12))
    return ebm.integrate("Classic", st, ebm.Forcing(0.0),
                         ebm.default_parameters("Classic"), init, progress=False)


class TestLayout:
    def test_shape_validation(self):
        with pytest.raises(ValueError):
            Layout([["E", "T"]], [["only one"]])

    def test_defaults(self):
        assert miz_layout.shape == (3, 3)
        assert classic_layout.shape == (1, 3)
        assert miz_layout[2, 2]["var"] == "phi"
        assert classic_layout[0, 0]["var"] == "E"


class TestBackend:
    def test_get_set(self):
        assert ebm.backend("CairoMakie") is not None  # maps onto Agg
        assert ebm.backend() == "CairoMakie"
        with pytest.raises(ValueError, match="Unsupported"):
            ebm.backend("NopeMakie")

    def test_register(self):
        from energybalancemodel_jl_tpu.plot import register_backend

        register_backend("MyBackend", "Agg")
        assert ebm.backend("MyBackend") is not None


class TestFigures:
    def test_plot_raw_miz(self, miz_sols):
        fig = ebm.plot_raw(miz_sols)
        assert len(fig.axes) >= 9  # 3x3 tiles (+colorbars)

    def test_plot_raw_classic_layout_autoselect(self, classic_sols):
        fig = ebm.plot_raw(classic_sols)
        assert len(fig.axes) >= 3

    def test_plot_avg(self, miz_sols):
        fig = ebm.plot_avg(miz_sols)
        assert len(fig.axes) >= 9

    def test_plot_seasonal_requires_ramp(self, miz_sols):
        with pytest.raises(ValueError, match="time-varying"):
            ebm.plot_seasonal(miz_sols)

    def test_plot_seasonal(self):
        st = ebm.SpaceTime.sin(10, 400, 6)
        ramp = ebm.Forcing(0.0, 2.0, -2.0, (1, 1), (1.0, -1.0))
        sols = ebm.integrate("MIZ", st, ramp, ebm.default_parameters("MIZ"),
                             ebm.zeros_init(st), progress=False)
        fig = ebm.plot_seasonal(sols)
        ax = fig.axes[0]
        assert len(ax.lines) == 6  # 2 segments x 3 seasons

    def test_figure_save(self, miz_sols, tmp_path):
        fig = ebm.plot_avg(miz_sols)
        path = str(tmp_path / "fig.png")
        ebm.save(fig, path)
        import os

        assert os.path.getsize(path) > 0
