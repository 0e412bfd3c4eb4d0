"""Observability: progress bar rendering and profiler trace capture."""
import io
import os

import pytest

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.utils.progress import Progress, _display_time


class _FakeTTY(io.StringIO):
    def isatty(self):
        return True


class TestProgressRendering:
    def test_renders_bar_and_done(self):
        out = _FakeTTY()
        prog = Progress(10, "Integrating", freq=0.0, stream=out,
                        infofeed=lambda t: f"t = {t}")
        for i in range(11):
            prog.update(i, feedargs=(i,))
        text = out.getvalue()
        assert "Integrating" in text
        assert "Done" in text
        assert "t = 10" in text
        assert "100%" in text

    def test_throttling(self):
        out = _FakeTTY()
        prog = Progress(1000, freq=3600.0, stream=out)  # huge throttle
        prog.update(0)
        first = out.getvalue()
        for i in range(1, 500):
            prog.update(i)
        assert out.getvalue() == first  # no re-render within the throttle

    def test_display_time(self):
        assert _display_time(125) == "2:05"
        assert _display_time(float("nan")) == "-:--"
        assert _display_time(float("inf")) == "-:--"


def test_profile_dir_captures_trace(tmp_path):
    st = ebm.SpaceTime.sin(8, 10, 1)
    trace_dir = str(tmp_path / "trace")
    ebm.integrate("MIZ", st, ebm.Forcing(0.0), ebm.default_parameters("MIZ"),
                  ebm.zeros_init(st), progress=False, profile_dir=trace_dir)
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found.extend(files)
    assert found, "profiler produced no trace files"
