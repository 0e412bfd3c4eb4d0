"""Every example RUNS end to end — the showcase code cannot rot at
runtime with CI green (review r2: the old import-only check let bad
kwargs deep in a body slip through).

Each example's ``main`` accepts ``fast=True``, a CI-sized configuration
(smaller grids/horizons, same workflow); examples that write files also
take ``outdir``. Running a body both executes every API call the
example demonstrates AND asserts the example's own internal checks
(e.g. adjoint-vs-FD agreement in adjoint_sensitivity.py).
"""
import importlib.util
import inspect
import pathlib

import matplotlib
import pytest

matplotlib.use("Agg", force=True)

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent / ".." / "examples").resolve().glob("*.py")
)


def _load(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path, tmp_path, capsys):
    mod = _load(path)
    main = getattr(mod, "main", None)
    assert callable(main), f"{path.name} has no main() entry point"
    params = inspect.signature(main).parameters
    assert "fast" in params, (
        f"{path.name}'s main() has no fast= knob — every example must be "
        f"runnable at CI size")
    kwargs = {"fast": True}
    if "outdir" in params:
        kwargs["outdir"] = str(tmp_path)
    main(**kwargs)
    # every example narrates its result; silence means a broken body
    assert capsys.readouterr().out.strip(), f"{path.name} printed nothing"
