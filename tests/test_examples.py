"""Every example imports cleanly — a syntax/API-drift guard for the
showcase code. The examples are demonstrations with minute-scale
runtimes (full equilibrations, continuations, calibrations), so their
``main()`` bodies are NOT executed here; each module does all its
imports (including the package) at module scope, which is what rots
when APIs move."""
import importlib.util
import pathlib

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent / ".." / "examples").resolve().glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports_and_has_main(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(getattr(mod, "main", None)), (
        f"{path.name} has no main() entry point")
