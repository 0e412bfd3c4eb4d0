"""Regenerate the 1-year MIZ golden fixture.

The reference's fixture ``test/solution_1year.jld2`` is git-LFS-missing in
the mount (/root/reference/.MISSING_LARGE_BLOBS); its generation recipe is
the commented block in /root/reference/test/runtests.jl:3-18 — the canonical
config ``SpaceTime{sin}(180, 2000, 1)``, ``Forcing(0.0)``,
``default_parameters(:MIZ)``, all-zero initial conditions. This script runs
that config in float64 on CPU and stores a compact fixture:

- raw state at step indices 1, 10, 100, 1000, 2000 (1-based) of all 10
  variables — the reference CI compares step 10;
- full-year per-variable checksums (sum, sumsq with NaNs zeroed) so the
  regression can bound full-trajectory RMSE without a 29 MB file;
- the seasonal winter/summer/avg storage.

Usage: python scripts/generate_fixture.py [out.h5]

Regenerate whenever compute-path code changes: beyond ~step 82 the
trajectory amplifies even fusion-level (FMA contraction) rounding
differences, so the fixture is tied to the exact compiled graph.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import h5py  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402

STEPS_1BASED = [1, 10, 100, 1000, 2000]


def main(out_path):
    st = ebm.SpaceTime.sin(180, 2000, 1)
    par = ebm.default_parameters("MIZ")
    sols = ebm.integrate(
        "MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st), progress=False
    )
    with h5py.File(out_path, "w") as f:
        f.attrs["config"] = "SpaceTime{sin}(180, 2000, 1), Forcing(0.0), MIZ defaults, zero init"
        f.attrs["steps_1based"] = STEPS_1BASED
        for k, v in sols.raw.items():
            g = f.create_group(k)
            for s in STEPS_1BASED:
                g.create_dataset(f"step{s}", data=v[s - 1])
            z = np.where(np.isnan(v), 0.0, v)
            g.attrs["sum"] = z.sum()
            g.attrs["sumsq"] = (z**2).sum()
            g.attrs["nan_count"] = int(np.isnan(v).sum())
        for season in ("winter", "summer", "avg"):
            g = f.create_group(f"seasonal_{season}")
            for k, v in getattr(sols.seasonal, season).items():
                g.create_dataset(k, data=v)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "solution_1year.h5"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    main(out)
