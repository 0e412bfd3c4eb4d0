"""Classic (WE15) multi-century spin-up to the equilibrium seasonal cycle.

One of BASELINE.json's benchmark configurations: spin the classic EBM up
until the seasonal cycle repeats, then report the equilibrium ice-edge
latitude (the WE15 headline diagnostic).

    python examples/classic_spinup.py [outdir]
"""
import os
import sys

import matplotlib

matplotlib.use("Agg")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def ice_edge(E, x):
    """Sine-latitude of the equatorward-most ice-covered cell."""
    icy = np.where(E < 0.0)[0]
    return float(x[icy[0]]) if len(icy) else 1.0


def main(outdir=".", fast=False):
    # fast=True: CI-sized — 5 years on a 40-cell grid (nt stays 1000 for
    # explicit-step stability); the spin-up diagnostic still prints
    dur = 5 if fast else int(os.environ.get("EBM_EXAMPLE_YEARS", "100"))
    st = ebm.SpaceTime.identity(40 if fast else 100, 1000, dur)
    par = ebm.default_parameters("Classic")
    E0 = np.full(st.nx, 30.0)
    init = ebm.Collection(E=E0, Tg=E0 / par.cw)
    sols = ebm.integrate("Classic", st, ebm.Forcing(0.0), par, init)

    drift = np.abs(sols.seasonal.avg.T[-1] - sols.seasonal.avg.T[-2]).max()
    edge_w = ice_edge(sols.seasonal.winter.E[-1], st.x)
    edge_s = ice_edge(sols.seasonal.summer.E[-1], st.x)
    print(f"year-to-year drift of annual-mean T: {drift:.2e} K")
    print(f"equilibrium ice edge (sine latitude): winter {edge_w:.3f}, summer {edge_s:.3f}")
    ebm.save(ebm.plot_raw(sols), os.path.join(outdir, "classic_raw.png"), dpi=120)
    ebm.save(ebm.plot_avg(sols), os.path.join(outdir, "classic_avg.png"), dpi=120)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
