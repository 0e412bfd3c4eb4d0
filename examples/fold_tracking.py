"""Track a fold (saddle-node) across a second parameter with `ebm.fold`.

Where does the classic model's warm branch end? `bistability_map.py` reads
the fold off a coarse continuation grid; `ebm.fold` BISECTS it, and the
ensemble axis makes the search lockstep: the virtual ``par["F"]`` key
gives each member its own constant forcing, so one ensemble `equilibrate`
probes every member's bracket midpoint at once — 12 bisection steps
resolve K fold locations to (hi-lo)/4096 with 12 ensemble equilibrations
total, instead of K independent scans. Each probe warm-starts from the
anchored warm state; the default classifier is nearest-neighbor in ice
area against two evolving references — the warm branch's (seeded by the
anchor, following the branch as it gains ice toward the fold) and the
snowball's (seeded by the `lo` probe) — so the branch's own drift is
never misread as a departure; only the O(1) attractor jump separates
the classes.

Run: python examples/fold_tracking.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False):
    # fast=True: CI-sized grid/members/steps (nt stays 1000 — classic
    # explicit-step stability)
    st = ebm.SpaceTime.sin(8 if fast else 24, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    D_vals = np.linspace(0.3, 0.9, 2 if fast else 4)
    par["D"] = D_vals

    E0 = np.full(st.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))

    res = ebm.fold(
        "Classic", st, par, init,
        lo=-10.0,   # below every fold: warm branch gone
        hi=20.0,    # comfortably warm: branch exists (the anchor)
        steps=5 if fast else 12, tol=0.5,
        max_years=150 if fast else 200, progress=True,
    )
    print(res)

    print(f"\n{'D':>6}  {'fold F* (warm branch ends)':>28}  {'bracket':>18}")
    for D, v, a, b in zip(D_vals, res.values, res.lo, res.hi):
        print(f"{D:6.2f}  {v:28.3f}  [{a:+.3f}, {b:+.3f}]")
    print("\nhigher diffusivity pushes the fold to higher forcing — the "
          "same trend bistability_map.py reads off its coarse grid, here "
          "to 3 decimals in 12 lockstep equilibrations "
          "(ebm.save(res, 'folds.h5') archives the result)")


if __name__ == "__main__":
    main()
