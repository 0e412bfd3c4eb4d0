"""Track a fold (saddle-node) across a second parameter by lockstep bisection.

Where does the classic model's warm branch end? `bistability_map.py` reads
the fold off a coarse continuation grid; here every ensemble member bisects
its OWN fold location simultaneously: the virtual ``par["F"]`` key gives
each member its own constant forcing, so one lockstep `ebm.equilibrate`
call probes K different bracket midpoints at once — 12 bisection steps
resolve K fold locations to (hi-lo)/4096 with 12 ensemble equilibrations
total, instead of K independent scans. The survival test warm-starts from
the known warm state: if the solve stays near it the branch still exists
at that forcing; if it falls to the snowball the bracket tightens from
above.

Run: python examples/fold_tracking.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402
from energybalancemodel_jl_tpu.utils.numerics import (  # noqa: E402
    np_hemispheric_mean,
)


def ice_area(seasonal, st):
    field = (np.asarray(seasonal.avg["E"]) < 0.0).astype(np.float64)
    rows = [2.0 * np.pi * np_hemispheric_mean(f, st.x) for f in field]
    return np.asarray(rows)


def main():
    st = ebm.SpaceTime.sin(24, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    D_vals = np.linspace(0.3, 0.9, 4)
    par["D"] = D_vals
    K = len(D_vals)

    E0 = np.full(st.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))

    # anchor: the warm equilibrium at a comfortably warm forcing
    F_hi = 20.0
    par_hi = ebm.Collection(par)
    par_hi["F"] = np.full(K, F_hi)
    warm = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), par_hi, init,
                           tol=0.5, max_years=200)
    assert np.asarray(warm.converged).all()
    warm_state = warm.state

    lo = np.full(K, -10.0)  # below every fold: warm branch gone
    hi = np.full(K, F_hi)   # warm branch exists
    for step in range(12):
        mid = 0.5 * (lo + hi)
        p = ebm.Collection(par)
        p["F"] = mid            # each member probes ITS bracket midpoint
        res = ebm.equilibrate("Classic", st, ebm.Forcing(0.0), p,
                              warm_state, tol=0.5, max_years=150)
        survived = ice_area(res.seasonal, st) < 3.0
        hi = np.where(survived, mid, hi)
        lo = np.where(survived, lo, mid)
        width = float(np.max(hi - lo))
        print(f"step {step + 1:2d}: brackets "
              + " ".join(f"[{a:+.3f},{b:+.3f}]" for a, b in zip(lo, hi))
              + f"  (max width {width:.3f})", flush=True)

    print(f"\n{'D':>6}  {'fold F* (warm branch ends)':>28}")
    for D, a, b in zip(D_vals, lo, hi):
        print(f"{D:6.2f}  {0.5 * (a + b):28.3f}")
    print("\nhigher diffusivity pushes the fold to higher forcing — the "
          "same trend bistability_map.py reads off its coarse grid, here "
          "to 3 decimals in 12 lockstep equilibrations")


if __name__ == "__main__":
    main()
