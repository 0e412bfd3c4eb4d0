"""Map basins of attraction and bisect the basin boundary with
`ebm.basins` / `ebm.edge`.

In the classic model's bistable forcing window the warm climate and the
snowball COEXIST — which one the system reaches depends only on where it
starts. `ebm.basins` equilibrates a whole family of initial states in
one lockstep ensemble and clusters the outcomes into attractors;
`ebm.edge` then bisects the basin boundary along the warm->snowball line
in state space, per ensemble member: the virtual ``par["F"]`` key gives
each member its own constant forcing, so one ensemble `equilibrate`
probes every member's blend weight at once — the boundary's location as
a function of forcing costs ``steps`` ensemble solves total. The
returned ``.states()`` are initial conditions numerically ON the
boundary — where trajectories linger on the edge-state saddle before
committing to either attractor.

Run: python examples/basin_boundary.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False):
    # fast=True: CI-sized (nx=8 keeps the classic bistable window at
    # F in ~[5, 15] — CLAUDE.md measured; nt stays 1000 for step stability)
    st = ebm.SpaceTime.sin(8 if fast else 24, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])

    def state(E0):
        E = np.full(st.nx, float(E0))
        return ebm.Collection(E=E, Tg=E / cw)

    warm, cold = state(40.0), state(-300.0)

    # 1. which attractor does each of the blended starts reach at F=10?
    w = np.linspace(0.0, 1.0, 4 if fast else 8)
    mapped = ebm.basins("Classic", st, par,
                        ebm.blend_states(warm, cold, w),
                        forcing=10.0, tol=0.5,
                        max_years=200 if fast else 300)
    print(mapped)
    for wi, lab, area in zip(w, mapped.labels, mapped.areas):
        # labels are centroid-ordered indices, not identities: name each
        # attractor by its mean ice area (warm = less than a hemisphere)
        if lab < 0:
            name = "unconverged"
        else:
            name = "warm" if mapped.centroids[lab] < np.pi else "snowball"
        print(f"  w={wi:4.2f}  ice area {area:5.2f}  -> {name}")

    # 2. bisect the boundary per forcing level, in lockstep
    # the classic bistable window at nx=24 defaults: the warm branch
    # exists from F ~ 6 (below it the warm endpoint falls to the
    # snowball and edge rejects the pair as same-basin)
    F_vals = np.linspace(6.0, 15.0, 2 if fast else 4)
    par["F"] = F_vals
    res = ebm.edge("Classic", st, par, warm, cold, forcing=0.0,
                   steps=4 if fast else 10, tol=0.5,
                   max_years=200 if fast else 300, progress=True)
    print(res)

    print(f"\n{'F':>6}  {'boundary w* (warm side ends)':>30}  {'bracket':>20}")
    for F, v, a, b in zip(F_vals, res.values, res.wa, res.wb):
        print(f"{F:6.1f}  {v:30.4f}  [{a:.4f}, {b:.4f}]")
    print("\nstronger forcing grows the warm basin along this line (the "
          "boundary moves toward the snowball endpoint); "
          "res.states() hands back the near-boundary blends for "
          "edge-state studies (ebm.save(res, 'edge.h5') archives "
          "everything)")


if __name__ == "__main__":
    main()
