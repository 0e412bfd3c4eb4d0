"""Two-dimensional bistability map: the snowball hysteresis vs diffusivity.

One `ebm.continuation` call traces BOTH hysteresis legs of a whole ensemble
in lockstep: the forcing path is continued level by level (warm starts keep
each solve inside its attractor's basin) while a `(K,)` par leaf spreads a
second parameter across members. Comparing the two legs' ice area at equal
forcing maps the bistable region of the (D, F) plane in a single program —
the reference's equivalent study is K sequential multi-decade ramp
integrations read off by eye (plot_seasonal workflows,
/root/reference/src/plot.jl:173-225).

The classic model carries the textbook ice-albedo ("snowball") bistability:
descending from a warm state, the planet stays warm far below the forcing
at which an ice-covered planet would thaw, and once fully frozen the return
leg cannot escape within the window. (The MIZ model shares it once the
forcing path reaches the snowball at all: the round-2 claim that MIZ has
no window came from a box that stopped at F=-6, above the freeze-over.
The round-4 hunt — scripts/miz_saddle_hunt.py, pinned in
tests/test_miz_bistability.py — measures D=0.6 bistable over F in
[-16, +8] and beyond at nx=40 f64, with D <= 0.2 genuinely monostable.)

Run: python examples/bistability_map.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False):
    # classic model: nt >= 1000 (explicit-step stability) and a
    # Tg = E/cw-consistent warm init (CLAUDE.md invariants);
    # fast=True: CI-sized grid/path, same workflow
    st = ebm.SpaceTime.sin(8 if fast else 24, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    D_vals = np.linspace(0.3, 0.9, 2 if fast else 4)
    par["D"] = D_vals  # (K,) leaf -> lockstep ensemble continuation

    E0 = np.full(st.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))

    # descend from warm into the snowball, then return: start warm so the
    # forward leg rides the warm branch to its fold
    F_path = np.linspace(20.0, -10.0, 5 if fast else 13)
    cont = ebm.continuation("Classic", st, F_path, par, init,
                            round_trip=True, tol=0.5,
                            max_years=150 if fast else 300)
    print(cont)

    gap_tol = 0.5                    # ice-area split that counts as bistable
    gvals, gap = cont.hysteresis_gap()   # (L',), (L', K): leg-vs-leg split

    print("\nbistable cells of the (D, F) plane "
          f"(|descending - returning| ice area > {gap_tol}):")
    print("  D \\ F " + "".join(f"{F:+6.1f}" for F in gvals))
    for k, D in enumerate(D_vals):
        row = ["     B" if g > gap_tol else "     ." for g in gap[:, k]]
        print(f"  {D:5.2f} " + "".join(row))
    print("\nB = bistable (warm branch and snowball coexist), "
          ". = single attractor")

    area = cont.ice_area()           # (L, K) — for the fold table below
    fwd = cont.direction > 0

    # warm-branch fold per member: the last F (descending) still warm
    print(f"\n{'D':>6}  {'warm branch survives to':>24}")
    for k, D in enumerate(D_vals):
        warm = [F for F in F_path
                if area[fwd & (cont.values == F), k][0] < 3.0]
        fold = f"F = {min(warm):+.1f}" if warm else "nowhere (all frozen)"
        print(f"{D:6.2f}  {fold:>24}")


if __name__ == "__main__":
    main()
