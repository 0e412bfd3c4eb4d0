"""Map basins of attraction, bisect the basin boundary with
`ebm.basins` / `ebm.edge`, and refine the EDGE STATE with
`EdgeResult.refine` / `ebm.edge_state`.

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


def main(outdir=None, fast=False):
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
          "boundary moves toward the snowball endpoint)")

    # 3. refine one member's crossing into the EDGE STATE — the
    # near-stationary object ON the boundary itself (edge tracking +
    # trust-region Gauss-Newton on the year map), with its year-map
    # spectrum: the transverse escape direction of the basin boundary
    saddle = res.refine("Classic", forcing=0.0, member=0,
                        stages=2 if fast else 6,
                        commit_years=200 if fast else 300,
                        commit_tol=0.5,
                        stability_kwargs=dict(dtype="float64"))
    print(f"\nedge state at F={F_vals[0]:.1f}: {saddle}")
    lam = float(np.asarray(saddle.stability.growth).reshape(-1)[0])
    print(f"  ice area {saddle.area:.3f} (between the attractors "
          f"{float(np.atleast_1d(res.area_a)[0]):.3f} and "
          f"{float(np.atleast_1d(res.area_b)[0]):.3f}), year-map "
          f"stationarity {saddle.resid:.3g}, leading |lambda| {lam:.3f}")
    print("  (on coarse classic grids the boundary attractor chatters "
          "around the albedo hole — see the edge_state docstring; "
          "ebm.save(saddle, 'edge_state.h5') archives it)")

    # 4. trace the UNSTABLE BRANCH: warm-started saddle continuation —
    # the middle segment of the hysteresis S-curve that forward
    # integration can never settle on (the expensive edge tracking above
    # was paid once; each further forcing level is just a warm-started
    # Gauss-Newton re-polish)
    br_vals = np.linspace(F_vals[0], F_vals[-1], 2 if fast else 4)
    branch = ebm.unstable_branch(
        "Classic", st, br_vals,
        ebm.Collection(ebm.default_parameters("Classic")),  # no F sweep
        saddle.state, vary="F", forcing=0.0,
        polish_max_nfev=60 if fast else 150)
    mid_areas = np.asarray(branch.ice_area()).reshape(-1)
    print(f"\nunstable (middle) branch — {branch!r}")
    print(f"{'F':>6}  {'saddle ice area':>16}  {'resid':>8}")
    for Fv, a, r in zip(br_vals, mid_areas,
                        [x.resid for x in branch.results]):
        print(f"{Fv:6.1f}  {a:16.3f}  {r:8.3g}")
    print("  (between the warm and snowball branches at every level; "
          "branch.stability() verifies |lambda|>1 saddleness, "
          "plot_continuation(branch) draws it)")

    # plot the unstable (escape) mode over the grid: the spatial pattern
    # along which trajectories leave the boundary
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 3.2))
    mode_E = np.asarray(saddle.stability.mode["E"]).reshape(-1)
    ax.plot(st.x, np.asarray(saddle.state["E"]) / 100.0,
            label="edge state E / 100")
    ax.plot(st.x, mode_E / max(np.abs(mode_E).max(), 1e-12),
            label="escape mode (normalized)")
    ax.axhline(0.0, color="0.8", lw=0.8)
    ax.set_xlabel("x = sin(latitude)")
    ax.set_title(f"classic edge state, F={F_vals[0]:.1f}")
    ax.legend()
    fig.tight_layout()
    out = os.path.join(outdir if outdir is not None
                       else os.path.dirname(__file__),
                       "basin_boundary.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    print(f"  escape-mode plot -> {out}")


if __name__ == "__main__":
    main()
