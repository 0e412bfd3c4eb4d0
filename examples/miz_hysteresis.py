"""The MIZ snowball S-curve: both stable branches and the basin boundary.

Round 4's hunt (scripts/miz_saddle_hunt.py, pinned in
tests/test_miz_bistability.py) established that the MIZ model at its
reference defaults is bistable over a wide forcing window (D=0.6:
F in [-16, +28] and beyond at nx=40 f64) once the forcing path actually
reaches the snowball. This example assembles the hysteresis diagram of
that window — something the reference workflow cannot draw at all:

1. `ebm.continuation(round_trip=True)` traces the two STABLE branches
   (the reference's analog is a pair of multi-decade ramp integrations,
   /root/reference/src/plot.jl:173-225, which jump ACROSS the middle);
2. `ebm.edge_state` pins the BASIN BOUNDARY between the coexisting
   attractors at several forcing levels: the boundary-crossing ice area
   and the transverse escape growth (|lambda| > 1).

The middle of the MIZ S-curve is measured here as the basin-boundary
crossing, NOT as a fixed-point saddle branch: unlike the classic model
(whose boundary saddle polishes to resid ~0.7 and continues with
`ebm.unstable_branch`, examples/fold_tracking.py), the MIZ snowball
boundary is razor-thin — measured at nx=16/f64, edge tracking pins the
crossing to machine precision in blend weight, but states there escape
within ~1-2 years and the Gauss-Newton polish floors at
||year(x)-x|| ~ 1e2 enthalpy units (the thin-ice channel's per-step
gain dTb/dEi ~ (Ti-Tw)/(Lf h) makes the transverse direction stiff far
beyond the classic albedo-hole wobble). The boundary object is real and
its escape rate measurable; a smooth stationary middle branch is not
numerically reachable there. (Measured escape growths along the window
span 3.6/yr to ~1e11/yr — the razor, quantitatively.)

Run: python examples/miz_hysteresis.py   (CPU f64, ~15 min full size)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False, outdir=None):
    # nx=16 in BOTH modes: at nx=12 the boundary bisection midpoint slides
    # onto the snowball attractor (measured: crossing area == cold area,
    # growth ~1.0) — the razor boundary needs at least the pinned-test grid
    st = ebm.SpaceTime.sin(16, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("MIZ"))  # default D=0.6
    kw = dict(tol=1e-3, max_years=250 if fast else 400)

    # 1. both stable branches: descend from warm through the freeze-over,
    # return up the snowball branch (which never thaws in this window)
    F_path = np.linspace(8.0, -20.0, 8 if fast else 15)
    cont = ebm.continuation("MIZ", st, F_path, par, ebm.zeros_init(st),
                            round_trip=True, **kw)
    area = np.asarray(cont.ice_area()).reshape(len(cont.values), -1)[:, 0]
    fwd = np.asarray(cont.direction) > 0
    print(cont)

    warm_leg = area[fwd]
    frozen = warm_leg > 5.0
    f_freeze = (float(cont.values[fwd][frozen.argmax()])
                if frozen.any() else float("nan"))
    print(f"warm branch freezes over at F ~ {f_freeze:g}; "
          f"snowball leg stays frozen back up to F={F_path[0]:g}")

    # 2. the basin boundary at several forcing levels across the window
    F_probe = (0.0,) if fast else (-8.0, 0.0, 8.0)
    bvals, bareas, bgrowth = [], [], []
    for F in F_probe:
        iw = int(np.flatnonzero(fwd & (cont.values == F))[0])
        ic = int(np.flatnonzero(~fwd & (cont.values == F))[0])
        edge = ebm.edge_state("MIZ", st, par, cont.results[iw].state,
                              cont.results[ic].state, forcing=float(F),
                              stages=3, tol=np.inf)
        g = float(np.max(np.atleast_1d(np.abs(
            np.asarray(edge.stability.growth)))))
        print(f"boundary at F={F:+.0f}: crossing area {edge.area:.3f} in "
              f"({min(area[iw], area[ic]):.3f}, "
              f"{max(area[iw], area[ic]):.3f}), escape growth {g:.3g}/yr, "
              f"stationarity floor {edge.resid:.3g}")
        lo = min(area[iw], area[ic])
        hi = max(area[iw], area[ic])
        assert lo + 0.1 < edge.area < hi - 0.1, (lo, edge.area, hi)
        bvals.append(float(F))
        bareas.append(float(edge.area))
        bgrowth.append(g)

    # 3. the S-curve: stable legs solid, boundary crossings as open stars
    fig = ebm.plot_continuation(cont)
    ax = fig.axes[0]
    ax.plot(bvals, bareas, "*", color="crimson", ms=12, mfc="none",
            label="basin boundary (unstable, non-stationary)")
    ax.legend()
    out = os.path.join(outdir or os.path.dirname(__file__),
                       "miz_hysteresis.png")
    ebm.unsafesave(fig, out)
    print(f"S-curve -> {out}")

    assert all(g > 1.0 for g in bgrowth), bgrowth
    return bvals, bareas, bgrowth


if __name__ == "__main__":
    main()
