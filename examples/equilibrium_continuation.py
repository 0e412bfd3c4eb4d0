"""Hysteresis branches by numerical continuation of equilibria.

The reference maps hysteresis by integrating a multi-decade forcing ramp
and reading states off the trajectory (plot_seasonal workflows,
/root/reference/src/plot.jl:173-225). With `ebm.equilibrate` each branch is
traced directly: equilibrate at a forcing level, then WARM-START the next
level from the converged state — the warm/cold branch is followed (and
its fold located) without simulating the ramp at all. Each equilibration
runs on device (`lax.while_loop` over the year map, dispatched in
watchdog-safe chunks; on TPU the year map is the fused Pallas kernel).

Run: python examples/equilibrium_continuation.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def ice_area(res, st):
    """Annual-mean ice-covered area ``2 pi <phi>`` (phi = per-cell ice
    concentration; same diagnostic as ``plot_bifurcation``)."""
    from energybalancemodel_jl_tpu.utils.numerics import np_hemispheric_mean

    phi = np.nan_to_num(np.asarray(res.seasonal.avg["phi"]))
    return 2.0 * np.pi * np_hemispheric_mean(phi, st.x)


# tol 1e-2: in float32 (the TPU default) the adaptive Newton solve leaves
# O(1e-3) year-over-year noise in the annual means — a tighter tol chases
# solver noise, not physics (use float64 for tighter equilibria)
def trace_branch(F_values, st, par, init, tol=1e-2, max_years=400):
    """Equilibrate along F_values, warm-starting each level from the last."""
    state, rows = init, []
    for F in F_values:
        res = ebm.equilibrate("MIZ", st, ebm.Forcing(float(F)), par, state,
                              tol=tol, max_years=max_years)
        rows.append((float(F), ice_area(res, st), res.years, res.converged))
        state = res.state  # continuation: next level starts converged-close
    return rows


def main():
    st = ebm.SpaceTime.sin(60, 500, 1)
    par = ebm.default_parameters("MIZ")

    F_up = np.linspace(-4.0, 6.0, 11)
    print("cold -> warm branch (from zero init):")
    for F, area, years, ok in trace_branch(F_up, st, par, ebm.zeros_init(st)):
        print(f"  F={F:+.1f}  ice area={area:.3f}  ({years} yrs"
              f"{'' if ok else ', NOT converged'})")

    print("warm -> cold branch (warm-started from the F=+6 state):")
    warm = ebm.equilibrate("MIZ", st, ebm.Forcing(6.0), par,
                           ebm.zeros_init(st), tol=1e-2, max_years=400)
    for F, area, years, ok in trace_branch(F_up[::-1], st, par, warm.state):
        print(f"  F={F:+.1f}  ice area={area:.3f}  ({years} yrs"
              f"{'' if ok else ', NOT converged'})")
    print("Where the two branches disagree at the same F, the model is "
          "bistable — the hysteresis window.")


if __name__ == "__main__":
    main()
