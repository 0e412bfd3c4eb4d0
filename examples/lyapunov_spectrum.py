"""Finite-time Lyapunov exponents: predictability along trajectories.

`ebm.stability` answers "is this state attracting?" by linearizing the
year map AT one state. `ebm.lyapunov` answers the trajectory question —
how fast do nearby states separate ALONG a run — by the Benettin/QR
recipe with exact Jacobian-vector products (the Newton solve's pullback,
transposed). Three readings:

* at a converged equilibrium the exponents equal `log |lambda_i|` of
  the stability spectrum (the two tools cross-validate);
* along a transient they are finite-time growth rates: the e-folding
  time of forecast error, and the rate at which unrolled-trajectory
  gradients explode (`calibrate`'s documented long-horizon limit);
* a leading exponent pinned at 0 on MIZ is the frozen-cell neutral
  family — `project=("Ew", "phi")` peels it (the mask follows the
  trajectory's moving ice cover).

Run: python examples/lyapunov_spectrum.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False):
    yrs = 20 if fast else 60
    trans = 8 if fast else 30

    # -- cross-validation at an equilibrium (ice-free classic: linear) ---
    st = ebm.SpaceTime.sin(8 if fast else 16, 500 if fast else 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    E0 = np.full(st.nx, 100.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(par["cw"]))
    eq = ebm.equilibrate("Classic", st, ebm.Forcing(45.0), par, init,
                         tol=1e-8, max_years=300)
    stab = ebm.stability("Classic", st, ebm.Forcing(45.0), par, eq.state,
                         n_iter=yrs)
    lya = ebm.lyapunov("Classic", st, ebm.Forcing(45.0), par, eq.state,
                       years=yrs, transient=trans)
    print(f"ice-free classic equilibrium: lambda_1 = "
          f"{float(lya.exponents[0]):+.6f}/yr,  log|lambda|_stability = "
          f"{float(np.log(stab.growth)):+.6f}/yr  (must agree)")

    # -- the spectrum: how many directions matter? ------------------------
    m = 2 if fast else 4
    spec = ebm.lyapunov("Classic", st, ebm.Forcing(45.0), par, eq.state,
                        years=yrs, transient=trans, n_modes=m)
    print(f"leading {m} exponents (1/yr): "
          f"{np.round(np.asarray(spec.exponents), 4)}")
    print(f"  e-folding memory of the slowest mode: "
          f"{-1.0 / float(spec.exponents[0]):.1f} years")

    # -- MIZ: neutral families vs observable contraction ------------------
    stm = ebm.SpaceTime.sin(12 if fast else 16, 150, 1)
    parm = ebm.default_parameters("MIZ")
    eqm = ebm.equilibrate("MIZ", stm, ebm.Forcing(0.0), parm,
                          ebm.zeros_init(stm), tol=1e-5,
                          max_years=150 if fast else 400)
    raw = ebm.lyapunov("MIZ", stm, ebm.Forcing(0.0), parm, eqm.state,
                       years=yrs, transient=trans)
    proj = ebm.lyapunov("MIZ", stm, ebm.Forcing(0.0), parm, eqm.state,
                        years=yrs, transient=trans,
                        project=("Ew", "phi"))
    print(f"MIZ attractor: raw lambda_1 = {float(raw.exponents[0]):+.4f} "
          f"(frozen-cell neutral family), projected = "
          f"{float(proj.exponents[0]):+.4f}/yr (the observable dynamics; "
          "near-neutral at this config, as stability's projected growth "
          "also reads)")

    # -- finite-time growth along a TRANSIENT: ensemble over forcings -----
    # start every member well off the attractor and watch the running
    # estimates relax; per-member F offsets ride the virtual "F" leaf
    K = 2 if fast else 4
    parK = ebm.Collection(parm)
    parK["F"] = np.linspace(0.0, 3.0, K)
    tra = ebm.lyapunov("MIZ", stm, ebm.Forcing(0.0), parK,
                       ebm.zeros_init(stm), years=yrs, transient=0)
    run = tra.running()  # (years, K, 1)
    print(f"\ntransient FTLE from zeros_init, {K} forcing levels:")
    print(f"{'F':>6}  {'year-1 growth':>14}  {'final estimate':>15}")
    for i, F in enumerate(np.asarray(parK['F'])):
        print(f"{F:6.2f}  {float(tra.history[0, i, 0]):14.4f}  "
              f"{float(run[-1, i, 0]):15.4f}")
    print("(negative and shrinking: forecast differences decay — the "
          "attractor is predictable; compare calibrate's long-horizon "
          "gradient explosion, which lives where these turn positive)")

    # results persist like everything else
    path = os.path.join(os.path.dirname(__file__), "_lyapunov_demo.h5")
    ebm.save(proj, path)
    back = ebm.load(path)
    os.remove(path)
    print(f"\nsave/load round-trip: {back!r}")


if __name__ == "__main__":
    main()
