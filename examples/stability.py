"""Linear stability of seasonal cycles: year-map spectral radii.

The reference probes stability by forward integration and eyeballing
trajectories. Here the year map is differentiable, so `ebm.stability`
power-iterates its (transpose) Jacobian at a state — one reverse pass per
iteration, the whole loop a `lax.scan` on device — and returns the
dominant |lambda|:

* `< 1`: attracting, with per-year contraction rate |lambda|;
* `~ 1`: non-hyperbolic — healthy MIZ equilibria sit here exactly
  (frozen `Ew`/`phi` integrator coordinates in fully ice-covered cells;
  `project=("Ew", "phi")` peels them to expose the observable rate);
* `> 1`: non-attracting — the knife-edge configurations that stall
  `equilibrate`, or outright numerical instability.

Run: python examples/stability.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False):
    # fast=True: CI-sized — fewer members/iterations, shorter solves;
    # every section still runs
    n_it = 15 if fast else 40
    # -- MIZ ensemble: one lockstep estimate per OLR level ---------------
    st = ebm.SpaceTime.sin(12 if fast else 24, 200, 1)
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    par["A"] = np.array([193.0, 199.0] if fast else [193.0, 196.0, 199.0])
    eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), par,
                         ebm.zeros_init(st), tol=1e-4 if fast else 1e-5,
                         max_years=200 if fast else 500)
    print(eq)

    raw = ebm.stability("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                        n_iter=n_it)
    proj = ebm.stability("MIZ", st, ebm.Forcing(0.0), par, eq.state,
                         n_iter=n_it, project=("Ew", "phi"))
    print(f"{'A':>6}  {'|lambda|':>10}  {'projected':>10}")
    for a, g, gp in zip(np.asarray(par["A"]), np.atleast_1d(raw.growth),
                        np.atleast_1d(proj.growth)):
        print(f"{a:6.1f}  {g:10.6f}  {gp:10.6f}")

    # where does the slow mode live? (inspect the adjoint mode's mass)
    full_ice = np.asarray(eq.state["phi"])[0] >= 0.99
    m = np.asarray(raw.mode["Ew"])[0]
    frac = float((m[full_ice] ** 2).sum() / max((m**2).sum(), 1e-300))
    print(f"member 0 raw mode: {frac:.0%} of its Ew mass in fully "
          f"ice-covered cells (the frozen integrator family)")

    # -- classic: attracting equilibrium vs the step-instability regime --
    stc = ebm.SpaceTime.sin(12 if fast else 24, 1000, 1)
    base = ebm.default_parameters("Classic")
    E0 = np.full(stc.nx, 40.0)
    init = ebm.Collection(E=E0, Tg=E0 / float(base["cw"]))
    eqc = ebm.equilibrate("Classic", stc, ebm.Forcing(6.0), base, init,
                          tol=0.5, max_years=150 if fast else 300)
    resc = ebm.stability("Classic", stc, ebm.Forcing(6.0), base, eqc.state,
                         n_iter=n_it)
    print(f"classic warm equilibrium: {resc}")

    st_bad = ebm.SpaceTime.sin(stc.nx, 400, 1)  # dt*M/cw > 1: unstable stepping
    res_bad = ebm.stability("Classic", st_bad, ebm.Forcing(0.0), base, init,
                            n_iter=10)
    print(f"classic at nt=400 (dt*M/cw > 1): {res_bad}")

    # -- the leading spectrum at once: block (subspace) iteration ---------
    n_modes = 2 if fast else 4
    blk = ebm.stability("Classic", stc, ebm.Forcing(6.0), base, eqc.state,
                        n_iter=30 if fast else 80, n_modes=n_modes)
    print(f"classic leading modes: {np.round(blk.growth, 4)} "
          f"(per-year contraction of the {n_modes} slowest directions)")
    # .eigenvalues carries the SIGN/phase the QR moduli discard:
    # positive real = monotone (fold-type), negative real = year-over-year
    # flip, a complex pair = oscillatory (Neimark-Sacker-type) mode
    for lam in blk.eigenvalues:
        kind = ("oscillatory" if abs(lam.imag) > 1e-8 * abs(lam)
                else "monotone" if lam.real >= 0 else "flipping")
        print(f"  lambda = {lam:.6g}  ({kind})")

    # the PHYSICAL shape of the slowest mode: side="right" iterates J
    # itself (linear_transpose of the pullback), so the mode is the
    # spatial pattern a deviation actually takes as it decays
    right = ebm.stability("Classic", stc, ebm.Forcing(6.0), base,
                          eqc.state, n_iter=n_it, side="right")
    E = np.asarray(right.mode["E"])
    print(f"right (physical) mode: |E|-component peaks at grid cell "
          f"{int(np.argmax(np.abs(E)))} of {stc.nx} "
          f"(x = {stc.x[int(np.argmax(np.abs(E)))]:.2f})")

    # -- stability along a continuation path ------------------------------
    # one call classifies every level of a bifurcation branch, each
    # warm-started from the previous level's eigenvector
    cont = ebm.continuation("MIZ", st,
                            [0.0, 2.0] if fast else [-2.0, 0.0, 2.0, 4.0],
                            ebm.default_parameters("MIZ"),
                            ebm.zeros_init(st), tol=1e-4,
                            max_years=150 if fast else 400)
    path = cont.stability(n_iter=10 if fast else 30, project=("Ew", "phi"))
    print(f"\n{'F':>6}  {'|lambda| (projected)':>20}")
    for F, r in zip(cont.values, path):
        print(f"{F:+6.1f}  {r.growth:20.6f}")
    print("growth rising toward 1 along a branch signals an approaching "
          "fold; ebm.plot_continuation(cont, stability=path) marks any "
          "non-attracting level on the hysteresis diagram")


if __name__ == "__main__":
    main()
