"""Which knob moves the ice edge? One reverse pass ranks every parameter.

The reference answers this by hand-rerunning sweeps per parameter;
`ebm.sensitivity` differentiates an equilibrium diagnostic with respect
to ALL ~22 parameters at once through the year-map fixed point (the
implicit-function-theorem adjoint — no unrolling, so the chaotic-horizon
gradient explosion never enters).

Run: python examples/sensitivity.py
"""
import os
import sys

import jax

jax.config.update("jax_enable_x64", True)  # the adjoint wants f64

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(outdir=None, fast=False):
    # the grid stays nx=16/nt=150 even in fast mode: coarser zeros-init
    # configs are gradient-DEAD (fully frozen equilibria — CLAUDE.md);
    # fast=True trims the solve horizon and skips the FD cross-check
    st = ebm.SpaceTime.sin(16, 150, 1)
    par = ebm.Collection(ebm.default_parameters("MIZ"))
    init = ebm.zeros_init(st)
    tol, max_years = (1e-8, 300) if fast else (1e-10, 600)

    res = ebm.sensitivity("MIZ", st, ebm.Forcing(0.0), par, init,
                          tol=tol, max_years=max_years)
    print(res)
    print(f"\nice area at equilibrium: {res.value:.4f}  (2 pi <phi>)")
    print(f"{'param':>6}  {'dg/dp':>12}  {'p * dg/dp':>12}")
    for name, g, e in res.top(10):
        print(f"{name:>6}  {g:+12.4e}  {e:+12.4e}")
    print("\n(elasticities compare FRACTIONAL changes — offset-scaled "
          "parameters like Tm in Kelvin dominate trivially; read their "
          "raw gradient instead)")

    if not fast:
        # cross-check one entry against a brute-force finite difference
        from energybalancemodel_jl_tpu.fold import seasonal_ice_area

        def area_at(D):
            p = ebm.Collection(par)
            p["D"] = D
            eq = ebm.equilibrate("MIZ", st, ebm.Forcing(0.0), p, init,
                                 tol=1e-10, max_years=600)
            return float(seasonal_ice_area(eq.seasonal.avg, st))

        D0, eps = float(par["D"]), 1e-6
        fd = (area_at(D0 + eps) - area_at(D0 - eps)) / (2 * eps)
        print(f"\nFD cross-check on D: adjoint {res.grads['D']:+.5e} vs "
              f"finite difference {fd:+.5e} "
              f"(rel {abs(res.grads['D'] - fd) / abs(fd):.1e}) — the adjoint "
              f"costs ONE reverse pass for all parameters; the FD costs two "
              f"full equilibrations PER parameter")

    # a different diagnostic: what warms the mean state?
    mean_E = ebm.sensitivity("MIZ", st, ebm.Forcing(0.0), par, init,
                             of="mean", var="E", tol=tol,
                             max_years=max_years)
    print(f"\nmean-enthalpy sensitivities: dg/dF = "
          f"{mean_E.grads['F']:+.3e} (>0: forcing warms), dg/dA = "
          f"{mean_E.grads['A']:+.3e} (<0: stronger OLR cools)")

    # tornado chart of the ranking (raw=True to sidestep the Tm
    # offset-scale caveat)
    fig = ebm.plot_sensitivity(res, n=8, raw=True)
    out = os.path.join(outdir if outdir is not None
                       else os.path.dirname(__file__), "sensitivity.png")
    fig.savefig(out, dpi=120)
    print(f"\ntornado chart -> {out}")


if __name__ == "__main__":
    main()
