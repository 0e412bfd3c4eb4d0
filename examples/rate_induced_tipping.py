"""Rate-induced tipping: how much EARLIER does weather noise tip a ramp?

The reference's flagship workflow is the deterministic hysteresis scenario
(a 5-segment `Forcing` ramp, /root/reference/src/infrastructure.jl:208-307,
traced by `ebm.continuation`/`plot_bifurcation`). Its stochastic
completion is this question: when the forcing is RAMPED down through the
fold, the deterministic run tips the year the warm branch dies — but under
weather noise, members tip earlier, because the shrinking basin can no
longer hold the fluctuations (noise-advanced / rate-induced tipping).

`ebm.transitions` with a ramped `Forcing` runs two sigma-zero companion
trajectories under the identical ramp as evolving classification
references (the same idea as `ebm.fold`'s evolving classifier), so each
member's `first_passage` is directly comparable to the deterministic
tipping year read off the on-branch companion.

Run: python examples/rate_induced_tipping.py
"""
import os
import sys
import warnings

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False, outdir=None):
    # nt stays at 1000 even in fast mode (classic explicit-step stability)
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        {"E": np.full(st.nx, e), "Tg": np.full(st.nx, e) / cw})

    # attractors at the ramp's starting level F=10 (mid-window)
    F0 = 10.0
    warm = ebm.equilibrate("Classic", st, F0, par, mk(30.0),
                           max_years=120, tol=2.0)
    snow = ebm.equilibrate("Classic", st, F0, par, mk(-30.0),
                           max_years=120, tol=2.0)
    print(f"attractors at F={F0}: warm={warm.converged} "
          f"snowball={snow.converged}")

    # the down-ramp: hold 10 for 1 yr, nudge to 11, hold 1 yr, then cool
    # SLOWLY (-0.25 W/m^2/yr) to 2 — crossing the measured fold (~5,
    # CLAUDE.md's window) around year 27 and holding just below it, so
    # members linger for years in a shrinking basin: the regime where
    # noise advances the tip visibly. (A fast -1/yr ramp crosses the
    # window in a few years and the noise advance collapses to ~1 yr —
    # measured while building this example.)
    ramp = ebm.Forcing(10.0, 11.0, 2.0, (1, 1), (1.0, -0.25))
    years = 50
    K = 6 if fast else 16
    sigmas = (20.0,) if fast else (12.0, 16.0, 20.0)

    print(f"\n{K} members x {years} years down the ramp {ramp.domain} "
          f"(tau = 0.05 yr weather noise):")
    print(f"{'sigma':>6}  {'escaped':>8}  {'median tip (yr)':>16}  "
          f"{'earliest':>9}  {'advance vs det (yr)':>20}")
    results = {}
    det_tip = None
    for sig in sigmas:
        with warnings.catch_warnings():
            # the post-tip reference merge intentionally trips the
            # degeneracy warning — expected for every tipping ramp
            warnings.simplefilter("ignore")
            r = ebm.transitions("Classic", st, ramp, par, warm, snow,
                                sigma=sig, tau=0.05, years=years, K=K,
                                seed=0)
        results[sig] = r
        if det_tip is None:
            # deterministic tipping year: the sigma-zero on-branch
            # companion's largest year-to-year jump (warm -> snowball)
            det_tip = int(np.argmax(np.abs(np.diff(r.area_a)))) + 1
            print(f"deterministic companion tips at year {det_tip} "
                  f"(F ~ {ramp(det_tip + 0.5):.1f})")
        fp = r.first_passage[r.escaped]
        med = float(np.median(fp)) if fp.size else float("nan")
        early = float(np.min(fp)) if fp.size else float("nan")
        adv = det_tip - med if fp.size else float("nan")
        print(f"{sig:6.1f}  {int(np.count_nonzero(r.escaped)):>5}/{K}  "
              f"{med:16.1f}  {early:9.1f}  {adv:20.1f}")

    # sub-annual refinement (round 5b): rerun the strongest-noise case
    # with the in-kernel crossing detector — under a ramp the threshold
    # EVOLVES with the sigma-zero companions (lag-1 entering midpoint),
    # so each member's tip refines to the fractional year its
    # instantaneous ice area actually crossed, typically LEADING the
    # year-mean classifier during the slow plunge
    sig = max(sigmas)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r_sub = ebm.transitions("Classic", st, ramp, par, warm, snow,
                                sigma=sig, tau=0.05, years=years, K=K,
                                seed=0, dtype="float32", engine="fused",
                                subyear=True)
    esc = r_sub.escaped
    if esc.any():
        fps = r_sub.first_passage_subyear()
        lead = r_sub.first_passage[esc] - fps[esc]
        print(f"\nsub-annual refinement at sigma={sig:g}: "
              f"{int(esc.sum())} tips refined; instantaneous crossing "
              f"leads the year-mean classifier by "
              f"{np.nanmedian(lead):.2f} yr (median), "
              f"{np.nanmax(lead):.2f} yr (max)")

    r = results[max(sigmas)]
    fig = ebm.plot_transitions(r)
    out = os.path.join(outdir or os.path.dirname(__file__),
                       "rate_induced_tipping.png")
    ebm.unsafesave(fig, out)
    print(f"\ntrajectory fan vs evolving references -> {out}")

    # ramped results persist with their companion resume material
    path = os.path.join(outdir or os.path.dirname(__file__),
                        "_ramp_demo.h5")
    ebm.save(r, path)
    back = ebm.load(path)
    os.remove(path)
    print(f"save/load round-trip: {back!r}")
    assert back.ramped and back.ref_state is not None


if __name__ == "__main__":
    main()
