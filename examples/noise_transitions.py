"""Noise-induced transitions: how robust is an attractor to weather noise?

The deterministic toolkit locates coexisting attractors (`ebm.basins`),
the boundary between them (`ebm.edge`), and the saddle on it
(`ebm.edge_state`). `ebm.transitions` asks the stochastic question those
set up: under Ornstein-Uhlenbeck "weather noise" in the radiative
forcing, how often do trajectories actually cross? One lockstep ensemble
per noise level measures the escape fraction, first-passage times, and
the censoring-aware escape rate (escapes per member-year).

The classic model near its lower fold (F ~ 5, CLAUDE.md's measured
bistable window [5, 15]) is the textbook case: the warm basin is shallow,
so modest noise tips members into the snowball — and the escape rate
falls off sharply as the noise weakens (the Kramers picture).

Run: python examples/noise_transitions.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402


def main(fast=False, outdir=None):
    # nt stays at 1000 even in fast mode: the classic explicit step is
    # numerically unstable below nt ~ 1000 (dt*M/cw > 1)
    st = ebm.SpaceTime.sin(8, 1000, 1)
    par = ebm.Collection(ebm.default_parameters("Classic"))
    cw = float(par["cw"])
    mk = lambda e: ebm.Collection(
        {"E": np.full(st.nx, e), "Tg": np.full(st.nx, e) / cw})
    F = 5.5

    # the two attractors the noise moves between
    warm = ebm.equilibrate("Classic", st, F, par, mk(30.0),
                           max_years=120, tol=2.0)
    snow = ebm.equilibrate("Classic", st, F, par, mk(-30.0),
                           max_years=120, tol=2.0)
    print(f"attractors at F={F}: converged "
          f"warm={warm.converged} snowball={snow.converged}")

    # -- escape statistics vs noise amplitude -----------------------------
    K = 8 if fast else 32
    years = 12 if fast else 30
    sigmas = (12.0, 18.0, 24.0) if not fast else (30.0,)
    print(f"\n{K} members x {years} years from the warm attractor "
          f"(tau = 0.05 yr weather noise):")
    print(f"{'sigma':>6}  {'escaped':>8}  {'rate (1/member-yr)':>19}  "
          f"{'mean residence (yr)':>20}")
    results = {}
    for sig in sigmas:
        r = ebm.transitions("Classic", st, F, par, warm, snow, sigma=sig,
                            tau=0.05, years=years, K=K, seed=0,
                            track=("E",))
        results[sig] = r
        rate = r.escape_rate()
        res_time = (1.0 / rate) if rate > 0 else float("inf")
        print(f"{sig:6.1f}  {int(np.count_nonzero(r.escaped)):>5}/{K}  "
              f"{rate:19.4f}  {res_time:20.1f}")

    r = results[max(sigmas)]
    fp = r.first_passage[r.escaped]
    if fp.size:
        print(f"\nfirst-passage years at sigma={max(sigmas)}: "
              f"{np.sort(fp).astype(int)[:12]}")

    # -- sub-annual crossing detection (round 5) --------------------------
    # subyear=True makes the fused kernel reduce every STEP's
    # instantaneous ice area and record the first crossing of the
    # midpoint between the two reference areas — the instantaneous
    # detector typically LEADS the year-mean classifier by years during
    # a slow snowball plunge
    r_sub = ebm.transitions("Classic", st, F, par, warm, snow,
                            sigma=max(sigmas), tau=0.05, years=years,
                            K=K, seed=0, dtype="float32",
                            engine="fused", subyear=True)
    esc = r_sub.escaped
    if esc.any():
        fps = r_sub.first_passage_subyear()
        print("\nsub-annual refinement (year-mean classifier vs "
              "instantaneous midpoint crossing):")
        for k in np.nonzero(esc)[0][:6]:
            print(f"  member {k:2d}: year-classified {int(r_sub.first_passage[k]):3d}"
                  f"  -> crossed at {fps[k]:8.3f} yr "
                  f"(lead {r_sub.first_passage[k] - fps[k]:.2f} yr)")

    # the trajectory fan (escaped members in color, first passage marked)
    fig = ebm.plot_transitions(r)
    out = os.path.join(outdir or os.path.dirname(__file__),
                       "noise_transitions.png")
    ebm.unsafesave(fig, out)
    print(f"trajectory fan -> {out}")

    # results persist like everything else
    path = os.path.join(outdir or os.path.dirname(__file__),
                        "_transitions_demo.h5")
    ebm.save(r, path)
    back = ebm.load(path)
    os.remove(path)
    print(f"save/load round-trip: {back!r}")


if __name__ == "__main__":
    main()
