"""Independent NumPy/SciPy re-implementation of the reference semantics.

This is the test oracle: a direct, eager, *non-JAX* transcription of the
physics of ``waylonwh/EnergyBalanceModel.jl`` (equations WE15 and the MIZ
extension), written from the reference equations with all its documented
quirks (SURVEY.md §2). It shares **no code** with the framework package; the
MIZ surface-temperature equation is solved with SciPy's MINPACK ``hybr``
root finder (an entirely different algorithm from the framework's Newton), so
agreement between the two implementations over thousands of steps validates
both the numerics and the jit/scan machinery.

Reference call stacks transcribed: classic step /root/reference/src/classic.jl:37-71,
MIZ step /root/reference/src/miz.jl:150-196, diffusion
/root/reference/src/infrastructure.jl:477-533, storage :536-591.
"""
from __future__ import annotations

import numpy as np
import scipy.optimize
import scipy.linalg


# ---------------------------------------------------------------- grids ----

def make_grid(nx, grid="sin"):
    if grid == "sin":
        urange = (0.0, np.pi / 2.0)
    else:
        urange = (0.0, 1.0)
    dx = (urange[1] - urange[0]) / nx
    u = urange[0] + (np.arange(nx) + 0.5) * dx
    return np.sin(u) if grid == "sin" else u


def diffusion_matrix(nx, grid, x=None):
    """Dense tridiagonal D∇² operator (without the D factor).

    Uniform grid: get_diffop (/root/reference/src/infrastructure.jl:480-491).
    General grid: flux-form stencil with reflective ghosts (:505-527).
    """
    L = np.zeros((nx, nx))
    if grid == "identity":
        dx = 1.0 / nx
        xb = np.arange(1, nx) * dx
        lam = (1.0 - xb**2) / dx**2
        for j in range(nx):
            lm = lam[j - 1] if j > 0 else 0.0
            lp = lam[j] if j < nx - 1 else 0.0
            if j > 0:
                L[j, j - 1] = lm
            if j < nx - 1:
                L[j, j + 1] = lp
            L[j, j] = -(lm + lp)
        return L
    xg = np.concatenate(([-x[0]], x, [2.0 - x[-1]]))
    diffx = np.diff(xg)
    xxph = (xg[2:] + xg[1:-1]) / 2.0
    xxmh = (xg[1:-1] + xg[:-2]) / 2.0
    mxxph = 1.0 - xxph**2
    mxxmh = 1.0 - xxmh**2
    phmmh = xxph - xxmh
    for j in range(nx):
        a = mxxph[j] / diffx[j + 1] / phmmh[j] if j < nx - 1 else 0.0
        b = mxxmh[j] / diffx[j] / phmmh[j] if j > 0 else 0.0
        if j < nx - 1:
            L[j, j + 1] = a
        if j > 0:
            L[j, j - 1] = b
        L[j, j] = -(a + b)
    return L


# ------------------------------------------------------------- classic ----

class ClassicRef:
    """Eager classic (WE15) stepper (/root/reference/src/classic.jl)."""

    def __init__(self, nx, nt, grid, par):
        self.par = dict(par)
        self.nx, self.nt = nx, nt
        self.dt = 1.0 / nt
        self.x = make_grid(nx, grid)
        t = np.linspace(self.dt / 2.0, 1.0 - self.dt / 2.0, nt)
        p = self.par
        self.cg_tau = p["cg"] / p["tau"]
        self.dt_tau = self.dt / p["tau"]
        self.dc = self.dt_tau * self.cg_tau
        # classic always uses the uniform-grid operator (classic.jl:21)
        self.diffop = diffusion_matrix(nx, "identity")
        self.kappa = (1.0 + self.dt_tau) * np.eye(nx) - self.dt * p["D"] * self.diffop / p["cg"]
        S = (p["S0"] - p["S2"] * self.x**2)[:, None] - (
            p["S1"] * np.cos(2.0 * np.pi * t)
        )[None, :] * self.x[:, None]
        self.S = np.concatenate([S, S[:, :1]], axis=1)  # (nx, nt+1)
        self.M = p["B"] + self.cg_tau
        self.aw = p["a0"] - p["a2"] * self.x**2
        self.kLf = p["k"] * p["Lf"]

    def step(self, E, Tg, iz, f):
        """One step; ``iz`` is the 0-based in-year index. Returns
        (E, Tg, T, h)."""
        p = self.par
        S_i = self.S[:, iz]
        S_ip1 = self.S[:, iz + 1]
        alpha = self.aw * (E > 0.0) + p["ai"] * (E < 0.0)
        C = alpha * S_i + self.cg_tau * Tg - p["A"] + f
        with np.errstate(divide="ignore", invalid="ignore"):
            T0 = C / (self.M - self.kLf / E)
            T = E / p["cw"] * (E >= 0.0) + T0 * (E < 0.0) * (T0 < 0.0)
            E = E + self.dt * (C - self.M * T + p["Fb"])
            denom = self.M - self.kLf / E
            mask = (T0 < 0.0) * (E < 0.0)
            A_mat = self.kappa - np.diag(self.dc / denom * mask)
            rhs = Tg + self.dt_tau * (
                E / p["cw"] * (E >= 0.0) + (p["ai"] * S_ip1 - p["A"] + f) / denom * mask
            )
        Tg = np.linalg.solve(A_mat, rhs)
        h = -E / p["Lf"] * (E < 0.0)
        return E, Tg, T, h


# ----------------------------------------------------------------- MIZ ----

class MIZRef:
    """Eager MIZ stepper (/root/reference/src/miz.jl)."""

    def __init__(self, nx, nt, grid, par):
        self.par = dict(par)
        self.nx, self.nt = nx, nt
        self.dt = 1.0 / nt
        self.grid = grid
        self.x = make_grid(nx, grid)
        self.t = np.linspace(self.dt / 2.0, 1.0 - self.dt / 2.0, nt)
        self.L = diffusion_matrix(nx, grid, self.x)  # D∇² without D
        self.T0 = np.zeros(nx)  # persistent warm start (miz.jl:47)

    # solar bracket (miz.jl:11): (S0 - (S1 x) cos(2 pi t)) - S2 x^2
    def insol(self, t):
        p = self.par
        return (p["S0"] - (p["S1"] * self.x) * np.cos(2.0 * np.pi * t)) - p["S2"] * self.x**2

    def dgrad2(self, v):
        return self.par["D"] * (self.L @ v)

    def t0eq(self, T0, t, hp, Tw, phi, f):
        p = self.par
        Ti = np.minimum(T0, p["Tm"])
        Tb = Ti * phi + (1.0 - phi) * Tw
        r = p["k"] * (p["Tm"] - T0) / hp
        r = r + p["ai"] * self.insol(t)
        r = r + ((-p["A"]) - p["B"] * (T0 - p["Tm"]))
        r = r + self.dgrad2(Tb)
        r = r + f
        return r

    def t0jac(self, T0, t, hp, Tw, phi, f):
        p = self.par
        g = phi * (T0 < p["Tm"])
        return np.diag(-p["k"] / hp - p["B"]) + p["D"] * (self.L * g[None, :])

    def solve_Ti(self, t, h, Tw, phi, f):
        """Exact root of ``t0eq`` by active-set iteration.

        Given the active set ``A = {j : T0_j < Tm}``, the residual is affine
        in T0 (the only nonlinearity is ``min(T0, Tm)``), so each iterate
        solves the linear system exactly with a dense LU — an algorithm
        entirely different from the framework's damped Newton, terminating
        when the active set stabilizes. MINPACK (``hybr``) fails on the
        ``min`` kink for developed ice states, so it is unusable here.
        """
        p = self.par
        hp = np.where(h == 0.0, p["hmin"], h)
        Tm = p["Tm"]
        ins = self.insol(t)
        # constant part: k Tm/hp + ai S - A + B Tm + D∇²((1-phi) Tw) + f,
        # plus the active-set-dependent L phi min(T0,Tm) term split below.
        c0 = p["k"] * Tm / hp + p["ai"] * ins - p["A"] + p["B"] * Tm + f
        c0 = c0 + p["D"] * (self.L @ ((1.0 - phi) * Tw))
        T0 = self.T0.copy()
        active = T0 < Tm
        for _ in range(60):
            # r(T0) = c0 - (k/hp + B) T0 + D L (phi * (active ? T0 : Tm)) = 0
            M = -np.diag(p["k"] / hp + p["B"]) + p["D"] * (self.L * (phi * active)[None, :])
            rhs = -(c0 + p["D"] * (self.L @ (phi * np.where(active, 0.0, Tm))))
            T0 = np.linalg.solve(M, rhs)
            new_active = T0 < Tm
            if (new_active == active).all():
                break
            active = new_active
        resid = self.t0eq(T0, t, hp, Tw, phi, f)
        assert np.max(np.abs(resid)) < 1e-8, (
            f"oracle active-set solve failed at t={t}: max resid "
            f"{np.max(np.abs(resid))}"
        )
        self.T0 = T0
        Ti = np.minimum(T0, Tm)
        Ti = np.where(h == 0.0, 0.0, Ti)
        return Ti

    def step(self, Ei, Ew, h, Df, phi, t, f):
        """One step at in-year time ``t``; returns dict of the 10 stored
        variables (with the reference's end-of-step NaN masking) plus the
        NaN-free carry fields."""
        p = self.par
        dt = self.dt
        with np.errstate(divide="ignore", invalid="ignore"):
            Tw = p["Tm"] + Ew / ((1.0 - phi) * p["cw"])  # water_temp (:30)
        Tw = np.where(np.isnan(Tw), 0.0, Tw)
        Ti = self.solve_Ti(t, h, Tw, phi, f)
        with np.errstate(divide="ignore", invalid="ignore"):
            n = phi / (p["alpha"] * Df**2)
        n = np.where(Df == 0.0, 0.0, n)
        ins = self.insol(t)
        Tb = Ti * phi + (1.0 - phi) * Tw
        Lolr = p["A"] + p["B"] * (Tb - p["Tm"])
        dTb = self.dgrad2(Tb)
        Fvi = p["ai"] * ins - Lolr + dTb + p["Fb"] + f
        Fvw = (p["a0"] - p["a2"] * self.x**2) * ins - Lolr + dTb + p["Fb"] + f
        wl = p["m1"] * (Tw - p["Tm"] ** p["m2"])
        with np.errstate(divide="ignore", invalid="ignore"):
            Flat = phi * h * p["Lf"] * wl * np.pi / (p["alpha"] * Df)
        Flat = np.where(Df == 0.0, 0.0, Flat)
        rEi = Ei + (phi * Fvi + Flat) * dt
        rEw = Ew + ((1.0 - phi) * Fvw - Flat) * dt
        cEi = np.minimum(rEi, 0.0)
        cEw = np.maximum(rEw, 0.0)
        psiEidt = rEi - cEi
        psiEwdt = rEw - cEw
        Ei = cEi + psiEwdt
        Ew = cEw + psiEidt
        ring = p["alpha"] * n * ((Df + 2.0 * p["rl"]) ** 2 - Df**2)
        Al = np.minimum(ring, 1.0 - phi)
        psiEw = psiEwdt / dt
        with np.errstate(divide="ignore", invalid="ignore"):
            Ql = Al / (1.0 - phi) * psiEw
        Ql = np.where(phi == 1.0, 0.0, Ql)
        Qp = psiEw - Ql
        dn = dt * (-Qp / (p["Lf"] * p["alpha"] * p["Dmin"] ** 2 * p["hmin"]))
        # D_t (:140-146) with the -(pi/2)*alpha precedence quirk
        lat_melt = -np.pi / 2.0 * p["alpha"] * wl
        with np.errstate(divide="ignore", invalid="ignore"):
            lat_grow = -Df / (2.0 * p["Lf"] * h * phi) * Ql
        lat_grow = np.where(h == 0.0, 0.0, lat_grow)
        weld = p["kappa"] * p["alpha"] / 4.0 * phi * Df**3
        rD = Df + (lat_melt + lat_grow + weld) * dt
        total = n + dn
        with np.errstate(divide="ignore", invalid="ignore"):
            Dn = (n * rD + dn * p["Dmin"]) / total
        Dn = np.where(total == 0.0, 0.0, Dn)
        Dn = np.clip(Dn, p["Dmin"], p["Dmax"])
        Dn = np.where(Ei == 0.0, 0.0, Dn)
        rh = h + (-1.0 / p["Lf"] * Fvi) * dt
        rh = np.maximum(rh, 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            hn = (n * rh + dn * p["hmin"]) / total
        hn = np.where(total == 0.0, 0.0, hn)
        with np.errstate(divide="ignore", invalid="ignore"):
            phin = -Ei / (p["Lf"] * hn)
        phin = np.where(hn == 0.0, 0.0, phin)
        phin = np.where(phin > 1.0, 1.0, phin)
        Ei = np.where(hn == 0.0, 0.0, Ei)
        E = phin * Ei + (1.0 - phin) * Ew
        T = Ti * phin + (1.0 - phin) * Tw
        Ti_out = np.where(Ei == 0.0, np.nan, Ti)
        Tw_out = np.where(phin > 0.99, np.nan, Tw)
        return dict(
            E=E, T=T, h=hn, Ei=Ei, Ew=Ew, Ti=Ti_out, Tw=Tw_out, D=Dn, phi=phin, n=n
        )

    def run(self, nsteps, forcing_value=0.0, init=None):
        """Run from all-zero (or given) initial conditions for ``nsteps``;
        returns a dict of stacked per-step outputs (nsteps, nx)."""
        nx = self.nx
        state = init or {
            k: np.zeros(nx) for k in ("Ei", "Ew", "h", "D", "phi")
        }
        Ei, Ew, h, Df, phi = (
            state["Ei"].copy(), state["Ew"].copy(), state["h"].copy(),
            state["D"].copy(), state["phi"].copy(),
        )
        outs = {k: [] for k in ("E", "T", "h", "Ei", "Ew", "Ti", "Tw", "D", "phi", "n")}
        for ti in range(nsteps):
            t = self.t[ti % self.nt]
            out = self.step(Ei, Ew, h, Df, phi, t, forcing_value)
            Ei, Ew, h, Df, phi = out["Ei"], out["Ew"], out["h"], out["D"], out["phi"]
            for k in outs:
                outs[k].append(out[k])
        return {k: np.stack(v) for k, v in outs.items()}
