"""Extended EBM with a Marginal Ice Zone (MIZ).

Rebuild of /root/reference/src/miz.jl: separate ice/water enthalpies
``Ei, Ew``, ice concentration ``phi``, floe size ``D``, floe number ``n``,
ice thickness ``h``, lateral melt/growth, pancake-ice formation, floe
welding, and a per-step nonlinear solve for the ice surface temperature.

The reference's NonlinearSolve TrustRegion solve (:55-60) becomes a
warm-started Newton iteration with an analytic tridiagonal Jacobian (the
``T0eq`` residual couples neighbors only through the 3-point diffusion
stencil, :33-45); the warm start is carried through the scan state, mirroring
the reference's ``@persistent T0`` (:47).

Reference quirks reproduced deliberately (see SURVEY.md §2):

- ``D_t``'s lateral-melt term is ``-(pi/2)*alpha*wlat`` — Julia operator
  precedence in ``-pi / 2.0*par.alpha * wlat`` (:141), not ``-pi/(2 alpha)``.
- ``wlat = m1*(Tw - Tm^m2)`` — the exponent binds to ``Tm`` only (:71).
- NaNs are presentation-only: ``Ti``/``Tw`` are NaN-masked at the *end* of a
  step for storage (:193-194) and ``Tw`` NaNs are zeroed at the start of the
  next (:157). The scan carry stays NaN-free; masking is applied to the
  emitted outputs only.
- ``n`` stored per step is computed from the *pre-update* ``D`` and ``phi``
  (:160).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.diffusion import diffusion_bands
from ..ops.newton import newton_tridiag
from ..utils.collection import Collection
from .base import ModelSpec, StepConfig, register_model

__all__ = ["MIZ"]


def statics(st, par, dtype):
    """Traced per-run precompute: insolation table, water coalbedo, stencil
    bands (geometry is parameter-free; diffusivity ``D`` multiplies at use)."""
    x = jnp.asarray(st.x, dtype=dtype)
    t = jnp.asarray(st.t, dtype=dtype)
    # insolation bracket shared by ice and water solar terms
    # (/root/reference/src/miz.jl:11,14): (S0 - (S1 x) cos(2 pi t)) - S2 x^2
    cosv = jnp.cos(2.0 * jnp.pi * t)
    insol = (par["S0"] - (par["S1"] * x)[None, :] * cosv[:, None]) - (par["S2"] * x**2)[None, :]
    aw = par["a0"] - par["a2"] * x**2  # water coalbedo (:14)
    geom = diffusion_bands(st)
    return Collection(
        insol=insol,
        aw=aw,
        glo=jnp.asarray(geom.lo, dtype=dtype),
        gdi=jnp.asarray(geom.di, dtype=dtype),
        gup=jnp.asarray(geom.up, dtype=dtype),
        dt=st.dt,
    )


def init_carry(init, st, dtype):
    """Scan carry: the five prognostic fields (reference init vars
    /root/reference/src/infrastructure.jl:604-605) plus the Newton warm-start
    ``T0`` (reference ``@persistent T0`` zeros, /root/reference/src/miz.jl:47-53)."""
    z = jnp.zeros(st.nx, dtype=dtype)
    return Collection(
        Ei=jnp.asarray(init["Ei"], dtype=dtype),
        Ew=jnp.asarray(init["Ew"], dtype=dtype),
        h=jnp.asarray(init["h"], dtype=dtype),
        D=jnp.asarray(init["D"], dtype=dtype),
        phi=jnp.asarray(init["phi"], dtype=dtype),
        T0=z,
    )


def step_inputs(stat, fyear):
    return dict(insol=stat.insol, f=fyear)


def _dstencil(stat, par, v):
    """``D∇²v`` via the precomputed bands (rebuild of ``diffusion!``
    /root/reference/src/infrastructure.jl:505-527)."""
    vm1 = jnp.roll(v, 1, axis=-1)
    vp1 = jnp.roll(v, -1, axis=-1)
    return par["D"] * (stat.glo * vm1 + stat.gdi * v + stat.gup * vp1)


def solve_T0(T0_warm, insol, h, Tw, phi, f, stat, par, cfg: StepConfig):
    """Ice surface temperature from the single-column energy balance.

    Rebuild of ``solveTi``'s inner solve (/root/reference/src/miz.jl:47-64).
    Residual (``T0eq``, :33-45)::

        k (Tm - T0)/h + ai S(x,t) - A - B (T0 - Tm)
          + D∇²( phi min(T0,Tm) + (1-phi) Tw ) + f

    with ``h -> hmin`` where ``h == 0`` (:51). The Jacobian is tridiagonal:
    diagonal ``-k/h - B + D g_di phi 1[T0<Tm]`` plus the stencil off-diagonals
    times the neighbor's ``phi 1[T0<Tm]``.
    """
    dtype = T0_warm.dtype
    hp = jnp.where(h == 0.0, par["hmin"], h)
    Tm = par["Tm"]
    solar_ice = par["ai"] * insol

    if cfg.solver == "pallas" and T0_warm.ndim >= 2:
        return _solve_T0_pallas(T0_warm, insol, hp, Tw, phi, f, stat, par, cfg)

    def residual_and_bands(T0):
        Ti = jnp.minimum(T0, Tm)
        Tb = Ti * phi + (1.0 - phi) * Tw
        r = par["k"] * (Tm - T0) / hp
        r = r + solar_ice
        r = r + ((-par["A"]) - par["B"] * (T0 - Tm))
        r = r + _dstencil(stat, par, Tb)
        r = r + f
        g = phi * (T0 < Tm).astype(dtype)
        jlo = par["D"] * stat.glo * jnp.roll(g, 1, axis=-1)
        jdi = -par["k"] / hp - par["B"] + par["D"] * stat.gdi * g
        jup = par["D"] * stat.gup * jnp.roll(g, -1, axis=-1)
        return r, (jlo, jdi, jup)

    T0, converged, iters = newton_tridiag(
        residual_and_bands,
        T0_warm,
        abstol=cfg.newton_abstol,
        reltol=cfg.newton_reltol,
        max_iter=cfg.newton_max_iter,
        method="pcr" if cfg.solver == "pallas" else cfg.solver,
        # float32 config caps the update: physical surface temperatures move
        # by at most a few K per step from a warm start, and the cap keeps
        # low-precision iterates from blowing up through the min(T0, Tm) kink
        max_step=cfg.newton_max_step,
    )
    return T0, converged, iters


def _solve_T0_pallas(T0_warm, insol, hp, Tw, phi, f, stat, par, cfg: StepConfig):
    """Batched fast path: the fused Pallas Newton kernel
    (:mod:`..ops.pallas_newton`) — fixed iterations, whole solve in VMEM.
    Requires scalar (non-swept) ``k/Tm/A/B/ai``; per-member ``D`` is fine."""
    from ..ops.pallas_newton import default_interpret, pallas_solve_T0

    K = T0_warm.shape[0]
    nx = T0_warm.shape[-1]

    def scal(name):
        v = par[name]
        if jnp.ndim(v) != 0:
            raise ValueError(
                f"solver='pallas' requires scalar parameter {name!r}; "
                "sweep it with the vmap engine instead"
            )
        return v

    D = par["D"]
    D_vec = (
        jnp.broadcast_to(jnp.reshape(D, (-1,)), (K,))
        if jnp.ndim(D) > 0
        else jnp.full((K,), D, dtype=T0_warm.dtype)
    )
    bt = lambda v: jnp.broadcast_to(v, (K, nx))
    T0 = pallas_solve_T0(
        T0_warm, bt(hp), bt(Tw), bt(phi), bt(insol),
        stat.glo, stat.gdi, stat.gup, D_vec,
        scal("k"), scal("Tm"), scal("A"), scal("B"), scal("ai"), f,
        max_step=cfg.newton_max_step or 50.0,
        iters=min(cfg.newton_max_iter, 6),
        interpret=default_interpret(),
    )
    # one residual evaluation for the convergence diagnostic
    Ti = jnp.minimum(T0, par["Tm"])
    Tb = Ti * phi + (1.0 - phi) * Tw
    r = par["k"] * (par["Tm"] - T0) / hp + par["ai"] * insol
    r = r + ((-par["A"]) - par["B"] * (T0 - par["Tm"]))
    r = r + _dstencil(stat, par, Tb) + f
    converged = jnp.max(jnp.abs(r), axis=-1) <= cfg.newton_abstol * 4.0
    return T0, converged, jnp.int32(min(cfg.newton_max_iter, 6))


def step(carry, xs, stat, par, cfg: StepConfig):
    """One MIZ step (rebuild of ``step!(::Val{:MIZ})``
    /root/reference/src/miz.jl:150-196, preserving the reference's exact
    update order and masking semantics)."""
    Ei, Ew, h, Df, phi = carry["Ei"], carry["Ew"], carry["h"], carry["D"], carry["phi"]
    insol, f = xs["insol"], xs["f"]
    dtype = Ei.dtype
    dt = stat.dt
    Tm = par["Tm"]

    # -- temperatures (:156-158) ---------------------------------------
    # water_temp (:30) with a guarded denominator: the reference computes
    # Ew/((1-phi) cw) and only cleans the 0/0 NaN afterwards (:157); a lane
    # with phi == 1 and Ew > 0 would produce +inf and cascade to NaN through
    # Tbar's 0*inf. Such a state never arises in float64 (oracle-parity
    # tested), but float32 rounding can reach it — the guard returns 0 there
    # and is exact everywhere else.
    den = (1.0 - phi) * par["cw"]
    Tw = Tm + jnp.where(den == 0.0, 0.0, Ew / jnp.where(den == 0.0, 1.0, den))
    Tw = jnp.where(jnp.isnan(Tw), 0.0, Tw)  # condset!(Tw, 0, isnan) (:157)
    T0, converged, _ = solve_T0(carry["T0"], insol, h, Tw, phi, f, stat, par, cfg)
    Ti = jnp.minimum(T0, Tm)  # ice_temp (:31,65)
    Ti = jnp.where(h == 0.0, 0.0, Ti)  # zeroref!(Ti, h) (:66)

    # -- floe number from pre-update D, phi (:160, num :83-87) ---------
    n = phi / (par["alpha"] * Df**2)
    n = jnp.where(Df == 0.0, 0.0, n)

    # -- fluxes (:162-164) ---------------------------------------------
    Tb = Ti * phi + (1.0 - phi) * Tw  # Tbar (:21-28)
    L = par["A"] + par["B"] * (Tb - Tm)  # OLR (:99)
    dTb = _dstencil(stat, par, Tb)
    Fvi = par["ai"] * insol - L + dTb + par["Fb"] + f  # vert_flux ice (:96-101)
    Fvw = stat.aw * insol - L + dTb + par["Fb"] + f  # vert_flux water
    wl = par["m1"] * (Tw - Tm**par["m2"])  # wlat (:71) — exponent binds to Tm
    Flat = phi * h * par["Lf"] * wl * jnp.pi / (par["alpha"] * Df)  # lat_flux (:103-107)
    Flat = jnp.where(Df == 0.0, 0.0, Flat)

    # -- enthalpy forward Euler + redistribution (:166-170, :109-117) --
    rEi = Ei + (phi * Fvi + Flat) * dt  # Ei_t (:137)
    rEw = Ew + ((1.0 - phi) * Fvw - Flat) * dt  # Ew_t (:138)
    cEi = jnp.minimum(rEi, 0.0)  # clamp(rEi, -Inf, 0)
    cEw = jnp.maximum(rEw, 0.0)  # clamp(rEw, 0, Inf)
    psiEidt = rEi - cEi  # >= 0
    psiEwdt = rEw - cEw  # <= 0
    Ei1 = cEi + psiEwdt
    Ew1 = cEw + psiEidt

    # -- floe size/thickness updates (:172-181) ------------------------
    ring = par["alpha"] * n * ((Df + 2.0 * par["rl"]) ** 2 - Df**2)  # area_lead (:90-93)
    Al = jnp.minimum(ring, 1.0 - phi)
    psiEw = psiEwdt / dt
    Ql = Al / (1.0 - phi) * psiEw  # split_psiEw (:120-125)
    Ql = jnp.where(phi == 1.0, 0.0, Ql)  # condset!(Ql, 0, isone, phi)
    Qp = psiEw - Ql
    dn = dt * (-Qp / (par["Lf"] * par["alpha"] * par["Dmin"] ** 2 * par["hmin"]))  # psinplus (:127)

    # D_t (:140-146) — note the reference's operator-precedence quirk:
    # lat_melt = ((-pi)/2.0*alpha)*wlat = -(pi/2) alpha wlat
    lat_melt = -jnp.pi / 2.0 * par["alpha"] * wl
    lat_grow = -Df / (2.0 * par["Lf"] * h * phi) * Ql
    lat_grow = jnp.where(h == 0.0, 0.0, lat_grow)  # zeroref!(lat_grow, h) (:144)
    weld = par["kappa"] * par["alpha"] / 4.0 * phi * Df**3
    rD = Df + (lat_melt + lat_grow + weld) * dt
    total = n + dn
    D1 = (n * rD + dn * par["Dmin"]) / total  # average new pancakes (:129-134,176)
    D1 = jnp.where(total == 0.0, 0.0, D1)
    D1 = jnp.clip(D1, par["Dmin"], par["Dmax"])  # (:177)
    D1 = jnp.where(Ei1 == 0.0, 0.0, D1)  # zeroref!(D, Ei) (:178)

    rh = h + (-1.0 / par["Lf"] * Fvi) * dt  # h_t (:139,179)
    rh = jnp.maximum(rh, 0.0)  # clamp!(rh, 0, Inf) (:180)
    h1 = (n * rh + dn * par["hmin"]) / total  # (:181)
    h1 = jnp.where(total == 0.0, 0.0, h1)

    # -- concentration (:183, concentration :74-80) --------------------
    phi1 = -Ei1 / (par["Lf"] * h1)
    phi1 = jnp.where(h1 == 0.0, 0.0, phi1)
    phi1 = jnp.where(phi1 > 1.0, 1.0, phi1)

    # -- totals (:185-187) ---------------------------------------------
    Ei1 = jnp.where(h1 == 0.0, 0.0, Ei1)  # zeroref!(Ei, h)
    E = phi1 * Ei1 + (1.0 - phi1) * Ew1
    T = Ti * phi1 + (1.0 - phi1) * Tw  # Tbar(Ti, Tw, phi) with updated phi

    # -- NaN masking for storage only (:193-194) -----------------------
    nan = jnp.asarray(jnp.nan, dtype=dtype)
    Ti_out = jnp.where(Ei1 == 0.0, nan, Ti)
    Tw_out = jnp.where(phi1 > 0.99, nan, Tw)

    carry = Collection(Ei=Ei1, Ew=Ew1, h=h1, D=D1, phi=phi1, T0=T0)
    out = Collection(
        E=E, T=T, h=h1, Ei=Ei1, Ew=Ew1, Ti=Ti_out, Tw=Tw_out, D=D1, phi=phi1, n=n,
        newton_converged=jnp.all(converged),
    )
    return carry, out


MIZ = register_model(
    ModelSpec(
        name="MIZ",
        statics=statics,
        init_carry=init_carry,
        step=step,
        step_inputs=step_inputs,
        solution_vars=("E", "T", "h", "Ei", "Ew", "Ti", "Tw", "D", "phi", "n"),
        init_vars=("Ei", "Ew", "h", "D", "phi"),
    )
)
