"""Noise-forced integration: noise-induced transitions between attractors.

No reference analog — the reference (EnergyBalanceModel.jl) is fully
deterministic; its hysteresis diagnostics (/root/reference/src/plot.jl:
173-225) find coexisting attractors but say nothing about how robust they
are to weather noise. This module adds the classical stochastic-EBM
question (Benzi/Sutera-style): perturb the radiative forcing with an
Ornstein–Uhlenbeck "weather noise" process and measure how often, and how
fast, trajectories cross the basin boundary (the saddle :func:`ebm.edge`/
:func:`ebm.edge_state` locate deterministically).

Design: the noise NEVER touches the model step. Each year the driver draws
the OU path ``eta_1..eta_nt`` (per member) and adds it to that year's
forcing row — exactly the channel the virtual per-member ``"F"`` sweep
already uses — then calls the unmodified year function from
:mod:`~energybalancemodel_jl_tpu.integrate`. ``sigma=0`` therefore
reproduces the deterministic trajectory, and every engine invariant
(seasonal accumulators, Newton warm starts) is inherited rather than
re-implemented.

Noise model: per step ``eta' = rho eta + sigma sqrt(1 - rho^2) xi`` with
``rho = exp(-dt / tau)``, ``dt = 1/nt`` years — an OU process with
correlation time ``tau`` (years) and STATIONARY standard deviation
``sigma`` (W/m^2), so the forcing variance is independent of the step
resolution ``nt`` (refining the grid does not change the climate noise).
``tau = 0`` degenerates to iid per-step noise of std ``sigma`` — note its
integrated effect then vanishes as ``nt`` grows; physical weather noise
has ``tau`` of days-to-weeks (0.01–0.05 yr).

Reproducibility: member ``k``'s draws come from ``fold_in(key(seed), k)``
folded again with the ABSOLUTE year index, so the realization depends only
on ``(seed, member, year)`` — splitting the run into dispatch chunks
(``years_per_dispatch``, the remote-TPU watchdog guard) is bitwise
invariant, and resuming from ``TransitionResult.state``/``.eta`` with the
continuation seed reproduces the uninterrupted tail.

TPU mapping: one member's noisy year is the same program as the
deterministic one; K members run as a lockstep vmapped batch (the MXU/VPU
sees the identical fused year graph), the OU generation is a trivial
length-``nt`` scan per year, and ``mesh=`` shards members across chips
with zero hot-loop collectives (noise keys are per-member, so sharding
cannot change the draws).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .forcing import Forcing
from .integrate import default_dtype, make_year_fn
from .models.base import default_step_config, get_model
from .spacetime import SpaceTime
from .utils.collection import Collection
from .utils.numerics import hemispheric_mean

__all__ = ["transitions", "TransitionResult"]


@dataclasses.dataclass
class TransitionResult:
    """Result of :func:`transitions`.

    ``areas`` is the per-year seasonal ice area of every member, shape
    ``(years, K)``; ``labels`` the per-year classification against the two
    attractor reference areas (0 = nearer ``a``, 1 = nearer ``b``, -1 =
    non-finite year). ``first_passage`` is each member's first year
    (1-based) whose label differs from the starting attractor's — NaN
    where no transition happened within ``years`` (censored) or the member
    went non-finite first. ``state``/``eta`` are the final carries and OU
    values — pass them as ``init=``/``eta0=`` (with a fresh ``seed``) to
    extend a run. ``tracked`` holds the per-year hemispheric means
    requested via ``track=``, each ``(years, K)``.
    """

    areas: np.ndarray
    labels: np.ndarray
    first_passage: np.ndarray
    finite: np.ndarray
    state: Collection
    eta: np.ndarray
    tracked: Collection
    area_a: np.ndarray
    area_b: np.ndarray
    start: str
    sigma: float
    tau: float
    years: int
    season: str
    seed: int
    newton_ok: bool

    @property
    def escaped(self) -> np.ndarray:
        """Members that crossed to the other attractor within ``years``."""
        return np.isfinite(self.first_passage)

    def escape_fraction(self) -> float:
        """Fraction of finite members that escaped within ``years``."""
        fin = self.finite
        n = int(np.count_nonzero(fin))
        if n == 0:
            return float("nan")
        return float(np.count_nonzero(self.escaped & fin)) / n

    def mean_first_passage(self) -> float:
        """Mean first-passage year over ESCAPED members only — biased low
        when many members are censored (never escaped in ``years``); use
        :meth:`escape_rate` for the censoring-aware estimate."""
        fp = self.first_passage[self.escaped & self.finite]
        return float(np.mean(fp)) if fp.size else float("nan")

    def escape_rate(self) -> float:
        """Escapes per member-year, the censoring-aware MLE for an
        exponential escape process: ``n_escaped / total observed years``
        where a censored member contributes all ``years`` and an escaped
        one its first-passage year. Its reciprocal estimates the mean
        residence time even when most members never escaped."""
        fin = self.finite
        esc = self.escaped & fin
        observed = np.where(esc, self.first_passage, float(self.years))
        total = float(np.sum(observed[fin]))
        if total <= 0.0:
            return float("nan")
        return float(np.count_nonzero(esc)) / total

    def __repr__(self):
        K = self.areas.shape[1] if self.areas.ndim == 2 else 0
        n_esc = int(np.count_nonzero(self.escaped & self.finite))
        bad = int(np.count_nonzero(~self.finite))
        extra = f", {bad} non-finite" if bad else ""
        return (f"TransitionResult({n_esc}/{K} members escaped "
                f"'{self.start}' in {self.years} years, sigma={self.sigma:g}"
                f", tau={self.tau:g}{extra})")


@functools.lru_cache(maxsize=32)
def _transition_loop_fn(model_name: str, st: SpaceTime, cfg, dtype_name: str,
                        season: str, track):
    """Jitted noisy-year chunk: ``k`` OU-forced years advancing a lockstep
    ensemble, emitting each year's seasonal ice area (and tracked
    hemispheric means). The linearization-free twin of
    :func:`lyapunov._lyapunov_loop_fn`: carry/par/forcing/noise state are
    ARGUMENTS so one compilation serves every chunk; the noise realization
    is keyed on (member key, ABSOLUTE year), so chunk boundaries cannot
    change the draws."""
    year = make_year_fn(model_name, st, cfg, dtype_name, False)
    dtype = jnp.dtype(dtype_name)
    nt = st.nt
    x = jnp.asarray(st.x, dtype=dtype)

    def area_of(coll):
        if "phi" in coll:
            field = jnp.nan_to_num(coll["phi"])
        else:
            field = (coll["E"] < 0.0).astype(dtype)
        return 2.0 * jnp.pi * hemispheric_mean(field, x)

    @functools.partial(jax.jit, static_argnums=(6,))
    def run(carry, eta, keys, par_j, frow_j, year0, k, rho, scale):
        def one_year(state, yi):
            carry, eta = state
            draw = lambda key: jax.random.normal(
                jax.random.fold_in(key, yi), (nt,), dtype)
            xi = jax.vmap(draw)(keys)  # (K, nt)

            def ou(e, z):
                e = rho * e + scale * z
                return e, e

            eta, etas = lax.scan(ou, eta, jnp.swapaxes(xi, 0, 1))
            fyear = frow_j + etas[..., None]  # (nt, K, 1)
            carry, seasonal, conv, _ = year(carry, par_j, fyear)
            if conv is None:
                conv = jnp.ones((), dtype)
            coll = getattr(seasonal, season)
            area = area_of(coll)
            means = tuple(
                hemispheric_mean(jnp.nan_to_num(coll[v]), x) for v in track
            )
            return (carry, eta), (area, means, conv)

        (carry, eta), (areas, means, convs) = lax.scan(
            one_year, (carry, eta), year0 + jnp.arange(k, dtype=jnp.int32))
        return carry, eta, areas, means, jnp.min(convs)

    return run


def _first_passage(labels: np.ndarray, start_label: int):
    """First-passage years from a ``(years, K)`` label history.

    The first year labeled as the OTHER attractor, strictly before any
    non-finite (-1) year, 1-based; NaN where no passage happened. A
    member that went non-finite WITHOUT first escaping is a failed run
    (``finite=False``, excluded from the statistics); non-finiteness
    after a recorded passage does not invalidate the passage.
    """
    years = labels.shape[0]
    other = labels == (1 - start_label)
    bad_y = labels == -1
    # vectorized first-True via argmax; any() guards the all-False
    # argmax-returns-0 trap
    bad_any = bad_y.any(axis=0)
    first_bad = np.where(bad_any, bad_y.argmax(axis=0), years)
    passed = other & (np.arange(years)[:, None] < first_bad[None, :])
    esc_any = passed.any(axis=0)
    fp = np.where(esc_any, passed.argmax(axis=0) + 1.0, np.nan)  # 1-based
    finite = ~(bad_any & ~esc_any)
    return fp, finite


def _ref_area(obj, model, st, par, forcing, season, dtype):
    """Reference ice area of an attractor: from an EquilibriumResult's
    seasonal store directly, else one deterministic year from a state
    Collection (solo ``par`` only — per-member sweeps must pass results,
    whose stores already carry the member axis)."""
    from .fold import seasonal_ice_area

    seasonal = getattr(obj, "seasonal", None)
    if seasonal is None:
        swept = [k for k, v in Collection(par).items() if np.ndim(v) >= 1]
        if swept:
            raise ValueError(
                f"attractor references must be EquilibriumResults when par "
                f"leaves {swept} are per-member (a bare state cannot be "
                f"re-run under a swept par)")
        from .basins import _year_seasonal

        seasonal = _year_seasonal(model, st, forcing, par, Collection(obj),
                                  dtype)
    return np.atleast_1d(np.asarray(
        seasonal_ice_area(getattr(seasonal, season), st), dtype=np.float64))


def transitions(
    model: str,
    st: SpaceTime,
    forcing: Union[Forcing, float],
    par: Collection,
    a,
    b,
    sigma: float,
    tau: float = 0.02,
    years: int = 100,
    K: Optional[int] = None,
    start: str = "a",
    init: Optional[Collection] = None,
    eta0: Optional[np.ndarray] = None,
    track: Sequence[str] = (),
    season: str = "avg",
    seed: int = 0,
    dtype=None,
    newton_max_iter: int = 30,
    years_per_dispatch: Optional[int] = None,
    mesh=None,
    progress: bool = False,
) -> TransitionResult:
    """Noise-induced transition statistics between two attractors.

    Runs ``K`` members from the ``start`` attractor (``"a"`` or ``"b"``;
    ``init=`` overrides the actual starting state) under OU weather noise
    of stationary std ``sigma`` (W/m^2) and correlation time ``tau``
    (years) added to the constant forcing, classifying each member-year's
    seasonal ice area against the two attractors' reference areas.
    ``a``/``b`` are :func:`~energybalancemodel_jl_tpu.equilibrium.equilibrate`
    results (or bare state Collections, re-run for one deterministic year
    to obtain their seasonal stores — solo ``par`` only).

    ``par`` leaves of shape ``(K,)`` (including the virtual ``"F"``
    forcing offset) sweep parameters across members in lockstep — one
    program measures an escape-rate curve (pass matching K-batched
    ``a``/``b`` results, e.g. from an ensemble ``equilibrate``, so every
    member is classified against its own attractor pair). ``track`` names
    seasonal variables whose hemispheric means are recorded per year
    (cheap: scalars, not fields). ``years_per_dispatch`` bounds one device
    dispatch (remote-TPU watchdog); chunking is bitwise-invariant because
    the noise is keyed on the absolute year. ``mesh`` (1-D
    ``jax.sharding.Mesh``) shards members across chips; the draws are
    per-member keyed, so sharded == unsharded exactly.

    Escape statistics (:class:`TransitionResult`): ``escape_fraction``,
    ``mean_first_passage`` (escaped members only, censoring-biased), and
    the censoring-aware ``escape_rate`` (escapes per member-year).
    Members that go non-finite are excluded from the statistics and
    flagged in ``finite``. Runs the XLA year graph (noise rows change
    every step, which the fused Pallas kernels' separable-insolation
    layout does not carry); expect deterministic-ensemble throughput.
    """
    spec = get_model(model)
    if not isinstance(forcing, Forcing):
        forcing = Forcing(float(forcing))
    if not forcing.constant:
        raise ValueError(
            "transitions needs constant base forcing (an autonomous escape "
            "problem); sweep levels across members via par['F']")
    if start not in ("a", "b"):
        raise ValueError(f"start must be 'a' or 'b', got {start!r}")
    sigma = float(sigma)
    tau = float(tau)
    if sigma < 0.0:
        raise ValueError("sigma must be >= 0")
    if tau < 0.0:
        raise ValueError("tau must be >= 0")
    years = int(years)
    if years < 1:
        raise ValueError("years must be >= 1")
    if dtype is None:
        dtype = default_dtype()
    dtype = jnp.dtype(dtype)

    if season not in ("winter", "summer", "avg"):
        raise ValueError(f"season must be winter/summer/avg, got {season!r}")

    par = Collection(par)
    par.pop("__K__", None)
    sizes = {np.shape(v)[0] for v in par.values() if np.ndim(v) > 0}
    if init is not None:
        sizes |= {np.shape(v)[0] for v in Collection(init).values()
                  if np.ndim(v) > 1}
    # member count: explicit K, else inferred from swept par/init leaves
    if sizes and K is not None and int(K) not in sizes:
        raise ValueError(
            f"K={K} conflicts with per-member par/init leaves of size "
            f"{sorted(sizes)}")
    if len(sizes) > 1:
        raise ValueError(f"inconsistent ensemble sizes {sorted(sizes)}")
    K = int(K) if K is not None else (sizes.pop() if sizes else 1)

    area_a = _ref_area(a, model, st, par, forcing, season, dtype)
    area_b = _ref_area(b, model, st, par, forcing, season, dtype)
    for name, arr in (("a", area_a), ("b", area_b)):
        if arr.size not in (1, K):
            raise ValueError(
                f"attractor {name}'s reference area is {arr.size}-member "
                f"but the run has K={K}")

    if init is None:
        src = a if start == "a" else b
        init = getattr(src, "state", src)
    init = Collection(init)
    bad = [k for k, v in init.items() if np.ndim(v) > 1
           and np.shape(v)[0] != K]
    if bad:
        raise ValueError(
            f"init leaves {bad} are member-batched with a size other "
            f"than K={K}")

    track = tuple(track)
    cfg = default_step_config(dtype.name, newton_max_iter=newton_max_iter)

    F_off = par.pop("F", None)
    if F_off is not None and np.ndim(F_off) == 0:
        forcing = Forcing(float(forcing.base) + float(np.asarray(F_off)))
        F_off = None

    carry = spec.init_carry(init, st, dtype)
    carry = Collection({
        k: (v if jnp.ndim(v) > 1 else jnp.broadcast_to(v, (K,) + v.shape))
        for k, v in carry.items()
    })
    par_j = Collection({
        k: (jnp.asarray(v, dtype)[:, None] if np.ndim(v) == 1
            else jnp.asarray(v, dtype))
        for k, v in par.items()
    })
    # (nt, 1, 1) unless a per-member F offset forces the K axis — the noise
    # rows carry the member axis, so broadcasting fills it for free
    frow = np.asarray(forcing.table(st)[0], dtype=np.float64)[:, None, None]
    if F_off is not None:
        frow = frow + np.asarray(F_off, dtype=np.float64)[None, :, None]
    frow_j = jnp.asarray(frow, dtype=dtype)

    bad_track = [v for v in track if v not in spec.solution_vars]
    if bad_track:
        raise ValueError(
            f"track names {bad_track} not in the {spec.name} seasonal "
            f"store {tuple(spec.solution_vars)}")

    base_key = jax.random.PRNGKey(int(seed))
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.arange(K, dtype=jnp.uint32))

    if eta0 is None:
        eta = jnp.zeros((K,), dtype)
    else:
        eta0 = np.asarray(eta0, dtype=np.float64)
        if eta0.shape not in ((), (K,)):
            raise ValueError(f"eta0 must be scalar or ({K},), got "
                             f"{eta0.shape}")
        eta = jnp.broadcast_to(jnp.asarray(eta0, dtype), (K,))

    dt = 1.0 / st.nt
    if tau > 0.0:
        rho = float(np.exp(-dt / tau))
        scale = sigma * float(np.sqrt(max(0.0, 1.0 - rho * rho)))
    else:
        rho, scale = 0.0, sigma

    run = _transition_loop_fn(spec.name, st, cfg, dtype.name, season, track)

    if mesh is not None:
        if K % mesh.size != 0:
            raise ValueError(
                f"ensemble size {K} is not divisible by the mesh size "
                f"{mesh.size}")
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        ax = mesh.axis_names[0]

        def _put(x, axis_idx):
            spec_ = [None] * np.ndim(x)
            spec_[axis_idx] = ax
            return jax.device_put(x, NamedSharding(mesh, _P(*spec_)))

        # STRUCTURAL member-axis placement (rank identifies the axis —
        # an extent==K test would collide when K matches nt/nx, CLAUDE.md)
        carry = jax.tree_util.tree_map(
            lambda v: _put(v, 0) if np.ndim(v) >= 2 else v, carry)
        par_j = jax.tree_util.tree_map(
            lambda v: _put(v, 0) if np.ndim(v) >= 2 else v, par_j)
        if frow_j.shape[1] == K:  # only the F-offset layout has a K axis
            frow_j = _put(frow_j, 1)
        eta = _put(eta, 0)
        keys = _put(keys, 0)

    prog = None
    if progress:
        from .utils.progress import Progress

        prog = Progress(years, title=f"Transitions (sigma={sigma:g})",
                        infofeed=lambda msg: msg)

    chunk = years if years_per_dispatch is None \
        else max(1, int(years_per_dispatch))
    areas_h, means_h, done = [], [], 0
    ok = 1.0
    while done < years:
        k = min(chunk, years - done)
        carry, eta, areas, means, conv = run(
            carry, eta, keys, par_j, frow_j,
            jnp.asarray(done, jnp.int32), k, rho, scale)
        areas_h.append(areas)
        means_h.append(means)
        ok = min(ok, float(conv))
        done += k
        if prog is not None:
            prog.update(done, feedargs=(f"{done}/{years} years",))

    carry, eta, areas = jax.device_get(
        (carry, eta, jnp.concatenate(areas_h, axis=0)))
    areas = np.asarray(areas, dtype=np.float64)  # (years, K)
    tracked = Collection({
        v: np.concatenate(
            [np.asarray(m[i], dtype=np.float64) for m in means_h], axis=0)
        for i, v in enumerate(track)
    })

    finite_y = np.isfinite(areas)
    d_a = np.abs(areas - area_a[None, :]) if area_a.size == K \
        else np.abs(areas - area_a.reshape(1, 1))
    d_b = np.abs(areas - area_b[None, :]) if area_b.size == K \
        else np.abs(areas - area_b.reshape(1, 1))
    labels = np.where(finite_y, (d_b < d_a).astype(np.int8),
                      np.int8(-1)).astype(np.int8)

    fp, finite = _first_passage(labels, 0 if start == "a" else 1)

    return TransitionResult(
        areas=areas, labels=labels, first_passage=fp, finite=finite,
        state=Collection({k: np.asarray(v) for k, v in carry.items()}),
        eta=np.asarray(eta, dtype=np.float64), tracked=tracked,
        area_a=area_a, area_b=area_b, start=start, sigma=sigma, tau=tau,
        years=years, season=season, seed=int(seed),
        newton_ok=bool(ok >= 0.5),
    )
