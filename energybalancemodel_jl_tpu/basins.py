"""Basin-of-attraction mapping and basin-boundary (edge) tracking.

No reference analog — the reference explores multistability only through
forcing-ramp hysteresis runs (/root/reference/src/plot.jl:173-225). Here
the INITIAL-CONDITION space is probed directly: :func:`basins`
equilibrates an ensemble of K initial states in lockstep and clusters
the converged states into attractors by their seasonal ice area (the
package's shared diagnostic, :func:`~energybalancemodel_jl_tpu.fold.
seasonal_ice_area`); :func:`edge` bisects the basin BOUNDARY along the
straight line between two states in different basins — the
initial-condition-space companion of :func:`~energybalancemodel_jl_tpu.
fold.fold` (which bisects in parameter space).

The TPU leverage is the same lockstep-ensemble trick fold uses: members
carry DIFFERENT second parameters (e.g. ``par["D"] = np.linspace(...)``
or per-member forcing via ``par["F"]``), so one ensemble equilibration
probes every member's own blend weight at once — K basin-boundary
locations cost ``steps`` ensemble solves, each the fused whole-year
Pallas kernel on TPU (``engine='auto'``).

Caveat (critical slowing down): trajectories from initial conditions
NEAR the basin boundary linger on the boundary's saddle (the "edge
state") before falling to either attractor, so tight brackets need
larger ``max_years`` — exactly the fold caveat, in state space. A probe
that has not settled is classified by its final state anyway and flagged
in ``probe_converged``; a probe whose state goes NON-FINITE keeps its
bracket that step instead (its masked ice area would read 0 — an
artifact, not a diagnostic), is flagged in ``probe_finite``, and later
probes for that member step off-center so the deterministic divergence
at the held midpoint is not replayed verbatim.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import numpy as np

from .equilibrium import EquilibriumResult, equilibrate
from .fold import seasonal_ice_area
from .forcing import Forcing
from .spacetime import SpaceTime
from .utils.collection import Collection

__all__ = ["basins", "edge", "blend_states", "stack_states",
           "BasinResult", "EdgeResult"]


def stack_states(states: Sequence[Collection]) -> Collection:
    """Stack a sequence of (unbatched) state Collections into one
    member-batched Collection with ``(K, ...)`` leaves — the ``inits``
    format :func:`basins` consumes."""
    states = [Collection(s) for s in states]
    if not states:
        raise ValueError("stack_states needs at least one state")
    keys = set(states[0].keys())
    for s in states[1:]:
        if set(s.keys()) != keys:
            raise ValueError(
                f"states carry different variables: {sorted(keys)} vs "
                f"{sorted(s.keys())}")
    return Collection({
        k: np.stack([np.asarray(s[k], dtype=np.float64) for s in states])
        for k in states[0]
    })


def blend_states(a, b, w) -> Collection:
    """Linear interpolation ``(1-w)*a + w*b`` of two state Collections.

    Scalar ``w`` keeps the input shapes. An array ``w`` of shape ``(K,)``
    produces a member-batched Collection: 1-D leaves are treated as
    UNBATCHED per-member fields and lifted to ``(K, nx)``; leaves of
    ``ndim >= 2`` whose leading axis is ``K`` are treated as already
    member-batched (per-member endpoints) and blended along it.
    """
    a, b = Collection(a), Collection(b)
    if set(a.keys()) != set(b.keys()):
        raise ValueError(
            f"endpoint states carry different variables: "
            f"{sorted(a.keys())} vs {sorted(b.keys())}")
    w = np.asarray(w, dtype=np.float64)
    out = Collection()
    for k in a:
        va = np.asarray(a[k], dtype=np.float64)
        vb = np.asarray(b[k], dtype=np.float64)
        va, vb = np.broadcast_arrays(va, vb)
        if w.ndim == 0:
            out[k] = (1.0 - w) * va + w * vb
        elif va.ndim >= 2 and va.shape[0] == w.shape[0]:
            ww = w.reshape((w.shape[0],) + (1,) * (va.ndim - 1))
            out[k] = (1.0 - ww) * va + ww * vb
        else:
            ww = w.reshape(w.shape + (1,) * va.ndim)
            out[k] = (1.0 - ww) * va[None] + ww * vb[None]
    return out


@dataclasses.dataclass
class BasinResult:
    """Result of :func:`basins`.

    ``labels`` assigns each member an attractor index (``-1`` where the
    equilibration did not converge — those members are excluded from the
    clustering); ``centroids`` are the per-attractor mean ice areas in
    ascending order, ``counts`` the member count per attractor. ``areas``
    is every member's own diagnostic value, ``result`` the underlying
    lockstep :class:`EquilibriumResult` (full converged states in
    ``result.state``).
    """

    labels: np.ndarray
    areas: np.ndarray
    centroids: np.ndarray
    counts: np.ndarray
    season: str
    gap: float
    result: EquilibriumResult
    spacetime: SpaceTime
    par: Optional[Collection] = None

    @property
    def n_basins(self) -> int:
        """Number of distinct attractors among the converged members."""
        return len(self.centroids)

    @property
    def fractions(self) -> np.ndarray:
        """Converged-member fraction per attractor (basin sizes under
        the sampling measure of ``inits``)."""
        tot = int(self.counts.sum())
        return self.counts / max(tot, 1)

    def members(self, label: int) -> np.ndarray:
        """Indices of the members that landed in attractor ``label``."""
        return np.flatnonzero(self.labels == label)

    def __repr__(self):
        c = np.array2string(self.centroids, precision=3)
        bad = int(np.count_nonzero(self.labels < 0))
        extra = f", {bad} unconverged" if bad else ""
        return (f"BasinResult({self.n_basins} attractors, areas {c}, "
                f"counts {self.counts.tolist()}{extra})")


def _cluster_1d(values: np.ndarray, gap: float):
    """Gap-threshold clustering of a 1-D diagnostic: sorted values are
    split wherever consecutive members are more than ``gap`` apart.
    Returns (labels ascending by centroid, centroids, counts)."""
    order = np.argsort(values)
    labels = np.empty(len(values), dtype=np.int64)
    cluster = 0
    for i, idx in enumerate(order):
        if i and values[idx] - values[order[i - 1]] > gap:
            cluster += 1
        labels[idx] = cluster
    n = cluster + 1
    centroids = np.array([values[labels == c].mean() for c in range(n)])
    counts = np.array([int(np.count_nonzero(labels == c))
                       for c in range(n)])
    return labels, centroids, counts


_SEASONS = ("winter", "summer", "avg")


def _finite_members(res, K: int) -> np.ndarray:
    """Per-member all-finite flags of an equilibration's state. The ice-
    area diagnostic maps a diverged (NaN) state to area 0 (classic's
    ``E < 0`` indicator compares False, MIZ's ``nan_to_num`` zeroes
    ``phi``), so a NaN probe must never be CLASSIFIED off its area —
    it would deterministically read as the low-area attractor.

    Batchedness comes from the result itself (``member_years`` is set
    exactly for ensemble solves, and ensemble state leaves are fully
    K-batched), NOT from a shape heuristic — an unbatched leaf whose
    leading dim coincidentally equals K must not be misread per-member
    (review r2/r3; cf. the eval_shape-based exact detection in the
    statics specs)."""
    if getattr(res, "member_years", None) is None:
        # solo solve: one whole-state flag
        ok = all(bool(np.isfinite(np.asarray(v)).all())
                 for v in res.state.values())
        return np.full(K, ok)
    ok = np.ones(K, dtype=bool)
    for v in res.state.values():
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] == K:
            ok &= np.isfinite(arr.reshape(K, -1)).all(axis=1)
        else:  # defensively: a shared leaf poisons every member
            ok &= bool(np.isfinite(arr).all())
    return ok


def basins(
    model: str,
    st: SpaceTime,
    par: Collection,
    inits,
    forcing: Union[Forcing, float] = 0.0,
    season: str = "avg",
    gap: float = np.pi / 4,
    tol: float = 1e-2,
    max_years: int = 300,
    **equilibrate_kwargs,
) -> BasinResult:
    """Map which attractor each of K initial states falls to.

    ``inits`` is a member-batched state Collection (``(K, nx)`` leaves)
    or a sequence of unbatched states (stacked via :func:`stack_states`);
    :func:`blend_states` builds interpolation families. All K states
    equilibrate in ONE lockstep ensemble
    (:func:`~energybalancemodel_jl_tpu.equilibrium.equilibrate` — the
    fused whole-year kernel on TPU), then the converged members are
    clustered into attractors by seasonal ice area: sorted areas split
    wherever consecutive members are more than ``gap`` apart (default
    pi/4 — the classic warm/snowball separation is O(pi)). Distinct
    attractors closer than ``gap`` in ice area merge into one cluster —
    shrink ``gap`` or classify ``result.state`` directly if that
    matters. Unconverged members get label ``-1`` and are excluded.

    ``par`` may sweep a parameter across members as usual, but then the
    clustering mixes attractors of DIFFERENT systems — the typical use
    fixes ``par`` and varies only the initial states. Remaining keywords
    pass to ``equilibrate``. Returns a :class:`BasinResult`.
    """
    if season not in _SEASONS:
        raise ValueError(f"season must be one of {_SEASONS}, "
                         f"got {season!r}")
    if isinstance(inits, (list, tuple)):
        inits = stack_states(inits)
    par = Collection(par)
    result = equilibrate(model, st, forcing, par, inits, tol=tol,
                         max_years=max_years, **equilibrate_kwargs)
    areas = np.atleast_1d(np.asarray(
        seasonal_ice_area(getattr(result.seasonal, season), st),
        dtype=np.float64))
    K = areas.shape[0]
    # a non-finite state's area is a masking artifact, not a diagnostic:
    # exclude such members from the clustering like unconverged ones
    conv = (np.broadcast_to(np.atleast_1d(result.converged), (K,))
            & _finite_members(result, K))

    labels = np.full(K, -1, dtype=np.int64)
    if conv.any():
        sub, centroids, counts = _cluster_1d(areas[conv], float(gap))
        labels[conv] = sub
    else:
        centroids = np.empty(0)
        counts = np.empty(0, dtype=np.int64)
    return BasinResult(labels=labels, areas=areas, centroids=centroids,
                       counts=counts, season=season, gap=float(gap),
                       result=result, spacetime=st, par=par)


@dataclasses.dataclass
class EdgeResult:
    """Result of :func:`edge`.

    ``wa``/``wb`` are the final per-member bracket weights (the blend
    falls to ``a``'s attractor at ``wa``, to ``b``'s at ``wb``);
    ``values`` their midpoints — the basin-boundary crossing along the
    ``a → b`` line. ``history`` stacks ``(wa, wb)`` after each step,
    shape ``(steps, 2, K)``.

    A probe can fail two distinct ways, told apart by two per-step
    ``(steps, K)`` masks (review r2):

    - ``probe_finite`` False — the probe state went NON-FINITE. Its
      masked ice area is an artifact, so that step HELD the bracket
      (``in_a`` is meaningless there) and the next step re-probes at a
      nudged off-center weight to escape the diverging blend.
    - ``probe_converged`` False with ``probe_finite`` True — the probe
      ran out of ``max_years`` but its final state was finite; it WAS
      classified by ``in_a`` and the bracket MOVED. Near the boundary
      (critical slowing down, module docstring) this classification can
      be wrong — re-run/resume with a larger ``max_years``.

    ``ok`` flags members whose every probe converged. ``result_a``/
    ``result_b`` are the converged endpoint attractors, ``area_a``/
    ``area_b`` their diagnostics.
    """

    wa: np.ndarray
    wb: np.ndarray
    history: np.ndarray
    in_a: np.ndarray
    probe_converged: np.ndarray
    probe_finite: np.ndarray
    area_a: np.ndarray
    area_b: np.ndarray
    a: Collection
    b: Collection
    result_a: EquilibriumResult
    result_b: EquilibriumResult
    spacetime: SpaceTime
    season: str = "avg"
    par: Optional[Collection] = None

    @property
    def values(self) -> np.ndarray:
        """Per-member boundary-crossing estimates (bracket midpoints)."""
        return 0.5 * (self.wa + self.wb)

    @property
    def width(self) -> np.ndarray:
        """Final bracket widths ``|wb - wa|``."""
        return np.abs(self.wb - self.wa)

    @property
    def ok(self) -> np.ndarray:
        """True per member when every probe along its bisection
        converged."""
        return self.probe_converged.all(axis=0)

    def states(self) -> Collection:
        """The blended states AT the boundary estimates — initial
        conditions on (numerically, astride) the basin boundary, the
        starting point for edge-state (saddle) refinement."""
        return blend_states(self.a, self.b, self.values)

    def __repr__(self):
        v = np.array2string(self.values, precision=4)
        return (f"EdgeResult(w* = {v}, width {float(self.width.max()):.3g}, "
                f"{int(np.count_nonzero(self.ok))}/{len(self.wa)} members "
                f"fully converged)")


def edge(
    model: str,
    st: SpaceTime,
    par: Collection,
    a,
    b,
    forcing: Union[Forcing, float] = 0.0,
    steps: int = 15,
    season: str = "avg",
    jump_tol: float = np.pi / 2,
    tol: float = 1e-2,
    max_years: int = 300,
    progress: bool = False,
    checkpoint: Optional[str] = None,
    resume: bool = False,
    **equilibrate_kwargs,
) -> EdgeResult:
    """Bisect the basin boundary along the line between states ``a``
    and ``b``, per ensemble member.

    ``a`` and ``b`` are state Collections that must fall to DIFFERENT
    attractors (verified: both endpoint blends are equilibrated first,
    must fully converge, and their seasonal ice areas must separate by
    at least ``jump_tol`` for every member). The bisection then shrinks
    the bracket ``[wa, wb]`` (blend weights, starting from ``[0, 1]``)
    by ``2**-steps``: each probe equilibrates the blended state
    ``(1-w)*a + w*b`` and is classified to whichever endpoint attractor
    its ice area is nearer. Unlike :func:`~energybalancemodel_jl_tpu.
    fold.fold`, the references are STATIC — the two attractors are fixed
    (the parameter does not move), so the endpoint areas classify every
    probe.

    ``par`` leaves of shape ``(K,)`` (or the virtual forcing key
    ``"F"``) sweep a second parameter across members — each member then
    bisects its own boundary, in lockstep, against its own endpoint
    attractors; ``a``/``b`` may be shared (1-D leaves) or per-member
    (``(K, nx)`` leaves, :func:`blend_states` rules). All remaining
    keywords (``engine``/``mesh``/``anderson``/``dtype``/...) pass to
    ``equilibrate``. Returns an :class:`EdgeResult`; ``.states()``
    recovers the near-boundary blends for edge-state work.

    ``checkpoint=`` names a file that records the search after the
    endpoint stage and again after every completed bisection step
    (brackets, histories, the two converged endpoint attractors and
    their reference areas — atomic whole-file writes); ``resume=True``
    reloads it and replays only the remaining steps, bit-exactly
    identical to an uninterrupted run, never re-paying the endpoint
    solves. ``steps`` is deliberately EXCLUDED from the fingerprint, so
    a resume may extend the refinement; everything that changes a
    probe's outcome (model, grid, parameters, forcing, endpoint states,
    tolerances, equilibrate options) is covered, and a mismatch warns
    and restarts — the same contract as :func:`~energybalancemodel_jl_tpu.
    fold.fold`'s checkpoints.
    """
    if not isinstance(forcing, Forcing):
        forcing = Forcing(float(forcing))
    if not forcing.constant:
        raise ValueError("edge needs a constant base forcing")
    if steps < 1:
        raise ValueError("steps must be >= 1")
    if season not in _SEASONS:
        raise ValueError(f"season must be one of {_SEASONS}, "
                         f"got {season!r}")
    par = Collection(par)
    a, b = Collection(a), Collection(b)
    if set(a.keys()) != set(b.keys()):
        raise ValueError(
            f"endpoint states carry different variables: "
            f"{sorted(a.keys())} vs {sorted(b.keys())}")

    K = max(
        max((v.size for v in map(np.asarray, par.values())
             if v.ndim == 1), default=1),
        max((np.asarray(v).shape[0] for c in (a, b) for v in c.values()
             if np.asarray(v).ndim >= 2), default=1),
    )

    def solve(init):
        return equilibrate(model, st, forcing, par, init, tol=tol,
                           max_years=max_years, **equilibrate_kwargs)

    def area_of(res):
        v = seasonal_ice_area(getattr(res.seasonal, season), st)
        return np.broadcast_to(np.atleast_1d(v), (K,)).astype(np.float64)

    ckpt_key = None
    if checkpoint is not None or resume:
        if checkpoint is None:
            raise ValueError("resume=True needs checkpoint=<path>")
        from . import checkpoint as ckpt_mod

        # steps deliberately excluded: a resume may EXTEND the refinement
        ckpt_key = ckpt_mod.search_key(
            "edge", model, st, forcing, par, equilibrate_kwargs,
            extras=(f"a#{ckpt_mod.digest_collection(a)}",
                    f"b#{ckpt_mod.digest_collection(b)}",
                    f"jt={float(jump_tol)}", f"season={season}",
                    f"tol={float(tol)}", f"maxy={int(max_years)}"),
        )

    resumed = None
    if resume:
        from . import checkpoint as ckpt_mod

        resumed = ckpt_mod.try_resume_search(
            checkpoint, ckpt_key, "EdgeCheckpoint",
            ckpt_mod.read_edge_checkpoint)

    s_done = 0
    if resumed is not None:
        result_a, result_b = resumed["result_a"], resumed["result_b"]
        ref_a, ref_b = resumed["area_a"], resumed["area_b"]
        wa = np.asarray(resumed["wa"], dtype=np.float64)
        wb = np.asarray(resumed["wb"], dtype=np.float64)
        s_done = int(resumed["history"].shape[0])
        if s_done >= steps:  # already refined this far: report the slice
            h = resumed["history"][:steps]
            return EdgeResult(
                wa=h[-1, 0], wb=h[-1, 1], history=h,
                in_a=resumed["in_a"][:steps],
                probe_converged=resumed["conv"][:steps],
                probe_finite=resumed["finite"][:steps],
                area_a=ref_a, area_b=ref_b, a=a, b=b,
                result_a=result_a, result_b=result_b,
                spacetime=st, season=season, par=par)

    prog = None
    if progress:
        from .utils.progress import Progress

        if resumed is not None:
            total = steps - s_done
            first = f"resumed after step {s_done}"
        else:
            total = 2 + steps
            first = "equilibrating the a endpoint"
        prog = Progress(total, title="Edge", infofeed=lambda msg: msg)
        prog.update(0, feedargs=(first,))
    done = [0]

    def tick(msg):
        if prog is not None:
            done[0] += 1
            prog.update(done[0], feedargs=(msg,))

    if resumed is None:
        def endpoint(state, name):
            res = solve(state)
            conv = np.broadcast_to(np.atleast_1d(res.converged), (K,))
            if not conv.all():
                bad = np.flatnonzero(~conv)
                raise ValueError(
                    f"endpoint {name} did not converge for members "
                    f"{bad.tolist()} ({res!r}) — the attractor references "
                    f"must be trusted; raise max_years")
            return res

        result_a = endpoint(a, "a")
        tick("a endpoint converged")
        result_b = endpoint(b, "b")
        tick("b endpoint converged")
        ref_a, ref_b = area_of(result_a), area_of(result_b)
        close = np.flatnonzero(np.abs(ref_a - ref_b) < jump_tol)
        if close.size:
            raise ValueError(
                f"states a and b fall to attractors less than "
                f"jump_tol={jump_tol:g} apart in ice area for members "
                f"{close.tolist()} — same basin, or indistinguishable in "
                f"this diagnostic (try another season= or a smaller "
                f"jump_tol)")
        wa = np.zeros(K)
        wb = np.ones(K)

    history = np.empty((steps, 2, K))
    in_a_hist = np.empty((steps, K), dtype=bool)
    conv_hist = np.empty((steps, K), dtype=bool)
    finite_hist = np.empty((steps, K), dtype=bool)
    if s_done:
        history[:s_done] = resumed["history"]
        in_a_hist[:s_done] = resumed["in_a"]
        conv_hist[:s_done] = resumed["conv"]
        finite_hist[:s_done] = resumed["finite"]

    # trailing count of consecutive non-finite probes per member — drives
    # the off-center nudge below; recomputed from the finite history so a
    # resume replays the remaining steps bit-exactly (no extra file state)
    nonfin_streak = np.zeros(K, dtype=np.int64)
    for s in range(s_done):
        nonfin_streak = np.where(finite_hist[s], 0, nonfin_streak + 1)

    # probe weights as a bracket FRACTION: 0.5 normally; after a non-
    # finite probe the same midpoint would diverge identically forever
    # (deterministic solver), so the member's next probes step away from
    # center — any fraction in (0, 1) still shrinks its bracket
    _NUDGE = np.array([0.5, 0.45, 0.55, 0.4, 0.6, 0.35, 0.65, 0.3, 0.7])

    def write_ckpt(n):
        if ckpt_key is None:
            return
        from . import checkpoint as ckpt_mod

        ckpt_mod.write_edge_checkpoint(
            checkpoint, ckpt_key, result_a, result_b, ref_a, ref_b,
            wa, wb, history[:n], in_a_hist[:n], conv_hist[:n],
            finite_hist[:n])

    if resumed is None:
        # record the endpoint stage so an interruption in step 1 does
        # not repeat those solves on resume
        write_ckpt(0)

    for s in range(s_done, steps):
        frac = _NUDGE[np.minimum(nonfin_streak, len(_NUDGE) - 1)]
        mid = wa + frac * (wb - wa)
        probe = solve(blend_states(a, b, mid))
        area = area_of(probe)
        # a diverged (non-finite) probe carries no basin information —
        # its area reads 0 through the NaN masking and would always
        # classify as the low-area attractor; such members keep their
        # bracket this step and are flagged unconverged
        finite = _finite_members(probe, K)
        nonfin_streak = np.where(finite, 0, nonfin_streak + 1)
        in_a = np.abs(area - ref_a) <= np.abs(area - ref_b)
        wa = np.where(in_a & finite, mid, wa)
        wb = np.where(~in_a & finite, mid, wb)
        history[s, 0], history[s, 1] = wa, wb
        in_a_hist[s] = in_a
        finite_hist[s] = finite
        conv_hist[s] = (np.broadcast_to(
            np.atleast_1d(probe.converged), (K,)) & finite)
        write_ckpt(s + 1)
        tick(f"step {s + 1}/{steps}: max width "
             f"{float(np.abs(wb - wa).max()):.4g}")

    return EdgeResult(wa=wa, wb=wb, history=history, in_a=in_a_hist,
                      probe_converged=conv_hist, probe_finite=finite_hist,
                      area_a=ref_a, area_b=ref_b, a=a, b=b,
                      result_a=result_a, result_b=result_b, spacetime=st,
                      season=season, par=par)
