"""2-D mesh integration: ensemble members x grid decomposition.

Composes the two parallelism modes this framework scales with into one
``(k, x)`` device mesh (the scaling-book recipe — pick a mesh, annotate
shardings, let XLA insert the collectives):

- the **member axis** ``k`` is pure data parallelism: members are
  independent, so no collective ever crosses member rows;
- the **grid axis** ``x`` is domain decomposition: halo ``ppermute`` for
  the 3-point diffusion stencil and the distributed SPIKE tridiagonal
  solver (:mod:`..ops.spike`) inside the Newton iteration, exactly as in
  :func:`~energybalancemodel_jl_tpu.parallel.spatial.spatial_integrate`.

This covers the regime neither 1-D layout reaches: ensembles of runs whose
grids are individually too large for one device (nx >> 1e4 bifurcation
scans). The physics code is untouched — the batch-native steps are
shape-polymorphic over the leading member axis, and the local shard code is
shared with the 1-D spatial path (``_make_spatial_year_fn(k_axis=...)``).

Parity: a ``(2, 4)``-mesh run equals the unsharded batch-native ensemble to
~1e-11 (tests/test_grid2d.py; the SPIKE interface solve reorders a few
reductions, same bound as the 1-D spatial path).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..forcing import Forcing
from ..integrate import default_dtype
from ..models.base import default_step_config, get_model
from ..solutions import Seasonal
from ..spacetime import SpaceTime
from ..utils.collection import Collection
from ..utils.progress import Progress
from .ensemble import (
    TABLE_PARAMS,
    EnsembleSolutions,
    _augment_batched,
    _check_raw_all_budget,
)
from .spatial import _make_spatial_year_fn

__all__ = ["ensemble_spatial_integrate", "grid2d_mesh"]


def grid2d_mesh(nk: Optional[int] = None, ndx: Optional[int] = None,
                k_axis: str = "k", axis: str = "x") -> Mesh:
    """``(nk, ndx)`` device mesh: member rows x grid columns. Defaults split
    the available devices into two member rows."""
    devs = jax.devices()
    if nk is None and ndx is None:
        nk = 2 if len(devs) % 2 == 0 and len(devs) > 1 else 1
    if nk is None:
        nk = len(devs) // ndx
    if ndx is None:
        ndx = len(devs) // nk
    n = nk * ndx
    if n > len(devs):
        raise ValueError(f"mesh {nk}x{ndx} needs {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(nk, ndx), (k_axis, axis))


def _stat_specs_2d(spec, st, par_j: Collection, stat: Collection, dtype,
                   nx: int, k_axis: str, axis: str) -> Collection:
    """Partition specs for the statics Collection, with EXACT member-batch
    detection: a leaf is member-sharded iff batching the parameters changed
    its shape vs the statics of an unbatched (scalar) parameter set
    (abstract ``jax.eval_shape``, no compute). Shape heuristics misfire
    whenever ``K`` collides with another statics dimension — reproduced at
    ``K == nt``, where the insolation table was split across member rows
    (review r3). Unbatched leaves shard only their trailing grid axis."""
    par_scalar = Collection({
        k: (v.reshape(-1)[0] if jnp.ndim(v) else v) for k, v in par_j.items()
    })
    ref = jax.eval_shape(lambda p: spec.statics(st, p, dtype), par_scalar)

    def one(b_shape, u_shape):
        ndim = len(b_shape)
        if ndim == 0:
            return P()
        first = k_axis if tuple(b_shape) != tuple(u_shape) else None
        last = axis if b_shape[-1] == nx else None
        if ndim == 1:
            return P(first or last)
        return P(first, *([None] * (ndim - 2)), last)

    return Collection({
        k: one(jnp.shape(stat[k]), ref[k].shape) for k in stat
    })


def _par_specs_2d(par_j: Collection, k_axis: str) -> Collection:
    """Partition specs for the (augmented) parameter Collection: swept
    leaves are exactly the ``(K, 1)`` columns ``_augment_batched`` produced;
    scalars replicate."""
    return Collection({
        k: (P(k_axis, None) if jnp.ndim(v) else P())
        for k, v in par_j.items()
    })


def ensemble_spatial_integrate(
    model: str,
    st: SpaceTime,
    forcing: Forcing,
    par: Collection,
    init: Collection,
    mesh: Optional[Mesh] = None,
    k_axis: str = "k",
    axis: str = "x",
    n_members: Optional[int] = None,
    raw_mode: str = "none",
    raw_memory_limit: int = 2 * 2**30,
    dtype=None,
    verbose: bool = False,
    newton_max_iter: int = 30,
    progress: Optional[bool] = None,
    checkpoint: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> EnsembleSolutions:
    """Integrate a parameter ensemble with members AND the grid sharded over
    a 2-D mesh.

    ``par`` leaves of shape ``(K,)`` sweep across members, including the
    virtual forcing-offset key ``"F"`` (realized as per-member forcing
    rows, as in ``ensemble_integrate``); insolation-table parameters
    cannot be swept here — their statics would materialize a per-member
    table. ``init`` leaves ``(nx,)`` are shared, ``(K, nx)`` per-member. ``K`` must divide over the mesh's member rows and ``nx``
    over its grid columns. Driver semantics (``raw_mode``, ``verbose``
    Newton warnings, progress, per-year checkpoint/resume) match
    :func:`~energybalancemodel_jl_tpu.parallel.ensemble.ensemble_integrate`;
    the checkpoint key includes the mesh shape (SPIKE partitioning compiles
    a different graph per device count).
    """
    spec = get_model(model)
    if mesh is None:
        mesh = grid2d_mesh(k_axis=k_axis, axis=axis)
    nk = mesh.shape[k_axis]
    ndx = mesh.shape[axis]
    if st.nx % ndx != 0:
        raise ValueError(f"nx={st.nx} must divide evenly over {ndx} grid columns")
    if raw_mode not in ("none", "last", "all"):
        raise ValueError(
            f"raw_mode must be 'none'|'last'|'all', got {raw_mode!r}"
        )
    if dtype is None:
        dtype = default_dtype()
    dtype = jnp.dtype(dtype)

    par = Collection(par)
    K = par.pop("__K__", None) or n_members
    if K is None:
        sizes = {np.shape(v)[0] for v in par.values() if np.ndim(v) > 0}
        sizes |= {np.shape(v)[0] for v in init.values() if np.ndim(v) > 1}
        if len(sizes) != 1:
            raise ValueError("Cannot infer ensemble size; pass n_members")
        K = sizes.pop()
    K = int(K)
    if K % nk != 0:
        raise ValueError(f"K={K} must divide evenly over {nk} member rows")
    swept_tables = [k for k, v in par.items()
                    if k in TABLE_PARAMS and np.ndim(v) > 0]
    if swept_tables:
        raise ValueError(
            f"cannot sweep insolation-table parameters {swept_tables} on the "
            "2-D mesh (per-member statics tables); use ensemble_integrate"
        )
    if raw_mode == "all":
        _check_raw_all_budget(K, st, len(spec.solution_vars),
                              jnp.dtype(dtype).itemsize, raw_memory_limit)
    par_user = Collection(par)
    # virtual sweep parameter "F": a per-member constant forcing offset (the
    # WE15 bifurcation axis) — no model reads par["F"], so it must become
    # per-member forcing-table rows, exactly as in ensemble_integrate
    F_off = par.pop("F", None)
    if F_off is not None and np.ndim(F_off) == 0:
        F_off = np.full((K,), float(F_off))

    cfg = default_step_config(
        dtype.name, newton_max_iter=newton_max_iter, verbose=verbose,
        spatial_axis=axis, batch_axis=k_axis,
    )
    par_j = _augment_batched(
        Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    )
    stat = jax.jit(lambda p: spec.statics(st, p, dtype))(par_j)
    sspecs = _stat_specs_2d(spec, st, par_j, stat, dtype, st.nx, k_axis, axis)
    pspecs = _par_specs_2d(par_j, k_axis)
    f_spec = None if F_off is None else P(None, k_axis, None)
    run_seasonal = _make_spatial_year_fn(
        spec, st, cfg, dtype, False, mesh, axis, sspecs, k_axis, pspecs,
        f_spec,
    )
    run_full = _make_spatial_year_fn(
        spec, st, cfg, dtype, True, mesh, axis, sspecs, k_axis, pspecs,
        f_spec,
    )

    carry = spec.init_carry(init, st, dtype)
    carry = Collection({
        k: (v if jnp.ndim(v) > 1 else jnp.broadcast_to(v, (K,) + v.shape))
        for k, v in carry.items()
    })
    f_tab = forcing.table(st)  # (dur, nt)
    if F_off is not None:
        # per-member rows, time leading with a trailing broadcast axis so
        # each step's forcing is a (K, 1) column against (K, nx) state
        f_tab = f_tab[:, :, None, None] + np.asarray(F_off)[None, None, :, None]

    raw_chunks = []
    start_year = 0
    winter_acc, summer_acc, avg_acc = [], [], []
    ckpt_key = ""
    if checkpoint is not None:
        from .. import checkpoint as ckpt_mod

        ckpt_key = ckpt_mod.config_key(
            f"grid2d{nk}x{ndx}", spec.name, st, forcing, par_user, dtype.name,
            "pcr", newton_max_iter, (f"K={K}",),
        )
        carry, start_year, winter_acc, summer_acc, avg_acc = (
            ckpt_mod.resume_state(
                checkpoint, ckpt_key, resume, raw_mode, st.dur,
                lambda v: jnp.asarray(v, dtype=dtype), carry,
            )
        )
        _ckpt_write = ckpt_mod.year_writer(
            checkpoint, ckpt_key,
            lambda: (carry, (winter_acc, summer_acc, avg_acc)),
        )

    if progress is None:
        progress = True
    prog = Progress(
        st.dur,
        "Integrating ensemble (2-D mesh)",
        infofeed=lambda yy: f"year {int(yy)}/{st.dur}, {K} members x {ndx} shards",
    ) if progress else None
    if prog is not None and start_year:
        prog.update(start_year, feedargs=(start_year,))

    import warnings as _warnings

    for y in range(start_year, st.dur):
        collect = raw_mode == "all" or (raw_mode == "last" and y == st.dur - 1)
        fn = run_full if collect else run_seasonal
        carry, seasonal, conv, ys = fn(carry, par_j, f_tab[y], stat)
        winter_acc.append(seasonal.winter)
        summer_acc.append(seasonal.summer)
        avg_acc.append(seasonal.avg)
        if collect:
            raw_chunks.append(ys)
        if verbose:
            if not np.asarray(conv).all():
                _warnings.warn(f"Solving for T0 failed in year {y + 1}.")
        if checkpoint is not None and (
            (y + 1) % max(checkpoint_every, 1) == 0 or y == st.dur - 1
        ):
            _ckpt_write(y + 1)
        if prog is not None:
            prog.update(y + 1, feedargs=(y + 1,))

    varnames = list(spec.solution_vars)
    raw_chunks, winter_acc, summer_acc, avg_acc = jax.device_get(
        (raw_chunks, winter_acc, summer_acc, avg_acc)
    )
    raw = None
    if raw_chunks:
        # per-year blocks are (nt, K, nx): concatenate time, members first
        raw = Collection({
            k: np.swapaxes(
                np.concatenate([np.asarray(c[k]) for c in raw_chunks], axis=0),
                0, 1,
            )
            for k in varnames
        })

    def stack(acc):
        # per-year leaves are (K, nx): member-leading (K, dur, nx)
        return Collection(
            {k: np.stack([np.asarray(c[k]) for c in acc], axis=1)
             for k in varnames}
        )

    return EnsembleSolutions(
        spacetime=st,
        forcing=forcing,
        parameters=par_user,
        n_members=K,
        seasonal=Seasonal(stack(winter_acc), stack(summer_acc), stack(avg_acc)),
        raw=raw,
    )
