"""Pallas TPU kernel: fused whole-year MIZ integration.

The batch-native hot loop (BENCH_NOTES.md) still pays per-step HBM traffic:
every ``lax.scan`` step reads and writes the ``(K, nx)`` carry plus ten
seasonal accumulators between fused XLA kernels. At nx = 180 the entire
working set of a 128-member block — prognostic state, Newton warm start,
seasonal accumulators — fits in VMEM with room to spare (the insolation
is separable, so both layouts rebuild each step's row from static
rows/columns and a cosine scalar, bitwise-identically to the statics
table — no ``(nt, nx)`` table is ever resident, which is what lets the
'kx' layout reach nx in the thousands for single runs). This kernel therefore runs the *whole year*
(``nt`` physics steps, each with its warm-started adaptive Newton solve and
PCR tridiagonal solves) in one launch per block: HBM sees one read of the
carry and one write of the carry + seasonal storage per simulated year.

The physics is not re-implemented: the kernel body calls
:func:`..models.miz.step` — the exact function the XLA path scans — on
VMEM-resident values. Per-step semantics (update order, masking, Newton
tolerances; reference /root/reference/src/miz.jl:150-196) are shared by
construction; only the iteration *grouping* of the adaptive Newton loop
differs (the while-loop convergence test reduces over a K-block instead of
the full batch), which perturbs converged iterates below the solve tolerance
only.

Storage semantics mirror the seasonal-only ``make_year_fn`` mode
(annual sums accumulated per step, winter/summer snapshots at the tick
indices, reference ``savesol!`` /root/reference/src/infrastructure.jl:549-589).

Layout: members on sublanes, grid cells on lanes, ``nx`` padded to a lane
multiple with benign decoupled columns (zero stencil bands), ``K`` padded to
the block size with zero-state members.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solutions import Seasonal
from ..utils.collection import Collection
from .pallas_newton import default_interpret, pad_to_lanes


def _time_unroll(nt: int) -> int:
    """Unroll factor of the classic kernels' in-kernel time loop.

    The classic step is ~6x lighter than a MIZ step, so per-iteration loop
    overhead (bookkeeping, scalar addressing) weighs proportionally more;
    manual unrolling recovers it. Measured on-chip (3 interleaved cycles,
    K=8192, canonical grid, BENCH_NOTES "Classic kernel"): unroll 8 is
    +8.8% over 1 (292 -> 268 ms/yr) with BITWISE-identical trajectories
    (same arithmetic, same order — only the loop carries fewer trips);
    first-compile grows ~7 s -> ~25 s, cached thereafter. Default: the
    largest power of two <= 8 dividing nt (1 for odd nt). Env override
    EBM_TIME_UNROLL for experiments (must divide nt to take effect).
    MIZ keeps unroll 1: its body (Newton while_loop included) dwarfs the
    loop overhead and code-bloats the compile for <1%."""
    import os

    env = os.environ.get("EBM_TIME_UNROLL")
    if env is not None:
        u = max(1, int(env))
        return u if nt % u == 0 else 1
    u = 8
    while u > 1 and nt % u:
        u //= 2
    return u


def _time_loop(nt: int, body, carry0):
    """fori_loop over the nt physics steps, manually unrolled by
    :func:`_time_unroll` (Mosaic's fori lowering only supports unroll=1 or
    full unrolling; a step-exact manual unroll keeps the same arithmetic
    in the same order)."""
    u = _time_unroll(nt)
    if u > 1:
        def body_u(i, carry):
            t = i * u
            for j in range(u):
                carry = body(t + j, carry)
            return carry

        return jax.lax.fori_loop(0, nt // u, body_u, carry0)
    return jax.lax.fori_loop(0, nt, body, carry0)

__all__ = ["pallas_miz_year", "pallas_classic_year", "default_interpret"]

# scan-carry fields of the MIZ model (models/miz.py init_carry)
CARRY_KEYS = ("Ei", "Ew", "h", "D", "phi", "T0")
# recorded solution variables, in ModelSpec order
OUT_VARS = ("E", "T", "h", "Ei", "Ew", "Ti", "Tw", "D", "phi", "n")
# physical parameters the step function reads. All ride in VMEM as
# per-member (Kt, 1) columns, so ANY of them may be (K,)-swept across the
# ensemble (scalars are broadcast) — same sweep surface as the batch-native
# engine. The last entry is the statics-derived Tm^m2, hoisted out of the
# step so the kernel needs no float power (Mosaic cannot lower powf).
PAR_NAMES = (
    "k", "Tm", "A", "B", "ai", "Fb", "cw", "m1",
    "Lf", "alpha", "rl", "Dmin", "Dmax", "hmin", "kappa", "D",
)
_TM_POW = len(PAR_NAMES)
# one more per-member lane: a constant forcing offset (the virtual "F"
# sweep — per-member time-VARYING forcing would need a dynamic lane slice,
# which Mosaic cannot lower; constant offsets cover the WE15 F-bifurcation)
_F_OFF = len(PAR_NAMES) + 1
N_PAR = len(PAR_NAMES) + 2
# parameters shaping the insolation/coalbedo tables. Both layouts rebuild
# the (separable) insolation in-kernel; 'kx' shares ONE rebuild across the
# member block (scalar S0/S1/S2 in SMEM; aw stays a precomputed static
# row), so these must be scalar there, while the transposed 'xk' rebuilds
# insolation AND coalbedo from per-member rows, so ALL are sweepable.
TABLE_PARAMS = frozenset({"S0", "S1", "S2", "a0", "a2"})
# extra per-member parameter rows of the 'xk' kernels, after PAR_NAMES
XK_TABLE_ROWS = ("S0", "S1", "S2", "a0", "a2")
# in-kernel-OU parameter rows (MIZ 'xk' ou mode): appended after the table
# rows — OU decay rho (broadcast scalar), per-member noise scale, and the
# year-start eta
_XK_OU_RHO = N_PAR + len(XK_TABLE_ROWS)
_XK_OU_SCALE = _XK_OU_RHO + 1
_XK_OU_ETA0 = _XK_OU_RHO + 2

# Largest padded member count per pallas_call. The whole-year kernel's
# scoped-VMEM demand (~16.2 MB) exceeds XLA's conservative 16 MB
# compile-time default, so the launches pass an explicit
# vmem_limit_bytes=32 MB (validated on-chip at Kp = 16384: compiles AND
# runs; without it, whether a launch fits is schedule-dependent — 16384
# always failed AOT compilation, 8192 failed inside some surrounding
# graphs). Slabs of 4096 are kept as belt-and-braces: the
# continuously-exercised envelope, marginally faster at 16384 than one
# giant launch, and identical checksums (members are independent, the
# split is semantics-free).
MAX_LAUNCH_K = 4096


def _member_slabs(Kp: int, Kt: int):
    """Split ``Kp`` padded members into launch slabs of at most
    ``MAX_LAUNCH_K`` (rounded down to a whole number of ``Kt`` blocks)."""
    slab = max((MAX_LAUNCH_K // Kt) * Kt, Kt)
    return [(s, min(slab, Kp - s)) for s in range(0, Kp, slab)]


def _pad_noise_xk(noise, nt: int, K: int, Kp: int, dtype):
    """Validate and pad an ``(nt, K)`` noise table to ``(nt_pad8, Kp)`` for
    the 'xk' launchers (zero padding: padded steps are never read, padded
    members see zero noise on top of their zero state + edge params).
    In the in-kernel-OU mode the table is WHITE noise; padded members'
    zero draws combine with their ZERO-padded scale/eta0 parameter rows
    (:func:`_zero_pad_ou_rows`) so their eta stays exactly 0."""
    if noise is None:
        return None
    noise = jnp.asarray(noise, dtype=dtype)
    if noise.shape != (nt, K):
        raise ValueError(
            f"noise must have shape (nt, K) = ({nt}, {K}), got "
            f"{noise.shape}")
    return jnp.pad(noise, ((0, _round_up(nt, 8) - nt), (0, Kp - K)))


def _zero_pad_ou_rows(pars_t, K: int, scale_row: int, eta0_row: int):
    """Zero the OU scale/eta0 parameter rows on padded member lanes
    (columns ``K:``) of an edge-padded ``(n_rows, Kp)`` stack — padded
    lanes then hold eta == 0 exactly for the whole year (rho may stay
    edge-padded: it only ever multiplies that zero)."""
    lane = jnp.arange(pars_t.shape[1]) < K
    for row in (scale_row, eta0_row):
        pars_t = pars_t.at[row].set(
            jnp.where(lane, pars_t[row], jnp.zeros((), pars_t.dtype)))
    return pars_t


def _pad_keys_xk(noise_keys, K: int, Kp: int):
    """Validate and pad a ``(K, 2)`` uint32 key-data table to ``(2, Kp)``
    (keys on sublane rows, members on lanes) for the generating 'xk'
    launchers. Padded lanes replicate the last member's key — their draws
    are generated but multiply the ZERO-padded OU scale
    (:func:`_zero_pad_ou_rows`), so padded-lane forcing stays exactly
    deterministic; this is why keys mode REQUIRES noise_ou
    (:func:`_validate_noise_args`)."""
    if noise_keys is None:
        return None
    noise_keys = jnp.asarray(noise_keys)
    if noise_keys.dtype != jnp.uint32 or noise_keys.shape != (K, 2):
        raise ValueError(
            f"noise_keys must be a ({K}, 2) uint32 key-data array, got "
            f"{noise_keys.dtype} {noise_keys.shape}")
    return jnp.pad(noise_keys, ((0, Kp - K), (0, 0)), mode="edge").T


def _trapezoid_weights(x, nx: int, nxs: int, dtype):
    """Per-cell quadrature weights w with ``sum_i w_i v_i ==``
    the trapezoid integral ``sum_i (v_i + v_{i+1})(x_{i+1} - x_i)/2``
    (utils.numerics.hemispheric_mean) up to summation-order round-off:
    ``w_0 = dx_0/2, w_i = (dx_{i-1} + dx_i)/2, w_{nx-1} = dx_{nx-2}/2``;
    padded rows 0. Lets the 'xk' kernels reduce a (nxs, Kt) field to a
    per-member scalar row in one weighted sublane sum (the in-kernel
    crossing detector)."""
    x = np.asarray(x, dtype=np.float64)
    dx = np.diff(x)
    w = np.zeros(nxs, dtype=np.float64)
    w[0] = dx[0] / 2.0
    w[1:nx - 1] = (dx[:-1] + dx[1:]) / 2.0
    w[nx - 1] = dx[-1] / 2.0
    return jnp.asarray(w, dtype)


def _validate_noise_args(dtype, noise, noise_ou, noise_keys, ou_assoc):
    """Shared argument validation of the noise-mode kwargs (miz and
    classic whole-year entry points)."""
    if noise is not None and noise_keys is not None:
        raise ValueError(
            "noise= (explicit table) and noise_keys= (in-kernel "
            "generation) are mutually exclusive")
    if noise_keys is not None and jnp.dtype(dtype) != jnp.float32:
        raise ValueError(
            "noise_keys generates float32 draws (the jax.random.normal "
            "f32 pipeline); run the ensemble in float32 or pass an "
            "explicit noise= table")
    if noise_ou is not None and noise is None and noise_keys is None:
        raise ValueError(
            "noise_ou requires the white-noise table (noise=) or "
            "in-kernel generation keys (noise_keys=)")
    if noise_keys is not None and noise_ou is None:
        # no plain-gen mode: padded lanes replicate the last member's
        # KEYS, so their generated draws are nonzero white noise with
        # nothing to neutralize it (in OU mode the zero-padded scale
        # keeps padded-lane eta exactly 0) — fictitious-lane dynamics
        # would feed the MIZ block-min Newton flag (review r5). Plain
        # white-noise offsets take the explicit zero-padded noise= table.
        raise ValueError(
            "noise_keys= requires noise_ou= (the zero-padded OU scale is "
            "what keeps fictitious padded lanes deterministic); for "
            "plain white-noise offsets pass an explicit noise= table")
    if ou_assoc and (noise_ou is None or noise_keys is None):
        raise ValueError(
            "ou_assoc=True precomputes the OU path over the generated "
            "scratch — it requires noise_keys= and noise_ou=")


def _validate_crossing_args(crossing, noise_keys, noise_ou):
    if crossing is None:
        return
    if noise_keys is None or noise_ou is None:
        raise ValueError(
            "crossing= (in-kernel first-crossing detection) is only "
            "wired through the generating OU kernels; it requires "
            "noise_keys= and noise_ou=")
    if len(crossing) != 2:
        raise ValueError("crossing must be (threshold, sign) per-member "
                         "rows")


# Trace-time probe switch for the per-step noise-row ACCESS PATTERN —
# measurement instrumentation only (scripts/probe_noise_read.py; round-5
# BENCH_NOTES "Noisy-path cost anatomy, corrected"). None = production
# dynamic sublane slice noise_ref[pl.ds(t, 1), :]; 'static0' = static row
# 0 (isolates the dynamism of the slice); 'mod8' = dynamic slice within
# the first tile (isolates buffer-height dependence). NEVER set outside
# probes: non-None modes read wrong weather by design.
_NOISE_READ_PROBE = None


def _noise_row(noise_ref, t):
    """Per-step noise row read (see ``_NOISE_READ_PROBE``)."""
    if _NOISE_READ_PROBE == "static0":
        return noise_ref[0:1, :]
    if _NOISE_READ_PROBE == "mod8":
        return noise_ref[pl.ds(t % 8, 1), :]
    return noise_ref[pl.ds(t, 1), :]


# row-chunk height of the in-kernel draw generation sweep: bounds the
# transient uint32 intermediates to ~6 x (chunk, Kt) words (~3 MB at 1024)
# regardless of nt, so high-nt configs cannot blow the scoped-VMEM budget
# during the pre-loop fill
_GEN_CHUNK = 1024


def _u32_const(v: int):
    import numpy as _np

    return _np.uint32(v)


def _gen_noise_xk(noise_ref, keys_ref, nt_pad: int):
    """Fill the ``(nt_pad, Kt)`` noise scratch with the member-keyed
    white draws, bitwise ``jax.random.normal(key_k, (nt,), f32)``.

    Row ``t`` of lane ``k`` is draw ``t`` of the stream keyed by
    ``keys_ref[:, k]`` — the partitionable-threefry layout (counter words
    ``(0, t)``, output ``o0 ^ o1``; ops/prng.py). Rows at or beyond the
    true ``nt`` hold well-defined never-read values. The fill runs in
    ``_GEN_CHUNK``-row chunks to bound transient VMEM — as a STATIC
    (unrolled) chunk loop with static row offsets: a ``fori_loop`` body
    is a different fusion context whose FMA-contraction decisions drift
    from the XLA oracle graph's by 1-2 ulp (measured in interpret mode),
    which would break the bitwise-``jax.random.normal`` contract."""
    from . import prng

    Kt = noise_ref.shape[1]
    k1 = keys_ref[0:1, :]  # (1, Kt) uint32, broadcast down the chunk
    k2 = keys_ref[1:2, :]
    chunk = min(nt_pad, _GEN_CHUNK)
    for t0 in range(0, nt_pad, chunk):
        h = min(chunk, nt_pad - t0)  # ceil-div tail: EVERY row is filled
        t_rel = lax.broadcasted_iota(jnp.uint32, (h, Kt), 0)
        zero = jnp.zeros((h, Kt), jnp.uint32)
        o0, o1 = prng.threefry2x32(k1, k2, zero, t_rel + _u32_const(t0))
        noise_ref[t0:t0 + h, :] = prng.normal_from_bits(o0 ^ o1)


def _assoc_ou_path(noise_ref, rho, scale, eta0, nt_pad: int):
    """Transform the white-noise scratch into the OU path in-place via a
    log-depth Hillis–Steele scan over the time (sublane) axis.

    Computes ``eta_t = rho^{t+1} eta0 + sum_{j<=t} rho^{t-j} scale xi_j``
    — the same recurrence the serial in-loop mode evaluates, but as a
    tree reduction: ~ceil(log2 nt) full-tile passes instead of an
    ``nt``-step serial chain. (Round-5 measurement, BENCH_NOTES "phases
    3-7": the serial chain is FREE on-chip — this mode exists as an
    engine option, not a speedup.) The tree regrouping rounds differently from the
    serial chain at ~1 ulp per term — `ou_impl='assoc'` is therefore an
    ENGINE-PARITY-level twin of the serial mode, not a bitwise one;
    ``scale = 0`` + ``eta0 = 0`` still yields eta == 0.0 exactly (every
    term is an exact zero product). ``rho``/``scale``/``eta0`` are
    ``(1, Kt)`` per-member rows.

    The down-shift is a static-slice concatenation (zero/one identity
    fill), which Mosaic lowers as sublane shifts and interpret mode runs
    natively — no dynamic indexing, no mask selects."""
    Kt = noise_ref.shape[1]
    # weather increments w_t = scale * xi_t
    y = scale * noise_ref[...]
    # p_t accumulates rho^{t+1} for the eta0 relaxation term
    p = jnp.broadcast_to(rho, (nt_pad, Kt))
    r_d = rho  # rho^d, advanced by squaring: exact power-of-two exponents
    d = 1
    while d < nt_pad:
        y = y + r_d * jnp.concatenate(
            [jnp.zeros((d, Kt), y.dtype), y[:-d]], axis=0)
        p = p * jnp.concatenate(
            [jnp.ones((d, Kt), p.dtype), p[:-d]], axis=0)
        r_d = r_d * r_d
        d *= 2
    noise_ref[...] = y + p * eta0


def _kernel(
    f_ref,      # SMEM (nt,) shared forcing (per-member offsets ride in pars)
    cosv_ref,   # SMEM (nt,) cos(2 pi t) — with separable=True the kernel
                # rebuilds each step's insolation row from three static lane
                # rows and this scalar ((S0 - (S1 x) cos) - S2 x^2), instead
                # of reading a VMEM-resident (nt, nxp) table. On TPU the
                # rebuild equals the statics table bitwise (verified on-chip
                # via cross-layout checksums); on XLA:CPU the two jit graphs
                # contract FMAs differently (~1 ulp), so table mode stays
                # the default whenever the table fits — separable mode is
                # what lifts the nt*nx ~ 8 MB cap for high-resolution runs
                # (round 3)
    tabs_ref,   # SMEM (3,): the scalar S0, S1, S2 ('kx' shares one
                # insolation — sweeping them still needs 'xk')
    insol_ref,  # VMEM (nt, nxp) insolation table (separable=False) or a
                # (1, nxp) dummy (separable=True — not read)
    cin_ref,    # VMEM (6, Kt, nxp) carry in
    rows_ref,   # VMEM (7, nxp): aw, glo, gdi, gup, pad mask, x, x^2
    pars_ref,   # VMEM (Kt, N_PAR) per-member parameters (one per lane)
    cout_ref,   # VMEM (6, Kt, nxp) carry out
    wint_ref,   # VMEM (10, Kt, nxp) winter snapshot
    summ_ref,   # VMEM (10, Kt, nxp) summer snapshot
    avg_ref,    # VMEM (10, Kt, nxp) annual mean
    conv_ref,   # SMEM (1, n_blocks) convergence flags, full-array block
                # revisited by every grid step (each writes slot
                # [0, program_id]). One scalar per block in SMEM, NOT a
                # per-member VMEM column: a (Kp, 1) VMEM output tiles to
                # T(8,128) = 512 B/member and XLA places custom-call results
                # in VMEM — 4 MB at Kp = 8192, which is exactly what used to
                # overflow the 16 MB scoped-VMEM budget on large launches.
    *, nt: int, w0: int, s0: int, dt: float, cfg, separable: bool,
):
    from ..models import miz

    dtype = cin_ref.dtype
    Kt, nxp = cin_ref.shape[1], cin_ref.shape[2]

    # (Kt, 1) columns broadcast against (Kt, nxp) state exactly like the
    # batch-native engine's (K, 1)-augmented parameter leaves
    par = Collection(
        {n: pars_ref[:, i:i + 1] for i, n in enumerate(PAR_NAMES)}
    )
    stat = Collection(
        aw=rows_ref[0:1],
        glo=rows_ref[1:2],
        gdi=rows_ref[2:3],
        gup=rows_ref[3:4],
        dt=dt,
        Tm_pow_m2=pars_ref[:, _TM_POW:_TM_POW + 1],
    )
    mask = rows_ref[4:5]   # 1 on real grid lanes, 0 on lane padding
    rowX = rows_ref[5:6]   # x
    rowX2 = rows_ref[6:7]  # x^2
    carry0 = Collection({k: cin_ref[j] for j, k in enumerate(CARRY_KEYS)})
    # annual sums accumulate in the output ref itself (read-modify-write per
    # step) rather than in the loop carry — saves 10 (Kt, nxp) buffers of
    # scoped VMEM, which is what lets a 128-row block fit
    for i in range(len(OUT_VARS)):
        avg_ref[i] = jnp.zeros((Kt, nxp), dtype)

    def body(t, state):
        carry, conv = state
        if separable:
            c = cosv_ref[t]
            # same products, same evaluation order as the statics table
            # build ((S0 - (S1 x) cos) - S2 x^2): real lanes S0*1.0 == S0
            # exactly, padded lanes 0 - 0 - 0 = the table's pad zeros
            insol = ((tabs_ref[0] * mask - (tabs_ref[1] * rowX) * c)
                     - tabs_ref[2] * rowX2)
        else:
            insol = insol_ref[pl.ds(t, 1), :]
        f_t = f_ref[t] + pars_ref[:, _F_OFF:_F_OFF + 1]
        xs = Collection(insol=insol, f=f_t)
        carry, out = miz.step(carry, xs, stat, par, cfg)
        out = dict(out)
        conv = jnp.minimum(conv, out.pop("newton_converged"))
        for i, k in enumerate(OUT_VARS):
            avg_ref[i] = avg_ref[i] + out[k]

        @pl.when(t == w0)
        def _():
            for i, k in enumerate(OUT_VARS):
                wint_ref[i] = out[k]

        @pl.when(t == s0)
        def _():
            for i, k in enumerate(OUT_VARS):
                summ_ref[i] = out[k]

        return carry, conv

    carry, conv = jax.lax.fori_loop(
        0, nt, body, (carry0, jnp.ones((), dtype))
    )
    for j, k in enumerate(CARRY_KEYS):
        cout_ref[j] = carry[k]
    for i in range(len(OUT_VARS)):
        # same `sum / nt` arithmetic as the XLA seasonal storage path
        avg_ref[i] = avg_ref[i] / jnp.asarray(float(nt), dtype)
    conv_ref[0, pl.program_id(0)] = conv


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel_xk(
    f_ref,      # SMEM (nt,) shared forcing (per-member offsets ride in pars)
    cosv_ref,   # SMEM (nt,) cos(2 pi t) — the insolation table is separable
                # (S0 - (S1 x) cos - S2 x^2), so instead of a VMEM-resident
                # (nt, nx) table the kernel rebuilds each step's column from
                # two static columns and this scalar, bitwise-identically
    cin_ref,    # VMEM (6, nxs, Kt) carry in — GRID ON SUBLANES, MEMBERS ON
                # LANES: nx = 180 pads to 184 sublane rows (2% waste) instead
                # of 256 lanes (30% waste), and a 128-member block fills the
                # lane dimension exactly
    cols_ref,   # VMEM (nxs, 8): pad mask, x, x^2, glo, gdi, gup, 0, 0
    pars_ref,   # VMEM (N_PAR + 5, Kt) per-member parameters (one per row;
                # the last 5 are XK_TABLE_ROWS — swept insolation/coalbedo
                # parameters, impossible in the 'kx' shared-table layout)
    cout_ref,   # VMEM (6, nxs, Kt) carry out
    wint_ref,   # VMEM (10, nxs, Kt) winter snapshot
    summ_ref,   # VMEM (10, nxs, Kt) summer snapshot
    avg_ref,    # VMEM (10, nxs, Kt) annual mean
    conv_ref,   # SMEM (1, n_blocks) convergence flags (see _kernel)
    *, nt: int, w0: int, s0: int, dt: float, cfg, noise_ref=None,
    ou: bool = False, eta_ref=None, keys_ref=None, assoc: bool = False,
    crossing: bool = False, cross_ref=None,
):
    """Transposed twin of :func:`_kernel` — same physics (``miz.step`` with
    ``grid_axis=0``), same storage semantics, different data layout.

    ``crossing=True`` (round 5): per-STEP first-crossing detection — the
    kernel reduces each step's instantaneous ice field to a per-member
    area (trapezoid weights in ``cols_ref`` column 6, matching
    ``hemispheric_mean`` up to summation order) and records the FIRST
    step index at which ``sign * (area - thr) > 0`` (``thr``/``sign``
    ride as the LAST TWO pars rows; -1 where never crossed) into
    ``cross_ref`` — sub-annual transition timing at zero HBM cost
    (one (1, Kt) row per year instead of an (nt, K) area trace).

    ``noise_ref`` (via :func:`_kernel_xk_noisy`) is an optional
    ``(nt_pad, Kt)`` VMEM table of per-step per-member forcing offsets
    (the OU weather noise of the fused
    :func:`~energybalancemodel_jl_tpu.stochastic.transitions` engine);
    step ``t`` reads row ``t`` as a dynamic sublane slice — the same
    access family the pre-round-3 'kx' insolation table used. With the
    table absent the traced graph is unchanged, and a zero table adds
    ``+ 0.0`` to the forcing scalar only (bitwise no-op for every finite
    non-negative-zero forcing).

    ``ou=True`` (via :func:`_kernel_xk_ou`) reinterprets the table as
    WHITE noise ``xi`` and runs the OU recurrence ``eta' = rho eta +
    scale xi_t`` IN-KERNEL (per-member rows ``_XK_OU_RHO``/``_XK_OU_SCALE``
    /``_XK_OU_ETA0`` of ``pars_ref``; the year-end ``eta`` row is written
    to ``eta_ref``). The recurrence is two VPU ops per step — measured
    free on-chip (round-5 probe ledger, BENCH_NOTES "phases 3-7").
    ``scale = 0`` with ``eta0 = 0`` keeps ``eta`` exactly 0.0, so
    the sigma=0 run stays bitwise-identical to the deterministic year.

    ``keys_ref`` (via the ``_gen`` adapters): the noise table is not an
    operand at all — ``noise_ref`` is a VMEM SCRATCH buffer the kernel
    fills itself from the ``(2, Kt)`` per-member uint32 key rows, bitwise
    ``jax.random.normal`` (:func:`_gen_noise_xk`; no noise operand is
    materialized — 8 bytes/member instead of 4*nt). ``assoc=True`` (ou
    only) additionally replaces the serial in-loop recurrence with a
    log-depth scan over the scratch (:func:`_assoc_ou_path`) — the loop
    then reads the precomputed eta path like the plain-noisy mode and
    carries no eta; year-end eta is the path's last real row. Neither
    mode changes throughput (round-5 probe ledger, BENCH_NOTES "phases
    3-7": the table read, the operand, and the recurrence all measure
    free; the noisy path's ~1.6x at sigma~O(1) is extra Newton work)."""
    from ..models import miz

    dtype = cin_ref.dtype
    nxs, Kt = cin_ref.shape[1], cin_ref.shape[2]

    # (1, Kt) rows broadcast against (nxs, Kt) state
    par = Collection(
        {n: pars_ref[i:i + 1, :] for i, n in enumerate(PAR_NAMES)}
    )
    tab = {n: pars_ref[N_PAR + i:N_PAR + i + 1, :]
           for i, n in enumerate(XK_TABLE_ROWS)}
    mask = cols_ref[:, 0:1]   # 1 on real grid rows, 0 on sublane padding
    colX = cols_ref[:, 1:2]   # x
    colX2 = cols_ref[:, 2:3]  # x^2
    stat = Collection(
        # coalbedo a0 - a2 x^2 (statics aw) from per-member rows — the same
        # two-operand products/subtraction, so scalar members are bitwise
        # identical to the host-built column; padded rows are exactly 0
        aw=tab["a0"] * mask - tab["a2"] * colX2,
        glo=cols_ref[:, 3:4],
        gdi=cols_ref[:, 4:5],
        gup=cols_ref[:, 5:6],
        dt=dt,
        Tm_pow_m2=pars_ref[_TM_POW:_TM_POW + 1, :],
    )
    carry0 = Collection({k: cin_ref[j] for j, k in enumerate(CARRY_KEYS)})
    for i in range(len(OUT_VARS)):
        avg_ref[i] = jnp.zeros((nxs, Kt), dtype)
    if ou:
        ou_rho = pars_ref[_XK_OU_RHO:_XK_OU_RHO + 1, :]
        ou_scale = pars_ref[_XK_OU_SCALE:_XK_OU_SCALE + 1, :]
        # (1, Kt) fori carry, same convention as the classic kernel
        # (_classic_kernel_xk) — sub-tile-height carries lower fine in
        # Mosaic, and the recurrence's cost is tile-height-independent
        # (round 5 measured the whole serial chain free on-chip)
        eta_init = pars_ref[_XK_OU_ETA0:_XK_OU_ETA0 + 1, :]
    if keys_ref is not None:
        _gen_noise_xk(noise_ref, keys_ref, noise_ref.shape[0])
    serial_ou = ou and not assoc
    if ou and assoc:
        _assoc_ou_path(noise_ref, ou_rho, ou_scale, eta_init,
                       noise_ref.shape[0])
    if crossing:
        n_rows = pars_ref.shape[0]
        cr_thr = pars_ref[n_rows - 2:n_rows - 1, :]
        cr_sign = pars_ref[n_rows - 1:n_rows, :]
        wcol = cols_ref[:, 6:7]  # trapezoid quadrature weights

    def body(t, state):
        # the eta slot exists only in serial-ou mode, keeping the
        # deterministic and plain-noisy traced graphs exactly as before
        # round 4 (assoc mode reads the precomputed path like plain noise)
        if crossing:
            state, first = state
        if serial_ou:
            carry, conv, eta = state
        else:
            carry, conv = state
        c = cosv_ref[t]
        # same products, same evaluation order as the statics table build
        # ((S0 - (S1 x) cos) - S2 x^2) — bitwise-identical columns
        insol = (tab["S0"] * mask - (tab["S1"] * colX) * c) - tab["S2"] * colX2
        f_t = f_ref[t] + pars_ref[_F_OFF:_F_OFF + 1, :]
        if serial_ou:
            eta = ou_rho * eta + ou_scale * noise_ref[pl.ds(t, 1), :]
            f_t = f_t + eta
        elif noise_ref is not None:
            f_t = f_t + _noise_row(noise_ref, t)
        xs = Collection(insol=insol, f=f_t)
        carry, out = miz.step(carry, xs, stat, par, cfg)
        out = dict(out)
        conv = jnp.minimum(conv, out.pop("newton_converged"))
        for i, k in enumerate(OUT_VARS):
            avg_ref[i] = avg_ref[i] + out[k]

        @pl.when(t == w0)
        def _():
            for i, k in enumerate(OUT_VARS):
                wint_ref[i] = out[k]

        @pl.when(t == s0)
        def _():
            for i, k in enumerate(OUT_VARS):
                summ_ref[i] = out[k]

        new_state = (carry, conv, eta) if serial_ou else (carry, conv)
        if crossing:
            # instantaneous ice area: weighted sublane sum of phi (NaN
            # presentation values zeroed, as the driver's area_of does)
            phi = out["phi"]
            phi = jnp.where(phi == phi, phi, jnp.zeros((), dtype))
            area = jnp.sum(wcol * phi, axis=0, keepdims=True)
            crossed = (first < 0) & (cr_sign * (area - cr_thr) > 0)
            first = jnp.where(crossed,
                              lax.convert_element_type(t, dtype), first)
            return new_state, first
        return new_state

    state0 = (carry0, jnp.ones((), dtype), eta_init) if serial_ou \
        else (carry0, jnp.ones((), dtype))
    if crossing:
        state0 = (state0, jnp.full((1, Kt), -1.0, dtype))
    state = jax.lax.fori_loop(0, nt, body, state0)
    if crossing:
        state, first = state
        cross_ref[...] = first
    if serial_ou:
        carry, conv, eta = state
    else:
        carry, conv = state
    for j, k in enumerate(CARRY_KEYS):
        cout_ref[j] = carry[k]
    for i in range(len(OUT_VARS)):
        avg_ref[i] = avg_ref[i] / jnp.asarray(float(nt), dtype)
    conv_ref[0, pl.program_id(0)] = conv
    if serial_ou:
        eta_ref[...] = eta
    elif ou:
        eta_ref[...] = noise_ref[pl.ds(nt - 1, 1), :]


def _kernel_xk_noisy(f_ref, cosv_ref, noise_ref, cin_ref, cols_ref, pars_ref,
                     *out_refs, **kw):
    """Noisy-launch adapter: Pallas passes refs positionally in in_specs
    order, so the noise table rides as the third input and is forwarded to
    :func:`_kernel_xk` as its static keyword."""
    _kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref, *out_refs,
               noise_ref=noise_ref, **kw)


def _kernel_xk_ou(f_ref, cosv_ref, noise_ref, cin_ref, cols_ref, pars_ref,
                  cout_ref, wint_ref, summ_ref, avg_ref, conv_ref, eta_ref,
                  **kw):
    """In-kernel-OU launch adapter: the table is WHITE noise, the OU
    recurrence runs inside the time loop (rows ``_XK_OU_RHO``/``_SCALE``/
    ``_ETA0`` of ``pars_ref``), and the year-end eta row is the extra
    ``eta_ref`` output."""
    _kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref,
               cout_ref, wint_ref, summ_ref, avg_ref, conv_ref,
               noise_ref=noise_ref, ou=True, eta_ref=eta_ref, **kw)


def _classic_kernel_xk_noisy(f_ref, cosv_ref, noise_ref, cin_ref, cols_ref,
                             pars_ref, *out_refs, **kw):
    """Classic twin of :func:`_kernel_xk_noisy`."""
    _classic_kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref,
                       *out_refs, noise_ref=noise_ref, **kw)


def _classic_kernel_xk_ou(f_ref, cosv_ref, noise_ref, cin_ref, cols_ref,
                          pars_ref, cout_ref, wint_ref, summ_ref, avg_ref,
                          eta_ref, **kw):
    """Classic twin of :func:`_kernel_xk_ou`."""
    _classic_kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref,
                       cout_ref, wint_ref, summ_ref, avg_ref,
                       noise_ref=noise_ref, ou=True, eta_ref=eta_ref, **kw)


def _kernel_xk_gen_ou(f_ref, cosv_ref, keys_ref, cin_ref, cols_ref,
                      pars_ref, cout_ref, wint_ref, summ_ref, avg_ref,
                      conv_ref, eta_ref, *rest, assoc: bool = False,
                      crossing: bool = False, **kw):
    """Generating in-kernel-OU launch adapter (MIZ): keys input + noise
    scratch + the year-end eta output; ``assoc=True`` precomputes the
    whole eta path by log-depth scan instead of the serial in-loop
    recurrence (:func:`_assoc_ou_path`); ``crossing=True`` adds the
    first-crossing (1, Kt) output before the scratch."""
    if crossing:
        cross_ref, noise_ref = rest
    else:
        (noise_ref,) = rest
        cross_ref = None
    _kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref,
               cout_ref, wint_ref, summ_ref, avg_ref, conv_ref,
               noise_ref=noise_ref, ou=True, eta_ref=eta_ref,
               keys_ref=keys_ref, assoc=assoc, crossing=crossing,
               cross_ref=cross_ref, **kw)


def _classic_kernel_xk_gen_ou(f_ref, cosv_ref, keys_ref, cin_ref, cols_ref,
                              pars_ref, cout_ref, wint_ref, summ_ref,
                              avg_ref, eta_ref, *rest,
                              assoc: bool = False, crossing: bool = False,
                              **kw):
    """Classic twin of :func:`_kernel_xk_gen_ou`."""
    if crossing:
        cross_ref, noise_ref = rest
    else:
        (noise_ref,) = rest
        cross_ref = None
    _classic_kernel_xk(f_ref, cosv_ref, cin_ref, cols_ref, pars_ref,
                       cout_ref, wint_ref, summ_ref, avg_ref,
                       noise_ref=noise_ref, ou=True, eta_ref=eta_ref,
                       keys_ref=keys_ref, assoc=assoc, crossing=crossing,
                       cross_ref=cross_ref, **kw)


# plane counts of the transposed layout's VMEM working-set estimate
# (refs + step intermediates; no insolation table — it is separable)
XK_PLANES_MIZ = 60
XK_PLANES_CLASSIC = 30
_XK_VMEM_BUDGET = 28 * 2**20
# 'kx' insolation-TABLE budget: below this the kernel keeps the XLA-built
# (nt, nxp) table VMEM-resident (bitwise-shared with the XLA engines on
# every backend); above it the kernel switches to the separable in-kernel
# rebuild (bitwise on TPU, ~1 ulp off on XLA:CPU — _kernel docstring)
_KX_TABLE_BUDGET = 8 * 2**20


def _xk_vmem_bytes(nx: int, block_k: int, itemsize: int, planes: int,
                   noise_nt: int = 0) -> int:
    """Rough transposed-layout working set: ``planes`` (nxs, block_k) ref
    planes + step intermediates. The plane counts are calibrated at the
    default block_k=128; wider blocks grow some Mosaic stack intermediates
    SUPER-linearly (measured on-chip: MIZ at block_k=512 allocates 35.4 MB
    where the linear model predicts 22.6 — a compile-time scoped-vmem OOM),
    so a 1.6x safety factor covers expert block_k overrides. ``noise_nt``
    adds the per-step noise table (an (nt_pad, block_k) VMEM ref — the
    fused :func:`~energybalancemodel_jl_tpu.stochastic.transitions`
    engine), counted inside the safety-scaled term."""
    scale = 1.6 if block_k > 128 else 1.0
    cells = (planes * _round_up(nx, 8) + _round_up(noise_nt, 8)) * block_k
    return int(cells * itemsize * scale)


def _xk_fits(nx: int, block_k: int, itemsize: int, planes: int,
             noise_nt: int = 0):
    """None if the transposed layout can launch, else the reason it can't.

    Single source of truth for the auto-resolver and the launch guards —
    they must never drift apart (an auto-selected layout must not fail its
    own guard)."""
    if block_k % 128 != 0:
        return (
            f"layout='xk' blocks members onto lanes; block_k must be a "
            f"multiple of 128, got {block_k}"
        )
    if _xk_vmem_bytes(nx, block_k, itemsize, planes, noise_nt) \
            > _XK_VMEM_BUDGET:
        what = f"nx={nx}" if not noise_nt else f"nx={nx} (+nt={noise_nt} noise table)"
        return (
            f"{what} working set exceeds the transposed whole-year "
            "kernel's VMEM budget; use layout='kx', an XLA engine "
            "(engine='scan' for single runs, 'batched' for ensembles), or "
            "shard the grid axis with parallel.spatial"
        )
    return None


def _kx_vmem_bytes(nx: int, K: int, block_k: int, itemsize: int,
                   planes: int) -> int:
    """Rough 'kx' working set: ``planes`` (Kt, nxp) ref planes + step
    intermediates. Since the separable-insolation rebuild (round 3) the
    layout holds NO (nt, nx) table, so — like 'xk' — the bound is the
    per-block working set, here scaling with the MEMBER block height
    (min(block_k, K padded to sublanes)) instead of the lane block."""
    Kt = min(block_k, _round_up(max(int(K), 1), 8))
    return planes * Kt * pad_to_lanes(nx) * itemsize


def _kx_fits(nx: int, K: int, block_k: int, itemsize: int, planes: int):
    """None if the 'kx' layout can launch, else the reason it can't (twin
    of :func:`_xk_fits`; single source of truth for the auto-resolver and
    the launch guard)."""
    if _kx_vmem_bytes(nx, K, block_k, itemsize, planes) > _XK_VMEM_BUDGET:
        return (
            f"nx={nx} working set at K={K} exceeds the whole-year "
            "kernel's VMEM budget; use an XLA engine (engine='scan' for "
            "single runs, 'batched' for ensembles) for this resolution "
            "(or shard the grid axis with parallel.spatial)"
        )
    return None


def fused_unfit(model_name: str, st, dtype, par=None, block_k: int = 128,
                K: int = 1, noise: bool = False):
    """None if SOME whole-year-kernel layout can launch this configuration,
    else the reason none can — the predicate ``engine='auto'`` resolvers use
    to fall back to the XLA engines instead of letting a default call raise
    a launch-guard ValueError at high resolution (advisor finding r1).

    ``K`` is the member count: the 'kx' working set scales with the member
    block (8 sublanes at K=1 vs 128 at wide ensembles), so a single run
    fits at far higher nx than an ensemble — pass the real K from ensemble
    resolvers. ``noise=True`` asks for the per-step per-member noise table
    (fused ``transitions``), which only the 'xk' layout carries (a noise
    row is a dynamic LANE slice in 'kx', which Mosaic cannot lower)."""
    itemsize = jnp.dtype(dtype).itemsize
    planes = XK_PLANES_MIZ if model_name == "MIZ" else XK_PLANES_CLASSIC
    table_swept = par is not None and _table_swept(par)
    xk_reason = _xk_fits(st.nx, block_k, itemsize, planes,
                         noise_nt=st.nt if noise else 0)
    if table_swept or noise:
        return xk_reason  # only 'xk' can rebuild per-member insolation
    kx_reason = _kx_fits(st.nx, K, block_k, itemsize, planes)
    if xk_reason is None or kx_reason is None:
        return None
    return kx_reason


def _member_column(v, K: int):
    """Validate/broadcast one per-member parameter leaf to shape (K,)."""
    v = jnp.reshape(v, (-1,)) if jnp.ndim(v) > 0 else jnp.broadcast_to(v, (K,))
    if v.shape[0] != K:
        raise ValueError(
            f"swept parameter leaves must have shape ({K},), got {v.shape}"
        )
    return v


def _table_swept(par) -> bool:
    return any(
        k in TABLE_PARAMS and jnp.ndim(v) > 0 for k, v in par.items()
    )


def _resolve_layout(layout, K: int, nx: int, block_k: int, itemsize: int,
                    planes: int, table_swept: bool = False,
                    noise_nt: int = 0) -> str:
    """Pick the faster in-kernel layout when the caller doesn't.

    'xk' (grid on sublanes, members on lanes) wins when the ensemble fills
    the 128-lane blocks — measured 2.2x at nx = 180, K = 8192 (BENCH_NOTES).
    'kx' wins for narrow ensembles/single runs (a lone member still pays all
    ceil(nx/8) sublane tiles in 'xk') and is the fallback when 'xk' does not
    fit (non-lane-multiple block_k, VMEM bound — 'kx' reaches much higher
    nx at small K since its working set scales with the member block).
    Swept table parameters force 'xk' (only that layout can rebuild the
    insolation PER MEMBER; 'kx' rebuilds it too, round 3, but shared).
    A per-step noise table (``noise_nt > 0``) also forces 'xk': the step-t
    noise row is a dynamic SUBLANE slice there, but would be a dynamic
    LANE slice in 'kx', which Mosaic cannot lower.
    """
    if layout is not None:
        return layout
    unfit_reason = _xk_fits(nx, block_k, itemsize, planes, noise_nt)
    if table_swept or noise_nt:
        if unfit_reason is not None:
            need = ("a per-step noise table" if noise_nt
                    else "sweeping insolation-table parameters")
            hint = (
                "leave block_k at its default (128)"
                if block_k % 128 != 0
                else "use engine='vmap' for this configuration"
            )
            raise ValueError(
                f"{need} needs the transposed "
                f"'xk' kernel layout, which cannot launch here "
                f"({unfit_reason}); {hint}"
            )
        return "xk"
    if unfit_reason is not None:
        return "kx"
    # per-step VPU tile counts of each layout (8x128 tiles)
    kx_tiles = (_round_up(K, 8) // 8) * (pad_to_lanes(nx) // 128)
    xk_tiles = (_round_up(nx, 8) // 8) * (_round_up(K, 128) // 128)
    if xk_tiles <= kx_tiles:
        return "xk"
    # the tile heuristic prefers 'kx', but its working set (member block x
    # full padded nx) can exceed the VMEM budget in a window where 'xk'
    # (lane block) fits — an auto-selected layout must never fail its own
    # launch guard, so fall back to the layout that fits (review r3b)
    if _kx_fits(nx, K, block_k, itemsize, planes) is not None:
        return "xk"
    return "kx"


def _validate_table_scalars(par, hint: str = "layout='xk' or engine='vmap'"):
    for name in sorted(TABLE_PARAMS):
        if name in par and jnp.ndim(par[name]) != 0:
            raise ValueError(
                f"the 'kx' fused year kernel requires scalar parameter "
                f"{name!r} (it shapes the shared insolation/coalbedo "
                f"tables); use {hint} to sweep it"
            )


def _miz_par_stack(par, stat, K, dtype):
    """(K, N_PAR) per-member parameter stack (see PAR_NAMES)."""
    return jnp.stack(
        [_member_column(par[n], K) for n in PAR_NAMES]
        + [_member_column(stat["Tm_pow_m2"], K),
           _member_column(par.get("F", jnp.zeros((), dtype)), K)],
        axis=1,
    )


def _check_kx_fits(nx: int, K: int, block_k: int, itemsize: int,
                   planes: int):
    """Launch guard for the 'kx' layout (raise-on-unfit twin of
    :func:`_kx_fits`, the single source of truth)."""
    reason = _kx_fits(nx, K, block_k, itemsize, planes)
    if reason is not None:
        raise ValueError(reason)


@functools.partial(
    jax.jit,
    static_argnames=("st", "cfg", "block_k", "interpret", "layout",
                     "ou_assoc"),
)
def pallas_miz_year(carry, par, fyear, st, cfg, block_k: int = 128,
                    interpret: bool = False, layout: str = None,
                    noise=None, noise_ou=None, noise_keys=None,
                    ou_assoc: bool = False, crossing=None):
    """Run one MIZ model year for a ``(K, nx)`` ensemble in fused blocks.

    Drop-in twin of the seasonal-only ``make_year_fn`` signature:
    ``(carry, par, fyear) -> (carry, Seasonal, converged, None)``.
    Any physical parameter leaf may be scalar (shared) or ``(K,)`` (swept
    per member). In the transposed ``'xk'`` layout this includes the
    insolation-table parameters (``TABLE_PARAMS``) — the kernel rebuilds
    the separable insolation from per-member rows; the ``'kx'`` layout
    shares one VMEM table and requires them scalar.

    ``layout`` selects the in-kernel data layout: ``'kx'`` (members on
    sublanes, grid on lanes) or ``'xk'`` (transposed — grid on sublanes,
    members on lanes; ~98% lane utilization at nx = 180 vs 70%, measured
    2.2x faster at K = 8192). Default ``None`` picks automatically: 'xk'
    for wide ensembles (and whenever table parameters are swept) when it
    fits, 'kx' otherwise.

    ``noise`` is an optional ``(nt, K)`` per-step per-member forcing
    offset table (the OU weather noise of the fused
    :func:`~energybalancemodel_jl_tpu.stochastic.transitions` engine) —
    step ``t`` of member ``k`` sees forcing ``f[t] + par['F'][k] +
    noise[t, k]``. 'xk' only (a step's noise row is a dynamic LANE slice
    in 'kx', which Mosaic cannot lower); a zero table reproduces the
    deterministic year bitwise.

    ``noise_ou=(rho, scale, eta0)`` (requires ``noise``) reinterprets the
    table as WHITE noise and runs the OU recurrence in-kernel — member
    ``k``'s step ``t`` forcing offset is ``eta[t, k]`` with ``eta[t] =
    rho eta[t-1] + scale noise[t]``, seeded from ``eta0`` (``(K,)``);
    ``scale`` may be per-member. The 4th return value is then the
    year-end ``eta`` row (``(K,)``) instead of ``None``. This keeps the
    per-year operand at white noise (a fused producer) instead of an
    XLA-scan-produced OU path. ``scale = 0`` + ``eta0 = 0`` is bitwise
    the deterministic year.

    ``noise_keys`` (``(K, 2)`` uint32 key data, f32 only, exclusive with
    ``noise``): the kernel GENERATES the white-noise table itself —
    member ``k``'s draws are bitwise ``jax.random.normal(keys[k], (nt,),
    float32)`` (ops/prng.py replication), so no ``(nt, K)`` operand is
    materialized at all (8 bytes/member instead of 4*nt). Composes with
    ``noise_ou``. ``ou_assoc=True`` (requires ``noise_keys`` +
    ``noise_ou``) computes the whole eta path by log-depth scan before
    the time loop instead of the serial in-loop recurrence — same
    recurrence, tree-regrouped rounding (engine-parity-level, NOT
    bitwise, vs the serial mode; sigma=0 stays bitwise-deterministic).
    """
    import dataclasses

    from ..models import miz

    # inside the kernel everything is already VMEM-resident: the nested
    # Pallas PCR launch ('pcr_fused') and the fixed-iteration Newton kernel
    # ('pallas') are meaningless here — normalize to the inline PCR solve
    if cfg.solver != "pcr":
        cfg = dataclasses.replace(cfg, solver="pcr")
    _validate_noise_args(carry["Ei"].dtype, noise, noise_ou, noise_keys,
                         ou_assoc)
    layout = _resolve_layout(
        layout, carry["Ei"].shape[0], carry["Ei"].shape[1], block_k,
        jnp.dtype(carry["Ei"].dtype).itemsize, planes=XK_PLANES_MIZ,
        table_swept=_table_swept(par),
        noise_nt=st.nt if (noise is not None or noise_keys is not None)
        else 0,
    )
    _validate_crossing_args(crossing, noise_keys, noise_ou)
    if layout == "xk":
        return _miz_year_xk(carry, par, fyear, st, cfg, block_k, interpret,
                            noise, noise_ou, noise_keys, ou_assoc,
                            crossing)
    if noise is not None or noise_keys is not None:
        raise ValueError(
            "layout='kx' cannot carry a per-step per-member noise table "
            "(a step's noise row is a dynamic lane slice there); use "
            "layout='xk'"
        )
    if layout != "kx":
        raise ValueError(f"layout must be 'kx'|'xk', got {layout!r}")

    dtype = carry["Ei"].dtype
    K, nx = carry["Ei"].shape
    nxp = pad_to_lanes(nx)
    _check_kx_fits(nx, K, block_k, jnp.dtype(dtype).itemsize,
                   XK_PLANES_MIZ)
    Kt = min(block_k, _round_up(K, 8))
    Kp = _round_up(K, Kt)
    nt = st.nt
    w0 = st.winter_inx - 1  # reference tick indices are 1-based
    s0 = st.summer_inx - 1

    par = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    _validate_table_scalars(par)
    stat = miz.statics(st, par, dtype)
    # (K, N_PAR) — parameters on lanes, members on sublanes
    pars = _miz_par_stack(par, stat, K, dtype)

    def pad_kx(v, fill=0.0):
        return jnp.pad(v, ((0, Kp - K), (0, nxp - nx)), constant_values=fill)

    def pad_lane(v):
        return jnp.pad(jnp.asarray(v, dtype), (0, nxp - nx))

    x = jnp.asarray(st.x, dtype=dtype)
    t = jnp.asarray(st.t, dtype=dtype)
    cosv = jnp.cos(2.0 * jnp.pi * t)  # same values the statics table uses
    tabs = jnp.stack([jnp.asarray(par[n], dtype) for n in ("S0", "S1", "S2")])
    cin = jnp.stack([pad_kx(jnp.asarray(carry[k], dtype)) for k in CARRY_KEYS])
    rows = jnp.stack(
        [pad_lane(stat.aw), pad_lane(stat.glo), pad_lane(stat.gdi),
         pad_lane(stat.gup), pad_lane(jnp.ones((nx,), dtype)), pad_lane(x),
         pad_lane(x**2)]
    )
    # table mode whenever the statics table fits beside the working set:
    # the XLA-built table and the in-kernel rebuild are bitwise-identical
    # on TPU (verified on-chip) but differ ~1 ulp on XLA:CPU (FMA
    # contraction across jit graphs), so keeping the table preserves the
    # interpret-mode parity baselines; separable mode is the high-res
    # extension the table could never reach (_kernel docstring)
    itemsize = jnp.dtype(dtype).itemsize
    table_bytes = st.nt * nxp * itemsize
    separable = (
        table_bytes > _KX_TABLE_BUDGET
        or _kx_vmem_bytes(nx, K, block_k, itemsize, XK_PLANES_MIZ)
        + table_bytes > _XK_VMEM_BUDGET
    )
    if separable:
        insol = jnp.zeros((1, nxp), dtype)  # dummy, never read
    else:
        insol = jnp.pad(stat.insol, ((0, 0), (0, nxp - nx)))
    # padded members replicate the last member's PARAMETERS (edge mode) over
    # zero state: zero-padded parameters would give the Newton residual a
    # 0/0 (k = hmin = 0) whose NaN never satisfies the tolerance and poisons
    # the block's min-reduced convergence flag
    pars_p = jnp.pad(pars, ((0, Kp - K), (0, 0)), mode="edge")
    f = jnp.asarray(fyear, dtype=dtype)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk6 = pl.BlockSpec((6, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    blk10 = pl.BlockSpec((10, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def launch(cin_s, pars_s):
        ks = cin_s.shape[1]
        return pl.pallas_call(
            functools.partial(
                _kernel, nt=nt, w0=w0, s0=s0, dt=st.dt, cfg=cfg,
                separable=separable,
            ),
            grid=(ks // Kt,),
            out_shape=(
                jax.ShapeDtypeStruct((6, ks, nxp), dtype),
                jax.ShapeDtypeStruct((10, ks, nxp), dtype),
                jax.ShapeDtypeStruct((10, ks, nxp), dtype),
                jax.ShapeDtypeStruct((10, ks, nxp), dtype),
                jax.ShapeDtypeStruct((1, ks // Kt), dtype),
            ),
            in_specs=[
                smem,
                smem,
                smem,
                pl.BlockSpec(insol.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                blk6,
                pl.BlockSpec((7, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Kt, N_PAR), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                blk6,
                blk10,
                blk10,
                blk10,
                pl.BlockSpec((1, ks // Kt), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ),
            # the kernel's scoped-VMEM demand (~16.2 MB with double-buffered
            # blocks at Kt=128) sits just above XLA's conservative 16 MB
            # compile-time default; the raised cap compiles AND runs
            # (validated at Kp=16384) — the default is not the physical limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(f, cosv, tabs, insol, cin_s, rows, pars_s)

    parts = [
        launch(
            lax.slice_in_dim(cin, s, s + n, axis=1),
            lax.slice_in_dim(pars_p, s, s + n, axis=0),
        )
        for s, n in _member_slabs(Kp, Kt)
    ]
    if len(parts) == 1:
        cout, wint, summ, avg, conv = parts[0]
    else:
        couts, wints, summs, avgs, convs = zip(*parts)
        cout, wint, summ, avg = (
            jnp.concatenate(vs, axis=-2) for vs in (couts, wints, summs, avgs)
        )
        conv = jnp.concatenate(convs, axis=-1)

    new_carry = Collection(
        {k: cout[j, :K, :nx] for j, k in enumerate(CARRY_KEYS)}
    )
    seasonal = Seasonal(
        winter=Collection({k: wint[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
        summer=Collection({k: summ[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
        avg=Collection({k: avg[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
    )
    return new_carry, seasonal, jnp.min(conv), None


def _miz_year_xk(carry, par, fyear, st, cfg, block_k: int, interpret: bool,
                 noise=None, noise_ou=None, noise_keys=None,
                 ou_assoc: bool = False, crossing=None):
    """Transposed-layout launch path of :func:`pallas_miz_year`
    (``layout='xk'``): grid on sublanes, members on lanes."""
    import dataclasses

    cfg = dataclasses.replace(cfg, grid_axis=0)
    dtype = carry["Ei"].dtype
    itemsize = jnp.dtype(dtype).itemsize
    K, nx = carry["Ei"].shape
    nxs = _round_up(nx, 8)  # grid rows on sublanes (f32 tile height 8)
    any_noise = noise is not None or noise_keys is not None
    unfit = _xk_fits(nx, block_k, itemsize, XK_PLANES_MIZ,
                     noise_nt=st.nt if any_noise else 0)
    if unfit is not None:
        raise ValueError(unfit)
    Kt = block_k
    Kp = _round_up(K, Kt)
    nt = st.nt
    w0 = st.winter_inx - 1
    s0 = st.summer_inx - 1

    par = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    # table parameters ride as per-member rows here (sweepable, unlike 'kx');
    # statics are NOT used — the kernel rebuilds insolation/coalbedo itself
    from .diffusion import diffusion_bands

    geom = diffusion_bands(st)
    stat_min = Collection(Tm_pow_m2=par["Tm"] ** par["m2"])
    pars_parts = [
        _miz_par_stack(par, stat_min, K, dtype),
        jnp.stack([_member_column(par[n], K) for n in XK_TABLE_ROWS], axis=1),
    ]
    if noise_ou is not None:
        rho_ou, scale_ou, eta0_ou = (jnp.asarray(v, dtype) for v in noise_ou)
        pars_parts.append(jnp.stack(
            [_member_column(rho_ou, K), _member_column(scale_ou, K),
             _member_column(eta0_ou, K)], axis=1))
    if crossing is not None:
        cr_thr, cr_sign = (jnp.asarray(v, dtype) for v in crossing)
        pars_parts.append(jnp.stack(
            [_member_column(cr_thr, K), _member_column(cr_sign, K)],
            axis=1))
    pars = jnp.concatenate(pars_parts, axis=1)  # (K, N_PAR + 5 [+ 3][+ 2])
    n_rows = pars.shape[1]
    pars_t = jnp.pad(pars, ((0, Kp - K), (0, 0)), mode="edge").T
    if noise_ou is not None and Kp > K:
        # padded lanes must see ZERO noise (scale = eta0 = 0), not the last
        # real member's decaying eta forcing over a zero state — padded-lane
        # dynamics feed the block-wide Newton convergence min (advisor r4)
        pars_t = _zero_pad_ou_rows(pars_t, K, _XK_OU_SCALE, _XK_OU_ETA0)

    x = jnp.asarray(st.x, dtype=dtype)
    t = jnp.asarray(st.t, dtype=dtype)
    cosv = jnp.cos(2.0 * jnp.pi * t)  # same values the statics table uses

    def pad_col(v):
        return jnp.pad(jnp.asarray(v, dtype), (0, nxs - nx))

    cols = jnp.stack(
        [
            pad_col(jnp.ones((nx,), dtype)),  # pad mask
            pad_col(x),
            pad_col(x**2),
            pad_col(jnp.asarray(geom.lo, dtype)),
            pad_col(jnp.asarray(geom.di, dtype)),
            pad_col(jnp.asarray(geom.up, dtype)),
            _trapezoid_weights(st.x, nx, nxs, dtype),  # crossing quad.
            jnp.zeros((nxs,), dtype),
        ],
        axis=1,
    )  # (nxs, 8)

    def pad_kx_t(v):
        # (K, nx) -> (nxs, Kp): pad then transpose
        return jnp.pad(jnp.asarray(v, dtype), ((0, Kp - K), (0, nxs - nx))).T

    cin = jnp.stack([pad_kx_t(carry[k]) for k in CARRY_KEYS])  # (6, nxs, Kp)
    f = jnp.asarray(fyear, dtype=dtype)
    noise_p = _pad_noise_xk(noise, nt, K, Kp, dtype)
    keys_p = _pad_keys_xk(noise_keys, K, Kp)
    nt_pad = _round_up(nt, 8)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk6 = pl.BlockSpec((6, nxs, Kt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    blk10 = pl.BlockSpec((10, nxs, Kt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def launch(cin_s, pars_s, noise_s, keys_s):
        ks = cin_s.shape[2]
        kern_kw = {}
        scratch_shapes = []
        if keys_s is not None:
            kernel = _kernel_xk_gen_ou  # keys mode is OU-only (validator)
            kern_kw["assoc"] = ou_assoc
            kern_kw["crossing"] = crossing is not None
            scratch_shapes = [pltpu.VMEM((nt_pad, Kt), dtype)]
        elif noise_s is None:
            kernel = _kernel_xk
        elif noise_ou is not None:
            kernel = _kernel_xk_ou
        else:
            kernel = _kernel_xk_noisy
        in_specs = [smem, smem]
        inputs = [f, cosv]
        if noise_s is not None:
            in_specs.append(pl.BlockSpec(
                (noise_s.shape[0], Kt), lambda i: (0, i),
                memory_space=pltpu.VMEM))
            inputs.append(noise_s)
        if keys_s is not None:
            in_specs.append(pl.BlockSpec(
                (2, Kt), lambda i: (0, i), memory_space=pltpu.VMEM))
            inputs.append(keys_s)
        in_specs += [
            blk6,
            pl.BlockSpec((nxs, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, Kt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [cin_s, cols, pars_s]
        out_shape = [
            jax.ShapeDtypeStruct((6, nxs, ks), dtype),
            jax.ShapeDtypeStruct((10, nxs, ks), dtype),
            jax.ShapeDtypeStruct((10, nxs, ks), dtype),
            jax.ShapeDtypeStruct((10, nxs, ks), dtype),
            jax.ShapeDtypeStruct((1, ks // Kt), dtype),
        ]
        out_specs = [
            blk6,
            blk10,
            blk10,
            blk10,
            pl.BlockSpec((1, ks // Kt), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        if noise_ou is not None:
            out_shape.append(jax.ShapeDtypeStruct((1, ks), dtype))
            out_specs.append(pl.BlockSpec((1, Kt), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        if crossing is not None:
            out_shape.append(jax.ShapeDtypeStruct((1, ks), dtype))
            out_specs.append(pl.BlockSpec((1, Kt), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(
                kernel, nt=nt, w0=w0, s0=s0, dt=st.dt, cfg=cfg, **kern_kw
            ),
            grid=(ks // Kt,),
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)

    parts = [
        launch(
            lax.slice_in_dim(cin, s, s + n, axis=2),
            lax.slice_in_dim(pars_t, s, s + n, axis=1),
            None if noise_p is None
            else lax.slice_in_dim(noise_p, s, s + n, axis=1),
            None if keys_p is None
            else lax.slice_in_dim(keys_p, s, s + n, axis=1),
        )
        for s, n in _member_slabs(Kp, Kt)
    ]
    eta_end = cross_out = None
    cols_out = list(zip(*parts))
    cout, wint, summ, avg, conv = (
        (jnp.concatenate(vs, axis=-1) if len(parts) > 1 else vs[0])
        for vs in cols_out[:5])
    i = 5
    if noise_ou is not None:
        eta_end = (jnp.concatenate(cols_out[i], axis=-1)
                   if len(parts) > 1 else cols_out[i][0])
        i += 1
    if crossing is not None:
        cross_out = (jnp.concatenate(cols_out[i], axis=-1)
                     if len(parts) > 1 else cols_out[i][0])

    def unpack(block, i):
        return block[i, :nx, :K].T  # back to (K, nx)

    new_carry = Collection(
        {k: unpack(cout, j) for j, k in enumerate(CARRY_KEYS)}
    )
    seasonal = Seasonal(
        winter=Collection({k: unpack(wint, i) for i, k in enumerate(OUT_VARS)}),
        summer=Collection({k: unpack(summ, i) for i, k in enumerate(OUT_VARS)}),
        avg=Collection({k: unpack(avg, i) for i, k in enumerate(OUT_VARS)}),
    )
    if eta_end is not None:
        eta_end = eta_end[0, :K]
    if crossing is not None:
        return (new_carry, seasonal, jnp.min(conv), eta_end,
                cross_out[0, :K])
    return new_carry, seasonal, jnp.min(conv), eta_end


# ---------------------------------------------------------------------------
# Classic (WE15) fused year
# ---------------------------------------------------------------------------

# classic scan-carry fields and recorded variables (models/classic.py)
C_CARRY_KEYS = ("E", "Tg")
C_OUT_VARS = ("E", "T", "h")
# per-member parameter lanes for the classic kernel: statics-derived scalar
# combinations (reference get_statics, /root/reference/src/classic.jl:12-34)
# plus the raw parameters the step reads. "Dcg" = dt*D/cg scales the
# parameter-free uniform-grid bands into the implicit-matrix bands in-kernel.
C_PAR_NAMES = (
    "cg_tau", "dt_tau", "dc", "M", "kLf", "Dcg", "ai", "A", "Fb", "cw", "Lf",
)
_C_F_OFF = len(C_PAR_NAMES)  # per-member constant forcing offset lane
_C_XK_TAB = len(C_PAR_NAMES) + 1  # first XK_TABLE_ROWS row ('xk' layout only)
# in-kernel-OU rows (classic 'xk' ou mode; see _XK_OU_RHO)
_C_OU_RHO = _C_XK_TAB + len(XK_TABLE_ROWS)
_C_OU_SCALE = _C_OU_RHO + 1
_C_OU_ETA0 = _C_OU_RHO + 2


def _classic_par_stack(par, stat, st, K, dtype):
    """(K, len(C_PAR_NAMES)+1) per-member parameter stack."""
    cols = dict(
        cg_tau=stat["cg_tau"], dt_tau=stat["dt_tau"], dc=stat["dc"],
        M=stat["M"], kLf=stat["kLf"],
        Dcg=st.dt * par["D"] / par["cg"],
        ai=par["ai"], A=par["A"], Fb=par["Fb"], cw=par["cw"], Lf=par["Lf"],
    )
    return jnp.stack(
        [_member_column(cols[n], K) for n in C_PAR_NAMES]
        + [_member_column(par.get("F", jnp.zeros((), dtype)), K)],
        axis=1,
    )


def _classic_kernel(
    f_ref,      # SMEM (nt,) shared forcing (per-member offsets ride in pars)
    cosv_ref,   # SMEM (nt+1,) cos(2 pi t) with wraparound entry
                # cosv[nt] == cosv[0] — with separable=True the kernel
                # rebuilds both per-step rows (S_i and the wraparound
                # S_{i+1}) from the separable form ((S0 - S2 x^2) -
                # (S1 cos) x, classic.py statics) instead of holding the
                # (nt+1, nxp) table in VMEM; same table/separable policy
                # and backend caveat as the MIZ :func:`_kernel` (round 3)
    tabs_ref,   # SMEM (3,): the scalar S0, S1, S2
    S_ref,      # VMEM (nt+1, nxp) insolation table (separable=False) or a
                # (1, nxp) dummy (separable=True — not read)
    cin_ref,    # VMEM (2, Kt, nxp) carry in: E, Tg
    rows_ref,   # VMEM (7, nxp): aw, geom.lo, geom.di, geom.up (uniform
                # grid), pad mask, x, x^2
    pars_ref,   # VMEM (Kt, N) per-member parameter lanes (C_PAR_NAMES)
    cout_ref,   # VMEM (2, Kt, nxp)
    wint_ref,   # VMEM (3, Kt, nxp)
    summ_ref,   # VMEM (3, Kt, nxp)
    avg_ref,    # VMEM (3, Kt, nxp)
    *, nt: int, w0: int, s0: int, dt: float, cfg, separable: bool,
):
    from ..models import classic

    dtype = cin_ref.dtype
    Kt, nxp = cin_ref.shape[1], cin_ref.shape[2]

    col = {n: pars_ref[:, i:i + 1] for i, n in enumerate(C_PAR_NAMES)}
    aw = rows_ref[0:1]
    # implicit-matrix bands, scaled per member once (kdi pads to 1 + dt_tau
    # on the decoupled lanes — nonzero, so the padded PCR rows stay healthy)
    klo = -col["Dcg"] * rows_ref[1:2]
    kup = -col["Dcg"] * rows_ref[3:4]
    kdi = (1.0 + col["dt_tau"]) - col["Dcg"] * rows_ref[2:3]
    stat = Collection(
        cg_tau=col["cg_tau"], dt_tau=col["dt_tau"], dc=col["dc"],
        M=col["M"], kLf=col["kLf"], aw=aw, klo=klo, kdi=kdi, kup=kup, dt=dt,
    )
    par = Collection(ai=col["ai"], A=col["A"], Fb=col["Fb"],
                     cw=col["cw"], Lf=col["Lf"])
    carry0 = Collection({k: cin_ref[j] for j, k in enumerate(C_CARRY_KEYS)})
    mask = rows_ref[4:5]
    rowX = rows_ref[5:6]
    rowX2 = rows_ref[6:7]
    # the cos-independent part of the table row, hoisted: same products and
    # subtraction order as the statics build (S0 - S2 x^2), so real lanes
    # are bitwise-identical (S0*1.0 == S0) and padded lanes exactly 0
    colA = tabs_ref[0] * mask - tabs_ref[2] * rowX2
    for i in range(len(C_OUT_VARS)):
        avg_ref[i] = jnp.zeros((Kt, nxp), dtype)

    def body(t, carry):
        if separable:
            # statics: S = (S0 - S2 x^2) - (S1 cos)[:,None] * x — rebuild
            # both rows with the same grouping; cosv[nt] == cosv[0]
            # reproduces the wraparound row (identical inputs and ops)
            S_i = colA - (tabs_ref[1] * cosv_ref[t]) * rowX
            S_ip1 = colA - (tabs_ref[1] * cosv_ref[t + 1]) * rowX
        else:
            S_i = S_ref[pl.ds(t, 1), :]
            S_ip1 = S_ref[pl.ds(t + 1, 1), :]  # wraparound column (:61)
        xs = Collection(
            S_i=S_i,
            S_ip1=S_ip1,
            f=f_ref[t] + pars_ref[:, _C_F_OFF:_C_F_OFF + 1],
        )
        carry, out = classic.step(carry, xs, stat, par, cfg)
        for i, k in enumerate(C_OUT_VARS):
            avg_ref[i] = avg_ref[i] + out[k]

        @pl.when(t == w0)
        def _():
            for i, k in enumerate(C_OUT_VARS):
                wint_ref[i] = out[k]

        @pl.when(t == s0)
        def _():
            for i, k in enumerate(C_OUT_VARS):
                summ_ref[i] = out[k]

        return carry

    carry = _time_loop(nt, body, carry0)
    for j, k in enumerate(C_CARRY_KEYS):
        cout_ref[j] = carry[k]
    for i in range(len(C_OUT_VARS)):
        avg_ref[i] = avg_ref[i] / jnp.asarray(float(nt), dtype)


@functools.partial(
    jax.jit,
    static_argnames=("st", "cfg", "block_k", "interpret", "layout",
                     "ou_assoc"),
)
def pallas_classic_year(carry, par, fyear, st, cfg, block_k: int = 128,
                        interpret: bool = False, layout: str = None,
                        noise=None, noise_ou=None, noise_keys=None,
                        ou_assoc: bool = False, crossing=None):
    """Fused whole-year WE15 integration (classic twin of
    :func:`pallas_miz_year`, same signature, sweep surface, ``layout``
    options, optional ``(nt, K)`` ``noise`` table, in-kernel-OU
    ``noise_ou=(rho, scale, eta0)`` mode, in-kernel draw generation
    ``noise_keys`` and log-depth ``ou_assoc`` — see the MIZ docstring:
    any non-table parameter leaf may be ``(K,)``-swept)."""
    import dataclasses

    from ..models import classic

    if cfg.solver != "pcr":
        cfg = dataclasses.replace(cfg, solver="pcr")
    _validate_noise_args(carry["E"].dtype, noise, noise_ou, noise_keys,
                         ou_assoc)
    layout = _resolve_layout(
        layout, carry["E"].shape[0], carry["E"].shape[1], block_k,
        jnp.dtype(carry["E"].dtype).itemsize, planes=XK_PLANES_CLASSIC,
        table_swept=_table_swept(par),
        noise_nt=st.nt if (noise is not None or noise_keys is not None)
        else 0,
    )
    _validate_crossing_args(crossing, noise_keys, noise_ou)
    if layout == "xk":
        return _classic_year_xk(carry, par, fyear, st, cfg, block_k,
                                interpret, noise, noise_ou, noise_keys,
                                ou_assoc, crossing)
    if noise is not None or noise_keys is not None:
        raise ValueError(
            "layout='kx' cannot carry a per-step per-member noise table "
            "(a step's noise row is a dynamic lane slice there); use "
            "layout='xk'"
        )
    if layout != "kx":
        raise ValueError(f"layout must be 'kx'|'xk', got {layout!r}")

    dtype = carry["E"].dtype
    K, nx = carry["E"].shape
    nxp = pad_to_lanes(nx)
    _check_kx_fits(nx, K, block_k, jnp.dtype(dtype).itemsize,
                   XK_PLANES_CLASSIC)
    Kt = min(block_k, _round_up(K, 8))
    Kp = _round_up(K, Kt)
    nt = st.nt
    w0 = st.winter_inx - 1
    s0 = st.summer_inx - 1

    par = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    _validate_table_scalars(par)

    # statics with (K, 1)-augmented leaves (as in the batch-native engine):
    # its band assembly multiplies parameters against (nx,) geometry rows
    par_aug = Collection(
        {k: (v[:, None] if jnp.ndim(v) == 1 else v) for k, v in par.items()}
    )
    stat = classic.statics(st, par_aug, dtype)
    pars = _classic_par_stack(par, stat, st, K, dtype)

    def pad_kx(v):
        return jnp.pad(v, ((0, Kp - K), (0, nxp - nx)))

    def pad_lane(v):
        return jnp.pad(jnp.asarray(v, dtype), (0, nxp - nx))

    from ..models.classic import uniform_bands

    geom = uniform_bands(nx)
    cin = jnp.stack([pad_kx(jnp.asarray(carry[k], dtype)) for k in C_CARRY_KEYS])
    x = jnp.asarray(st.x, dtype=dtype)
    t = jnp.asarray(st.t, dtype=dtype)
    cosv = jnp.cos(2.0 * jnp.pi * t)  # same values the statics table uses
    cosv = jnp.concatenate([cosv, cosv[:1]])  # wraparound entry (statics :62)
    tabs = jnp.stack([jnp.asarray(par[n], dtype) for n in ("S0", "S1", "S2")])
    rows = jnp.stack(
        [pad_lane(stat.aw), pad_lane(geom.lo), pad_lane(geom.di),
         pad_lane(geom.up), pad_lane(jnp.ones((nx,), dtype)), pad_lane(x),
         pad_lane(x**2)]
    )
    # table/separable mode policy: see pallas_miz_year (same rationale)
    itemsize = jnp.dtype(dtype).itemsize
    table_bytes = (st.nt + 1) * nxp * itemsize
    separable = (
        table_bytes > _KX_TABLE_BUDGET
        or _kx_vmem_bytes(nx, K, block_k, itemsize, XK_PLANES_CLASSIC)
        + table_bytes > _XK_VMEM_BUDGET
    )
    if separable:
        S = jnp.zeros((1, nxp), dtype)  # dummy, never read
    else:
        S = jnp.pad(stat.S, ((0, 0), (0, nxp - nx)))
    pars_p = jnp.pad(pars, ((0, Kp - K), (0, 0)), mode="edge")
    f = jnp.asarray(fyear, dtype=dtype)

    nv = len(C_OUT_VARS)
    blk2 = pl.BlockSpec((2, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((nv, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    def launch(cin_s, pars_s):
        ks = cin_s.shape[1]
        return pl.pallas_call(
            functools.partial(
                _classic_kernel, nt=nt, w0=w0, s0=s0, dt=st.dt, cfg=cfg,
                separable=separable,
            ),
            grid=(ks // Kt,),
            out_shape=(
                jax.ShapeDtypeStruct((2, ks, nxp), dtype),
                jax.ShapeDtypeStruct((nv, ks, nxp), dtype),
                jax.ShapeDtypeStruct((nv, ks, nxp), dtype),
                jax.ShapeDtypeStruct((nv, ks, nxp), dtype),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(S.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                blk2,
                pl.BlockSpec((7, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Kt, len(C_PAR_NAMES) + 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(blk2, blk3, blk3, blk3),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(f, cosv, tabs, S, cin_s, rows, pars_s)

    parts = [
        launch(
            lax.slice_in_dim(cin, s, s + n, axis=1),
            lax.slice_in_dim(pars_p, s, s + n, axis=0),
        )
        for s, n in _member_slabs(Kp, Kt)
    ]
    cout, wint, summ, avg = (
        parts[0] if len(parts) == 1 else tuple(
            jnp.concatenate(vs, axis=-2) for vs in zip(*parts)
        )
    )

    new_carry = Collection(
        {k: cout[j, :K, :nx] for j, k in enumerate(C_CARRY_KEYS)}
    )
    seasonal = Seasonal(
        winter=Collection({k: wint[i, :K, :nx] for i, k in enumerate(C_OUT_VARS)}),
        summer=Collection({k: summ[i, :K, :nx] for i, k in enumerate(C_OUT_VARS)}),
        avg=Collection({k: avg[i, :K, :nx] for i, k in enumerate(C_OUT_VARS)}),
    )
    return new_carry, seasonal, None, None


def _classic_kernel_xk(
    f_ref,      # SMEM (nt,) shared forcing
    cosv_ref,   # SMEM (nt+1,) cos(2 pi t) incl. wraparound entry — the S
                # table is separable ((S0 - S2 x^2) - (S1 cos) x); each step
                # rebuilds its column bitwise-identically from static columns,
                # per-member parameter rows, and this scalar
    cin_ref,    # VMEM (2, nxs, Kt) carry in: E, Tg — grid on sublanes
    cols_ref,   # VMEM (nxs, 8): pad mask, x, x^2, geom.lo, geom.di, geom.up, 0, 0
    pars_ref,   # VMEM (len(C_PAR_NAMES)+6, Kt) per-member parameter rows
                # (the last 5 are XK_TABLE_ROWS — sweepable here)
    cout_ref,   # VMEM (2, nxs, Kt)
    wint_ref,   # VMEM (3, nxs, Kt)
    summ_ref,   # VMEM (3, nxs, Kt)
    avg_ref,    # VMEM (3, nxs, Kt)
    *, nt: int, w0: int, s0: int, dt: float, cfg, noise_ref=None,
    ou: bool = False, eta_ref=None, keys_ref=None, assoc: bool = False,
    crossing: bool = False, cross_ref=None,
):
    """Transposed twin of :func:`_classic_kernel` (grid on sublanes,
    members on lanes; ``classic.step`` with ``grid_axis=0``).

    ``noise_ref`` (via :func:`_classic_kernel_xk_noisy`): optional
    ``(nt_pad, Kt)`` per-step per-member forcing-offset table; with
    ``ou=True`` (via :func:`_classic_kernel_xk_ou`) it is WHITE noise and
    the OU recurrence runs in-kernel (rows ``_C_OU_RHO``/``_SCALE``/
    ``_ETA0``, year-end eta written to ``eta_ref``) — see
    :func:`_kernel_xk`. ``keys_ref``/``assoc`` (via the ``_gen``
    adapters): in-kernel draw generation into the noise SCRATCH, and the
    log-depth OU-path precompute — also per :func:`_kernel_xk`."""
    from ..models import classic

    dtype = cin_ref.dtype
    nxs, Kt = cin_ref.shape[1], cin_ref.shape[2]

    col = {n: pars_ref[i:i + 1, :] for i, n in enumerate(C_PAR_NAMES)}
    tab = {n: pars_ref[_C_XK_TAB + i:_C_XK_TAB + i + 1, :]
           for i, n in enumerate(XK_TABLE_ROWS)}
    mask = cols_ref[:, 0:1]   # 1 on real grid rows, 0 on sublane padding
    colX = cols_ref[:, 1:2]   # x
    colX2 = cols_ref[:, 2:3]  # x^2
    # statics rebuilt from per-member rows, same op order as the table build
    # (bitwise-identical for scalar members; 0 on padded rows)
    colA = tab["S0"] * mask - tab["S2"] * colX2   # S0 - S2 x^2
    aw = tab["a0"] * mask - tab["a2"] * colX2
    # implicit-matrix bands, scaled per member once (kdi = 1 + dt_tau on the
    # decoupled padded rows — nonzero, so the padded PCR rows stay healthy)
    klo = -col["Dcg"] * cols_ref[:, 3:4]
    kdi = (1.0 + col["dt_tau"]) - col["Dcg"] * cols_ref[:, 4:5]
    kup = -col["Dcg"] * cols_ref[:, 5:6]
    stat = Collection(
        cg_tau=col["cg_tau"], dt_tau=col["dt_tau"], dc=col["dc"],
        M=col["M"], kLf=col["kLf"], aw=aw, klo=klo, kdi=kdi, kup=kup, dt=dt,
    )
    par = Collection(ai=col["ai"], A=col["A"], Fb=col["Fb"],
                     cw=col["cw"], Lf=col["Lf"])
    carry0 = Collection({k: cin_ref[j] for j, k in enumerate(C_CARRY_KEYS)})
    for i in range(len(C_OUT_VARS)):
        avg_ref[i] = jnp.zeros((nxs, Kt), dtype)
    if ou:
        ou_rho = pars_ref[_C_OU_RHO:_C_OU_RHO + 1, :]
        ou_scale = pars_ref[_C_OU_SCALE:_C_OU_SCALE + 1, :]
        eta_init = pars_ref[_C_OU_ETA0:_C_OU_ETA0 + 1, :]
    if keys_ref is not None:
        _gen_noise_xk(noise_ref, keys_ref, noise_ref.shape[0])
    serial_ou = ou and not assoc
    if ou and assoc:
        _assoc_ou_path(noise_ref, ou_rho, ou_scale, eta_init,
                       noise_ref.shape[0])
    if serial_ou:
        carry0 = (carry0, eta_init)
    if crossing:
        n_rows = pars_ref.shape[0]
        cr_thr = pars_ref[n_rows - 2:n_rows - 1, :]
        cr_sign = pars_ref[n_rows - 1:n_rows, :]
        wcol = cols_ref[:, 6:7]  # trapezoid quadrature weights
        carry0 = (carry0, jnp.full((1, Kt), -1.0, dtype))

    def body(t, state):
        if crossing:
            state, first = state
        if serial_ou:
            carry, eta = state
        else:
            carry = state
        f_t = f_ref[t] + pars_ref[_C_F_OFF:_C_F_OFF + 1, :]
        if serial_ou:
            eta = ou_rho * eta + ou_scale * noise_ref[pl.ds(t, 1), :]
            f_t = f_t + eta
        elif noise_ref is not None:
            f_t = f_t + _noise_row(noise_ref, t)
        xs = Collection(
            S_i=colA - (tab["S1"] * cosv_ref[t]) * colX,
            S_ip1=colA - (tab["S1"] * cosv_ref[t + 1]) * colX,  # wraparound (:61)
            f=f_t,
        )
        carry, out = classic.step(carry, xs, stat, par, cfg)
        for i, k in enumerate(C_OUT_VARS):
            avg_ref[i] = avg_ref[i] + out[k]

        @pl.when(t == w0)
        def _():
            for i, k in enumerate(C_OUT_VARS):
                wint_ref[i] = out[k]

        @pl.when(t == s0)
        def _():
            for i, k in enumerate(C_OUT_VARS):
                summ_ref[i] = out[k]

        new_state = (carry, eta) if serial_ou else carry
        if crossing:
            # classic instantaneous ice field: E < 0 (the driver's
            # area_of convention for phi-less models)
            ice = jnp.where(out["E"] < 0.0, jnp.ones((), dtype),
                            jnp.zeros((), dtype))
            area = jnp.sum(wcol * ice, axis=0, keepdims=True)
            crossed = (first < 0) & (cr_sign * (area - cr_thr) > 0)
            first = jnp.where(crossed,
                              lax.convert_element_type(t, dtype), first)
            return new_state, first
        return new_state

    carry = _time_loop(nt, body, carry0)
    if crossing:
        carry, first = carry
        cross_ref[...] = first
    if serial_ou:
        carry, eta = carry
        eta_ref[...] = eta
    elif ou:
        eta_ref[...] = noise_ref[pl.ds(nt - 1, 1), :]
    for j, k in enumerate(C_CARRY_KEYS):
        cout_ref[j] = carry[k]
    for i in range(len(C_OUT_VARS)):
        avg_ref[i] = avg_ref[i] / jnp.asarray(float(nt), dtype)


def _classic_year_xk(carry, par, fyear, st, cfg, block_k: int,
                     interpret: bool, noise=None, noise_ou=None,
                     noise_keys=None, ou_assoc: bool = False,
                     crossing=None):
    """Transposed-layout launch path of :func:`pallas_classic_year`
    (``layout='xk'``)."""
    import dataclasses

    from ..models.classic import uniform_bands

    cfg = dataclasses.replace(cfg, grid_axis=0)
    dtype = carry["E"].dtype
    itemsize = jnp.dtype(dtype).itemsize
    K, nx = carry["E"].shape
    nxs = _round_up(nx, 8)
    any_noise = noise is not None or noise_keys is not None
    unfit = _xk_fits(nx, block_k, itemsize, XK_PLANES_CLASSIC,
                     noise_nt=st.nt if any_noise else 0)
    if unfit is not None:
        raise ValueError(unfit)
    Kt = block_k
    Kp = _round_up(K, Kt)
    nt = st.nt
    w0 = st.winter_inx - 1
    s0 = st.summer_inx - 1

    par = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    # table parameters ride as per-member rows (sweepable); the statics
    # scalars are recomputed here with the same ops classic.statics uses
    stat_min = Collection(
        cg_tau=par["cg"] / par["tau"],
        dt_tau=st.dt / par["tau"],
        M=par["B"] + par["cg"] / par["tau"],
        kLf=par["k"] * par["Lf"],
    )
    stat_min["dc"] = stat_min["dt_tau"] * stat_min["cg_tau"]

    pars_parts = [
        _classic_par_stack(par, stat_min, st, K, dtype),
        jnp.stack([_member_column(par[n], K) for n in XK_TABLE_ROWS], axis=1),
    ]
    if noise_ou is not None:
        rho_ou, scale_ou, eta0_ou = (jnp.asarray(v, dtype) for v in noise_ou)
        pars_parts.append(jnp.stack(
            [_member_column(rho_ou, K), _member_column(scale_ou, K),
             _member_column(eta0_ou, K)], axis=1))
    if crossing is not None:
        cr_thr, cr_sign = (jnp.asarray(v, dtype) for v in crossing)
        pars_parts.append(jnp.stack(
            [_member_column(cr_thr, K), _member_column(cr_sign, K)],
            axis=1))
    pars = jnp.concatenate(pars_parts, axis=1)  # (K, C_PAR+6[+3][+2])
    n_rows = pars.shape[1]
    pars_t = jnp.pad(pars, ((0, Kp - K), (0, 0)), mode="edge").T
    if noise_ou is not None and Kp > K:
        # zero noise on padded lanes (see _miz_year_xk; advisor r4)
        pars_t = _zero_pad_ou_rows(pars_t, K, _C_OU_SCALE, _C_OU_ETA0)

    x = jnp.asarray(st.x, dtype=dtype)
    t = jnp.asarray(st.t, dtype=dtype)
    cosv = jnp.cos(2.0 * jnp.pi * t)
    cosv = jnp.concatenate([cosv, cosv[:1]])  # wraparound entry (nt+1,)

    def pad_col(v):
        return jnp.pad(jnp.asarray(v, dtype), (0, nxs - nx))

    geom = uniform_bands(nx)
    cols = jnp.stack(
        [
            pad_col(jnp.ones((nx,), dtype)),  # pad mask
            pad_col(x),
            pad_col(x**2),
            pad_col(geom.lo),
            pad_col(geom.di),
            pad_col(geom.up),
            _trapezoid_weights(st.x, nx, nxs, dtype),  # crossing quad.
            jnp.zeros((nxs,), dtype),
        ],
        axis=1,
    )  # (nxs, 8)

    def pad_kx_t(v):
        return jnp.pad(jnp.asarray(v, dtype), ((0, Kp - K), (0, nxs - nx))).T

    cin = jnp.stack([pad_kx_t(carry[k]) for k in C_CARRY_KEYS])  # (2, nxs, Kp)
    f = jnp.asarray(fyear, dtype=dtype)
    noise_p = _pad_noise_xk(noise, nt, K, Kp, dtype)
    keys_p = _pad_keys_xk(noise_keys, K, Kp)
    nt_pad = _round_up(nt, 8)

    nv = len(C_OUT_VARS)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk2 = pl.BlockSpec((2, nxs, Kt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((nv, nxs, Kt), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def launch(cin_s, pars_s, noise_s, keys_s):
        ks = cin_s.shape[2]
        kern_kw = {}
        scratch_shapes = []
        if keys_s is not None:
            kernel = _classic_kernel_xk_gen_ou  # keys mode is OU-only
            kern_kw["assoc"] = ou_assoc
            kern_kw["crossing"] = crossing is not None
            scratch_shapes = [pltpu.VMEM((nt_pad, Kt), dtype)]
        elif noise_s is None:
            kernel = _classic_kernel_xk
        elif noise_ou is not None:
            kernel = _classic_kernel_xk_ou
        else:
            kernel = _classic_kernel_xk_noisy
        in_specs = [smem, smem]
        inputs = [f, cosv]
        if noise_s is not None:
            in_specs.append(pl.BlockSpec(
                (noise_s.shape[0], Kt), lambda i: (0, i),
                memory_space=pltpu.VMEM))
            inputs.append(noise_s)
        if keys_s is not None:
            in_specs.append(pl.BlockSpec(
                (2, Kt), lambda i: (0, i), memory_space=pltpu.VMEM))
            inputs.append(keys_s)
        in_specs += [
            blk2,
            pl.BlockSpec((nxs, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, Kt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ]
        inputs += [cin_s, cols, pars_s]
        out_shape = [
            jax.ShapeDtypeStruct((2, nxs, ks), dtype),
            jax.ShapeDtypeStruct((nv, nxs, ks), dtype),
            jax.ShapeDtypeStruct((nv, nxs, ks), dtype),
            jax.ShapeDtypeStruct((nv, nxs, ks), dtype),
        ]
        out_specs = [blk2, blk3, blk3, blk3]
        if noise_ou is not None:
            out_shape.append(jax.ShapeDtypeStruct((1, ks), dtype))
            out_specs.append(pl.BlockSpec((1, Kt), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        if crossing is not None:
            out_shape.append(jax.ShapeDtypeStruct((1, ks), dtype))
            out_specs.append(pl.BlockSpec((1, Kt), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(
                kernel, nt=nt, w0=w0, s0=s0, dt=st.dt, cfg=cfg, **kern_kw
            ),
            grid=(ks // Kt,),
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            ),
            interpret=interpret,
        )(*inputs)

    parts = [
        launch(
            lax.slice_in_dim(cin, s, s + n, axis=2),
            lax.slice_in_dim(pars_t, s, s + n, axis=1),
            None if noise_p is None
            else lax.slice_in_dim(noise_p, s, s + n, axis=1),
            None if keys_p is None
            else lax.slice_in_dim(keys_p, s, s + n, axis=1),
        )
        for s, n in _member_slabs(Kp, Kt)
    ]
    eta_end = cross_out = None
    cols_out = list(zip(*parts))
    cout, wint, summ, avg = (
        (jnp.concatenate(vs, axis=-1) if len(parts) > 1 else vs[0])
        for vs in cols_out[:4])
    i = 4
    if noise_ou is not None:
        eta_end = (jnp.concatenate(cols_out[i], axis=-1)
                   if len(parts) > 1 else cols_out[i][0])[0, :K]
        i += 1
    if crossing is not None:
        cross_out = (jnp.concatenate(cols_out[i], axis=-1)
                     if len(parts) > 1 else cols_out[i][0])

    def unpack(block, i):
        return block[i, :nx, :K].T

    new_carry = Collection(
        {k: unpack(cout, j) for j, k in enumerate(C_CARRY_KEYS)}
    )
    seasonal = Seasonal(
        winter=Collection({k: unpack(wint, i) for i, k in enumerate(C_OUT_VARS)}),
        summer=Collection({k: unpack(summ, i) for i, k in enumerate(C_OUT_VARS)}),
        avg=Collection({k: unpack(avg, i) for i, k in enumerate(C_OUT_VARS)}),
    )
    if crossing is not None:
        return new_carry, seasonal, None, eta_end, cross_out[0, :K]
    return new_carry, seasonal, None, eta_end
