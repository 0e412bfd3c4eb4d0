"""Bitwise replication of ``jax.random.normal``'s threefry draw path.

The fused :func:`~energybalancemodel_jl_tpu.stochastic.transitions`
engine needs its per-step weather draws INSIDE the whole-year Pallas
kernel: feeding the kernel a fresh ``(nt, K)`` noise table every year
costs a measured +250 ms/yr of operand materialization at nt=2000/K=8192
(byte-proportional, producer-independent — BENCH_NOTES round-4
"Noise-operand anatomy"), while the per-member keys are 64 bits each.
This module re-implements the exact draw pipeline of
``jax.random.normal(key, (nt,), float32)`` as plain ``lax``/``jnp`` ops
that trace identically under XLA jit AND inside a Mosaic kernel body:

1. threefry2x32 block cipher — the op-for-op unrolled sequence of
   ``jax._src.prng._threefry2x32_lowering(use_rolled_loops=False)``
   (integer adds/xors/rotates: exact on every backend);
2. the *partitionable* counter layout (``jax_threefry_partitionable``,
   default True since jax 0.4.30): for a 1-D draw of length ``nt`` the
   element-``t`` bits are ``o0 ^ o1`` of the cipher applied to counter
   words ``(0, t)`` — no split-halves layout, every element independent;
3. bits -> U(lo, 1): mantissa-fill ``(bits >> 9) | 0x3F800000``, bitcast,
   ``- 1.0``, then ``max(lo, u*(hi-lo)+lo)`` with ``lo =
   nextafter(-1, 0)`` (``jax._src.random._uniform``);
4. ``sqrt(2) * erfinv`` with the Giles (2012) single-precision
   polynomial — exactly what ``chlo.erf_inv`` legalizes to for f32, so
   the replication is bitwise (verified EXHAUSTIVELY in
   ``tests/test_prng.py``: all 2^23 possible mantissa patterns).

Everything here is deliberately restricted to ops Mosaic can lower
(elementwise integer/float VPU ops, ``lax.bitcast_convert_type``), so
the same functions serve as the XLA-side oracle and the in-kernel
generator; bitwise equality between the two IS the correctness contract
(``scripts/tpu_check.py`` stage 'in-kernel draws').

No reference analog (the reference is deterministic); the keying
contract these draws plug into is `stochastic.py`'s
``fold_in(fold_in(PRNGKey(seed), member), year)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "threefry2x32", "erfinv_f32", "normal_from_bits", "normal_table",
]

_u32 = np.uint32

# Giles (2012) "Approximating the erfinv function", the f32 coefficient
# pair chlo.erf_inv lowers to (branch on w < 5).
_ERFINV_P1 = (
    2.81022636e-08, 3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
    0.00021858087, -0.00125372503, -0.00417768164, 0.246640727, 1.50140941,
)
_ERFINV_P2 = (
    -0.000200214257, 0.000100950558, 0.00134934322, -0.00367342844,
    0.00573950773, -0.0076224613, 0.00943887047, 1.00167406, 2.83297682,
)


def _rotl(x, d: int):
    """32-bit rotate left by a static distance (logical shifts, so the
    uint32 two's-complement bits are exact)."""
    return lax.shift_left(x, _u32(d)) | lax.shift_right_logical(
        x, _u32(32 - d))


def threefry2x32(k1, k2, x1, x2):
    """The threefry-2x32 block cipher on broadcastable uint32 arrays.

    Op-for-op the unrolled lowering jax itself uses
    (``jax._src.prng._threefry2x32_lowering``): 20 rounds in 5 groups of
    4 with rotation schedules (13, 15, 26, 6) / (17, 29, 16, 24) and a
    key injection after each group. Returns the two output words.
    """
    rot = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (k1, k2, k1 ^ k2 ^ _u32(0x1BD11BDA))
    x = [x1 + ks[0], x2 + ks[1]]

    def rounds(x, rs):
        for r in rs:
            x0 = x[0] + x[1]
            xr = _rotl(x[1], r)
            x = [x0, x0 ^ xr]
        return x

    x = rounds(x, rot[0]); x = [x[0] + ks[1], x[1] + ks[2] + _u32(1)]
    x = rounds(x, rot[1]); x = [x[0] + ks[2], x[1] + ks[0] + _u32(2)]
    x = rounds(x, rot[0]); x = [x[0] + ks[0], x[1] + ks[1] + _u32(3)]
    x = rounds(x, rot[1]); x = [x[0] + ks[1], x[1] + ks[2] + _u32(4)]
    x = rounds(x, rot[0]); x = [x[0] + ks[2], x[1] + ks[0] + _u32(5)]
    return x[0], x[1]


def erfinv_f32(x):
    """Inverse error function, f32 — the Giles polynomial pair that
    ``chlo.erf_inv`` legalizes to (bitwise vs ``lax.erf_inv``, verified
    exhaustively over every mantissa the draw pipeline can produce).
    Defined for |x| < 1 (the draw pipeline guarantees it)."""
    w = -jnp.log1p(-x * x)
    w1 = w - jnp.float32(2.5)
    w2 = jnp.sqrt(w) - jnp.float32(3.0)
    p1 = jnp.float32(_ERFINV_P1[0])
    for c in _ERFINV_P1[1:]:
        p1 = jnp.float32(c) + p1 * w1
    p2 = jnp.float32(_ERFINV_P2[0])
    for c in _ERFINV_P2[1:]:
        p2 = jnp.float32(c) + p2 * w2
    return jnp.where(w < jnp.float32(5.0), p1, p2) * x


def normal_from_bits(bits):
    """uint32 random bits -> f32 standard-normal draw, replicating
    ``_uniform`` (mantissa fill, ``lo = nextafter(-1, 0)``) followed by
    ``sqrt(2) * erfinv`` (``_normal_real``)."""
    lo = np.nextafter(np.float32(-1.0), np.float32(0.0), dtype=np.float32)
    hi = np.float32(1.0)
    fb = lax.shift_right_logical(bits, _u32(9)) | _u32(0x3F800000)
    floats = lax.bitcast_convert_type(fb, jnp.float32) - jnp.float32(1.0)
    u = lax.max(lo, floats * (hi - lo) + lo)
    return jnp.float32(np.sqrt(2)) * erfinv_f32(u)


@functools.partial(jax.jit, static_argnums=1)
def normal_table(keys, nt: int):
    """The fused engine's ``(nt, K)`` white-noise table from per-member
    keys — bitwise ``jax.vmap(lambda k: jax.random.normal(k, (nt,),
    jnp.float32), out_axes=1)(keys)`` under the default (partitionable)
    threefry.

    JITTED BY CONSTRUCTION: the bitwise contract only holds for the
    compiled graph — XLA contracts the pipeline's mul+add pairs into
    FMAs exactly as it does inside ``jax.random.normal`` (and as Mosaic
    does inside the generating kernels), while op-by-op eager execution
    rounds each op separately and drifts 1-2 ulp on ~4% of draws
    (measured; the same reason a ``fori_loop``-wrapped in-kernel fill
    was rejected in ``_gen_noise_xk``).

    ``keys`` is ``(K, 2)`` uint32 key DATA (``jax.random.key_data`` of
    already year-folded keys). Member ``k``'s element ``t`` uses counter
    words ``(0, t)`` and xors the two cipher outputs. Shared between the
    XLA oracle path and the in-kernel generator (which computes the same
    expression on ``(nt_pad, block_k)`` tiles).
    """
    keys = jnp.asarray(keys, _u32)
    K = keys.shape[0]
    k1 = keys[:, 0][None, :]                       # (1, K)
    k2 = keys[:, 1][None, :]
    c2 = lax.broadcasted_iota(_u32, (nt, 1), 0)    # (nt, 1) counter word
    zero = jnp.zeros((nt, K), _u32)
    o0, o1 = threefry2x32(jnp.broadcast_to(k1, (nt, K)),
                          jnp.broadcast_to(k2, (nt, K)),
                          zero, jnp.broadcast_to(c2, (nt, K)))
    return normal_from_bits(o0 ^ o1)
