"""Branch-free numeric helpers (rebuild of /root/reference/src/utilities.jl:389-415).

The reference mutates vectors through boolean masks (``condset!``, ``zeroref!``);
under XLA everything becomes ``jnp.where`` — pure, fusable, and safe inside
``jit``/``vmap``/``scan``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "crossmean",
    "hemispheric_mean",
    "condset",
    "zeroref",
    "nan_to_zero",
]


def crossmean(stack):
    """Mean across the leading (time) axis of a stacked solution array.

    Rebuild of ``crossmean`` (/root/reference/src/utilities.jl:390-395), which
    averages a vector-of-vectors elementwise. NaNs propagate, matching the
    reference's ``Statistics.mean`` semantics.
    """
    return jnp.mean(jnp.asarray(stack), axis=0)


def hemispheric_mean(vec, x):
    """Trapezoid integral of ``vec`` over the grid ``x``.

    Rebuild of ``hemispheric_mean`` (/root/reference/src/utilities.jl:397-403):
    ``sum_i (v_i + v_{i+1}) (x_{i+1} - x_i) / 2``. Works on numpy or jax arrays.
    """
    vec = jnp.asarray(vec)
    x = jnp.asarray(x)
    return jnp.sum((vec[..., :-1] + vec[..., 1:]) * (x[1:] - x[:-1]) / 2.0, axis=-1)


def condset(to, value, mask):
    """Pure analog of ``condset!`` (/root/reference/src/utilities.jl:406-412):
    return ``to`` with ``value`` where ``mask`` is true."""
    return jnp.where(mask, value, to)


def zeroref(v, ref):
    """Pure analog of ``zeroref!`` (/root/reference/src/utilities.jl:415):
    zero ``v`` where ``ref == 0``."""
    return jnp.where(ref == 0, jnp.zeros_like(v), v)


def nan_to_zero(v):
    """``condset!(v, 0.0, isnan)`` analog used by the MIZ step
    (/root/reference/src/miz.jl:157)."""
    return jnp.where(jnp.isnan(v), jnp.zeros_like(v), v)


def np_hemispheric_mean(vec: np.ndarray, x: np.ndarray) -> float:
    """NumPy twin of :func:`hemispheric_mean` for host-side plotting paths."""
    vec = np.asarray(vec)
    x = np.asarray(x)
    return float(np.sum((vec[:-1] + vec[1:]) * (x[1:] - x[:-1]) / 2.0))
