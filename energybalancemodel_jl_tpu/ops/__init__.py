"""Numerical operators: diffusion stencil, tridiagonal solvers, Newton."""
from .diffusion import DiffusionGeometry, apply_diffusion, diffusion, diffusion_bands
from .newton import newton_tridiag
from .tridiag import pcr_solve, thomas_solve, tridiag_matvec, tridiag_solve

__all__ = [
    "DiffusionGeometry",
    "diffusion_bands",
    "apply_diffusion",
    "diffusion",
    "thomas_solve",
    "pcr_solve",
    "tridiag_solve",
    "tridiag_matvec",
    "newton_tridiag",
]
