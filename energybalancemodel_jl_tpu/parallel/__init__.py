"""Ensemble and multi-chip parallelism (new capability; the reference is
single-process/single-thread — SURVEY.md §2 "Parallelism: none").

- :mod:`.ensemble` — ``vmap`` parameter ensembles on one chip.
- :mod:`.sharding` — data parallelism over a ``jax.sharding.Mesh`` (ensemble
  members sharded across chips over ICI; no collectives in the hot loop).
- :mod:`.halo` — spatial domain decomposition of the diffusion stencil via
  ``shard_map`` + ``ppermute`` halo exchange (for very high-resolution grids).
"""
from .ensemble import EnsembleSolutions, ensemble_integrate, sweep
from .sharding import ensemble_mesh, sharded_ensemble_integrate

__all__ = [
    "EnsembleSolutions",
    "ensemble_integrate",
    "sweep",
    "ensemble_mesh",
    "sharded_ensemble_integrate",
]
