"""Mid-run checkpoint / resume.

The reference has no mid-run checkpointing — a run restarts from ``init``
(SURVEY.md §5); its ``save``/``load!`` serialize only finished ``Solutions``.
Here the scan carry is a small pytree (a few KB), so the integrate driver can
write a checkpoint every N simulated years and resume a run bit-exactly:
the checkpoint holds the carry, the completed-year count, and the seasonal
storage accumulated so far.

Used through :func:`energybalancemodel_jl_tpu.integrate`::

    sols = integrate("MIZ", st, forcing, par, init,
                     checkpoint="run.ckpt.h5", checkpoint_every=5)
    # ... interrupted ...
    sols = integrate("MIZ", st, forcing, par, init,
                     checkpoint="run.ckpt.h5", resume=True)

Resume validates that the grid, duration, and parameters match the
checkpoint and continues from the first unfinished year; the returned
``Solutions`` is identical to an uninterrupted run (the scan carry is the
complete model state — reference ``@persistent`` warm starts included).
"""
from __future__ import annotations

import os
from typing import List, Tuple

import h5py
import numpy as np

from .utils.collection import Collection

__all__ = ["write_checkpoint", "read_checkpoint", "checkpoint_matches"]

_FORMAT = 1


def write_checkpoint(
    path: str,
    carry: Collection,
    years_done: int,
    seasonal_acc: Tuple[List[Collection], List[Collection], List[Collection]],
    config_key: str,
) -> str:
    """Atomically write a checkpoint (write to ``path.tmp`` then rename)."""
    tmp = path + ".tmp"
    winter, summer, avg = seasonal_acc
    with h5py.File(tmp, "w") as f:
        f.attrs["__ebm_type__"] = "Checkpoint"
        f.attrs["format"] = _FORMAT
        f.attrs["years_done"] = int(years_done)
        f.attrs["config_key"] = config_key
        g = f.create_group("carry")
        for k, v in carry.items():
            g.create_dataset(k, data=np.asarray(v))
        for name, acc in (("winter", winter), ("summer", summer), ("avg", avg)):
            ga = f.create_group(f"seasonal_{name}")
            for y, coll in enumerate(acc):
                gy = ga.create_group(str(y))
                for k, v in coll.items():
                    gy.create_dataset(k, data=np.asarray(v))
    os.replace(tmp, path)
    return path


def read_checkpoint(path: str):
    """Read a checkpoint; returns ``(carry, years_done, seasonal_acc,
    config_key)``."""
    with h5py.File(path, "r") as f:
        if f.attrs.get("__ebm_type__") != "Checkpoint":
            raise ValueError(f"{path} is not an integrate checkpoint")
        years_done = int(f.attrs["years_done"])
        config_key = str(f.attrs["config_key"])
        carry = Collection({k: np.asarray(v) for k, v in f["carry"].items()})
        acc = []
        for name in ("winter", "summer", "avg"):
            ga = f[f"seasonal_{name}"]
            acc.append(
                [
                    Collection({k: np.asarray(v) for k, v in ga[str(y)].items()})
                    for y in range(years_done)
                ]
            )
    return carry, years_done, tuple(acc), config_key


def checkpoint_matches(path: str, config_key: str) -> bool:
    if not os.path.exists(path):
        return False
    with h5py.File(path, "r") as f:
        return (
            f.attrs.get("__ebm_type__") == "Checkpoint"
            and str(f.attrs.get("config_key")) == config_key
        )
