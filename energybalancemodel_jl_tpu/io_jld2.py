"""Best-effort reader for JLD2 files (the reference's persistence format).

JLD2 files are HDF5 containers: plain-bits Julia arrays (``Vector{Float64}``)
are ordinary HDF5 datasets; nested arrays are datasets of HDF5 object
references; structs (including ``Dict`` internals) are compound datasets
whose committed datatype carries a ``julia_type`` attribute. The reference
saves whole ``Solutions`` objects this way (/root/reference/src/io.jl:10-16
via ``JLD2.save_object``; the test fixture via ``jldsave``,
/root/reference/test/runtests.jl:17).

:func:`read_jld2` walks the HDF5 tree generically and decodes what it can:

- numeric/string datasets -> numpy arrays / str
- reference datasets -> recursively dereferenced (Julia vector-of-vectors
  becomes a list of arrays)
- compound datasets -> dict of field name -> decoded value (Julia structs)
- ``Dict{Symbol,V}`` internals (``keys``/``vals`` + ``count`` slots) are
  flattened to a plain ``{str: value}`` dict when recognized

This is sufficient to extract the raw solution arrays from a reference
fixture for cross-validation; it does not aim to reconstruct arbitrary
Julia objects.
"""
from __future__ import annotations

from typing import Any

import h5py
import numpy as np

from .utils.collection import Collection

__all__ = ["read_jld2", "extract_dict"]

_MAX_DEPTH = 32


def _decode(obj, f: h5py.File, depth: int = 0) -> Any:
    if depth > _MAX_DEPTH:
        return obj
    if isinstance(obj, h5py.Group):
        return {k: _decode(obj[k], f, depth + 1) for k in obj.keys()}
    if isinstance(obj, h5py.Dataset):
        return _decode_dataset(obj, f, depth)
    return obj


def _decode_dataset(ds: h5py.Dataset, f: h5py.File, depth: int) -> Any:
    dt = ds.dtype
    data = ds[()]
    return _decode_value(data, dt, f, depth)


def _decode_value(data, dt, f: h5py.File, depth: int) -> Any:
    if depth > _MAX_DEPTH:
        return data
    # object references → dereference recursively
    if h5py.check_ref_dtype(dt) is not None:
        def deref(r):
            if not r:
                return None  # null reference (#undef slot)
            return _decode(f[r], f, depth + 1)

        if np.isscalar(data) or getattr(data, "shape", ()) == ():
            return deref(data)
        flat = [deref(r) for r in np.asarray(data).ravel()]
        return flat if np.asarray(data).ndim == 1 else np.reshape(
            np.empty(len(flat), object), np.asarray(data).shape
        )
    # compound (Julia struct) → dict of fields
    if dt.names:
        def decode_record(rec):
            return {
                name: _decode_value(rec[name], dt.fields[name][0], f, depth + 1)
                for name in dt.names
            }

        if getattr(data, "shape", ()) == ():
            return decode_record(data)
        arr = np.asarray(data)
        if arr.ndim == 0:
            return decode_record(arr[()])
        return [decode_record(rec) for rec in arr]
    # variable-length strings
    if h5py.check_string_dtype(dt) is not None:
        if isinstance(data, bytes):
            return data.decode("utf-8", "replace")
        if np.isscalar(data):
            return str(data)
        return np.asarray(data).astype(str)
    # plain numeric
    return np.asarray(data) if not np.isscalar(data) else data


def read_jld2(path: str) -> Any:
    """Decode a JLD2/HDF5 file into nested Python objects.

    ``JLD2.save_object`` files decode from their ``single_stored_object``
    root; ``jldsave(path; name=obj)`` files decode to a dict of names.
    """
    with h5py.File(path, "r") as f:
        keys = [k for k in f.keys() if not k.startswith("_")]
        if keys == ["single_stored_object"]:
            return _decode(f["single_stored_object"], f)
        return {k: _decode(f[k], f) for k in keys}


def extract_dict(decoded: Any) -> Collection:
    """Flatten a decoded Julia ``Dict{Symbol,V}`` (or a struct wrapping one,
    like the reference's ``Collection``) into ``Collection{str: value}``.

    Julia's ``Dict`` stores parallel ``keys``/``vals`` arrays with ``#undef``
    holes (null references decoded to ``None``); entries are the positions
    where both are present.
    """
    node = decoded
    for probe in ("dict",):  # Collection wraps a Dict in field `dict`
        if isinstance(node, dict) and probe in node:
            node = node[probe]
    if isinstance(node, dict) and "keys" in node and "vals" in node:
        out = Collection()
        for k, v in zip(node["keys"], node["vals"]):
            if k is None or v is None:
                continue
            name = k if isinstance(k, str) else (
                k.get("symbol", str(k)) if isinstance(k, dict) else str(k)
            )
            out[str(name)] = v
        return out
    if isinstance(node, dict):
        return Collection(node)
    raise ValueError("decoded object does not look like a Julia Dict")
