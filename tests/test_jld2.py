"""JLD2 reader tests against synthetic HDF5 files exercising the same
primitives JLD2 uses (object references, compounds, string data)."""
import h5py
import numpy as np
import pytest

from energybalancemodel_jl_tpu.io_jld2 import extract_dict, read_jld2


def test_plain_arrays(tmp_path):
    path = str(tmp_path / "a.jld2")
    with h5py.File(path, "w") as f:
        f.create_dataset("x", data=np.arange(5.0))
        f.create_dataset("name", data="hello")
    out = read_jld2(path)
    np.testing.assert_array_equal(out["x"], np.arange(5.0))
    assert out["name"] == "hello"


def test_single_stored_object(tmp_path):
    path = str(tmp_path / "b.jld2")
    with h5py.File(path, "w") as f:
        f.create_dataset("single_stored_object", data=np.ones(3))
    np.testing.assert_array_equal(read_jld2(path), np.ones(3))


def test_vector_of_vectors_via_references(tmp_path):
    """Julia Vector{Vector{Float64}} → dataset of object references."""
    path = str(tmp_path / "c.jld2")
    with h5py.File(path, "w") as f:
        g = f.create_group("_refs")
        ds = [g.create_dataset(f"v{i}", data=np.full(4, float(i))) for i in range(3)]
        refs = np.array([d.ref for d in ds], dtype=h5py.ref_dtype)
        f.create_dataset("vv", data=refs)
    out = read_jld2(path)
    vv = out["vv"]
    assert len(vv) == 3
    np.testing.assert_array_equal(vv[2], np.full(4, 2.0))


def test_compound_struct(tmp_path):
    """Julia struct → HDF5 compound dataset."""
    path = str(tmp_path / "d.jld2")
    dt = np.dtype([("nx", "<i8"), ("dt", "<f8")])
    with h5py.File(path, "w") as f:
        f.create_dataset("st", data=np.array((180, 5e-4), dtype=dt))
    out = read_jld2(path)
    assert out["st"]["nx"] == 180
    assert out["st"]["dt"] == pytest.approx(5e-4)


def test_extract_dict_from_julia_dict_layout(tmp_path):
    """Julia Dict{Symbol,Vector} internals: parallel keys/vals reference
    arrays with #undef (null-reference) holes."""
    path = str(tmp_path / "e.jld2")
    with h5py.File(path, "w") as f:
        g = f.create_group("_refs")
        kE = g.create_dataset("kE", data="E")
        kT = g.create_dataset("kT", data="T")
        vE = g.create_dataset("vE", data=np.ones(4))
        vT = g.create_dataset("vT", data=np.zeros(4))
        null = h5py.Reference()
        keys = np.array([kE.ref, null, kT.ref], dtype=h5py.ref_dtype)
        vals = np.array([vE.ref, null, vT.ref], dtype=h5py.ref_dtype)
        d = f.create_group("dictlike")
        d.create_dataset("keys", data=keys)
        d.create_dataset("vals", data=vals)
        d.create_dataset("count", data=2)
    out = read_jld2(path)
    coll = extract_dict(out["dictlike"])
    assert set(coll.keys()) == {"E", "T"}
    np.testing.assert_array_equal(coll["E"], np.ones(4))
