"""JLD2 format conformance for ``write_jld2`` output (VERDICT r2 #9).

These checks are written against the documented JLD2 on-disk format
(juliaio.github.io/JLD2.jl and the serialization rules transcribed in
``io_jld2.py``'s module notes), NOT against what h5py happens to read
back — the point is to pin the structural facts a real ``JLD2.load``
depends on, so a regression in the writer is caught even without Julia
in the image:

- a JLD2 file IS an HDF5 file: signature bytes, and a superblock version
  JLD2.jl can parse (it reads versions 0 and 2 only — h5py's default is
  0; drifting to v3 via ``libver='latest'`` would silently break Julia
  interop with every h5py-level test still green);
- ``save_object`` stores under the exact dataset name
  ``single_stored_object`` with a SCALAR dataspace;
- committed datatypes live under ``/_types`` with zero-padded names and
  each carries a ``julia_type`` attribute whose on-disk layout is the
  ``Core.DataType`` representation ``{name::Vlen{String},
  parameters::Vlen{RelOffset}}`` — name a variable-length UTF-8 string,
  parameters a variable-length vector of object references;
- the DataType committed type is SELF-referential (its own
  ``julia_type`` names ``Core.DataType``);
- strings use UTF-8 (Julia strings/Symbols are UTF-8; an ASCII-charset
  regression would corrupt non-ASCII keys);
- bits arrays (``Vector{Float64}``) are plain little-endian f64 datasets
  with NO ``julia_type`` attribute (JLD2's natural mapping);
- ``Vector{Vector{Float64}}`` is a dataset of references WITH a
  ``julia_type`` of ``Core.Array`` carrying two parameters (eltype ref,
  ndims value ref);
- ``Dict{Symbol,V}`` is a vector of ``Pair`` compounds (JLD2 >= 0.5) of
  a COMMITTED pair type, with a dataset-level ``Base.Dict``
  ``julia_type``;
- ``nothing`` in a ``Union{T,Nothing}`` field is a NULL reference
  (all-zero bytes — the RelOffset(0) hole encoding);
- ``NTuple{N,T}`` fields are compounds named "1".."N";
- ``Bool`` type parameters are 1-byte integer heap values tagged
  ``Core.Bool``.

Reference intent: /root/reference/src/io.jl:10-16 (save_object),
test/runtests.jl:17 (jldsave). scripts/julia_roundtrip.jl remains the
harness for a genuine JLD2.jl byte-level validation where Julia exists.
"""
import os
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import energybalancemodel_jl_tpu as ebm  # noqa: E402
from energybalancemodel_jl_tpu.io_jld2 import write_jld2  # noqa: E402

HDF5_SIGNATURE = b"\x89HDF\r\n\x1a\n"


@pytest.fixture(scope="module")
def jld2_path(tmp_path_factory):
    st = ebm.SpaceTime.sin(12, 20, 2)
    sols = ebm.integrate("MIZ", st, ebm.Forcing(0.0),
                         ebm.default_parameters("MIZ"), ebm.zeros_init(st),
                         progress=False)
    path = str(tmp_path_factory.mktemp("jld2") / "conf.jld2")
    write_jld2(sols, path)
    return path


class TestContainer:
    def test_hdf5_signature_and_superblock_version(self, jld2_path):
        with open(jld2_path, "rb") as fh:
            head = fh.read(16)
        assert head[:8] == HDF5_SIGNATURE
        # the byte after the signature is the superblock version; JLD2.jl
        # parses ONLY versions 0 and 2, and h5py's default build writes 0
        # — pin it so a libver drift cannot silently break Julia interop
        assert head[8] == 0

    def test_save_object_convention(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            assert "single_stored_object" in f
            ds = f["single_stored_object"]
            assert ds.shape == ()  # scalar dataspace, one object
            assert ds.dtype.names is not None  # a struct, not bits

    def test_named_entry_convention(self, tmp_path):
        st = ebm.SpaceTime.sin(8, 10, 1)
        sols = ebm.integrate("MIZ", st, ebm.Forcing(0.0),
                             ebm.default_parameters("MIZ"),
                             ebm.zeros_init(st), progress=False,
                             raw_mode="none")
        path = str(tmp_path / "named.jld2")
        write_jld2(sols, path, name="sols")
        with h5py.File(path, "r") as f:
            assert "sols" in f and "single_stored_object" not in f


class TestCommittedDatatypes:
    def test_types_group_layout(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            types = f["_types"]
            assert len(types) > 0
            for key in types:
                # zero-padded 8-digit names, committed datatype objects
                assert len(key) == 8 and key.isdigit()
                assert isinstance(types[key], h5py.Datatype)
                assert "julia_type" in types[key].attrs

    def test_julia_type_attribute_is_the_datatype_layout(self, jld2_path):
        # {name::Vlen{String}, parameters::Vlen{RelOffset}} — the on-disk
        # Core.DataType representation every julia_type attribute uses
        with h5py.File(jld2_path, "r") as f:
            for key in f["_types"]:
                jt = f["_types"][key].attrs["julia_type"]
                assert jt.dtype.names == ("name", "parameters")
                name_dt, _ = jt.dtype.fields["name"]
                assert h5py.check_string_dtype(name_dt) is not None
                par_dt, _ = jt.dtype.fields["parameters"]
                base = h5py.check_vlen_dtype(par_dt)
                assert base is not None
                assert h5py.check_ref_dtype(base) is not None

    def test_datatype_bootstrap_is_self_referential(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            names = {key: f["_types"][key].attrs["julia_type"]["name"]
                     for key in f["_types"]}
            names = {k: (v.decode() if isinstance(v, bytes) else str(v))
                     for k, v in names.items()}
            assert "Core.DataType" in names.values()

    def test_strings_are_utf8(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            for key in f["_types"]:
                jt_dt = f["_types"][key].attrs["julia_type"].dtype
                info = h5py.check_string_dtype(jt_dt.fields["name"][0])
                assert info.encoding == "utf-8"

    def test_type_parameters_dereference(self, jld2_path):
        # the Solutions type's parameters are RelOffsets to DataType
        # instance datasets (typeof(sin)) / tagged value datasets (C::Bool)
        with h5py.File(jld2_path, "r") as f:
            types = f["_types"]
            sol = None
            for key in types:
                nm = types[key].attrs["julia_type"]["name"]
                nm = nm.decode() if isinstance(nm, bytes) else str(nm)
                if nm.endswith(".Solutions"):
                    sol = types[key]
            assert sol is not None
            params = sol.attrs["julia_type"]["parameters"]
            assert len(params) == 2
            grid_t = f[params[0]]
            nm = grid_t.fields("name")[()]
            assert (nm.decode() if isinstance(nm, bytes)
                    else str(nm)) == "typeof(Base.sin)"
            cval = f[params[1]]
            assert cval[()] == 1  # C = true (constant forcing), Bool as u1
            tag = cval.attrs["julia_type"]["name"]
            assert (tag.decode() if isinstance(tag, bytes)
                    else str(tag)) == "Core.Bool"


class TestValueEncodings:
    def test_bits_vector_is_plain_f64(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            obj = f["single_stored_object"][()]
            ts = f[obj["ts"]]
            assert ts.dtype == np.dtype("<f8")
            assert "julia_type" not in ts.attrs  # natural mapping

    def test_vector_of_vectors_is_tagged_reference_array(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            obj = f["single_stored_object"][()]
            raw_dict = f[obj["raw"]["dict"]]
            ref = raw_dict["second"][0]
            vv = f[ref]
            assert h5py.check_ref_dtype(vv.dtype) is not None
            nm = vv.attrs["julia_type"]["name"]
            assert (nm.decode() if isinstance(nm, bytes)
                    else str(nm)) == "Core.Array"
            assert len(vv.attrs["julia_type"]["parameters"]) == 2
            inner = f[vv[0]]
            assert inner.dtype == np.dtype("<f8")

    def test_dict_is_committed_pair_vector(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            obj = f["single_stored_object"][()]
            par_ds = f[obj["parameters"]["dict"]]
            assert par_ds.dtype.names == ("first", "second")
            assert par_ds.id.get_type().committed()
            nm = par_ds.attrs["julia_type"]["name"]
            assert (nm.decode() if isinstance(nm, bytes)
                    else str(nm)) == "Base.Dict"
            # keys are Symbols -> variable-length UTF-8 strings
            info = h5py.check_string_dtype(par_ds.dtype.fields["first"][0])
            assert info is not None and info.encoding == "utf-8"

    def test_nothing_is_a_null_reference_hole(self, jld2_path):
        # Union{T,Nothing} 'nothing' = RelOffset(0): the stored reference
        # must be the all-zero (falsy, undereferenceable) hole
        with h5py.File(jld2_path, "r") as f:
            obj = f["single_stored_object"][()]
            dbg = obj["debug"]
            assert isinstance(dbg, h5py.Reference)
            assert not bool(dbg)
            assert bool(obj["ts"])  # a real field's reference is non-null

    def test_ntuple_fields_are_numbered(self, jld2_path):
        with h5py.File(jld2_path, "r") as f:
            dt = f["single_stored_object"].dtype
            forcing_dt = dt.fields["forcing"][0]
            assert forcing_dt.fields["domain"][0].names == tuple(
                str(i) for i in range(1, 6))
            assert forcing_dt.fields["holdyrs"][0].names == ("1", "2")

    def test_steprangelen_twiceprecision_layout(self, jld2_path):
        # SpaceTime.T is a StepRangeLen{Float64,TwicePrecision,...}:
        # {ref{hi,lo}, step{hi,lo}, len, offset}
        with h5py.File(jld2_path, "r") as f:
            st_dt = f["single_stored_object"].dtype.fields["spacetime"][0]
            T_dt = st_dt.fields["T"][0]
            assert T_dt.names == ("ref", "step", "len", "offset")
            assert T_dt.fields["ref"][0].names == ("hi", "lo")
            obj = f["single_stored_object"][()]
            T = obj["spacetime"]["T"]
            assert T["len"] == 2 * 20  # dur * nt
            assert T["offset"] == 1
