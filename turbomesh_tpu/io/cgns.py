"""CGNS writer/reader using the CGNS/HDF5 file mapping directly via h5py.

Reference parity: src/core/cgns.zig (write): one base "Base" with
cell_dim=2, phys_dim=2; one Structured Zone_t per block named after the
block; RealDouble CoordinateX/CoordinateY vertex coordinates written in
Fortran order (i fastest — cgns.zig:74-102); optional vertex FlowSolution
"Smoothing" with fields P and Q (cgns.zig:110-161).

The reference links the CGNS C library; here we emit the standard
SIDS-to-HDF5 node layout (ADF-compatible node attributes name/label/type
and ' data' datasets) so standard tools (cgnslib, ParaView) can read the
file, with no C dependency on the write path.
"""

from __future__ import annotations

import numpy as np

CGNS_VERSION = np.float32(4.2)


def _set_node_attrs(group, name: str, label: str, type_code: str) -> None:
    group.attrs.create("name", np.bytes_(name.encode().ljust(33, b"\x00")[:33]), dtype="S33")
    group.attrs.create("label", np.bytes_(label.encode().ljust(33, b"\x00")[:33]), dtype="S33")
    group.attrs.create("type", np.bytes_(type_code.encode().ljust(3, b"\x00")[:3]), dtype="S3")
    group.attrs.create("flags", np.array([1], dtype=np.int32))


def _node(parent, name: str, label: str, type_code: str, data=None):
    g = parent.create_group(name)
    # CGNS/HDF5 stores link-order tracking; harmless if absent for readers
    _set_node_attrs(g, name, label, type_code)
    if data is not None:
        g.create_dataset(" data", data=data)
    return g


def _c1(parent, name: str, label: str, text: str):
    data = np.frombuffer(text.encode(), dtype=np.int8)
    return _node(parent, name, label, "C1", data)


def write_cgns(mesh, filename: str, control_function=None) -> None:
    import h5py

    with h5py.File(filename, "w") as f:
        root = f["/"]
        root.attrs.create("name", np.bytes_(b"HDF5 MotherNode".ljust(33, b"\x00")), dtype="S33")
        root.attrs.create("label", np.bytes_(b"Root Node of HDF5 File".ljust(33, b"\x00")), dtype="S33")
        root.attrs.create("type", np.bytes_(b"MT\x00"), dtype="S3")
        f.create_dataset(" format", data=np.frombuffer(b"IEEE_LITTLE_32\x00", dtype=np.int8))
        f.create_dataset(" hdf5version", data=np.frombuffer(b"HDF5 Version 1.10".ljust(33, b"\x00"), dtype=np.int8))

        _node(root, "CGNSLibraryVersion", "CGNSLibraryVersion_t", "R4",
              np.array([CGNS_VERSION], dtype=np.float32))

        # base: cell dimension 2, physical dimension 2 (cgns.zig:43)
        base = _node(root, "Base", "CGNSBase_t", "I4", np.array([2, 2], dtype=np.int32))

        row_start = 0
        for name, block in zip(mesh.names, mesh.blocks):
            ni, nj = block.size
            # Zone_t data: rows vertex/cell/boundary sizes, Fortran dims
            # (IndexDim, 3) -> h5py shape (3, IndexDim)
            size = np.array([[ni, nj], [ni - 1, nj - 1], [0, 0]], dtype=np.int32)
            zone = _node(base, name, "Zone_t", "I4", size)
            _c1(zone, "ZoneType", "ZoneType_t", "Structured")

            gc = _node(zone, "GridCoordinates", "GridCoordinates_t", "MT")
            # Fortran order (i fastest) for dims (ni, nj) == C array (nj, ni)
            x = np.ascontiguousarray(block.points[:, :, 0].T)
            y = np.ascontiguousarray(block.points[:, :, 1].T)
            _node(gc, "CoordinateX", "DataArray_t", "R8", x)
            _node(gc, "CoordinateY", "DataArray_t", "R8", y)

            if control_function is not None:
                sol = _node(zone, "Smoothing", "FlowSolution_t", "MT")
                _c1(sol, "GridLocation", "GridLocation_t", "Vertex")
                n = ni * nj
                cf = np.asarray(control_function)[row_start : row_start + n].reshape(ni, nj, 2)
                _node(sol, "P", "DataArray_t", "R8", np.ascontiguousarray(cf[:, :, 0].T))
                _node(sol, "Q", "DataArray_t", "R8", np.ascontiguousarray(cf[:, :, 1].T))
            row_start += ni * nj


def read_cgns(filename: str):
    """Read back block names and (Ni, Nj, 2) coordinate arrays."""
    import h5py

    names, blocks = [], []
    with h5py.File(filename, "r") as f:
        base = f["Base"]
        for key, node in base.items():
            if node.attrs.get("label", b"").rstrip(b"\x00") != b"Zone_t":
                continue
            x = node["GridCoordinates/CoordinateX/ data"][()]  # (nj, ni)
            y = node["GridCoordinates/CoordinateY/ data"][()]
            pts = np.stack([x.T, y.T], axis=-1)
            names.append(key)
            blocks.append(pts)
    return names, blocks
