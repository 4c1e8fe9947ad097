"""ctypes binding for the native mesh front-end (native/src/qmesh.cpp).

The native library is the production path for large external meshes (hashed
C++ BFS + parsing, replacing the reference's p4est C glue role at init);
hnumo_tpu/mesh/gmsh.py holds the pure-Python fallback and parity oracle.
Auto-builds `native/build/libqmesh.so` with g++ on first use; disable with
HNUMO_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_ROOT = Path(__file__).resolve().parents[2] / "native"


def _build_lib() -> Path | None:
    src = _ROOT / "src" / "qmesh.cpp"
    out = _ROOT / "build" / "libqmesh.so"
    if not src.exists():
        return None
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    # Never fall back to a stale .so older than the source (an ABI/behavior
    # change in qmesh.cpp must not be silently masked): compile to a unique
    # temp file and atomically rename on success; on any failure return None
    # so callers use the pure-Python oracle. The temp+rename also makes
    # concurrent builds (e.g. pytest-xdist) safe.
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".tmp{os.getpid()}.so")
    cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-shared",
           "-o", str(tmp), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
    except Exception:
        tmp.unlink(missing_ok=True)
        return None
    return out


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("HNUMO_NATIVE", "1") == "0":
        return None
    path = _build_lib()
    if path is None or not path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.qmesh_infer_layout.argtypes = [
        ctypes.c_int64, i64p, i64p, i64p, i64p, ctypes.c_char_p, ctypes.c_int]
    lib.qmesh_corner_table.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p, i64p,
        ctypes.c_char_p, ctypes.c_int]
    lib.qmesh_msh_sizes.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_char_p, ctypes.c_int]
    lib.qmesh_msh_data.argtypes = [
        f64p, i64p, i64p, i64p, i64p, ctypes.c_char_p, ctypes.c_int]
    lib.qmesh_partition.argtypes = [
        ctypes.c_int64, ctypes.c_int64, i64p, ctypes.c_char_p, ctypes.c_int]
    for fn in (lib.qmesh_infer_layout, lib.qmesh_corner_table,
               lib.qmesh_msh_sizes, lib.qmesh_msh_data, lib.qmesh_partition):
        fn.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _check(rc, err):
    if rc != 0:
        raise ValueError(err.value.decode() or f"qmesh error {rc}")


def infer_structured_layout(quads: np.ndarray):
    """Native equivalent of gmsh.infer_structured_layout. Returns
    (nely, nelx, elem_of, rot) or raises ValueError."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native qmesh unavailable")
    q = np.ascontiguousarray(quads, dtype=np.int64)
    nelem = len(q)
    dims = np.zeros(2, np.int64)
    elem_of = np.zeros(nelem, np.int64)
    rot = np.zeros(nelem, np.int64)
    err = ctypes.create_string_buffer(256)
    _check(lib.qmesh_infer_layout(nelem, _i64p(q), _i64p(dims),
                                  _i64p(elem_of), _i64p(rot), err, 256), err)
    nely, nelx = int(dims[0]), int(dims[1])
    return nely, nelx, elem_of.reshape(nely, nelx), rot


def corner_table(nely, nelx, quads, elem_of, rot) -> np.ndarray:
    lib = get_lib()
    q = np.ascontiguousarray(quads, dtype=np.int64)
    eo = np.ascontiguousarray(elem_of, dtype=np.int64)
    r = np.ascontiguousarray(rot, dtype=np.int64)
    corners = np.zeros((nely + 1) * (nelx + 1), np.int64)
    err = ctypes.create_string_buffer(256)
    _check(lib.qmesh_corner_table(nely, nelx, _i64p(q), _i64p(eo), _i64p(r),
                                  _i64p(corners), err, 256), err)
    return corners.reshape(nely + 1, nelx + 1)


def read_msh(path):
    """Native MSH 2.x parse.
    Returns (nodes, node_ids, quads, bedges, bc_map)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native qmesh unavailable")
    err = ctypes.create_string_buffer(256)
    sizes = np.zeros(4, np.int64)
    _check(lib.qmesh_msh_sizes(str(path).encode(), _i64p(sizes), err, 256), err)
    nnodes, nquads, nbedges, nbc = (int(v) for v in sizes)
    nodes = np.zeros((nnodes, 2), np.float64)
    node_ids = np.zeros(nnodes, np.int64)
    quads = np.zeros((nquads, 4), np.int64)
    bedges = np.zeros((max(nbedges, 1), 3), np.int64)
    bc_pairs = np.zeros((max(nbc, 1), 2), np.int64)
    _check(lib.qmesh_msh_data(
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _i64p(node_ids), _i64p(quads), _i64p(bedges), _i64p(bc_pairs),
        err, 256), err)
    bc_map = {int(t): int(c) for t, c in bc_pairs[:nbc]}
    return nodes, node_ids, quads, bedges[:nbedges], bc_map


def partition(n: int, p: int) -> np.ndarray:
    """Balanced 1D block partition bounds (len p+1)."""
    lib = get_lib()
    bounds = np.zeros(p + 1, np.int64)
    err = ctypes.create_string_buffer(256)
    _check(lib.qmesh_partition(n, p, _i64p(bounds), err, 256), err)
    return bounds


def available() -> bool:
    return get_lib() is not None
