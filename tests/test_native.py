"""Native C++ mesh front-end (native/src/qmesh.cpp) vs the Python oracle.

The native library plays the role of the reference's p4est C glue
(src/p4est.c:1030-2043) at init time: MSH parsing, structured-layout
inference, corner extraction, block partitioning.
"""
import numpy as np
import pytest

from hnumo_tpu.mesh import _native
from hnumo_tpu.mesh.gmsh import infer_structured_layout, read_msh
from tests.test_gmsh import make_msh

pytestmark = pytest.mark.skipif(not _native.available(),
                                reason="native qmesh not built (no g++?)")


def test_layout_parity_scrambled(tmp_path):
    p = tmp_path / "m.msh"
    make_msh(p, 7, 5, (0, 7), (0, 5), deform=0.2,
             shuffle=np.random.default_rng(3))
    mesh = read_msh(p, native=False)
    ref = infer_structured_layout(mesh.quads, native=False)
    nat = _native.infer_structured_layout(mesh.quads)
    assert (nat[0], nat[1]) == (ref[0], ref[1])
    np.testing.assert_array_equal(nat[2], ref[2])
    np.testing.assert_array_equal(nat[3], ref[3])


def test_msh_parse_parity(tmp_path):
    p = tmp_path / "m.msh"
    make_msh(p, 4, 6, (0, 2), (0, 3), deform=0.1, bc_codes=(4, 2, 4, 2),
             bathy=lambda x, y: -10.0 - x - 2 * y)
    py = read_msh(p, native=False)
    nat = read_msh(p, native=True)
    np.testing.assert_allclose(nat.nodes, py.nodes)
    np.testing.assert_array_equal(nat.quads, py.quads)
    np.testing.assert_array_equal(np.sort(nat.boundary_edges, axis=0),
                                  np.sort(py.boundary_edges, axis=0))
    assert nat.bc_map == py.bc_map
    np.testing.assert_allclose(nat.bathy, py.bathy)


def test_corner_table_parity(tmp_path):
    p = tmp_path / "m.msh"
    make_msh(p, 5, 5, (0, 1), (0, 1), shuffle=np.random.default_rng(7))
    mesh = read_msh(p, native=False)
    nely, nelx, elem_of, rot = _native.infer_structured_layout(mesh.quads)
    nat = _native.corner_table(nely, nelx, mesh.quads, elem_of, rot)
    from hnumo_tpu.mesh.gmsh import structured_corner_coords

    _, ref = structured_corner_coords(mesh)
    np.testing.assert_array_equal(nat, ref)


def test_irregular_topology_rejected():
    # two quads sharing an edge + a third sharing the same edge: non-manifold
    quads = np.array([[0, 1, 2, 3], [1, 4, 5, 2], [1, 6, 7, 2]])
    with pytest.raises(ValueError):
        _native.infer_structured_layout(quads)
    with pytest.raises(ValueError):
        infer_structured_layout(quads, native=False)


def test_partition_bounds():
    b = _native.partition(10, 4)
    np.testing.assert_array_equal(b, [0, 3, 6, 8, 10])
    b = _native.partition(8, 4)
    np.testing.assert_array_equal(b, [0, 2, 4, 6, 8])


def test_native_used_by_default(tmp_path):
    """geometry_from_msh goes through the native parser when built."""
    p = tmp_path / "m.msh"
    make_msh(p, 3, 3, (0, 1), (0, 1))
    from hnumo_tpu.mesh.gmsh import geometry_from_msh

    geom, _ = geometry_from_msh(p, nop=3)
    assert (geom.nely, geom.nelx) == (3, 3)
