"""External (gmsh) mesh reading + curvilinear geometry.

Covers the reference's external-mesh capability (src/read_gmsh.F90):
MSH 2.x parsing, $BC and $Bathy sections, logical-structure inference with
scrambled element order/orientation, bilinear high-order node population,
curvilinear metrics/normals, and end-to-end lake-at-rest well-balancedness
on a deformed mesh (docs/source/test.rst:15-41 analog).
"""
import numpy as np
import pytest

from hnumo_tpu.mesh.gmsh import (boundary_bc_codes, geometry_from_msh,
                                 infer_structured_layout, read_msh,
                                 structured_corner_coords)
from hnumo_tpu.mesh.grid import build_geometry, build_geometry_from_corners


def make_msh(path, nelx, nely, xdims, ydims, deform=0.0, shuffle=None,
             bathy=None, bc_codes=(4, 4, 4, 4)):
    """Write an MSH 2.2 ASCII file for an (nely, nelx) quad grid.

    deform: sinusoidal interior-vertex displacement amplitude (fraction of
    cell size). shuffle: np.random.Generator to scramble element order and
    rotate connectivity. bathy: callable (x, y) -> z for a $Bathy section.
    """
    nx, ny = nelx + 1, nely + 1
    xs = np.linspace(xdims[0], xdims[1], nx)
    ys = np.linspace(ydims[0], ydims[1], ny)
    X, Y = np.meshgrid(xs, ys)  # (ny, nx)
    if deform:
        dx = (xdims[1] - xdims[0]) / nelx
        dy = (ydims[1] - ydims[0]) / nely
        sx = np.sin(np.pi * (X - xdims[0]) / (xdims[1] - xdims[0]))
        sy = np.sin(np.pi * (Y - ydims[0]) / (ydims[1] - ydims[0]))
        X = X + deform * dx * sx * sy
        Y = Y + deform * dy * np.sin(2 * np.pi * (X - xdims[0]) / (xdims[1] - xdims[0])) * sy

    def nid(iy, ix):
        return iy * nx + ix + 1  # 1-based

    quads = []
    for ey in range(nely):
        for ex in range(nelx):
            quads.append([nid(ey, ex), nid(ey, ex + 1),
                          nid(ey + 1, ex + 1), nid(ey + 1, ex)])
    rng = shuffle
    if rng is not None:
        order = rng.permutation(len(quads))
        quads = [list(np.roll(quads[e], rng.integers(0, 4))) for e in order]

    # boundary line elements with physical tags 1..4 = W,E,S,N
    blines = []
    for iy in range(nely):
        blines.append((1, nid(iy, 0), nid(iy + 1, 0)))
        blines.append((2, nid(iy, nx - 1), nid(iy + 1, nx - 1)))
    for ix in range(nelx):
        blines.append((3, nid(0, ix), nid(0, ix + 1)))
        blines.append((4, nid(ny - 1, ix), nid(ny - 1, ix + 1)))

    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n$Nodes\n")
        f.write(f"{nx * ny}\n")
        for iy in range(ny):
            for ix in range(nx):
                f.write(f"{nid(iy, ix)} {X[iy, ix]:.16e} {Y[iy, ix]:.16e} 0\n")
        f.write("$EndNodes\n$Elements\n")
        f.write(f"{len(blines) + len(quads)}\n")
        k = 0
        for phys, a, b in blines:
            k += 1
            f.write(f"{k} 1 2 {phys} {phys} {a} {b}\n")
        for q in quads:
            k += 1
            f.write(f"{k} 3 2 99 99 {q[0]} {q[1]} {q[2]} {q[3]}\n")
        f.write("$EndElements\n$BC\n4\n")
        for phys, code in zip((1, 2, 3, 4), bc_codes):
            f.write(f"{phys} {code}\n")
        f.write("$EndBC\n")
        if bathy is not None:
            f.write("$Bathy\nnodal\n")
            for iy in range(ny):
                for ix in range(nx):
                    f.write(f"{nid(iy, ix)} {bathy(X[iy, ix], Y[iy, ix]):.16e}\n")
            f.write("$EndBathy\n")
    return X, Y


def test_read_and_infer_scrambled(tmp_path):
    """Layout inference recovers the grid from scrambled order/orientation."""
    p = tmp_path / "m.msh"
    make_msh(p, 5, 3, (0, 10), (0, 6), shuffle=np.random.default_rng(0))
    mesh = read_msh(p)
    assert mesh.quads.shape == (15, 4)
    nely, nelx, elem_of, rot = infer_structured_layout(mesh.quads)
    # the BFS picks its own axes; both orderings of (3,5) are valid
    assert {nely, nelx} == {3, 5}
    cc, idx = structured_corner_coords(mesh)
    # corner coords must form a coherent grid: every quad's vertices adjacent
    assert cc.shape == (nely + 1, nelx + 1, 2)
    # all 24 corner nodes used exactly once
    assert len(np.unique(idx)) == (nely + 1) * (nelx + 1)


def test_bc_codes_from_sections(tmp_path):
    p = tmp_path / "m.msh"
    make_msh(p, 4, 4, (0, 1), (0, 1), bc_codes=(4, 4, 2, 2))
    mesh = read_msh(p)
    cc, idx = structured_corner_coords(mesh)
    codes = boundary_bc_codes(mesh, idx)
    # orientation of the inferred grid may flip axes; the multiset of
    # (code) per side pair is preserved
    assert sorted(codes) == [2, 2, 4, 4]


def test_brick_parity_with_structured_builder(tmp_path):
    """gmsh path on an exact uniform brick == analytic structured builder."""
    p = tmp_path / "m.msh"
    make_msh(p, 4, 3, (0.0, 2.0), (0.0, 1.5))
    geom, zb = geometry_from_msh(p, nop=4)
    ref = build_geometry(4, 3, 4, (0.0, 2.0), (0.0, 1.5))
    assert zb is None
    assert (geom.nelx, geom.nely) == (ref.nelx, ref.nely)
    np.testing.assert_allclose(geom.coord, ref.coord, atol=1e-12)
    for name in ("wjac", "wjac_df", "ksiq_x", "etaq_y", "jac_facex",
                 "jac_facey", "nx_x", "ny_y", "nx_x_df", "ny_y_df",
                 "jac_facex_df", "jac_facey_df"):
        np.testing.assert_allclose(getattr(geom, name), getattr(ref, name),
                                   atol=1e-12, err_msg=name)


def test_curvilinear_gradient_exact_and_normals(tmp_path):
    """On a deformed (bilinear-element) mesh: gradients of linear fields are
    exact, face normals are unit outward, and L/R face geometry agrees."""
    import jax.numpy as jnp

    from hnumo_tpu.ops.dg import device_geom, grad_n2q

    p = tmp_path / "m.msh"
    make_msh(p, 6, 5, (0.0, 3.0), (0.0, 2.0), deform=0.3,
             shuffle=np.random.default_rng(1))
    geom, _ = geometry_from_msh(p, nop=4)
    g = device_geom(geom, jnp.float64)

    f = 2.0 * geom.coord[..., 0] + 3.0 * geom.coord[..., 1]
    fx, fy = grad_n2q(g, jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(fx), 2.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fy), 3.0, atol=1e-10)

    for nx, ny in ((geom.nx_x, geom.ny_x), (geom.nx_y, geom.ny_y),
                   (geom.nx_x_df, geom.ny_x_df), (geom.nx_y_df, geom.ny_y_df)):
        np.testing.assert_allclose(nx**2 + ny**2, 1.0, atol=1e-12)

    # jacobian positive everywhere (consistent orientation after inference)
    assert (geom.wjac > 0).all() and (geom.wjac_df > 0).all()

    # surface integral closure: sum over each element's 4 faces of
    # integral(n ds) = 0 (closed curve), using face tables
    intx = np.zeros((geom.nely, geom.nelx))
    inty = np.zeros((geom.nely, geom.nelx))
    jx, jy = geom.jac_facex, geom.jac_facey
    # outward for element (ey,ex): east face + , west face - (face normal is
    # outward-from-L = +x-ish), etc.
    intx += (jx[:, 1:] * geom.nx_x[:, 1:]).sum(-1) - (jx[:, :-1] * geom.nx_x[:, :-1]).sum(-1)
    inty += (jx[:, 1:] * geom.ny_x[:, 1:]).sum(-1) - (jx[:, :-1] * geom.ny_x[:, :-1]).sum(-1)
    intx += (jy[1:] * geom.nx_y[1:]).sum(-1) - (jy[:-1] * geom.nx_y[:-1]).sum(-1)
    inty += (jy[1:] * geom.ny_y[1:]).sum(-1) - (jy[:-1] * geom.ny_y[:-1]).sum(-1)
    # boundary faces have flipped (outward-of-domain) normals: west/south
    # boundary contribution enters with + sign instead of -; fix columns
    intx[:, 0] += 2 * (jx[:, 0] * geom.nx_x[:, 0]).sum(-1)
    inty[:, 0] += 2 * (jx[:, 0] * geom.ny_x[:, 0]).sum(-1)
    intx[0, :] += 2 * (jy[0] * geom.nx_y[0]).sum(-1)
    inty[0, :] += 2 * (jy[0] * geom.ny_y[0]).sum(-1)
    np.testing.assert_allclose(intx, 0.0, atol=1e-10)
    np.testing.assert_allclose(inty, 0.0, atol=1e-10)


def test_bathy_reading(tmp_path):
    p = tmp_path / "m.msh"
    make_msh(p, 4, 4, (0.0, 1000.0), (0.0, 1000.0),
             bathy=lambda x, y: -40.0 + 5.0 * np.exp(-((x - 500) ** 2 + (y - 500) ** 2) / 1e5))
    geom, zb = geometry_from_msh(p, nop=3)
    assert zb is not None and zb.shape == geom.coord.shape[:-1]
    # bilinear interp reproduces corner values at element corners
    mesh = read_msh(p)
    cc, idx = structured_corner_coords(mesh)
    np.testing.assert_allclose(zb[:, :, 0, 0], mesh.bathy[idx][:-1, :-1], atol=1e-12)
    np.testing.assert_allclose(zb[:, :, -1, -1], mesh.bathy[idx][1:, 1:], atol=1e-12)


def test_lake_at_rest_on_deformed_mesh(tmp_path):
    """Well-balancedness survives a curvilinear mesh + external bathymetry:
    free surface stays flat at rest over a seamount (the reference's
    lakeAtrest gate, docs/source/test.rst:15-41)."""
    from hnumo_tpu.config import Config
    from hnumo_tpu.io.diagnostics import derived_fields
    from hnumo_tpu.model import Model

    p = tmp_path / "m.msh"
    make_msh(p, 6, 6, (0.0, 1000.0), (0.0, 1000.0), deform=0.2,
             bathy=lambda x, y: -40.0 + 3.0 * (1.0 + np.cos(np.pi * min(1.0, np.hypot(x - 500, y - 500) / 250.0))))
    cfg = Config(nopx=3, nopy=3, nlayers=2, dt=50.0, dt_btp=2.0,
                 time_final=500.0, test_case="lakeatrest",
                 lread_external_grid=True, mesh_file=str(p),
                 dtype="float64")
    m = Model(cfg)
    s = m.state0
    for _ in range(10):
        s = m.step(s)
    assert bool(s.ok)
    q5 = derived_fields(m, s)
    ssh = q5[4, 0]          # top-interface elevation
    assert np.abs(ssh).max() < 1e-8, f"lake not at rest: {np.abs(ssh).max()}"
    assert np.abs(q5[1]).max() < 1e-8  # u stays zero
    assert np.abs(q5[2]).max() < 1e-8
