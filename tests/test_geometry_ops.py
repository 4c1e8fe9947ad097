"""Geometry + DG operator tests.

Anchors (SURVEY.md §7.2): on a uniform brick jacq = wq*(dx*dy/4); gradient
of a polynomial of degree <= p is exact; divergence-theorem identity for the
weak volume integral + face scatter.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hnumo_tpu.core.faces import (BCs, apply_wall_projection, extract_faces,
                                  face_n2q, face_quad_scatter, scatter_face_x,
                                  scatter_face_y)
from hnumo_tpu.mesh.grid import build_geometry
from hnumo_tpu.ops.dg import (device_geom, grad_n2q, grad_nodal, interp_n2q,
                              project_q2n, scatter_volume)


@pytest.fixture(scope="module")
def geom():
    return build_geometry(nelx=4, nely=3, nop=4, xdims=(0.0, 2000.0), ydims=(0.0, 1500.0))


@pytest.fixture(scope="module")
def g(geom):
    return device_geom(geom, jnp.float64)


def test_uniform_jacobian(geom):
    dx, dy = 2000.0 / 4, 1500.0 / 3
    expect = np.outer(geom.wnq, geom.wnq) * (dx * dy / 4.0)
    np.testing.assert_allclose(geom.wjac[1, 2], expect, atol=1e-12)
    expect_df = np.outer(geom.wgl, geom.wgl) * (dx * dy / 4.0)
    np.testing.assert_allclose(geom.wjac_df[0, 0], expect_df, atol=1e-12)
    # metric terms constant: ksi_x = 2/dx
    np.testing.assert_allclose(geom.ksiq_x, 2.0 / dx, atol=1e-14)
    np.testing.assert_allclose(geom.etaq_y, 2.0 / dy, atol=1e-14)
    np.testing.assert_allclose(geom.ksiq_y, 0.0, atol=1e-14)


def test_mass_equals_area(geom):
    # sum of lumped mass over all DG nodes = domain area
    np.testing.assert_allclose(geom.wjac_df.sum(), 2000.0 * 1500.0, rtol=1e-13)
    np.testing.assert_allclose(geom.wjac.sum(), 2000.0 * 1500.0, rtol=1e-13)


def _poly_field(geom, fx):
    x = geom.coord[..., 0]
    y = geom.coord[..., 1]
    return fx(x, y)


def test_interp_and_gradient_exact(geom, g):
    # u = x^2 y + 3 x y^2 (degree <= p in each direction)
    u = _poly_field(geom, lambda x, y: x**2 * y + 3 * x * y**2)
    uq = interp_n2q(g, jnp.asarray(u))
    xq, yq = geom.coord_q[..., 0], geom.coord_q[..., 1]
    np.testing.assert_allclose(np.asarray(uq), xq**2 * yq + 3 * xq * yq**2, rtol=1e-10)
    ux, uy = grad_n2q(g, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ux), 2 * xq * yq + 3 * yq**2, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(uy), xq**2 + 6 * xq * yq, rtol=1e-9, atol=1e-8)


def test_nodal_gradient_exact(geom, g):
    u = _poly_field(geom, lambda x, y: 2 * x * y + y**3)
    ux, uy = grad_nodal(g, jnp.asarray(u))
    x, y = geom.coord[..., 0], geom.coord[..., 1]
    np.testing.assert_allclose(np.asarray(ux), 2 * y, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(uy), 2 * x + 3 * y**2, rtol=1e-9, atol=1e-8)


def test_projection_roundtrip(geom, g):
    u = _poly_field(geom, lambda x, y: 1.0 + x * y / 1e6 + (y / 1e3) ** 2)
    uq = interp_n2q(g, jnp.asarray(u))
    back = project_q2n(g, uq)
    np.testing.assert_allclose(np.asarray(back), u, rtol=1e-10, atol=1e-12)


def test_sum_grad_testfunctions_vanishes(geom, g):
    """sum_I grad(psi_I) = 0 pointwise, so the global scatter sum is ~0."""
    Fx = jnp.asarray(geom.coord_q[..., 0] ** 2)
    Fy = jnp.asarray(geom.coord_q[..., 0] * geom.coord_q[..., 1])
    rhs = scatter_volume(g, Fx=Fx, Fy=Fy)
    assert abs(np.asarray(rhs).sum()) < 1e-4 * np.abs(np.asarray(rhs)).max()


def test_dg_weak_divergence_identity(geom, g):
    """Full volume+face+mass pipeline computes -div F exactly for polynomial F.

    For continuous F:  massinv * [ sum_q w grad(psi).F  - faces(w psi F.n) ]
    equals -div F at the nodes when F is of quadrature-exact degree.
    This is exactly the structure of the mass RHS
    (src/mod_rhs_btp.F90:102-209 + :211-370).
    """
    bc = BCs(4, 4, 4, 4)
    x, y = geom.coord[..., 0], geom.coord[..., 1]
    u_nod = jnp.asarray(x**2)       # F = (x^2, x*y): div F = 3x
    v_nod = jnp.asarray(x * y)
    Fx = interp_n2q(g, u_nod)
    Fy = interp_n2q(g, v_nod)
    rhs = scatter_volume(g, Fx=Fx, Fy=Fy)
    # face flux: centered (L=R for continuous F), F.n at face quad points
    fu, fv = extract_faces(u_nod, bc, v=v_nod)
    # boundary mirrors perturb F at walls; use copy BCs for this identity
    bc0 = BCs(0, 0, 0, 0)
    fu, fv = extract_faces(u_nod, bc0, v=v_nod)
    uxq = face_n2q(g.psiq, 0.5 * (fu.xl + fu.xr))
    vyq = face_n2q(g.psiq, 0.5 * (fv.yl + fv.yr))
    flux_x = g.nx_x * uxq + g.ny_x * face_n2q(g.psiq, 0.5 * (fv.xl + fv.xr))
    flux_y = g.nx_y * face_n2q(g.psiq, 0.5 * (fu.yl + fu.yr)) + g.ny_y * vyq
    Sx = face_quad_scatter(g.psiq, g.jac_facex, flux_x)
    Sy = face_quad_scatter(g.psiq, g.jac_facey, flux_y)
    rhs = scatter_face_x(rhs, Sx, bc0)
    rhs = scatter_face_y(rhs, Sy, bc0)
    rhs = g.massinv * rhs
    np.testing.assert_allclose(np.asarray(rhs), -3.0 * x, rtol=1e-9, atol=1e-6)


def test_extract_faces_interior_consistency(geom, g):
    bc = BCs(4, 4, 4, 4)
    u = jnp.asarray(_poly_field(geom, lambda x, y: x + 2 * y))
    fl, _ = extract_faces(u, bc)
    # interior x-face fx=2: L trace = east edge of element 1 = same coords as
    # west edge of element 2 (continuous field -> equal)
    np.testing.assert_allclose(np.asarray(fl.xl[:, 1:-1]), np.asarray(fl.xr[:, 1:-1]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fl.yl[1:-1]), np.asarray(fl.yr[1:-1]), atol=1e-10)


def test_extract_faces_mirror(geom):
    bc = BCs(4, 4, 4, 4)
    u = jnp.asarray(_poly_field(geom, lambda x, y: x * 0 + 3.0))
    v = jnp.asarray(_poly_field(geom, lambda x, y: x * 0 + 5.0))
    fu, fv = extract_faces(u, bc, v=v)
    # free-slip x-wall: u mirrored to -u, v copied
    np.testing.assert_allclose(np.asarray(fu.xr[:, 0]), -3.0)
    np.testing.assert_allclose(np.asarray(fu.xr[:, -1]), -3.0)
    np.testing.assert_allclose(np.asarray(fv.xr[:, 0]), 5.0)
    # free-slip y-wall: v mirrored, u copied
    np.testing.assert_allclose(np.asarray(fv.yr[0]), -5.0)
    np.testing.assert_allclose(np.asarray(fu.yr[-1]), 3.0)


def test_periodic_extraction():
    geom = build_geometry(3, 3, 2, (0.0, 3.0), (0.0, 3.0), bc=(3, 3, 3, 3))
    bc = BCs(3, 3, 3, 3)
    u = jnp.asarray(geom.coord[..., 0])  # x coordinate
    fl, _ = extract_faces(u, bc)
    # x-face 0: L = east edge of last element (x=3), R = west edge of elem 0 (x=0)
    np.testing.assert_allclose(np.asarray(fl.xl[:, 0]), 3.0)
    np.testing.assert_allclose(np.asarray(fl.xr[:, 0]), 0.0)


def test_face_scatter_conservation(geom, g):
    """Total of face scatter contributions cancels on interior faces."""
    bc = BCs(4, 4, 4, 4)
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.normal(size=(3, 5, geom.ngl)))  # x-faces of 3x4 mesh
    rhs = jnp.zeros((3, 4, geom.ngl, geom.ngl))
    out = scatter_face_x(rhs, S, BCs(4, 4, 4, 4))
    # interior faces contribute -S to left and +S to right: total = boundary only
    total = np.asarray(out).sum()
    expect = -(np.asarray(S[:, 0]).sum() + np.asarray(S[:, -1]).sum())
    np.testing.assert_allclose(total, expect, atol=1e-12)
    Sy = jnp.asarray(rng.normal(size=(4, 4, geom.ngl)))
    out = scatter_face_y(jnp.zeros((3, 4, geom.ngl, geom.ngl)), Sy, BCs(4, 4, 4, 4))
    expect = -(np.asarray(Sy[0]).sum() + np.asarray(Sy[-1]).sum())
    np.testing.assert_allclose(np.asarray(out).sum(), expect, atol=1e-12)


def test_wall_projection():
    geom = build_geometry(2, 2, 2, (0.0, 1.0), (0.0, 1.0))
    bc = BCs(4, 4, 4, 4)
    qu = jnp.ones((2, 2, 3, 3))
    qv = jnp.ones((2, 2, 3, 3))
    qu2, qv2 = apply_wall_projection(qu, qv, bc)
    np.testing.assert_allclose(np.asarray(qu2[:, 0, :, 0]), 0.0)   # west wall u=0
    np.testing.assert_allclose(np.asarray(qu2[:, -1, :, -1]), 0.0)
    np.testing.assert_allclose(np.asarray(qv2[0, :, 0, :]), 0.0)   # south wall v=0
    # v untouched at x-wall non-corner nodes (corners also get the y-wall projection)
    np.testing.assert_allclose(np.asarray(qv2[0, 0, 1, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(qu2[0, 0, 0, 1]), 1.0)   # u untouched at y-walls (non-corner)


def test_face_n2q_scatter_adjoint(geom, g):
    """face_quad_scatter is the weighted adjoint of face_n2q."""
    rng = np.random.default_rng(1)
    fdf = jnp.asarray(rng.normal(size=(3, 5, geom.ngl)))
    flux = jnp.asarray(rng.normal(size=(3, 5, geom.nq)))
    jac = g.jac_facex
    lhs = np.asarray((face_n2q(g.psiq, fdf) * jac * flux).sum())
    rhs = np.asarray((fdf * face_quad_scatter(g.psiq, jac, flux)).sum())
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)
