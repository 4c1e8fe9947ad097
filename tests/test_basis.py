"""Unit tests for the basis layer (LGL points, Lagrange bases, filter, SSPRK).

Analytic anchors per SURVEY.md §4: known LGL nodes/weights, exact
interpolation/differentiation of polynomials up to order p.
"""
import numpy as np
import pytest

from hnumo_tpu.basis.lgl import Basis1D, lagrange_basis_at, lgl_points_weights, nodal_derivative_matrix
from hnumo_tpu.basis.filter import filter_matrix
from hnumo_tpu.basis.ssprk import ssprk_coefficients


def test_lgl_points_known_values():
    # ngl=3: {-1, 0, 1}, weights {1/3, 4/3, 1/3}
    x, w = lgl_points_weights(3)
    np.testing.assert_allclose(x, [-1.0, 0.0, 1.0], atol=1e-14)
    np.testing.assert_allclose(w, [1 / 3, 4 / 3, 1 / 3], atol=1e-14)
    # ngl=5: +-1, +-sqrt(3/7), 0
    x, w = lgl_points_weights(5)
    np.testing.assert_allclose(x[3], np.sqrt(3.0 / 7.0), atol=1e-14)
    np.testing.assert_allclose(w, [0.1, 49 / 90, 32 / 45, 49 / 90, 0.1], atol=1e-13)


@pytest.mark.parametrize("ngl", [2, 3, 5, 8])
def test_lgl_weights_sum_to_two(ngl):
    _, w = lgl_points_weights(ngl)
    np.testing.assert_allclose(w.sum(), 2.0, atol=1e-13)


@pytest.mark.parametrize("nop", [1, 2, 4, 7])
def test_quadrature_exactness(nop):
    # LGL with nq=2*nop+1 points integrates degree 2*(2nop+1)-3 = 4nop-1 >= 2nop exactly
    b = Basis1D(nop)
    for deg in range(0, 2 * nop + 1):
        integral = np.sum(b.wnq * b.xnq**deg)
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(integral, exact, atol=1e-12)


@pytest.mark.parametrize("nop", [2, 4, 6])
def test_lagrange_interpolation_exact_for_polynomials(nop):
    b = Basis1D(nop)
    coeffs = np.linspace(0.3, 1.1, nop + 1)
    poly = np.polynomial.Polynomial(coeffs)
    u_nodal = poly(b.xgl)
    u_quad = u_nodal @ b.psiq
    np.testing.assert_allclose(u_quad, poly(b.xnq), atol=1e-12)
    du_quad = u_nodal @ b.dpsiq
    np.testing.assert_allclose(du_quad, poly.deriv()(b.xnq), atol=1e-11)


@pytest.mark.parametrize("nop", [2, 4, 6])
def test_nodal_derivative_matrix(nop):
    b = Basis1D(nop)
    poly = np.polynomial.Polynomial(np.arange(1.0, nop + 2))
    du = poly(b.xgl) @ b.dpsi
    np.testing.assert_allclose(du, poly.deriv()(b.xgl), atol=1e-10)


def test_derivative_matrix_endpoint_values():
    # D[0,0] = -n(n+1)/4 (reference src/mod_legendre.F90:278)
    for nop in (3, 4, 6):
        b = Basis1D(nop)
        np.testing.assert_allclose(b.dpsi[0, 0], -nop * (nop + 1) / 4.0, atol=1e-11)
        np.testing.assert_allclose(b.dpsi[-1, -1], nop * (nop + 1) / 4.0, atol=1e-11)


def test_lagrange_cardinality():
    b = Basis1D(4)
    psi, _ = lagrange_basis_at(b.xgl, b.xgl)
    np.testing.assert_allclose(psi, np.eye(5), atol=1e-13)


def test_filter_matrix_preserves_constants():
    # Filtering must not touch the mean mode: F @ 1 = 1
    for wt in ("erf", "quad", "exp"):
        for bt in ("legendre", "modal"):
            f = filter_matrix(4, mu=0.2, weight_type=wt, basis_type=bt)
            np.testing.assert_allclose(f @ np.ones(5), np.ones(5), atol=1e-12)


def test_filter_mu_zero_is_identity():
    f = filter_matrix(4, mu=0.0)
    np.testing.assert_allclose(f, np.eye(5), atol=1e-13)


def test_ssprk_tables():
    a, beta = ssprk_coefficients(5)
    assert a.shape == (5, 3) and beta.shape == (5,)
    # each combination row sums to 1 (consistency)
    np.testing.assert_allclose(a.sum(axis=1), np.ones(5), atol=1e-12)
    # SSP(3,3) classic table
    a3, b3 = ssprk_coefficients(3)
    np.testing.assert_allclose(a3[1], [0.75, 0.25, 0.0])
    np.testing.assert_allclose(b3, [1.0, 0.25, 2.0 / 3.0])
    # LSRK5
    a5, b5 = ssprk_coefficients(5, "lsrk")
    np.testing.assert_allclose(a5[1, 0], -567301805773.0 / 1357537059087.0)
    np.testing.assert_allclose(b5[0], 1432997174477.0 / 9575080441755.0)
