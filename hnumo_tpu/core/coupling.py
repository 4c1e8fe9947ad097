"""Barotropic<->baroclinic coupling coefficient fields.

Reference: btp_bcl_coeffs_qdf (src/mod_barotropic_terms.F90:219-409).
Computed twice per baroclinic dt (predictor and corrector) and consumed by
every barotropic substep. All layer loops become vectorized cumsums /
reductions over the leading layer axis.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.dg import DeviceGeom, grad_nodal, interp_n2q
from .faces import BCs, extract_faces, face_n2q
from .types import CouplingFields, Pair, Precomputed


def _cumsum_pressure(dpp, alpha):
    """p'_k interfaces (cumsum over layers, zero at surface) and the layer
    pressure-force H_k = 0.5*alpha_k*(p'_{k+1}^2 - p'_k^2).

    dpp: (L, ...); returns (p_lower (L, ...), H (L, ...)) where p_lower[k] is
    the interface below layer k.
    """
    p_lower = jnp.cumsum(dpp, axis=0)
    p_upper = p_lower - dpp
    al = alpha.reshape((-1,) + (1,) * (dpp.ndim - 1))
    H = 0.5 * al * (p_lower**2 - p_upper**2)
    return p_lower, H


def btp_bcl_coeffs(
    static,
    P: Precomputed,
    g: DeviceGeom,
    bc: BCs,
    qprime_df,        # (3, L, nodal)
    qprime_faces,     # tuple of 3 FaceLR (dp', u', v') nodal traces per layer
    dpprime_visc,     # (L, nodal)
    dpprime_visc_q,   # (L, quad) or zeros
) -> CouplingFields:
    nlayers = static.nlayers
    alpha = P.alpha

    # ---- volume quad-point coefficients (reference :265-283) ----
    qp = interp_n2q(g, qprime_df)          # (3, L, quad)
    dpp, up, vp = qp[0], qp[1], qp[2]
    Q_uu_dp = jnp.sum(up * up * dpp, axis=0)
    Q_uv_dp = jnp.sum(vp * up * dpp, axis=0)
    Q_vv_dp = jnp.sum(vp * vp * dpp, axis=0)
    _, Hk = _cumsum_pressure(dpp, alpha)
    H_bcl = jnp.sum(Hk, axis=0)

    # ---- edge coefficients (reference :306-337) ----
    fdp, fu, fv = qprime_faces

    def edge_dir(dL, dR, uL, uR, vL, vR):
        # traces (L, F, ngl) -> quad (L, F, nq)
        dLq, dRq = face_n2q(g.psiq, dL), face_n2q(g.psiq, dR)
        uLq, uRq = face_n2q(g.psiq, uL), face_n2q(g.psiq, uR)
        vLq, vRq = face_n2q(g.psiq, vL), face_n2q(g.psiq, vR)
        quu = jnp.sum(0.5 * (uLq * uLq * dLq + uRq * uRq * dRq), axis=0)
        quv = jnp.sum(0.5 * (vLq * uLq * dLq + vRq * uRq * dRq), axis=0)
        qvv = jnp.sum(0.5 * (vLq * vLq * dLq + vRq * vRq * dRq), axis=0)
        _, HL = _cumsum_pressure(dLq, alpha)
        _, HR = _cumsum_pressure(dRq, alpha)
        Hedge = jnp.sum(0.5 * (HL + HR), axis=0)
        return quu, quv, qvv, Hedge

    xquu, xquv, xqvv, xH = edge_dir(fdp.xl, fdp.xr, fu.xl, fu.xr, fv.xl, fv.xr)
    yquu, yquv, yqvv, yH = edge_dir(fdp.yl, fdp.yr, fu.yl, fu.yr, fv.yl, fv.yr)

    # ---- viscosity coefficient fields (reference :287-304,339-407) ----
    if static.use_visc:
        # nodal gradients of (u'_k, v'_k) per layer
        gux, guy = grad_nodal(g, qprime_df[1])   # (L, nodal)
        gvx, gvy = grad_nodal(g, qprime_df[2])
        graduv = jnp.stack([gux, guy, gvx, gvy], axis=0)      # (4, L, nodal)
        dpp_graduv = dpprime_visc[None] * graduv              # (4, L, nodal)
        btp_dpp_graduv = jnp.sum(dpp_graduv, axis=1)          # (4, nodal)
        pbprime_visc = jnp.sum(dpprime_visc, axis=0)

        # face traces of dpp_graduv (vector mirror on (1,2) and (3,4) pairs at
        # free-slip walls) + dpprime_visc (scalar copy)
        g12u, g12v = extract_faces(dpp_graduv[0], bc, v=dpp_graduv[1])
        g34u, g34v = extract_faces(dpp_graduv[2], bc, v=dpp_graduv[3])
        g5, _ = extract_faces(dpprime_visc, bc)

        def stack_dir(sel_l, sel_r):
            L = jnp.stack([sel_l(g12u), sel_l(g12v), sel_l(g34u), sel_l(g34v), sel_l(g5)])
            R = jnp.stack([sel_r(g12u), sel_r(g12v), sel_r(g34u), sel_r(g34v), sel_r(g5)])
            return jnp.stack([L, R], axis=1)   # (5, 2, L, F, ngl)

        gface_x = stack_dir(lambda f: f.xl, lambda f: f.xr)
        gface_y = stack_dir(lambda f: f.yl, lambda f: f.yr)
        btp_gface_x = jnp.sum(gface_x, axis=2)
        btp_gface_y = jnp.sum(gface_y, axis=2)
    else:
        z_nod = jnp.zeros_like(qprime_df[0, 0])
        dpp_graduv = jnp.zeros((4,) + qprime_df.shape[1:], z_nod.dtype)
        btp_dpp_graduv = jnp.zeros((4,) + z_nod.shape, z_nod.dtype)
        pbprime_visc = z_nod
        gface_x = jnp.zeros((5, 2) + fdp.xl.shape, z_nod.dtype)
        gface_y = jnp.zeros((5, 2) + fdp.yl.shape, z_nod.dtype)
        btp_gface_x = jnp.sum(gface_x, axis=2)
        btp_gface_y = jnp.sum(gface_y, axis=2)

    return CouplingFields(
        Q_uu_dp=Q_uu_dp, Q_uv_dp=Q_uv_dp, Q_vv_dp=Q_vv_dp, H_bcl=H_bcl,
        Q_uu_dp_edge=Pair(xquu, yquu), Q_uv_dp_edge=Pair(xquv, yquv),
        Q_vv_dp_edge=Pair(xqvv, yqvv), H_bcl_edge=Pair(xH, yH),
        dpp_graduv=dpp_graduv, btp_dpp_graduv=btp_dpp_graduv,
        pbprime_visc=pbprime_visc, dpprime_visc=dpprime_visc,
        dpprime_visc_q=dpprime_visc_q,
        graduv_dpp_face=Pair(gface_x, gface_y),
        btp_graduv_dpp_face=Pair(btp_gface_x, btp_gface_y),
    )
