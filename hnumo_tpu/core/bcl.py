"""Baroclinic (layer) RHS operators.

Reference: src/mod_create_rhs_mlswe.F90 (volume/flux kernels, shear-stress
tridiagonal solve), src/mod_layer_terms.F90 (face extraction, velocity
splitting/recombination, consistency faces).

Layer axis is the leading batch axis (vmapped by broadcasting); the only
vertical couplings are cumsums (interface pressures/heights), vertical sums
(consistency deficits) and the tridiagonal shear solve, exactly as in the
reference (SURVEY.md §2.9).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.dg import DeviceGeom, grad_n2q, interp_n2q, scatter_volume
from .faces import (BCs, extract_faces, face_n2q, face_quad_scatter,
                    scatter_face_x, scatter_face_y)
from .types import BtpAverages, Pair, Precomputed

_EPS1 = 1.0e-20  # reference eps1, prevents division by zero (:309)


def extract_qprime_faces(bc: BCs, qprime_df):
    """Nodal face traces of (dp', u', v') with BC mirrors.

    Reference extract_qprime_df_face (src/mod_layer_terms.F90:354-415):
    dp' copies across walls, (u', v') get the free-slip/no-slip mirror.
    Returns tuple of 3 FaceLR with layer leading axis.
    """
    fdp, _ = extract_faces(qprime_df[0], bc)
    fu, fv = extract_faces(qprime_df[1], bc, v=qprime_df[2])
    return (fdp, fu, fv)


# ---------------------------------------------------------------------------
# layer mass
# ---------------------------------------------------------------------------

def layer_mass_rhs(static, P: Precomputed, g: DeviceGeom, bc: BCs,
                   avg: BtpAverages, qprime_df, qprime_faces):
    """Mass advection RHS per layer + layer mass-flux sums for consistency.

    Reference layer_mass_rhs = create_layers_volume_mass (+ flux)
    (src/mod_create_rhs_mlswe.F90:53-78, 822-877, 922-1034).
    Returns (dp_advec (L, nodal), slmf (2, quad), slmf_face Pair of (2, F, nq)).
    """
    qp = interp_n2q(g, qprime_df)                 # (3, L, quad)
    dp = qp[0] * avg.ope[None]
    udp = (qp[1] + avg.ub[None]) * dp
    vdp = (qp[2] + avg.vb[None]) * dp
    slmf = jnp.stack([jnp.sum(udp, 0), jnp.sum(vdp, 0)])

    dp_advec = scatter_volume(g, Fx=udp, Fy=vdp)  # (L, nodal)

    fdp, fu, fv = qprime_faces

    def flux_dir(dL, dR, uL, uR, vL, vR, ubL, ubR, vbL, vbR, opeL, opeR, fg):
        dLq, dRq = face_n2q(g.psiq, dL), face_n2q(g.psiq, dR)   # (L, F, nq)
        uLq, uRq = face_n2q(g.psiq, uL), face_n2q(g.psiq, uR)
        vLq, vRq = face_n2q(g.psiq, vL), face_n2q(g.psiq, vR)
        uu = 0.5 * ((uLq + ubL[None]) + (uRq + ubR[None]))
        vv = 0.5 * ((vLq + vbL[None]) + (vRq + vbR[None]))
        dpl = opeL[None] * dLq
        dpr = opeR[None] * dRq
        feu = jnp.where(uu * fg.nx[None] > 0.0, uu * dpl, uu * dpr)
        fev = jnp.where(vv * fg.ny[None] > 0.0, vv * dpl, vv * dpr)
        slmf_face = jnp.stack([jnp.sum(feu, 0), jnp.sum(fev, 0)])
        S = face_quad_scatter(g.psiq, fg.jac, fg.nx[None] * feu + fg.ny[None] * fev)
        return S, slmf_face

    ax, ay = avg.faces.x, avg.faces.y
    Sx, slmf_x = flux_dir(fdp.xl, fdp.xr, fu.xl, fu.xr, fv.xl, fv.xr,
                          ax.ubL, ax.ubR, ax.vbL, ax.vbR, ax.opeL, ax.opeR, P.faces.x)
    Sy, slmf_y = flux_dir(fdp.yl, fdp.yr, fu.yl, fu.yr, fv.yl, fv.yr,
                          ay.ubL, ay.ubR, ay.vbL, ay.vbR, ay.opeL, ay.opeR, P.faces.y)
    dp_advec = scatter_face_x(dp_advec, Sx, bc)
    dp_advec = scatter_face_y(dp_advec, Sy, bc)
    dp_advec = g.massinv * dp_advec
    return dp_advec, slmf, Pair(slmf_x, slmf_y)


def apply_consistency(static, P: Precomputed, g: DeviceGeom, bc: BCs,
                      avg: BtpAverages, q_df, slmf, slmf_face: Pair):
    """Flux-adjustment mass consistency (Higdon 2015).

    Reference apply_consistency (src/mod_splitting.F90:324-366) =
    evaluate_consistency_face (src/mod_layer_terms.F90:57-137) +
    consistency_mass_rhs (src/mod_create_rhs_mlswe.F90:80-101, 879-920,
    1036-1115). Returns updated q_df.
    """
    one_plus_eta = jnp.sum(q_df[0], axis=0) / P.pbprime_df
    dpprime_df = q_df[0] / one_plus_eta[None]              # (L, nodal)

    # volume part
    dpq = interp_n2q(g, dpprime_df)                        # (L, quad)
    weight = dpq / P.pbprime[None]
    udp = weight * (avg.mfU - slmf[0])[None]
    vdp = weight * (avg.mfV - slmf[1])[None]
    dp_advec = scatter_volume(g, Fx=udp, Fy=vdp)

    # face part: mass_deficit_mass_face upwinded by its own sign
    fdp, _ = extract_faces(dpprime_df, bc)                 # scalar copy at walls

    def face_dir(dL, dR, slmf_f, fa, fg):
        dLq, dRq = face_n2q(g.psiq, dL), face_n2q(g.psiq, dR)   # (L, F, nq)
        wL = dLq / fg.pbprime_face_L[None]
        wR = dRq / fg.pbprime_face_R[None]
        defU = (fa.fluxU - slmf_f[0])[None]
        defV = (fa.fluxV - slmf_f[1])[None]
        # deficit faces per side (reference :118-130)
        dfUL, dfUR = wL * defU, wR * defU
        dfVL, dfVR = wL * defV, wR * defV
        feu = jnp.where(dfUL * fg.nx[None] > 0.0, dfUL, dfUR)
        fev = jnp.where(dfVL * fg.ny[None] > 0.0, dfVL, dfVR)
        return face_quad_scatter(g.psiq, fg.jac, fg.nx[None] * feu + fg.ny[None] * fev)

    Sx = face_dir(fdp.xl, fdp.xr, slmf_face.x, avg.faces.x, P.faces.x)
    Sy = face_dir(fdp.yl, fdp.yr, slmf_face.y, avg.faces.y, P.faces.y)
    dp_advec = scatter_face_x(dp_advec, Sx, bc)
    dp_advec = scatter_face_y(dp_advec, Sy, bc)

    return q_df.at[0].add(static.dt * g.massinv * dp_advec)


# ---------------------------------------------------------------------------
# layer momentum
# ---------------------------------------------------------------------------

def layer_momentum_volume(static, P: Precomputed, g: DeviceGeom,
                          avg: BtpAverages, qprime_df, q_df):
    """Layer momentum volume kernel.

    Reference create_rhs_dynamics_volume_layers
    (src/mod_create_rhs_mlswe.F90:281-456): pressure force from interface
    pressures, momentum-flux consistency weighting against the barotropic
    time averages, wind/bottom-stress vertical distribution, interface-slope
    source p*grad(z). Returns rhs_mom (2, L, nodal) without massinv.

    Note: the reference's wind/bottom-stress distribution accumulates
    `pprime_temp(k+1)=pprime_temp(k)+qp(k)` where `qp` holds the LAST
    layer's (dp',u',v') 3-vector (:380-382) — an indexing slip that is
    inert for all shipped gated cases (zero wind/bottom stress there). We
    implement the documented intent: cumulative prime pressure
    pprime_temp = cumsum_k dp'_k.
    """
    grav = static.gravity
    alpha = P.alpha
    L = static.nlayers
    al = alpha.reshape((L,) + (1,) * (qprime_df.ndim - 2))

    # layer interfaces z_elv at nodal points (reference :321-325)
    sq_ope_df = jnp.sqrt(avg.ope2_df)
    dz = (al / grav) * (sq_ope_df[None] * qprime_df[0])     # (L, nodal)
    # z interfaces: z[L] = zbot; z[k] = zbot + sum_{j>=k} dz_j  -> (L+1, nodal)
    rev = jnp.cumsum(dz[::-1], axis=0)[::-1]
    z_elv = jnp.concatenate([P.zbot_df[None] + rev, P.zbot_df[None]], axis=0)
    # gradient of each interface at quad points (nodal field -> quad gradient)
    gz_x, gz_y = grad_n2q(g, z_elv)                         # (L+1, quad)

    qp = interp_n2q(g, qprime_df)                           # (3, L, quad)
    udp_q = interp_n2q(g, q_df[1])                          # (L, quad)
    vdp_q = interp_n2q(g, q_df[2])
    temp_uu = jnp.abs(udp_q) + _EPS1
    temp_vv = jnp.abs(vdp_q) + _EPS1

    sq_ope = jnp.sqrt(avg.ope2)
    p_lower = jnp.cumsum(sq_ope[None] * qp[0], axis=0)      # p_tmp(k+1)
    p_upper = p_lower - sq_ope[None] * qp[0]                # p_tmp(k)
    H_tmp = 0.5 * al.reshape((L,) + (1,) * (p_lower.ndim - 1)) * (p_lower**2 - p_upper**2)

    dp = qp[0] * avg.ope[None]
    u = qp[1] + avg.ub[None]
    v = qp[2] + avg.vb[None]
    u_udp = dp * u * u
    v_vdp = dp * v * v
    uv_dp = dp * u * v

    # momentum-flux consistency weighting (reference :370-390)
    uu_def = avg.Qu - jnp.sum(u_udp, 0)
    uv_def = avg.Quv - jnp.sum(uv_dp, 0)
    vv_def = avg.Qv - jnp.sum(v_vdp, 0)
    wu = temp_uu / jnp.sum(temp_uu, 0)[None]
    wv = temp_vv / jnp.sum(temp_vv, 0)[None]
    var_uu = u_udp + wu * uu_def[None]
    var_uv = uv_dp + wu * uv_def[None]     # u_vdp(1,:)
    var_vu = uv_dp + wv * uv_def[None]     # u_vdp(2,:)
    var_vv = v_vdp + wv * vv_def[None]

    # pressure-force weight: sum_k H_k matches H_ave (reference :412-417)
    sumH = jnp.sum(H_tmp, 0)
    weight = jnp.where(sumH > 0.0, avg.H / sumH, 1.0)
    Hq = H_tmp * weight[None]

    # wind/bottom stress vertical distribution (reference :424-431)
    pp_lower = jnp.cumsum(qp[0], axis=0)
    pp_upper = pp_lower - qp[0]
    Ps, Pb = static.Pstress, static.Pbstress
    temp1 = (jnp.minimum(pp_lower, Ps) - jnp.minimum(pp_upper, Ps)) / Ps
    tau_u = temp1 * P.tau_wind[0][None]
    tau_v = temp1 * P.tau_wind[1][None]
    tempbot = (jnp.minimum(Pb, P.pbprime[None] - pp_lower)
               - jnp.minimum(Pb, P.pbprime[None] - pp_upper)) / Pb

    source_x = grav * (tau_u - tempbot * avg.tbU[None]
                       + p_upper * gz_x[:-1] - p_lower * gz_x[1:])
    source_y = grav * (tau_v - tempbot * avg.tbV[None]
                       + p_upper * gz_y[:-1] - p_lower * gz_y[1:])

    rhs_u = scatter_volume(g, Fx=Hq + var_uu, Fy=var_uv, Fs=source_x)
    rhs_v = scatter_volume(g, Fx=var_vu, Fy=Hq + var_vv, Fs=source_y)
    return jnp.stack([rhs_u, rhs_v])


def layer_momentum_fluxes(static, P: Precomputed, g: DeviceGeom, bc: BCs,
                          avg: BtpAverages, qprime_faces, rhs_mom):
    """Layer momentum face fluxes: upwind advective flux with consistency
    weighting + Higdon layer-overlap H_face reconstruction.

    Reference Apply_layers_fluxes (src/mod_create_rhs_mlswe.F90:458-820).
    """
    grav = static.gravity
    L = static.nlayers
    alpha = P.alpha
    fdp, fu, fv = qprime_faces

    def one_dir(dL, dR, uL, uR, vL, vR, fa, fg, Hface_ave):
        al = alpha.reshape((L, 1, 1, 1))
        dLq, dRq = face_n2q(g.psiq, dL), face_n2q(g.psiq, dR)   # (L, F, nq)
        uLq, uRq = face_n2q(g.psiq, uL), face_n2q(g.psiq, uR)
        vLq, vRq = face_n2q(g.psiq, vL), face_n2q(g.psiq, vR)
        nx, ny = fg.nx[None], fg.ny[None]

        dpl = fa.opeL[None] * dLq
        dpr = fa.opeR[None] * dRq
        ul = uLq + fa.ubL[None]
        ur = uRq + fa.ubR[None]
        vl = vLq + fa.vbL[None]
        vr = vRq + fa.vbR[None]
        uu = 0.5 * (ul + ur)
        vv = 0.5 * (vl + vr)
        udpl, udpr = ul * dpl, ur * dpr
        vdpl, vdpr = vl * dpl, vr * dpr

        # upwind advective fluxes (reference :547-560)
        udp_flux1 = jnp.where(uu * nx > 0.0, uu * udpl, uu * udpr)
        vdp_flux1 = jnp.where(uu * nx > 0.0, uu * vdpl, uu * vdpr)
        udp_flux2 = jnp.where(vv * ny > 0.0, vv * udpl, vv * udpr)
        vdp_flux2 = jnp.where(vv * ny > 0.0, vv * vdpl, vv * vdpr)

        # flux-deficit consistency weighting (reference :564-625)
        uu_def = fa.QuU - jnp.sum(udp_flux1, 0)
        uv_def = fa.QuV - jnp.sum(udp_flux2, 0)
        vu_def = fa.QvU - jnp.sum(vdp_flux1, 0)
        vv_def = fa.QvV - jnp.sum(vdp_flux2, 0)
        wl_u = jnp.abs(udpl) / jnp.sum(jnp.abs(udpl) + _EPS1, 0)[None]
        wr_u = jnp.abs(udpr) / jnp.sum(jnp.abs(udpr) + _EPS1, 0)[None]
        wl_v = jnp.abs(vdpl) / jnp.sum(jnp.abs(vdpl) + _EPS1, 0)[None]
        wr_v = jnp.abs(vdpr) / jnp.sum(jnp.abs(vdpr) + _EPS1, 0)[None]
        udp_flux1 = udp_flux1 + jnp.where((uu_def * fg.nx)[None] > 0.0, wl_u, wr_u) * uu_def[None]
        udp_flux2 = udp_flux2 + jnp.where((uv_def * fg.ny)[None] > 0.0, wl_u, wr_u) * uv_def[None]
        vdp_flux1 = vdp_flux1 + jnp.where((vu_def * fg.nx)[None] > 0.0, wl_v, wr_v) * vu_def[None]
        vdp_flux2 = vdp_flux2 + jnp.where((vv_def * fg.ny)[None] > 0.0, wl_v, wr_v) * vv_def[None]

        # ---- H_face: Higdon layer-overlap reconstruction (:627-707) ----
        ope_l = jnp.sqrt(fa.ope2L)[None]
        ope_r = jnp.sqrt(fa.ope2R)[None]
        pf_L = jnp.concatenate([jnp.zeros_like(dLq[:1]), jnp.cumsum(ope_l * dLq, 0)], 0)
        pf_R = jnp.concatenate([jnp.zeros_like(dRq[:1]), jnp.cumsum(ope_r * dRq, 0)], 0)
        opee = jnp.sqrt(fa.opee2)[None]
        pe_L = jnp.concatenate([jnp.zeros_like(dLq[:1]), jnp.cumsum(opee * dLq, 0)], 0)
        pe_R = jnp.concatenate([jnp.zeros_like(dRq[:1]), jnp.cumsum(opee * dRq, 0)], 0)

        a_g = (alpha / grav).reshape((L, 1, 1, 1))
        g_a = (grav / alpha).reshape((L, 1, 1, 1))

        def z_interfaces(zb, thick):
            rev = jnp.cumsum(thick[::-1], axis=0)[::-1]
            return jnp.concatenate([zb[None] + rev, zb[None]], axis=0)  # (L+1, F, nq)

        zf_L = z_interfaces(fg.zbot_face_L, a_g * (ope_l * dLq))
        zf_R = z_interfaces(fg.zbot_face_R, a_g * (ope_r * dRq))
        ze_L = z_interfaces(fg.zbot_face_L, a_g * (opee * dLq))
        ze_R = z_interfaces(fg.zbot_face_R, a_g * (opee * dRq))

        def overlap_H(p_edge_src, z_edge_src, z_edge_tgt):
            """H from the opposite side by layer intersection (:668-684).

            target layer k from source layers ktemp: returns (L, F, nq).
            """
            # broadcast (k, ktemp, F, nq)
            z_top = jnp.minimum(z_edge_src[None, :-1], z_edge_tgt[:-1, None])
            z_bot = jnp.maximum(z_edge_src[None, 1:], z_edge_tgt[1:, None])
            dz = z_top - z_bot
            mask = dz > 0.0
            p_low = p_edge_src[None, 1:]
            z_low = z_edge_src[None, 1:]
            ga = g_a[None]
            p_bot = p_low - ga * (z_bot - z_low)
            p_top = p_low - ga * (z_top - z_low)
            contrib = 0.5 * alpha.reshape((1, L, 1, 1, 1)) * (p_bot**2 - p_top**2)
            return jnp.sum(jnp.where(mask, contrib, 0.0), axis=1)

        H_plus = 0.5 * al * (pe_L[1:] ** 2 - pe_L[:-1] ** 2)
        H_minus_from_R = overlap_H(pe_R, ze_R, ze_L)
        HfL = 0.5 * (H_plus + H_minus_from_R)
        H_minus = 0.5 * al * (pe_R[1:] ** 2 - pe_R[:-1] ** 2)
        H_plus_from_L = overlap_H(pe_L, ze_L, ze_R)
        HfR = 0.5 * (H_minus + H_plus_from_L)

        # wall faces (er==-4): one-sided hydrostatic H (:710-719)
        HfL_wall = 0.5 * al * (pf_L[1:] ** 2 - pf_L[:-1] ** 2)
        HfR_wall = 0.5 * al * (pf_R[1:] ** 2 - pf_R[:-1] ** 2)
        wall = fg.wall4[None]
        HfL = jnp.where(wall > 0.5, HfL_wall, HfL)
        HfR = jnp.where(wall > 0.5, HfR_wall, HfR)

        # interface corrections at interior faces (:721-738)
        if L > 1:
            # p_inc_k = g/alpha_k (z_face[k+1] - z_edge[k+1]), k=1..L-1
            p_inc_L = g_a[:-1] * (zf_L[1:L] - ze_L[1:L])
            Hc_L = 0.5 * al[:-1] * ((pf_L[1:L] + p_inc_L) ** 2 - pf_L[1:L] ** 2)
            p_inc_R = g_a[:-1] * (zf_R[1:L] - ze_R[1:L])
            Hc_R = 0.5 * al[:-1] * ((pf_R[1:L] + p_inc_R) ** 2 - pf_R[1:L] ** 2)
            zpad = jnp.zeros_like(Hc_L[:1])
            corr_L = jnp.concatenate([-Hc_L, zpad], 0) + jnp.concatenate([zpad, Hc_L], 0)
            corr_R = jnp.concatenate([-Hc_R, zpad], 0) + jnp.concatenate([zpad, Hc_R], 0)
            HfL = jnp.where(wall > 0.5, HfL, HfL + corr_L)
            HfR = jnp.where(wall > 0.5, HfR, HfR + corr_R)

        # match the vertical sum to the barotropic average (:759-773)
        sL = jnp.sum(HfL, 0)
        HfL = HfL * jnp.where(sL > 0.0, Hface_ave / sL, 1.0)[None]
        sR = jnp.sum(HfR, 0)
        HfR = HfR * jnp.where(sR > 0.0, Hface_ave / sR, 1.0)[None]

        flux_x = nx * udp_flux1 + ny * udp_flux2
        flux_y = nx * vdp_flux1 + ny * vdp_flux2
        SuL = face_quad_scatter(g.psiq, fg.jac, nx * HfL + flux_x)
        SuR = face_quad_scatter(g.psiq, fg.jac, nx * HfR + flux_x)
        SvL = face_quad_scatter(g.psiq, fg.jac, ny * HfL + flux_y)
        SvR = face_quad_scatter(g.psiq, fg.jac, ny * HfR + flux_y)
        return SuL, SuR, SvL, SvR

    SuLx, SuRx, SvLx, SvRx = one_dir(fdp.xl, fdp.xr, fu.xl, fu.xr, fv.xl, fv.xr,
                                     avg.faces.x, P.faces.x, avg.faces.x.H)
    SuLy, SuRy, SvLy, SvRy = one_dir(fdp.yl, fdp.yr, fu.yl, fu.yr, fv.yl, fv.yr,
                                     avg.faces.y, P.faces.y, avg.faces.y.H)

    rhs_u, rhs_v = rhs_mom[0], rhs_mom[1]
    rhs_u = scatter_face_x(rhs_u, SuLx, bc, S_right=SuRx)
    rhs_u = scatter_face_y(rhs_u, SuLy, bc, S_right=SuRy)
    rhs_v = scatter_face_x(rhs_v, SvLx, bc, S_right=SvRx)
    rhs_v = scatter_face_y(rhs_v, SvLy, bc, S_right=SvRy)
    return jnp.stack([rhs_u, rhs_v])


def layer_momentum_rhs(static, P, g, bc, avg, coup, qprime_df, q_df, qprime_faces):
    """Full layer momentum RHS = volume + fluxes, massinv, + viscosity.

    Reference layer_momentum_rhs (src/mod_create_rhs_mlswe.F90:28-51) with
    the rhs_momentum viscosity dispatch (src/mod_splitting.F90:289-322).
    """
    if static.use_visc:
        from .viscosity import bcl_nodal_laplacian, bcl_quad_laplacian
        if static.method_visc == 1:
            rhs_visc = bcl_quad_laplacian(static, P, g, bc, coup, qprime_df, avg)
        else:
            rhs_visc = bcl_nodal_laplacian(static, P, g, bc, coup, avg)
    else:
        rhs_visc = 0.0

    rhs_mom = layer_momentum_volume(static, P, g, avg, qprime_df, q_df)
    rhs_mom = layer_momentum_fluxes(static, P, g, bc, avg, qprime_faces, rhs_mom)
    return g.massinv * rhs_mom + rhs_visc


# ---------------------------------------------------------------------------
# vertical shear stress (implicit tridiagonal solve)
# ---------------------------------------------------------------------------

def rhs_layer_shear_stress(static, P: Precomputed, g: DeviceGeom, q_df):
    """Implicit vertical shear-stress forcing via a per-column Thomas solve.

    Reference rhs_layer_shear_stress (src/mod_create_rhs_mlswe.F90:146-279),
    including its asymmetric sub/super-diagonal scaling (a=-coeff vs
    c=-gravity*dt*coeff, :210-221) which we replicate verbatim.
    Returns rhs_stress (2, L, nodal) WITHOUT massinv (applied by caller).
    """
    grav = static.gravity
    L = static.nlayers
    dp = interp_n2q(g, q_df[0])          # (L, quad)
    udp = interp_n2q(g, q_df[1])
    vdp = interp_n2q(g, q_df[2])

    a1 = P.alpha[0]
    coeff = jnp.maximum(jnp.sqrt(0.5 * P.coriolis_quad * static.ad_mlswe) / a1,
                        static.ad_mlswe / (a1 * static.max_shear_dz))
    coeff1 = grav * static.dt * coeff

    # tridiagonal system per quad column (static unrolled Thomas over layers)
    a = [-coeff] * L
    b = [dp[k] + 2.0 * coeff1 for k in range(L)]
    c = [-coeff1] * L
    b[0] = dp[0] + coeff1
    b[L - 1] = dp[L - 1] + coeff1
    r_u = [udp[k] / dp[k] for k in range(L)]
    r_v = [vdp[k] / dp[k] for k in range(L)]
    for k in range(1, L):
        mult = a[k] / b[k - 1]
        b[k] = b[k] - mult * c[k - 1]
        r_u[k] = r_u[k] - mult * r_u[k - 1]
        r_v[k] = r_v[k] - mult * r_v[k - 1]
    u = [None] * L
    v = [None] * L
    u[L - 1] = r_u[L - 1] / b[L - 1]
    v[L - 1] = r_v[L - 1] / b[L - 1]
    for k in range(L - 2, -1, -1):
        u[k] = (r_u[k] - c[k] * u[k + 1]) / b[k]
        v[k] = (r_v[k] - c[k] * v[k + 1]) / b[k]

    # interface stresses tau_k = coeff*(u_{k-1}-u_k); layer forcing
    # g*(tau_k - tau_{k+1}) (reference :246-259)
    zero = jnp.zeros_like(dp[0])
    tau_u = [zero] + [coeff * (u[k - 1] - u[k]) for k in range(1, L)] + [zero]
    tau_v = [zero] + [coeff * (v[k - 1] - v[k]) for k in range(1, L)] + [zero]
    F_u = jnp.stack([grav * (tau_u[k] - tau_u[k + 1]) for k in range(L)])
    F_v = jnp.stack([grav * (tau_v[k] - tau_v[k + 1]) for k in range(L)])

    rhs_u = scatter_volume(g, Fs=F_u)
    rhs_v = scatter_volume(g, Fs=F_v)
    return jnp.stack([rhs_u, rhs_v])


# ---------------------------------------------------------------------------
# velocity splitting / recombination
# ---------------------------------------------------------------------------

def extract_velocity(q_df, qb_df):
    """Layer velocities adjusted so their mass-weighted vertical mean equals
    the barotropic velocity (reference extract_velocity,
    src/mod_layer_terms.F90:272-320). Returns (u, v) per layer (L, nodal)."""
    u = q_df[1] / q_df[0]
    v = q_df[2] / q_df[0]
    ubar = jnp.sum(u * q_df[0], 0) / qb_df[0]
    vbar = jnp.sum(v * q_df[0], 0) / qb_df[0]
    ok = qb_df[0] > 0.0
    u = jnp.where(ok[None], u - ubar[None] + (qb_df[2] / qb_df[0])[None], 0.0)
    v = jnp.where(ok[None], v - vbar[None] + (qb_df[3] / qb_df[0])[None], 0.0)
    return u, v


def velocity_df(q_df, qb_df):
    """In-place velocity smoothing of momentum (reference velocity_df,
    src/mod_layer_terms.F90:139-196)."""
    u, v = extract_velocity(q_df, qb_df)
    return q_df.at[1].set(u * q_df[0]).at[2].set(v * q_df[0])


def evaluate_bcl(static, P: Precomputed, bc: BCs, q_df, qprime_df, qb_df):
    """Recompute primes + momentum smoothing + face extraction after the
    predictor (reference evaluate_bcl, src/mod_layer_terms.F90:198-238).
    Returns (q_df, qprime_df, qprime_faces)."""
    u, v = extract_velocity(q_df, qb_df)
    q_df = q_df.at[1].set(u * q_df[0]).at[2].set(v * q_df[0])
    one_plus_eta = jnp.sum(q_df[0], 0) / P.pbprime_df
    u, v = extract_velocity(q_df, qb_df)
    qprime_df = jnp.stack([
        q_df[0] / one_plus_eta[None],
        u - (qb_df[2] / qb_df[0])[None],
        v - (qb_df[3] / qb_df[0])[None],
    ])
    qprime_faces = extract_qprime_faces(bc, qprime_df)
    return q_df, qprime_df, qprime_faces


def evaluate_bcl_v1(q_df, qprime_df, qb_df):
    """Corrector variant: update velocities/primes only, thickness prime kept
    (reference evaluate_bcl_v1, src/mod_layer_terms.F90:240-270)."""
    u, v = extract_velocity(q_df, qb_df)
    q_df = q_df.at[1].set(u * q_df[0]).at[2].set(v * q_df[0])
    u, v = extract_velocity(q_df, qb_df)
    qprime_df = qprime_df.at[1].set(u - (qb_df[2] / qb_df[0])[None])
    qprime_df = qprime_df.at[2].set(v - (qb_df[3] / qb_df[0])[None])
    return q_df, qprime_df
