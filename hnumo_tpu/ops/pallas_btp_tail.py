"""Pallas TPU kernels for the barotropic stage TAIL: face fluxes, LDG
viscosity, SSPRK update and all face accumulators.

Together with ops.pallas_btp (the fused volume kernel) this makes the whole
barotropic stage — the model's innermost hot loop, N_btp*kstages evaluations
per solve, 2 solves per baroclinic dt — three `pallas_call`s plus one batched
halo exchange:

  kernel A (pallas_btp._kernel_uni, extended): volume RHS + volume/nodal
      accumulators + nodal velocity gradient (LDG aux) + its accumulator
  halo    (core.faces.extract_faces_stacked): ONE ppermute per direction-
      sense for the 8-channel [qb, graduv] stack
  kernel F (this module): per-face Riemann/average flux of the 4 barotropic
      variables (reference creat_btp_fluxes_qdf, src/mod_rhs_btp.F90:211-364)
      + the nodal LDG viscosity face flux (create_rhs_laplacian_flux,
      src/mod_laplacian_quad.F90:427-519) + the 16 quad + 8 nodal face
      accumulators (src/mod_rk_mlswe.F90:45-78), over ALL faces of both
      directions flattened into one face axis
  kernel U (this module): per-element edge scatter of the face values (as a
      single matmul with a static 0/1 edge-placement matrix), the nodal LDG
      viscosity volume term (btp_compute_laplacian,
      src/mod_laplacian_quad.F90:357-425), the static δ-form reference
      vector, inverse mass (folded into the operators), the SSPRK stage
      combine (src/mod_rk_mlswe.F90:99-119) and the wall momentum projection
      (as multiplicative masks).

The XLA path in core.btp remains the reference implementation (f64, LSRK,
curvilinear geometry, quad-family viscosity); parity is asserted by
tests/test_pallas.py. Direction-independence: the face flux formulas depend
on direction only through the per-face tables (normals, coefficient and
reference values), so x- and y-faces concatenate into one flat face vector
and ONE kernel invocation covers both (the TPU-native analog of the
reference's per-face loop body being direction-agnostic).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_btp import align_vma, sds

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# face tables (built once per barotropic solve, shard-local, inside jit)
# ---------------------------------------------------------------------------


class FaceTailTables(NamedTuple):
    """Flattened all-faces tables for kernel F.

    Face axis = [x-faces row-major (ney,(nex+1)) ; y-faces ((ney+1),nex)],
    padded to a tile multiple with edge replication.
    """

    ftab: jnp.ndarray    # (15, Fp, nq): nx, ny, jac, cpL, cpR, cpub, omE,
    #                      cmL, cmR, cmLR, Hedge, Quu_e, Quv_e, Qvv_e, dHb_e
    ntab: jnp.ndarray    # (5, Fp, ngl): pbdfL, pbdfR, nx_df, ny_df, jac_df
    bgf: jnp.ndarray     # (10, Fp, ngl): [btp_graduv_dpp_face L rows 0-4,
    #                      R rows 5-9] (row 4/9 = the multiplier channel)
    psiq: jnp.ndarray    # (ngl, nq)
    nfx: int             # unpadded x-face count ney*(nex+1)
    nfy: int
    Fp: int
    tile: int


def _fflat(a):
    """(..., fy, fx, m) -> (..., F, m)."""
    return a.reshape(a.shape[:-3] + (a.shape[-3] * a.shape[-2], a.shape[-1]))


def _pad_f(a, Fp, axis=-2):
    F = a.shape[axis]
    if F == Fp:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, Fp - F)
    return jnp.pad(a, pads, mode="edge")


def face_tile(nq: int, ngl: int, Fall: int) -> tuple[int, int]:
    """(padded face count, tile): ~2 MB VMEM block sets, never degenerate.

    The tile is the block's second-to-last dim, which Mosaic requires to be
    a multiple of the 8-row sublane (or the full axis) — round the cap down
    to a multiple of 8 and pad the face axis up to a tile multiple."""
    per_face = 4 * (16 * ngl + 19 * nq + 15 * ngl + 32 * nq + 16 * ngl + 5 * ngl)
    cap = min(1024, max(128, int(2e6 // per_face)))
    cap -= cap % 8
    if Fall <= cap:
        Fp = ((Fall + 7) // 8) * 8
        return Fp, Fp
    t = cap
    Fp = ((Fall + t - 1) // t) * t
    return Fp, t


def build_face_tables(P, coup, psiq, use_visc: bool) -> FaceTailTables:
    """Concatenate both directions' static + per-solve coupling face tables."""
    fx, fy = P.faces.x, P.faces.y

    def cat_q(ax, ay):
        return jnp.concatenate([_fflat(ax), _fflat(ay)], axis=0)

    ftab = jnp.stack([
        cat_q(fx.nx, fy.nx), cat_q(fx.ny, fy.ny), cat_q(fx.jac, fy.jac),
        cat_q(fx.coeff_pbpert_L, fy.coeff_pbpert_L),
        cat_q(fx.coeff_pbpert_R, fy.coeff_pbpert_R),
        cat_q(fx.coeff_pbub_LR, fy.coeff_pbub_LR),
        cat_q(fx.one_over_pbprime_edge, fy.one_over_pbprime_edge),
        cat_q(fx.coeff_mass_pbub_L, fy.coeff_mass_pbub_L),
        cat_q(fx.coeff_mass_pbub_R, fy.coeff_mass_pbub_R),
        cat_q(fx.coeff_mass_pbpert_LR, fy.coeff_mass_pbpert_LR),
        cat_q(fx.Hedge_ref, fy.Hedge_ref),
        cat_q(coup.Q_uu_dp_edge.x, coup.Q_uu_dp_edge.y),
        cat_q(coup.Q_uv_dp_edge.x, coup.Q_uv_dp_edge.y),
        cat_q(coup.Q_vv_dp_edge.x, coup.Q_vv_dp_edge.y),
        cat_q(coup.dH_bcl_edge.x, coup.dH_bcl_edge.y),
    ])
    ntab = jnp.stack([
        cat_q(fx.pbprime_df_face_L, fy.pbprime_df_face_L),
        cat_q(fx.pbprime_df_face_R, fy.pbprime_df_face_R),
        cat_q(fx.nx_df, fy.nx_df), cat_q(fx.ny_df, fy.ny_df),
        cat_q(fx.jac_df, fy.jac_df),
    ])
    nfx = fx.nx.shape[0] * fx.nx.shape[1]
    nfy = fy.nx.shape[0] * fy.nx.shape[1]
    nq, ngl = ftab.shape[-1], ntab.shape[-1]
    Fp, tile = face_tile(nq, ngl, nfx + nfy)
    ftab = _pad_f(ftab, Fp)
    ntab = _pad_f(ntab, Fp)
    if use_visc:
        # (5, 2, F, ngl) -> (2, 5, F, ngl) -> (10, F, ngl): rows 0-4 L, 5-9 R
        bx = jnp.swapaxes(coup.btp_graduv_dpp_face.x, 0, 1)
        by = jnp.swapaxes(coup.btp_graduv_dpp_face.y, 0, 1)
        bgf = jnp.concatenate(
            [bx.reshape(10, nfx, ngl), by.reshape(10, nfy, ngl)], axis=1)
        bgf = _pad_f(bgf, Fp)
    else:
        bgf = jnp.zeros((10, Fp, ngl), ftab.dtype)
    return FaceTailTables(ftab=ftab, ntab=ntab, bgf=bgf, psiq=psiq,
                          nfx=nfx, nfy=nfy, Fp=Fp, tile=tile)


# ---------------------------------------------------------------------------
# kernel F: all-faces flux + accumulators
# ---------------------------------------------------------------------------


def _kernel_faces(trL_ref, trR_ref, ftab_ref, ntab_ref, psiq_ref, *rest,
                  use_visc):
    if use_visc:
        (bgf_ref, af_in, ag_in, S_ref, Sv_ref, af_ref, ag_ref) = rest
    else:
        af_in, S_ref, af_ref = rest
    psiq = psiq_ref[0]                       # (ngl, nq)
    pet = trL_ref.dtype

    def n2q(t):  # (T, ngl) @ (ngl, nq)
        return jnp.dot(t, psiq, preferred_element_type=pet, precision=_HI)

    trL, trR = trL_ref[:], trR_ref[:]
    qblq = [n2q(trL[c]) for c in range(4)]
    qbrq = [n2q(trR[c]) for c in range(4)]

    nx, ny, jacf = ftab_ref[0], ftab_ref[1], ftab_ref[2]
    cpL, cpR, cpub = ftab_ref[3], ftab_ref[4], ftab_ref[5]
    omE = ftab_ref[6]
    cmL, cmR, cmLR = ftab_ref[7], ftab_ref[8], ftab_ref[9]
    Hedge = ftab_ref[10]
    Qe_uu, Qe_uv, Qe_vv, dHe = (ftab_ref[c] for c in range(11, 15))

    # reference creat_btp_fluxes_qdf (src/mod_rhs_btp.F90:211-364)
    pU_L = nx * qblq[2] + ny * qblq[3]
    pU_R = -(nx * qbrq[2] + ny * qbrq[3])
    pbpert_edge = cpL * qblq[1] + cpR * qbrq[1] + cpub * (pU_L + pU_R)
    mue = pbpert_edge * omE
    mue2 = mue * (2.0 + mue)
    ope_edge = 1.0 + mue

    flux_edge_x = cmL * qblq[2] + cmR * qbrq[2] + cmLR * nx * (qblq[1] - qbrq[1])
    flux_edge_y = cmL * qblq[3] + cmR * qbrq[3] + cmLR * ny * (qblq[1] - qbrq[1])

    inv_l, inv_r = 1.0 / qblq[0], 1.0 / qbrq[0]
    ul, ur = qblq[2] * inv_l, qbrq[2] * inv_r
    vl, vr = qblq[3] * inv_l, qbrq[3] * inv_r

    quu = 0.5 * (ul * qblq[2] + ur * qbrq[2]) + ope_edge * Qe_uu
    quv = 0.5 * (vl * qblq[2] + vr * qbrq[2]) + ope_edge * Qe_uv
    qvu = 0.5 * (ul * qblq[3] + ur * qbrq[3]) + ope_edge * Qe_uv
    qvv = 0.5 * (vl * qblq[3] + vr * qbrq[3]) + ope_edge * Qe_vv
    dH_face = dHe + mue2 * (Hedge + dHe)

    dispu = 0.5 * cmLR * (qbrq[2] - qblq[2])
    dispv = 0.5 * cmLR * (qbrq[3] - qblq[3])
    flux_x = nx * quu + ny * quv - dispu
    flux_y = nx * qvu + ny * qvv - dispv
    flux = nx * flux_edge_x + ny * flux_edge_y
    H_kx, H_ky = nx * dH_face, ny * dH_face

    def q2n(f):  # (T, nq) @ (nq, ngl)
        return jnp.dot(jacf * f, psiq.T, preferred_element_type=pet,
                       precision=_HI)

    S_ref[0] = q2n(flux)
    S_ref[1] = q2n(H_kx + flux_x)
    S_ref[2] = q2n(H_ky + flux_y)

    # one-sided reference pb' from nodal face tables (:257-258)
    pbl = n2q(ntab_ref[0])
    pbr = n2q(ntab_ref[1])
    muL = qblq[1] / pbl
    muR = qbrq[1] / pbr
    inc = jnp.stack([dH_face, quu, quv, qvu, qvv, muL, muR,
                     muL * (2.0 + muL), muR * (2.0 + muR),
                     flux_edge_x, flux_edge_y, mue2, ul, ur, vl, vr])
    af_ref[:] = af_in[:] + inc

    if use_visc:
        # nodal LDG viscosity face flux (create_rhs_laplacian_flux,
        # src/mod_laplacian_quad.F90:427-519): flip-flop central flux
        gfL, gfR = trL[4:8], trR[4:8]        # (4, T, ngl)
        bgf = bgf_ref[:]
        fl = bgf[4] * gfL + bgf[0:4]
        fr = bgf[9] * gfR + bgf[5:9]
        qmean = 0.5 * (fl + fr)
        nx_df, ny_df, jac_df = ntab_ref[2], ntab_ref[3], ntab_ref[4]
        Sv_ref[0] = jac_df * ((qmean[0] - fl[0] * nx_df)
                              + (qmean[1] - fl[1] * ny_df))
        Sv_ref[1] = jac_df * ((qmean[2] - fl[2] * nx_df)
                              + (qmean[3] - fl[3] * ny_df))
        ag_ref[:] = ag_in[:] + jnp.concatenate([gfL, gfR], axis=0)


def btp_faces_pallas(tabs: FaceTailTables, trL, trR, af, ag,
                     *, use_visc, interpret=False):
    """All-faces flux kernel. trL/trR: (8|4, Fp, ngl) packed traces
    ([qb 4ch, graduv 4ch when viscous]); af: (16, Fp, nq) aliased;
    ag: (8, Fp, ngl) aliased (viscous only, else pass-through).
    Returns (S (3, Fp, ngl), Sv (2, Fp, ngl) | None, af', ag')."""
    Fp, tile = tabs.Fp, tabs.tile
    ngl, nq = trL.shape[-1], tabs.ftab.shape[-1]
    C_tr = trL.shape[0]
    nblk = Fp // tile
    dtype = trL.dtype
    z = np.int32(0)

    def fb(c, n):
        return pl.BlockSpec((c, tile, n), lambda i: (z, i, z),
                            memory_space=pltpu.VMEM)

    def op_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i, z, z),
                            memory_space=pltpu.VMEM)

    psiq_rep = jnp.broadcast_to(tabs.psiq[None], (nblk,) + tabs.psiq.shape)
    kernel = functools.partial(_kernel_faces, use_visc=use_visc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    in_specs = [fb(C_tr, ngl), fb(C_tr, ngl), fb(15, nq), fb(5, ngl),
                op_spec(tabs.psiq.shape)]
    operands = [trL, trR, tabs.ftab, tabs.ntab, psiq_rep]
    if use_visc:
        in_specs += [fb(10, ngl), fb(16, nq), fb(8, ngl)]
        operands += [tabs.bgf, af, ag]
        out_specs = [fb(3, ngl), fb(2, ngl), fb(16, nq), fb(8, ngl)]
        out_shape = [sds((3, Fp, ngl), dtype, trL, af),
                     sds((2, Fp, ngl), dtype, trL, af),
                     sds((16, Fp, nq), dtype, trL, af),
                     sds((8, Fp, ngl), dtype, trL, ag)]
        aliases = {6: 2, 7: 3}
    else:
        in_specs += [fb(16, nq)]
        operands += [af]
        out_specs = [fb(3, ngl), fb(16, nq)]
        out_shape = [sds((3, Fp, ngl), dtype, trL, af),
                     sds((16, Fp, nq), dtype, trL, af)]
        aliases = {5: 1}
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        **kwargs,
    )(*align_vma(*operands))
    if use_visc:
        return out[0], out[1], out[2], out[3]
    return out[0], None, out[1], ag


# ---------------------------------------------------------------------------
# kernel U: edge scatter + viscosity volume + SSPRK update
# ---------------------------------------------------------------------------


class UpdateOps(NamedTuple):
    """Static operators for the update kernel (inverse mass folded in)."""

    Escat: jnp.ndarray    # (4*ngl, npts) edge placement * massinv
    Evisc: jnp.ndarray    # (4*ngl, npts) edge placement * visc * massinv
    Vx: jnp.ndarray       # (npts, npts) -visc * massinv * nodal d/dx scatter
    Vy: jnp.ndarray
    pbprime_df: jnp.ndarray  # (E, npts)
    ref: jnp.ndarray         # (3, E, npts) massinv * btp_rhs_ref


def build_update_ops(static, P, g, Ep: int) -> UpdateOps:
    """Fold inverse mass, viscosity constant and edge placement into static
    matrices (uniform affine geometry: massinv identical in every element).
    Runs inside jit (traced tables); the placement matrix itself is host
    numpy (shape-only)."""
    from .pallas_btp import eflat, pad_e

    ngl = g.wjac_df.shape[-1]
    npts = ngl * ngl
    minv = eflat(g.massinv)[0]          # (npts,) — uniform across elements
    dt = g.massinv.dtype

    E4 = np.zeros((4 * ngl, npts), np.float64)
    for j in range(ngl):
        E4[j, j * ngl + 0] = 1.0              # west edge slot j -> (j, 0)
        E4[ngl + j, j * ngl + ngl - 1] = 1.0  # east
        E4[2 * ngl + j, j] = 1.0              # south -> (0, j)
        E4[3 * ngl + j, (ngl - 1) * ngl + j] = 1.0  # north
    E4 = jnp.asarray(E4, dt)
    Escat = E4 * minv[None, :]
    Evisc = E4 * (static.visc_mlswe * minv)[None, :]

    # nodal weak d/dx, d/dy scatter (scatter_volume_nodal, uniform):
    # out[(j,i)] = sum_I wjac_df[(j,I)] * kx * F[(j,I)] * dpsi[i,I]   (x)
    #            + sum_J wjac_df[(J,i)] * ey * F[(J,i)] * dpsi[j,J]   (y)
    wj = eflat(g.wjac_df)[0].reshape(ngl, ngl)
    kx = g.ksi_x[0, 0, 0, 0]
    ey = g.eta_y[0, 0, 0, 0]
    eye = jnp.eye(ngl, dtype=dt)
    # Vx[(J,I),(j,i)] = wjac[(J,I)]*kx*delta_{Jj}*dpsi[i,I]
    Vx = jnp.einsum("JI,Jj,iI->JIji", wj * kx, eye, g.dpsi).reshape(npts, npts)
    Vy = jnp.einsum("JI,Ii,jJ->JIji", wj * ey, eye, g.dpsi).reshape(npts, npts)
    scale = -static.visc_mlswe * minv[None, :]
    Vx = Vx * scale
    Vy = Vy * scale

    pbdf = pad_e(eflat(P.pbprime_df)[None], Ep)[0]
    ref = pad_e(eflat(P.btp_rhs_ref) * minv[None, None, :], Ep)
    return UpdateOps(Escat=Escat, Evisc=Evisc, Vx=Vx, Vy=Vy,
                     pbprime_df=pbdf, ref=ref)


def _kernel_update(w_ref, rhs_ref, edges_ref, qb0_ref, qb1_ref,
                   qb2_ref, ref_ref, pbdf_ref, mask_ref, Escat_ref, *rest,
                   use_visc):
    if use_visc:
        (vedges_ref, gv_ref, pbpv_ref, bdg_ref,
         Evisc_ref, Vx_ref, Vy_ref, out_ref) = rest
    else:
        (out_ref,) = rest
    pet = rhs_ref.dtype
    Escat = Escat_ref[0]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=pet, precision=_HI)

    T, npts = rhs_ref.shape[1], rhs_ref.shape[2]
    edges = edges_ref[:]                     # (3, T, 4*ngl)
    rhs = rhs_ref[:] + dot(edges.reshape(3 * T, -1), Escat).reshape(3, T, npts)
    rhs = rhs + ref_ref[:]

    if use_visc:
        gv = gv_ref[:]                       # (4, T, npts)
        qq = pbpv_ref[:] * gv + bdg_ref[:]
        Vx, Vy = Vx_ref[0], Vy_ref[0]
        lap_u = dot(qq[0], Vx) + dot(qq[1], Vy)
        lap_v = dot(qq[2], Vx) + dot(qq[3], Vy)
        vedges = vedges_ref[:]               # (2, T, 4*ngl)
        lap = jnp.stack([lap_u, lap_v]) + dot(
            vedges.reshape(2 * T, -1), Evisc_ref[0]).reshape(2, T, npts)
        rhs = jnp.concatenate([rhs[:1], rhs[1:] + lap], axis=0)

    a0, a1, a2, dtt = w_ref[0], w_ref[1], w_ref[2], w_ref[3]
    qb0, qb1, qb2 = qb0_ref[:], qb1_ref[:], qb2_ref[:]
    new = a0 * qb0[1:4] + a1 * qb1[1:4] + a2 * qb2[1:4] + dtt * rhs
    pbpert = new[0]
    pb = pbpert + pbdf_ref[:]
    mask = mask_ref[:]                       # (2, T, npts)
    qu = new[1] * mask[0]
    qv = new[2] * mask[1]
    out_ref[:] = jnp.stack([pb, pbpert, qu, qv])


def btp_update_pallas(ops: UpdateOps, w, rhs, edges, vedges, qb0, qb1, qb2,
                      gv, pbpv, bdg, mask, *, use_visc, interpret=False):
    """SSPRK stage update. w: (4,) [a0,a1,a2,dt*beta]; rhs: (3,Ep,npts)
    pre-edge, massinv-folded volume RHS; edges: (3,Ep,4*ngl) signed face
    values [W,E,S,N]; vedges: (2,Ep,4*ngl); qb*: (4,Ep,npts) registers;
    gv: (4,Ep,npts); pbpv: (1,Ep,npts); bdg: (4,Ep,npts); mask: (2,Ep,npts).
    Returns qb_new (4,Ep,npts)."""
    from .pallas_btp import _pick_tile, _tile_cap

    Ep, npts = rhs.shape[1], rhs.shape[2]
    T = _pick_tile(Ep, cap=_tile_cap(npts, npts))
    nblk = Ep // T
    dtype = rhs.dtype
    z = np.int32(0)

    def eb(c, n):
        return pl.BlockSpec((c, T, n), lambda i: (z, i, z),
                            memory_space=pltpu.VMEM)

    def op_spec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i, z, z),
                            memory_space=pltpu.VMEM)

    def rep(m):
        return jnp.broadcast_to(m[None], (nblk,) + m.shape)

    kernel = functools.partial(_kernel_update, use_visc=use_visc)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    ngl4 = edges.shape[-1]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                eb(3, npts), eb(3, ngl4),
                eb(4, npts), eb(4, npts), eb(4, npts), eb(3, npts),
                pl.BlockSpec((T, npts), lambda i: (i, z),
                             memory_space=pltpu.VMEM),
                eb(2, npts), op_spec(ops.Escat.shape)]
    operands = [w, rhs, edges, qb0, qb1, qb2, ops.ref, ops.pbprime_df,
                mask, rep(ops.Escat)]
    if use_visc:
        in_specs += [eb(2, ngl4), eb(4, npts), eb(1, npts), eb(4, npts),
                     op_spec(ops.Evisc.shape), op_spec(ops.Vx.shape),
                     op_spec(ops.Vy.shape)]
        operands += [vedges, gv, pbpv, bdg,
                     rep(ops.Evisc), rep(ops.Vx), rep(ops.Vy)]
    out = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=eb(4, npts),
        out_shape=sds((4, Ep, npts), dtype, rhs, qb1),
        interpret=interpret,
        **kwargs,
    )(*align_vma(*operands))
    return out
