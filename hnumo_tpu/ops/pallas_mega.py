"""Whole-solve Pallas TPU megakernel for the barotropic sub-cycling.

ONE `pallas_call` executes the ENTIRE barotropic solve — all
N_btp x kstages SSPRK stages (reference ti_barotropic_ssprk_mlswe,
src/mod_rk_mlswe.F90:19-151) — as a `fori_loop` whose state, face traces
and all 23 running averages stay VMEM-resident between stages. The default
path dispatches ~20-30 XLA kernels per stage (95 us/stage measured vs an
~18 us HBM roofline at 32x32 — docs/performance.md); this kernel removes
every inter-stage HBM round-trip and kernel launch, leaving only VPU/MXU
work per stage.

TPU-native design (not a translation of the reference's MPI structure):
  * element-major 2D layout: every field is (C*E, P) with channel blocks
    of E rows and point dims P in lanes (npts=25->32 lanes, nqq=81->88,
    per-side nodal traces 4 x NGL_B, per-side quad traces 4 x NQ_B);
  * tensor-product DG operators are the flattened Kronecker matmuls of
    ops.pallas_btp, made block-diagonal across the four element sides so a
    single MXU call covers all sides at once;
  * neighbor exchange (the reference's MPI face halo,
    src/send_receive_bound.F90) becomes sublane `pltpu.roll`s of the trace
    buffer — element e's west neighbor is row e-1, its south neighbor row
    e-nex — with domain-boundary rows masked to the wall mirror
    (cross-channel-block contamination of a roll only ever lands on
    boundary rows, which the mask overrides);
  * interior faces are computed twice (once per owning element) from
    identical inputs — redundant compute instead of face indexing, the
    same trade the sharded path makes across chips;
  * the SSPRK coefficient tables live in SMEM, indexed by the in-kernel
    stage counter (reference src/mod_rk_mlswe.F90:99-119).

Supported envelope (init.StaticConfig.mega gates; everything else keeps
the default path): f32, uniform (affine brick) geometry, non-periodic
walls, rk35/ssp (not lsrk), nodal-family LDG viscosity (method_visc 2/3)
or none, single device. Parity with the XLA path: tests/test_mega.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_btp import eflat, sds

HI = jax.lax.Precision.HIGHEST

NGL_B = 8      # per-side nodal lane block (ngl=5 padded)
NQ_B = 16      # per-side quad lane block (nq=9 padded)


def _pad_lanes(a, n):
    if a.shape[-1] == n:
        return a
    pads = [(0, 0)] * a.ndim
    pads[-1] = (0, n - a.shape[-1])
    return jnp.pad(a, pads)


class MegaStatic(NamedTuple):
    """State-independent megakernel operands (device arrays, model build)."""

    K: jnp.ndarray        # (npts_b, nqq_b) node->quad interp
    DkT: jnp.ndarray      # (nqq_b, npts_b) w*kx-folded d/ksi scatter
    DeT: jnp.ndarray      # (nqq_b, npts_b)
    KT: jnp.ndarray       # (nqq_b, npts_b) w-folded source scatter
    Eall: jnp.ndarray     # (npts_b, 4*NGL_B) all-side edge extraction
    EQ: jnp.ndarray       # (npts_b, 4*NQ_B) = Eall @ Pq: extraction + face
    #                       n2q folded into ONE matmul (qb face path)
    SPE: jnp.ndarray      # (4*NQ_B, npts_b) = Ps @ PedgeA: face quad
    #                       scatter + edge placement folded (signs commute:
    #                       they are side-block constants and Ps/PedgeA are
    #                       side-block-diagonal)
    PedgeA: jnp.ndarray   # (4*NGL_B, npts_b) all-side edge placement
    #                       (east/north -1 folded; west/south via sgn_ws)
    #                       — still used by the nodal viscosity edge path
    Gx: jnp.ndarray       # (npts_b, npts_b) nodal d/dx (row layout u @ Gx)
    Gy: jnp.ndarray
    LxT: jnp.ndarray      # (npts_b, npts_b) nodal weak-scatter x operator
    LyT: jnp.ndarray
    ptab: jnp.ndarray     # (8E, nqq_b): cor, tau_u, tau_v, gzx, gzy, opbp,
    #                       dpp_ref_q[-1], H_bcl_ref
    btp_ref3: jnp.ndarray  # (3E, npts_b)
    massinv3: jnp.ndarray  # (3E, npts_b)
    pbprime_df: jnp.ndarray  # (E, npts_b)
    opbp_df: jnp.ndarray  # (E, npts_b) 1/pbprime_df
    masku: jnp.ndarray    # (E, npts_b)
    maskv: jnp.ndarray
    ftab: jnp.ndarray     # (13E, 4*NQ_B): nx, ny, jac, cpL, cpR, cpub, cmL,
    #                       cmR, cmLR, opbe, Hedge, pbl, pbr
    ntab: jnp.ndarray     # (3E, 4*NGL_B): nx_df, ny_df, jac_df
    mbnd_q: jnp.ndarray   # (4E, 4*NQ_B) boundary-side flag, quad lanes
    mir_q: jnp.ndarray    # (4E, 4*NQ_B) qb mirror signs, quad lanes
    mbnd_g: jnp.ndarray   # (4E, 4*NGL_B) graduv boundary flag (visc)
    mir_g: jnp.ndarray    # (4E, 4*NGL_B) graduv mirror signs (visc)
    sgn_ws: jnp.ndarray   # (E, 4*NGL_B) west/south edge-add sign (visc)
    sgn_q: jnp.ndarray    # (E, 4*NQ_B) same signs on quad lanes
    a_tab: jnp.ndarray    # (kstages, 3) SMEM
    b_tab: jnp.ndarray    # (kstages, 1) SMEM
    # NOTE: no python ints here — MegaStatic is a jit-argument pytree, so
    # every field must be an array; sizes are derived from shapes.


def _side_views(pair_x, pair_y, ney, nex):
    """Per-side element views of per-direction (F, m) face tables.

    east(i,j) = x-face (i, j+1); west = x-face (i, j); north = y-face
    (i+1, j); south = y-face (i, j)."""
    fx = pair_x.reshape(ney, nex + 1, pair_x.shape[-1])
    fy = pair_y.reshape(ney + 1, nex, pair_y.shape[-1])
    E = ney * nex
    return (fx[:, 1:, :].reshape(E, -1), fx[:, :-1, :].reshape(E, -1),
            fy[1:, :, :].reshape(E, -1), fy[:-1, :, :].reshape(E, -1))


def _pack_sides(e, w, n, s, blk):
    return jnp.concatenate([_pad_lanes(a, blk) for a in (e, w, n, s)], -1)


def _side_tables(tabs_x, tabs_y, ney, nex, blk):
    rows = []
    for tx, ty in zip(tabs_x, tabs_y):
        rows.append(_pack_sides(*_side_views(tx, ty, ney, nex), blk))
    return jnp.concatenate(rows, axis=0)


def _kron(a, b):
    return jnp.einsum("jJ,iI->jiJI", a, b).reshape(
        a.shape[0] * b.shape[0], a.shape[1] * b.shape[1])


def _erows(a, nb):
    """(C, ney, nex, m, m) -> (C*E, m*m) padded to nb lanes."""
    f = eflat(a)
    return _pad_lanes(f.reshape(f.shape[0] * f.shape[1], f.shape[2]), nb)


def build_mega_static(static, g, P, bc) -> MegaStatic:
    """Build the static operand bundle (eager, at Model init)."""
    from ..core.faces import _mirror_signs, face_n2q, wall_projection_masks

    dtype = g.psiq.dtype
    ngl, nq = g.psiq.shape
    npts, nqq = ngl * ngl, nq * nq
    npts_b = ((npts + 7) // 8) * 8
    nqq_b = ((nqq + 7) // 8) * 8
    ney, nex = g.wjac.shape[0], g.wjac.shape[1]
    E = ney * nex
    assert ngl <= NGL_B and nq <= NQ_B, "raise NGL_B/NQ_B for this order"

    # ---- operators (uniform geometry; metric constants folded) ----
    K = _kron(g.psiq, g.psiq)
    Dk = _kron(g.psiq, g.dpsiq)
    De = _kron(g.dpsiq, g.psiq)
    wvec = eflat(g.wjac[None])[0, 0]
    kx = g.ksiq_x[0, 0, 0, 0]
    ey = g.etaq_y[0, 0, 0, 0]

    def padKk(m):   # (npts, nqq) -> (npts_b, nqq_b)
        return _pad_lanes(jnp.pad(m, ((0, npts_b - npts), (0, 0))), nqq_b)

    def padQn(m):   # (nqq, npts) -> (nqq_b, npts_b)
        return _pad_lanes(jnp.pad(m, ((0, nqq_b - nqq), (0, 0))), npts_b)

    Kp = padKk(K)
    DkT = padQn(Dk.T * (wvec * kx)[:, None])
    DeT = padQn(De.T * (wvec * ey)[:, None])
    KT = padQn(K.T * wvec[:, None])

    Eall = np.zeros((npts_b, 4 * NGL_B))
    for n in range(ngl):
        Eall[n * ngl + (ngl - 1), 0 * NGL_B + n] = 1.0   # east (i=ngl-1)
        Eall[n * ngl + 0, 1 * NGL_B + n] = 1.0           # west (i=0)
        Eall[(ngl - 1) * ngl + n, 2 * NGL_B + n] = 1.0   # north (j=ngl-1)
        Eall[0 * ngl + n, 3 * NGL_B + n] = 1.0           # south (j=0)
    psiq_h = np.asarray(g.psiq, np.float64)
    Pq = np.zeros((4 * NGL_B, 4 * NQ_B))
    Ps = np.zeros((4 * NQ_B, 4 * NGL_B))
    for s in range(4):
        Pq[s * NGL_B:s * NGL_B + ngl, s * NQ_B:s * NQ_B + nq] = psiq_h
        Ps[s * NQ_B:s * NQ_B + nq, s * NGL_B:s * NGL_B + ngl] = psiq_h.T
    PedgeA = np.zeros((4 * NGL_B, npts_b))
    for n in range(ngl):
        PedgeA[0 * NGL_B + n, n * ngl + (ngl - 1)] = -1.0
        PedgeA[1 * NGL_B + n, n * ngl + 0] = 1.0
        PedgeA[2 * NGL_B + n, (ngl - 1) * ngl + n] = -1.0
        PedgeA[3 * NGL_B + n, 0 * ngl + n] = 1.0

    eye = np.eye(ngl)
    dpsi = np.asarray(g.dpsi, np.float64)
    kx_df = float(np.asarray(g.ksi_x)[0, 0, 0, 0])
    ey_df = float(np.asarray(g.eta_y)[0, 0, 0, 0])
    # row layout ux = u @ Gx  <=>  ops.dg.grad_nodal einsums:
    # Gx[(j,i),(J,I)] = kx * d_jJ * dpsi[i,I]; Gy[(j,i),(J,I)] = ey * d_iI
    # * dpsi[j,J]  (same construction as pallas_btp.operators_uniform)
    Gx = kx_df * np.einsum("jJ,iI->jiJI", eye, dpsi).reshape(npts, npts)
    Gy = ey_df * np.einsum("jJ,iI->jiJI", dpsi, eye).reshape(npts, npts)

    def padNN(m):
        out = np.zeros((npts_b, npts_b))
        out[:npts, :npts] = m
        return out
    # nodal weak scatter (ops.dg.scatter_volume_nodal, uniform):
    # out[j,i] = sum_ii w[j,ii] kx Fx[j,ii] dpsi[i,ii]
    #          + sum_jj w[jj,i] ey Fy[jj,i] dpsi[j,jj]
    wjac_df = np.asarray(g.wjac_df, np.float64)[0, 0].reshape(npts)
    LxT = np.zeros((npts, npts))
    LyT = np.zeros((npts, npts))
    for j in range(ngl):
        for i in range(ngl):
            for ii in range(ngl):
                LxT[j * ngl + ii, j * ngl + i] += (
                    wjac_df[j * ngl + ii] * kx_df * dpsi[i, ii])
            for jj in range(ngl):
                LyT[jj * ngl + i, j * ngl + i] += (
                    wjac_df[jj * ngl + i] * ey_df * dpsi[j, jj])

    # ---- element tables ----
    ptab = jnp.concatenate([
        _erows(x[None], nqq_b) for x in (
            P.coriolis_quad, P.tau_wind[0], P.tau_wind[1],
            P.grad_zbot_quad[0], P.grad_zbot_quad[1],
            P.one_over_pbprime, P.dpp_ref_q[-1], P.H_bcl_ref)], axis=0)
    btp_ref3 = _erows(P.btp_rhs_ref, npts_b)
    mi = _erows(g.massinv[None], npts_b)
    massinv3 = jnp.concatenate([mi, mi, mi], axis=0)
    mu_w, mv_w = wall_projection_masks((ney, nex, ngl, ngl), bc, dtype)
    masku = _erows(mu_w[None], npts_b)
    maskv = _erows(mv_w[None], npts_b)

    # ---- face tables ----
    fx, fy = P.faces.x, P.faces.y
    names = ["nx", "ny", "jac", "coeff_pbpert_L", "coeff_pbpert_R",
             "coeff_pbub_LR", "coeff_mass_pbub_L", "coeff_mass_pbub_R",
             "coeff_mass_pbpert_LR", "one_over_pbprime_edge", "Hedge_ref"]
    ftab = _side_tables(
        [getattr(fx, nm) for nm in names]
        + [face_n2q(g.psiq, fx.pbprime_df_face_L),
           face_n2q(g.psiq, fx.pbprime_df_face_R)],
        [getattr(fy, nm) for nm in names]
        + [face_n2q(g.psiq, fy.pbprime_df_face_L),
           face_n2q(g.psiq, fy.pbprime_df_face_R)], ney, nex, NQ_B)
    ntab = _side_tables([fx.nx_df, fx.ny_df, fx.jac_df],
                        [fy.nx_df, fy.ny_df, fy.jac_df], ney, nex, NGL_B)

    # ---- boundary masks / mirror signs / edge-add signs ----
    use_visc = static.use_visc and static.method_visc != 1
    col = np.zeros((ney, nex, 4))      # (i, j, side[E,W,N,S])
    col[:, -1, 0] = 1.0
    col[:, 0, 1] = 1.0
    col[-1, :, 2] = 1.0
    col[0, :, 3] = 1.0
    col = col.reshape(E, 4)

    def _bnd(blk, m, nch):
        out = np.zeros((E, 4 * blk))
        for s in range(4):
            out[:, s * blk:s * blk + m] = col[:, s:s + 1]
        return np.tile(out, (nch, 1))

    def _mir(blk, m, sigs):
        out = np.ones((4 * E, 4 * blk))
        for c in range(4):
            for s in range(4):
                lane = slice(s * blk, s * blk + m)
                out[c * E:(c + 1) * E, lane] = np.where(
                    col[:, s:s + 1] > 0, sigs[s][c],
                    out[c * E:(c + 1) * E, lane])
        return out

    qb_sigs = [_mirror_signs(4, code, d, ((2, 3),))
               for code, d in ((bc.east, "x"), (bc.west, "x"),
                               (bc.north, "y"), (bc.south, "y"))]
    gv_sigs = [_mirror_signs(4, code, d, ((0, 1), (2, 3)))
               for code, d in ((bc.east, "x"), (bc.west, "x"),
                               (bc.north, "y"), (bc.south, "y"))]
    mbnd_q = _bnd(NQ_B, nq, 4)
    mir_q = _mir(NQ_B, nq, qb_sigs)
    if use_visc:
        mbnd_g = _bnd(NGL_B, ngl, 4)
        mir_g = _mir(NGL_B, ngl, gv_sigs)
    else:
        mbnd_g = np.zeros((1, 4 * NGL_B))
        mir_g = np.ones((1, 4 * NGL_B))
    sgn_ws = np.ones((E, 4 * NGL_B))
    sgn_ws[:, 1 * NGL_B:2 * NGL_B] = np.where(col[:, 1:2] > 0, -1.0, 1.0)
    sgn_ws[:, 3 * NGL_B:4 * NGL_B] = np.where(col[:, 3:4] > 0, -1.0, 1.0)
    sgn_q = np.ones((E, 4 * NQ_B))
    sgn_q[:, 1 * NQ_B:2 * NQ_B] = np.where(col[:, 1:2] > 0, -1.0, 1.0)
    sgn_q[:, 3 * NQ_B:4 * NQ_B] = np.where(col[:, 3:4] > 0, -1.0, 1.0)

    cast = lambda a: jnp.asarray(a, dtype)
    return MegaStatic(
        K=cast(Kp), DkT=cast(DkT), DeT=cast(DeT), KT=cast(KT),
        Eall=cast(Eall), EQ=cast(Eall @ Pq), SPE=cast(Ps @ PedgeA),
        PedgeA=cast(PedgeA),
        Gx=cast(padNN(Gx)), Gy=cast(padNN(Gy)),
        LxT=cast(padNN(LxT)), LyT=cast(padNN(LyT)),
        ptab=cast(ptab), btp_ref3=cast(btp_ref3),
        massinv3=cast(massinv3),
        pbprime_df=cast(_erows(P.pbprime_df[None], npts_b)),
        opbp_df=cast(_erows(P.one_over_pbprime_df[None], npts_b)),
        masku=cast(masku), maskv=cast(maskv), ftab=cast(ftab),
        ntab=cast(ntab), mbnd_q=cast(mbnd_q), mir_q=cast(mir_q),
        mbnd_g=cast(mbnd_g), mir_g=cast(mir_g),
        sgn_ws=cast(sgn_ws), sgn_q=cast(sgn_q),
        a_tab=jnp.asarray(np.asarray(P.ssprk_a), dtype),
        b_tab=jnp.asarray(np.asarray(P.ssprk_beta).reshape(-1, 1), dtype))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _mega_kernel(qb0_ref, qplq_ref, coup_ref, qe_ref, bgf_ref, pvisc_ref,
                 bdg_ref, ptab_ref, ref3_ref, mi3_ref, pbp_ref, opbp_ref,
                 mu_ref, mv_ref, ftab_ref, ntab_ref, mbndq_ref, mirq_ref,
                 mbndg_ref, mirg_ref, sgnws_ref, sgnq_ref, K_ref, DkT_ref,
                 DeT_ref, KT_ref, Eall_ref, EQ_ref, SPE_ref, Pe_ref,
                 Gx_ref, Gy_ref, LxT_ref, LyT_ref, a_ref, b_ref,
                 qb_out, accv_out, accn_out, agr_out, aff_out, agt_out,
                 *, nsub, kstages, E, npts_b, nex, n_tr, dt_btp, grav,
                 botfr, cd, alpha_bot, visc, use_visc, prec=HI):
    f32 = qb0_ref.dtype

    # NO upfront ref loads: every operand is read from its VMEM window at
    # its USE SITE inside the stage body. Loading operands into values
    # before the loop makes each a loop-live vector — measured 67 MB of
    # register-allocator spill slots at 32x32, blowing the 128 MB VMEM
    # budget; use-site loads keep live ranges within one body section.
    def mm(a, b_ref):
        return jnp.dot(a, b_ref[:], preferred_element_type=f32,
                       precision=prec)

    def ch(ref, c, n=1):
        """Channel-row slice of a (C*E, P) ref or array."""
        return ref[c * E:(c + n) * E]

    accv_out[:] = jnp.zeros_like(accv_out)
    accn_out[:] = jnp.zeros_like(accn_out)
    agr_out[:] = jnp.zeros_like(agr_out)
    aff_out[:] = jnp.zeros_like(aff_out)
    agt_out[:] = jnp.zeros_like(agt_out)

    B = NGL_B

    def stage(i, carry):
        qb0, qb1, qb2 = carry            # (4E, npts_b)
        ik = jax.lax.rem(i, kstages)
        qb0 = jnp.where(ik == 0, qb1, qb0)

        # nodal accumulators from the PRE-stage state (reference :90-92).
        # All 1/x guards below protect only the zero PADDING lanes (real dp
        # and pb are strictly positive); without them 0*inf NaNs would ride
        # the zero operator rows into every matmul output.
        inv_pb = 1.0 / jnp.where(ch(qb1, 0) == 0.0, 1.0, ch(qb1, 0))
        t_df = ch(qb1, 1) * opbp_ref[:]
        u_df = ch(qb1, 2) * inv_pb
        v_df = ch(qb1, 3) * inv_pb
        # accumulators update per channel-row slice: a single concatenated
        # add would materialize MB-scale temporaries (VMEM is the budget)
        accn_out[0 * E:1 * E] += t_df * (2.0 + t_df)
        accn_out[1 * E:2 * E] += u_df
        accn_out[2 * E:3 * E] += v_df

        # ---- volume RHS (reference create_rhs_btp_volume_qdf) ----
        qq = mm(qb1, K_ref)
        dp, dpp, udp, vdp = (ch(qq, c) for c in range(4))
        ppq, up, vp = (ch(qplq_ref, c) for c in range(3))
        cor, tau_u, tau_v, gzx, gzy, opbp, ppref, Href = (
            ch(ptab_ref, c) for c in range(8))
        inv_dp = 1.0 / jnp.where(dp == 0.0, 1.0, dp)
        ub = udp * inv_dp
        vb = vdp * inv_dp
        if botfr == 1:
            spd = (cd / grav) * (ppref + ppq)
            tb_u = spd * (up + ub)
            tb_v = spd * (vp + vb)
        elif botfr == 2:
            ubot, vbot = up + ub, vp + vb
            spd = (cd / alpha_bot) * jnp.sqrt(ubot * ubot + vbot * vbot)
            tb_u = spd * ubot
            tb_v = spd * vbot
        else:
            tb_u = jnp.zeros_like(dp)
            tb_v = jnp.zeros_like(dp)
        sc_x = cor * vdp + grav * (tau_u - tb_u) - grav * dpp * gzx
        sc_y = -cor * udp + grav * (tau_v - tb_v) - grav * dpp * gzy
        Quu, Quv, Qvv, dHbcl = (ch(coup_ref, c) for c in range(4))
        mu = dpp * opbp
        mu2 = mu * (2.0 + mu)
        ope = 1.0 + mu
        dHq = dHbcl + mu2 * (Href + dHbcl)
        qu_t = ub * udp + ope * Quu
        quv = ub * vdp + ope * Quv
        qv_t = vb * vdp + ope * Qvv
        for c, inc in enumerate((dHq, qu_t, qv_t, quv, mu, mu2, ub, vb,
                                 udp, vdp, tb_u, tb_v)):
            accv_out[c * E:(c + 1) * E] += inc
        Fx = jnp.concatenate([udp, dHq + qu_t, quv], axis=0)
        Fy = jnp.concatenate([vdp, quv, dHq + qv_t], axis=0)
        Fs = jnp.concatenate([jnp.zeros_like(sc_x), sc_x, sc_y], axis=0)
        rhs = (mm(Fx, DkT_ref) + mm(Fy, DeT_ref)
               + mm(Fs, KT_ref))                         # (3E, npts_b)

        # ---- traces + neighbor exchange (rolls; boundary rows masked).
        # The qb path extracts + face-interpolates in ONE matmul (EQ =
        # Eall@Pq): rolls, mirrors and the boundary L/R role flip commute
        # with the per-element face n2q, so they act on quad traces. ----
        def lr(tr, blk, mbnd, mir, nrows):
            nbr = jnp.concatenate([
                pltpu.roll(tr[:, blk:2 * blk], nrows - 1, 0),    # east R
                pltpu.roll(tr[:, 0:blk], 1, 0),                  # west L
                pltpu.roll(tr[:, 3 * blk:4 * blk], nrows - nex, 0),
                pltpu.roll(tr[:, 2 * blk:3 * blk], nex, 0),      # south L
            ], axis=-1)
            trL = jnp.where(mbnd > 0.0, tr, jnp.concatenate([
                tr[:, 0:blk], nbr[:, blk:2 * blk],
                tr[:, 2 * blk:3 * blk], nbr[:, 3 * blk:4 * blk]], axis=-1))
            trR = jnp.where(mbnd > 0.0, mir * tr, jnp.concatenate([
                nbr[:, 0:blk], tr[:, blk:2 * blk],
                nbr[:, 2 * blk:3 * blk], tr[:, 3 * blk:4 * blk]], axis=-1))
            return trL, trR

        trq = mm(qb1, EQ_ref)                  # (4E, 4*NQ_B) quad traces
        qbL, qbR = lr(trq, NQ_B, mbndq_ref[:], mirq_ref[:], 4 * E)

        # ---- face flux (port of btp._face_flux_core; reference
        #      creat_btp_fluxes_qdf, src/mod_rhs_btp.F90:211-364) ----
        nx, ny, jacf = ch(ftab_ref, 0), ch(ftab_ref, 1), ch(ftab_ref, 2)
        cpL, cpR, cpub = (ch(ftab_ref, c) for c in (3, 4, 5))
        cmL, cmR, cmLR = (ch(ftab_ref, c) for c in (6, 7, 8))
        opbe, Hedge = ch(ftab_ref, 9), ch(ftab_ref, 10)
        pbl, pbr = ch(ftab_ref, 11), ch(ftab_ref, 12)
        l0, l1, l2c, l3 = (ch(qbL, c) for c in range(4))
        r0, r1, r2c, r3 = (ch(qbR, c) for c in range(4))

        pU_L = nx * l2c + ny * l3
        pU_R = -(nx * r2c + ny * r3)
        pbpert_edge = cpL * l1 + cpR * r1 + cpub * (pU_L + pU_R)
        mue = pbpert_edge * opbe
        mue2 = mue * (2.0 + mue)
        ope_e = 1.0 + mue
        flux_ex = cmL * l2c + cmR * r2c + cmLR * nx * (l1 - r1)
        flux_ey = cmL * l3 + cmR * r3 + cmLR * ny * (l1 - r1)
        safe0 = jnp.where(l0 == 0.0, 1.0, l0)   # padded lanes hold zeros
        safer0 = jnp.where(r0 == 0.0, 1.0, r0)
        ul_f, ur_f = l2c / safe0, r2c / safer0
        vl_f, vr_f = l3 / safe0, r3 / safer0
        Qe_uu, Qe_uv, Qe_vv, dHe = (ch(qe_ref, c) for c in range(4))
        quu_f = 0.5 * (ul_f * l2c + ur_f * r2c) + ope_e * Qe_uu
        quv_f = 0.5 * (vl_f * l2c + vr_f * r2c) + ope_e * Qe_uv
        qvu_f = 0.5 * (ul_f * l3 + ur_f * r3) + ope_e * Qe_uv
        qvv_f = 0.5 * (vl_f * l3 + vr_f * r3) + ope_e * Qe_vv
        dH_f = dHe + mue2 * (Hedge + dHe)
        dispu = 0.5 * cmLR * (r2c - l2c)
        dispv = 0.5 * cmLR * (r3 - l3)
        fl_x = nx * quu_f + ny * quv_f - dispu
        fl_y = nx * qvu_f + ny * qvv_f - dispv
        fl_m = nx * flux_ex + ny * flux_ey
        safepb = jnp.where(pbl == 0.0, 1.0, pbl)
        safepbr = jnp.where(pbr == 0.0, 1.0, pbr)
        muL_f = l1 / safepb
        muR_f = r1 / safepbr
        for c, inc in enumerate((dH_f, quu_f, quv_f, qvu_f, qvv_f, muL_f,
                                 muR_f, muL_f * (2.0 + muL_f),
                                 muR_f * (2.0 + muR_f), flux_ex, flux_ey,
                                 mue2, ul_f, ur_f, vl_f, vr_f)):
            aff_out[c * E:(c + 1) * E] += inc

        # quad scatter + edge placement folded (SPE = Ps@PedgeA); the
        # per-element west/south sign commutes to the quad lanes (side-
        # block-constant against side-block-diagonal operators)
        sgq = sgnq_ref[:]
        Sq = jnp.concatenate(
            [sgq * (jacf * fl_m), sgq * (jacf * (nx * dH_f + fl_x)),
             sgq * (jacf * (ny * dH_f + fl_y))], axis=0)
        rhs = rhs + mm(Sq, SPE_ref)

        # ---- nodal-family LDG viscosity (port of btp._nodal_laplacian_flat;
        #      reference src/mod_laplacian_quad.F90:357-519) ----
        if use_visc:
            uv = jnp.concatenate([u_df, v_df], axis=0)   # (2E, npts_b)
            gx_uv = mm(uv, Gx_ref)                       # rows [gux; gvx]
            gy_uv = mm(uv, Gy_ref)                       # rows [guy; gvy]
            graduv = jnp.concatenate(
                [gx_uv[:E], gy_uv[:E], gx_uv[E:], gy_uv[E:]], axis=0)
            agr_out[:] += graduv
            gtr = mm(graduv, Eall_ref)           # (4E, 4B) nodal traces
            gL, gR = lr(gtr, B, mbndg_ref[:], mirg_ref[:], 4 * E)
            agt_out[:4 * E] += gL
            agt_out[4 * E:] += gR
            bmulL = ch(bgf_ref, 4)
            bmulR = ch(bgf_ref, 9)
            fl_v = jnp.concatenate(
                [bmulL * ch(gL, c) + ch(bgf_ref, c) for c in range(4)], 0)
            fr_v = jnp.concatenate(
                [bmulR * ch(gR, c) + ch(bgf_ref, 5 + c) for c in range(4)],
                0)
            qmean = 0.5 * (fl_v + fr_v)
            nxdf, nydf, jacdf = (ch(ntab_ref, c) for c in (0, 1, 2))
            flux_qu = (ch(qmean, 0) - ch(fl_v, 0) * nxdf
                       + ch(qmean, 1) - ch(fl_v, 1) * nydf)
            flux_qv = (ch(qmean, 2) - ch(fl_v, 2) * nxdf
                       + ch(qmean, 3) - ch(fl_v, 3) * nydf)
            sgnws = sgnws_ref[:]
            Sv = jnp.concatenate([jacdf * flux_qu, jacdf * flux_qv], axis=0)
            vedges = jnp.concatenate([sgnws, sgnws], axis=0) * (-Sv)
            lap_face = mm(vedges, Pe_ref)      # (2E, npts_b)
            # volume: qq = pbprime_visc*graduv + btp_dpp_graduv
            qq_v = pvisc_t(pvisc_ref[:], graduv, bdg_ref, E)
            qq_x = jnp.concatenate([ch(qq_v, 0), ch(qq_v, 2)], axis=0)
            qq_y = jnp.concatenate([ch(qq_v, 1), ch(qq_v, 3)], axis=0)
            lap = -(mm(qq_x, LxT_ref) + mm(qq_y, LyT_ref)) + lap_face
            rhs = jnp.concatenate(
                [rhs[:E], rhs[E:] + visc * lap], axis=0)

        # ---- SSPRK stage combine + wall projection ----
        rhs = mi3_ref[:] * (rhs + ref3_ref[:])
        a0, a1, a2 = a_ref[ik, 0], a_ref[ik, 1], a_ref[ik, 2]
        bt = b_ref[ik, 0]
        new234 = (a0 * qb0[E:] + a1 * qb1[E:] + a2 * qb2[E:]
                  + (dt_btp * bt) * rhs)
        pb_new = new234[:E] + pbp_ref[:]
        qu_new = mu_ref[:] * new234[E:2 * E]
        qv_new = mv_ref[:] * new234[2 * E:]
        qb1n = jnp.concatenate([pb_new, new234[:E], qu_new, qv_new], axis=0)
        if kstages == 5:
            qb2 = jnp.where(ik == 1, qb1n, qb2)
        return qb0, qb1n, qb2

    qb0 = qb0_ref[:]
    _, qb1, _ = jax.lax.fori_loop(
        0, nsub, stage, (qb0, qb0, jnp.zeros_like(qb0)))
    qb_out[:] = qb1


def pvisc_t(pvisc, graduv, bdg, E):
    """qq = pbprime_visc * graduv + btp_dpp_graduv, channel-row stacked."""
    return jnp.concatenate(
        [pvisc * graduv[c * E:(c + 1) * E] + bdg[c * E:(c + 1) * E]
         for c in range(4)], axis=0)


# ---------------------------------------------------------------------------
# wrapper: full barotropic solve
# ---------------------------------------------------------------------------


def barotropic_solve_mega(static, P, g, bc, coup, qb_df, qprime_df,
                          mops: MegaStatic, interpret=False, prec=HI):
    """Whole-solve megakernel path of core.btp.barotropic_solve.

    Same contract: returns (qb at t+dt (4, ney, nex, ngl, ngl),
    BtpAverages)."""
    from ..core.btp import _averages_view
    from ..ops.dg import interp_n2q

    dtype = qb_df.dtype
    ney, nex = g.wjac.shape[0], g.wjac.shape[1]
    ngl, nq = g.psiq.shape
    E = ney * nex
    npts_b, nqq_b = mops.K.shape
    use_visc = mops.mbnd_g.shape[0] > 1
    n_tr = 8 if use_visc else 4
    nsub = static.n_btp * static.kstages

    # per-solve inputs
    qb0 = _erows(qb_df, npts_b)
    qplq = _erows(interp_n2q(g, qprime_df[:, -1]), nqq_b)
    coup_v = _erows(jnp.stack(
        [coup.Q_uu_dp, coup.Q_uv_dp, coup.Q_vv_dp, coup.dH_bcl]), nqq_b)
    qe = _side_tables(
        [coup.Q_uu_dp_edge.x, coup.Q_uv_dp_edge.x, coup.Q_vv_dp_edge.x,
         coup.dH_bcl_edge.x],
        [coup.Q_uu_dp_edge.y, coup.Q_uv_dp_edge.y, coup.Q_vv_dp_edge.y,
         coup.dH_bcl_edge.y], ney, nex, NQ_B)
    if use_visc:
        bx = coup.btp_graduv_dpp_face.x      # (5, 2, F, ngl)
        by = coup.btp_graduv_dpp_face.y
        bgf = _side_tables(
            [bx[c, 0] for c in range(5)] + [bx[c, 1] for c in range(5)],
            [by[c, 0] for c in range(5)] + [by[c, 1] for c in range(5)],
            ney, nex, NGL_B)
        pvisc = _erows(coup.pbprime_visc[None], npts_b)
        bdg = _erows(coup.btp_dpp_graduv, npts_b)
    else:
        bgf = jnp.zeros((1, 4 * NGL_B), dtype)
        pvisc = jnp.zeros((1, npts_b), dtype)
        bdg = jnp.zeros((1, npts_b), dtype)

    kern = functools.partial(
        _mega_kernel, nsub=nsub, kstages=static.kstages, E=E,
        npts_b=npts_b, nex=nex, n_tr=n_tr, dt_btp=static.dt_btp,
        grav=static.gravity, botfr=static.botfr, cd=static.cd_mlswe,
        alpha_bot=static.alpha_bot, visc=static.visc_mlswe,
        use_visc=use_visc, prec=prec)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = [
        jax.ShapeDtypeStruct((4 * E, npts_b), dtype),        # qb
        jax.ShapeDtypeStruct((12 * E, nqq_b), dtype),        # accv
        jax.ShapeDtypeStruct((3 * E, npts_b), dtype),        # accn
        jax.ShapeDtypeStruct((4 * E if use_visc else 1, npts_b), dtype),
        jax.ShapeDtypeStruct((16 * E, 4 * NQ_B), dtype),     # aff
        jax.ShapeDtypeStruct((8 * E if use_visc else 1, 4 * NGL_B), dtype),
    ]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024)
    qb_o, accv_o, accn_o, agr_o, aff_o, agt_o = pl.pallas_call(
        kern,
        in_specs=[vspec] * 34 + [sspec] * 2,
        out_specs=[vspec] * 6,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(qb0, qplq, coup_v, qe, bgf, pvisc, bdg, mops.ptab, mops.btp_ref3,
      mops.massinv3, mops.pbprime_df, mops.opbp_df, mops.masku, mops.maskv,
      mops.ftab, mops.ntab, mops.mbnd_q, mops.mir_q, mops.mbnd_g,
      mops.mir_g, mops.sgn_ws, mops.sgn_q, mops.K, mops.DkT, mops.DeT,
      mops.KT, mops.Eall, mops.EQ, mops.SPE, mops.PedgeA, mops.Gx, mops.Gy,
      mops.LxT, mops.LyT, mops.a_tab, mops.b_tab)

    npts, nqq = ngl * ngl, nq * nq
    n_inv = jnp.asarray(1.0 / nsub, dtype)

    def unrows(a, C, m):
        return (a.reshape(C, E, -1)[..., :m * m]
                .reshape(C, ney, nex, m, m))

    qb = unrows(qb_o, 4, ngl)
    vol = unrows(accv_o * n_inv, 12, nq)
    nod = unrows(accn_o * n_inv, 3, ngl)
    agrad = (unrows(agr_o * n_inv, 4, ngl) if use_visc
             else jnp.zeros((4, ney, nex, ngl, ngl), dtype))

    # face accumulators: interior faces were computed identically from both
    # owners; take east/north blocks + the boundary west/south column
    aff = (aff_o * n_inv).reshape(16, E, 4 * NQ_B)

    def sideq(a, s, nq_):
        return (a[..., s * NQ_B:s * NQ_B + nq_]
                .reshape(a.shape[0], ney, nex, nq_))

    af_e = sideq(aff, 0, nq)
    af_w = sideq(aff, 1, nq)
    af_n = sideq(aff, 2, nq)
    af_s = sideq(aff, 3, nq)
    afx = jnp.concatenate([af_w[:, :, :1], af_e], axis=2)
    afy = jnp.concatenate([af_s[:, :1], af_n], axis=1)

    if use_visc:
        agt = (agt_o * n_inv).reshape(8, E, 4 * NGL_B)
        gL, gR = agt[:4], agt[4:]

        def siden(a, s):
            return (a[..., s * NGL_B:s * NGL_B + ngl]
                    .reshape(a.shape[0], ney, nex, ngl))

        gxl = jnp.concatenate([siden(gL, 1)[:, :, :1], siden(gL, 0)], axis=2)
        gxr = jnp.concatenate([siden(gR, 1), siden(gR, 0)[:, :, -1:]], axis=2)
        gyl = jnp.concatenate([siden(gL, 3)[:, :1], siden(gL, 2)], axis=1)
        gyr = jnp.concatenate([siden(gR, 3), siden(gR, 2)[:, -1:]], axis=1)
        agx = jnp.stack([gxl, gxr])          # (2, 4, ney, nex+1, ngl)
        agy = jnp.stack([gyl, gyr])
    else:
        agx = jnp.zeros((2, 4, ney, nex + 1, ngl), dtype)
        agy = jnp.zeros((2, 4, ney + 1, nex, ngl), dtype)

    return qb, _averages_view(static, vol, nod, afx, afy, agx, agy, agrad)
