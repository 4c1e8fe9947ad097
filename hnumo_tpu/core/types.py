"""Pytree containers for model state, precomputed tables and time averages.

Shapes use the element-major layout of hnumo_tpu.mesh.grid:
  nodal (ney, nex, ngl, ngl); quad (ney, nex, nq, nq)
  x-faces (ney, nex+1, n); y-faces (ney+1, nex, n)
Replaces the reference's ~60 module-level work arrays
(src/mod_variables.F90:51-107) with explicit functional state.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class State(NamedTuple):
    """Prognostic model state (reference src/ti_rk_bcl.F90:11-17).

    PERTURBATION STORAGE of the thickness channels (docs/float32.md):
      q_df[0]      stores δΔp  = Δp  - Δp_ref   (Δp_ref = Precomputed.dpp_ref_df)
      qprime_df[0] stores δΔp' = Δp' - Δp_ref
    so that the f32 thickness signal is carried at full precision and the
    δ-form pressure kernels receive exact perturbations. Momentum channels
    and the barotropic pb (qb_df[0]) remain full variables; qb_df[1] is
    already the perturbation pb - pbprime by the reference's own design.
    """

    qb_df: jnp.ndarray      # (4, nodal): pb, pb'=pb-pbprime, pb*ub, pb*vb
    q_df: jnp.ndarray       # (3, nlayers, nodal): δdp, u*dp, v*dp
    qprime_df: jnp.ndarray  # (3, nlayers, nodal): δdp', u', v'
    t: jnp.ndarray          # model time (scalar)
    ok: jnp.ndarray         # bool: False once negative thickness detected


class Pair(NamedTuple):
    """Per-direction (x-faces, y-faces) pair of arrays/pytrees."""

    x: object
    y: object


class FaceDirGeom(NamedTuple):
    """Static per-direction face tables (device arrays).

    Includes the linearized-Riemann wave-speed coefficient tables
    (reference compute_reference_edge_variables,
    src/mod_initial_mlswe.F90:355-401) and reference-state face values.
    """

    nx: jnp.ndarray            # (F, nq) outward-from-L normal
    ny: jnp.ndarray
    jac: jnp.ndarray           # (F, nq) w * surface jacobian
    nx_df: jnp.ndarray         # (F, ngl)
    ny_df: jnp.ndarray
    jac_df: jnp.ndarray
    coeff_pbpert_L: jnp.ndarray    # (F, nq)
    coeff_pbpert_R: jnp.ndarray
    coeff_pbub_LR: jnp.ndarray
    coeff_mass_pbub_L: jnp.ndarray
    coeff_mass_pbub_R: jnp.ndarray
    coeff_mass_pbpert_LR: jnp.ndarray
    pbprime_face_L: jnp.ndarray    # (F, nq) reference pb' one-sided values
    pbprime_face_R: jnp.ndarray
    one_over_pbprime_edge: jnp.ndarray  # (F, nq) = 1/pbprime_face_L
    pbprime_df_face_L: jnp.ndarray  # (F, ngl)
    pbprime_df_face_R: jnp.ndarray
    zbot_face_L: jnp.ndarray       # (F, nq)
    zbot_face_R: jnp.ndarray
    wall4: jnp.ndarray             # (F, 1) 1.0 on free-slip wall faces else 0.0
    # --- static reference-state (rest) tables for the f32 δ-formulation
    # (docs/float32.md); ref traces are continuous across faces, one table
    # serves both sides ---
    dpp_ref_face: jnp.ndarray      # (L, F, ngl) ref dp' nodal face trace
    dpp_ref_face_q: jnp.ndarray    # (L, F, nq)  = face_n2q of the above
    P_ref_edge: jnp.ndarray        # (L+1, F, nq) ref interface pressures
    Hk_ref_edge: jnp.ndarray       # (L, F, nq) ref per-layer hydrostatic H
    Hedge_ref: jnp.ndarray         # (F, nq) = sum_k Hk_ref_edge
    z_ref_face: jnp.ndarray        # (L+1, F, nq) ref interface elevations


class Precomputed(NamedTuple):
    """Static reference-state tables built at init (device arrays).

    Mirrors mod_initial's MLSWE block (src/mod_initial.F90:42-51,128-182).
    """

    alpha: jnp.ndarray            # (nlayers,) reciprocal layer densities
    pbprime: jnp.ndarray          # quad
    pbprime_df: jnp.ndarray       # nodal
    one_over_pbprime: jnp.ndarray
    one_over_pbprime_df: jnp.ndarray
    zbot_df: jnp.ndarray
    zbot_quad: jnp.ndarray
    grad_zbot_quad: jnp.ndarray   # (2, quad)
    tau_wind: jnp.ndarray         # (2, quad)
    tau_wind_df: jnp.ndarray      # (2, nodal)
    coriolis_quad: jnp.ndarray
    coriolis_df: jnp.ndarray
    fdt2_bcl: jnp.ndarray         # 0.5*f*dt (nodal)
    a_bcl: jnp.ndarray            # semi-implicit Coriolis coefficients
    b_bcl: jnp.ndarray
    ssprk_a: jnp.ndarray          # (kstages, 3)
    ssprk_beta: jnp.ndarray       # (kstages,)
    # --- static reference-state (rest) tables, f32 δ-formulation
    # (docs/float32.md) ---
    dpp_ref_df: jnp.ndarray       # (L, nodal) ref dp'
    dpp_ref_q: jnp.ndarray        # (L, quad)
    sum_ref_residual: jnp.ndarray  # (nodal) sum_k dpp_ref_df - pbprime_df (fp)
    P_ref_q: jnp.ndarray          # (L+1, quad) ref interface pressures
    Hk_ref_q: jnp.ndarray         # (L, quad) ref per-layer H
    H_bcl_ref: jnp.ndarray        # (quad) = sum_k Hk_ref_q
    z_ref_df: jnp.ndarray         # (L+1, nodal) ref interface elevations
    gz_ref: jnp.ndarray           # (2, L+1, quad) ref interface gradients
    btp_rhs_ref: jnp.ndarray      # (3, nodal) static barotropic RHS vector
    bcl_rhs_ref: jnp.ndarray      # (2, L, nodal) static layer-momentum vector
    faces: Pair                   # Pair of FaceDirGeom


class BtpFaceAvg(NamedTuple):
    """Per-direction face time-average accumulators over barotropic substeps.

    All (F, nq). Reference src/mod_rk_mlswe.F90:45-78 and
    src/mod_rhs_btp.F90:296-318.

    PERTURBATION STORAGE (f32-safety; see docs/float32.md): quantities whose
    reference magnitude dwarfs their dynamic signal are stored as
    perturbations from the static reference state:
      dH   = H_face - H_face_ref          (vs reference H_face_ave)
      muL  = ope_L - 1, muR = ope_R - 1   (vs one_plus_eta_edge_ave L/R)
      mu2L = ope_L^2 - 1, mu2R            (vs ..._2_ave)
      mue2 = ope_edge^2 - 1               (vs one_plus_eta_edge_2_ave)
    Reconstruction (ope = 1 + mu, H = H_ref + dH) is exact in exact
    arithmetic, so f64 results are unchanged.
    """

    dH: jnp.ndarray
    QuU: jnp.ndarray   # Qu_face_ave(1) = quu
    QuV: jnp.ndarray   # Qu_face_ave(2) = quv
    QvU: jnp.ndarray   # Qv_face_ave(1) = qvu
    QvV: jnp.ndarray   # Qv_face_ave(2) = qvv
    muL: jnp.ndarray
    muR: jnp.ndarray
    mu2L: jnp.ndarray
    mu2R: jnp.ndarray
    fluxU: jnp.ndarray  # btp_mass_flux_face_ave(1)
    fluxV: jnp.ndarray
    mue2: jnp.ndarray
    ubL: jnp.ndarray
    ubR: jnp.ndarray
    vbL: jnp.ndarray
    vbR: jnp.ndarray
    gvL: jnp.ndarray    # graduvb_face_ave L (4, F, ngl) - nodal resolution
    gvR: jnp.ndarray


class BtpAverages(NamedTuple):
    """All barotropic time averages consumed by the baroclinic step.

    Perturbation storage (see BtpFaceAvg): dH = H - H_bcl_ref (quad),
    mu = ope - 1, mu2 = ope^2 - 1, mu2_df = ope_df^2 - 1.
    """

    dH: jnp.ndarray      # quad
    Qu: jnp.ndarray
    Qv: jnp.ndarray
    Quv: jnp.ndarray
    mu: jnp.ndarray
    mu2: jnp.ndarray
    ub: jnp.ndarray      # uvb_ave(1)
    vb: jnp.ndarray
    mfU: jnp.ndarray     # btp_mass_flux_ave
    mfV: jnp.ndarray
    tbU: jnp.ndarray     # tau_bot_ave
    tbV: jnp.ndarray
    mu2_df: jnp.ndarray  # nodal
    ub_df: jnp.ndarray
    vb_df: jnp.ndarray
    graduvb: jnp.ndarray  # (4, nodal) graduvb_ave (LDG aux for viscosity)
    faces: Pair           # Pair of BtpFaceAvg


class CouplingFields(NamedTuple):
    """Baroclinic coefficient fields consumed by barotropic substeps.

    Reference btp_bcl_coeffs_qdf (src/mod_barotropic_terms.F90:219-409).
    """

    Q_uu_dp: jnp.ndarray   # quad
    Q_uv_dp: jnp.ndarray
    Q_vv_dp: jnp.ndarray
    dH_bcl: jnp.ndarray    # H_bcl - H_bcl_ref (δ-form, docs/float32.md)
    Q_uu_dp_edge: Pair     # (F, nq) per direction
    Q_uv_dp_edge: Pair
    Q_vv_dp_edge: Pair
    dH_bcl_edge: Pair      # H_bcl_edge - Hedge_ref
    # viscosity coefficient fields (nodal-family LDG)
    dpp_graduv: jnp.ndarray       # (4, nlayers, nodal)
    btp_dpp_graduv: jnp.ndarray   # (4, nodal)
    pbprime_visc: jnp.ndarray     # (nodal)
    dpprime_visc: jnp.ndarray     # (nlayers, nodal)
    dpprime_visc_q: jnp.ndarray   # (nlayers, quad) [method_visc==1 family]
    graduv_dpp_face: Pair         # (5, 2=L/R, nlayers, F, ngl)
    btp_graduv_dpp_face: Pair     # (5, 2, F, ngl)
