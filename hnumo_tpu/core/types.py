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
    """Prognostic model state (reference src/ti_rk_bcl.F90:11-17)."""

    qb_df: jnp.ndarray      # (4, nodal): pb, pb'=pb-pbprime, pb*ub, pb*vb
    q_df: jnp.ndarray       # (3, nlayers, nodal): dp, u*dp, v*dp
    qprime_df: jnp.ndarray  # (3, nlayers, nodal): dp', u', v'
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
    faces: Pair                   # Pair of FaceDirGeom


class BtpFaceAvg(NamedTuple):
    """Per-direction face time-average accumulators over barotropic substeps.

    All (F, nq). Reference src/mod_rk_mlswe.F90:45-78 and
    src/mod_rhs_btp.F90:296-318.
    """

    H: jnp.ndarray
    QuU: jnp.ndarray   # Qu_face_ave(1) = quu
    QuV: jnp.ndarray   # Qu_face_ave(2) = quv
    QvU: jnp.ndarray   # Qv_face_ave(1) = qvu
    QvV: jnp.ndarray   # Qv_face_ave(2) = qvv
    opeL: jnp.ndarray
    opeR: jnp.ndarray
    ope2L: jnp.ndarray
    ope2R: jnp.ndarray
    fluxU: jnp.ndarray  # btp_mass_flux_face_ave(1)
    fluxV: jnp.ndarray
    opee2: jnp.ndarray  # one_plus_eta_edge_2_ave
    ubL: jnp.ndarray
    ubR: jnp.ndarray
    vbL: jnp.ndarray
    vbR: jnp.ndarray
    gvL: jnp.ndarray    # graduvb_face_ave L (4, F, ngl) - nodal resolution
    gvR: jnp.ndarray


class BtpAverages(NamedTuple):
    """All barotropic time averages consumed by the baroclinic step."""

    H: jnp.ndarray       # quad
    Qu: jnp.ndarray
    Qv: jnp.ndarray
    Quv: jnp.ndarray
    ope: jnp.ndarray
    ope2: jnp.ndarray
    ub: jnp.ndarray      # uvb_ave(1)
    vb: jnp.ndarray
    mfU: jnp.ndarray     # btp_mass_flux_ave
    mfV: jnp.ndarray
    tbU: jnp.ndarray     # tau_bot_ave
    tbV: jnp.ndarray
    ope2_df: jnp.ndarray  # nodal
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
    H_bcl: jnp.ndarray
    Q_uu_dp_edge: Pair     # (F, nq) per direction
    Q_uv_dp_edge: Pair
    Q_vv_dp_edge: Pair
    H_bcl_edge: Pair
    # viscosity coefficient fields (nodal-family LDG)
    dpp_graduv: jnp.ndarray       # (4, nlayers, nodal)
    btp_dpp_graduv: jnp.ndarray   # (4, nodal)
    pbprime_visc: jnp.ndarray     # (nodal)
    dpprime_visc: jnp.ndarray     # (nlayers, nodal)
    dpprime_visc_q: jnp.ndarray   # (nlayers, quad) [method_visc==1 family]
    graduv_dpp_face: Pair         # (5, 2=L/R, nlayers, F, ngl)
    btp_graduv_dpp_face: Pair     # (5, 2, F, ngl)
