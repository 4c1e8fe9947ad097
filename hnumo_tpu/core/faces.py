"""Face trace extraction, BC mirrors, and face scatter for the structured mesh.

TPU-native replacement of the reference's imapl/imapr pointer chasing and
face loops (src/mod_face.F90, src/create_normals_quad.F90:227-372,
src/mod_layer_terms.F90:354-465, src/mod_barotropic_terms.F90:25-97):
on a structured element grid every trace is a static slice and every
neighbor trace a shift, so extraction/scatter compile to pure slicing +
adds (and, under shard_map, the shifts become ppermute halo exchanges).

Face index convention (see hnumo_tpu.mesh.grid):
  x-faces: (..., nely, nelx+1, n) with face fx between elements fx-1 | fx.
  y-faces: (..., nely+1, nelx, n) with face fy between elements fy-1 | fy.
Interior faces use the canonical orientation L=west/south element, normal
+x/+y. Boundary faces follow the reference convention: L = the interior
element, normal outward from the domain (west/south boundary normal is
-x/-y). Mass-conservation telescoping is exact by construction.

BC codes (reference face(8) = -code, src/p4est.c:1669;
src/mod_barotropic_terms.F90:79-92): 3=periodic, 4=free-slip (reflect
normal component), 2=no-slip (negate vector); 0=copy. Input code 5 is
documented as no-slip in the reference inputs and treated as no-slip here
(the reference's er==-2 test makes a literal 5 behave as copy — a latent
upstream inconsistency; no shipped case uses it).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BCs(NamedTuple):
    """Static boundary-condition codes (west, east, south, north)."""

    west: int
    east: int
    south: int
    north: int

    @property
    def x_periodic(self) -> bool:
        return self.west == 3

    @property
    def y_periodic(self) -> bool:
        return self.south == 3


class FacePair(NamedTuple):
    """A per-direction pair of face arrays."""

    x: jnp.ndarray
    y: jnp.ndarray


class FaceLR(NamedTuple):
    """Left/right traces per direction."""

    xl: jnp.ndarray
    xr: jnp.ndarray
    yl: jnp.ndarray
    yr: jnp.ndarray


def _mirror(uL, vL, code: int, direction: str):
    """Ghost values outside a wall for a vector field (free-slip/no-slip)."""
    if code == 4:  # free-slip: reflect normal component
        return (-uL, vL) if direction == "x" else (uL, -vL)
    if code in (2, 5):  # no-slip: negate the full vector
        return -uL, -vL
    return uL, vL  # 0 / unknown: copy ("do nothing")


def extract_faces(u, bc: BCs, v=None) -> tuple[FaceLR, FaceLR | None]:
    """Nodal (or quad) face traces with halo/BC closure.

    u: (..., nely, nelx, m, m) field. If `v` is given, (u, v) is treated as a
    vector field and wall mirrors are applied per BC code; otherwise scalar
    copy mirrors. Returns FaceLR for u (and for v when given).
    x-traces have shape (..., nely, nelx+1, m); y-traces (..., nely+1, nelx, m).
    """
    fields = (u,) if v is None else (u, v)
    east = [f[..., :, :, :, -1] for f in fields]
    west = [f[..., :, :, :, 0] for f in fields]
    north = [f[..., :, :, -1, :] for f in fields]
    south = [f[..., :, :, 0, :] for f in fields]

    # ---- x-direction ----
    if bc.x_periodic:
        xl = [jnp.concatenate([e[..., -1:, :], e], axis=-2) for e in east]
        xr = [jnp.concatenate([w, w[..., :1, :]], axis=-2) for w in west]
    else:
        xl = [jnp.concatenate([w[..., :1, :], e], axis=-2) for w, e in zip(west, east)]
        if v is None:
            gw = [w[..., :1, :] for w in west]
            ge = [e[..., -1:, :] for e in east]
        else:
            gw = list(_mirror(west[0][..., :1, :], west[1][..., :1, :], bc.west, "x"))
            ge = list(_mirror(east[0][..., -1:, :], east[1][..., -1:, :], bc.east, "x"))
        xr = [
            jnp.concatenate([gw[i], west[i][..., 1:, :], ge[i]], axis=-2)
            for i in range(len(fields))
        ]

    # ---- y-direction ---- (traces have shape (..., nely, nelx, m); the face
    # index extends the nely axis, i.e. axis -3)
    if bc.y_periodic:
        yl = [jnp.concatenate([n[..., -1:, :, :], n], axis=-3) for n in north]
        yr = [jnp.concatenate([s, s[..., :1, :, :]], axis=-3) for s in south]
    else:
        yl = [jnp.concatenate([s[..., :1, :, :], n], axis=-3) for s, n in zip(south, north)]
        if v is None:
            gs = [s[..., :1, :, :] for s in south]
            gn = [n[..., -1:, :, :] for n in north]
        else:
            gs = list(_mirror(south[0][..., :1, :, :], south[1][..., :1, :, :], bc.south, "y"))
            gn = list(_mirror(north[0][..., -1:, :, :], north[1][..., -1:, :, :], bc.north, "y"))
        yr = [
            jnp.concatenate([gs[i], south[i][..., 1:, :, :], gn[i]], axis=-3)
            for i in range(len(fields))
        ]

    outs = [FaceLR(xl=xl[i], xr=xr[i], yl=yl[i], yr=yr[i]) for i in range(len(fields))]
    if v is None:
        return outs[0], None
    return outs[0], outs[1]


def face_n2q(psiq, f):
    """Interpolate face-nodal traces (..., ngl) to face quad points (..., nq)."""
    return jnp.einsum("...n,nq->...q", f, psiq)


def face_quad_scatter(psiq, jac_face, flux):
    """Per-face nodal scatter values S_n = sum_q jac_face_q * psi_n(q) * flux_q.

    flux: (..., nfaces..., nq); jac_face broadcastable to it. Returns (..., ngl).
    Matches the face Gauss-Lobatto integration of reference flux kernels
    (src/mod_rhs_btp.F90:320-363).
    """
    return jnp.einsum("...q,nq->...n", jac_face * flux, psiq)


def scatter_face_x(rhs, S, x_periodic: bool, S_right=None):
    """Accumulate x-face scatter values into element east/west edges.

    rhs: (..., nely, nelx, m, m); S: (..., nely, nelx+1, m) per-face values.
    Sign convention: L side receives -S, R side +S_right (defaults to S),
    matching reference flux kernels (src/mod_rhs_btp.F90:347-359; the layer
    momentum flux scatters side-specific H values,
    src/mod_create_rhs_mlswe.F90:786-812).
    """
    if S_right is None:
        S_right = S
    rhs = rhs.at[..., :, :, :, -1].add(-S[..., :, 1:, :])
    if x_periodic:
        rhs = rhs.at[..., :, :, :, 0].add(S_right[..., :, :-1, :])
    else:
        rhs = rhs.at[..., :, 1:, :, 0].add(S_right[..., :, 1:-1, :])
        # west wall: the interior element is the L side of face 0
        rhs = rhs.at[..., :, 0, :, 0].add(-S[..., :, 0, :])
    return rhs


def scatter_face_y(rhs, S, y_periodic: bool, S_right=None):
    """Accumulate y-face scatter values into element north/south edges."""
    if S_right is None:
        S_right = S
    rhs = rhs.at[..., :, :, -1, :].add(-S[..., 1:, :, :])
    if y_periodic:
        rhs = rhs.at[..., :, :, 0, :].add(S_right[..., :-1, :, :])
    else:
        rhs = rhs.at[..., 1:, :, 0, :].add(S_right[..., 1:-1, :, :])
        rhs = rhs.at[..., 0, :, 0, :].add(-S[..., 0, :, :])
    return rhs


def apply_wall_projection(qu, qv, bc: BCs):
    """Project nodal momentum at wall nodes (free-slip: zero normal comp;
    no-slip: zero vector). Reference btp_mom_boundary_df / layer_mom_boundary_df
    (src/mod_barotropic_terms.F90:165-217, src/mod_layer_terms.F90:529-584).

    qu, qv: (..., nely, nelx, ngl, ngl). Structured-grid form: x-walls zero the
    x-momentum at west/east edge nodes, y-walls the y-momentum; no-slip zeroes
    both. Corner nodes receive both projections, as in the reference loop.
    """
    def zero_edge_x(f, side):  # west/east element column edge nodes
        if side == "w":
            return f.at[..., :, 0, :, 0].set(0.0)
        return f.at[..., :, -1, :, -1].set(0.0)

    def zero_edge_y(f, side):
        if side == "s":
            return f.at[..., 0, :, 0, :].set(0.0)
        return f.at[..., -1, :, -1, :].set(0.0)

    for code, side in ((bc.west, "w"), (bc.east, "e")):
        if code == 4:
            qu = zero_edge_x(qu, side)
        elif code in (2, 5):
            qu = zero_edge_x(qu, side)
            qv = zero_edge_x(qv, side)
    for code, side in ((bc.south, "s"), (bc.north, "n")):
        if code == 4:
            qv = zero_edge_y(qv, side)
        elif code in (2, 5):
            qu = zero_edge_y(qu, side)
            qv = zero_edge_y(qv, side)
    return qu, qv
