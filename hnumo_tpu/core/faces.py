"""Face trace extraction, BC mirrors, halo exchange, and face scatter.

TPU-native replacement of the reference's imapl/imapr pointer chasing, face
loops AND MPI face-halo exchange (src/mod_face.F90,
src/create_normals_quad.F90:227-372, src/mod_layer_terms.F90:354-465,
src/mod_barotropic_terms.F90:25-97, src/send_receive_bound.F90,
src/create_rhs_communicator.F90): on a structured element grid every trace
is a static slice and every neighbor trace a shift, so extraction/scatter
compile to pure slicing + adds.

Every function here operates on a LOCAL element block. When `BCs.ax/ay`
carry shard_map axis names, the block is one shard of a 2D device mesh and
neighbor ghost edges arrive via `lax.ppermute` (cyclic) — one thin
element-edge slab per direction, the moral equivalent of the reference's
per-neighbor isend/irecv of packed face values. Domain-boundary closures
(wall mirrors / periodic wrap) are applied only on the shards that own a
domain edge, selected by `lax.axis_index` masks. With ax/ay = None the
"mesh" is a single shard that owns both domain edges and every select
collapses statically to the serial code.

Face index convention (see hnumo_tpu.mesh.grid): a local block of
(ly, lx) elements has (ly, lx+1) x-faces and (ly+1, lx) y-faces; face fx
sits between elements fx-1 | fx. A face shared by two shards is computed
REDUNDANTLY on both (each from the same exchanged traces, so values agree
bitwise and each shard scatters only into its own elements) — the same
both-ranks-compute-the-flux scheme as the reference's halo design.
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
from jax import lax


class BCs(NamedTuple):
    """Static boundary-condition codes (west, east, south, north) plus the
    shard_map mesh axis names for the element-column (ax) and element-row
    (ay) dimensions; None = unsharded serial block."""

    west: int
    east: int
    south: int
    north: int
    ax: str | None = None
    ay: str | None = None

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


def _sel(mask, a, b):
    """Select a where mask else b; mask may be a static bool or traced scalar."""
    if isinstance(mask, bool):
        return a if mask else b
    return jnp.where(mask, a, b)


def _edge_masks(ax):
    """(am-I-the-domain-west/south-shard, am-I-the-domain-east/north-shard)."""
    if ax is None:
        return True, True
    i = lax.axis_index(ax)
    n = lax.psum(1, ax)
    return i == 0, i == n - 1


def _from_prev(ax, slab):
    """Ghost slab from the previous shard along `ax` (cyclic); my west/south
    ghost = previous neighbor's east/north edge slab."""
    if ax is None:
        return slab
    n = lax.psum(1, ax)
    return lax.ppermute(slab, ax, [(i, (i + 1) % n) for i in range(n)])


def _from_next(ax, slab):
    if ax is None:
        return slab
    n = lax.psum(1, ax)
    return lax.ppermute(slab, ax, [(i, (i - 1) % n) for i in range(n)])


def _mirror(uL, vL, code: int, direction: str):
    """Ghost values outside a wall for a vector field (free-slip/no-slip)."""
    if code == 4:  # free-slip: reflect normal component
        return (-uL, vL) if direction == "x" else (uL, -vL)
    if code in (2, 5):  # no-slip: negate the full vector
        return -uL, -vL
    return uL, vL  # 0 / unknown: copy ("do nothing")


def extract_faces(u, bc: BCs, v=None) -> tuple[FaceLR, FaceLR | None]:
    """Nodal (or quad) face traces with halo/BC closure.

    u: (..., ly, lx, m, m) local field. If `v` is given, (u, v) is treated as
    a vector field and wall mirrors are applied per BC code; otherwise scalar
    copy mirrors. Returns FaceLR for u (and for v when given).
    x-traces have shape (..., ly, lx+1, m); y-traces (..., ly+1, lx, m).
    """
    fields = (u,) if v is None else (u, v)
    east = [f[..., :, :, :, -1] for f in fields]     # (..., ly, lx, m)
    west = [f[..., :, :, :, 0] for f in fields]
    north = [f[..., :, :, -1, :] for f in fields]
    south = [f[..., :, :, 0, :] for f in fields]

    # ---- x-direction (face axis extends the lx axis = -2 of the slabs) ----
    ghost_w = [_from_prev(bc.ax, e[..., -1:, :]) for e in east]
    ghost_e = [_from_next(bc.ax, w[..., :1, :]) for w in west]
    if bc.x_periodic:
        xl0 = ghost_w
        xr0 = [w[..., :1, :] for w in west]
        xrL = ghost_e
    else:
        wfirst, elast = _edge_masks(bc.ax)
        w_own = [w[..., :1, :] for w in west]
        e_own = [e[..., -1:, :] for e in east]
        if v is None:
            mir_w, mir_e = [w_own[0]], [e_own[0]]
        else:
            mir_w = list(_mirror(w_own[0], w_own[1], bc.west, "x"))
            mir_e = list(_mirror(e_own[0], e_own[1], bc.east, "x"))
        xl0 = [_sel(wfirst, w_own[i], ghost_w[i]) for i in range(len(fields))]
        xr0 = [_sel(wfirst, mir_w[i], w_own[i]) for i in range(len(fields))]
        xrL = [_sel(elast, mir_e[i], ghost_e[i]) for i in range(len(fields))]
    xl = [jnp.concatenate([xl0[i], east[i]], axis=-2) for i in range(len(fields))]
    xr = [jnp.concatenate([xr0[i], west[i][..., 1:, :], xrL[i]], axis=-2)
          for i in range(len(fields))]

    # ---- y-direction (face axis extends the ly axis = -3 of the slabs) ----
    ghost_s = [_from_prev(bc.ay, n_[..., -1:, :, :]) for n_ in north]
    ghost_n = [_from_next(bc.ay, s[..., :1, :, :]) for s in south]
    if bc.y_periodic:
        yl0 = ghost_s
        yr0 = [s[..., :1, :, :] for s in south]
        yrL = ghost_n
    else:
        sfirst, nlast = _edge_masks(bc.ay)
        s_own = [s[..., :1, :, :] for s in south]
        n_own = [n_[..., -1:, :, :] for n_ in north]
        if v is None:
            mir_s, mir_n = [s_own[0]], [n_own[0]]
        else:
            mir_s = list(_mirror(s_own[0], s_own[1], bc.south, "y"))
            mir_n = list(_mirror(n_own[0], n_own[1], bc.north, "y"))
        yl0 = [_sel(sfirst, s_own[i], ghost_s[i]) for i in range(len(fields))]
        yr0 = [_sel(sfirst, mir_s[i], s_own[i]) for i in range(len(fields))]
        yrL = [_sel(nlast, mir_n[i], ghost_n[i]) for i in range(len(fields))]
    yl = [jnp.concatenate([yl0[i], north[i]], axis=-3) for i in range(len(fields))]
    yr = [jnp.concatenate([yr0[i], south[i][..., 1:, :, :], yrL[i]], axis=-3)
          for i in range(len(fields))]

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


def scatter_face_x(rhs, S, bc: BCs, S_right=None):
    """Accumulate x-face scatter values into element east/west edges.

    rhs: (..., ly, lx, m, m); S: (..., ly, lx+1, m) per-face values.
    Sign convention: L side receives -S, R side +S_right (defaults to S),
    matching reference flux kernels (src/mod_rhs_btp.F90:347-359; the layer
    momentum flux scatters side-specific H values,
    src/mod_create_rhs_mlswe.F90:786-812). At a domain-west wall the interior
    element is the L side of local face 0, so it receives -S there.
    """
    if S_right is None:
        S_right = S
    rhs = rhs.at[..., :, :, :, -1].add(-S[..., :, 1:, :])
    w0 = S_right[..., :, :1, :]
    if not bc.x_periodic:
        wfirst, _ = _edge_masks(bc.ax)
        w0 = _sel(wfirst, -S[..., :, :1, :], w0)
    W = jnp.concatenate([w0, S_right[..., :, 1:-1, :]], axis=-2)
    return rhs.at[..., :, :, :, 0].add(W)


def scatter_face_y(rhs, S, bc: BCs, S_right=None):
    """Accumulate y-face scatter values into element north/south edges."""
    if S_right is None:
        S_right = S
    rhs = rhs.at[..., :, :, -1, :].add(-S[..., 1:, :, :])
    s0 = S_right[..., :1, :, :]
    if not bc.y_periodic:
        sfirst, _ = _edge_masks(bc.ay)
        s0 = _sel(sfirst, -S[..., :1, :, :], s0)
    Sm = jnp.concatenate([s0, S_right[..., 1:-1, :, :]], axis=-3)
    return rhs.at[..., :, :, 0, :].add(Sm)


def apply_wall_projection(qu, qv, bc: BCs):
    """Project nodal momentum at wall nodes (free-slip: zero normal comp;
    no-slip: zero vector). Reference btp_mom_boundary_df / layer_mom_boundary_df
    (src/mod_barotropic_terms.F90:165-217, src/mod_layer_terms.F90:529-584).

    qu, qv: (..., ly, lx, ngl, ngl). Structured-grid form: x-walls zero the
    x-momentum at west/east edge nodes, y-walls the y-momentum; no-slip zeroes
    both. Corner nodes receive both projections, as in the reference loop.
    Only the shards owning a domain edge apply the projection.
    """
    wfirst, elast = _edge_masks(bc.ax)
    sfirst, nlast = _edge_masks(bc.ay)

    def zero_edge_x(f, side, mask):
        if side == "w":
            idx = (Ellipsis, slice(None), 0, slice(None), 0)
        else:
            idx = (Ellipsis, slice(None), -1, slice(None), -1)
        return f.at[idx].set(_sel(mask, jnp.zeros_like(f[idx]), f[idx]))

    def zero_edge_y(f, side, mask):
        if side == "s":
            idx = (Ellipsis, 0, slice(None), 0, slice(None))
        else:
            idx = (Ellipsis, -1, slice(None), -1, slice(None))
        return f.at[idx].set(_sel(mask, jnp.zeros_like(f[idx]), f[idx]))

    for code, side, mask in ((bc.west, "w", wfirst), (bc.east, "e", elast)):
        if code == 4:
            qu = zero_edge_x(qu, side, mask)
        elif code in (2, 5):
            qu = zero_edge_x(qu, side, mask)
            qv = zero_edge_x(qv, side, mask)
    for code, side, mask in ((bc.south, "s", sfirst), (bc.north, "n", nlast)):
        if code == 4:
            qv = zero_edge_y(qv, side, mask)
        elif code in (2, 5):
            qu = zero_edge_y(qu, side, mask)
            qv = zero_edge_y(qv, side, mask)
    return qu, qv


def all_shards_and(ok, bc: BCs):
    """Logical AND of a scalar predicate across all shards (psum of failures)."""
    axes = tuple(a for a in (bc.ax, bc.ay) if a is not None)
    if not axes:
        return ok
    bad = lax.psum(jnp.logical_not(ok).astype(jnp.int32), axes)
    return bad == 0
