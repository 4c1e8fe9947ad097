"""Snapshot writers (txt / NetCDF) and restart readers.

Reference: src/diagnostics.F90 (txt snapshot mlswe{NNNN}),
src/diagnostics_nc.F90 (NetCDF snapshot with vars dt, dt_btp, x, y, pb,
pbub, pbvb, h, u, v, eta, zbot), src/mod_restart.F90:15-87 (state
reconstruction from a snapshot). NetCDF via scipy.io.netcdf_file
(NetCDF-3; readable by the reference's tooling).

Node ordering in flat files: element-major DG concatenation — the same
rank-invariant ordering the reference produces by gatherv of contiguous
rank blocks (src/gather_data.F90:52-60).
"""
from __future__ import annotations

import numpy as np

from ..parallel.sharding import to_host

from .diagnostics import derived_fields


def _flat(a):
    """(ney, nex, m, m) -> (npoin,) in element-major order (j fastest inside
    element, matching intma_dg i-fastest: node (e, j, i) -> index)."""
    return np.asarray(a).reshape(a.shape[:-4] + (-1,)) if a.ndim > 4 else np.asarray(a).ravel()


def snapshot_arrays(model, state):
    """Build the reference's snapshot variable set as flat arrays."""
    q5 = derived_fields(model, state)          # (5, L, ney, nex, ngl, ngl)
    qb = to_host(state.qb_df)
    coord = np.asarray(model.geom.coord)       # (ney, nex, ngl, ngl, 2)
    L = q5.shape[1]
    npoin = coord[..., 0].size
    out = {
        "x": coord[..., 0].ravel(), "y": coord[..., 1].ravel(),
        "pb": qb[0].ravel(), "pbub": qb[2].ravel(), "pbvb": qb[3].ravel(),
        "h": q5[0].reshape(L, npoin), "u": q5[1].reshape(L, npoin),
        "v": q5[2].reshape(L, npoin), "eta": q5[4].reshape(L, npoin),
        "zbot": to_host(model.P.zbot_df).ravel(),
        "dt": model.static.dt, "dt_btp": model.static.dt_btp,
        "nlayers": L, "npoin": npoin, "time": float(state.t),
    }
    return out


def _fname(root, itime, ext=""):
    return f"{root}{itime:04d}{ext}"


def write_txt(model, state, itime, root="mlswe", outdir="."):
    """ASCII snapshot in the reference's column order
    (src/diagnostics.F90:77-89)."""
    import os

    a = snapshot_arrays(model, state)
    path = os.path.join(outdir, _fname(root, itime))
    with open(path, "w") as f:
        f.write(f"{a['nlayers']:4d}\n")
        f.write(f"{a['npoin']:10d}\n")
        for v in (a["dt"], a["dt_btp"]):
            f.write(f"{v:23.16e}\n")
        coords = np.stack([a["x"], a["y"]])           # written interleaved (2, npoin) F-order
        for v in coords.T.ravel():
            f.write(f"{v:23.16e}\n")
        for name in ("pb", "pbub", "pbvb"):
            for v in a[name]:
                f.write(f"{v:23.16e}\n")
        for name in ("h", "u", "v", "eta"):
            for v in a[name].ravel():                 # layer-major (k slowest)
                f.write(f"{v:23.16e}\n")
        for v in a["zbot"]:
            f.write(f"{v:23.16e}\n")
    return path


def read_txt(path):
    """Read a write_txt snapshot back into a dict of arrays."""
    with open(path) as f:
        vals = f.read().split()
    nlayers = int(vals[0]); npoin = int(vals[1])
    data = np.array([float(x) for x in vals[2:]])
    dt, dt_btp = data[0], data[1]
    i = 2
    coords = data[i:i + 2 * npoin].reshape(npoin, 2); i += 2 * npoin
    out = dict(nlayers=nlayers, npoin=npoin, dt=dt, dt_btp=dt_btp,
               x=coords[:, 0], y=coords[:, 1])
    for name in ("pb", "pbub", "pbvb"):
        out[name] = data[i:i + npoin]; i += npoin
    for name in ("h", "u", "v", "eta"):
        out[name] = data[i:i + nlayers * npoin].reshape(nlayers, npoin); i += nlayers * npoin
    out["zbot"] = data[i:i + npoin]
    return out


def write_nc(model, state, itime, root="mlswe", outdir="."):
    """NetCDF-3 snapshot with the reference's dims/vars
    (src/diagnostics_nc.F90:27-47,101-143)."""
    import os

    from scipy.io import netcdf_file

    a = snapshot_arrays(model, state)
    path = os.path.join(outdir, _fname(root, itime, ".nc"))
    with netcdf_file(path, "w") as nc:
        nc.createDimension("time", None)
        nc.createDimension("npoin", a["npoin"])
        nc.createDimension("nlayers", a["nlayers"])
        nc.createDimension("zi", a["nlayers"] + 1)
        nc.createDimension("one", 1)
        for name in ("dt", "dt_btp"):
            v = nc.createVariable(name, "d", ("one",))
            v[0] = a[name]
        for name in ("x", "y", "pb", "pbub", "pbvb", "zbot"):
            v = nc.createVariable(name, "d", ("npoin",))
            v[:] = a[name]
        for name in ("h", "u", "v", "eta"):
            v = nc.createVariable(name, "d", ("nlayers", "npoin"))
            v[:] = a[name]
        v = nc.createVariable("time", "d", ("one",))
        v[0] = a["time"]
    return path


def read_nc(path):
    from scipy.io import netcdf_file

    out = {}
    with netcdf_file(path, "r") as nc:
        for name in ("dt", "dt_btp", "time"):
            if name in nc.variables:
                out[name] = float(np.asarray(nc.variables[name][:])[0])
        for name in ("x", "y", "pb", "pbub", "pbvb", "zbot", "h", "u", "v", "eta"):
            out[name] = np.array(nc.variables[name][:])
    out["nlayers"] = out["h"].shape[0]
    out["npoin"] = out["h"].shape[1]
    return out


def restore_state(model, snap, t=None):
    """Reconstruct the prognostic State from snapshot fields, exactly as the
    reference restart (src/mod_restart.F90:39-65):
      qb = (pb, pb - pbprime, pbub, pbvb)
      dp_k = (g/alpha_k) h_k ; (u dp, v dp) from u,v
      dp'_k = dp_k / (sum dp / pbprime) ; u'_k = u_k - pbub/pb ; etc.
    """
    import jax.numpy as jnp

    from ..core.types import State

    shp = np.asarray(model.P.pbprime_df).shape           # (ney, nex, ngl, ngl)
    L = snap["nlayers"]
    alpha = np.asarray(model.P.alpha)
    grav = model.static.gravity
    pbprime_df = np.asarray(model.P.pbprime_df)

    pb = snap["pb"].reshape(shp)
    pbub = snap["pbub"].reshape(shp)
    pbvb = snap["pbvb"].reshape(shp)
    qb = np.stack([pb, pb - pbprime_df, pbub, pbvb])

    h = snap["h"].reshape((L,) + shp)
    u = snap["u"].reshape((L,) + shp)
    v = snap["v"].reshape((L,) + shp)
    dp = grav / alpha[:, None, None, None, None] * h
    dpp_ref = np.asarray(model.P.dpp_ref_df, np.float64)
    # thickness channels are stored as perturbations (core.types.State)
    q = np.stack([dp - dpp_ref, u * dp, v * dp])

    one_plus_eta = dp.sum(0) / pbprime_df
    qprime = np.stack([dp / one_plus_eta[None] - dpp_ref,
                       u - (pbub / pb)[None],
                       v - (pbvb / pb)[None]])

    dtype = model.dtype
    t_val = snap.get("time", 0.0) if t is None else t
    state = State(qb_df=jnp.asarray(qb, dtype), q_df=jnp.asarray(q, dtype),
                  qprime_df=jnp.asarray(qprime, dtype),
                  t=jnp.asarray(t_val, dtype), ok=jnp.asarray(True))
    if model.mesh is not None:
        import jax

        state = jax.device_put(state, model._shardings)
    return state


# ---------------------------------------------------------------------------
# native checkpoint (exact-resume): full prognostic pytree, no derivation
# ---------------------------------------------------------------------------

def save_checkpoint(path, state, itime):
    """Exact binary checkpoint of the prognostic pytree (npz). Unlike the
    reference (whose checkpoints ARE the derived-field snapshots), this
    round-trips bit-exactly."""
    np.savez_compressed(
        path, qb_df=to_host(state.qb_df), q_df=to_host(state.q_df),
        qprime_df=to_host(state.qprime_df), t=np.asarray(state.t),
        ok=np.asarray(state.ok), itime=itime)


def load_checkpoint(path, model):
    import jax
    import jax.numpy as jnp

    from ..core.types import State

    z = np.load(path)
    state = State(qb_df=jnp.asarray(z["qb_df"]), q_df=jnp.asarray(z["q_df"]),
                  qprime_df=jnp.asarray(z["qprime_df"]),
                  t=jnp.asarray(z["t"][()]), ok=jnp.asarray(bool(z["ok"][()])))
    if model.mesh is not None:
        state = jax.device_put(state, model._shardings)
    return state, int(z["itime"][()])
