"""Whole-solve megakernel (ops/pallas_mega) vs the default path.

Interpret mode (CPU, f64) so parity tolerances are reassociation-level.
The megakernel must reproduce barotropic_solve exactly: final qb AND every
one of the 23 running averages (the baroclinic step consumes them all)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnumo_tpu.config import Config
from hnumo_tpu.model import Model


def _setup(visc, botfr=1, nel=(6, 5), dtype="float64", nop=4, **over):
    kw = dict(method_visc=2, visc_mlswe=100.0) if visc else dict(
        method_visc=0, visc_mlswe=0.0)
    kw.update(over)
    cfg = Config(nelx=nel[0], nely=nel[1], nopx=nop, nopy=nop,
                 xdims=(0.0, 2e6),
                 ydims=(0.0, 2e6), nlayers=2, dt=400.0, dt_btp=20.0,
                 time_final=1e9, test_case="double_gyre", f0=9.3e-5,
                 beta=2e-11, botfr=botfr, cd_mlswe=1e-7, dtype=dtype,
                 use_pallas="on", mega="on", **kw)
    return Model(cfg)


def _perturbed_inputs(m, seed=0):
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.ops.dg import interp_n2q

    rng = np.random.default_rng(seed)
    s = m.state0
    qb = s.qb_df + jnp.asarray(
        1e-3 * np.abs(rng.normal(size=s.qb_df.shape)), m.dtype)
    qp = s.qprime_df + jnp.asarray(
        1e-4 * rng.normal(size=s.qprime_df.shape), m.dtype)
    qpf = extract_qprime_faces(m.bc, qp)
    zq = jnp.zeros_like(interp_n2q(m.g, qp[0]))
    coup = btp_bcl_coeffs(m.static, m.P, m.g, m.bc, qp, qpf, qp[0], zq)
    return qb, qp, coup


def _flatten_avg(avg):
    out = {}
    for name, v in zip(avg._fields, avg):
        if name == "faces":
            for d, fa in zip(("x", "y"), v):
                for fn, fv in zip(fa._fields, fa):
                    out[f"faces.{d}.{fn}"] = np.asarray(fv, np.float64)
        else:
            out[name] = np.asarray(v, np.float64)
    return out


@pytest.mark.parametrize("visc,botfr,kstages,nop", [
    (False, 1, 5, 4),
    (True, 1, 5, 4),
    (True, 2, 5, 4),     # quadratic bottom drag branch
    (False, 0, 3, 4),    # no drag + SSP(3,3) tables (no qb2 snapshot)
    (True, 1, 5, 6),     # higher order inside the nop<=7 lane-block gate
])
def test_mega_solve_parity(visc, botfr, kstages, nop):
    import dataclasses

    from hnumo_tpu.core.btp import barotropic_solve
    from hnumo_tpu.ops.pallas_mega import (barotropic_solve_mega,
                                           build_mega_static)

    m = _setup(visc, botfr=botfr, kstages=kstages, nop=nop)
    assert m.static.mega, "mega gate should be on for this config"
    qb, qp, coup = _perturbed_inputs(m)

    st_ref = dataclasses.replace(m.static, mega_on=False, use_pallas=False)
    qb_ref, avg_ref = jax.jit(
        lambda qb_, qp_: barotropic_solve(st_ref, m.P, m.g, m.bc, coup,
                                          qb_, qp_))(qb, qp)

    mops = build_mega_static(m.static, m.g, m.P, m.bc)
    qb_meg, avg_meg = jax.jit(
        lambda qb_, qp_: barotropic_solve_mega(
            m.static, m.P, m.g, m.bc, coup, qb_, qp_, mops,
            interpret=True))(qb, qp)

    np.testing.assert_allclose(np.asarray(qb_meg), np.asarray(qb_ref),
                               rtol=1e-11, atol=1e-11, err_msg="qb")
    ref = _flatten_avg(avg_ref)
    meg = _flatten_avg(avg_meg)
    for name in ref:
        scale = np.abs(ref[name]).max() + 1e-30
        np.testing.assert_allclose(
            meg[name] / scale, ref[name] / scale, rtol=0, atol=1e-11,
            err_msg=f"average {name}")


def test_mega_full_steps():
    """Two full baroclinic steps, megakernel vs default path."""
    m = _setup(True)
    m_ref = Model(Config(**{**m.cfg.__dict__, "mega": "off",
                            "use_pallas": "off"}))
    s, s_ref = m.state0, m_ref.state0
    for _ in range(2):
        s = m.step(s)
        s_ref = m_ref.step(s_ref)
    assert bool(s.ok)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s, name), np.float64)
        b = np.asarray(getattr(s_ref, name), np.float64)
        scale = np.abs(b).max() + 1e-30
        assert np.abs(a - b).max() / scale < 1e-10, name
