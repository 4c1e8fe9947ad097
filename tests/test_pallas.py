"""Fused Pallas barotropic volume kernel vs the XLA path (interpret mode).

The kernel (ops/pallas_btp.py) must reproduce btp_volume_rhs + the
volume/nodal accumulator updates exactly (same operations, same order up to
matmul reassociation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hnumo_tpu.config import Config
from hnumo_tpu.model import Model


def _setup(dtype, botfr):
    cfg = Config(nelx=6, nely=5, nopx=4, nopy=4, xdims=(0.0, 2e6),
                 ydims=(0.0, 2e6), nlayers=2, dt=400.0, dt_btp=20.0,
                 time_final=1e9, test_case="double_gyre", f0=9.3e-5,
                 beta=2e-11, botfr=botfr, cd_mlswe=1e-7,
                 method_visc=2, visc_mlswe=100.0, dtype=dtype)
    return Model(cfg)


@pytest.mark.parametrize("botfr", [0, 1, 2])
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_volume_kernel_parity(dtype, botfr):
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.core.btp import _VOL_ORDER, btp_volume_rhs
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.ops.dg import interp_n2q
    from hnumo_tpu.ops.pallas_btp import (btp_volume_pallas, eflat,
                                          operators_from_tables)

    m = _setup(dtype, botfr)
    static, P, g, bc = m.static, m.P, m.g, m.bc
    s = m.state0
    # perturb the state so the test is not all-zeros
    rng = np.random.default_rng(0)
    qb = s.qb_df + jnp.asarray(
        1e-3 * np.abs(rng.normal(size=s.qb_df.shape)), m.dtype)
    qp = s.qprime_df + jnp.asarray(
        1e-4 * rng.normal(size=s.qprime_df.shape), m.dtype)

    qpf = extract_qprime_faces(bc, qp)
    zq = jnp.zeros_like(interp_n2q(g, qp[0]))
    coup = btp_bcl_coeffs(static, P, g, bc, qp, qpf, qp[0], zq)
    qpl_q = interp_n2q(g, qp[:, -1])

    rhs_ref, vinc_ref = btp_volume_rhs(static, P, g, coup, qb, qpl_q)
    t_df = qb[1] * P.one_over_pbprime_df
    ninc_ref = jnp.stack([t_df * (2.0 + t_df), qb[2] / qb[0], qb[3] / qb[0]])

    ney, nex = g.wjac.shape[:2]
    nq, ngl = g.wjac.shape[-1], g.wjac_df.shape[-1]
    E = ney * nex
    accv0 = jnp.asarray(rng.normal(size=(12, E, nq * nq)), m.dtype)
    accn0 = jnp.asarray(rng.normal(size=(3, E, ngl * ngl)), m.dtype)

    ops = operators_from_tables(g, P)
    coup_flat = jnp.stack([eflat(coup.Q_uu_dp), eflat(coup.Q_uv_dp),
                           eflat(coup.Q_vv_dp), eflat(coup.dH_bcl)])
    rhs, accv, accn = btp_volume_pallas(
        ops, eflat(qb), eflat(qpl_q), coup_flat, accv0, accn0,
        grav=static.gravity, botfr=static.botfr, cd=static.cd_mlswe,
        alpha_bot=static.alpha_bot, interpret=True)

    tol = 1e-12 if dtype == "float64" else 2e-5
    ref = np.asarray(rhs_ref.reshape(3, E, ngl * ngl))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(rhs), ref, atol=tol * scale)
    vref = np.asarray(vinc_ref.reshape(12, E, nq * nq)) + np.asarray(accv0)
    np.testing.assert_allclose(np.asarray(accv), vref,
                               atol=tol * np.abs(vref).max(), rtol=tol * 10)
    nref = np.asarray(ninc_ref.reshape(3, E, ngl * ngl)) + np.asarray(accn0)
    np.testing.assert_allclose(np.asarray(accn), nref,
                               atol=tol * np.abs(nref).max(), rtol=tol * 10)
    assert [f for f in _VOL_ORDER] == list(_VOL_ORDER)  # order contract


def test_full_step_with_pallas_interpret_matches_xla():
    """End-to-end: 2 baroclinic steps with the Pallas volume kernel
    (interpret) match the XLA path."""
    m_x = _setup("float64", 1)
    cfg_p = Config(**{**m_x.cfg.__dict__, "use_pallas": "on"})
    m_p = Model(cfg_p)
    assert m_p.static.use_pallas and m_p.static.pallas_interpret

    s_x = m_x.state0
    s_p = m_p.state0
    for _ in range(2):
        s_x = m_x.step(s_x)
        s_p = m_p.step(s_p)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s_x, name))
        b = np.asarray(getattr(s_p, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(np.abs(a).max(), 1),
                                   err_msg=name)


@pytest.mark.parametrize("case,botfr", [("double_gyre", 1), ("seamount", 0),
                                        ("double_gyre", 2)])
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_volume_kernel_uniform_parity(dtype, case, botfr):
    """The folded-operator uniform-geometry kernel (v2) must match the XLA
    volume RHS + accumulator updates on both flat-bottom (double_gyre) and
    varying-bathymetry (bump) cases."""
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.core.btp import btp_volume_rhs
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.ops.dg import interp_n2q
    from hnumo_tpu.ops.pallas_btp import (btp_volume_pallas_uni, eflat,
                                          operators_uniform)

    cfg = Config(nelx=6, nely=5, nopx=4, nopy=4, xdims=(0.0, 2e6),
                 ydims=(0.0, 2e6), nlayers=2, dt=400.0, dt_btp=20.0,
                 time_final=1e9, test_case=case, f0=9.3e-5,
                 beta=2e-11, botfr=botfr, cd_mlswe=1e-7,
                 method_visc=2, visc_mlswe=100.0, dtype=dtype)
    m = Model(cfg)
    static, P, g, bc = m.static, m.P, m.g, m.bc
    assert static.uniform_geom
    assert static.flat_bottom == (case == "double_gyre")
    s = m.state0
    rng = np.random.default_rng(1)
    qb = s.qb_df + jnp.asarray(
        1e-3 * np.abs(rng.normal(size=s.qb_df.shape)), m.dtype)
    qp = s.qprime_df + jnp.asarray(
        1e-4 * rng.normal(size=s.qprime_df.shape), m.dtype)

    qpf = extract_qprime_faces(bc, qp)
    zq = jnp.zeros_like(interp_n2q(g, qp[0]))
    coup = btp_bcl_coeffs(static, P, g, bc, qp, qpf, qp[0], zq)
    qpl_q = interp_n2q(g, qp[:, -1])

    rhs_ref, vinc_ref = btp_volume_rhs(static, P, g, coup, qb, qpl_q)
    t_df = qb[1] * P.one_over_pbprime_df
    ninc_ref = jnp.stack([t_df * (2.0 + t_df), qb[2] / qb[0], qb[3] / qb[0]])

    ney, nex = g.wjac.shape[:2]
    nq, ngl = g.wjac.shape[-1], g.wjac_df.shape[-1]
    E = ney * nex
    accv0 = jnp.asarray(rng.normal(size=(12, E, nq * nq)), m.dtype)
    accn0 = jnp.asarray(rng.normal(size=(3, E, ngl * ngl)), m.dtype)

    ops = jax.jit(lambda: operators_uniform(g, P, static.flat_bottom))()
    coup_flat = jnp.stack([eflat(coup.Q_uu_dp), eflat(coup.Q_uv_dp),
                           eflat(coup.Q_vv_dp), eflat(coup.dH_bcl)])
    rhs, accv, accn = btp_volume_pallas_uni(
        ops, eflat(qb), eflat(qp[:, -1]), accv0, accn0, coup_flat,
        grav=static.gravity, botfr=static.botfr, cd=static.cd_mlswe,
        alpha_bot=static.alpha_bot, flat_bottom=static.flat_bottom,
        interpret=True)

    tol = 1e-12 if dtype == "float64" else 2e-5
    ref = np.asarray(rhs_ref.reshape(3, E, ngl * ngl))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(rhs), ref, atol=tol * scale)
    vref = np.asarray(vinc_ref.reshape(12, E, nq * nq)) + np.asarray(accv0)
    np.testing.assert_allclose(np.asarray(accv), vref,
                               atol=tol * np.abs(vref).max(), rtol=tol * 10)
    nref = np.asarray(ninc_ref.reshape(3, E, ngl * ngl)) + np.asarray(accn0)
    np.testing.assert_allclose(np.asarray(accn), nref,
                               atol=tol * np.abs(nref).max(), rtol=tol * 10)


def test_pad_elements_prime():
    """Awkward element counts pad instead of degenerating to a tiny tile
    (VERDICT r2 item 7), and the padded full step matches XLA."""
    from hnumo_tpu.ops.pallas_btp import pad_elements

    Ep, T = pad_elements(521)          # prime > 512
    assert Ep % T == 0 and T >= 96 and Ep >= 521
    Ep, T = pad_elements(4096)
    assert (Ep, T) == (4096, 512)
    Ep, T = pad_elements(30)
    assert (Ep, T) == (30, 30)

    cfg = Config(nelx=61, nely=13, nopx=4, nopy=4, xdims=(0.0, 2e6),
                 ydims=(0.0, 4e5), nlayers=2, dt=40.0, dt_btp=20.0,
                 time_final=1e9, test_case="double_gyre", f0=9.3e-5,
                 beta=2e-11, botfr=1, cd_mlswe=1e-7,
                 method_visc=2, visc_mlswe=100.0, dtype="float64")
    m_x = Model(cfg)
    cfg_p = Config(**{**cfg.__dict__, "use_pallas": "on"})
    m_p = Model(cfg_p)
    # 793 elements: largest divisor <= 512 is 61 < 96 -> padded path
    assert pad_elements(61 * 13)[0] > 61 * 13
    s_x = m_x.step(m_x.state0)
    s_p = m_p.step(m_p.state0)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s_x, name))
        b = np.asarray(getattr(s_p, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(np.abs(a).max(), 1),
                                   err_msg=name)


def test_fused_tail_no_visc_bump_parity():
    """Fused face+update tail (ops/pallas_btp_tail) on the inviscid,
    varying-bathymetry bump case: 2 full steps match XLA, and mass is
    conserved to the reference's 1e-12 gate (CI/bump/check.F90:58-62)."""
    cfg = Config(nelx=10, nely=10, nopx=4, nopy=4, xdims=(0.0, 1e6),
                 ydims=(0.0, 1e6), nlayers=2, dt=100.0, dt_btp=1.8,
                 time_final=1e9, test_case="bump", f0=0.0, beta=0.0,
                 botfr=0, cd_mlswe=0.0, method_visc=0, visc_mlswe=0.0,
                 dtype="float64")
    m_x = Model(cfg)
    cfg_p = Config(**{**cfg.__dict__, "use_pallas": "on", "fused_tail": "on"})
    m_p = Model(cfg_p)
    assert m_p.static.fused_tail and not m_p.static.use_visc

    s_x, s_p = m_x.state0, m_p.state0
    wj = np.asarray(m_x.g.wjac_df, np.float64)
    ref = np.asarray(m_x.P.dpp_ref_df, np.float64)
    mass0 = float((wj[None] * (ref + np.asarray(s_p.q_df[0]))).sum())
    for _ in range(2):
        s_x = m_x.step(s_x)
        s_p = m_p.step(s_p)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s_x, name))
        b = np.asarray(getattr(s_p, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(np.abs(a).max(), 1),
                                   err_msg=name)
    mass = float((wj[None] * (ref + np.asarray(s_p.q_df[0]))).sum())
    assert abs(mass - mass0) / mass0 < 1e-12


def test_pallas_volume_sharded_matches_serial():
    """Default production path (Pallas volume kernel + XLA faces) under
    shard_map on the fake 8-device mesh — the configuration `use_pallas=
    "auto"` selects for f32 TPU runs with a device mesh (guards VERDICT r3
    item 2: auto must never select a path that cannot run under the active
    mesh)."""
    from hnumo_tpu.parallel.sharding import make_mesh

    cfg = Config(nelx=8, nely=8, nopx=4, nopy=4, xdims=(0.0, 2e6),
                 ydims=(0.0, 2e6), nlayers=2, dt=400.0, dt_btp=20.0,
                 time_final=1e9, test_case="double_gyre", f0=9.3e-5,
                 beta=2e-11, botfr=1, cd_mlswe=1e-7,
                 method_visc=2, visc_mlswe=100.0, dtype="float64",
                 use_pallas="on")
    m1 = Model(cfg)
    assert m1.static.use_pallas and not m1.static.fused_tail
    mesh = make_mesh(jax.devices(), shape=(2, 4))
    mN = Model(cfg, mesh=mesh)

    s1, sN = m1.state0, mN.state0
    for _ in range(2):
        s1 = m1.step(s1)
        sN = mN.step(sN)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(sN, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(np.abs(a).max(), 1),
                                   err_msg=name)


def test_fused_tail_sharded_matches_serial():
    """Fused tail under shard_map on the fake 8-device mesh: the ppermute
    halo slabs feed the flat-layout trace packing identically."""
    from hnumo_tpu.parallel.sharding import make_mesh

    cfg = Config(nelx=8, nely=8, nopx=4, nopy=4, xdims=(0.0, 2e6),
                 ydims=(0.0, 2e6), nlayers=2, dt=400.0, dt_btp=20.0,
                 time_final=1e9, test_case="double_gyre", f0=9.3e-5,
                 beta=2e-11, botfr=1, cd_mlswe=1e-7,
                 method_visc=2, visc_mlswe=100.0, dtype="float64",
                 use_pallas="on", fused_tail="on")
    m1 = Model(cfg)
    assert m1.static.fused_tail
    mesh = make_mesh(jax.devices(), shape=(2, 4))
    mN = Model(cfg, mesh=mesh)

    s1, sN = m1.state0, mN.state0
    for _ in range(2):
        s1 = m1.step(s1)
        sN = mN.step(sN)
    for name in ("qb_df", "q_df", "qprime_df"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(sN, name))
        np.testing.assert_allclose(b, a, atol=1e-11 * max(np.abs(a).max(), 1),
                                   err_msg=name)
