"""Ablation timing of the barotropic stage on the real model.

Builds scan variants of the barotropic sub-cycling with components disabled
to attribute per-stage time: volume kernel | face fluxes | viscosity |
accumulator adds. Usage: python tools/ablate_btp.py [--nel 128]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=128)
    p.add_argument("--variants", default="vol,faces,faceacc,visc")
    args = p.parse_args()

    from hnumo_tpu.config import Config
    from hnumo_tpu.core import btp as B
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.core.faces import apply_wall_projection
    from hnumo_tpu.model import Model
    from hnumo_tpu.ops.dg import interp_n2q

    nel = args.nel
    scale = 25.0 / nel
    # n_btp=5 (vs the production 20) to cut compile/run cost; per-stage
    # normalization is unaffected (25 stages still amortize scan overhead)
    cfg = Config(nelx=nel, nely=nel, nopx=4, nopy=4,
                 xdims=(0.0, 2e6), ydims=(0.0, 2e6), nlayers=2,
                 dt=125.0 * scale, dt_btp=25.0 * scale, time_final=1e9,
                 test_case="double_gyre", f0=9.3e-5, beta=2e-11,
                 botfr=1, cd_mlswe=1e-7, method_visc=2, visc_mlswe=100.0,
                 dtype="float32")
    m = Model(cfg)
    static, P, g, bc = m.static, m.P, m.g, m.bc
    s = m.state0
    qb, qp = s.qb_df, s.qprime_df
    qpf = extract_qprime_faces(bc, qp)
    zq = jnp.zeros_like(interp_n2q(g, qp[0]))
    coup = jax.jit(lambda qp, qpf: btp_bcl_coeffs(
        static, P, g, bc, qp, qpf, qp[0], zq))(qp, qpf)
    nstage = static.n_btp * static.kstages

    def make_variant(do_faces, do_visc, do_face_acc):
        st = dataclasses.replace(
            static, visc_mlswe=static.visc_mlswe if do_visc else 0.0)

        def solve(qb_df, qprime_df):
            dtype = qb_df.dtype
            ney, nex = g.wjac.shape[0], g.wjac.shape[1]
            nq, ngl = g.wjac.shape[-1], g.wjac_df.shape[-1]
            accv0 = jnp.zeros((12, ney, nex, nq, nq), dtype)
            accn0 = jnp.zeros((3, ney, nex, ngl, ngl), dtype)
            afx0 = jnp.zeros((16, ney, nex + 1, nq), dtype)
            afy0 = jnp.zeros((16, ney + 1, nex, nq), dtype)
            a_ = P.ssprk_a
            beta = P.ssprk_beta

            qpl_q = interp_n2q(g, qprime_df[:, -1])
            from hnumo_tpu.ops.pallas_btp import (btp_volume_pallas, eflat,
                                                  operators_from_tables)
            ops = operators_from_tables(g, P)
            qplq_flat = eflat(qpl_q)
            coup_flat = jnp.stack([eflat(coup.Q_uu_dp), eflat(coup.Q_uv_dp),
                                   eflat(coup.Q_vv_dp), eflat(coup.dH_bcl)])

            def one_step(carry, _):
                qb0_, qb2, accv, accn, afx, afy = carry
                qb1 = qb0_
                for ik in range(static.kstages):
                    rhs_f, accv_f, accn_f = btp_volume_pallas(
                        ops, eflat(qb1), qplq_flat, coup_flat,
                        accv.reshape(12, ney * nex, nq * nq),
                        accn.reshape(3, ney * nex, ngl * ngl),
                        grav=st.gravity, botfr=st.botfr, cd=st.cd_mlswe,
                        alpha_bot=st.alpha_bot, interpret=False)
                    rhs = rhs_f.reshape(3, ney, nex, ngl, ngl)
                    accv = accv_f.reshape(12, ney, nex, nq, nq)
                    accn = accn_f.reshape(3, ney, nex, ngl, ngl)
                    if do_faces:
                        rhs, inc_x, inc_y, _, _ = B._btp_faces_visc(
                            st, P, g, bc, coup, qb1, qprime_df, rhs)
                        if do_face_acc:
                            afx = afx + inc_x
                            afy = afy + inc_y
                    else:
                        rhs = g.massinv * rhs
                    dtt = st.dt_btp * beta[ik]
                    new234 = (a_[ik, 0] * qb0_[1:4] + a_[ik, 1] * qb1[1:4]
                              + a_[ik, 2] * qb2[1:4] + dtt * rhs)
                    pb = new234[0] + P.pbprime_df
                    qu, qv = apply_wall_projection(new234[1], new234[2], bc)
                    qb1 = jnp.stack([pb, new234[0], qu, qv])
                    if static.kstages == 5 and ik == 1:
                        qb2 = qb1
                return (qb1, qb2, accv, accn, afx, afy), None

            (qbf, _, accv, accn, afx, afy), _ = jax.lax.scan(
                one_step, (qb_df, jnp.zeros_like(qb_df), accv0, accn0,
                           afx0, afy0), None, length=static.n_btp)
            return qbf, accv, afx

        return jax.jit(solve)

    specs = {"vol": (False, False, False), "faces": (True, False, False),
             "faceacc": (True, False, True), "visc": (True, True, True)}
    names = {"vol": "volume+SSPRK only", "faces": "+ face fluxes (no acc/visc)",
             "faceacc": "+ face accumulators", "visc": "+ viscosity (nodal LDG)"}
    print(f"grid {nel}x{nel}  ({nstage} stages/solve)  us/stage:", flush=True)
    for key in args.variants.split(","):
        t = timeit(make_variant(*specs[key]), qb, qp)
        print(f"  {names[key]:<32s}: {t/nstage*1e3:8.1f}", flush=True)


if __name__ == "__main__":
    main()
