"""Per-component timing of the REAL barotropic stage (current model path).

Times, via lax.scan over many iterations of the actual jitted closures:
  - volume: the fused Pallas volume kernel (or XLA volume path) alone
  - faces:  _btp_faces_visc (face fluxes + viscosity + massinv) alone
  - update: SSPRK combine + wall projection + face-accumulator adds
  - solve:  the full barotropic_solve
  - step:   the full model step
All on the current default device. Usage:
  python tools/stage_probe.py --nel 64 [--cpu] [--pallas off]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(f, *a, n=5, **k):
    import jax
    r = f(*a, **k)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a, **k)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hnumo_tpu import compile_cache
    compile_cache.enable()
    from hnumo_tpu.config import Config
    from hnumo_tpu.core import btp
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.model import Model

    nel = args.nel
    scale = 25.0 / nel
    cfg = Config(
        nelx=nel, nely=nel, nopx=4, nopy=4,
        xdims=(0.0, 2.0e6), ydims=(0.0, 2.0e6), nlayers=2,
        dt=500.0 * scale, dt_btp=25.0 * scale, time_final=1e9,
        test_case="double_gyre", f0=9.3e-5, beta=2.0e-11,
        botfr=1, cd_mlswe=1.0e-7, method_visc=2, visc_mlswe=100.0,
        dtype="float32", use_pallas=args.pallas)
    m = Model(cfg)
    static, P, g, bc = m.static, m.P, m.g, m.bc
    s = m.step(m.state0)
    jax.block_until_ready(s)
    N = args.iters

    qb_df, qprime_df = s.qb_df, s.qprime_df
    qprime_faces = extract_qprime_faces(bc, qprime_df)
    zq = jnp.zeros_like(jnp.einsum("lyxab->lyxab", qprime_df[0]) * 0)[0]

    from hnumo_tpu.ops.dg import interp_n2q
    zqq = jnp.zeros_like(interp_n2q(g, qprime_df[0]))
    dpprime_visc = qprime_df[0]
    coup = jax.jit(lambda qp, qf, dv: btp_bcl_coeffs(
        static, P, g, bc, qp, qf, dv, zqq))(qprime_df, qprime_faces, dpprime_visc)

    # ---- full solve (operator tables prebuilt, as Model does) ----
    import functools
    vol_ops = jax.jit(functools.partial(btp.build_vol_operators, static))(g, P)
    solve = jax.jit(lambda qb, qp, vo: btp.barotropic_solve(
        static, P, g, bc, coup, qb, qp, vol_ops=vo))
    t_solve = timeit(solve, qb_df, qprime_df, vol_ops)
    print(f"barotropic_solve ({static.n_btp}x{static.kstages} stages): "
          f"{t_solve*1e3:8.2f} ms  -> {t_solve/ (static.n_btp*static.kstages) *1e6:7.1f} us/stage")

    # ---- faces+visc alone, scanned ----
    def faces_scan(qb, qp):
        rhs0 = jnp.zeros((3,) + qb.shape[1:], qb.dtype)

        def body(carry, _):
            rhs, a, b, c, d = btp.btp_faces_visc_probe(static, P, g, bc, coup, qb, qp, rhs0) \
                if hasattr(btp, "btp_faces_visc_probe") else \
                btp._btp_faces_visc(static, P, g, bc, coup, qb, qp, rhs0)
            return carry + rhs[0, 0, 0, 0, 0], None

        out, _ = jax.lax.scan(body, 0.0, None, length=N)
        return out
    t_faces = timeit(jax.jit(faces_scan), qb_df, qprime_df)
    print(f"faces+visc x{N}: {t_faces*1e3:8.2f} ms -> {t_faces/N*1e6:7.1f} us/stage")

    # ---- volume alone, scanned (same layout plumbing as the solve) ----
    def vol_scan(qb, qp):
        ney, nex = g.wjac.shape[0], g.wjac.shape[1]
        nq, ngl = g.wjac.shape[-1], g.wjac_df.shape[-1]
        E = ney * nex
        qpl_q = interp_n2q(g, qp[:, -1])
        if static.use_pallas:
            from hnumo_tpu.ops import pallas_btp as pb
            Ep, _ = pb.pad_elements(E, npts=ngl * ngl, nqq=nq * nq)
            accv = jnp.zeros((12, Ep, nq * nq), qb.dtype)
            accn = jnp.zeros((3, Ep, ngl * ngl), qb.dtype)
            coup_flat = pb.pad_e(jnp.stack([
                pb.eflat(coup.Q_uu_dp), pb.eflat(coup.Q_uv_dp),
                pb.eflat(coup.Q_vv_dp), pb.eflat(coup.dH_bcl)]), Ep)
            if static.uni_volume:
                ops = pb.operators_uniform(g, P, static.flat_bottom)
                ops = ops._replace(ptab=pb.pad_e(ops.ptab, Ep),
                                   pbp_df=pb.pad_e(ops.pbp_df, Ep, axis=0))
                qpln = pb.pad_e(pb.eflat(qp[:, -1]), Ep)

                def body(carry, _):
                    accv, accn = carry
                    qbf = pb.pad_e(pb.eflat(qb), Ep)
                    rhs, accv, accn = pb.btp_volume_pallas_uni(
                        ops, qbf, qpln, accv, accn, coup_flat,
                        grav=static.gravity, botfr=static.botfr,
                        cd=static.cd_mlswe, alpha_bot=static.alpha_bot,
                        flat_bottom=static.flat_bottom,
                        interpret=static.pallas_interpret)
                    rhs = rhs[:, :E].reshape(3, ney, nex, ngl, ngl)
                    accn = accn + rhs.sum() * 0
                    return (accv, accn), None
            else:
                ops = vol_ops
                qplq = pb.pad_e(pb.eflat(qpl_q), Ep)

                def body(carry, _):
                    accv, accn = carry
                    qbf = pb.pad_e(pb.eflat(qb), Ep)
                    rhs, accv, accn = pb.btp_volume_pallas(
                        ops, qbf, qplq, coup_flat, accv, accn,
                        grav=static.gravity, botfr=static.botfr,
                        cd=static.cd_mlswe, alpha_bot=static.alpha_bot,
                        interpret=static.pallas_interpret)
                    rhs = rhs[:, :E].reshape(3, ney, nex, ngl, ngl)
                    accn = accn + rhs.sum() * 0
                    return (accv, accn), None
            (accv, accn), _ = jax.lax.scan(body, (accv, accn), None, length=N)
            return accv[0, 0, 0] + accn[0, 0, 0]
        else:
            accv = jnp.zeros((12, ney, nex, nq, nq), qb.dtype)

            def body(accv, _):
                rhs, inc = btp.btp_volume_rhs(static, P, g, coup, qb, qpl_q)
                return accv + inc + rhs.sum() * 0, None
            accv, _ = jax.lax.scan(body, accv, None, length=N)
            return accv[0, 0, 0]
    t_vol = timeit(jax.jit(vol_scan), qb_df, qprime_df)
    print(f"volume(+acc) x{N}: {t_vol*1e3:8.2f} ms -> {t_vol/N*1e6:7.1f} us/stage")

    # ---- full model step (reassign: step donates its input buffer) ----
    s = m.step(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(3):
        s = m.step(s)
    jax.block_until_ready(s)
    t_step = (time.perf_counter() - t0) / 3
    print(f"model step: {t_step*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
