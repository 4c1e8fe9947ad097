"""Microbenchmark the barotropic stage components on the current device.

Usage: python tools/profile_btp.py [--nel 64] [--f64]
"""
import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=64)
    p.add_argument("--f64", action="store_true")
    args = p.parse_args()

    from hnumo_tpu.config import Config
    from hnumo_tpu.core.btp import (barotropic_solve, btp_volume_rhs,
                                    create_rhs_btp)
    from hnumo_tpu.core.coupling import btp_bcl_coeffs
    from hnumo_tpu.core.bcl import extract_qprime_faces
    from hnumo_tpu.model import Model
    from hnumo_tpu.ops.dg import interp_n2q

    nel = args.nel
    scale = 25.0 / nel
    cfg = Config(nelx=nel, nely=nel, nopx=4, nopy=4,
                 xdims=(0.0, 2e6), ydims=(0.0, 2e6), nlayers=2,
                 dt=500.0 * scale, dt_btp=25.0 * scale, time_final=1e9,
                 test_case="double_gyre", f0=9.3e-5, beta=2e-11,
                 botfr=1, cd_mlswe=1e-7, method_visc=2, visc_mlswe=100.0,
                 dtype="float64" if args.f64 else "float32")
    m = Model(cfg)
    static, P, g, bc = m.static, m.P, m.g, m.bc
    s = m.state0
    qb, qp = s.qb_df, s.qprime_df

    qpf = extract_qprime_faces(bc, qp)
    zq = jnp.zeros_like(interp_n2q(g, qp[0]))
    coup = jax.jit(lambda qp, qpf: btp_bcl_coeffs(
        static, P, g, bc, qp, qpf, qp[0], zq))(qp, qpf)

    f_solve = jax.jit(lambda qb, qp: barotropic_solve(static, P, g, bc, coup, qb, qp))
    f_rhs = jax.jit(lambda qb, qp: create_rhs_btp(static, P, g, bc, coup, qb, qp))
    f_vol = jax.jit(lambda qb, qp: btp_volume_rhs(
        static, P, g, coup, qb, interp_n2q(g, qp[:, -1])))
    f_step = m._step

    # m._step donates its input: time by chaining states
    s2 = f_step(m.state0)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    for _ in range(5):
        s2 = f_step(s2)
    jax.block_until_ready(s2)
    t_step = (time.perf_counter() - t0) / 5 * 1e3
    t_solve = timeit(f_solve, qb, qp, n=5)
    t_rhs = timeit(f_rhs, qb, qp)
    t_vol = timeit(f_vol, qb, qp)

    nbtp = static.n_btp * static.kstages
    print(f"grid {nel}x{nel} p=4 N_btp={static.n_btp} k={static.kstages} "
          f"dtype={cfg.dtype}")
    print(f"full step          : {t_step:8.2f} ms")
    print(f"barotropic_solve   : {t_solve:8.2f} ms  (x2 per step = {2*t_solve:.2f})")
    print(f"  per stage        : {t_solve/nbtp*1e3:8.1f} us")
    print(f"create_rhs_btp     : {t_rhs:8.3f} ms standalone")
    print(f"btp_volume_rhs     : {t_vol:8.3f} ms standalone")


if __name__ == "__main__":
    main()
