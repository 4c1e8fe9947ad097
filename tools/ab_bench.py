"""A/B bench of the barotropic-path variants on the full baroclinic step.

Times ms/step for each requested variant at a given grid size on the
current default device (TPU under the driver). Variants:

  xla      pure XLA path (use_pallas off)
  pallas   Pallas volume kernel, general-geometry operators (round-2 path)
  uni      Pallas volume kernel, folded uniform-geometry operators (v2)
  fused    whole-stage fused Pallas tail (3 kernels/stage)

Usage: python tools/ab_bench.py --nel 32 --variants xla,pallas,uni,fused
Prints one line per variant: "<variant> <nel> <ms/step> <gp-steps/s>".
"""
import argparse
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=32)
    p.add_argument("--nop", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", default="xla,pallas,uni,fused")
    args = p.parse_args()

    import jax

    from hnumo_tpu import compile_cache
    compile_cache.enable()
    from hnumo_tpu.config import Config
    from hnumo_tpu.core.stepper import ti_rk_bcl
    from hnumo_tpu.model import Model

    nel = args.nel
    scale = (25.0 / nel) * (4.0 / args.nop) ** 2
    cfg = Config(
        nelx=nel, nely=nel, nopx=args.nop, nopy=args.nop,
        xdims=(0.0, 2.0e6), ydims=(0.0, 2.0e6), nlayers=2,
        dt=500.0 * scale, dt_btp=25.0 * scale, time_final=1e9,
        test_case="double_gyre", f0=9.3e-5, beta=2.0e-11,
        botfr=1, cd_mlswe=1.0e-7, method_visc=2, visc_mlswe=100.0,
        dtype="float32", use_pallas="on")
    m = Model(cfg)

    def restep(**kw):
        st = dataclasses.replace(m.static, **kw)
        bcs = m.bc
        # P/g passed as arguments (not captured) so the program size stays
        # O(1) in the grid; operator tables hoisted — see Model.__init__.
        from hnumo_tpu.core.btp import build_vol_operators
        vol_ops = jax.jit(functools.partial(build_vol_operators, st))(m.g, m.P)
        mega_ops = None
        if st.mega:
            from hnumo_tpu.ops.pallas_mega import build_mega_static
            mega_ops = build_mega_static(st, m.g, m.P, bcs)
        jf = jax.jit(lambda s, P, g, vo, mo: ti_rk_bcl(st, P, g, bcs, s,
                                                       vol_ops=vo,
                                                       mega_ops=mo))
        return st, lambda s: jf(s, m.P, m.g, vol_ops, mega_ops)

    variants = {
        "xla": dict(use_pallas=False),
        "pallas": dict(),  # general-geometry Pallas volume kernel (default)
        "uni": dict(uni_volume_on=True),
        "fused": dict(fused_tail_on=True),
        "bf": dict(batched_faces_on=True),     # flat-axis batched faces
        "bf_xla": dict(batched_faces_on=True, use_pallas=False),
        "pd": dict(batched_faces_on=False),    # per-direction legacy faces
        "ss_off": dict(scan_stages=False),     # Python-unrolled RK stages
        "ss_on": dict(scan_stages=True),       # lax.scan over RK stages
        "mega": dict(mega_on=True),            # whole-solve megakernel
        "mega_bf16": dict(mega_on=True, mega_bf16=True),
    }
    nq = 2 * args.nop + 1
    gp = nel * nel * nq * nq * 2
    for name in args.variants.split(","):
        st, step = restep(**variants[name])
        if name == "fused":
            assert st.fused_tail
        t_c0 = time.perf_counter()
        s = step(m.state0)
        jax.block_until_ready(s)
        compile_s = time.perf_counter() - t_c0
        s = step(s)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            s = step(s)
        jax.block_until_ready(s)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        print(json.dumps({"variant": name, "nel": nel, "ms_per_step":
                          round(ms, 2), "gp_steps_per_s": round(gp / ms * 1e3),
                          "compile_s": round(compile_s, 1),
                          "ok": bool(s.ok)}), flush=True)


if __name__ == "__main__":
    main()
