"""Marginal per-stage cost attribution on the REAL model step.

Times the full jitted baroclinic step at N_btp and 2*N_btp: the marginal
cost of one barotropic stage is (T2 - T1) / (kstages * N_btp * 2 solves),
with the baroclinic (RHS/coupling/consistency) part = T1 - stage_cost *
stages(T1). Repeats with viscosity off to attribute the viscous face work.
Methodology-robust: every number comes from the production program, so
per-call dispatch overhead and layout costs cancel in the difference.

Usage: python tools/marginal_probe.py --nel 32 [--variants base,novisc]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def step_time(m, steps=10):
    import jax
    s = m.step(m.state0)
    jax.block_until_ready(s)
    s = m.step(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(steps):
        s = m.step(s)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / steps, bool(s.ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--variants", default="base,novisc")
    args = ap.parse_args()

    import jax  # noqa: F401

    from hnumo_tpu import compile_cache
    compile_cache.enable()
    from hnumo_tpu.config import Config
    from hnumo_tpu.model import Model

    nel = args.nel
    scale = 25.0 / nel

    def cfgmk(**kw):
        base = dict(nelx=nel, nely=nel, nopx=4, nopy=4,
                    xdims=(0.0, 2e6), ydims=(0.0, 2e6), nlayers=2,
                    dt=500.0 * scale, dt_btp=25.0 * scale, time_final=1e9,
                    test_case="double_gyre", f0=9.3e-5, beta=2e-11,
                    botfr=1, cd_mlswe=1e-7, method_visc=2,
                    visc_mlswe=100.0, dtype="float32")
        base.update(kw)
        return Config(**base)

    res = {}
    for name in args.variants.split(","):
        visc = 0.0 if name == "novisc" else 100.0
        t1, ok1 = step_time(Model(cfgmk(visc_mlswe=visc)), args.steps)
        t2, ok2 = step_time(Model(cfgmk(visc_mlswe=visc,
                                        dt_btp=12.5 * scale)), args.steps)
        # stages: 2 solves x kstages x n_btp
        marg_us = (t2 - t1) / (2 * 5 * 20) * 1e6
        fixed_ms = (t1 - (t2 - t1)) * 1e3  # T1 minus 200 marginal stages
        res[name] = dict(ms_step_n20=round(t1 * 1e3, 2),
                        ms_step_n40=round(t2 * 1e3, 2),
                        marginal_us_per_stage=round(marg_us, 1),
                        fixed_ms=round(fixed_ms, 2), ok=ok1 and ok2)
        print(json.dumps({"nel": nel, "variant": name, **res[name]}),
              flush=True)


if __name__ == "__main__":
    main()
