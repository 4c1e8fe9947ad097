"""Microprobe for the whole-solve megakernel design (ops/pallas_mega).

Measures, on the real chip:
  1. per-iteration cost of a fori_loop inside ONE pallas_call whose body
     mimics a barotropic stage's matmul/elementwise mix at 32x32 p=4 scale
     (element-major rows (C*E, P-lanes), K/N <= 128);
  2. whether sublane roll (neighbor shift) lowers through Mosaic;
  3. VMEM capacity headroom for the resident arrays.

Usage: python tools/mega_probe.py [--e 1024] [--iters 100] [--reps 5]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def probe_kernel(qb_ref, K_ref, M2_ref, E_ref, out_ref, acc_ref, *, iters,
                 E, prec, do_roll):
    K, M2, Eall = K_ref[:], M2_ref[:], E_ref[:]

    def body(i, qb):
        # interp: (4E, 32) @ (32, 128)  [npts->nqq class]
        qq = jnp.dot(qb, K, preferred_element_type=jnp.float32,
                     precision=prec)
        # elementwise block (~30 VPU ops on quad fields)
        a = qq * 1.0000001 + 0.5
        b = a * a
        c = b / (1.0 + a * a)
        d = jnp.sqrt(jnp.abs(c) + 1.0)
        e = c * d + a
        f = e * (2.0 + e)
        # scatter back: (4E, 128) @ (128, 32)
        rhs = jnp.dot(f, M2, preferred_element_type=jnp.float32,
                      precision=prec)
        # traces: (4E, 32) @ (32, 32)
        tr = jnp.dot(qb, Eall, preferred_element_type=jnp.float32,
                     precision=prec)
        if do_roll:
            trn = pltpu.roll(tr, 1, 0)       # sublane shift (x-neighbor)
            trs = pltpu.roll(tr, 32, 0)      # y-neighbor
            tr = tr + 0.25 * (trn + trs)
        acc_ref[:] += qq
        return qb * 0.999999 + 0.001 * rhs

    out_ref[:] = jax.lax.fori_loop(0, iters, body, qb_ref[:])


def run(E, iters, prec, do_roll, reps):
    CE = 4 * E
    qb = jnp.asarray(np.random.rand(CE, 32), jnp.float32)
    K = jnp.asarray(np.random.rand(32, 128), jnp.float32)
    M2 = jnp.asarray(np.random.rand(128, 32), jnp.float32)
    Eall = jnp.asarray(np.random.rand(32, 32), jnp.float32)

    f = pl.pallas_call(
        functools.partial(probe_kernel, iters=iters, E=E, prec=prec,
                          do_roll=do_roll),
        out_shape=[jax.ShapeDtypeStruct((CE, 32), jnp.float32),
                   jax.ShapeDtypeStruct((CE, 128), jnp.float32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(lambda q: f(q, K, M2, Eall))
    o = jf(qb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = jf(qb)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    return dt / iters * 1e6   # us per loop iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    for prec_name, prec in (("highest", jax.lax.Precision.HIGHEST),
                            ("default", jax.lax.Precision.DEFAULT)):
        for do_roll in (False, True):
            try:
                us = run(args.e, args.iters, prec, do_roll, args.reps)
                print(f"E={args.e} prec={prec_name} roll={do_roll}: "
                      f"{us:.2f} us/iter")
            except Exception as ex:  # noqa: BLE001
                print(f"E={args.e} prec={prec_name} roll={do_roll}: "
                      f"FAILED {type(ex).__name__}: {str(ex)[:300]}")


if __name__ == "__main__":
    main()
