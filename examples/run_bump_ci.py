"""CI bump regression: run the bump case (10x10, p=4, 2 layers, t=10800 s)
and compare final-state per-layer max/min of (h, u, v, ssh) + mass loss
against the reference golden file (reference CI/bump/ref_mlswe_FIN.txt,
checked by CI/bump/check.F90:41-83).

Usage: python examples/run_bump_ci.py [--f32] [--steps N]
"""
import argparse
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--f32", action="store_true")
p.add_argument("--steps", type=int, default=None)
p.add_argument("--cpu", action="store_true")
args = p.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
if not args.f32:
    jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from hnumo_tpu.config import Config
from hnumo_tpu.model import Model

# golden values: reference CI/bump/ref_mlswe_FIN.txt
GOLDEN = {
    1: dict(h=(0.201449116645e2, 0.198079626307e2),
            u=(0.132668224164e-2, -0.132668287181e-2),
            v=(0.132668258603e-2, -0.132668290397e-2),
            ssh=(0.143070025622e-4, -0.188256860127e-4)),
    2: dict(h=(0.201920273076e2, 0.198550996224e2),
            u=(0.131238487936e-2, -0.131238569024e-2),
            v=(0.131238505181e-2, -0.131238545749e-2),
            ssh=(-0.198079726924e2, -0.201449003776e2)),
}

cfg = Config(nelx=10, nely=10, nopx=4, nopy=4, xdims=(0.0, 2e3), ydims=(0.0, 2e3),
             nlayers=2, x_boundary=(4, 4), y_boundary=(4, 4),
             dt=100.0, dt_btp=1.8, time_final=10800.0, test_case="bump",
             dtype="float32" if args.f32 else "float64")
m = Model(cfg)
s = m.state0

wj = np.asarray(jax.device_get(m.g.wjac_df))  # nodal quadrature weights
dpp_ref = np.asarray(m.init_fields.qprime_df[0], np.float64)  # f64 master ref
q0 = np.asarray(jax.device_get(s.q_df), dtype=np.float64)
mass0 = (wj[None] * (dpp_ref + q0[0])).sum(axis=(1, 2, 3, 4))

nsteps = args.steps or m.nsteps_total
t0 = time.time()
for i in range(nsteps):
    s = m.step(s)
s.q_df.block_until_ready()
dt_run = time.time() - t0
print(f"{nsteps} steps in {dt_run:.2f}s ({dt_run/nsteps*1e3:.1f} ms/step), ok={bool(s.ok)}")

q = np.asarray(jax.device_get(s.q_df), dtype=np.float64)
P = m.P
alpha = np.asarray(jax.device_get(P.alpha))
g = 9.806
dp_full = dpp_ref + q[0]          # q_df[0] stores δdp (core.types.State)
mass = (wj[None] * dp_full).sum(axis=(1, 2, 3, 4))

h = alpha[:, None, None, None, None] / g * dp_full
u = q[1] / dp_full
v = q[2] / dp_full
zbot = np.asarray(jax.device_get(P.zbot_df))
# elevations: z_{nlayers+1}=zbot; z_k = z_{k+1} + h_k  (diagnostics.F90:31-45)
elev = [zbot]
for k in range(cfg.nlayers - 1, -1, -1):
    elev.insert(0, elev[0] + h[k])
ssh = np.stack(elev[:cfg.nlayers])

fails = 0
full_run = nsteps == m.nsteps_total
# field gate applies only to the full 108-step run (the goldens are the
# reference's t=10800 s state); relative-error head-room: round-1 measured
# <=3.7e-7 (f64) / f32 runs carry fp32 accumulation noise
field_gate = 5e-3 if args.f32 else 1e-5
for k in range(cfg.nlayers):
    ml = abs(mass[k] - mass0[k]) / mass0[k]
    # f32 telescoping leaks at fp32-eps scale (docs/float32.md); the 1e-12
    # gate is the f64 validation contract, mirroring the reference's default
    # double-precision build (-DSINGLE carries the same relaxation)
    gate = 1e-6 if args.f32 else 1e-12
    print(f"Layer {k+1}: mass loss = {ml:.3e} {'OK' if ml < gate else f'FAIL(>{gate})'}")
    if ml >= gate:
        fails += 1
    for name, arr in (("h", h[k]), ("u", u[k]), ("v", v[k]), ("ssh", ssh[k])):
        gmax, gmin = GOLDEN[k + 1][name]
        amax, amin = float(arr.max()), float(arr.min())
        scale = max(abs(gmax), abs(gmin), 1e-30)
        emax = abs(amax - gmax) / scale
        emin = abs(amin - gmin) / scale
        if full_run and max(emax, emin) >= field_gate:
            fails += 1
        print(f"  {name:4s} max {amax: .9e} (ref { gmax: .9e}, rel {emax:.2e})  "
              f"min {amin: .9e} (ref {gmin: .9e}, rel {emin:.2e})")
print("FAILS:", fails)
# hard-fail like the reference CI (CI/bump/check.F90:58-74 aborts the
# workflow on mass loss / mismatch)
sys.exit(1 if fails else 0)
