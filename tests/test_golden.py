"""Golden-trajectory regression gates.

Frozen float64 CPU trajectories (tests/goldens/*.npz, written by
tools/freeze_goldens.py) are replayed every suite run — the pytest
equivalent of the reference's hard-fail CI regression
(CI/bump/check.F90:58-74, .github/workflows/ci.yml:9-44). Two cases:

- bump (the reference CI config, CI/bump/numo3d.in): pure gravity-wave
  dynamics, and the full 108-step run vs the reference's own golden file
  values as a slow-marked test;
- double-gyre (Examples/double_gyre/numo3d.in): exercises wind stress,
  linear bottom friction, beta-plane Coriolis and the nodal-family LDG
  viscosity (method_visc=3) every suite run.
"""
import os

import numpy as np
import pytest

from hnumo_tpu.model import Model
from tools.freeze_goldens import bump_config, dgyre_config, fingerprint

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _replay_and_check(name, cfg, max_steps=None):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    g = np.load(path)
    checkpoints = list(g["checkpoints"])
    if max_steps is not None:
        checkpoints = [c for c in checkpoints if c <= max_steps]
    m = Model(cfg)
    s = m.state0
    done = 0
    for nst in checkpoints:
        for _ in range(nst - done):
            s = m.step(s)
        done = nst
        assert bool(s.ok)
        fp = fingerprint(s, m.P)
        for key, val in fp.items():
            ref = g[f"s{nst}_{key}"]
            # per-variable magnitude scale (means/sums of near-cancelling
            # fields carry fp-reduction noise far above their own tiny value)
            var = key.rsplit("_", 1)[0]
            scale = np.max(np.abs(g[f"s{nst}_{var}_max"])) + 1e-300
            np.testing.assert_allclose(
                val, ref, rtol=1e-9, atol=1e-13 * scale,
                err_msg=f"{name} step {nst}: {key} deviates from frozen "
                        "f64 golden (tools/freeze_goldens.py)")


def test_bump_short_golden():
    _replay_and_check("bump_traj", bump_config())


def test_double_gyre_short_golden():
    # first 10 steps every run (~30 s); the 100-step tail is slow-marked
    _replay_and_check("dgyre_traj", dgyre_config(), max_steps=10)


@pytest.mark.slow
def test_double_gyre_long_golden():
    _replay_and_check("dgyre_traj", dgyre_config())


# reference golden file values: CI/bump/ref_mlswe_FIN.txt (per-layer max/min
# at t=10800 s), the contract checked by CI/bump/check.F90:41-83
_REF_FIN = {
    1: dict(h=(0.201449116645e2, 0.198079626307e2),
            u=(0.132668224164e-2, -0.132668287181e-2),
            v=(0.132668258603e-2, -0.132668290397e-2),
            ssh=(0.143070025622e-4, -0.188256860127e-4)),
    2: dict(h=(0.201920273076e2, 0.198550996224e2),
            u=(0.131238487936e-2, -0.131238569024e-2),
            v=(0.131238505181e-2, -0.131238545749e-2),
            ssh=(-0.198079726924e2, -0.201449003776e2)),
}


@pytest.mark.slow
def test_bump_full_ci_golden():
    """Full 108-step bump run vs the reference's committed golden values,
    with the 1e-12 mass-conservation hard gate (CI/bump/check.F90:58-62)."""
    import jax

    cfg = bump_config()
    m = Model(cfg)
    s = m.state0
    wj = np.asarray(jax.device_get(m.g.wjac_df))
    dpp_ref = np.asarray(m.init_fields.qprime_df[0], np.float64)
    q0 = np.asarray(jax.device_get(s.q_df), np.float64)
    mass0 = (wj[None] * (dpp_ref + q0[0])).sum(axis=(1, 2, 3, 4))

    s = m.run(s, m.nsteps_total)
    q = np.asarray(jax.device_get(s.q_df), np.float64)
    dp_full = dpp_ref + q[0]
    mass = (wj[None] * dp_full).sum(axis=(1, 2, 3, 4))

    alpha = np.asarray(jax.device_get(m.P.alpha))
    h = alpha[:, None, None, None, None] / 9.806 * dp_full
    u = q[1] / dp_full
    v = q[2] / dp_full
    zbot = np.asarray(jax.device_get(m.P.zbot_df))
    elev = [zbot]
    for k in range(cfg.nlayers - 1, -1, -1):
        elev.insert(0, elev[0] + h[k])
    ssh = np.stack(elev[:cfg.nlayers])

    for k in range(cfg.nlayers):
        ml = abs(mass[k] - mass0[k]) / mass0[k]
        assert ml < 1e-12, f"layer {k+1} mass loss {ml:.3e} > 1e-12"
        for nm, arr in (("h", h[k]), ("u", u[k]), ("v", v[k]), ("ssh", ssh[k])):
            gmax, gmin = _REF_FIN[k + 1][nm]
            scale = max(abs(gmax), abs(gmin))
            assert abs(arr.max() - gmax) / scale < 1e-5, (k + 1, nm, "max")
            assert abs(arr.min() - gmin) / scale < 1e-5, (k + 1, nm, "min")
