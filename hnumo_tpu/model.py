"""Model facade: config -> geometry -> precomputed tables -> jitted step.

Replaces the reference driver wiring (src/amain.F90:12-190): grid init,
field init, and the time loop. The whole baroclinic step (predictor +
corrector + 2 barotropic sub-cycles) is one jitted pure function
`state -> state` with donated state buffers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import Config
from .core.faces import BCs
from .core.init import build_precomputed
from .core.stepper import ti_rk_bcl
from .core.types import State
from .mesh.grid import build_geometry
from .ops.dg import device_geom


class Model:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        self.dtype = dtype

        nop = cfg.nopx
        if cfg.nopy != cfg.nopx:
            raise NotImplementedError("anisotropic polynomial order not supported yet")
        bc = (cfg.x_boundary[0], cfg.x_boundary[1], cfg.y_boundary[0], cfg.y_boundary[1])
        self.geom = build_geometry(cfg.nelx, cfg.nely, nop, cfg.xdims, cfg.ydims,
                                   bc=bc, exact_integration=cfg.dg_integ_exact)
        self.g = device_geom(self.geom, dtype)
        self.bc = BCs(*bc)
        self.P, self.state0, self.static, self.init_fields = build_precomputed(
            cfg, self.geom, dtype)

        static, P, g, bcs = self.static, self.P, self.g, self.bc

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _step(state: State) -> State:
            return ti_rk_bcl(static, P, g, bcs, state)

        self._step = _step

    def step(self, state: State) -> State:
        return self._step(state)

    def run(self, state: State, nsteps: int, check_ok: bool = True) -> State:
        for _ in range(nsteps):
            state = self.step(state)
            if check_ok and not bool(state.ok):
                raise RuntimeError(
                    "Negative mass in thickness at some points "
                    f"(t={float(state.t)}) — aborting, as the reference does "
                    "(src/mod_splitting.F90:74-77)")
        return state

    @property
    def nsteps_total(self) -> int:
        import math
        return int(round((self.cfg.t_final - self.cfg.t_initial) / self.cfg.dt))


def model_from_namelist(path, **overrides) -> Model:
    from .config import config_from_namelist
    return Model(config_from_namelist(path, **overrides))
