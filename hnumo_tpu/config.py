"""Run configuration: dataclass + Fortran-namelist (`numo3d.in`) parser.

Mirrors the reference's namelist layer (src/mod_input.F90:97-480) so the
shipped example inputs (CI/bump, Examples/{bump,lake,double_gyre}) run
unmodified. Defaults match the reference's module declarations
(src/mod_input.F90:118-269).
"""
from __future__ import annotations

import dataclasses
import re
from pathlib import Path


@dataclasses.dataclass(frozen=True)
class Config:
    # --- &gridnl ---
    nelx: int = 10
    nely: int = 10
    nopx: int = 4
    nopy: int = 4
    xdims: tuple[float, float] = (0.0, 1.0)
    ydims: tuple[float, float] = (0.0, 1.0)
    nlayers: int = 1
    # BC codes per side: 0=do nothing, 3=periodic, 4=free-slip, 2/5=no-slip
    # (reference face code is er=-bc; its kernels test er==-4 / er==-2,
    # src/mod_barotropic_terms.F90:79-92)
    x_boundary: tuple[int, int] = (4, 4)
    y_boundary: tuple[int, int] = (4, 4)

    # --- &input ---
    dt: float = 100.0
    dt_btp: float = 1.0
    time_initial: float = 0.0
    time_final: float = 1.0
    time_restart: float = 10.0
    time_scale: float = 1.0
    ad_mlswe: float = 0.0          # vertical eddy viscosity (shear stress)
    max_shear_dz: float = 0.0
    botfr: int = 0                 # 0=none, 1=linear, 2=quadratic bottom drag
    cd_mlswe: float = 0.0
    method_visc: int = 0           # 0=off path / per reference dispatch
    visc_mlswe: float = 0.0        # horizontal viscosity coefficient
    dg_integ_exact: bool = True
    beta: float = 0.0
    f0: float = 0.0
    test_case: str = "bump"
    ti_method_btp: str = "rk35"
    kstages: int = 5
    space_method: str = "dg"
    fname_root: str = "mlswe"
    format_vtk: str = "ascii"
    out_type: str = "txt"
    dump_data: bool = True
    lprint_diagnostics: bool = True
    lcheck_conserved: bool = True
    lrestart_file: bool = False
    irestart_file_number: int = 0
    # external (gmsh) mesh + bathymetry (reference src/mod_input.F90:251,288)
    lread_external_grid: bool = False
    mesh_file: str = ""
    lread_external_bathy: bool = False
    bathymetry_file: str = ""
    bathymetry_shift: float = 0.0

    # --- non-reference extensions ---
    dtype: str = "float64"         # compute dtype ("float64" validation, "float32" perf)
    use_pallas: str = "auto"       # fused TPU kernels: "auto" | "on" | "off"

    def __post_init__(self):
        # normalize periodic coupling (reference src/mod_input.F90:449-465)
        xb, yb = list(self.x_boundary), list(self.y_boundary)
        if 3 in xb:
            object.__setattr__(self, "x_boundary", (3, 3))
        if 3 in yb:
            object.__setattr__(self, "y_boundary", (3, 3))

    # Derived quantities (reference src/mod_initial.F90:176-186)
    @property
    def n_btp(self) -> int:
        import math
        return math.ceil(self.dt / self.dt_btp)

    @property
    def dt_btp_eff(self) -> float:
        return self.dt / self.n_btp

    @property
    def t_initial(self) -> float:
        return self.time_initial * self.time_scale

    @property
    def t_final(self) -> float:
        return self.time_final * self.time_scale

    @property
    def t_restart(self) -> float:
        return self.time_restart * self.time_scale

    @property
    def x_periodic(self) -> bool:
        return self.x_boundary[0] == 3

    @property
    def y_periodic(self) -> bool:
        return self.y_boundary[0] == 3


_BOOL = {".true.": True, "t": True, ".t.": True, ".false.": False, "f": False, ".f.": False}


def _parse_value(raw: str):
    raw = raw.strip().rstrip(",").strip()
    if not raw:
        return None
    low = raw.lower()
    if low in _BOOL:
        return _BOOL[low]
    if raw.startswith(("'", '"')):
        return raw.strip("'\"")
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw.replace("d", "e").replace("D", "E"))
    except ValueError:
        return raw


def parse_namelist(path: str | Path) -> dict:
    """Parse the subset of Fortran namelist syntax used by numo3d.in files.

    Returns a flat {name: value} dict merged across all namelist groups.
    """
    text = Path(path).read_text()
    values: dict = {}
    in_group = False
    for line in text.splitlines():
        line = line.split("!")[0].strip()
        if not line:
            continue
        if line.startswith("&"):
            in_group = True
            continue
        if line in ("/", "&end", "$end"):
            in_group = False
            continue
        if not in_group or "=" not in line:
            continue
        name, raw = line.split("=", 1)
        name = name.strip().lower()
        parts = [p for p in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", raw) if p.strip()]
        vals = [_parse_value(p) for p in parts]
        values[name] = vals[0] if len(vals) == 1 else tuple(vals)
    return values


def config_from_namelist(path: str | Path, **overrides) -> Config:
    """Build a Config from a reference-format numo3d.in file."""
    raw = parse_namelist(path)
    field_names = {f.name for f in dataclasses.fields(Config)}
    kwargs = {}
    for name, val in raw.items():
        if name in field_names:
            if name in ("xdims", "ydims", "x_boundary", "y_boundary"):
                val = tuple(val) if isinstance(val, tuple) else (val, val)
            kwargs[name] = val
    kwargs.update(overrides)
    return Config(**kwargs)
