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
    # bc.inp patch reader (reference src/mod_bc.F90:97-221, gated by
    # lread_bc at src/mod_p4est.F90:433-435); applied by config_from_namelist
    lread_bc: bool = False

    # --- non-reference extensions ---
    dtype: str = "float64"         # compute dtype ("float64" validation, "float32" perf)
    use_pallas: str = "auto"       # fused TPU kernels: "auto" | "on" | "off"
    # Whole-stage fused Pallas tail (ops/pallas_btp_tail): "on" | "off".
    # OFF by default: at the flagship 32x32 p=4 f32 config the three-kernel
    # tail measured 68 ms/step vs 22 ms/step for the default path (Pallas
    # volume kernel + XLA faces) on v5e — per-stage pallas_call dispatch
    # overhead x3 kernels x~200 stages dominates at these sizes (A/B table
    # in docs/performance.md). Kept for large-grid experiments.
    fused_tail: str = "off"
    # Folded uniform-geometry volume kernel ("on" | "off"). OFF by default:
    # folding the constant metrics into the Kronecker operator tables (and
    # fusing the viscosity gradient) measured SLOWER than the general-
    # geometry volume kernel at every production size on v5e (34.5 vs
    # 23.8 ms/step at 32x32, 89.7 vs 71.8 at 64x64 — A/B table in
    # docs/performance.md). Kept for affine-mesh experiments; the fused
    # tail requires and implies these operators independently.
    uni_volume: str = "off"
    # Batch the two face directions of the barotropic stage on one flat face
    # axis ("on" | "off"): halves the per-stage XLA kernel count in the face
    # pipeline (the per-direction calls cannot be batched by XLA because the
    # x/y face counts differ). Same formulas on the same values; results
    # agree with the per-direction path up to XLA fusion/FMA reassociation
    # (~1e-14 absolute at f64 on the bump case; bitwise on others).
    # "auto" (default): on up to 8192 elements, off above — clean-host A/B
    # on v5e (docs/performance.md, r5): wins 75.0 vs 80.5 ms/step at 64x64,
    # loses 279.9 vs 269.6 at 128x128 and 1374 vs 1247 at 256x256 (the
    # per-solve concat copies outgrow the launch savings), so the 8192
    # cutoff sits inside the measured 4096->16384 crossover. The
    # quad-family viscosity (method_visc=1) keeps the per-direction path
    # (StaticConfig gates it off there).
    batched_faces: str = "auto"
    # Run the kstages RK stages of the barotropic sub-cycle as a lax.scan
    # over the coefficient tables instead of Python-unrolling them into the
    # sub-cycling scan body ("auto" | "on" | "off"). Cuts the step HLO and
    # cold compile time by ~kstages x (44 vs 78 s at 64x64 on v5e) at the
    # price of per-iteration loop overhead in the launch-latency-bound
    # regime (34.3 vs 22.5 ms/step at 32x32 f32). "auto": ON for the XLA
    # path (f64/CPU validation runs, where compile dominates), OFF for the
    # Pallas TPU path (where runtime is king). Same update formulas; f64
    # trajectories differ only by XLA fusion/reassociation roundoff.
    scan_stages: str = "auto"
    # Whole-solve Pallas megakernel ("auto" | "on" | "off"): the ENTIRE
    # barotropic sub-cycling (N_btp x kstages stages) runs as ONE
    # pallas_call per solve with VMEM-resident state/averages and in-kernel
    # roll-based neighbor exchange (ops/pallas_mega.py). Envelope: f32 TPU,
    # uniform brick, non-periodic walls, rk35, nodal/no viscosity, single
    # device; outside it the default path runs regardless of this flag.
    # "auto" (default) = on within the envelope (incl. <=1024 elements:
    # whole-grid VMEM residency). Clean-host runtime matches the default
    # path (17.1 vs 17.0 ms/step at 32x32 on v5e) but cold compile drops
    # 45.6 -> 7.9 s and the step is immune to host-dispatch jitter (17.5
    # vs 20.3 under load) — docs/performance.md. Parity gated at 1e-11 by
    # tests/test_mega.py.
    mega: str = "auto"
    # Matmul precision inside the megakernel: "highest" (bf16x6, f32-exact
    # MXU passes — the default, matching the rest of the model) | "bf16"
    # (single-pass: 9.5 vs 17.1 ms/step at 32x32, but the 100-day
    # double-gyre campaign shows the free surface diverging to +-4400 m
    # while KE still tracks to 1% — docs/performance.md "Precision",
    # docs/artifacts/dgyre_f32_tpu_bf16.json. KE-only experiments ONLY.)
    mega_precision: str = "highest"
    # Reproduce the reference's wind/bottom-stress vertical distribution
    # VERBATIM, including its indexing slip (src/mod_create_rhs_mlswe.F90:
    # 380-382: the pressure accumulator adds the LAST layer's (dp',u',v')
    # components instead of layer k's dp') — for bit-level A/B parity studies
    # against the reference binary on wind-forced runs. Default False =
    # the documented intent (cumulative prime pressure). Inert for all
    # golden-gated cases (zero wind/bottom stress there).
    compat_reference_stress: bool = False
    # debug mode (SURVEY §5): enables jax debug_nans on the step plus extra
    # finite-value checks — the moral equivalent of the reference's -DDEBUG
    # compile flag / runtime sanitizer builds
    debug_checks: bool = False

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


# Reference namelist members (src/mod_input.F90:320-381) that are accepted
# but have no effect on the MLSWE/TPU build: NUMA-3D lineage (z dims, sponge,
# filter, OCCA/GPU plumbing), AMR scaffolding inert in every shipped case
# (refinement_levels_h=0), and legacy grid-creation switches. Anything not in
# this set and not a Config field triggers a warning (a typo'd key must not
# silently become "feature off").
_INERT_REFERENCE_KEYS = frozenset("""
    eqn_set is_mlswe nelz nopz ztop zbottom nproc_z z_boundary
    x_periodic y_periodic z_periodic bc_tscale bc_xscale bc_yscale bc_zscale
    sponge_type sponge_top_coe sponge_lateralx_coe sponge_lateralx_coe_east
    sponge_lateralx_coe_west sponge_lateraly_coe lsommerfeld lgrid_only
    is_non_conforming_flg p4est_log_level xlim_min xlim_max ylim_min ylim_max
    zlim_min zlim_max amr_indicator_variables amr_smoothness_limits
    amr_max_min_lim amr_threshold_lim amr_smoothness_ql2_limit
    amr_mark_max_min amr_mark_random amr_mark_threshold amr_mark_modes
    amr_mark_modes_use_baseline_decay amr_num_neigh_iter amr_mark_set2nc
    lserial_grid_creation lparallel_grid_creation lwrite_grid_ascii
    refinement_levels_h nel_root_h xstretch_coe ystretch_coe zstretch_coe
    lxstretch lystretch lzstretch restoring_time lrestoring_sponge
    time_dynamic_amr dt0 dt1 dt2 filter_mux filter_muy filter_muz ifilter
    filter_weight_type filter_basis_type filter_tracers_flg lout_ascii
    lout_asciimaya nvtk_files vtk_cell_type write_mesh fname_initial
    restart_path ladapt_timestep iprint_diagnostics bcast_type imass
    lgpu numaocca_dir nelems nslices nslicesv vectorization platform
    platformid deviceid platformweight platform2 platformid2 deviceid2
    platformweight2 cpus_per_node gpus_per_node threads_per_process
    luse_hybrid_cpu_gpu gravity_in limit_threshold ibathymetry
    dp_tau_bot dp_tau_wind adjust_h_vertical_sum adjust_bcl_mom_flux
""".split())


def config_from_namelist(path: str | Path, **overrides) -> Config:
    """Build a Config from a reference-format numo3d.in file.

    Unrecognized keys warn (reference `read(funit, input)` would hard-error
    on them, src/mod_input.F90:387 — a silent drop would turn a typo'd
    `visc_mlswe` into "viscosity off"); known-but-inert reference keys are
    accepted silently.
    """
    import warnings

    raw = parse_namelist(path)
    field_names = {f.name for f in dataclasses.fields(Config)}
    kwargs = {}
    for name, val in raw.items():
        if name in field_names:
            if name in ("xdims", "ydims", "x_boundary", "y_boundary"):
                val = tuple(val) if isinstance(val, tuple) else (val, val)
            kwargs[name] = val
        elif name not in _INERT_REFERENCE_KEYS:
            warnings.warn(f"{path}: unrecognized namelist key {name!r} "
                          "ignored", stacklevel=2)
    kwargs.update(overrides)
    cfg = Config(**kwargs)
    if cfg.lread_bc:
        # reference opens bc.inp from the working directory
        # (src/mod_bc.F90:119); we resolve it next to the namelist
        from .mesh.bcinp import read_bc_inp

        xb, yb = read_bc_inp(Path(path).parent / "bc.inp", cfg.nelx, cfg.nely,
                             cfg.xdims, cfg.ydims, cfg.x_boundary,
                             cfg.y_boundary)
        cfg = dataclasses.replace(cfg, x_boundary=xb, y_boundary=yb)
    return cfg
