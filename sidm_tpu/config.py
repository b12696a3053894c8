"""Run configuration: parameter-file grammar compatible with the reference.

The reference registers ~60 keyword tags parsed from a ``%``-commented
keyword-value file (nbody/begrun.c:284-911), echoes the used values to
``<OutputDir>/parameters_out``, and errors on unknown or missing tags.  We keep
the same grammar and tag names so reference parameter files (nbody/parameter.txt)
run unchanged, and fold the reference's compile-time Makefile options
(nbody/Makefile:19-38: SIDM, PERIODIC, REFLECTIONBOUNDARY, CROSS_SECTION_TYPE,
NOSCATTER, NOFORCE, SCATTERLOG, FINDNBRLOG, VELDISP ...) into optional runtime
tags with defaults that reproduce the reference's shipped build (SIDM on,
CROSS_SECTION_TYPE=0, REFLECTIONBOUNDARY on).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import List, Optional

from .constants import (
    BOLTZMANN_CGS,
    GAMMA_MINUS1,
    GRAVITY_CGS,
    HUBBLE_CGS,
    PROTONMASS_CGS,
    SEC_PER_MEGAYEAR,
)


@dataclass
class SimConfig:
    """All runtime parameters (the TPU-native analog of `All`, allvars.h:170-415)."""

    # --- files ---
    InitCondFile: str = ""
    OutputDir: str = "./"
    SnapshotFileBase: str = "snp"
    EnergyFile: str = "energy_out"
    CpuFile: str = "cpu_out"
    InfoFile: str = "info_out"
    TimingsFile: str = "timings_out"
    RestartFile: str = "rst_out"
    ResubmitCommand: str = ""
    OutputListFilename: str = ""
    OutputListOn: int = 0

    # --- cosmology ---
    Omega0: float = 0.0
    OmegaBaryon: float = 0.0
    OmegaLambda: float = 0.0
    HubbleParam: float = 1.0
    BoxSize: float = 0.0
    PeriodicBoundariesOn: int = 0
    ComovingIntegrationOn: int = 0

    # --- run span / output cadence ---
    TimeBegin: float = 0.0
    TimeMax: float = 0.0
    TimeOfFirstSnapshot: float = 0.0
    TimeBetSnapshot: float = 0.0
    CpuTimeBetRestartFile: float = 3600.0
    TimeBetStatistics: float = 0.0
    TimeLimitCPU: float = 86400.0
    ResubmitOn: int = 0

    # --- units ---
    UnitVelocity_in_cm_per_s: float = 1e5
    UnitLength_in_cm: float = 3.085678e21
    UnitMass_in_g: float = 1.989e43
    GravityConstantInternal: float = 0.0

    # --- tree / force accuracy ---
    ErrTolTheta: float = 0.5
    TypeOfOpeningCriterion: int = 1
    ErrTolForceAcc: float = 0.005
    MaxNodeMove: float = 0.02
    TreeUpdateFrequency: float = 0.1
    # Lazy-rebuild cadence for the fused tree engines: the Morton topology
    # is rebuilt every K-th force; in between, refresh_octree recomputes
    # exact moments on the frozen topology and the walk inflates its
    # opening/containment guards by the accumulated particle drift. K=1
    # rebuilds every step (exact reference behaviour). This replaces the
    # reference's TreeUpdateFrequency/MaxNodeMove lazy node updates
    # (forcetree.c:433-571,941-948; gravtree.c:63) which keep STALE
    # moments — here moments stay exact, only containment is conservative.
    TreeRefreshSteps: int = 4

    # --- time integration accuracy ---
    TypeOfTimestepCriterion: int = 1
    ErrTolIntAccuracy: float = 0.005
    ErrTolDynamicalAccuracy: float = 0.004
    ErrTolVelScale: float = 0.66
    MaxSizeTimestep: float = 0.1
    MinSizeTimestep: float = 0.0

    # --- SPH ---
    DesNumNgb: int = 30
    MaxNumNgbDeviation: int = 2
    ArtBulkViscConst: float = 0.75
    InitGasTemp: float = 0.0
    MinGasTemp: float = 0.0
    CourantFac: float = 0.15
    MinGasHsmlFractional: float = 0.0

    # --- memory / decomposition (kept for file compatibility; the TPU build
    #     sizes arrays statically so these only gate padding factors) ---
    PartAllocFactor: float = 2.0
    TreeAllocFactor: float = 0.8
    BufferSize: int = 100
    DomainUpdateFrequency: float = 0.5

    # --- I/O format ---
    ICFormat: int = 1
    NumFilesPerSnapshot: int = 1
    NumFilesWrittenInParallel: int = 1
    CoolingOn: int = 0

    # --- softenings ---
    SofteningGas: float = 0.0
    SofteningHalo: float = 0.0
    SofteningDisk: float = 0.0
    SofteningBulge: float = 0.0
    SofteningStars: float = 0.0
    SofteningGasMaxPhys: float = 0.0
    SofteningHaloMaxPhys: float = 0.0
    SofteningDiskMaxPhys: float = 0.0
    SofteningBulgeMaxPhys: float = 0.0
    SofteningStarsMaxPhys: float = 0.0

    # --- SIDM (begrun.c:585-625; compile flags folded to runtime) ---
    SIDMOn: int = 1                     # Makefile OPT -DSIDM
    CrossSection: float = 0.0           # cm^2/g (1/h cm^2/g comoving)
    RandomSeed1: int = 42
    RandomSeed2: int = 0
    ProbabilityTol: float = 0.2
    CrossSectionType: int = 0           # Makefile CROSS_SECTION_TYPE=0..4
    YukawaVelocity: float = 0.0         # types 2,4
    CrossSectionVelScale: float = 1.0   # type 3
    CrossSectionPowLaw: float = 0.0     # type 3
    NoScatter: int = 0                  # Makefile -DNOSCATTER
    ScatterLog: int = 0                 # Makefile -DSCATTERLOG
    FindNbrLog: int = 0                 # Makefile -DFINDNBRLOG

    # --- optional physics flags (compile-time in the reference) ---
    ReflectionBoundary: float = 0.0     # Makefile -DREFLECTIONBOUNDARY + tag
    NoForce: int = 0                    # Makefile NOFORCE
    VelDispOn: int = 0                  # Makefile -DVELDISP

    # --- TPU-build extensions (absent from the reference grammar; all have
    #     defaults so reference files parse unchanged) ---
    ForceMethod: str = "tree"           # "tree" | "tree_legacy" | "direct"
    Precision: str = "f32"              # "f32" | "f64"
    SnapFormatOut: int = 1              # Gadget format-1 output
    EwaldGridSize: int = 64             # ewald.c EN=64
    # TreePM periodic gravity (ops/pm.py): the Ewald sum is split into a
    # screened short-range force in the tree walk plus a k-space mesh
    # solve, replacing the reference's per-interaction Ewald table
    # lookups. PMGrid: 0 = auto mesh size (~2 N^(1/3), pow2 in [64,512]),
    # -1 = legacy per-pair Ewald walk, >0 = explicit mesh size.
    PMGrid: int = 0
    PMAsmth: float = 2.0                # split scale in mesh cells
    PMRcutFac: float = 6.0              # short-range cutoff / (asmth h)
    PMInterlace: int = 1                # half-cell interlaced deposit+gather
    # Vacuum (isolated) TreePM: zero-padded free-space mesh for the far
    # field of NON-periodic tree runs (ops/pm.py build_pm_kernel_free).
    # The tree walk truncates at rcut, so frontier and interaction lists
    # collapse to the local ball. 0 = off (pure tree far field).
    PMVacuum: int = 0
    # Tree-walk execution schedule: "fused" = per-block frontier loops
    # (ops/fused_force.py), "wq" = flattened work-queue items
    # (ops/wq_force.py). Identical physics/pair sets; perf knob only.
    TreeWalkEngine: str = "fused"
    # Cached interaction lists (ops/list_force.py): record the walk's
    # accept/open classification once per tree rebuild under a Verlet-style
    # displacement skin, then evaluate forces each step straight off the
    # lists (no per-step walk). 0 disables (re-walk every step).
    ListMode: int = 1
    ListFarCap: int = 8192              # per-group far (multipole) entries
    ListNearCap: int = 5120             # per-group near (segment) entries
    # SPH engine for the phased (large-N) driver: "cell" = hashed
    # cell-list (ops/sph.py; its candidate cap can overflow in dense
    # regions), "fused" = tree-segment range walk sharing the force
    # octree (ops/fused_sph.py), "auto" = fused whenever the force tree
    # is available. The synchronized small-N step always uses "cell".
    SphEngine: str = "auto"
    # Multi-chip distributed mode (parallel/step.py): "replicated" =
    # all-gather + full tree on every device with group-sharded targets
    # + psum (the throughput default); "ring" = local per-shard octrees
    # with target bunches circulating over a ppermute ring
    # (gravtree.c:171-222's design) — per-device memory O(N/nsh), needed
    # once N no longer fits one device. Ring mode with SIDM requires
    # SidmHaloCap > 0 (the halo-exchange DSMC engine, parallel/halo.py).
    ShardedGravity: str = "replicated"
    SidmHaloCap: int = 0                # >0: halo-exchange DSMC capacity
    SidmEventCap: int = 2048            # cross-shard recoil event rows

    # --- derived (set by set_units / read_ic; not parameter-file tags) ---
    OutputListTimes: List[float] = field(default_factory=list)

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


# Tags whose reference counterpart is a string / int / float, keyed by tag name.
# Order matters only for the parameters_out echo.
_FIELD_TYPES = {f.name: f.type for f in dataclasses.fields(SimConfig)}

# Tags accepted in a parameter file. "ReflectionBoundary" maps to the field of
# the same name (the reference stores it in All.ReflectionRadius,
# begrun.c:604-608); RandomSeed1/2 map to All.Seed1/Seed2 (begrun.c:592-598).
_PARAM_TAGS = {name for name in _FIELD_TYPES if name not in ("OutputListTimes",)}

# Tags that a *reference* parameter file must provide (everything the reference
# registers unconditionally, begrun.c:305-584). Extensions and folded
# compile-flags are optional.
_OPTIONAL_TAGS = {
    "SIDMOn", "CrossSection", "RandomSeed1", "RandomSeed2", "ProbabilityTol",
    "CrossSectionType", "YukawaVelocity", "CrossSectionVelScale",
    "CrossSectionPowLaw", "NoScatter", "ScatterLog", "FindNbrLog",
    "ReflectionBoundary", "NoForce", "VelDispOn",
    "ForceMethod", "Precision", "SnapFormatOut", "EwaldGridSize",
    "TreeRefreshSteps", "PMGrid", "PMAsmth", "PMRcutFac", "PMInterlace",
    "TreeWalkEngine", "SphEngine", "ListMode", "ListFarCap", "ListNearCap",
    "PMVacuum", "ShardedGravity", "SidmHaloCap", "SidmEventCap",
}


class ParameterError(ValueError):
    pass


def parse_parameter_file(path: str, strict: bool = True) -> SimConfig:
    """Parse a GADGET-style keyword-value parameter file.

    Grammar per begrun.c:694-727: first whitespace-separated token is the tag,
    second is the value, ``%`` (and ``;``/``#`` inline) start comments, unknown
    or duplicate tags are errors, missing required tags are errors.
    """
    values = {}
    seen = set()
    errors = []
    with open(path) as f:
        for raw in f:
            line = raw.split("%")[0]
            parts = line.split()
            if len(parts) < 2:
                continue
            tag, val = parts[0], parts[1]
            if tag.startswith("%") or tag.startswith(";") or tag.startswith("#"):
                continue
            # strip inline ';'/'#' comments attached to the value position
            if val.startswith(";") or val.startswith("#"):
                continue
            if tag not in _PARAM_TAGS:
                errors.append(f"Tag '{tag}' not allowed")
                continue
            if tag in seen:
                errors.append(f"Tag '{tag}' multiply defined")
                continue
            seen.add(tag)
            values[tag] = _convert(tag, val)

    if strict:
        missing = (_PARAM_TAGS - _OPTIONAL_TAGS) - seen
        for tag in sorted(missing):
            errors.append(f"missing a value for tag '{tag}'")
    if errors:
        raise ParameterError("; ".join(errors))

    cfg = SimConfig(**values)
    cfg = _validate(cfg)

    if cfg.OutputListOn:
        cfg = cfg.replace(OutputListTimes=_read_outputlist(cfg.OutputListFilename))
    return cfg


def _convert(tag: str, val: str):
    t = _FIELD_TYPES[tag]
    if t in ("str", str):
        return val
    if t in ("int", int):
        return int(float(val))
    return float(val)


def _validate(cfg: SimConfig) -> SimConfig:
    """Cross-checks mirroring begrun.c:763-904."""
    if cfg.OutputDir and not cfg.OutputDir.endswith("/"):
        cfg = cfg.replace(OutputDir=cfg.OutputDir + "/")
    if cfg.PeriodicBoundariesOn and cfg.BoxSize <= 0:
        raise ParameterError("PeriodicBoundariesOn requires BoxSize > 0")
    if cfg.TypeOfTimestepCriterion in (2, 3, 4) and not (cfg.VelDispOn or cfg.SIDMOn):
        raise ParameterError(
            "TypeOfTimestepCriterion 2-4 needs velocity-dispersion data "
            "(VelDispOn or SIDMOn)")
    if cfg.SIDMOn and cfg.VelDispOn:
        raise ParameterError("VELDISP cannot be used with SIDM (sidm.c:14-16)")
    if cfg.CrossSectionType not in (0, 1, 2, 3, 4):
        raise ParameterError("CrossSectionType must be 0..4")
    if cfg.CrossSectionType in (2, 4) and cfg.YukawaVelocity <= 0 and cfg.SIDMOn:
        raise ParameterError("CrossSectionType 2/4 requires YukawaVelocity > 0")
    if cfg.Precision not in ("f32", "f64"):
        raise ParameterError("Precision must be f32 or f64")
    if cfg.ForceMethod not in ("tree", "tree_legacy", "direct"):
        raise ParameterError(
            "ForceMethod must be tree, tree_legacy or direct")
    return cfg


def _read_outputlist(path: str) -> List[float]:
    """Read snapshot output times, one per line (begrun.c read_outputlist)."""
    times = []
    with open(path) as f:
        for line in f:
            line = line.split("%")[0].strip()
            if line:
                times.append(float(line.split()[0]))
    return sorted(times)


def write_parameters_out(cfg: SimConfig, directory: Optional[str] = None) -> str:
    """Echo used values to <OutputDir>/parameters_out (begrun.c:708-710)."""
    directory = directory or cfg.OutputDir
    os.makedirs(directory, exist_ok=True)
    out = os.path.join(directory, "parameters_out")
    with open(out, "w") as f:
        for fld in dataclasses.fields(cfg):
            if fld.name == "OutputListTimes":
                continue
            v = getattr(cfg, fld.name)
            f.write(f"{fld.name:<35}{v}\n")
    return out


@dataclass(frozen=True)
class Units:
    """Internal-unit conversion factors (begrun.c set_units, :132-205)."""

    UnitLength_in_cm: float
    UnitMass_in_g: float
    UnitVelocity_in_cm_per_s: float
    UnitTime_in_s: float
    UnitTime_in_Megayears: float
    UnitDensity_in_cgs: float
    UnitPressure_in_cgs: float
    UnitEnergy_in_cgs: float
    G: float
    Hubble: float
    CrossSectionInternal: float
    MinEgySpec: float


def set_units(cfg: SimConfig) -> Units:
    ul, um, uv = cfg.UnitLength_in_cm, cfg.UnitMass_in_g, cfg.UnitVelocity_in_cm_per_s
    ut = ul / uv
    if cfg.GravityConstantInternal == 0:
        G = GRAVITY_CGS / ul**3 * um * ut**2
    else:
        G = cfg.GravityConstantInternal
    unit_density = um / ul**3
    unit_pressure = um / ul / ut**2
    unit_energy = um * ul**2 / ut**2
    hubble = HUBBLE_CGS * ut
    # CrossSection is cm^2/g; internal = sigma * m_unit / l_unit^2 (begrun.c:156)
    cross_internal = cfg.CrossSection * um / ul**2
    min_egy = (1.0 / GAMMA_MINUS1) * (BOLTZMANN_CGS / PROTONMASS_CGS) * cfg.MinGasTemp
    min_egy *= um / unit_energy
    return Units(
        UnitLength_in_cm=ul,
        UnitMass_in_g=um,
        UnitVelocity_in_cm_per_s=uv,
        UnitTime_in_s=ut,
        UnitTime_in_Megayears=ut / SEC_PER_MEGAYEAR,
        UnitDensity_in_cgs=unit_density,
        UnitPressure_in_cgs=unit_pressure,
        UnitEnergy_in_cgs=unit_energy,
        G=G,
        Hubble=hubble,
        CrossSectionInternal=cross_internal,
        MinEgySpec=min_egy,
    )
