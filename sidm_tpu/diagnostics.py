"""Global diagnostics: conserved quantities and the reference's log files.

``compute_system_state`` is the masked-segment-sum counterpart of
``compute_global_quantities_of_system`` (nbody/global.c:18-136): per-type
mass, kinetic/potential/internal energy, momentum, angular momentum and
center of mass; the MPI_Reduce becomes a jnp reduction (and a psum under
shard_map).

``EnergyLog``/``InfoLog``/``CpuLog`` reproduce the FdEnergy/FdInfo/FdCPU
file formats (run.c:230-330) so existing analysis tooling parses them.
"""

from __future__ import annotations

import os
import time as _time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .state import Particles, SystemState


def compute_system_state(p: Particles, pot: Optional[jnp.ndarray] = None,
                         n_types: int = 6) -> SystemState:
    """Per-type global sums. ``pot`` defaults to p.pot; kinetic energy uses
    current velocities (the caller predicts to the stats time first, as
    run.c:51-59 does)."""
    if pot is None:
        pot = p.pot
    t = jnp.clip(p.ptype, 0, n_types - 1)
    w = p.valid
    m = jnp.where(w, p.mass, 0.0)

    def bytype(x):
        return jnp.zeros(n_types, x.dtype).at[t].add(jnp.where(w, x, 0.0))

    def bytype3(x):  # (N,3)
        return jnp.zeros((n_types, 3), x.dtype).at[t].add(
            jnp.where(w[:, None], x, 0.0))

    v2 = jnp.sum(p.vel * p.vel, axis=-1)
    ekin = 0.5 * m * v2
    epot = 0.5 * m * pot
    eint = jnp.where(p.is_gas, m * p.egy_spec, 0.0)
    mom = m[:, None] * p.vel
    com = m[:, None] * p.pos
    ang = m[:, None] * jnp.cross(p.pos, p.vel)

    return SystemState(
        mass_comp=bytype(m),
        energy_kin_comp=bytype(ekin),
        energy_pot_comp=bytype(epot),
        energy_int_comp=bytype(eint),
        momentum_comp=bytype3(mom),
        ang_momentum_comp=bytype3(ang),
        center_of_mass_comp=bytype3(com),
    )


class EnergyLog:
    """FdEnergy writer (run.c:295-330 energy_statistics): one line per call —
    time, total int/pot/kin energies, then the per-component triples and the
    per-component masses (28 columns)."""

    def __init__(self, path: str, append: bool = False):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a" if append else "w")

    def write(self, time: float, sys: SystemState):
        s = sys
        eint = float(np.sum(np.asarray(s.energy_int_comp)))
        epot = float(np.sum(np.asarray(s.energy_pot_comp)))
        ekin = float(np.sum(np.asarray(s.energy_kin_comp)))
        cols = [time, eint, epot, ekin]
        for i in range(5):
            cols += [float(s.energy_int_comp[i]), float(s.energy_pot_comp[i]),
                     float(s.energy_kin_comp[i])]
        cols += [float(s.mass_comp[i]) for i in range(5)]
        self.f.write(" ".join(f"{c:g}" for c in cols) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class InfoLog:
    """FdInfo writer (run.c:236-241): step number, time, timestep."""

    def __init__(self, path: str, append: bool = False):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a" if append else "w")

    def write(self, step: int, time: float, n_active: int, dt: float):
        self.f.write(
            f"\nBegin Step {step}, Time: {time:g}, NumForceUpdate: {n_active}, "
            f"Systemstep: {dt:g}\n")
        self.f.flush()

    def close(self):
        self.f.close()


class CpuLog:
    """FdCPU writer (run.c:250-285): cumulative per-phase wall-clock buckets."""

    BUCKETS = ["Total", "Gravity", "Hydro", "Domain", "Potential", "Predict",
               "TimeLine", "Snapshot", "TreeWalk", "TreeConstruction",
               "CommSum", "Imbalance", "EnsureNgb", "Sidm", "Diagnostic"]

    def __init__(self, path: str, append: bool = False):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a" if append else "w")
        self.cpu = {b: 0.0 for b in self.BUCKETS}

    def add(self, bucket: str, seconds: float):
        self.cpu[bucket] += seconds
        self.cpu["Total"] += seconds if bucket != "Total" else 0.0

    def add_sub(self, bucket: str, seconds: float):
        """Informational sub-bucket (TreeWalk/TreeConstruction/...): the
        time is already counted in a primary bucket, so Total is not
        bumped (mirrors run.c:250-285 where Total is measured, not
        summed)."""
        self.cpu[bucket] += seconds

    def write(self, step: int, time: float, n_tasks: int = 1):
        self.f.write(f"Step {step}, Time: {time:g}, CPUs: {n_tasks}\n")
        self.f.write(" ".join(f"{self.cpu[b]:.2f}" for b in self.BUCKETS) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class Timer:
    """Wall-clock phase timer (system.c second()/timediff())."""

    def __init__(self, log: Optional[CpuLog], bucket: str):
        self.log, self.bucket = log, bucket

    def __enter__(self):
        self.t0 = _time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.log is not None:
            self.log.add(self.bucket, _time.perf_counter() - self.t0)
        return False


class TimingsLog:
    """FdTimings writer (DIAG, gravtree.c:331-404): per-step tree/force
    statistics — interaction counts per particle and throughput."""

    def __init__(self, path: str, append: bool = False):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a" if append else "w")

    def write(self, step: int, time: float, n_active: int,
              n_pairs: int = 0, n_segs: int = 0, wall_s: float = 0.0):
        per = (n_pairs + n_segs) / max(n_active, 1)
        rate = n_active / max(wall_s, 1e-9)
        self.f.write(f"Step= {step}  t= {time:g}  Nf= {n_active}\n")
        self.f.write(f"   inter/part: {per:.1f}  (nodes {n_pairs}, "
                     f"segs {n_segs})  part/sec: {rate:.5g}\n")
        self.f.flush()

    def close(self):
        self.f.close()
