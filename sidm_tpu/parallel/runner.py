"""Multi-chip run loop: sharded stepping + in-run domain re-decomposition.

The reference re-balances its domains whenever enough force work has
accumulated (run.c:119-147 -> domain_Decomposition(), domain.c:31-145),
migrating particles between ranks with explicit MPI transfers. The TPU
analog implemented here:

* domains ARE contiguous index ranges of the globally Morton-sorted
  particle order (parallel/mesh.py) — equal-count static shards, as XLA
  requires static shapes;
* re-decomposition is ONE distributed sort: a jit over the mesh that
  re-computes Morton keys and globally argsorts the particle pytree.
  XLA lowers the sharded sort + take to its collective sort / all-to-all
  machinery — there is no hand-written migration protocol to get wrong;
* every physics kernel is permutation-invariant (the force path
  re-sorts internally, the DSMC RNG is keyed by particle id, time
  integration is elementwise), so resharding is physics-transparent —
  verified by tests/test_parallel.py::test_reshard_run_invariant;
* cadence: like the reference's NumForcesSinceLastDomainDecomp
  threshold (run.c:119-147), the runner reshards every
  ``reshard_every`` steps. Load balance inside a shard window is handled
  by the engines' density-sorted strided group scheduling
  (fused_force.fused_gravity_tree shard mode) — the static-schedule
  replacement for GravCost bisection (domain.c:154-441): equal-count
  shards can hold unequal WORK, but the walk work is balanced per
  group-block round-robin, which tracks the measured cost ordering.
"""

from __future__ import annotations

import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..state import Particles
from .mesh import make_mesh, shard_particles


def make_reshard(mesh, box: float = 0.0):
    """jit-compiled global Morton re-sort of a sharded Particles pytree.

    Padding rows (ptype < 0) sort to the end, exactly as make_particles
    lays them out at load time. Output keeps the same axis-0 sharding, so
    the compiled program is a distributed sort + all-to-all — the
    domain_Decomposition() analog with zero host involvement."""
    from ..ops.morton import bounding_cube, morton_keys

    # no explicit out_shardings: the inputs carry the axis-0 sharding and
    # XLA propagates it through the sort/take (inserting the all-to-all)

    @jax.jit
    def reshard(p: Particles) -> Particles:
        origin, extent = bounding_cube(p.pos, p.valid, box=box)
        keys = morton_keys(p.pos, origin, extent)
        keys = jnp.where(p.valid, keys,
                         jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keys)
        return jax.tree.map(lambda x: jnp.take(x, order, axis=0), p)

    return reshard


def shard_window_histogram(p: Particles, mesh, box: float = 0.0):
    """Diagnostic: how many particles currently sit OUTSIDE the shard
    window that holds them (i.e. would migrate on the next reshard).
    The runner's reshard-cadence telemetry."""
    from ..ops.morton import bounding_cube, morton_keys

    pos = np.asarray(p.pos)
    valid = np.asarray(p.valid)
    n = pos.shape[0]
    nsh = mesh.devices.size
    posj = jnp.asarray(pos)
    origin, extent = bounding_cube(posj, jnp.asarray(valid), box=box)
    keys = np.asarray(morton_keys(posj, origin, extent))
    keys = np.where(valid, keys, np.uint32(0xFFFFFFFF))
    order = np.argsort(keys, kind="stable")
    new_shard = np.empty(n, np.int32)
    new_shard[order] = np.arange(n) // (n // nsh)
    cur_shard = np.arange(n) // (n // nsh)
    return int(np.sum((new_shard != cur_shard) & valid))


class MultichipRunner:
    """Sharded run loop — the run.c:17-221 analog for a device mesh.

    Wraps a prepared single-chip Simulation for its configuration and
    initial state; all stepping then happens sharded. Beyond the bare
    step + reshard loop this carries the reference run()'s host duties:
    energy statistics (run.c:51-59), snapshot scheduling (run.c:61-74),
    restart dumps / stop-file / CPU-limit interruption (run.c:152-211),
    and the FdInfo/FdCPU/FdTimings logs — reusing the Simulation's I/O
    machinery on a host-gathered copy of the sharded state at each
    event (events are rare; steps never leave the device mesh).

    Domain re-decomposition follows the reference's cadence rule
    (run.c:119-147): a reshard fires once the accumulated active-force
    count exceeds TotNumPart * DomainUpdateFrequency (``reshard_every``
    overrides with a fixed step period when given).

    Individual timesteps: ``sim.mode == "individual"`` turns off the
    global min-sync in the sharded step; the timeline reduction is the
    lax.pmin in parallel/step.py (timeline.c:38's Allreduce MIN analog).
    """

    def __init__(self, sim, mesh=None, reshard_every: int = 0):
        from .step import make_multichip_step

        self.mesh = mesh or make_mesh()
        self.sim = sim
        self.reshard_every = int(reshard_every)
        cfg = sim.cfg
        box = cfg.BoxSize if cfg.PeriodicBoundariesOn else 0.0
        self.box = box
        sidm_params = (sim._sidm_params_for_phased()
                       if cfg.SIDMOn and cfg.CrossSection > 0 else None)
        self._step = jax.jit(make_multichip_step(
            self.mesh, sim.consts, sim._timestep_params(),
            theta=cfg.ErrTolTheta, opening=cfg.TypeOfOpeningCriterion,
            err_tol_force_acc=cfg.ErrTolForceAcc,
            sidm_params=sidm_params, box=box or None,
            synchronized=(sim.mode != "individual"),
            time_max=cfg.TimeMax,
            gravity=cfg.ShardedGravity,
            sidm_halo_cap=int(cfg.SidmHaloCap),
            sidm_event_cap=int(cfg.SidmEventCap)))
        self._reshard = make_reshard(self.mesh, box=box)
        self.particles = shard_particles(sim.particles, self.mesh)
        self.vmax = jnp.asarray(sim.vmax, jnp.float32)
        self.time = sim.time
        self.step_count = 0
        self.migrated_last_reshard = 0
        self.overflow_flags = 0
        self.overflow_steps = 0
        self.forces_since_domain = 0
        self.n_total = int(np.sum(np.asarray(sim.particles.valid)))

    # ------------------------------------------------------------ events

    def _sync_sim(self):
        """Pull the sharded state back into the wrapped Simulation (host
        copy) so its I/O machinery (snapshots, restart, potential) can
        run unchanged — the io.c master-funnel analog."""
        host = jax.tree.map(np.asarray, self.particles)
        import dataclasses as _dc
        self.sim.particles = type(host)(
            **{f.name: jnp.asarray(getattr(host, f.name))
               for f in _dc.fields(type(host))})
        self.sim.time = self.time
        self.sim.vmax = float(self.vmax)
        self.sim.step_count = self.step_count

    def energy_statistics(self):
        self._sync_sim()
        return self.sim.energy_statistics()

    def write_snapshot_file(self, count: int):
        self._sync_sim()
        return self.sim.write_snapshot_file(count)

    def write_restart_file(self):
        self._sync_sim()
        return self.sim.write_restart_file()

    def _should_reshard(self) -> bool:
        if self.step_count == 0:
            return False
        if self.reshard_every > 0:
            return self.step_count % self.reshard_every == 0
        # run.c:119-147: NumForcesSinceLastDomainDecomp threshold
        duf = max(float(self.sim.cfg.DomainUpdateFrequency), 1e-3)
        return self.forces_since_domain > self.n_total * duf

    def step(self):
        from ..rng import step_key

        if self._should_reshard():
            t0 = _time.perf_counter()
            self.migrated_last_reshard = shard_window_histogram(
                self.particles, self.mesh, box=self.box)
            self.particles = self._reshard(self.particles)
            self.forces_since_domain = 0
            log = getattr(self, "cpu_log", None)
            if log is not None:
                jax.block_until_ready(self.particles.pos)
                log.add("Domain", _time.perf_counter() - t0)
        key = step_key(self.sim.root_key, self.step_count)
        p, t, vmax, n_active, flags = self._step(self.particles, self.vmax,
                                                 key)
        self.particles, self.vmax = p, vmax
        self.time = float(t)
        self.step_count += 1
        self.forces_since_domain += int(n_active)
        # Surface halo-engine overflow (bit 1=halo cap, 2=event cap,
        # 4=window): static caps are telemetered, never silent.
        self.overflow_flags = int(flags)
        if self.overflow_flags:
            self.overflow_steps += 1
            import warnings
            warnings.warn(
                f"sharded SIDM overflow flags={self.overflow_flags} at "
                f"step {self.step_count} (1=halo cap, 2=event cap, "
                f"4=window); results may drop scatterings — raise "
                f"sidm_halo_cap / sidm_event_cap", stacklevel=2)
        return self.time, int(n_active)

    def run(self, n_steps: int):
        for _ in range(n_steps):
            self.step()
        return self.particles

    def run_sim(self, max_steps=None):
        """Full production loop — the multi-chip twin of Simulation.run()
        (run.c:17-221): statistics/snapshot cadence, per-step logs,
        stop-file and CPU-limit interruption, restart dumps, final
        snapshot."""
        from ..constants import MAX_REAL_NUMBER
        from ..io import checkpoint as ckpt

        sim = self.sim
        cfg = sim.cfg
        if not sim._logs_open:
            sim._open_logs(append=sim.restart_flag == 1)
        self.cpu_log = sim.cpu_log
        stop = False
        while self.time < cfg.TimeMax and not stop:
            if max_steps is not None and self.step_count >= max_steps:
                break
            t0 = _time.perf_counter()

            if (cfg.TimeBetStatistics > 0 and
                    self.time - sim.time_last_statistics
                    >= cfg.TimeBetStatistics):
                self.energy_statistics()
                sim.time_last_statistics += cfg.TimeBetStatistics

            if cfg.TimeBetSnapshot > 0 and \
                    self.time - sim.time_of_first_snapshot >= 0:
                t_sn = _time.perf_counter()
                self.write_snapshot_file(sim.snapshot_count)
                sim.cpu_log.add("Snapshot", _time.perf_counter() - t_sn)
                sim.snapshot_count += 1
                if cfg.OutputListOn and cfg.OutputListTimes:
                    nxt = [t for t in cfg.OutputListTimes if t > self.time]
                    sim.time_of_first_snapshot = (nxt[0] if nxt
                                                  else MAX_REAL_NUMBER)
                elif cfg.ComovingIntegrationOn:
                    sim.time_of_first_snapshot *= cfg.TimeBetSnapshot
                else:
                    sim.time_of_first_snapshot += cfg.TimeBetSnapshot

            prev_time = self.time
            _, n_active = self.step()
            jax.block_until_ready(self.particles.pos)
            step_wall = _time.perf_counter() - t0
            sim.cpu_this_run += step_wall
            sim.info_log.write(self.step_count, self.time, n_active,
                               self.time - prev_time)
            # the sharded step is ONE fused device program; its whole
            # wall time books under Gravity (the dominant phase), with
            # Domain filled by the reshard block above
            sim.cpu_log.add("Gravity", step_wall)
            sim.cpu_log.write(self.step_count, self.time,
                              n_tasks=self.mesh.devices.size)
            sim.timings_log.write(self.step_count, self.time, n_active,
                                  wall_s=step_wall)

            if ckpt.stopfile_present(cfg.OutputDir):
                stop = True
            if sim.cpu_this_run > 0.85 * cfg.TimeLimitCPU:
                stop = True
            if (sim.cpu_this_run - sim.time_last_restart
                    >= cfg.CpuTimeBetRestartFile):
                self.write_restart_file()
                sim.time_last_restart = sim.cpu_this_run

        self.write_restart_file()
        if self.time >= cfg.TimeMax:
            self.write_snapshot_file(sim.snapshot_count)
            sim.snapshot_count += 1
        return self.step_count
