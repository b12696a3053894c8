"""Driver features: individual timesteps, SIDM end-to-end, scatter log,
snapshot scheduling, CLI parity."""

import glob
import os

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.config import SimConfig
from sidm_tpu.io import ics
from sidm_tpu.io.gadget import read_snapshot
from sidm_tpu.simulation import Simulation


def _halo_cfg(**kw):
    d = dict(GravityConstantInternal=1.0, ForceMethod="direct",
             TypeOfTimestepCriterion=1, ErrTolVelScale=0.05,
             MaxSizeTimestep=0.05, TimeBegin=0.0, TimeMax=1.0,
             SofteningHalo=0.05, SofteningHaloMaxPhys=0.05,
             UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
             UnitVelocity_in_cm_per_s=1.0,
             SIDMOn=0, DesNumNgb=16, MaxNumNgbDeviation=2)
    d.update(kw)
    return SimConfig(**d)


def test_individual_timestep_mode_conserves_energy():
    """'individual' mode: only due particles advance (timeline semantics)."""
    from sidm_tpu.diagnostics import compute_system_state
    cfg = _halo_cfg(TimeMax=1.5, ErrTolVelScale=0.04)
    pos, vel, mass = ics.plummer(192, seed=11)
    sim = Simulation(cfg, mode="individual")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(192, np.int32),
                                  pad_to_multiple=64)
    sim.prepare()
    sim.compute_potential()
    s0 = compute_system_state(sim.particles)
    e0 = float(s0.energy_kin + s0.energy_pot)

    n_active_counts = []
    for _ in range(200):
        if sim.time >= 1.0:
            break
        _, n_active, _ = sim.step()
        n_active_counts.append(n_active)
    # individual mode must have at least some partially-active steps
    assert min(n_active_counts) < 192

    sim.compute_potential()
    s1 = compute_system_state(sim.particles)
    e1 = float(s1.energy_kin + s1.energy_pot)
    assert abs(e1 - e0) / abs(e0) < 0.05


def test_sidm_halo_end_to_end_and_scatterlog(tmp_path):
    """SIDM on: scattering events occur, are logged, and conserve energy."""
    cfg = _halo_cfg(
        SIDMOn=1, CrossSection=30.0, ProbabilityTol=0.2, ScatterLog=1,
        FindNbrLog=0, OutputDir=str(tmp_path), TimeMax=2.0,
        RandomSeed1=7, RandomSeed2=77)
    pos, vel, mass = ics.plummer(512, seed=13)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(512, np.int32),
                                  pad_to_multiple=512)
    sim.prepare()
    total_scat = 0
    for _ in range(25):
        _, _, n_scat = sim.step()
        total_scat += n_scat
    assert total_scat > 0, "expected some scattering events"
    # scatter log written with 20-float records
    # [time, id1, id2, h1, h2, x1(3), x2(3), v1(3), v2(3), dv(3)]
    logs = glob.glob(os.path.join(str(tmp_path), "sct_*"))
    assert logs
    rec = np.fromfile(logs[0], np.float32)
    assert rec.size % 20 == 0 and rec.size // 20 == total_scat
    rec = rec.reshape(-1, 20)
    # ids are nonzero and distinct; |dv| > 0
    assert (rec[:, 1] != rec[:, 2]).all()
    assert (np.linalg.norm(rec[:, 17:20], axis=1) > 0).all()


def test_snapshot_cadence(tmp_path):
    cfg = _halo_cfg(OutputDir=str(tmp_path), TimeMax=0.5,
                    TimeBetSnapshot=0.2, TimeOfFirstSnapshot=0.0,
                    TimeBetStatistics=0.25, CpuTimeBetRestartFile=1e9)
    pos, vel, mass = ics.plummer(128, seed=17)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(128, np.int32),
                                  pad_to_multiple=128)
    sim.run()
    snaps = sorted(glob.glob(os.path.join(str(tmp_path), "snp_*")))
    assert len(snaps) >= 3  # t=0, 0.2, 0.4 + final
    s0 = read_snapshot(snaps[0])
    assert s0.n == 128
    # energy log written
    assert os.path.getsize(os.path.join(str(tmp_path), "energy_out")) > 0
    assert os.path.getsize(os.path.join(str(tmp_path), "cpu_out")) > 0


def test_stop_file_interrupts(tmp_path):
    cfg = _halo_cfg(OutputDir=str(tmp_path), TimeMax=50.0,
                    CpuTimeBetRestartFile=1e9)
    pos, vel, mass = ics.plummer(64, seed=19)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(64, np.int32),
                                  pad_to_multiple=64)
    sim.prepare()
    with open(os.path.join(str(tmp_path), "stop"), "w") as f:
        f.write("")
    sim.run()
    assert sim.time < 50.0  # interrupted early
    # restart file written on interruption (run.c:185-202)
    assert os.path.exists(os.path.join(str(tmp_path), "rst_out.npz"))


def test_veldisp_and_criterion_4(tmp_path):
    """VELDISP: local sigma_v / density estimates power criteria 2-4
    (veldisp.c:17-257, timestep.c:163-224)."""
    cfg = _halo_cfg(VelDispOn=1, TypeOfTimestepCriterion=4,
                    ErrTolIntAccuracy=0.2, TimeMax=0.5)
    pos, vel, mass = ics.plummer(256, seed=23)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(256, np.int32),
                                  pad_to_multiple=256)
    sim.prepare()
    for _ in range(3):
        sim.step()
    vd = np.asarray(sim.particles.vel_disp)[:256]
    rho = np.asarray(sim.particles.dens_vd)[:256]
    assert (vd > 0).all() and np.isfinite(vd).all()
    assert (rho > 0).all() and np.isfinite(rho).all()
    # central particles should have higher density and dispersion
    r = np.linalg.norm(pos, axis=1)
    inner, outer = r < np.percentile(r, 20), r > np.percentile(r, 80)
    assert rho[inner].mean() > 5 * rho[outer].mean()
    assert sim.time > 0


def test_f64_precision_end_to_end():
    """Precision f64 (the reference is all-double) runs the full fused
    SIDM step in float64 without dtype-promotion hazards."""
    import warnings

    import jax

    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.simulation import Simulation

    jax.config.update("jax_enable_x64", True)
    try:
        cfg = SimConfig(GravityConstantInternal=1.0, Precision="f64",
                        UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
                        UnitVelocity_in_cm_per_s=1.0,
                        ForceMethod="tree", TypeOfTimestepCriterion=0,
                        ErrTolIntAccuracy=0.05,
                        MaxSizeTimestep=0.01, TimeBegin=0.0, TimeMax=0.02,
                        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05,
                        SIDMOn=1, CrossSection=2.0, DesNumNgb=16,
                        MaxNumNgbDeviation=2, ProbabilityTol=0.2)
        n = 512
        pos, vel, mass = ics.plummer(n, seed=3)
        sim = Simulation(cfg, mode="synchronized")
        sim.set_particles_from_arrays(pos, vel, mass,
                                      np.ones(n, np.int32),
                                      pad_to_multiple=256)
        with warnings.catch_warnings():
            warnings.simplefilter("error", FutureWarning)
            sim.prepare()
            sim.step()
        assert sim.particles.pos.dtype == jnp.float64
        assert bool(np.isfinite(np.asarray(sim.particles.pos)).all())
    finally:
        jax.config.update("jax_enable_x64", False)
