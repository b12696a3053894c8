"""The phased step path (production path for large N: fused gravity +
fused-range SIDM sharing one tree) on a small system.

The threshold normally routes small N through the one-executable step, so
this forces mode="phased" to cover the large-N pipeline in CI sizes
(the reference's equivalent is just running sidm-gadget; run.c:34-209).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.config import SimConfig
from sidm_tpu.io import ics
from sidm_tpu.simulation import Simulation


def _sim(n=1024, sigma=30.0):
    cfg = SimConfig(
        SIDMOn=1, CrossSection=sigma, ProbabilityTol=0.2,
        RandomSeed1=42, RandomSeed2=137,
        ForceMethod="tree", ErrTolTheta=0.5, TypeOfOpeningCriterion=0,
        TypeOfTimestepCriterion=0, ErrTolIntAccuracy=0.05,
        MaxSizeTimestep=0.02, TimeBegin=0.0, TimeMax=1.0,
        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05,
        DesNumNgb=30, MaxNumNgbDeviation=2,
        UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
        UnitVelocity_in_cm_per_s=1.0, GravityConstantInternal=1.0)
    pos, vel, m = ics.plummer(n, seed=9)
    sim = Simulation(cfg, mode="phased", quiet=True)
    sim.set_particles_from_arrays(pos, vel, m, np.ones(n, np.int32),
                                  pad_to_multiple=n)
    return sim


@pytest.mark.slow
def test_phased_step_runs_and_conserves():
    sim = _sim()
    sim.prepare()
    p0 = sim.particles
    mom0 = np.asarray(jnp.sum(p0.mass[:, None] * p0.vel, axis=0))
    n_scat = 0
    for _ in range(5):
        dt, n_active, ns = sim.step()
        assert dt > 0
        n_scat += ns
    p = sim.particles
    assert np.all(np.isfinite(np.asarray(p.pos)))
    assert np.all(np.isfinite(np.asarray(p.vel)))
    mom1 = np.asarray(jnp.sum(p.mass[:, None] * p.vel, axis=0))
    scale = float(jnp.mean(jnp.linalg.norm(p.vel, axis=1) * p.mass))
    assert np.linalg.norm(mom1 - mom0) < 1e-3 * scale * p0.n_padded
    # with sigma/m this large on a compact Plummer sphere, scattering
    # must actually happen within a few steps
    assert n_scat > 0


def test_phased_gas_matches_synchronized():
    """The phased driver runs the SPH phase (density + hydro) and matches
    the single-jit synchronized step to float noise on a mixed gas+DM
    Plummer sphere (the reference's accel.c:71-116 gas half)."""
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.simulation import Simulation

    def run(mode, sph_engine="cell"):
        cfg = SimConfig(GravityConstantInternal=1.0,
                        UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
                        UnitVelocity_in_cm_per_s=1.0,
                        ForceMethod="tree", TypeOfTimestepCriterion=0,
                        ErrTolIntAccuracy=0.05, CourantFac=0.15,
                        MaxSizeTimestep=0.01, TimeBegin=0.0, TimeMax=0.03,
                        SofteningGas=0.05, SofteningGasMaxPhys=0.05,
                        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05,
                        DesNumNgb=16, MaxNumNgbDeviation=2,
                        InitGasTemp=100.0, SphEngine=sph_engine)
        n = 1024
        pos, vel, mass = ics.plummer(n, seed=3)
        sim = Simulation(cfg, mode=mode)
        ptype = np.where(np.arange(n) < n // 2, 0, 1).astype(np.int32)
        sim.set_particles_from_arrays(pos, vel, mass, ptype,
                                      pad_to_multiple=256)
        sim.prepare()
        for _ in range(3):
            sim.step()
        return (np.asarray(sim.particles.pos),
                np.asarray(sim.particles.egy_spec))

    # same (cell) engine in both modes: the phase plumbing must reproduce
    # the single-jit step to float noise
    p1, u1 = run("synchronized")
    p2, u2 = run("phased")
    np.testing.assert_allclose(p1, p2, atol=5e-6)
    np.testing.assert_allclose(u1, u2, rtol=1e-4, atol=1e-4)

    # the production default (SphEngine auto -> fused tree-segment engine,
    # oracle-tested against float64 brute force in test_fused_sph.py)
    # integrates the same physics but determines hsml by a multiplicative
    # count controller instead of exact kNN — different h means different
    # (valid) SPH estimates, and the trajectories separate at the system's
    # Lyapunov rate. Only coarse agreement is meaningful here; the per-step
    # physics is covered by the oracle tests.
    p3, u3 = run("phased", sph_engine="auto")
    assert np.all(np.isfinite(p3)) and np.all(np.isfinite(u3))
    assert np.percentile(np.abs(p3 - p1), 99) < 0.05
    assert np.percentile(np.abs(u3 - u1), 99) < 0.1 * max(np.abs(u1).max(),
                                                          1e-3)


def test_phased_veldisp_matches_synchronized():
    """VELDISP (timestep criteria 2-4) runs as a phase in the phased
    driver and matches the single-jit step to float noise."""
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.simulation import Simulation

    def run(mode):
        cfg = SimConfig(GravityConstantInternal=1.0,
                        UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
                        UnitVelocity_in_cm_per_s=1.0,
                        ForceMethod="tree", VelDispOn=1,
                        TypeOfTimestepCriterion=2,
                        ErrTolDynamicalAccuracy=0.02, ErrTolVelScale=10.0,
                        MaxSizeTimestep=0.01, TimeBegin=0.0, TimeMax=0.03,
                        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05,
                        DesNumNgb=16, MaxNumNgbDeviation=2)
        n = 1024
        pos, vel, mass = ics.plummer(n, seed=3)
        sim = Simulation(cfg, mode=mode)
        sim.set_particles_from_arrays(pos, vel, mass,
                                      np.ones(n, np.int32),
                                      pad_to_multiple=256)
        sim.prepare()
        for _ in range(3):
            sim.step()
        return (np.asarray(sim.particles.pos),
                np.asarray(sim.particles.vel_disp))

    p1, v1 = run("synchronized")
    p2, v2 = run("phased")
    np.testing.assert_allclose(p1, p2, atol=5e-6)
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_phased_periodic_treepm_runs():
    """Phased periodic run: TreePM force + lazy refreshed box tree +
    min-image fused SIDM walk compose; momentum conserved, state finite."""
    from sidm_tpu.config import SimConfig
    from sidm_tpu.simulation import Simulation

    box = 50.0
    n = 2048
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    pos[:n // 2] = (25.0 + rng.standard_normal((n // 2, 3)) * 3.0) % box
    vel = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    cfg = SimConfig(GravityConstantInternal=1.0,
                    UnitLength_in_cm=1.0, UnitMass_in_g=1.0,
                    UnitVelocity_in_cm_per_s=1.0,
                    ForceMethod="tree", TypeOfTimestepCriterion=0,
                    ErrTolIntAccuracy=0.05,
                    PeriodicBoundariesOn=1, BoxSize=box, PMGrid=32,
                    MaxSizeTimestep=0.05, TimeBegin=0.0, TimeMax=0.2,
                    SofteningHalo=0.1, SofteningHaloMaxPhys=0.1,
                    SIDMOn=1, CrossSection=10.0, DesNumNgb=16,
                    MaxNumNgbDeviation=2, ProbabilityTol=0.2,
                    TreeRefreshSteps=3)
    sim = Simulation(cfg, mode="phased")
    sim.set_particles_from_arrays(pos, vel, np.full(n, 1.0 / n),
                                  np.ones(n, np.int32),
                                  pad_to_multiple=256)
    sim.prepare()
    mom0 = np.sum(np.asarray(sim.particles.vel)
                  * np.asarray(sim.particles.mass)[:, None], axis=0)
    for _ in range(4):
        sim.step()
    p = sim.particles
    assert bool(np.isfinite(np.asarray(p.pos)).all())
    assert bool(np.isfinite(np.asarray(p.vel)).all())
    mom1 = np.sum(np.asarray(p.vel) * np.asarray(p.mass)[:, None], axis=0)
    # SIDM kicks are pairwise momentum-exact; gravity kicks sum to ~0
    np.testing.assert_allclose(mom1, mom0, atol=5e-4)
