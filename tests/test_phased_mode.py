"""The phased step path (production path for large N: fused gravity +
fused-range SIDM sharing one tree) on a small system.

The threshold normally routes small N through the one-executable step, so
this forces mode="phased" to cover the large-N pipeline in CI sizes
(the reference's equivalent is just running sidm-gadget; run.c:34-209).
"""

import numpy as np
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
