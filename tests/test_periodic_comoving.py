"""Periodic-box and comoving-integration end-to-end checks (Config 3 class).

The comoving oracle: in comoving coordinates a uniform particle lattice in a
periodic box feels zero peculiar force (Ewald-corrected) and zero peculiar
velocity, so it must remain EXACTLY static while the scale factor advances —
this exercises the full comoving machinery (s(a) drifts, fac1/2/3 kick
transform, periodic wrap, Ewald correction) in one test.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.config import SimConfig
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.ewald import build_ewald_table
from sidm_tpu.ops.treeforce import tree_gravity
from sidm_tpu.simulation import Simulation


def _lattice(m_per_axis, box):
    g = (np.arange(m_per_axis) + 0.5) / m_per_axis * box
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([x, y, z], -1).reshape(-1, 3)


def test_tree_matches_direct_in_periodic_box(tmp_path):
    """Tree + Ewald vs direct + Ewald on a random periodic box."""
    rng = np.random.default_rng(4)
    n, box = 2048, 10.0
    # clustered: a uniform box has ~zero peculiar potential (degenerate
    # oracle); a clump makes PE O(G M^2 / r)
    pos = rng.uniform(0, box, (n, 3))
    pos[: n // 2] = 5.0 + rng.normal(0, 0.6, (n // 2, 3))
    pos = jnp.asarray(np.mod(pos, box), jnp.float32)
    mass = jnp.full(n, 1.0 / n, jnp.float32)
    eps = jnp.full(n, 0.05, jnp.float32)
    table = build_ewald_table(box, cache_dir=str(tmp_path))
    acc_t, pot_t = tree_gravity(pos, mass, eps, jnp.zeros(n, jnp.float32),
                                box=box, theta=0.4, opening=0, ewald=table)
    acc_d, pot_d = direct_gravity(pos, mass, eps, box=box, ewald=table)
    at, ad = np.asarray(acc_t), np.asarray(acc_d)
    # periodic forces are small (near-cancelling); normalize by the rms force
    rms = np.sqrt((ad**2).sum(1)).mean()
    err = np.linalg.norm(at - ad, axis=1) / rms
    assert np.percentile(err, 99) < 3e-2
    # per-particle periodic potentials nearly cancel, so node-level Ewald
    # corrections (reference-faithful, forcetree.c:1572) smear individual
    # values; the energy-log quantity is the mass-weighted total
    m = np.asarray(mass, np.float64)
    pe_t = 0.5 * (m * np.asarray(pot_t, np.float64)).sum()
    pe_d = 0.5 * (m * np.asarray(pot_d, np.float64)).sum()
    assert abs(pe_t - pe_d) < 0.01 * abs(pe_d)


def test_comoving_lattice_stays_static(tmp_path):
    """Unperturbed lattice in a comoving periodic run: positions frozen."""
    m, box = 8, 10.0
    n = m**3
    pos = _lattice(m, box)
    # Omega0=1 requires total mass = 3 H0^2 / (8 pi G) * V (check_omega)
    cfg = SimConfig(
        ComovingIntegrationOn=1, PeriodicBoundariesOn=1, BoxSize=box,
        Omega0=1.0, OmegaLambda=0.0, HubbleParam=1.0,
        TimeBegin=0.02, TimeMax=0.05,  # a: 0.02 -> 0.05
        ForceMethod="tree", SIDMOn=0,
        TypeOfTimestepCriterion=0, ErrTolIntAccuracy=0.05,
        MaxSizeTimestep=0.002,
        SofteningHalo=0.1, SofteningHaloMaxPhys=0.1,
        OutputDir=str(tmp_path),
        UnitLength_in_cm=3.085678e24, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5)
    sim = Simulation(cfg, mode="synchronized")
    G = sim.units.G
    H = sim.units.Hubble
    rho_crit = 3 * H * H / (8 * np.pi * G)
    mass = np.full(n, rho_crit * box**3 / n)
    sim.set_particles_from_arrays(pos, np.zeros((n, 3)), mass,
                                  np.ones(n, np.int32), pad_to_multiple=n)
    sim.prepare()
    for _ in range(10):
        sim.step()
    assert sim.time > 0.02  # scale factor advanced
    drift = np.abs(np.asarray(sim.particles.pos)[:n] - pos)
    drift = np.minimum(drift, box - drift).max()
    # symmetric forces cancel; any residual is float noise + tree asymmetry
    assert drift < 2e-3 * box, drift


def test_periodic_box_energy_stability(tmp_path):
    """Random periodic box (physical time): bounded energy drift."""
    from sidm_tpu.diagnostics import compute_system_state
    rng = np.random.default_rng(6)
    n, box = 512, 10.0
    pos = rng.uniform(0, box, (n, 3))
    vel = rng.normal(0, 0.02, (n, 3))
    cfg = SimConfig(
        PeriodicBoundariesOn=1, BoxSize=box, GravityConstantInternal=1.0,
        ForceMethod="direct", SIDMOn=0, TypeOfTimestepCriterion=1,
        ErrTolVelScale=0.1, MaxSizeTimestep=0.25, TimeMax=20.0,
        SofteningHalo=0.2, SofteningHaloMaxPhys=0.2,
        OutputDir=str(tmp_path),
        UnitLength_in_cm=1.0, UnitMass_in_g=1.0, UnitVelocity_in_cm_per_s=1.0)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, np.full(n, 1.0 / n),
                                  np.ones(n, np.int32), pad_to_multiple=n)
    sim.prepare()
    sim.compute_potential()
    s0 = compute_system_state(sim.particles)
    e0 = float(s0.energy_kin + s0.energy_pot)
    ekin0 = float(s0.energy_kin)
    for _ in range(40):
        sim.step()
    sim.compute_potential()
    s1 = compute_system_state(sim.particles)
    e1 = float(s1.energy_kin + s1.energy_pot)
    # a near-uniform box has |E_tot| ~ 0; normalize the drift by the kinetic
    # energy scale instead
    assert abs(e1 - e0) < 0.2 * ekin0
