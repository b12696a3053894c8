"""End-to-end slice: collisionless halo with direct gravity.

SURVEY.md section 7 stage 2 — read IC -> leapfrog with softened gravity ->
energy statistics. Correctness oracle: bounded total-energy drift, exact
momentum behavior, two-body circular orbit period.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.config import SimConfig
from sidm_tpu.diagnostics import compute_system_state
from sidm_tpu.io import ics
from sidm_tpu.simulation import Simulation


def _sim(cfg, pos, vel, mass, ptype):
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, ptype, pad_to_multiple=64)
    return sim


def test_two_body_circular_orbit():
    """Equal-mass binary on a circular orbit: period T = 2 pi sqrt(d^3/(G*Mtot))
    with G=1 via GravityConstantInternal."""
    cfg = SimConfig(
        GravityConstantInternal=1.0, SIDMOn=0, ForceMethod="direct",
        TypeOfTimestepCriterion=1, ErrTolVelScale=0.02,
        MaxSizeTimestep=0.05, TimeBegin=0.0, TimeMax=10.0,
        SofteningHalo=1e-4, SofteningHaloMaxPhys=1e-4)
    d = 1.0
    m = 0.5
    # circular velocity of each body about the COM: v = sqrt(G*m_other^2/(Mtot*d))
    v = np.sqrt(1.0 * m * m / (1.0 * d))  # = 0.5
    pos = np.array([[-0.5, 0, 0], [0.5, 0, 0]])
    vel = np.array([[0, -v, 0], [0, v, 0]])
    sim = _sim(cfg, pos, vel, [m, m], [1, 1])
    sim.prepare()

    T = 2 * np.pi * np.sqrt(d**3 / (1.0 * (m + m)))  # = 2 pi
    # integrate one period
    while sim.time < T:
        sim.step()
    p = np.asarray(sim.particles.pos)[:2]
    # back to starting positions within a few percent of the separation
    assert np.linalg.norm(p[0] - [-0.5, 0, 0]) < 0.1
    assert np.linalg.norm(p[1] - [0.5, 0, 0]) < 0.1


def test_plummer_energy_conservation():
    cfg = SimConfig(
        GravityConstantInternal=1.0, SIDMOn=0, ForceMethod="direct",
        TypeOfTimestepCriterion=1, ErrTolVelScale=0.05,
        MaxSizeTimestep=0.05, TimeBegin=0.0, TimeMax=2.0,
        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05)
    pos, vel, mass = ics.plummer(256, seed=2)
    sim = _sim(cfg, pos, vel, mass, np.ones(256, np.int32))
    sim.prepare()
    sim.compute_potential()
    s0 = compute_system_state(sim.particles)
    e0 = float(s0.energy_kin + s0.energy_pot)
    assert e0 < 0  # bound system

    for _ in range(60):
        sim.step()
    assert sim.time > 0.5

    sim.compute_potential()
    s1 = compute_system_state(sim.particles)
    e1 = float(s1.energy_kin + s1.energy_pot)
    assert abs(e1 - e0) / abs(e0) < 0.03

    # momentum stays near zero
    mom = np.asarray(jnp.sum(s1.momentum_comp, axis=0))
    ptot = float(np.sum(np.asarray(s1.mass_comp)))
    assert np.linalg.norm(mom) / ptot < 0.05 * np.sqrt(
        2 * float(s1.energy_kin) / ptot)


def test_reflection_boundary_contains_particles():
    cfg = SimConfig(
        GravityConstantInternal=1.0, SIDMOn=0, ForceMethod="direct",
        TypeOfTimestepCriterion=1, ErrTolVelScale=0.1,
        MaxSizeTimestep=0.02, TimeBegin=0.0, TimeMax=5.0,
        ReflectionBoundary=2.0,
        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05)
    # particles streaming outward faster than escape speed
    rng = np.random.default_rng(5)
    n = 32
    pos = rng.normal(size=(n, 3)) * 0.2
    vel = pos / np.linalg.norm(pos, axis=1, keepdims=True) * 3.0
    sim = _sim(cfg, pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32))
    sim.prepare()
    for _ in range(100):
        sim.step()
    r = np.linalg.norm(np.asarray(sim.particles.pos)[:n], axis=1)
    # reflecting wall at r=2 (+ small overshoot within a step)
    assert (r < 2.5).all()


def test_restart_roundtrip(tmp_path):
    cfg = SimConfig(
        GravityConstantInternal=1.0, SIDMOn=0, ForceMethod="direct",
        OutputDir=str(tmp_path), TypeOfTimestepCriterion=1,
        ErrTolVelScale=0.05, MaxSizeTimestep=0.05, TimeMax=1.0,
        SofteningHalo=0.05, SofteningHaloMaxPhys=0.05)
    pos, vel, mass = ics.plummer(64, seed=7)
    sim = _sim(cfg, pos, vel, mass, np.ones(64, np.int32))
    sim.prepare()
    for _ in range(5):
        sim.step()
    sim.write_restart_file()
    state_a = np.asarray(sim.particles.pos).copy()
    for _ in range(5):
        sim.step()
    after_10 = np.asarray(sim.particles.pos).copy()

    sim2 = Simulation(cfg, mode="synchronized")
    sim2.load_restart_file()
    np.testing.assert_allclose(np.asarray(sim2.particles.pos), state_a)
    assert sim2.time == pytest.approx(sim.time - (sim.time - sim2.time))
    for _ in range(5):
        sim2.step()
    np.testing.assert_allclose(np.asarray(sim2.particles.pos), after_10,
                               rtol=1e-6, atol=1e-7)


def test_noforce_pure_drift():
    cfg = SimConfig(
        GravityConstantInternal=1.0, SIDMOn=0, NoForce=1, ForceMethod="direct",
        TypeOfTimestepCriterion=1, ErrTolVelScale=1e9, MaxSizeTimestep=0.125,
        TimeMax=1.0, SofteningHalo=0.05, SofteningHaloMaxPhys=0.05)
    pos = np.zeros((4, 3))
    vel = np.tile(np.array([[1.0, 0, 0]]), (4, 1))
    sim = _sim(cfg, pos, vel, np.full(4, 0.25), np.ones(4, np.int32))
    sim.prepare()
    while sim.time < 1.0:
        sim.step()
    np.testing.assert_allclose(np.asarray(sim.particles.pos)[:4, 0],
                               sim.time, rtol=1e-5)
