"""SIDM DSMC scattering: rate vs analytic sigma/m, conservation, conflicts.

The scattering-rate oracle follows the reference's validation strategy
(SURVEY.md section 4): for a uniform periodic box of Maxwellian particles with
hard-sphere cross section, the event rate per unit time per particle is
    Gamma = 0.5 * rho * (sigma/m) * <v_rel>,   <v_rel> = 2*sqrt(2)*s*sqrt(2/pi)
(s = 1D velocity dispersion), each event kicking two particles.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sidm_tpu.ops.sidm import SidmParams, sidm_scatter, _resolve_conflicts
from sidm_tpu.rng import run_key, step_key
from sidm_tpu.state import make_particles


def _params(cs_type=0, sigma=1.0, **kw):
    d = dict(cross_section_internal=sigma, cross_section_type=cs_type,
             yukawa_velocity=1.0, cross_section_vel_scale=1.0,
             cross_section_pow_law=0.0, des_num_ngb=30, max_num_ngb_dev=2,
             comoving=False, hubble=0.1, omega0=0.0, omega_lambda=0.0,
             cap=96, block=512)
    d.update(kw)
    return SidmParams(**d)


def _uniform_box(n, s_vel=1.0, seed=0, box=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    vel = rng.normal(0, s_vel, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    return p


def _run_rate(p, params, dt, n_steps, box=1.0, seed=11):
    """Repeatedly scatter a frozen configuration; count events."""
    n = p.n_padded
    active = p.valid
    t = jnp.asarray(dt / 2.0, jnp.float32)  # dt = 2*(t - current_time=0)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))
    root = run_key(seed, 0)

    @jax.jit
    def one(key):
        pp, ns = sidm_scatter(p, p.pos, t, active, vmax, key, params, box=box)
        return ns

    total = 0
    for i in range(n_steps):
        total += int(one(step_key(root, i)))
    return total


def test_hard_sphere_rate_matches_analytic():
    """The default-suite rate check at the 5% bar (~4.5k events, 1.5%
    Poisson, ~0.7% conflict-loss bias). The 3%-grade check below runs
    under --runslow; the 1%-grade validation at N=1e5 across all five
    cross-section types runs on TPU via scripts/validate_rate.py
    (results in BASELINE.md)."""
    n = 8192
    s_vel = 1.0
    sigma = 1.0           # internal sigma/m
    dt = 0.012
    p = _uniform_box(n, s_vel)
    params = _params(0, sigma)
    n_steps = 80
    events = _run_rate(p, params, dt, n_steps)

    rho = 1.0  # total mass 1 in unit box
    v_rel_mean = 2.0 * np.sqrt(2.0) * s_vel * np.sqrt(2.0 / np.pi)
    expected = 0.5 * rho * sigma * v_rel_mean * dt * n * n_steps
    assert events == pytest.approx(expected, rel=0.05), \
        (events, expected)


@pytest.mark.slow
def test_hard_sphere_rate_3pct():
    """3%-grade CI rate check: ~9k events (1.1% Poisson) with the
    per-step event fraction held at ~0.4% so the one-scatter-per-
    particle conflict loss stays well inside the bar."""
    n = 16384
    s_vel = 1.0
    sigma = 1.0
    dt = 0.008
    p = _uniform_box(n, s_vel)
    params = _params(0, sigma)
    n_steps = 120
    events = _run_rate(p, params, dt, n_steps)
    rho = 1.0
    v_rel_mean = 2.0 * np.sqrt(2.0) * s_vel * np.sqrt(2.0 / np.pi)
    expected = 0.5 * rho * sigma * v_rel_mean * dt * n * n_steps
    assert events == pytest.approx(expected, rel=0.03), \
        (events, expected)


def test_maxwellian_cross_section_rate():
    """Type 1: sigma(v) = sigma0/v  =>  rate independent of velocities."""
    n = 4096
    sigma = 0.5
    dt = 0.02
    p = _uniform_box(n, s_vel=3.0, seed=3)
    params = _params(1, sigma)
    events = _run_rate(p, params, dt, 50)
    expected = 0.5 * 1.0 * sigma * dt * n * 50
    assert events == pytest.approx(expected, rel=0.08), (events, expected)


def test_power_law_reduces_to_hard_sphere():
    """Type 3 with alpha=0 must equal type 0."""
    n = 2048
    dt = 0.02
    p = _uniform_box(n, 1.0, seed=5)
    e0 = _run_rate(p, _params(0, 1.0), dt, 30, seed=21)
    e3 = _run_rate(p, _params(3, 1.0, cross_section_vel_scale=123.0,
                              cross_section_pow_law=0.0), dt, 30, seed=21)
    assert e0 == e3  # identical draws, identical probabilities


def test_kick_conserves_momentum_and_energy():
    n = 1024
    p = _uniform_box(n, 1.0, seed=7)
    params = _params(0, 4.0)
    active = p.valid
    t = jnp.asarray(0.05, jnp.float32)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))
    pp, ns = sidm_scatter(p, p.pos, t, active, vmax, run_key(9, 9), params,
                          box=1.0)
    assert int(ns) > 10
    dv = np.asarray(pp.dvel, np.float64)
    m = np.asarray(p.mass, np.float64)
    # momentum: sum m*dv == 0
    assert np.abs((m[:, None] * dv).sum(0)).max() < 1e-5
    # energy: elastic scattering preserves total kinetic energy
    v0 = np.asarray(p.vel, np.float64)
    v1 = v0 + dv
    e0 = 0.5 * (m[:, None] * v0**2).sum()
    e1 = 0.5 * (m[:, None] * v1**2).sum()
    assert e1 == pytest.approx(e0, rel=1e-5)


def test_no_double_scattering():
    n = 1024
    p = _uniform_box(n, 1.0, seed=8)
    params = _params(0, 50.0)  # huge cross section -> many proposals
    active = p.valid
    t = jnp.asarray(0.05, jnp.float32)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))
    pp, ns = sidm_scatter(p, p.pos, t, active, vmax, run_key(4, 2), params,
                          box=1.0)
    kicked = np.abs(np.asarray(pp.dvel)).sum(1) > 0
    # each accepted event kicks exactly two particles
    assert kicked.sum() == 2 * int(ns)


def test_pending_kick_blocks_rescattering():
    n = 512
    p = _uniform_box(n, 1.0, seed=9)
    # mark half the particles as already kicked this step
    pending = np.zeros((n, 3), np.float32)
    pending[: n // 2, 0] = 1e-3
    p = dataclasses.replace(p, dvel=jnp.asarray(pending))
    params = _params(0, 50.0)
    t = jnp.asarray(0.05, jnp.float32)
    pp, ns = sidm_scatter(p, p.pos, t, p.valid, jnp.float32(5.0),
                          run_key(1, 1), params, box=1.0)
    dv = np.asarray(pp.dvel) - pending
    # particles with pending kicks receive no new kick
    assert (np.abs(dv[: n // 2]).sum(1) == 0).all()


def test_noscatter_gives_zero_events_when_sigma_zero():
    n = 256
    p = _uniform_box(n, 1.0, seed=10)
    params = _params(0, 0.0)
    t = jnp.asarray(0.05, jnp.float32)
    pp, ns = sidm_scatter(p, p.pos, t, p.valid, jnp.float32(5.0),
                          run_key(2, 2), params, box=1.0)
    assert int(ns) == 0
    assert np.abs(np.asarray(pp.dvel)).max() == 0


def test_resolve_conflicts_greedy_matching():
    # chain: 0->1, 1->2, 2->3 : sequential greedy accepts 0->1 and 2->3
    prop = jnp.array([1, 2, 3, -1], jnp.int32)
    acc = np.asarray(_resolve_conflicts(prop, 4))
    assert acc.tolist() == [True, False, True, False]
    # mutual: 0->1, 1->0 : only 0 wins
    prop = jnp.array([1, 0, -1], jnp.int32)
    acc = np.asarray(_resolve_conflicts(prop, 3))
    assert acc.tolist() == [True, False, False]
    # shared partner: 0->2, 1->2 : lower index wins
    prop = jnp.array([2, 2, -1], jnp.int32)
    acc = np.asarray(_resolve_conflicts(prop, 3))
    assert acc.tolist() == [True, False, False]


def test_isotropic_kick_directions():
    """Post-scatter relative velocity directions should be isotropic."""
    n = 4096
    p = _uniform_box(n, 1.0, seed=12)
    params = _params(0, 8.0)
    t = jnp.asarray(0.05, jnp.float32)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))
    dirs = []
    root = run_key(3, 3)
    for i in range(5):
        pp, ns = sidm_scatter(p, p.pos, t, p.valid, vmax,
                              step_key(root, i), params, box=1.0)
        dv = np.asarray(pp.dvel)
        kicked = np.abs(dv).sum(1) > 0
        d = dv[kicked]
        dirs.append(d / np.linalg.norm(d, axis=1, keepdims=True))
    u = np.concatenate(dirs)
    # mean of unit vectors ~ 0 within 3/sqrt(n) and <cos^2> ~ 1/3
    assert np.abs(u.mean(0)).max() < 3.5 / np.sqrt(len(u))
    assert np.allclose((u**2).mean(0), 1 / 3, atol=0.03)


def test_conflict_resolver_compact_equivalence():
    """The compacted greedy resolver (O(P) scatters per round) must
    produce EXACTLY the original full-N resolver's accepted set — the
    engines mix the two, and decomposition-invariance tests depend on
    identical greedy semantics."""
    from sidm_tpu.ops.sidm import _resolve_conflicts_compact

    rng = np.random.default_rng(17)
    for _ in range(10):
        n = int(rng.integers(64, 2048))
        prop = np.full(n, -1, np.int32)
        k = int(rng.integers(0, n // 2))
        who = rng.choice(n, size=k, replace=False)
        prop[who] = rng.integers(0, n, size=k)
        prop[prop == np.arange(n)] = -1
        a = np.asarray(_resolve_conflicts(jnp.asarray(prop), n))
        b = np.asarray(_resolve_conflicts_compact(jnp.asarray(prop), n))
        np.testing.assert_array_equal(a, b)
