"""Direct-summation gravity: analytic two-body checks and symmetry."""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.ops.direct import direct_gravity


def test_two_body_newtonian():
    pos = jnp.array([[0.0, 0, 0], [3.0, 0, 0]])
    mass = jnp.array([2.0, 5.0])
    eps = jnp.array([0.1, 0.1])  # h=0.28 << r: Newtonian regime
    acc, pot = direct_gravity(pos, mass, eps, target_block=8, source_chunk=8)
    # raw accel excludes G: a_0 = m_1/r^2 toward +x
    assert float(acc[0, 0]) == pytest.approx(5.0 / 9.0, rel=1e-5)
    assert float(acc[1, 0]) == pytest.approx(-2.0 / 9.0, rel=1e-5)
    assert float(pot[0]) == pytest.approx(-5.0 / 3.0, rel=1e-5)
    assert float(pot[1]) == pytest.approx(-2.0 / 3.0, rel=1e-5)


def test_softened_close_pair_finite_and_attractive():
    pos = jnp.array([[0.0, 0, 0], [1e-4, 0, 0]])
    mass = jnp.array([1.0, 1.0])
    eps = jnp.array([0.1, 0.1])
    acc, pot = direct_gravity(pos, mass, eps, target_block=8, source_chunk=8)
    assert np.isfinite(np.asarray(acc)).all()
    assert float(acc[0, 0]) > 0  # pulled toward the other particle
    # near the center the spline force ~ linear in r, much weaker than 1/r^2
    assert abs(float(acc[0, 0])) < 1.0 / (2.8 * 0.1) ** 2 * 2


def test_momentum_conservation_random_cloud():
    rng = np.random.default_rng(0)
    n = 300
    pos = jnp.asarray(rng.normal(size=(n, 3)))
    mass = jnp.asarray(rng.uniform(0.5, 2.0, n))
    eps = jnp.full((n,), 0.05)
    acc, _ = direct_gravity(pos, mass, eps, target_block=64, source_chunk=128)
    net = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    scale = float(jnp.mean(jnp.abs(mass[:, None] * acc)))
    np.testing.assert_allclose(net / scale / n, 0.0, atol=1e-5)


def test_padding_particles_inert():
    pos = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [55.0, 55, 55]])
    mass = jnp.array([1.0, 1.0, 0.0])  # third is padding (mass 0)
    eps = jnp.array([0.01, 0.01, 0.01])
    acc, pot = direct_gravity(pos, mass, eps, target_block=4, source_chunk=4)
    acc2, pot2 = direct_gravity(pos[:2], mass[:2], eps[:2],
                                target_block=4, source_chunk=4)
    np.testing.assert_allclose(np.asarray(acc[:2]), np.asarray(acc2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pot[:2]), np.asarray(pot2), rtol=1e-6)


def test_mixed_type_softening_uses_max():
    """h_ij = 2.8*max(eps_i, eps_j) (forcetree.c:1914-1917)."""
    pos = jnp.array([[0.0, 0, 0], [0.2, 0, 0]])
    mass = jnp.array([1.0, 1.0])
    # pair softened with max(0.01, 0.5) -> h = 1.4, r=0.2 is deep inside
    acc_mixed, _ = direct_gravity(pos, mass, jnp.array([0.01, 0.5]),
                                  target_block=4, source_chunk=4)
    acc_big, _ = direct_gravity(pos, mass, jnp.array([0.5, 0.5]),
                                target_block=4, source_chunk=4)
    np.testing.assert_allclose(np.asarray(acc_mixed), np.asarray(acc_big),
                               rtol=1e-6)


def test_periodic_minimum_image():
    box = 10.0
    pos = jnp.array([[0.5, 5.0, 5.0], [9.5, 5.0, 5.0]])
    mass = jnp.array([1.0, 1.0])
    eps = jnp.array([0.01, 0.01])
    acc, _ = direct_gravity(pos, mass, eps, box=box,
                            target_block=4, source_chunk=4)
    # nearest image is at distance 1 across the boundary: particle 0 pulled -x
    assert float(acc[0, 0]) == pytest.approx(-1.0, rel=1e-4)
