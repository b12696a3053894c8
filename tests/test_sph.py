"""SPH density and hydro force vs direct pair sums."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.kernels import sph_kernel, sph_kernel_deriv
from sidm_tpu.ops.sph import SphParams, hydro_force, sph_density
from sidm_tpu.state import make_particles


def _params(**kw):
    d = dict(des_num_ngb=32, max_num_ngb_dev=2, art_bulk_visc=0.75,
             min_egy_spec=0.0, min_gas_hsml=0.0, comoving=False,
             hubble=0.1, omega0=0.0, omega_lambda=0.0, cap=128, block=256)
    d.update(kw)
    return SphParams(**d)


def _gas_box(n=512, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 0.1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.zeros(n, np.int32),
                       egy_spec=np.full(n, 1.0), pad_to_multiple=n)
    return p


def _brute_density(pos, vel, mass, h):
    n = len(pos)
    rho = np.zeros(n)
    divv = np.zeros(n)
    for i in range(n):
        d = pos[i] - pos
        r = np.linalg.norm(d, axis=1)
        u = r / h[i]
        ok = u < 1
        wk = np.asarray(sph_kernel(jnp.asarray(u))) / h[i] ** 3
        dwk = np.asarray(sph_kernel_deriv(jnp.asarray(u))) / h[i] ** 4
        rho[i] = (mass * wk * ok).sum()
        dv = vel[i] - vel
        rs = np.maximum(r, 1e-30)
        divv[i] = -(mass * dwk / rs * (d * dv).sum(1) * ok * (r > 0)).sum()
    return rho, divv


def test_density_matches_brute_force():
    p = _gas_box(400, seed=1)
    t = jnp.float32(0.05)
    active = p.valid
    p2, table, _ovf = sph_density(p, p.pos, p.vel, t, active, _params())
    pos = np.asarray(p.pos)
    vel = np.asarray(p.vel)
    mass = np.asarray(p.mass)
    h = np.asarray(p2.hsml)
    rho_ref, divv_ref = _brute_density(pos, vel, mass, h)
    rho = np.asarray(p2.density)
    np.testing.assert_allclose(rho, rho_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p2.div_vel) * rho, divv_ref,
                               rtol=1e-3, atol=1e-5)
    # neighbour counts at the k-th-distance radius
    assert (np.abs(np.asarray(p2.ngb_sph) - 32) <= 2).all()


def test_hydro_force_pairwise_symmetry():
    """Pressure force must conserve momentum and heat symmetric pairs."""
    p = _gas_box(300, seed=2)
    t = jnp.float32(0.05)
    active = p.valid
    p2, table, _ovf = sph_density(p, p.pos, p.vel, t, active, _params())
    acc, dt_egy, _ = hydro_force(p2, p.pos, p.vel, t, active, _params(), table)
    acc = np.asarray(acc, np.float64)
    m = np.asarray(p.mass, np.float64)
    net = (m[:, None] * acc).sum(0)
    scale = np.abs(m[:, None] * acc).mean() * len(m)
    assert np.abs(net).max() / max(scale, 1e-30) < 1e-4
    assert np.isfinite(np.asarray(dt_egy)).all()


def test_hydro_force_pushes_apart_dense_region():
    """A compressed clump of hot gas must accelerate outward."""
    rng = np.random.default_rng(3)
    n = 256
    # uniform background + dense clump at center
    pos = rng.uniform(0, 1, (n, 3))
    pos[:64] = 0.5 + rng.normal(0, 0.02, (64, 3))
    p = make_particles(pos, np.zeros((n, 3)), np.full(n, 1.0 / n),
                       np.zeros(n, np.int32), egy_spec=np.full(n, 1.0),
                       pad_to_multiple=n)
    t = jnp.float32(0.05)
    p2, table, _ovf = sph_density(p, p.pos, p.vel, t, p.valid, _params())
    acc, _, _ = hydro_force(p2, p.pos, p.vel, t, p.valid, _params(), table)
    acc = np.asarray(acc)
    # clump particles accelerate away from the clump center
    d = pos[:64] - 0.5
    rad = (acc[:64] * d).sum(1) / np.maximum(np.linalg.norm(d, axis=1), 1e-9)
    assert (rad > 0).mean() > 0.85


def test_viscosity_damps_approach():
    """Two streams colliding head-on: viscosity adds entropy (dt_egy > 0)."""
    rng = np.random.default_rng(4)
    n = 400
    pos = rng.uniform(0, 1, (n, 3))
    vel = np.zeros((n, 3))
    vel[:, 0] = np.where(pos[:, 0] < 0.5, 1.0, -1.0)  # converging flows
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.zeros(n, np.int32),
                       egy_spec=np.full(n, 0.01), pad_to_multiple=n)
    t = jnp.float32(0.05)
    p2, table, _ovf = sph_density(p, p.pos, p.vel, t, p.valid, _params())
    acc, dt_egy, _ = hydro_force(p2, p.pos, p.vel, t, p.valid, _params(), table)
    # entropy generation is positive on average near the interface
    de = np.asarray(dt_egy)
    mid = np.abs(pos[:, 0] - 0.5) < 0.1
    assert de[mid].mean() > 0
