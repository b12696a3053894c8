"""Initial-condition generators for tests and benchmarks.

The reference ships no IC generator — it documents an externally produced
Eddington-inversion NFW IC (nbody/parameter.txt:3-11). For self-contained
tests and benches we provide samplers for the BASELINE configs:

* Plummer sphere with the exact isotropic distribution function,
* Hernquist and (truncated) NFW halos with local-Maxwellian velocities from
  the isotropic Jeans equation (adequate quasi-equilibrium for conservation
  and throughput runs),
* uniform periodic box.

All return host numpy arrays in internal units; masses are equal.
"""

from __future__ import annotations

import numpy as np


def plummer(n: int, total_mass: float = 1.0, scale: float = 1.0, G: float = 1.0,
            seed: int = 1, rmax_factor: float = 20.0):
    """Aarseth, Henon & Wielen (1974) exact Plummer sampling."""
    rng = np.random.default_rng(seed)
    m = np.full(n, total_mass / n)
    # radii from inverse CDF of M(r)
    x = rng.uniform(0, 1, n)
    r = scale / np.sqrt(x ** (-2.0 / 3.0) - 1.0)
    r = np.clip(r, 0, rmax_factor * scale)
    pos = _iso_dirs(rng, n) * r[:, None]
    # velocities: rejection from q^2 (1-q^2)^(7/2)
    q = np.zeros(n)
    todo = np.ones(n, bool)
    while todo.any():
        k = int(todo.sum())
        x1 = rng.uniform(0, 1, k)
        x2 = rng.uniform(0, 0.1, k)
        acc = x2 < x1 * x1 * (1 - x1 * x1) ** 3.5
        idx = np.flatnonzero(todo)[acc]
        q[idx] = x1[acc]
        todo[idx] = False
    vesc = np.sqrt(2.0 * G * total_mass) * (r * r + scale * scale) ** -0.25
    vel = _iso_dirs(rng, n) * (q * vesc)[:, None]
    pos, vel = _zero_com(pos, vel, m)
    return pos, vel, m


def hernquist(n: int, total_mass: float = 1.0, scale: float = 1.0, G: float = 1.0,
              seed: int = 1, rmax_factor: float = 50.0):
    """Hernquist (1990) profile, Jeans local-Maxwellian velocities."""
    rng = np.random.default_rng(seed)
    m = np.full(n, total_mass / n)
    x = rng.uniform(0, 1, n)
    # M(r)/M = r^2/(r+a)^2  =>  r = a sqrt(x)/(1-sqrt(x))
    s = np.sqrt(x)
    r = scale * s / np.maximum(1e-10, 1.0 - s)
    r = np.clip(r, 1e-6 * scale, rmax_factor * scale)
    pos = _iso_dirs(rng, n) * r[:, None]
    # isotropic Jeans dispersion (Hernquist 1990 eq. 10), evaluated numerically
    sig2 = _jeans_sigma2(r, lambda rr: _hernquist_rho(rr, total_mass, scale),
                         lambda rr: total_mass * rr**2 / (rr + scale) ** 2,
                         G, rmax_factor * scale * 40)
    vel = rng.normal(size=(n, 3)) * np.sqrt(sig2)[:, None]
    pos, vel = _zero_com(pos, vel, m)
    return pos, vel, m


def nfw(n: int, rho0: float, rs: float, rmax_factor: float = 100.0,
        G: float = 1.0, seed: int = 1):
    """Truncated NFW halo (parameter.txt:4-11), Jeans local-Maxwellian."""
    rng = np.random.default_rng(seed)
    rmax = rmax_factor * rs

    def mass_of(rr):
        x = rr / rs
        return 4 * np.pi * rho0 * rs**3 * (np.log(1 + x) - x / (1 + x))

    mtot = mass_of(rmax)
    m = np.full(n, mtot / n)
    # radius by inverse CDF (tabulated)
    rtab = np.geomspace(1e-4 * rs, rmax, 4096)
    cdf = mass_of(rtab) / mtot
    r = np.interp(rng.uniform(0, 1, n), cdf, rtab)
    pos = _iso_dirs(rng, n) * r[:, None]
    sig2 = _jeans_sigma2(
        r, lambda rr: rho0 / ((rr / rs) * (1 + rr / rs) ** 2),
        mass_of, G, rmax * 20)
    vel = rng.normal(size=(n, 3)) * np.sqrt(sig2)[:, None]
    pos, vel = _zero_com(pos, vel, m)
    return pos, vel, m


def uniform_box(n: int, box: float, vel_disp: float = 0.0, total_mass: float = 1.0,
                seed: int = 1):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    vel = rng.normal(size=(n, 3)) * vel_disp
    m = np.full(n, total_mass / n)
    return pos, vel, m


def _iso_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _zero_com(pos, vel, m):
    """Remove the sampling noise in the center of mass and net momentum."""
    w = (m / m.sum())[:, None]
    return pos - (w * pos).sum(0), vel - (w * vel).sum(0)


def _hernquist_rho(r, mtot, a):
    return mtot * a / (2 * np.pi) / np.maximum(r, 1e-12) / (r + a) ** 3


def _jeans_sigma2(r, rho_fn, mass_fn, G, r_infinity):
    """sigma_r^2(r) = (1/rho) int_r^inf rho(s) G M(s)/s^2 ds (isotropic)."""
    r = np.asarray(r)
    grid = np.geomspace(max(1e-8, r.min() * 0.5), r_infinity, 8192)
    integrand = rho_fn(grid) * G * mass_fn(grid) / grid**2
    # cumulative integral from r to infinity
    dg = np.diff(grid)
    seg = 0.5 * (integrand[1:] + integrand[:-1]) * dg
    tail = np.concatenate([np.cumsum(seg[::-1])[::-1], [0.0]])
    sig2_grid = tail / np.maximum(rho_fn(grid), 1e-300)
    return np.interp(r, grid, sig2_grid)
