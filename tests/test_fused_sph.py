"""Fused-frontier SPH engine (ops/fused_sph.py) vs float64 brute force.

The oracle reimplements density() (nbody/density.c:210-232) and
hydro_force() (nbody/hydra.c:275-342) as direct O(N^2) pair sums in
float64 — stronger than cross-engine parity (the hashed cell engine's
candidate cap can truncate in dense configs; see ops/sph.py overflow).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from sidm_tpu.constants import GAMMA, GAMMA_MINUS1
from sidm_tpu.kernels import sph_kernel, sph_kernel_deriv
from sidm_tpu.ops.fused_force import FusedConfig
from sidm_tpu.ops.fused_sph import hydro_force_fused, sph_density_fused
from sidm_tpu.ops.sph import SphParams
from sidm_tpu.ops.tree import build_octree
from sidm_tpu.state import make_particles

CFG = FusedConfig(group_size=16, group_block=8, break_level=3)


def _params(**kw):
    d = dict(des_num_ngb=32, max_num_ngb_dev=2, art_bulk_visc=0.75,
             min_egy_spec=0.0, min_gas_hsml=0.0, comoving=False,
             hubble=0.1, omega0=0.0, omega_lambda=0.0, cap=128, block=256)
    d.update(kw)
    return SphParams(**d)


def _gas_box(n=400, seed=0, k=32):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 0.1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.zeros(n, np.int32),
                       egy_spec=np.full(n, 1.0), pad_to_multiple=n)
    # per-particle h around the mean k-neighbour spacing (no engine bias)
    h0 = (3.0 * k / (4 * np.pi * n)) ** (1 / 3)
    h = h0 * rng.uniform(0.8, 1.3, n)
    return dataclasses.replace(p, hsml=jnp.asarray(h, p.pos.dtype))


def _tree(p, box=0.0, depth=6):
    eps = jnp.full(p.pos.shape[0], 1e-3, p.pos.dtype)
    return build_octree(p.pos, p.mass, eps, p.mass > 0, box=box, depth=depth)


def _wk(r, h):
    u = np.clip(r / h, 0, 2)
    return np.asarray(sph_kernel(jnp.asarray(u)), np.float64) / h ** 3


def _dwk(r, h):
    u = np.clip(r / h, 0, 2)
    return np.asarray(sph_kernel_deriv(jnp.asarray(u)), np.float64) / h ** 4


def _minimg(d, box):
    return d - box * np.round(d / box) if box else d


def _brute_density(x, v, m, h, box=0.0):
    n = len(x)
    rho = np.zeros(n)
    divv = np.zeros(n)
    curl = np.zeros(n)
    for i in range(n):
        d = _minimg(x[i] - x, box)
        r = np.linalg.norm(d, axis=1)
        inr = r < h[i]
        wk = np.where(inr, _wk(r, h[i]), 0.0)
        dwk = np.where(inr, _dwk(r, h[i]), 0.0)
        rho[i] = (m * wk).sum()
        dv = v[i] - v
        rs = np.maximum(r, 1e-30)
        fac = np.where(inr & (r > 0), m * dwk / rs, 0.0)
        divv[i] = -(fac * (d * dv).sum(1)).sum()
        rot = (fac[:, None] * np.cross(d, dv)).sum(0)
        curl[i] = np.linalg.norm(rot)
    return rho, divv, curl


def _brute_hydro(x, v, m, h, rho, egy, divv_or, curl_or, dt, abv, box=0.0):
    """hydra.c pair sums with the per-half viscosity limiter of the
    gather+scatter split (ops/sph.py). divv_or/curl_or follow the
    engine convention (already divided by rho)."""
    n = len(x)
    rho = np.maximum(rho, 1e-30)
    pres = GAMMA_MINUS1 * egy * rho
    cs = np.sqrt(GAMMA * pres / rho)
    por2 = pres / rho ** 2
    fb = np.abs(divv_or) / (np.abs(divv_or) + curl_or
                            + 1e-4 * cs / np.maximum(h, 1e-30))
    acc = np.zeros((n, 3))
    de = np.zeros(n)
    for i in range(n):
        d = _minimg(x[i] - x, box)
        r2 = (d * d).sum(1)
        r = np.sqrt(r2)
        okp = r > 0
        dwi = np.where((r < h[i]) & okp, _dwk(r, h[i]), 0.0)
        dwj = np.where((r < h) & okp, _dwk(r, h), 0.0)
        dv = v[i] - v
        vdr = (d * dv).sum(1)
        hij = 0.5 * (h[i] + h)
        cij = 0.5 * (cs[i] + cs)
        rij = 0.5 * (rho[i] + rho)
        mu = hij * vdr / (r2 + 0.01 * hij ** 2)
        visc = np.where(vdr < 0,
                        (-abv * mu * cij + 2 * abv * mu * mu)
                        / np.maximum(rij, 1e-30) * 0.5 * (fb[i] + fb), 0.0)
        msum = 0.5 * (m[i] + m)
        rs = np.maximum(r, 1e-30)

        def lim(visc, dw, dd):
            l = vdr / np.where(dw < 0,
                               msum * 2 * dw * rs * np.maximum(dd, 1e-30),
                               -1e30)
            return np.where((vdr < 0) & (dd > 1e-30) & (dw < 0),
                            np.minimum(visc, l), visc)

        vi = lim(visc, dwi, dt[i])
        vj = lim(visc, dwj, dt)
        pp = 2 * np.sqrt(np.maximum(por2[i] * por2, 0))
        hfc = 0.5 * m * ((pp + vi) * dwi + (pp + vj) * dwj) / rs
        acc[i] = -(hfc[:, None] * d).sum(0)
        de[i] = (0.5 * hfc * vdr).sum()
    return acc, de


def _np64(a):
    return np.asarray(a, np.float64)


def test_fused_density_matches_brute_force():
    p = _gas_box(400, seed=1)
    t = jnp.float32(0.05)
    tree = _tree(p)
    p2, ovf = sph_density_fused(p, p.pos, p.vel, tree, t, p.valid,
                                _params(), cfg=CFG, hsml_iters=0)
    assert int(ovf[0]) == 0 and int(ovf[1]) == 0
    x, v, m, h = map(_np64, (p.pos, p.vel, p.mass, p.hsml))
    rho_b, divv_b, curl_b = _brute_density(x, v, m, h)
    rho = _np64(p2.density)
    np.testing.assert_allclose(rho, rho_b, rtol=2e-5)
    np.testing.assert_allclose(_np64(p2.div_vel) * rho_b, divv_b,
                               rtol=1e-4, atol=1e-5 * np.abs(divv_b).max())
    np.testing.assert_allclose(_np64(p2.curl_vel) * rho_b, curl_b,
                               rtol=1e-4, atol=1e-5 * curl_b.max())


def test_fused_hydro_matches_brute_force():
    p = _gas_box(300, seed=2)
    t = jnp.float32(0.05)
    tree = _tree(p)
    prm = _params()
    p2, _ = sph_density_fused(p, p.pos, p.vel, tree, t, p.valid, prm,
                              cfg=CFG, hsml_iters=0)
    acc_f, de_f, ovf = hydro_force_fused(p2, p.pos, p.vel, tree, t, p.valid,
                                         prm, cfg=CFG)
    assert int(ovf[0]) == 0 and int(ovf[1]) == 0
    x, v, m, h = map(_np64, (p.pos, p.vel, p.mass, p2.hsml))
    dt = 2.0 * (0.05 - _np64(p2.current_time))
    acc_b, de_b = _brute_hydro(
        x, v, m, h, _np64(p2.density), _np64(p2.egy_spec),
        _np64(p2.div_vel), _np64(p2.curl_vel), dt, 0.75)
    scale = np.abs(acc_b).max()
    np.testing.assert_allclose(_np64(acc_f), acc_b, rtol=1e-4,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(_np64(de_f), de_b, rtol=1e-4,
                               atol=2e-5 * max(np.abs(de_b).max(), 1e-30))


def test_fused_hydro_periodic_matches_brute_force():
    p = _gas_box(256, seed=3, k=24)
    t = jnp.float32(0.05)
    box = 1.0
    tree = _tree(p, box=box)
    prm = _params(des_num_ngb=24)
    p2, ovf = sph_density_fused(p, p.pos, p.vel, tree, t, p.valid, prm,
                                cfg=CFG, box=box, hsml_iters=0)
    assert int(ovf[0]) == 0 and int(ovf[1]) == 0
    x, v, m, h = map(_np64, (p.pos, p.vel, p.mass, p.hsml))
    rho_b, _, _ = _brute_density(x, v, m, h, box=box)
    np.testing.assert_allclose(_np64(p2.density), rho_b, rtol=2e-5)
    acc_f, de_f, ovf = hydro_force_fused(p2, p.pos, p.vel, tree, t, p.valid,
                                         prm, cfg=CFG, box=box)
    assert int(ovf[0]) == 0 and int(ovf[1]) == 0
    dt = 2.0 * (0.05 - _np64(p2.current_time))
    acc_b, de_b = _brute_hydro(
        x, v, m, h, _np64(p2.density), _np64(p2.egy_spec),
        _np64(p2.div_vel), _np64(p2.curl_vel), dt, 0.75, box=box)
    scale = np.abs(acc_b).max()
    np.testing.assert_allclose(_np64(acc_f), acc_b, rtol=1e-4,
                               atol=2e-5 * scale)


def test_fused_hydro_momentum_conservation():
    p = _gas_box(300, seed=4)
    t = jnp.float32(0.05)
    prm = _params()
    tree = _tree(p)
    p2, _ = sph_density_fused(p, p.pos, p.vel, tree, t, p.valid, prm,
                              cfg=CFG, hsml_iters=0)
    acc, de, _ = hydro_force_fused(p2, p.pos, p.vel, tree, t, p.valid, prm,
                                   cfg=CFG)
    acc = np.asarray(acc, np.float64)
    m = np.asarray(p.mass, np.float64)
    net = (m[:, None] * acc).sum(0)
    scale = np.abs(m[:, None] * acc).mean() * len(m)
    assert np.abs(net).max() / max(scale, 1e-30) < 1e-4
    assert np.isfinite(np.asarray(de)).all()


def test_fused_density_hsml_controller_converges():
    p = _gas_box(400, seed=5)
    t = jnp.float32(0.05)
    prm = _params()
    # seed every gas particle with a crude common guess; the controller
    # must pull neighbour counts into a band around DesNumNgb
    p = dataclasses.replace(p, hsml=jnp.full(p.pos.shape[0], 0.2,
                                             p.pos.dtype))
    tree = _tree(p)
    p2, _ = sph_density_fused(p, p.pos, p.vel, tree, t, p.valid, prm,
                              cfg=CFG, hsml_iters=8)
    ngb = np.asarray(p2.ngb_sph)
    assert np.median(np.abs(ngb - 32)) <= 8
    assert np.asarray(p2.density).min() > 0


def test_fused_hydro_mixed_types_and_inactive_masking():
    """Mixed gas + DM + inactive gas: outputs masked exactly; DM excluded
    from pair sums."""
    rng = np.random.default_rng(6)
    n = 256
    pos = rng.uniform(0, 1, (n, 3))
    ptype = np.zeros(n, np.int32)
    ptype[128:] = 1                                   # half DM
    p = make_particles(pos, rng.normal(0, 0.1, (n, 3)),
                       np.full(n, 1.0 / n), ptype,
                       egy_spec=np.full(n, 1.0), pad_to_multiple=n)
    h0 = (3.0 * 16 / (4 * np.pi * 128)) ** (1 / 3)
    p = dataclasses.replace(
        p, hsml=jnp.asarray(np.where(ptype == 0, h0, 0.0), p.pos.dtype))
    t = jnp.float32(0.05)
    active = np.ones(n, bool)
    active[:32] = False                               # inactive gas
    active = jnp.asarray(active)
    prm = _params(des_num_ngb=16)
    tree = _tree(p)
    p2, _ = sph_density_fused(p, p.pos, p.vel, tree, t, jnp.asarray(p.valid),
                              prm, cfg=CFG, hsml_iters=0)
    # density must only sum over gas: compare vs gas-only brute force
    gas = ptype == 0
    x, v, m, h = map(_np64, (p.pos, p.vel, p.mass, p.hsml))
    rho_b, _, _ = _brute_density(x[gas], v[gas], m[gas], h[gas])
    np.testing.assert_allclose(_np64(p2.density)[gas], rho_b, rtol=2e-5)
    acc, de, _ = hydro_force_fused(p2, p.pos, p.vel, tree, t, active, prm,
                                   cfg=CFG)
    acc = np.asarray(acc)
    assert (acc[:32] == 0).all()                      # inactive gas masked
    assert (acc[128:] == 0).all()                     # DM gets no SPH force
    assert np.isfinite(acc).all() and np.isfinite(np.asarray(de)).all()
