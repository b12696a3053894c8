"""Tree-segment SIDM engine vs the hashed cell-list engine.

Both implement the same DSMC physics; the tree engine must reproduce the
hash engine's neighbour counts exactly and its scattering rate statistically
(different RNG streams select different partners, so trajectories differ but
rates must agree).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.ops.neighbors import setup_smoothing_lengths
from sidm_tpu.ops.sidm import SidmParams, sidm_scatter
from sidm_tpu.ops.sidm_tree import RangeWalkConfig, sidm_scatter_tree
from sidm_tpu.ops.tree import build_octree
from sidm_tpu.rng import run_key, step_key
from sidm_tpu.state import make_particles


def _setup(n=4096, seed=0, sigma=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2)
    # maintenance_rate=1: scan every target so counts are verifiable
    params = SidmParams(sigma, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0, 0.0,
                        maintenance_rate=1.0)
    return p, params


def test_counts_match_brute_force():
    p, params = _setup(2048, seed=1)
    n = 2048
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    pp, ns = sidm_scatter_tree(p, p.pos, tree, jnp.float32(0.01), p.valid,
                               jnp.float32(5.0), run_key(1, 1), params,
                               salt=3)
    cnt = np.asarray(pp.ngb_vd)
    pos = np.asarray(p.pos)
    h = np.asarray(p.hsml_vd)
    for i in range(0, n, 13):
        d = np.linalg.norm(pos - pos[i], axis=1)
        ref = int(((d < h[i]) & (d > 0)).sum())
        assert cnt[i] == ref, i


def test_rates_match_hash_engine():
    """Same configuration, many steps: tree and hash engines must produce
    statistically equal event rates (they share the physics, not the RNG)."""
    p, params = _setup(4096, seed=2)
    n = 4096
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    t = jnp.float32(0.01)
    root = run_key(7, 7)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))

    ev_tree = sum(int(sidm_scatter_tree(
        p, p.pos, tree, t, p.valid, vmax, step_key(root, i), params,
        salt=i)[1]) for i in range(25))
    ev_hash = sum(int(sidm_scatter(
        p, p.pos, t, p.valid, vmax, step_key(root, 1000 + i), params,
        box=0.0)[1]) for i in range(25))
    # Poisson-ish fluctuation bounds: ~sqrt(N_events)*3
    assert ev_tree > 0 and ev_hash > 0
    sigma_est = 3.0 * np.sqrt(max(ev_tree, ev_hash))
    assert abs(ev_tree - ev_hash) < max(5 * sigma_est, 0.12 * ev_hash), \
        (ev_tree, ev_hash)


def test_conservation_and_pairing():
    p, params = _setup(4096, seed=3, sigma=4.0)
    n = 4096
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    pp, ns = sidm_scatter_tree(p, p.pos, tree, jnp.float32(0.05), p.valid,
                               jnp.float32(5.0), run_key(9, 9), params,
                               salt=11)
    assert int(ns) > 10
    dv = np.asarray(pp.dvel, np.float64)
    m = np.asarray(p.mass, np.float64)
    assert np.abs((m[:, None] * dv).sum(0)).max() < 1e-5
    v0 = np.asarray(p.vel, np.float64)
    v1 = v0 + dv
    e0 = (m[:, None] * v0**2).sum()
    e1 = (m[:, None] * v1**2).sum()
    assert abs(e1 - e0) / e0 < 1e-5
    kicked = np.abs(dv).sum(1) > 0
    assert kicked.sum() == 2 * int(ns)


def test_periodic_counts_wrap():
    """Neighbour enumeration must cross the box wrap: counts from the tree
    engine with box>0 must match brute-force minimum-image counts."""
    n = 2048
    box = 1.0
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, box, (n, 3))
    # pile extra particles against the faces so wraps matter
    pos[: n // 4, 0] = rng.uniform(0, 0.02, n // 4)
    pos[n // 4: n // 2, 0] = rng.uniform(0.98, 1.0, n // 4)
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2, box=box)
    params = SidmParams(1.0, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0, 0.0,
                        maintenance_rate=1.0)
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid, box=box)
    pp, _ = sidm_scatter_tree(p, p.pos, tree, jnp.float32(0.01), p.valid,
                              jnp.float32(5.0), run_key(2, 2), params,
                              box=box, salt=5)
    cnt = np.asarray(pp.ngb_vd)
    h = np.asarray(p.hsml_vd)
    for i in range(0, n, 11):
        d = pos - pos[i]
        d -= box * np.round(d / box)
        r = np.linalg.norm(d, axis=1)
        ref = int(((r < h[i]) & (r > 0)).sum())
        assert cnt[i] == ref, (i, cnt[i], ref)


def test_tree_hsml_init_counts_exact():
    """tree_hsml_init (large-N path of setup_smoothinglengths_sidm) must
    return neighbour counts consistent with its returned h, in-band."""
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.ops.sidm_tree import tree_hsml_init
    from sidm_tpu.state import make_particles

    n = 2048
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       n_padded=2304)  # include padding rows
    eps = jnp.full(p.pos.shape[0], 0.01, jnp.float32)
    tree = build_octree(p.pos, jnp.where(p.valid, p.mass, 0.0), eps, p.valid)
    out = tree_hsml_init(p, tree, 30, iters=8)
    cnt = np.asarray(out.ngb_vd)[:n]
    h = np.asarray(out.hsml_vd)
    assert ((cnt >= 20) & (cnt <= 45)).mean() > 0.9
    for i in range(0, n, 73):
        d = np.linalg.norm(pos - pos[i], axis=1)
        assert cnt[i] == int(((d < h[i]) & (d > 0)).sum()), i


def test_hsml_controller_converges():
    """Starting from a poor h guess, the multiplicative controller must pull
    neighbour counts into the band within a few passes."""
    import dataclasses
    p, params = _setup(2048, seed=4)
    n = 2048
    # perturb h badly
    p = dataclasses.replace(
        p, hsml_vd=jnp.asarray(np.asarray(p.hsml_vd) * 2.5))
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    root = run_key(3, 3)
    for i in range(12):
        p, _ = sidm_scatter_tree(p, p.pos, tree, jnp.float32(1e-6), p.valid,
                                 jnp.float32(5.0), step_key(root, i), params,
                                 salt=i)
    cnt = np.asarray(p.ngb_vd)[:n]
    frac_in_band = ((cnt >= 28) & (cnt <= 32)).mean()
    assert frac_in_band > 0.85, frac_in_band
