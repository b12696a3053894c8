"""Fused-frontier SIDM engine vs the tree-segment engine.

Both share _tree_sidm_prep/_tree_sidm_finish and the per-(i,j,salt) Gumbel
stream, so per-particle outputs (neighbour counts, P_tot-driven decisions,
partners, kicks) must match the segment engine essentially exactly — the
only tolerated differences are last-ulp float association in the P_tot sum.
"""

import numpy as np
import jax.numpy as jnp

from sidm_tpu.ops.fused_range import sidm_scatter_fused
from sidm_tpu.ops.sidm import SidmParams
from sidm_tpu.ops.sidm_tree import sidm_scatter_tree
from sidm_tpu.ops.neighbors import setup_smoothing_lengths
from sidm_tpu.ops.tree import build_octree
from sidm_tpu.rng import run_key
from sidm_tpu.state import make_particles


def _setup(n=2048, seed=1, sigma=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2)
    params = SidmParams(sigma, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0,
                        0.0, maintenance_rate=1.0)
    return p, params


def test_fused_matches_segment_engine():
    p, params = _setup(2048, seed=1, sigma=20.0)
    n = 2048
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    t = jnp.float32(0.01)
    key = run_key(5, 5)
    vmax = jnp.float32(5.0)

    pt, nt = sidm_scatter_tree(p, p.pos, tree, t, p.valid, vmax, key,
                               params, salt=3)
    pf, nf = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax, key,
                                params, salt=3)

    # neighbour counts: exact (same enumeration within h)
    assert np.array_equal(np.asarray(pt.ngb_vd), np.asarray(pf.ngb_vd))
    # hsml controller: driven by counts, so exact
    np.testing.assert_allclose(np.asarray(pt.hsml_vd),
                               np.asarray(pf.hsml_vd), rtol=1e-6)
    # scatter events: same Gumbel stream -> same partners and kicks (the
    # only tolerated divergence is a rand-vs-P_tot decision flipped by
    # last-ulp association of the P_tot sum)
    dt_ = np.asarray(pt.dvel)
    df_ = np.asarray(pf.dvel)
    both = (np.any(dt_ != 0, axis=1) & np.any(df_ != 0, axis=1))
    np.testing.assert_allclose(dt_[both], df_[both], rtol=1e-5, atol=1e-7)
    n_mismatch = int(np.sum(np.any(dt_ != 0, axis=1)
                            != np.any(df_ != 0, axis=1)))
    assert n_mismatch <= max(2, int(0.02 * max(int(nt), 1))), \
        (int(nt), int(nf), n_mismatch)


def test_fused_counts_brute_force():
    p, params = _setup(1024, seed=4)
    n = 1024
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    pp, ns = sidm_scatter_fused(p, p.pos, tree, jnp.float32(0.01), p.valid,
                                jnp.float32(5.0), run_key(1, 1), params,
                                salt=3)
    cnt = np.asarray(pp.ngb_vd)
    pos = np.asarray(p.pos)
    h = np.asarray(p.hsml_vd)
    for i in range(0, n, 11):
        d = np.linalg.norm(pos - pos[i], axis=1)
        ref = int(((d < h[i]) & (d > 0)).sum())
        assert cnt[i] == ref, i


def test_hsml_init_fused_counts_exact():
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_range import tree_hsml_init_fused

    n = 1024
    pos, vel, m = ics.plummer(n, seed=5)
    p = make_particles(pos, vel, m, np.ones(n, np.int32), pad_to_multiple=n)
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid, depth=10)
    p2 = tree_hsml_init_fused(p, tree, 30, iters=8)
    cnt = np.asarray(p2.ngb_vd)
    h = np.asarray(p2.hsml_vd)
    P = np.asarray(p.pos)
    for i in range(0, n, 7):
        d = np.linalg.norm(P - P[i], axis=1)
        assert cnt[i] == int(((d < h[i]) & (d > 0)).sum()), i
    # controller converged to ~DesNumNgb for the bulk
    mid = np.quantile(cnt, 0.5)
    assert 20 <= mid <= 45


def test_fused_walk_no_overflow():
    """The range walk must be exhaustive: open/big overflow counters stay
    zero on a clustered distribution with realistic (sparse) gating —
    dropped cells would silently bias scattering rates low."""
    n = 8192
    rng = np.random.default_rng(9)
    x = rng.normal(size=(n, 3))
    r = np.linalg.norm(x, axis=1, keepdims=True)
    pos = (x / r) * (np.abs(rng.normal(size=(n, 1))) ** 0.7 * 3.0)
    vel = rng.normal(0, 0.3, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2)
    params = SidmParams(5.0, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0,
                        0.0, maintenance_rate=0.05)
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid, depth=10)
    out = sidm_scatter_fused(p, p.pos, tree, jnp.float32(0.01), p.valid,
                             jnp.float32(3.0), run_key(7, 7), params,
                             salt=5, return_info=True)
    info = out[-1]
    assert int(info["ovf_open"]) == 0, int(info["ovf_open"])
    assert int(info["ovf_big"]) == 0, int(info["ovf_big"])
    assert int(info["n_gated"]) > 0


def test_periodic_hsml_counts_exact_min_image():
    """tree_hsml_init_fused(box=...) neighbour counts equal brute-force
    minimum-image counts for a cluster straddling the box corner."""
    from sidm_tpu.ops.fused_range import tree_hsml_init_fused

    box = 50.0
    n = 2048
    rng = np.random.default_rng(3)
    pos = (rng.standard_normal((n, 3)) * 3.0) % box
    p = make_particles(pos, np.zeros((n, 3)), np.ones(n),
                       np.ones(n, np.int32), pad_to_multiple=n)
    eps = jnp.full(n, 0.1, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid, box=box, depth=8)
    p2 = tree_hsml_init_fused(p, tree, 30, box=box)
    h = np.asarray(p2.hsml_vd)
    cnt = np.asarray(p2.ngb_vd)
    d = pos[None, :, :] - pos[:, None, :]
    d -= box * np.round(d / box)
    r = np.sqrt((d ** 2).sum(-1))
    want = ((r < h[:, None]).sum(1) - 1).astype(np.int32)
    np.testing.assert_array_equal(cnt, want)
