"""Cached SIDM candidate lists (ops/list_range.py) vs the range walk.

With fresh candidate lists on the same tree, the list engine enumerates a
SUPERSET of each gated target's true neighbours; the kernel weight and
the per-(i,j,step) Gumbel keys are identical, so P_tot, neighbour counts,
partner selection, and kicks must match the fused range walk EXACTLY
(not just statistically)."""
import numpy as np
import jax.numpy as jnp

from sidm_tpu.ops.fused_range import sidm_scatter_fused
from sidm_tpu.ops.list_range import (RangeListConfig,
                                     record_candidates_from_particles,
                                     sidm_scatter_lists)
from sidm_tpu.ops.neighbors import setup_smoothing_lengths
from sidm_tpu.ops.sidm import SidmParams
from sidm_tpu.ops.tree import build_octree, refresh_octree
from sidm_tpu.rng import run_key
from sidm_tpu.state import make_particles


def _setup(n=4096, seed=0, sigma=2.0, maintenance=1.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2, box=1.0)
    params = SidmParams(sigma, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0,
                        0.0, maintenance_rate=maintenance)
    eps = jnp.full(n, 0.01, jnp.float32)
    # periodic box: uniform density everywhere, so the hsml controller's
    # neighbour band holds for every particle and candidate counts are
    # bounded (open boundaries leave edge particles with huge unconverged
    # h in this synthetic setup)
    tree = build_octree(p.pos, p.mass, eps, p.valid, box=1.0)
    return p, params, tree, eps


def test_matches_range_walk_exactly():
    p, params, tree, eps = _setup(4096, seed=1)
    t = jnp.float32(0.01)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel ** 2, -1)))
    key = run_key(3, 9)

    cands = record_candidates_from_particles(p, p.pos, tree, skin=0.0,
                                             params=params, box=1.0)
    assert int(np.asarray(cands.ovf).sum()) == 0

    p_w, ns_w = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax, key,
                                   params, salt=5, box=1.0)
    p_l, ns_l, viol, ovf_g = sidm_scatter_lists(p, p.pos, tree, cands, t,
                                                p.valid, vmax, key, params,
                                                salt=5, box=1.0)
    assert int(np.asarray(ovf_g).sum()) == 0
    assert int(ns_l) == int(ns_w)
    np.testing.assert_array_equal(np.asarray(p_l.ngb_vd),
                                  np.asarray(p_w.ngb_vd))
    np.testing.assert_allclose(np.asarray(p_l.dvel), np.asarray(p_w.dvel),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p_l.hsml_vd),
                               np.asarray(p_w.hsml_vd), rtol=1e-6)


def test_valid_under_skin_drift():
    """Candidates recorded with a skin stay exact after a small drift."""
    p, params, tree, eps = _setup(4096, seed=2)
    t = jnp.float32(0.01)
    key = run_key(4, 4)
    skin = 0.02
    cands = record_candidates_from_particles(p, p.pos, tree, skin=skin,
                                             params=params, box=1.0)

    rng = np.random.default_rng(7)
    dpos = jnp.asarray(rng.uniform(-1, 1, p.pos.shape) * 0.4 * skin
                       / np.sqrt(3.0), jnp.float32)
    import dataclasses
    p2 = dataclasses.replace(p, pos=p.pos + dpos)
    tree2 = refresh_octree(tree, p2.pos, p2.mass, eps, p2.valid, box=1.0)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p2.vel ** 2, -1)))

    p_w, ns_w = sidm_scatter_fused(p2, p2.pos, tree2, t, p2.valid, vmax,
                                   key, params, salt=11, box=1.0)
    p_l, ns_l, viol, ovf_g = sidm_scatter_lists(p2, p2.pos, tree2, cands,
                                                t, p2.valid, vmax, key,
                                                params, salt=11, box=1.0)
    assert float(viol) <= 0.0
    assert int(ns_l) == int(ns_w)
    np.testing.assert_array_equal(np.asarray(p_l.ngb_vd),
                                  np.asarray(p_w.ngb_vd))
    np.testing.assert_allclose(np.asarray(p_l.dvel), np.asarray(p_w.dvel),
                               rtol=1e-5, atol=1e-7)


def test_momentum_energy_per_event():
    p, params, tree, eps = _setup(4096, seed=3, sigma=6.0)
    t = jnp.float32(0.05)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel ** 2, -1)))
    cands = record_candidates_from_particles(p, p.pos, tree, skin=0.0,
                                             params=params, box=1.0)
    p_l, ns, viol, ovf = sidm_scatter_lists(p, p.pos, tree, cands, t,
                                            p.valid, vmax, run_key(9, 9),
                                            params, salt=1, box=1.0)
    assert int(ns) > 0
    m = np.asarray(p.mass)[:, None]
    dv = np.asarray(p_l.dvel)
    # pairwise +/- kicks: total momentum change is zero
    np.testing.assert_allclose((m * dv).sum(0), 0.0, atol=1e-4)


def test_two_tier_eval_matches_walk():
    """Force the tail tier to carry real targets (k_dense far below the
    typical list length): the two-tier split must still reproduce the
    range walk exactly — same gates, same Gumbel keys, same kicks."""
    p, params, tree, eps = _setup(4096, seed=4, sigma=4.0)
    t = jnp.float32(0.02)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel ** 2, -1)))
    key = run_key(8, 2)
    rcfg = RangeListConfig(k_dense=48, tail_frac=1.0, k_cap=512)
    cands = record_candidates_from_particles(p, p.pos, tree, skin=0.0,
                                             params=params, box=1.0,
                                             rcfg=rcfg)
    assert int(np.asarray(cands.ovf).sum()) == 0
    # the split actually exercises both tiers
    ncand = np.asarray(cands.ncand)
    assert (ncand > 48).sum() > 100 and (ncand <= 48).sum() > 100

    p_w, ns_w = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax, key,
                                   params, salt=7, box=1.0)
    p_l, ns_l, viol, ovf_g = sidm_scatter_lists(p, p.pos, tree, cands, t,
                                                p.valid, vmax, key, params,
                                                salt=7, box=1.0, rcfg=rcfg)
    assert int(np.asarray(ovf_g).sum()) == 0
    assert int(ns_l) == int(ns_w)
    np.testing.assert_array_equal(np.asarray(p_l.ngb_vd),
                                  np.asarray(p_w.ngb_vd))
    np.testing.assert_allclose(np.asarray(p_l.dvel), np.asarray(p_w.dvel),
                               rtol=1e-5, atol=1e-7)


def test_two_tier_eval_small_n_below_caps():
    """Regression: n smaller than the gated/tail compaction capacities
    (the phased driver's small-run path) — the compacted tid arrays must
    pad to exactly the static capacity (r5 reshape bug)."""
    from sidm_tpu.ops.list_range import _eval_gated

    n, K = 1024, 64
    params = SidmParams(1.0, 0, 1.0, 1.0, 0.0, 16, 2, False, 1.0, 0.0,
                        0.0)
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(0, 1, (n, 8)).astype(np.float32))
    cand = jnp.asarray(rng.integers(0, n, (n, K)).astype(np.int32))
    ncand = jnp.asarray(rng.integers(0, K, n).astype(np.int32))
    hs = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    dts = jnp.full(n, 0.01, jnp.float32)
    typs = jnp.ones(n, jnp.int32)
    out = _eval_gated(rows, cand, ncand, hs, dts, typs, jnp.uint32(1),
                      jnp.float32(1.0), jnp.float32(1.0), params,
                      4096, 4096, 32, 0.0)
    assert np.asarray(out[0]).shape == (n,)
    assert np.isfinite(np.asarray(out[0])).all()
