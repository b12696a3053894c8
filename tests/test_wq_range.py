"""Work-queue SIDM engine vs the fused-frontier engine.

Both share _tree_sidm_prep/_tree_sidm_finish, the gated group windows,
and the per-(i,j,salt) Gumbel stream, so neighbour counts, partners and
kicks must match the fused engine essentially exactly (tolerated
divergence: last-ulp float association of the P_tot sum via the blocked
range-sum reduction)."""

import numpy as np
import jax.numpy as jnp

from sidm_tpu.ops.fused_range import sidm_scatter_fused
from sidm_tpu.ops.wq_range import sidm_scatter_wq
from sidm_tpu.ops.sidm import SidmParams
from sidm_tpu.ops.neighbors import setup_smoothing_lengths
from sidm_tpu.ops.tree import build_octree
from sidm_tpu.rng import run_key
from sidm_tpu.state import make_particles


def _setup(n=2048, seed=1, sigma=20.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 1, (n, 3))
    vel = rng.normal(0, 1, (n, 3))
    p = make_particles(pos, vel, np.full(n, 1.0 / n), np.ones(n, np.int32),
                       pad_to_multiple=n)
    p = setup_smoothing_lengths(p, 30, 2)
    params = SidmParams(sigma, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0,
                        0.0, maintenance_rate=1.0)
    return p, params


def test_wq_sidm_matches_fused_engine():
    p, params = _setup(2048, seed=1)
    n = 2048
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid)
    t = jnp.float32(0.01)
    key = run_key(5, 5)
    vmax = jnp.float32(5.0)

    pf, nf = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax, key,
                                params, salt=3)
    pw, nw, info = sidm_scatter_wq(p, p.pos, tree, t, p.valid, vmax, key,
                                   params, salt=3, return_info=True)
    assert int(info["ovf_items"]) == 0
    assert int(info["ovf_open"]) == 0

    assert np.array_equal(np.asarray(pf.ngb_vd), np.asarray(pw.ngb_vd))
    np.testing.assert_allclose(np.asarray(pf.hsml_vd),
                               np.asarray(pw.hsml_vd), rtol=1e-6)
    df_ = np.asarray(pf.dvel)
    dw_ = np.asarray(pw.dvel)
    both = (np.any(df_ != 0, axis=1) & np.any(dw_ != 0, axis=1))
    np.testing.assert_allclose(df_[both], dw_[both], rtol=1e-5, atol=1e-7)
    n_mismatch = int(np.sum(np.any(df_ != 0, axis=1)
                            != np.any(dw_ != 0, axis=1)))
    assert n_mismatch <= max(2, int(0.02 * max(int(nf), 1))), \
        (int(nf), int(nw), n_mismatch)


def test_wq_sidm_periodic_matches_fused():
    p, params = _setup(1024, seed=7)
    n = 1024
    eps = jnp.full(n, 0.01, jnp.float32)
    tree = build_octree(p.pos, p.mass, eps, p.valid, box=1.0)
    t = jnp.float32(0.01)
    key = run_key(2, 9)
    vmax = jnp.float32(5.0)

    pf, nf = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax, key,
                                params, salt=1, box=1.0)
    pw, nw, info = sidm_scatter_wq(p, p.pos, tree, t, p.valid, vmax, key,
                                   params, salt=1, box=1.0,
                                   return_info=True)
    assert int(info["ovf_items"]) == 0
    assert np.array_equal(np.asarray(pf.ngb_vd), np.asarray(pw.ngb_vd))
    assert int(nf) == int(nw)
