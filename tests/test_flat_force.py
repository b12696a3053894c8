"""Flat pair-queue engine vs the direct-summation oracle.

Same oracle strategy as test_fused_force.py (force_treeevaluate_direct,
forcetree.c:1896-1975; BASELINE bar p99 rel. error <= 1e-3), plus the
multi-chip shard-partition identity."""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.io import ics
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.flat_force import FlatConfig, flat_gravity

CFG = FlatConfig(chunk=8192, near_chunk=4096, pair_cap=1 << 20)


def _err(acc_t, acc_d):
    acc_t, acc_d = np.asarray(acc_t), np.asarray(acc_d)
    return (np.linalg.norm(acc_t - acc_d, axis=1)
            / np.maximum(np.linalg.norm(acc_d, axis=1), 1e-12))


def _setup(n, seed=11, model="plummer"):
    gen = getattr(ics, model)
    pos, _, m = gen(n, seed=seed)
    pos = jnp.asarray(pos, jnp.float32)
    m = jnp.asarray(m, jnp.float32)
    eps = jnp.full(n, 0.05, jnp.float32)
    return pos, m, eps


@pytest.mark.parametrize("n", [999, 4096])
def test_flat_bh_vs_direct(n):
    pos, m, eps = _setup(n)
    acc_d, pot_d = direct_gravity(pos, m, eps)
    acc_t, pot_t, info = flat_gravity(
        pos, m, eps, jnp.zeros(n, jnp.float32), theta=0.5, opening=0,
        config=CFG, return_info=True)
    assert int(info["ovf_open"]) == 0
    assert int(info["ovf_seg"]) == 0
    assert int(info["ovf_big"]) == 0
    err = _err(acc_t, acc_d)
    assert np.quantile(err, 0.99) < 1e-3
    perr = np.abs(np.asarray(pot_t) - np.asarray(pot_d)) \
        / np.maximum(np.abs(np.asarray(pot_d)), 1e-12)
    assert np.quantile(perr, 0.99) < 2e-3


def test_flat_relative_criterion_vs_direct():
    n = 3000
    pos, m, eps = _setup(n, seed=7, model="hernquist")
    acc_d, _ = direct_gravity(pos, m, eps)
    acc_0, _ = flat_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                            theta=0.5, opening=1, config=CFG)
    old = jnp.linalg.norm(acc_0, axis=1)
    acc_t, _, info = flat_gravity(pos, m, eps, old, theta=0.5, opening=1,
                                  err_tol_force_acc=0.005, config=CFG,
                                  return_info=True)
    assert int(info["ovf_open"]) == 0
    err = _err(acc_t, acc_d)
    assert np.quantile(err, 0.99) < 1e-3


def test_flat_matches_fused():
    from sidm_tpu.ops.fused_force import fused_gravity

    n = 2048
    pos, m, eps = _setup(n, seed=3)
    old = jnp.zeros(n, jnp.float32)
    acc_a, pot_a = flat_gravity(pos, m, eps, old, theta=0.6, opening=0,
                                config=CFG)
    acc_b, pot_b = fused_gravity(pos, m, eps, old, theta=0.6, opening=0)
    # same tree and MAC, but the flat engine uses the tighter BMAX
    # containment guard (forcetree.c:1254-1257) while the blocked engine
    # opens anything within sqrt(3)*len — interaction sets differ by a
    # few far/open decisions, both within the 1e-3 oracle bar
    np.testing.assert_allclose(np.asarray(acc_a), np.asarray(acc_b),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pot_a), np.asarray(pot_b),
                               rtol=2e-3, atol=2e-3)


def test_flat_shard_partition_identity():
    from sidm_tpu.ops.flat_force import flat_gravity_tree
    from sidm_tpu.ops.tree import build_octree

    n = 1500
    pos, m, eps = _setup(n, seed=5, model="hernquist")
    old = jnp.zeros(n, jnp.float32)
    tree = build_octree(pos, m, eps, m > 0, box=0.0, depth=10)
    full, _ = flat_gravity_tree(tree, m, eps, old, theta=0.5, opening=0,
                                config=CFG, need_pot=False)
    parts = sum(
        flat_gravity_tree(tree, m, eps, old, theta=0.5, opening=0,
                          config=CFG, need_pot=False,
                          shard=(jnp.int32(s), 4))[0]
        for s in range(4))
    np.testing.assert_allclose(np.asarray(parts), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_flat_padding_invalid_particles():
    n, npad = 900, 1024
    pos, m, eps = _setup(n)
    posp = jnp.concatenate([pos, jnp.zeros((npad - n, 3), jnp.float32)])
    mp = jnp.concatenate([m, jnp.zeros(npad - n, jnp.float32)])
    epsp = jnp.concatenate([eps, jnp.full(npad - n, 0.05, jnp.float32)])
    acc_p, _ = flat_gravity(posp, mp, epsp, jnp.zeros(npad, jnp.float32),
                            theta=0.5, opening=0, config=CFG)
    acc, _ = flat_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                          theta=0.5, opening=0, config=CFG)
    np.testing.assert_allclose(np.asarray(acc_p[:n]), np.asarray(acc),
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(acc_p[n:]) == 0.0)
