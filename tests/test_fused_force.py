"""Fused dense Barnes-Hut engine vs the direct-summation oracle.

Same oracle strategy as test_treeforce.py (force_treeevaluate_direct,
forcetree.c:1896-1975; BASELINE bar p99 rel. error <= 1e-3), plus
cross-checks against the legacy flat-pair engine and overflow accounting.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.io import ics
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.fused_force import FusedConfig, fused_gravity


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
def test_fused_bh_vs_direct(n):
    pos, m, eps = _setup(n)
    acc_d, pot_d = direct_gravity(pos, m, eps)
    acc_t, pot_t, info = fused_gravity(
        pos, m, eps, jnp.zeros(n, jnp.float32), theta=0.5, opening=0,
        return_info=True)
    assert int(info["ovf_open"]) == 0
    assert int(info["ovf_big"]) == 0
    err = _err(acc_t, acc_d)
    assert np.quantile(err, 0.99) < 1e-3
    perr = np.abs(np.asarray(pot_t) - np.asarray(pot_d)) \
        / np.maximum(np.abs(np.asarray(pot_d)), 1e-12)
    assert np.quantile(perr, 0.99) < 2e-3


def test_fused_relative_criterion_vs_direct():
    n = 3000
    pos, m, eps = _setup(n, seed=7, model="hernquist")
    acc_d, _ = direct_gravity(pos, m, eps)
    # first pass (no old_acc -> BH fallback), then relative
    acc_0, _ = fused_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                             theta=0.5, opening=1)
    old = jnp.linalg.norm(acc_0, axis=1)
    acc_t, _, info = fused_gravity(pos, m, eps, old, theta=0.5, opening=1,
                                   err_tol_force_acc=0.005, return_info=True)
    assert int(info["ovf_open"]) == 0
    err = _err(acc_t, acc_d)
    assert np.quantile(err, 0.99) < 1e-3


def test_fused_matches_legacy_engine():
    """Both engines satisfy the oracle; agreement bound is loose since the
    group decompositions differ."""
    from sidm_tpu.ops.treeforce import tree_gravity
    n = 2048
    pos, m, eps = _setup(n, seed=9)
    acc_d, _ = direct_gravity(pos, m, eps)
    acc_f, _ = fused_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                             theta=0.4, opening=0)
    acc_l, _ = tree_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                            theta=0.4, opening=0)
    assert np.quantile(_err(acc_f, acc_d), 0.99) < 1e-3
    assert np.quantile(_err(acc_l, acc_d), 0.99) < 1e-3


def test_fused_invalid_particles_ignored():
    n = 1500
    pos, m, eps = _setup(n, seed=13)
    m = m.at[n // 2:].set(0.0)  # invalid
    acc_t, pot_t = fused_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                                 theta=0.5, opening=0)
    acc_d, _ = direct_gravity(pos, m, eps)
    err = _err(acc_t[: n // 2], acc_d[: n // 2])
    assert np.quantile(err, 0.99) < 1e-3
    assert np.all(np.asarray(acc_t[n // 2:]) == 0.0)


def test_fused_momentum_balance():
    """Newton's third law: total force ~ 0 for equal-mass isolated system."""
    n = 4000
    pos, m, eps = _setup(n, seed=21)
    acc_t, _ = fused_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                             theta=0.5, opening=0)
    net = np.asarray(jnp.sum(m[:, None] * acc_t, axis=0))
    scale = float(jnp.mean(jnp.linalg.norm(acc_t, axis=1) * m))
    assert np.linalg.norm(net) < 5e-2 * scale * np.sqrt(n)


def test_fused_small_n_edge():
    """N below one group and below the start-level cell count."""
    for n in (3, 40, 65):
        pos, m, eps = _setup(max(n, 8), seed=n)
        pos, m, eps = pos[:n], m[:n], eps[:n]
        acc_d, _ = direct_gravity(pos, m, eps)
        acc_t, _ = fused_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                                 theta=0.3, opening=0)
        err = _err(acc_t, acc_d)
        assert np.quantile(err, 0.99) < 2e-3, n
