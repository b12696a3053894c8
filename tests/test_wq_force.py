"""Work-queue engine vs the fused engine and the direct oracle.

The wq engine reuses the fused engine's classify/far/near math over the
identical group windows, so the accepted pair sets match EXACTLY and the
two engines must agree to summation-reorder tolerance. Oracle bars are
the same as test_fused_force.py (forcetree.c:1896-1975 direct check)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.io import ics
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.fused_force import FusedConfig, fused_gravity
from sidm_tpu.ops.wq_force import wq_gravity


def _err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return (np.linalg.norm(a - b, axis=1)
            / np.maximum(np.linalg.norm(b, axis=1), 1e-12))


def _setup(n, seed=11, model="plummer"):
    gen = getattr(ics, model)
    pos, _, m = gen(n, seed=seed)
    pos = jnp.asarray(pos, jnp.float32)
    m = jnp.asarray(m, jnp.float32)
    eps = jnp.full(n, 0.05, jnp.float32)
    return pos, m, eps


@pytest.mark.parametrize("opening", [0, 1])
def test_wq_matches_fused(opening):
    n = 4096
    pos, m, eps = _setup(n)
    old = jnp.zeros(n, jnp.float32)
    if opening == 1:
        acc0, _ = fused_gravity(pos, m, eps, old, theta=0.5, opening=1)
        old = jnp.linalg.norm(acc0, axis=1)
    acc_f, pot_f, info_f = fused_gravity(
        pos, m, eps, old, theta=0.5, opening=opening, return_info=True)
    acc_w, pot_w, info_w = wq_gravity(
        pos, m, eps, old, theta=0.5, opening=opening, return_info=True)
    assert int(info_w["ovf_open"]) == 0
    assert int(info_w["ovf_big"]) == 0
    assert int(info_w["ovf_items"]) == 0
    # identical pair sets -> identical segment counts
    assert int(info_w["n_segs"]) == int(info_f["n_segs"])
    err = _err(acc_w, acc_f)
    assert np.quantile(err, 0.999) < 2e-5
    np.testing.assert_allclose(np.asarray(pot_w), np.asarray(pot_f),
                               rtol=2e-5, atol=1e-7)


def test_wq_vs_direct_oracle():
    n = 4096
    pos, m, eps = _setup(n)
    acc_d, pot_d = direct_gravity(pos, m, eps)
    acc_w, pot_w, info = wq_gravity(
        pos, m, eps, jnp.zeros(n, jnp.float32), theta=0.5, opening=0,
        return_info=True)
    assert int(info["ovf_items"]) == 0
    assert np.quantile(_err(acc_w, acc_d), 0.99) < 1e-3
    perr = np.abs(np.asarray(pot_w) - np.asarray(pot_d)) \
        / np.maximum(np.abs(np.asarray(pot_d)), 1e-12)
    assert np.quantile(perr, 0.99) < 2e-3


def test_wq_periodic_treepm_short_range_matches_fused():
    n = 2048
    rng = np.random.default_rng(3)
    box = 1.0
    pos = jnp.asarray(rng.random((n, 3)) * box, jnp.float32)
    m = jnp.full(n, 1.0 / n, jnp.float32)
    eps = jnp.full(n, 0.01, jnp.float32)
    old = jnp.zeros(n, jnp.float32)
    pbc = (box, 8.0, 0.4)   # (box, alpha, rcut)
    acc_f, pot_f = fused_gravity(pos, m, eps, old, theta=0.5, opening=0,
                                 pbc=pbc)
    acc_w, pot_w, info = wq_gravity(pos, m, eps, old, theta=0.5,
                                    opening=0, pbc=pbc, return_info=True)
    assert int(info["ovf_items"]) == 0
    scale = np.maximum(np.linalg.norm(np.asarray(acc_f), axis=1).max(),
                       1e-12)
    np.testing.assert_allclose(np.asarray(acc_w), np.asarray(acc_f),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(pot_w), np.asarray(pot_f),
                               rtol=3e-5, atol=1e-7)


def test_wq_pallas_matches_fused():
    """The Pallas classify+far kernel (interpret mode on CPU) against the
    fused engine: identical pair sets, reorder-level agreement."""
    n = 2048
    pos, m, eps = _setup(n, seed=5)
    old = jnp.zeros(n, jnp.float32)
    acc_f, pot_f, info_f = fused_gravity(
        pos, m, eps, old, theta=0.5, opening=0, depth=8, return_info=True)
    cfgp = FusedConfig(wq_pallas=True)
    acc_w, pot_w, info_w = wq_gravity(
        pos, m, eps, old, theta=0.5, opening=0, depth=8, config=cfgp,
        return_info=True)
    assert int(info_w["ovf_items"]) == 0
    assert int(info_w["n_segs"]) == int(info_f["n_segs"])
    assert np.quantile(_err(acc_w, acc_f), 0.999) < 2e-5
    np.testing.assert_allclose(np.asarray(pot_w), np.asarray(pot_f),
                               rtol=2e-5, atol=1e-7)


def test_wq_invalid_particles_ignored():
    n = 1500
    pos, m, eps = _setup(n, seed=13)
    m = m.at[::7].set(0.0)
    acc, pot = wq_gravity(pos, m, eps, jnp.zeros(n, jnp.float32),
                          theta=0.5, opening=0)
    assert np.all(np.asarray(acc)[::7] == 0.0)
    assert np.all(np.asarray(pot)[::7] == 0.0)
    assert np.all(np.isfinite(np.asarray(acc)))
