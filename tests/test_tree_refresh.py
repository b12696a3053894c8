"""Lazy tree refresh (refresh_octree): moments-only rebuild on a frozen
Morton topology, with walk guards inflated by the accumulated drift.

TPU analog of the reference's dynamic node updates + rebuild cadence
(nbody/forcetree.c:433-571,941-948; nbody/gravtree.c:63): between
topology rebuilds the nodes carry EXACT moments (better than the
reference, which drifts stale moments) while containment/opening guards
grow by the measured max displacement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.fused_force import fused_gravity_tree
from sidm_tpu.ops.tree import build_octree, refresh_octree


def _cluster(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    r = np.linalg.norm(x, axis=1, keepdims=True)
    pos = (x / r) * (np.abs(rng.normal(size=(n, 1))) ** 0.7 * 3.0)
    return jnp.asarray(pos, jnp.float32)


def _p99(a, b):
    num = jnp.linalg.norm(a - b, axis=1)
    den = jnp.maximum(jnp.linalg.norm(b, axis=1), 1e-12)
    return float(jnp.percentile(num / den, 99))


@pytest.fixture(scope="module")
def setup():
    n = 4096
    pos = _cluster(n)
    mass = jnp.ones(n, jnp.float32) / n
    eps = jnp.full(n, 0.02, jnp.float32)
    valid = jnp.ones(n, bool)
    tree = build_octree(pos, mass, eps, valid, box=0.0, depth=10)
    return pos, mass, eps, valid, tree


def test_refresh_identity_moments(setup):
    """Refreshing with unchanged positions reproduces the built tree's
    moments (to blocked-range-sum accuracy: absolute error ~128 eps of
    the LOCAL block magnitude, i.e. ~1e-4 at unit position scale) and
    keeps drift at zero."""
    pos, mass, eps, valid, tree = setup
    tr = refresh_octree(tree, pos, mass, eps, valid)
    assert float(tr.drift) == 0.0
    np.testing.assert_allclose(np.asarray(tr.mac_rows),
                               np.asarray(tree.mac_rows), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(tr.quad_rows[:, :7]),
                               np.asarray(tree.quad_rows[:, :7]),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.parametrize("opening", [0, 1])
def test_refresh_force_accuracy(setup, opening):
    """Force p99 error on a drifted-and-refreshed tree stays within the
    oracle bar, even at drift ~ the deepest cell size."""
    pos, mass, eps, valid, tree = setup
    n = pos.shape[0]
    s_deep = float(tree.extent) / (1 << tree.depth)
    rng = np.random.default_rng(1)
    dx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32) * (0.2 * s_deep)

    pos2 = pos + dx
    tr = refresh_octree(tree, pos2, mass, eps, valid)
    accd, _ = direct_gravity(pos2, mass, eps)
    oldacc = (jnp.linalg.norm(accd, axis=1) if opening == 1
              else jnp.zeros(n, jnp.float32))
    accr, _ = fused_gravity_tree(tr, mass, eps, oldacc, theta=0.5,
                                 opening=opening)
    assert _p99(accr, accd) < 1e-3

    # a second consecutive refresh accumulates drift
    pos3 = pos2 + dx
    tr2 = refresh_octree(tr, pos3, mass, eps, valid)
    assert float(tr2.drift) > float(tr.drift)
    accd3, _ = direct_gravity(pos3, mass, eps)
    accr3, _ = fused_gravity_tree(tr2, mass, eps, oldacc, theta=0.5,
                                  opening=opening)
    assert _p99(accr3, accd3) < 1e-3


def test_refresh_flat_engine(setup):
    """The flat pair-queue engine honours the drift guards too."""
    from sidm_tpu.ops.flat_force import default_flat_config, \
        flat_gravity_tree
    pos, mass, eps, valid, tree = setup
    n = pos.shape[0]
    s_deep = float(tree.extent) / (1 << tree.depth)
    rng = np.random.default_rng(2)
    dx = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32) * (0.3 * s_deep)
    pos2 = pos + dx
    tr = refresh_octree(tree, pos2, mass, eps, valid)
    accd, _ = direct_gravity(pos2, mass, eps)
    accr, _ = flat_gravity_tree(tr, mass, eps, jnp.zeros(n, jnp.float32),
                                theta=0.5, opening=0,
                                config=default_flat_config(n))
    assert _p99(accr, accd) < 1e-3


def test_phased_simulation_refresh_cadence():
    """A phased run with TreeRefreshSteps=3 conserves energy like the
    per-step-rebuild run and produces statistically identical dynamics."""
    from sidm_tpu.config import SimConfig
    from sidm_tpu.simulation import Simulation

    def run(refresh_steps):
        n = 2048
        rng = np.random.default_rng(7)
        pos = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
        vel = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
        cfg = SimConfig(
            OutputDir="/tmp/refresh_sim", SnapshotFileBase="s",
            TimeBegin=0.0, TimeMax=1.0, MaxSizeTimestep=0.02,
            ForceMethod="tree", TreeRefreshSteps=refresh_steps,
            SofteningHalo=0.05, ErrTolTheta=0.6,
            TimeBetSnapshot=0.0, TimeBetStatistics=0.0)
        sim = Simulation(cfg, mode="phased", quiet=True)
        sim.set_particles_from_arrays(pos, vel,
                                      np.full(n, 1.0 / n, np.float32),
                                      np.ones(n, np.int32))
        sim.prepare()
        for _ in range(6):
            sim.step()
        return np.asarray(sim.particles.pos), np.asarray(sim.particles.vel)

    p_ref, v_ref = run(1)
    p_lazy, v_lazy = run(3)
    # trajectories agree to force-accuracy level over 6 steps
    scale = np.percentile(np.linalg.norm(p_ref, axis=1), 50)
    err = np.percentile(np.linalg.norm(p_lazy - p_ref, axis=1), 99)
    assert err < 2e-3 * scale


def test_block_range_sum_exact():
    """range_sum over sorted ranges matches segment_sum to f32 hierarchy
    accuracy (rel. err <= ~128 eps) for adversarial segment layouts."""
    import jax

    rng = np.random.default_rng(3)
    n = 40000
    vals = jnp.asarray(rng.normal(size=(n, 4)) ** 2, jnp.float32)
    # random segmentation incl. tiny, block-crossing and huge segments
    nseg = 700
    cuts = np.sort(rng.choice(n, nseg - 1, replace=False))
    starts = np.concatenate([[0], cuts]).astype(np.int32)
    ends = np.concatenate([cuts, [n]]).astype(np.int32)

    from sidm_tpu.ops.tree import block_prefix, range_sum
    bp = block_prefix(vals)
    got = range_sum(bp, jnp.asarray(starts), jnp.asarray(ends))
    seg = np.repeat(np.arange(nseg), np.asarray(ends) - np.asarray(starts))
    want = jax.ops.segment_sum(vals, jnp.asarray(seg), num_segments=nseg)
    # accuracy: absolute error bounded by ~128 eps of the local block
    # magnitude (tiny segments inside large blocks see it as relative
    # error amplification)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=1e-5)
    # empty queries give zero
    z = range_sum(bp, jnp.asarray([5, 100]), jnp.asarray([5, 80]))
    assert float(jnp.max(jnp.abs(z))) == 0.0


def test_periodic_refresh_wrap_invariance():
    """Refreshing a box tree with positions shifted by WHOLE box periods
    (what box_wrap does between refreshes) is a no-op: the minimum-image
    displacement is zero, so drift stays 0 and the refreshed positions
    stay in the build's wrap image (moments unchanged)."""
    import jax.numpy as jnp

    from sidm_tpu.ops.tree import build_octree, refresh_octree

    box = 50.0
    n = 4096
    rng = np.random.default_rng(5)
    pos = jnp.asarray((rng.standard_normal((n, 3)) * 5.0) % box,
                      jnp.float32)
    mass = jnp.ones(n, jnp.float32)
    eps = jnp.full(n, 0.1, jnp.float32)
    valid = jnp.ones(n, bool)
    tree = build_octree(pos, mass, eps, valid, box=box, depth=8)

    # shift a random subset by +-box per component (a wrap event)
    shift = jnp.asarray(
        box * rng.integers(-1, 2, (n, 3)).astype(np.float32))
    tr = refresh_octree(tree, pos + shift, mass, eps, valid, box=box)
    # not exactly zero: (pos+box)-pos carries ~box*eps_f32 rounding
    assert float(tr.drift) <= 4.0 * box * np.finfo(np.float32).eps
    np.testing.assert_allclose(np.asarray(tr.mac_rows),
                               np.asarray(tree.mac_rows), rtol=1e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(tr.pos_s),
                               np.asarray(tree.pos_s), atol=1e-4)


def test_sparse_range_max_exact():
    """sparse_max_table/range_max equals brute-force range maxima (exact:
    max is idempotent, overlapping power-of-two windows lose nothing)."""
    from sidm_tpu.ops.tree import range_max, sparse_max_table

    rng = np.random.default_rng(1)
    for _ in range(8):
        n = int(rng.integers(5, 3000))
        vals = rng.random(n).astype(np.float32)
        tab = sparse_max_table(jnp.asarray(vals))
        q = 100
        a = rng.integers(0, n, q)
        b = np.minimum(a + rng.integers(1, n, q), n)
        got = np.asarray(range_max(tab, jnp.asarray(a, jnp.int32),
                                   jnp.asarray(b, jnp.int32)))
        want = np.array([vals[x:y].max() for x, y in zip(a, b)],
                        np.float32)
        np.testing.assert_array_equal(got, want)


def test_build_emax_multi_softening():
    """Non-uniform softening builds: node eps_max from the scatter-free
    range-max table equals brute-force maxima over the node ranges."""
    from sidm_tpu.ops.tree import build_octree

    rng = np.random.default_rng(2)
    n = 4096
    pos = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    eps = jnp.asarray(rng.uniform(0.05, 0.3, n).astype(np.float32))
    valid = jnp.asarray(rng.random(n) < 0.95)
    mass = jnp.where(valid, 1.0, 0.0).astype(jnp.float32)
    tree = build_octree(pos, mass, eps, valid, box=0.0, depth=7)
    perm = np.asarray(tree.perm)
    eps_s = np.where(np.asarray(valid)[perm], np.asarray(eps)[perm], 0.0)
    ns = np.asarray(tree.node_start)
    nc = np.asarray(tree.node_count)
    got = np.asarray(tree.quad_rows[:, 6])
    live = nc > 0
    want = np.array([eps_s[s:s + c].max() if c else 0.0
                     for s, c in zip(ns, nc)], np.float32)
    np.testing.assert_allclose(got[live], want[live], atol=1e-7)
