"""Cached interaction lists (ops/list_force.py).

Oracles: the fused engine (identical pair partition at skin=0 on a fresh
tree), the O(N^2) direct sum (MAC-level accuracy bar, p99 <= 1e-3), and
ListMode on/off equivalence at the simulation level.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sidm_tpu.io import ics
from sidm_tpu.ops import fused_force as ff
from sidm_tpu.ops import list_force as lf
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.tree import build_octree, refresh_octree


def _setup(n=2500, seed=7):
    pos, vel, mass = ics.nfw(n, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=seed)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(n, 0.3, jnp.float32)
    valid = jnp.ones(n, bool)
    old_acc = jnp.zeros(n, jnp.float32)
    tree = build_octree(pos, mass, eps, valid, box=0.0,
                        depth=ff.default_depth(n))
    return pos, vel, mass, eps, valid, old_acc, tree


def test_list_eval_matches_fused():
    pos, vel, mass, eps, valid, old_acc, tree = _setup()
    cfg = ff.FusedConfig()
    acc_f, pot_f = ff.fused_gravity_tree(tree, mass, eps, old_acc,
                                         theta=0.5, opening=1,
                                         err_tol_force_acc=0.005,
                                         config=cfg, need_pot=True)
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg)
    assert int(lists.ovf.sum()) == 0
    acc_l, pot_l = lf.eval_lists(tree, lists, mass, eps, cfg=cfg,
                                 need_pot=True)
    da = np.linalg.norm(np.asarray(acc_l - acc_f), axis=1)
    na = np.linalg.norm(np.asarray(acc_f), axis=1)
    assert np.percentile(da / np.maximum(na, 1e-20), 99) < 1e-5
    dp = np.abs(np.asarray(pot_l - pot_f))
    assert np.percentile(dp / np.maximum(np.abs(np.asarray(pot_f)),
                                         1e-20), 99) < 1e-5


def test_list_eval_direct_oracle():
    pos, vel, mass, eps, valid, old_acc, tree = _setup()
    cfg = ff.FusedConfig()
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg)
    acc_l, _ = lf.eval_lists(tree, lists, mass, eps, cfg=cfg,
                             need_pot=False)
    acc_d, _ = direct_gravity(pos, mass, eps, with_potential=False)
    rel = (np.linalg.norm(np.asarray(acc_l - acc_d), axis=1)
           / np.maximum(np.linalg.norm(np.asarray(acc_d), axis=1), 1e-20))
    assert np.percentile(rel, 99) <= 1e-3


def test_cached_lists_stay_valid_under_skin():
    """Drift every particle by < skin/2, refresh moments, evaluate off the
    STALE lists: the MAC-level accuracy bar must still hold against the
    direct sum at the NEW positions."""
    pos, vel, mass, eps, valid, old_acc, tree = _setup()
    cfg = ff.FusedConfig()
    skin = 1.0
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg, skin=skin)
    key = jax.random.PRNGKey(0)
    step = 0.4 * skin / np.sqrt(3.0)   # |d| <= 0.4 skin < skin/2
    dpos = step * (2.0 * jax.random.uniform(key, pos.shape) - 1.0)
    pos2 = pos + dpos
    tree2 = refresh_octree(tree, pos2, mass, eps, valid, box=0.0)
    md = float(lf.max_displacement(lists, tree2.pos_s))
    assert md <= 0.5 * skin + 1e-6
    acc_l, _ = lf.eval_lists(tree2, lists, mass, eps, cfg=cfg,
                             need_pot=False)
    acc_d, _ = direct_gravity(pos2, mass, eps, with_potential=False)
    rel = (np.linalg.norm(np.asarray(acc_l - acc_d), axis=1)
           / np.maximum(np.linalg.norm(np.asarray(acc_d), axis=1), 1e-20))
    assert np.percentile(rel, 99) <= 1.5e-3


def test_overflow_counters_fire():
    pos, vel, mass, eps, valid, old_acc, tree = _setup(n=1200)
    cfg = ff.FusedConfig()
    lcfg = lf.ListConfig(far_cap=32, near_cap=32, lvl_cap=32)
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg, lcfg=lcfg)
    assert int(lists.ovf[1]) > 0 or int(lists.ovf[2]) > 0


def test_simulation_list_mode_matches_walk_mode():
    """Full phased steps with ListMode on vs off: identical physics up to
    list-refresh reordering tolerances."""
    from sidm_tpu.config import SimConfig
    from sidm_tpu.simulation import Simulation

    n = 1500
    pos, vel, mass = ics.nfw(n, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=11)

    def run(list_mode):
        cfg = SimConfig(SIDMOn=0, ForceMethod="tree",
                        TypeOfTimestepCriterion=1, ErrTolVelScale=0.66,
                        MaxSizeTimestep=0.05, TimeBegin=0.0, TimeMax=10.0,
                        SofteningHalo=0.3, SofteningHaloMaxPhys=0.3,
                        ErrTolForceAcc=0.005, TreeRefreshSteps=3,
                        ListMode=list_mode)
        sim = Simulation(cfg, mode="phased")
        sim.set_particles_from_arrays(np.asarray(pos), np.asarray(vel),
                                      np.asarray(mass),
                                      np.ones(n, np.int32),
                                      pad_to_multiple=256)
        sim.prepare()
        for _ in range(6):
            sim.step()
        return np.asarray(sim.particles.pos[:n]), \
            np.asarray(sim.particles.vel[:n])

    pos_a, vel_a = run(1)
    pos_b, vel_b = run(0)
    # trajectories agree to MAC-level force differences integrated over
    # 6 steps — loose bound, catches wiring errors not fp noise
    scale = np.percentile(np.linalg.norm(pos_b, axis=1), 50)
    assert np.percentile(np.linalg.norm(pos_a - pos_b, axis=1), 99) \
        < 5e-3 * scale


def test_advance_tree_drift_matches_refresh():
    """Node-vs drift (advance_tree) vs full moments refresh after a small
    drift: forces agree to MAC-level accuracy (the reference runs on
    exactly this approximation between tree updates, forcetree.c vs)."""
    import dataclasses
    pos, vel, mass, eps, valid, old_acc, tree = _setup()
    cfg = ff.FusedConfig()
    skin = 1.0
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg, skin=skin,
                            vel=vel, t_now=0.0)
    vmax = float(jnp.max(jnp.linalg.norm(jnp.asarray(vel, jnp.float32),
                                         axis=1)))
    dt = 0.4 * skin / vmax
    pos2 = pos + jnp.asarray(vel, jnp.float32) * dt
    md = float(jnp.max(jnp.linalg.norm(
        jnp.asarray(vel, jnp.float32) * dt, axis=1)))
    assert md < 0.5 * skin  # setup guard: stays within the skin
    tree_d = lf.advance_tree(tree, lists, pos2, jnp.float32(dt))
    acc_d, _ = lf.eval_lists(tree_d, lists, mass, eps, cfg=cfg,
                             need_pot=False)
    from sidm_tpu.ops.tree import refresh_octree
    tree_r = refresh_octree(tree, pos2, mass, eps, valid, box=0.0)
    acc_r, _ = lf.eval_lists(tree_r, lists, mass, eps, cfg=cfg,
                             need_pot=False)
    acc_x, _ = direct_gravity(pos2, mass, eps, with_potential=False)
    nd = np.linalg.norm(np.asarray(acc_d - acc_x), axis=1)
    nx = np.maximum(np.linalg.norm(np.asarray(acc_x), axis=1), 1e-20)
    # drifted-node eval still meets the oracle bar
    assert np.percentile(nd / nx, 99) <= 1.5e-3
    # and stays close to the exact-moments eval
    dr = np.linalg.norm(np.asarray(acc_d - acc_r), axis=1)
    assert np.percentile(dr / nx, 99) <= 1e-3


def test_materialized_far_matches_gather_eval():
    """lcfg.materialize: the item-major streamed node rows must produce
    the same force as the per-item gather path — fresh (t = t_ref) and
    after a node-vs drift (advance_tree vs the in-tile vcom*dt
    prediction, forcetree.c:941-948)."""
    import dataclasses as _dc

    pos, vel, mass, eps, valid, old_acc, tree = _setup()
    cfg = ff.FusedConfig()
    vel = jnp.asarray(vel, jnp.float32)
    lcfg_g = lf.ListConfig()
    lcfg_m = lf.ListConfig(materialize=True)

    lists_g = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                              theta=0.5, use_relative=True,
                              err_tol_force_acc=0.005, cfg=cfg,
                              lcfg=lcfg_g, vel=vel, t_now=1.0)
    lists_m = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                              theta=0.5, use_relative=True,
                              err_tol_force_acc=0.005, cfg=cfg,
                              lcfg=lcfg_m, vel=vel, t_now=1.0)
    assert int(lists_m.ovf.sum()) == 0, np.asarray(lists_m.ovf)
    assert lists_m.matf is not None

    # fresh: t_now == t_ref, zero drift
    acc_g, pot_g = lf.eval_lists(tree, lists_g, mass, eps, cfg=cfg,
                                 lcfg=lcfg_g, need_pot=True, t_now=1.0)
    acc_m, pot_m = lf.eval_lists(tree, lists_m, mass, eps, cfg=cfg,
                                 lcfg=lcfg_m, need_pot=True, t_now=1.0)
    np.testing.assert_allclose(np.asarray(acc_m), np.asarray(acc_g),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pot_m), np.asarray(pot_g),
                               rtol=1e-5, atol=1e-7)

    # drifted: advance_tree moves node COMs by vcom*dt; the materialized
    # tile predicts the same motion from the recorded vcom slots
    pos2 = pos + 0.02 * vel
    t2 = 1.0 + 0.02
    tree2g = lf.advance_tree(tree, lists_g, pos2, t2)
    acc_g2, _ = lf.eval_lists(tree2g, lists_g, mass, eps, cfg=cfg,
                              lcfg=lcfg_g, need_pot=False, t_now=t2)
    tree2m = lf.advance_tree(tree, lists_m, pos2, t2)
    acc_m2, _ = lf.eval_lists(tree2m, lists_m, mass, eps, cfg=cfg,
                              lcfg=lcfg_m, need_pot=False, t_now=t2)
    da = np.linalg.norm(np.asarray(acc_m2 - acc_g2), axis=1)
    na = np.linalg.norm(np.asarray(acc_g2), axis=1)
    assert np.percentile(da / np.maximum(na, 1e-20), 99) < 1e-5
