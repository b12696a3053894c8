"""Component attribution for the per-step SIDM list eval at flagship N.

The CpuLog phase marks under-report on the axon remote backend
(block_until_ready returns before the device queue drains); this script
uses a host transfer as the true barrier, like profile_list.py.

Run: python scripts/profile_sidm_eval.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    float(np.asarray(leaves[-1]).ravel()[0].astype(np.float32))


def timeit(label, fn, *a, reps=REPS):
    t0 = time.time()
    out = fn(*a)
    force(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        o = fn(*a)
        force(o)
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms   (compile+1st {tc:.1f}s)",
          flush=True)
    return out, dt


def main():
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import default_depth
    from sidm_tpu.ops.list_range import (RangeListConfig, _eval_gated,
                                         record_candidates_from_particles,
                                         sidm_scatter_lists)
    from sidm_tpu.ops.sidm import SidmParams
    from sidm_tpu.ops.sidm_tree import _tree_sidm_finish, _tree_sidm_prep
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.rng import run_key
    from sidm_tpu.simulation import Simulation

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    cfg = SimConfig(
        SIDMOn=1, CrossSection=38.2614, ProbabilityTol=0.2,
        ForceMethod="tree", SofteningHalo=0.3, DesNumNgb=30,
        ReflectionBoundary=1114.35,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5, MaxSizeTimestep=0.1,
        TypeOfTimestepCriterion=1, ErrTolVelScale=0.66)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(N, np.int32),
                                  pad_to_multiple=4096)
    # initial hsml via the tree init (prepare is too heavy; mirrors it)
    from sidm_tpu.ops.fused_range import tree_hsml_init_fused
    from sidm_tpu.simulation import softening_table
    soft = jnp.asarray(softening_table(cfg, 0.0), jnp.float32)
    p = sim.particles
    eps = soft[jnp.clip(p.ptype, 0, 5)]
    tree = build_octree(p.pos, jnp.where(p.valid, p.mass, 0.0), eps,
                        p.valid, box=0.0, depth=default_depth(p.n_padded))
    p = tree_hsml_init_fused(p, tree, cfg.DesNumNgb, box=0.0)

    params = sim._sidm_params_for_phased()
    import dataclasses
    p = dataclasses.replace(
        p, current_time=jnp.full_like(p.current_time, -0.005))
    t_next = jnp.float32(0.0)
    active = p.valid
    vmax = jnp.sqrt(jnp.max(jnp.sum(p.vel**2, -1)))
    key = run_key(3, 3)
    rcfg = RangeListConfig()

    def rec():
        # host glue over the inner jits (an outer jit would inline the
        # particle arrays as HLO constants -> remote-compile HTTP 413)
        return record_candidates_from_particles(
            p, p.pos, tree, skin=jnp.float32(0.5), params=params,
            box=0.0, rcfg=rcfg)
    cands, _ = timeit("record_candidates (skin=0.5)", rec, reps=1)
    ncand = np.asarray(cands.ncand)
    n_long = int((ncand > rcfg.k_dense).sum())
    print(f"  ncand mean/p95/max = {ncand.mean():.0f}/"
          f"{np.percentile(ncand, 95):.0f}/{ncand.max()}  "
          f">k_dense: {n_long}", flush=True)
    rcfg = rcfg._replace(tail_cap=max(4096, -(-int(1.3 * n_long) // 4096)
                                      * 4096))
    print(f"  tail_cap fitted: {rcfg.tail_cap}", flush=True)

    def full(salt):
        return sidm_scatter_lists(
            p, p.pos, tree, cands, t_next, active, vmax, key, params,
            salt=salt, box=0.0, rcfg=rcfg)[0].dvel
    timeit("sidm_scatter_lists FULL", full, jnp.uint32(3))

    def prep():
        return _tree_sidm_prep(p, p.pos, tree.perm, t_next, active, vmax,
                               key, params)
    (rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand), _ = \
        timeit("  _tree_sidm_prep", prep)
    print(f"  gated: {int(np.asarray(scan).sum())} of {N}", flush=True)

    n = p.pos.shape[0]
    ngc = max(4096, -(-int(rcfg.gated_frac * n) // 4096) * 4096)
    kd = min(rcfg.k_dense, rcfg.k_cap)

    def ev2(salt):
        return _eval_gated(rows, cands.cand, cands.ncand, hs, dts, typs,
                           salt, t_next, sigma_co, params, ngc,
                           rcfg.tail_cap, kd, 0.0)
    (ptot_t, cnt_t, best_t, bj_t, ovf2), _ = timeit(
        "  _eval_gated two-tier", ev2, jnp.uint32(3))

    def ev1(salt):
        return _eval_gated(rows, cands.cand, cands.ncand, hs, dts, typs,
                           salt, t_next, sigma_co, params, ngc, 0, 0,
                           0.0)
    timeit("  _eval_gated single-tile (old)", ev1, jnp.uint32(3))

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    def fin():
        return _tree_sidm_finish(
            p, p.pos, tree.perm, inv, ptot_t, best_t, cnt_t, bj_t,
            t_next, active, scan, p_max, rand, vmax, key, params,
            False)[0].dvel
    timeit("  _tree_sidm_finish", fin)


if __name__ == "__main__":
    main()
