"""Stage attribution for sidm_scatter_fused at bench scale: prep, window
construction, range walk + DSMC near, finish; plus gate-rate stats.

Run: python scripts/profile_sidm_stages.py [N] [reps]
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


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms   (compile+1st {tc:.1f}s)",
          flush=True)
    return out, dt


def main():
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.fused_range import (_range_eval, make_gated_windows,
                                          pack_range_tree)
    from sidm_tpu.ops.sidm_tree import _tree_sidm_finish, _tree_sidm_prep
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.rng import step_key
    from sidm_tpu.simulation import Simulation, softening_table

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    cfg = SimConfig(
        SIDMOn=1, CrossSection=38.2614, ProbabilityTol=0.2,
        ForceMethod="tree", SofteningHalo=0.3, DesNumNgb=30,
        ReflectionBoundary=1114.35,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5)
    sim = Simulation(cfg, mode="phased")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(N, np.int32),
                                  pad_to_multiple=4096)
    t0 = time.time()
    sim.prepare()
    print(f"# prepare: {time.time()-t0:.1f}s", flush=True)
    # one real step so hsml/dt state matches in-step conditions
    sim.step()
    print(f"# step done; sim.time={sim.time:.5g}", flush=True)

    p = sim.particles
    params = sim._sidm_params_for_phased()
    soft = jnp.asarray(softening_table(cfg, sim.time), jnp.float32)
    eps = soft[jnp.clip(p.ptype, 0, 5)]
    m = jnp.where(p.valid, p.mass, 0.0)
    n = p.n_padded
    depth = ff.default_depth(n)
    tree = jax.jit(lambda: build_octree(p.pos, m, eps, p.valid, box=0.0,
                                        depth=depth))()
    import dataclasses
    t_next = jnp.asarray(float(jnp.min(p.max_pred_time)), jnp.float32)
    active = p.valid
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    key = step_key(sim.root_key, 7)
    fcfg = ff.FusedConfig()
    G = fcfg.group_size

    prep = jax.jit(lambda: _tree_sidm_prep(p, p.pos, tree.perm, t_next,
                                           active, vmax, key, params))
    (rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand), _ = \
        timeit("prep (gate + sorted rows)", prep)
    gate_rate = float(jnp.mean((hs > 0).astype(jnp.float32)))
    print(f"  gate rate = {gate_rate:.4f} ({gate_rate*n:.0f} targets), "
          f"mean p_max = {float(jnp.mean(p_max)):.4g}", flush=True)

    packt = jax.jit(pack_range_tree)
    rt, _ = timeit("pack_range_tree", packt, tree, rows)

    windows = jax.jit(lambda k, h: make_gated_windows(
        k, h, n, G, depth, fcfg.break_level, fcfg.group_block))
    (pidx, gvalid, ngp, GB, NB), _ = timeit("make_gated_windows", windows,
                                            tree.keys_s, hs)
    live_groups = float(jnp.sum(jnp.any(gvalid, axis=1)))
    occ = float(jnp.sum(gvalid)) / max(live_groups * G, 1)
    print(f"  ngp = {ngp}, live groups = {live_groups:.0f}, "
          f"mean occupancy of live = {occ:.3f}", flush=True)

    dtype = tree.pos_s.dtype
    gt = tree.pos_s[pidx]
    gv = jnp.where(gvalid[..., None], rows[pidx][..., 3:6], 0.0)
    gh = jnp.where(gvalid, hs[pidx], 0.0)
    gdt = jnp.where(gvalid, dts[pidx], 0.0)
    gty = jnp.where(gvalid, typs[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)
    big = jnp.asarray(1e30, dtype)
    live_t = gvalid & (gh > 0)
    glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
    any_v = jnp.any(live_t, axis=1)
    far_here = tree.origin + 4.0 * tree.extent
    glo = jnp.where(any_v[:, None], glo, far_here)
    ghi = jnp.where(any_v[:, None], ghi, far_here)
    pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1) + tree.drift
    bbox = jnp.where(any_v, jnp.linalg.norm(ghi - glo, axis=1), 0.0)
    print(f"  live-group bbox diag: med "
          f"{float(jnp.median(jnp.where(any_v, bbox, jnp.nan))):.3g} "
          f"max {float(jnp.max(bbox)):.3g}; "
          f"pad med {float(jnp.median(jnp.where(any_v, pad, jnp.nan))):.3g}",
          flush=True)

    ev = jax.jit(lambda rt_, gt_, gv_, gh_, gdt_, gty_, gidx_, glo_,
                 ghi_, pad_: _range_eval(
        rt_, gt_, gv_, gh_, gdt_, gty_, gidx_, glo_, ghi_, pad_,
        tree.extent, tree.origin, jnp.uint32(7), t_next, sigma_co, fcfg,
        depth, n, params))
    (ptot, ncnt, bestk, bestj, ovf), _ = timeit(
        "range walk + DSMC near (_range_eval)", ev, rt, gt, gv, gh, gdt,
        gty, gidx, glo, ghi, pad)
    print(f"  ovf = {np.asarray(ovf)}, total ngb count = "
          f"{float(jnp.sum(ncnt)):.3g}", flush=True)

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))

    def unflat(x, fill):
        flat_idx = jnp.where(gvalid, pidx, n).reshape(-1)
        buf = jnp.full((n + 1,), fill, x.dtype)
        return buf.at[flat_idx].set(x.reshape(-1))[:n]

    fin = jax.jit(lambda p_, pt_, bk_, nc_, bj_: _tree_sidm_finish(
        p_, p_.pos, tree.perm, inv, unflat(pt_, 0.0),
        unflat(bk_, -jnp.inf), unflat(nc_, 0), unflat(bj_, -1),
        t_next, active, scan, p_max, rand, vmax, key, params, False))
    timeit("finish (kick + conflict + hsml ctrl)", fin, p, ptot, bestk,
           ncnt, bestj)


if __name__ == "__main__":
    main()
