"""Attribute SIDM candidate recording at bench scale on TPU:
_record_segments (range walk) vs _emit_candidates (per-chunk emission).

Run: python scripts/profile_sidm_record.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    float(jnp.asarray(leaves[-1]).ravel()[0].astype(jnp.float32))


def timeit(label, fn, *a, reps=REPS):
    t0 = time.time()
    out = fn(*a)
    force(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        o = fn(*a)
        force(o)
        del o
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms  (c+1st {tc:.1f}s)", flush=True)
    return out, dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import list_range as lr
    from sidm_tpu.ops.fused_range import pack_range_tree
    from sidm_tpu.ops.sidm import SidmParams
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.state import make_particles

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    p = make_particles(pos, vel, mass, np.ones(N, np.int32),
                       pad_to_multiple=4096)
    n = p.n_padded
    eps = jnp.full(n, 0.3, jnp.float32)
    params = SidmParams(1.0, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1, 0.0,
                        0.0)
    # realistic converged hsml: seed from tree cell counts
    tree = build_octree(p.pos, jnp.where(p.valid, p.mass, 0.0), eps,
                        p.valid, box=0.0, depth=ff.default_depth(n))
    from sidm_tpu.ops.fused_range import cell_count_hsml_seed
    import dataclasses
    h0 = cell_count_hsml_seed(tree, params.des_num_ngb)
    p = dataclasses.replace(p, hsml_vd=jnp.where(p.valid, h0, 0.0))

    cfg = ff.FusedConfig()
    rcfg = lr.RangeListConfig()
    print(f"rcfg: seg={rcfg.seg_cap} k={rcfg.k_cap} lvl={rcfg.lvl_cap}",
          flush=True)

    @jax.jit
    def rec(p, tree):
        return lr.record_candidates_from_particles(
            p, p.pos, tree, skin=0.05, params=params, cfg=cfg, rcfg=rcfg,
            box=0.0)

    cands, t_rec = timeit("record_candidates (full)", rec, p, tree)
    print(f"  ovf={np.asarray(cands.ovf)} need={np.asarray(cands.need)} "
          f"ncand mean/max={np.asarray(cands.ncand).mean():.0f}/"
          f"{np.asarray(cands.ncand).max()}", flush=True)

    # segments only (skip emission) via the internal pieces
    rows = jnp.concatenate([p.pos, p.vel, p.mass[:, None],
                            jnp.zeros((n, 1), jnp.float32)],
                           axis=1)[tree.perm]
    h_all = jnp.where(p.is_collisionless & p.valid,
                      lr.h_eff_all(p, params), 0.0)[tree.perm]
    typ = jnp.where(p.is_collisionless & p.valid, p.ptype,
                    -9)[tree.perm].astype(jnp.int32)
    valid_sorted = (jnp.where(p.valid, p.mass, 0.0) > 0)[tree.perm]

    from sidm_tpu.ops.fused_force import make_windows
    G = cfg.group_size
    depth = tree.depth

    @jax.jit
    def segs_only(tree, rows, h_all, typ, valid_sorted):
        rt = pack_range_tree(tree, rows)
        pidx, gvalid, ngp, GB, NB = make_windows(
            tree.keys_s, valid_sorted, n, G, depth, cfg.break_level,
            cfg.group_block, cfg.sort_groups)
        skin = jnp.asarray(0.05, jnp.float32)
        r_all = jnp.where(valid_sorted & (typ >= 0),
                          rcfg.pad_fac * h_all + skin, 0.0)
        gt = tree.pos_s[pidx]
        gr = jnp.where(gvalid, r_all[pidx], 0.0)
        big = jnp.asarray(1e30, jnp.float32)
        live_t = gvalid & (gr > 0)
        glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
        ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
        any_v = jnp.any(live_t, axis=1)
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
        pad = jnp.max(jnp.where(live_t, gr, 0.0), axis=1) + tree.drift
        return lr._record_segments(rt, glo, ghi, pad, tree.extent, cfg,
                                   rcfg, depth, int(n), 0.0)

    (near, nn, ovf_n, needs), t_seg = timeit(
        "  _record_segments (walk) only",
        segs_only, tree, rows, h_all, typ, valid_sorted)
    print(f"  nn mean/max={np.asarray(nn).mean():.0f}/"
          f"{np.asarray(nn).max()}  -> emission ~ "
          f"{(t_rec-t_seg)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
