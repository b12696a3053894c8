"""Phase-level profile of the gravity hot path at BENCH scale.

Times each stage of the force pipeline separately (tree build, walk,
node-row gather, target gather, pure math, segment reduction, full eval)
so kernel work targets the real bottleneck, not a guess.

All jitted functions take device arrays as ARGUMENTS (captured arrays get
embedded as HLO constants, which the remote compile service rejects), and
every timing forces a scalar readback (block_until_ready alone has proven
unreliable for ordering on the tunneled backend).

Run: python scripts/profile_force.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = 0.0
    for x in leaves[:2]:
        s += float(jnp.sum(x.astype(jnp.float32).ravel()[:16]))
    return s


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    force(out)  # compile + execute
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<42s} {dt*1e3:10.1f} ms", flush=True)
    return out, dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.ops import treeforce as tf

    print(f"N = {N}, devices = {jax.devices()}")
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)

    cfg = tf.WalkConfig()
    build = jax.jit(lambda p, m, e, v: build_octree(p, m, e, v, box=0.0,
                                                    depth=10))
    tree, _ = timeit("tree build", build, pos, mass, eps, valid)

    G = cfg.group_size
    ng = -(-N // G)
    npad = ng * G

    @jax.jit
    def group_geom(tree, old_acc):
        toac = (old_acc[tree.perm] * 0.005).astype(jnp.float32)

        def padp(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((npad - N,) + x.shape[1:], fill, x.dtype)])

        gtargets = padp(tree.pos_s).reshape(ng, G, 3)
        geps = padp(tree.eps_s, 1.0).reshape(ng, G)
        goac = padp(toac).reshape(ng, G)
        gvalid = jnp.concatenate(
            [jnp.ones(N, bool), jnp.zeros(npad - N, bool)]).reshape(ng, G)
        big = jnp.float32(1e30)
        glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
        ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
        oac_min = jnp.min(jnp.where(gvalid, goac, big), axis=1)
        oac_min = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac_min,
                            0.0)
        return gtargets, geps, glo, ghi, oac_min

    (gtargets, geps, glo, ghi, oac), _ = timeit("group geometry", group_geom,
                                                tree, old_acc)

    walk = jax.jit(lambda tree, glo, ghi, oac: tf.global_walk(
        tree, glo, ghi, oac, cfg, 0.5, True, None, n_ref=N,
        n_groups=jnp.int32(ng)))
    walk_out, _ = timeit("global walk", walk, tree, glo, ghi, oac)
    (pair_g, pair_n, pcnt, seg_g, seg_s, seg_c, scnt, ovf) = walk_out
    print(f"  n_pairs = {int(pcnt):,} (cap {pair_g.shape[0]:,}), "
          f"n_segs = {int(scnt):,} (cap {seg_g.shape[0]:,}), "
          f"overflow = {int(ovf)}")
    print(f"  pairs/group = {int(pcnt)/ng:.0f}, "
          f"segs/group = {int(scnt)/ng:.0f}", flush=True)

    R = pair_g.shape[0]

    @jax.jit
    def sort_by_group(pair_g, pair_n, pcnt):
        pkey = jnp.where(jnp.arange(R) < pcnt, pair_g, ng)
        porder = jnp.argsort(pkey)
        return pkey[porder], pair_n[porder]

    (pg_s, pn_s), _ = timeit("sort pairs by group (argsort 48M)",
                             sort_by_group, pair_g, pair_n, pcnt)

    @jax.jit
    def gather_nodes(mac_rows, quad_rows, pn):
        return mac_rows[pn], quad_rows[pn]

    (mrow, qrow), t_gn = timeit("gather node rows (R x 64B)", gather_nodes,
                                tree.mac_rows, tree.quad_rows, pn_s)

    @jax.jit
    def gather_targets(gtargets, geps, pg):
        fgc = jnp.minimum(pg, ng - 1)
        return gtargets[fgc], geps[fgc]

    # chunked: full (R,G,3) would be 37 GB; gather 1 chunk, scale
    CH = 1 << 21

    @jax.jit
    def gather_targets_chunk(gtargets, geps, pg):
        fgc = jnp.minimum(pg[:CH], ng - 1)
        return gtargets[fgc], geps[fgc]

    _, t_gt = timeit(f"gather target rows ({CH>>20}M x 1KB chunk)",
                     gather_targets_chunk, gtargets, geps, pg_s)
    print(f"  -> scaled to R: {t_gt * R / CH * 1e3:10.1f} ms")

    @jax.jit
    def segsum_chunk(a, pg):
        return jax.ops.segment_sum(a, pg[:CH], num_segments=ng + 1,
                                   indices_are_sorted=True)[:ng]

    a_chunk = jnp.ones((CH, G, 3), jnp.float32)

    _, t_ss = timeit(f"segment_sum ({CH>>20}M,G,3) chunk", segsum_chunk,
                     a_chunk, pg_s)
    print(f"  -> scaled to R: {t_ss * R / CH * 1e3:10.1f} ms")

    @jax.jit
    def math_chunk(mrow, qrow, tg, te):
        com = mrow[:CH, 0:3]
        m = mrow[:CH, 3]
        d = com[:, None, :] - tg
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        h = 2.8 * jnp.maximum(te, qrow[:CH, 6][:, None])
        fac = jnp.where(r > h, 1.0 / jnp.maximum(r2 * r, 1e-30), 0.5) \
            * m[:, None]
        a = fac[..., None] * d
        return a.sum(axis=0)

    tg_c, te_c = gather_targets_chunk(gtargets, geps, pg_s)
    _, t_m = timeit(f"pair math ({CH>>20}M chunk, monopole)", math_chunk,
                    mrow, qrow, tg_c, te_c)
    print(f"  -> scaled to R: {t_m * R / CH * 1e3:10.1f} ms")

    ev = jax.jit(lambda tree, gtargets, geps, walk_out: tf.eval_flat(
        tree, gtargets, geps, walk_out, cfg, None, ewald=None))
    _, t_ev = timeit("eval_flat (full, chunked while_loop)", ev,
                     tree, gtargets, geps, walk_out, reps=1)


if __name__ == "__main__":
    main()
