"""Vacuum TreePM at bench scale: list sizes, eval/pm timings, and p99
force accuracy vs a sampled direct sum.

Run: python scripts/vactest.py [N] [mesh]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 128
NS = 4096   # sampled oracle targets


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    float(leaves[-1].ravel()[0].astype(jnp.float32))


def timeit(label, fn, *a, reps=3):
    t0 = time.time()
    sync(fn(*a))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*a))
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.1f} ms   (c+1 {tc:.1f}s)", flush=True)
    return dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import list_force as lf
    from sidm_tpu.ops.pm import build_pm_kernel_free, pm_accel_free
    from sidm_tpu.ops.tree import build_octree

    print(f"N = {N} mesh={MESH}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)
    cfg = ff.FusedConfig()
    lcfg = lf.ListConfig()

    center = np.zeros(3)
    radius = 1114.35 * 1.02      # the bench reflection sphere
    t0 = time.time()
    kern = build_pm_kernel_free(center, radius, n=MESH, asmth=1.25,
                                rcut_fac=4.5)
    print(f"kernel build {time.time()-t0:.1f}s: span={kern.box:.0f} "
          f"cell={kern.box/MESH:.1f} rcut={kern.rcut:.1f}", flush=True)
    pbc = (0.0, kern.alpha, kern.rcut)

    tree = build_octree(pos, mass, eps, valid, box=0.0,
                        depth=ff.default_depth(N))

    cache = f"/dev/shm/vaclists_{N}_{MESH}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        lists = lf.InteractionLists(*[jnp.asarray(z[k]) for k in
                                      lf.InteractionLists._fields])
        print("lists loaded from cache", flush=True)
    else:
        t0 = time.time()
        lists = lf.record_lists(tree, old_acc[tree.perm],
                                valid[tree.perm], theta=0.5,
                                use_relative=True,
                                err_tol_force_acc=0.005, cfg=cfg,
                                lcfg=lcfg, skin=0.5, pbc=pbc)
        sync(lists.far)
        print(f"record (c+1) {time.time()-t0:.1f}s", flush=True)
        np.savez(cache, **{k: np.asarray(getattr(lists, k))
                           for k in lf.InteractionLists._fields})
    nf = np.asarray(lists.nf)
    nn = np.asarray(lists.nn)
    print(f"ovf={np.asarray(lists.ovf)} nf mean/max={nf.mean():.0f}/"
          f"{nf.max()} nn mean/max={nn.mean():.0f}/{nn.max()}",
          flush=True)

    def rec(tree):
        return lf.record_lists(tree, old_acc[tree.perm],
                               valid[tree.perm], theta=0.5,
                               use_relative=True, err_tol_force_acc=0.005,
                               cfg=cfg, lcfg=lcfg, skin=0.5, pbc=pbc)

    timeit("record_lists (treepm)", rec, tree, reps=1)

    def ev(tree, lists):
        return lf.eval_lists(tree, lists, mass, eps, cfg=cfg, lcfg=lcfg,
                             need_pot=False, pbc=pbc)

    timeit("eval_lists short-range", ev, tree, lists)
    z = jnp.zeros_like(lists.nf)
    timeit("eval near only", ev, tree, lists._replace(nf=z))
    timeit("eval far only", ev, tree, lists._replace(nn=z))

    pm = jax.jit(lambda p, m: pm_accel_free(kern, p, m)[0])
    timeit(f"pm_accel_free mesh {MESH}", pm, pos, mass)

    # ---- accuracy: sampled direct oracle
    acc_s, _ = ev(tree, lists)
    acc_l = pm(pos, mass)
    acc = acc_s + acc_l

    rng = np.random.default_rng(1)
    sel = jnp.asarray(np.sort(rng.choice(N, NS, replace=False)))

    @jax.jit
    def direct_sample(pos, mass, eps, sel):
        pt = pos[sel]
        et = eps[sel]

        def body(carry, chunk):
            acc = carry
            ps, ms, es = chunk
            d = ps[None, :, :] - pt[:, None, :]
            r = jnp.sqrt(jnp.sum(d * d, axis=-1))
            h = 2.8 * jnp.maximum(et[:, None], es[None, :])
            from sidm_tpu.kernels import softened_inv_r3
            fac = ms[None, :] * softened_inv_r3(r, h)
            return acc + jnp.sum(fac[..., None] * d, axis=1), None

        C = 65536
        nch = N // C
        chunks = (pos[:nch * C].reshape(nch, C, 3),
                  mass[:nch * C].reshape(nch, C),
                  eps[:nch * C].reshape(nch, C))
        acc0 = jnp.zeros((NS, 3), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, chunks)
        if nch * C < N:
            acc, _ = body(acc, (pos[nch * C:], mass[nch * C:],
                                eps[nch * C:]))
        return acc

    t0 = time.time()
    acc_d = direct_sample(pos, mass, eps, sel)
    sync(acc_d)
    print(f"direct oracle on {NS} targets: {time.time()-t0:.1f}s",
          flush=True)
    a = np.asarray(acc)[np.asarray(sel)]
    d = np.asarray(acc_d)
    rel = (np.linalg.norm(a - d, axis=1)
           / np.maximum(np.linalg.norm(d, axis=1), 1e-20))
    print(f"TreePM-vacuum p50/p99/max rel err: "
          f"{np.percentile(rel,50):.2e} {np.percentile(rel,99):.2e} "
          f"{rel.max():.2e}", flush=True)


if __name__ == "__main__":
    main()
