"""List-eval tuning experiments on TPU: chunk-size A/B + compacted
used-rows gather table.

Run: python scripts/listtune.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20


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
    from sidm_tpu.ops.tree import build_octree

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)
    cfg = ff.FusedConfig()

    tree = build_octree(pos, mass, eps, valid, box=0.0,
                        depth=ff.default_depth(N))
    lcfg0 = lf.ListConfig()
    cache = f"/dev/shm/listtune_{N}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        lists = lf.InteractionLists(*[jnp.asarray(z[k]) for k in
                                      lf.InteractionLists._fields])
        print("lists loaded from cache", flush=True)
    else:
        lists = lf.record_lists(tree, old_acc[tree.perm],
                                valid[tree.perm],
                                theta=0.5, use_relative=True,
                                err_tol_force_acc=0.005, cfg=cfg,
                                lcfg=lcfg0, skin=0.5)
        sync(lists.far)
        np.savez(cache, **{k: np.asarray(getattr(lists, k))
                           for k in lf.InteractionLists._fields})
    nf = np.asarray(lists.nf)
    print(f"nf sum {nf.sum()/1e6:.1f}M mean {nf.mean():.0f}", flush=True)

    variants = [
        ("fc512 sc64 fb256 nb128 (current)", lcfg0),
        ("fc1024 sc128 fb256 nb256",
         lcfg0._replace(fc=1024, sc=128, near_block=256)),
        ("fc2048 sc128 fb512 nb256",
         lcfg0._replace(fc=2048, sc=128, far_block=512, near_block=256)),
    ]
    for label, lc in variants:
        def ev(tree, lists, lc=lc):
            return lf.eval_lists(tree, lists, mass, eps, cfg=cfg, lcfg=lc,
                                 need_pot=False)
        for attempt in range(3):
            try:
                timeit("eval " + label, ev, tree, lists)
                break
            except Exception as e:
                print(f"  RETRY {label}: {type(e).__name__} "
                      f"{str(e)[:90]}", flush=True)
                time.sleep(5)



if __name__ == "__main__":
    main()
