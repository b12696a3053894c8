"""Measure refresh_octree vs build_octree at bench scale on the TPU,
plus the fused force on a refreshed (drifted) tree vs a fresh one.

Run: python scripts/profile_refresh.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    s = 0.0
    for x in leaves[:2]:
        s += float(jnp.sum(x.astype(jnp.float32).ravel()[:16]))
    return s


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = fn(*args)
    force(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms   (compile+1st {tc:.1f}s)",
          flush=True)
    return out, dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.tree import build_octree, refresh_octree

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)

    depth = ff.default_depth(N)
    build = jax.jit(lambda p, m, e, v: build_octree(p, m, e, v, box=0.0,
                                                    depth=depth))
    tree, t_build = timeit("tree build", build, pos, mass, eps, valid)

    refresh = jax.jit(refresh_octree)
    s_deep = float(tree.extent) / (1 << depth)
    dx = jax.random.normal(jax.random.PRNGKey(0), (N, 3),
                           jnp.float32) * (0.05 * s_deep)
    tree_r, t_ref = timeit("tree refresh (drifted)", refresh, tree,
                           pos + dx, mass, eps, valid)
    print(f"  drift = {float(tree_r.drift):.4g}, s_deep = {s_deep:.4g}")

    cfg = ff.FusedConfig()
    run = jax.jit(lambda t, m, e, o: ff.fused_gravity_tree(
        t, m, e, o, theta=0.5, opening=1, config=cfg, need_pot=False))
    _, t_fresh = timeit("fused force, fresh tree", run, tree, mass, eps,
                        old_acc)
    _, t_drift = timeit("fused force, refreshed tree", run, tree_r, mass,
                        eps, old_acc)
    print(f"\nbuild {t_build*1e3:.0f} ms vs refresh {t_ref*1e3:.0f} ms; "
          f"force fresh {t_fresh*1e3:.0f} vs drifted {t_drift*1e3:.0f} ms")


if __name__ == "__main__":
    main()
