"""TreePM vs legacy Ewald walk at bench scale (periodic box, run on TPU).

Times: PM mesh solve alone, fused screened short-range alone, full
TreePM force, and the legacy per-pair Ewald walk for contrast.

Run: python scripts/profile_treepm.py [N] [MESH]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
MESH = int(sys.argv[2]) if len(sys.argv) > 2 else 256
BOX = 50000.0
REPS = int(os.environ.get("REPS", "3"))


def sync(out):
    s = 0.0
    for x in jax.tree_util.tree_leaves(out)[:2]:
        s += float(jnp.sum(x.astype(jnp.float32).ravel()[:16]))
    return s


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.1f} ms   (c+1st {tc:.1f}s)", flush=True)
    return out, dt


def main():
    from sidm_tpu.ops import pm
    from sidm_tpu.ops.fused_force import default_depth, fused_gravity
    from sidm_tpu.ops.tree import build_octree

    print(f"N={N} mesh={MESH} devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # clustered periodic field: 64 halos + uniform background
    nh = 64
    centers = rng.uniform(0, BOX, (nh, 3))
    frac = 0.7
    nc = int(N * frac) // nh
    parts = [rng.uniform(0, BOX, (N - nh * nc, 3))]
    for c in centers:
        parts.append((c + rng.standard_normal((nc, 3)) * 0.01 * BOX) % BOX)
    pos = jnp.asarray(np.concatenate(parts), jnp.float32)
    mass = jnp.ones(N, jnp.float32)
    eps = jnp.full(N, BOX / 3500.0, jnp.float32)
    oldacc = jnp.zeros(N, jnp.float32)

    kern = pm.build_pm_kernel(BOX, n=MESH, asmth=2.0, rcut_fac=6.0)
    pbc = (BOX, kern.alpha, kern.rcut)
    print(f"rcut = {kern.rcut:.1f} ({kern.rcut/BOX*100:.2f}% of box)",
          flush=True)

    timeit("pm_accel (mesh long-range)",
           lambda p, m: pm.pm_accel(kern, p, m), pos, mass)

    depth = default_depth(N)
    timeit("tree build (periodic)",
           jax.jit(lambda p, m, e: build_octree(p, m, e, m > 0, box=BOX,
                                                depth=depth)),
           pos, mass, eps)

    def short(p, m, e, oa):
        return fused_gravity(p, m, e, oa, theta=0.5, opening=1,
                             err_tol_force_acc=0.005, need_pot=False,
                             pbc=pbc)

    timeit("fused screened short-range (incl. build)",
           short, pos, mass, eps, oldacc)

    def treepm(p, m, e, oa):
        a1, _ = short(p, m, e, oa)
        a2, _ = pm.pm_accel(kern, p, m)
        return a1 + a2

    timeit("FULL TreePM force", treepm, pos, mass, eps, oldacc)

    if os.environ.get("LEGACY"):
        from sidm_tpu.ops.ewald import build_ewald_table
        from sidm_tpu.ops.treeforce import tree_gravity
        ew = build_ewald_table(BOX, cache_dir="/tmp")

        def legacy(p, m, e, oa):
            return tree_gravity(p, m, e, oa, box=BOX, theta=0.5,
                                opening=1, err_tol_force_acc=0.005,
                                ewald=ew)

        timeit("legacy per-pair Ewald walk", legacy, pos, mass, eps,
               oldacc)


if __name__ == "__main__":
    main()
