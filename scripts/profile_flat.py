"""Stage attribution for the FLAT fused-walk force engine at bench scale.

skip_far removes ONLY the in-walk far math (emissions keep running), so
the attribution is: walk+emit = skip_far+skip_near run; far math =
full - skip_far (with near also skipped); near = skip_near delta.

Run: python scripts/profile_flat.py [N] [reps]
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
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.ops import flat_force as fl

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)

    depth = fl.default_depth(N)
    build = jax.jit(lambda p, m, e, v: build_octree(p, m, e, v, box=0.0,
                                                    depth=depth))
    tree, _ = timeit("tree build", build, pos, mass, eps, valid)

    def run(cfg, need_pot=False):
        def f(tree, mass, eps, old_acc):
            return fl.flat_gravity_tree(
                tree, mass, eps, old_acc, theta=0.5, opening=1,
                err_tol_force_acc=0.005, config=cfg, return_info=True,
                need_pot=need_pot)
        return jax.jit(f)

    base = fl.FlatConfig(
        chunk=int(os.environ.get("FLAT_CHUNK", "65536")),
        near_chunk=int(os.environ.get("FLAT_NEAR_CHUNK", "32768")))
    print(f"config: chunk={base.chunk} near_chunk={base.near_chunk}",
          flush=True)
    out, t_full = timeit("flat full (need_pot=False)", run(base),
                         tree, mass, eps, old_acc)
    info = out[2]
    print(f"  ovf={int(info['ovf_open'])},{int(info['ovf_seg'])},"
          f"{int(info['ovf_big'])} n_segs={int(info['n_segs']):,} "
          f"n_far={int(info['n_far']):,} "
          f"max_pairs={int(info['max_pairs']):,}", flush=True)
    print(f"  lvl_pairs={[int(x) for x in info['lvl_pairs']]}", flush=True)
    print(f"  lvl_far={[int(x) for x in info['lvl_far']]}", flush=True)

    _, t_nf = timeit("skip_far  (walk + emit + near)",
                     run(base._replace(skip_far=True)),
                     tree, mass, eps, old_acc)
    _, t_nn = timeit("skip_near (walk + emit + far)",
                     run(base._replace(skip_near=True)),
                     tree, mass, eps, old_acc)
    _, t_w = timeit("skip both (walk + emit)",
                    run(base._replace(skip_far=True, skip_near=True)),
                    tree, mass, eps, old_acc)
    _, t_wo = timeit("walk only (no emit, no eval)",
                     run(base._replace(skip_far=True, skip_near=True,
                                       skip_walk_emit=True)),
                     tree, mass, eps, old_acc)
    print(f"\nattribution: walk {t_wo*1e3:.0f} ms, "
          f"emit {(t_w-t_wo)*1e3:.0f} ms, far {(t_nn-t_w)*1e3:.0f} ms, "
          f"near {(t_nf-t_w)*1e3:.0f} ms, total {t_full*1e3:.0f} ms",
          flush=True)

    assert bool(jnp.isfinite(out[0]).all())


if __name__ == "__main__":
    main()
