"""A/B the work-queue engine (ops/wq_force.py) vs the fused frontier
engine at bench scale, with stage attribution and item-count telemetry.

Run: python scripts/profile_wq.py [N] [reps] [wq_cap] [wq_near_cap]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
WQ_CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 65536
WQ_NEAR_CAP = int(sys.argv[4]) if len(sys.argv) > 4 else 65536


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
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms   (compile+1st {t_compile:.1f}s)",
          flush=True)
    return out, dt


def main():
    import numpy as np
    from sidm_tpu.io import ics
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import wq_force as wf

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    print(f"wq_cap = {WQ_CAP}, wq_near_cap = {WQ_NEAR_CAP}", flush=True)
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
    tree, _ = timeit("tree build", build, pos, mass, eps, valid)

    def run(mod, cfg, need_pot=False):
        grav = (wf.wq_gravity_tree if mod is wf else ff.fused_gravity_tree)

        def f(tree, mass, eps, old_acc):
            return grav(tree, mass, eps, old_acc, theta=0.5, opening=1,
                        err_tol_force_acc=0.005, config=cfg,
                        return_info=True, need_pot=need_pot)
        return jax.jit(f)

    base = ff.FusedConfig(wq_cap=WQ_CAP, wq_near_cap=WQ_NEAR_CAP)
    out_f, t_fused = timeit("FUSED full (need_pot=False)", run(ff, base),
                            tree, mass, eps, old_acc)
    out_w, t_wq = timeit("WQ    full (need_pot=False)", run(wf, base),
                         tree, mass, eps, old_acc)
    iw = out_w[2]
    print(f"  wq: ovf_open={int(iw['ovf_open'])} ovf_big={int(iw['ovf_big'])}"
          f" ovf_items={int(iw['ovf_items'])} n_segs={int(iw['n_segs']):,}"
          f" max_walk_items={int(iw['max_walk_items']):,}"
          f" max_near_items={int(iw['max_near_items']):,}",
          flush=True)
    a_f, a_w = np.asarray(out_f[0]), np.asarray(out_w[0])
    err = (np.linalg.norm(a_w - a_f, axis=1)
           / np.maximum(np.linalg.norm(a_f, axis=1), 1e-12))
    print(f"  wq vs fused acc p99 rel diff {np.quantile(err, 0.99):.2e}",
          flush=True)

    try:
        out_p, t_pl = timeit("WQ+PALLAS full (need_pot=False)",
                             run(wf, base._replace(wq_pallas=True)),
                             tree, mass, eps, old_acc)
        a_p = np.asarray(out_p[0])
        errp = (np.linalg.norm(a_p - a_f, axis=1)
                / np.maximum(np.linalg.norm(a_f, axis=1), 1e-12))
        print(f"  pallas vs fused acc p99 rel diff "
              f"{np.quantile(errp, 0.99):.2e}", flush=True)
    except Exception as e:
        print(f"WQ+PALLAS FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    _, t_nf = timeit("wq skip_far  (walk + near)",
                     run(wf, base._replace(skip_far=True)),
                     tree, mass, eps, old_acc)
    _, t_nn = timeit("wq skip_near (walk + far)",
                     run(wf, base._replace(skip_near=True)),
                     tree, mass, eps, old_acc)
    _, t_w = timeit("wq skip both (walk only)",
                    run(wf, base._replace(skip_far=True, skip_near=True)),
                    tree, mass, eps, old_acc)
    print(f"\nwq attribution: walk {t_w*1e3:.0f} ms, "
          f"far {(t_nn-t_w)*1e3:.0f} ms, near {(t_nf-t_w)*1e3:.0f} ms, "
          f"total {t_wq*1e3:.0f} ms  |  fused total {t_fused*1e3:.0f} ms "
          f"({t_fused/t_wq:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
