"""Stage attribution for the LIST engine at bench scale on TPU.

Times tree build, record_lists, eval (full / far-only / near-only), the
refresh+pack per-step fixed cost, and optionally the vacuum-TreePM
variant. Prints per-group list-size telemetry for cap sizing.

Run: python scripts/profile_list.py [N] [reps] [--treepm] [--mesh M]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
REPS = 3
TREEPM = "--treepm" in sys.argv
MESH = 128
args = [a for a in sys.argv[1:] if not a.startswith("--")]
if "--mesh" in sys.argv:
    MESH = int(sys.argv[sys.argv.index("--mesh") + 1])
    args = [a for a in args if a != str(MESH)]
if len(args) > 0:
    N = int(args[0])
if len(args) > 1:
    REPS = int(args[1])


def force(out):
    # block_until_ready alone under-reports on the axon remote backend;
    # a host transfer is a true barrier
    leaves = jax.tree_util.tree_leaves(out)
    jax.block_until_ready(leaves)
    float(leaves[-1].ravel()[0].astype(jnp.float32))


def timeit(label, fn, *a, reps=REPS, keep=True):
    t0 = time.time()
    out = fn(*a)
    force(out)
    tc = time.time() - t0
    if not keep:
        del out   # GB-scale results: keeping the old one across a rep
        out = None  # would double the footprint (mat stream)
    t0 = time.time()
    for _ in range(reps):
        o = fn(*a)
        force(o)
        del o
    dt = (time.time() - t0) / reps
    print(f"{label:<44s} {dt*1e3:10.1f} ms   (compile+1st {tc:.1f}s)",
          flush=True)
    if not keep:
        out = fn(*a)
        force(out)
    return out, dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import list_force as lf
    from sidm_tpu.ops.tree import build_octree, refresh_octree

    print(f"N = {N}, treepm={TREEPM} mesh={MESH}, devices = "
          f"{jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)

    pbc = None
    kern = None
    if TREEPM:
        from sidm_tpu.ops.pm import build_pm_kernel_free, pm_accel_free
        pv = np.asarray(pos)
        center = 0.5 * (pv.min(0) + pv.max(0))
        radius = 1.3 * float(np.sqrt(((pv - center) ** 2).sum(1).max()))
        kern = build_pm_kernel_free(center, radius, n=MESH, asmth=1.25,
                                    rcut_fac=4.5)
        pbc = (0.0, kern.alpha, kern.rcut)
        print(f"mesh {MESH}: cell={kern.box/MESH:.2f} rcut={kern.rcut:.1f}"
              f" alpha={kern.alpha:.4f}", flush=True)

    depth = ff.default_depth(N)
    build = jax.jit(lambda p, m, e, v: build_octree(p, m, e, v, box=0.0,
                                                    depth=depth))
    tree, t_build = timeit("tree build", build, pos, mass, eps, valid)

    cfg = ff.FusedConfig()
    lcfg = lf.ListConfig(materialize=("--mat" in sys.argv and not TREEPM),
                         mat_cap=384)

    def rec(tree):
        return lf.record_lists(tree, old_acc[tree.perm],
                               valid[tree.perm], theta=0.5,
                               use_relative=True,
                               err_tol_force_acc=0.005, cfg=cfg,
                               lcfg=lcfg, skin=0.5, pbc=pbc,
                               vel=jnp.asarray(vel, jnp.float32),
                               t_now=0.0)

    lists, t_rec = timeit("record_lists (skin=0.5)", rec, tree,
                          keep=not lcfg.materialize)
    nf = np.asarray(lists.nf)
    nn = np.asarray(lists.nn)
    print(f"  ovf={np.asarray(lists.ovf)} "
          f"nf mean/max={nf.mean():.0f}/{nf.max()} "
          f"nn mean/max={nn.mean():.0f}/{nn.max()} "
          f"ngroups={nf.shape[0]}", flush=True)

    def ev(tree, lists):
        return lf.eval_lists(tree, lists, mass, eps, cfg=cfg, lcfg=lcfg, t_now=0.0,
                             need_pot=False, pbc=pbc)

    _, t_ev = timeit("eval_lists (far+near)", ev, tree, lists)

    # measure far/near by zeroing the other pass's counts
    z = jnp.zeros_like(lists.nf)
    _, t_near = timeit("eval near only", ev, tree,
                       lists._replace(nf=z))
    _, t_far = timeit("eval far only", ev, tree,
                      lists._replace(nn=z))
    print(f"attribution: far {t_far*1e3:.0f} ms, near {t_near*1e3:.0f} "
          f"ms, sum {(t_far+t_near)*1e3:.0f} vs full {t_ev*1e3:.0f}",
          flush=True)

    refresh_only = jax.jit(lambda tree, p: refresh_octree(
        tree, p, mass, eps, valid, box=0.0))
    _, t_refresh = timeit("refresh_octree only", refresh_only, tree, pos)

    pack_only = jax.jit(
        lambda tree: lf.flat_tables(__import__(
            "sidm_tpu.ops.fused_force", fromlist=["pack_tree"]
        ).pack_tree(tree)))
    _, t_pack = timeit("pack_tree + flat_tables only", pack_only, tree)

    def refresh(tree, p):
        t2 = refresh_octree(tree, p, mass, eps, valid, box=0.0)
        return lf.eval_lists(t2, lists, mass, eps, cfg=cfg, lcfg=lcfg, t_now=0.0,
                             need_pot=False, pbc=pbc)

    _, t_step = timeit("refresh + eval (per-step path)", refresh, tree,
                       pos)

    if lcfg.materialize:
        @jax.jit
        def drift_step(tree, p, lists):
            t2 = lf.advance_tree(tree, lists, p, 0.01)
            return lf.eval_lists(t2, lists, mass, eps, cfg=cfg,
                                 lcfg=lcfg, t_now=0.01, need_pot=False,
                                 pbc=pbc)
        _, t_drift = timeit("advance + MAT eval (drift per-step path)",
                            drift_step, tree, pos, lists)

    if TREEPM:
        from sidm_tpu.ops.pm import pm_accel_free
        pm = jax.jit(lambda p, m: pm_accel_free(kern, p, m))
        _, t_pm = timeit("pm_accel_free", pm, pos, mass)

    print(f"\nper-step (refresh+eval{'+pm' if TREEPM else ''}): "
          f"{(t_step + (t_pm if TREEPM else 0))*1e3:.0f} ms; "
          f"rebuild step adds build {t_build*1e3:.0f} + record "
          f"{t_rec*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
