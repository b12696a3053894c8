"""Capture a jax.profiler trace of one list-eval force call (run on TPU).

Run: python scripts/trace_list.py [N]; summarize with trace_summary.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
OUT = os.environ.get("TRACE_DIR", "/tmp/campaign/trace_list")


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import list_force as lf
    from sidm_tpu.ops.tree import build_octree

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)
    cfg = ff.FusedConfig()
    lcfg = lf.ListConfig()

    tree = build_octree(pos, mass, eps, valid, box=0.0,
                        depth=ff.default_depth(N))
    lists = lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                            theta=0.5, use_relative=True,
                            err_tol_force_acc=0.005, cfg=cfg, lcfg=lcfg,
                            skin=0.5)

    def ev(tree, lists):
        return lf.eval_lists(tree, lists, mass, eps, cfg=cfg, lcfg=lcfg,
                             need_pot=False)

    out = ev(tree, lists)
    print("first:", float(out[0][0, 0]), flush=True)
    with jax.profiler.trace(OUT):
        out = ev(tree, lists)
        print("traced:", float(out[0][0, 0]), flush=True)
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
