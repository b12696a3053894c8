"""Capture a jax.profiler trace of one record_lists call (run on TPU).

Run: python scripts/trace_record.py [N]; summarize with trace_summary.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
OUT = os.environ.get("TRACE_DIR", "/tmp/campaign/trace_record")


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops import list_force as lf
    from sidm_tpu.ops.tree import build_octree

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    vel = jnp.asarray(vel, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    old_acc = jnp.zeros(N, jnp.float32)
    cfg = ff.FusedConfig()
    lcfg = lf.ListConfig(materialize=True, mat_cap=384)

    tree = build_octree(pos, mass, eps, valid, box=0.0,
                        depth=ff.default_depth(N))

    @jax.jit
    def rec(tree):
        return lf.record_lists(tree, old_acc[tree.perm], valid[tree.perm],
                               theta=0.5, use_relative=True,
                               err_tol_force_acc=0.005, cfg=cfg,
                               lcfg=lcfg, skin=0.5, vel=vel, t_now=0.0)

    lists = rec(tree)
    print("warm:", int(jnp.sum(lists.nf)), flush=True)
    del lists
    with jax.profiler.trace(OUT):
        lists = rec(tree)
        print("traced:", int(jnp.sum(lists.nf)), flush=True)
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
