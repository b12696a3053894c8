"""Capture a jax.profiler trace of one fused force call (run on TPU).

Writes the trace under /tmp/campaign/trace; the perfetto/tensorboard
trace contains per-op device timings for offline analysis.

Run: python scripts/trace_fused.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
OUT = os.environ.get("TRACE_DIR", "/tmp/campaign/trace")


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import (FusedConfig, default_depth,
                                          fused_gravity_tree)
    from sidm_tpu.ops.tree import build_octree

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    oldacc = jnp.full(N, 1e-2, jnp.float32)

    def build():
        return build_octree(pos, mass, eps, mass > 0, box=0.0,
                            depth=default_depth(N))

    def force(tree):
        return fused_gravity_tree(tree, mass, eps, oldacc, theta=0.5,
                                  opening=1, err_tol_force_acc=0.005,
                                  need_pot=False)

    tree = build()
    jax.block_until_ready(tree.mac_rows)
    out = force(tree)            # compile
    jax.block_until_ready(out[0])
    print("compiled; tracing...", flush=True)
    with jax.profiler.trace(OUT):
        tree = build()
        jax.block_until_ready(tree.mac_rows)
        out = force(tree)
        jax.block_until_ready(out[0])
    print(f"trace written to {OUT}", flush=True)


if __name__ == "__main__":
    main()
