"""Knob sweep for the fused force engine at bench scale (run on TPU).

Sweeps one knob at a time around the current defaults and prints force
wall time; NFW 1e6 targets, relative criterion (the bench config).

Run: python scripts/sweep_fused.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(os.environ.get("REPS", "2"))


def sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                         .astype(jnp.float32).ravel()[:16]))


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import (FusedConfig, default_depth,
                                          fused_gravity_tree)
    from sidm_tpu.ops.tree import build_octree

    print(f"N={N} devices={jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    oldacc = jnp.full(N, 1e-2, jnp.float32)   # plausible |a| for relative MAC
    tree = build_octree(pos, mass, eps, mass > 0, box=0.0,
                        depth=default_depth(N))
    jax.block_until_ready(tree.mac_rows)

    def bench(label, cfg):
        def f():
            return fused_gravity_tree(tree, mass, eps, oldacc, theta=0.5,
                                      opening=1, err_tol_force_acc=0.005,
                                      config=cfg, need_pot=False)
        t0 = time.time()
        out = f(); sync(out)
        tc = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            out = f(); sync(out)
        dt = (time.time() - t0) / REPS
        print(f"{label:<44s} {dt*1e3:9.1f} ms  (c+1st {tc:.0f}s)",
              flush=True)

    base = FusedConfig()
    variants = {
        "base (leaf16 sc16 wc128 G64 gb32)": base,
        "leaf_cap=24": base._replace(leaf_cap=24),
        "leaf_cap=31": base._replace(leaf_cap=31),
        "sc=32": base._replace(sc=32),
        "leaf31+sc32": base._replace(leaf_cap=31, sc=32),
        "sortcompact=True (old sorts)": base._replace(
            sort_compact=True),
        "wc=256": base._replace(wc=256),
        "w_max=4096": base._replace(w_max=4096),
        "G=128": base._replace(group_size=128),
        "G=32": base._replace(group_size=32),
        "gb=16": base._replace(group_block=16),
        "gb=64": base._replace(group_block=64),
    }
    # SWEEP env: comma-separated label prefixes to run (default: the
    # first 5 — each variant is a fresh multi-minute axon compile)
    sel = os.environ.get("SWEEP", "")
    keys = list(variants)
    if sel:
        keys = [k for k in keys
                if any(k.startswith(p) for p in sel.split(","))]
    else:
        keys = keys[:6]
    for k in keys:
        bench(k, variants[k])


if __name__ == "__main__":
    main()
