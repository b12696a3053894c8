"""Microbenchmark: far-tile math vs gather vs loop, isolated.

Run: python scripts/fartile_micro.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial

GB, G, FC, IT = 256, 64, 512, 320   # ~ the N=1e6 far pass volume
M = 262144                           # compact-table size (rows)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    jax.block_until_ready(leaves)
    float(leaves[-1].ravel()[0].astype(jnp.float32))


def timeit(label, fn, *a, reps=3):
    t0 = time.time(); sync(fn(*a)); tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        sync(fn(*a))
    dt = (time.time() - t0) / reps
    print(f"{label:<44s} {dt*1e3:9.1f} ms  (c+1 {tc:.1f}s)", flush=True)
    return dt


def main():
    from sidm_tpu.ops.fused_force import _far_tile
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (M, 16), jnp.float32)
    ids = jax.random.randint(key, (GB, IT, FC), 0, M)
    rows0 = tbl[ids[:, 0]]                      # (GB, FC, 16)
    xc = jax.random.normal(key, (GB, G, 3))
    te = jnp.abs(jax.random.normal(key, (GB, G))) + 0.1
    gc = jnp.zeros((GB, 3))

    @jax.jit
    def math_only(rows0, xc, te, gc):
        def body(i, acc):
            da, _ = _far_tile(rows0, xc, te, gc, need_pot=False)
            return acc + da
        return jax.lax.fori_loop(0, IT, body, jnp.zeros((GB, G, 3)))

    @jax.jit
    def gather_only(tbl, ids):
        def body(i, acc):
            rows = tbl[ids[:, i % IT]]
            return acc + jnp.sum(rows, axis=1)
        return jax.lax.fori_loop(0, IT, body, jnp.zeros((GB, 16)))

    @jax.jit
    def both(tbl, ids, xc, te, gc):
        def body(i, acc):
            rows = tbl[ids[:, i % IT]]
            da, _ = _far_tile(rows, xc, te, gc, need_pot=False)
            return acc + da
        return jax.lax.fori_loop(0, IT, body, jnp.zeros((GB, G, 3)))

    @jax.jit
    def loop_only(xc):
        def body(i, acc):
            return acc + xc
        return jax.lax.fori_loop(0, IT, body, jnp.zeros((GB, G, 3)))

    n_pairs = GB * G * FC * IT
    print(f"pairs per call: {n_pairs/1e9:.2f}G", flush=True)
    timeit("loop only (320 it)", loop_only, xc)
    timeit("gather only", gather_only, tbl, ids)
    timeit("far-tile math only", math_only, rows0, xc, te, gc)
    timeit("gather + math", both, tbl, ids, xc, te, gc)

    # precision variants
    from jax import lax
    for prec, name in ((lax.Precision.HIGHEST, "HIGHEST"),
                       (lax.Precision.HIGH, "HIGH"),
                       (lax.Precision.DEFAULT, "DEFAULT")):
        @partial(jax.jit, static_argnames=())
        def math_p(rows0, xc, te, gc, prec=prec):
            def body(i, acc):
                da, _ = _far_tile(rows0, xc, te, gc, prec=prec,
                                  need_pot=False)
                return acc + da
            return jax.lax.fori_loop(0, IT, body, jnp.zeros((GB, G, 3)))
        timeit(f"math only prec={name}", math_p, rows0, xc, te, gc)


if __name__ == "__main__":
    main()
