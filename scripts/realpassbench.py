"""Call the REAL flat-engine pass functions on synthetic buffers at real
sizes, isolating each from the fused program.

Run: python scripts/realpassbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sidm_tpu.ops.flat_force import (FAR_U, NEAR_U, FlatConfig, IMAX,
                                     _far_pass, _near_pass)

NG = 16400
G = 64
N = 1 << 20
NP16 = N // 16
CFG = FlatConfig()


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:8]
                         .astype(jnp.float32)))


def timeit(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<56s} {dt*1e3:9.1f} ms (compile {tc:.0f}s)", flush=True)
    return out, dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    n_far = 50_000_000
    far_cap = -(-CFG.far_cap_mult * N // CFG.far_chunk) * CFG.far_chunk
    seg_cap = -(-CFG.seg_cap_mult * N // CFG.near_chunk) * CFG.near_chunk
    n_seg = 5_600_000

    # unit-structured far list
    nuf = n_far // FAR_U
    ug = np.sort(rng.integers(0, NG, nuf)).astype(np.int32)
    farG = np.full(far_cap + 1, NG, np.int32)
    farG[:n_far] = np.repeat(ug, FAR_U)
    farN = np.full(far_cap + 1, -1, np.int32)

    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    acc = jnp.zeros((NG, G, 3), jnp.float32)
    pot = jnp.zeros((NG, G), jnp.float32)

    for M in (1 << 20, 7_340_032):
        fN = farN.copy()
        fN[:n_far] = rng.integers(0, M, n_far)
        tbl = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))
        fNj = jnp.asarray(fN)
        fGj = jnp.asarray(farG)

        fn = jax.jit(lambda a, p, fn_, fg, t, tr: _far_pass(
            a, p, fn_, fg, jnp.int32(n_far), t, tr, CFG, NG, False))
        timeit(f"REAL _far_pass 50M pairs, tbl {M>>20}M rows",
               fn, acc, pot, fNj, fGj, tbl, trow)

    # unit-structured near list
    nun = n_seg // NEAR_U
    ugn = np.sort(rng.integers(0, NG, nun)).astype(np.int32)
    segG = np.full(seg_cap + 1, NG, np.int32)
    segG[:n_seg] = np.repeat(ugn, NEAR_U)
    segE = np.full(seg_cap + 1, IMAX, np.int32)
    starts = rng.integers(0, N - 16, n_seg)
    cnts = rng.integers(4, 16, n_seg)
    segE[:n_seg] = starts * 32 + cnts
    planar16 = jnp.asarray(
        rng.standard_normal((NP16, 128)).astype(np.float32))

    fn2 = jax.jit(lambda a, p, se, sg, pl, tr: _near_pass(
        a, p, se, sg, jnp.int32(n_seg), pl, tr, CFG, NG, False))
    timeit("REAL _near_pass 5.6M entries", fn2, acc, pot,
           jnp.asarray(segE), jnp.asarray(segG), planar16, trow)


if __name__ == "__main__":
    main()
