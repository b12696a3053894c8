"""TPU primitive microbenchmarks that calibrate the fused-walk design.

Measures the primitives the force/SIDM hot paths are built from:
layout padding cost for narrow trailing dims, batched minor-axis sort,
row gathers at several table widths, sorted segment_sum, argsort, and
batched matmul (the MXU formulation of pair math).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real readback to defeat any async laziness
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8]
                  .astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8]
                  .astype(jnp.float32)))
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    print(f"devices = {jax.devices()}")
    key = jax.random.PRNGKey(0)
    N = 1 << 20

    # --- layout: elementwise on (N,3) vs (3,N) vs flat ---
    a3 = jax.random.normal(key, (N, 3), jnp.float32)
    a3t = jnp.asarray(a3.T)
    af = a3.ravel()
    f1 = jax.jit(lambda x: x * 2.0 + 1.0)
    timeit("elementwise (1M,3)", f1, a3)
    timeit("elementwise (3,1M)", f1, a3t)
    timeit("elementwise (3M,) flat", f1, af)
    a8 = jax.random.normal(key, (N, 8), jnp.float32)
    a128 = jax.random.normal(key, (N // 16, 128), jnp.float32)
    timeit("elementwise (1M,8)", f1, a8)
    timeit("elementwise (64K,128) same elems", f1, a128)

    # --- batched minor-axis sort (the compaction primitive) ---
    for (B, W) in [(16384, 512), (16384, 1024), (4096, 4096)]:
        x = jax.random.randint(key, (B, W), 0, 1 << 30, jnp.int32)
        f = jax.jit(lambda x: jnp.sort(x, axis=1))
        timeit(f"sort axis1 ({B},{W}) i32", f, x)
        f2 = jax.jit(lambda x: jnp.argsort(x, axis=1))
        timeit(f"argsort axis1 ({B},{W}) i32", f2, x)

    # --- global argsort for reference ---
    x = jax.random.randint(key, (4 << 20,), 0, 1 << 30, jnp.int32)
    timeit("argsort (4M,) i32", jax.jit(jnp.argsort), x, reps=2)

    # --- gathers: F random rows from (M, w) tables ---
    M = 1 << 22
    F = 1 << 23
    idx = jax.random.randint(key, (F,), 0, M, jnp.int32)
    for w in (8, 16, 128):
        tbl = jax.random.normal(key, (M, w), jnp.float32)
        g = jax.jit(lambda t, i: t[i])
        dt = timeit(f"gather {F>>20}M rows from ({M>>20}M,{w})", g, tbl, idx)
        print(f"    -> {F/dt/1e9:.2f} Grows/s, "
              f"{F*512/dt/1e9:.0f} GB/s sublane-equiv")

    # gather fused into a reduction (does XLA avoid materializing?)
    tbl16 = jax.random.normal(key, (M, 16), jnp.float32)
    gr = jax.jit(lambda t, i: jnp.sum(t[i] * 2.0, axis=1))
    timeit("gather 8M rows (4M,16) + fused rowsum", gr, tbl16, idx)

    # gather CONTIGUOUS 16-row blocks (near-field segment pattern)
    idxb = jax.random.randint(key, (F // 16,), 0, M - 16, jnp.int32)

    def seg_gather(t, i):
        off = jnp.arange(16, dtype=jnp.int32)
        return t[(i[:, None] + off[None, :]).reshape(-1)]

    timeit("gather 0.5M x 16-contig rows from (4M,16)",
           jax.jit(seg_gather), tbl16, idxb)

    # --- sorted segment_sum ---
    CH = 1 << 21
    G = 64
    vals = jnp.ones((CH, G), jnp.float32)
    segs = jnp.sort(jax.random.randint(key, (CH,), 0, 16384, jnp.int32))
    ss = jax.jit(lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=16385, indices_are_sorted=True))
    timeit(f"segment_sum sorted ({CH>>20}M,{G})", ss, vals, segs)

    # --- batched matmul (MXU pair math): (B,64,C)x(B,C,3) ---
    B, C = 2048, 256
    wmat = jax.random.normal(key, (B, 64, C), jnp.float32)
    ymat = jax.random.normal(key, (B, C, 3), jnp.float32)
    mm = jax.jit(lambda w, y: jnp.einsum(
        "bgc,bcd->bgd", w, y, preferred_element_type=jnp.float32))
    dt = timeit(f"batched matmul ({B},64,{C})x({B},{C},3)", mm, wmat, ymat)
    print(f"    -> {2*B*64*C*3/dt/1e12:.2f} Tflop/s")
    # and the r^2 cross term: (B,64,3)x(B,3,C)
    xg = jax.random.normal(key, (B, 64, 3), jnp.float32)
    yg = jax.random.normal(key, (B, 3, C), jnp.float32)
    mm2 = jax.jit(lambda x, y: jnp.einsum(
        "bgd,bdc->bgc", x, y, preferred_element_type=jnp.float32))
    dt = timeit(f"batched matmul ({B},64,3)x({B},3,{C})", mm2, xg, yg)
    print(f"    -> {2*B*64*C*3/dt/1e12:.2f} Tflop/s")

    # elementwise transcendental on the pair matrix (f(r) stage)
    r2 = jnp.abs(jax.random.normal(key, (B, 64, C), jnp.float32)) + 0.1
    fr = jax.jit(lambda r2: jax.lax.rsqrt(r2) / r2)
    dt = timeit(f"rsqrt+div on ({B},64,{C})", fr, r2)
    print(f"    -> {B*64*C/dt/1e9:.1f} Gelem/s")

    # --- while_loop dispatch overhead ---
    def body(c):
        i, x = c
        return i + 1, x * 1.0001

    wl = jax.jit(lambda x: jax.lax.while_loop(
        lambda c: c[0] < 200, body, (jnp.int32(0), x))[1])
    small = jnp.ones((8, 128), jnp.float32)
    dt = timeit("while_loop 200 trivial iters", wl, small)
    print(f"    -> {dt/200*1e6:.1f} us/iter")


if __name__ == "__main__":
    main()
