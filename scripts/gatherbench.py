"""Gather-rate experiments: table size sweep + Pallas VMEM-table gather.

The fused walk/eval is gather-bound (~16 ns/row via XLA take). These
experiments check (a) whether small tables gather faster, (b) whether a
Pallas kernel with the table resident in VMEM beats XLA's gather, and
(c) one-hot matmul gather for tiny tables.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32))
    dt = (time.time() - t0) / reps
    print(f"{label:<56s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    F = 1 << 23  # 8M gathered rows
    print(f"F = {F>>20}M rows gathered each test; floor ~32ms", flush=True)

    # (a) XLA gather vs table size
    for logM in (10, 14, 17, 20, 22):
        M = 1 << logM
        tbl = jax.random.normal(key, (M, 16), jnp.float32)
        idx = jax.random.randint(key, (F,), 0, M, jnp.int32)
        g = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
        dt = timeit(f"XLA gather 8M rows from (2^{logM},16)", g, tbl, idx)
        print(f"    -> {F/max(dt-0.032,1e-4)/1e6:.0f} M rows/s (floor-adj)")

    # sorted indices?
    M = 1 << 20
    tbl = jax.random.normal(key, (M, 16), jnp.float32)
    idx = jnp.sort(jax.random.randint(key, (F,), 0, M, jnp.int32))
    g = jax.jit(lambda t, i: jnp.sum(t[i], axis=1))
    dt = timeit("XLA gather 8M SORTED rows from (2^20,16)", g, tbl, idx)
    print(f"    -> {F/max(dt-0.032,1e-4)/1e6:.0f} M rows/s")

    # (b) Pallas: table resident in VMEM, vectorized take inside kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 1 << 14  # 16K rows x 16 f32 = 1 MB table
    TB = 1 << 13  # index block per grid step
    tbl = jax.random.normal(key, (M, 16), jnp.float32)
    idx = jax.random.randint(key, (F,), 0, M, jnp.int32)

    def gather_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[:]                      # (TB,)
        rows = jnp.take(tbl_ref[:], ids, axis=0)   # (TB,16)
        out_ref[:] = jnp.sum(rows, axis=1, keepdims=True)

    def pallas_gather(tbl, idx):
        return pl.pallas_call(
            gather_kernel,
            grid=(F // TB,),
            in_specs=[
                pl.BlockSpec((TB,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, 1), jnp.float32),
        )(idx, tbl)

    try:
        dt = timeit("Pallas VMEM take 8M rows from (2^14,16)",
                    jax.jit(pallas_gather), tbl, idx)
        print(f"    -> {F/max(dt-0.032,1e-4)/1e6:.0f} M rows/s")
    except Exception as e:
        print(f"Pallas take failed: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # (b2) Pallas with one-hot matmul gather from small VMEM table
    M2 = 1 << 10  # 1K rows
    tbl2 = jax.random.normal(key, (M2, 16), jnp.float32)
    idx2 = jax.random.randint(key, (F,), 0, M2, jnp.int32)
    TB2 = 1 << 11

    def onehot_kernel(idx_ref, tbl_ref, out_ref):
        ids = idx_ref[:]                          # (TB2,)
        oh = (ids[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (TB2, M2), 1)).astype(jnp.float32)
        rows = jnp.dot(oh, tbl_ref[:], preferred_element_type=jnp.float32)
        out_ref[:] = jnp.sum(rows, axis=1, keepdims=True)

    def pallas_onehot(tbl, idx):
        return pl.pallas_call(
            onehot_kernel,
            grid=(F // TB2,),
            in_specs=[
                pl.BlockSpec((TB2,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M2, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB2, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, 1), jnp.float32),
        )(idx, tbl)

    try:
        dt = timeit("Pallas one-hot matmul 8M rows from (2^10,16)",
                    jax.jit(pallas_onehot), tbl2, idx2)
        print(f"    -> {F/max(dt-0.032,1e-4)/1e6:.0f} M rows/s")
    except Exception as e:
        print(f"Pallas one-hot failed: {type(e).__name__}: "
              f"{str(e)[:300]}")

    # (c) XLA one-hot matmul gather from small table (no pallas)
    def xla_onehot(tbl, idx):
        oh = jax.nn.one_hot(idx, M2, dtype=jnp.bfloat16)
        return jnp.sum(jnp.dot(oh, tbl.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32), axis=1)

    dt = timeit("XLA one-hot bf16 matmul 8M rows from (2^10,16)",
                jax.jit(xla_onehot), tbl2, idx2)
    print(f"    -> {F/max(dt-0.032,1e-4)/1e6:.0f} M rows/s")


if __name__ == "__main__":
    main()
