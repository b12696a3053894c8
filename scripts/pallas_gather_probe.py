"""Probe: which gather formulations compile & run fast in Pallas on TPU.

Tests, per variant:
  A) tbl[ids] vector gather from a VMEM-resident (CAP,16) table
  B) jnp.take(tbl, ids, axis=0)
  C) per-row fori_loop scalar dynamic indexing (baseline, expected slow)
  D) XLA gather outside the kernel (reference rate)

Run on the axon TPU: python scripts/pallas_gather_probe.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 65536   # table rows
W = 2048                                                  # ids per block
NB = 256                                                  # blocks


def bench(label, fn, *args, reps=5):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{label:<44s} FAIL: {type(e).__name__}: {str(e)[:200]}")
        return None
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    rate = NB * W / dt / 1e6
    print(f"{label:<44s} {dt*1e3:9.2f} ms  {rate:10.1f} M rows/s")
    return out


def kernel_A(ids_ref, tbl_ref, out_ref):
    ids = ids_ref[0, :]                   # (W,)
    out_ref[0] = tbl_ref[ids]             # vector gather


def kernel_B(ids_ref, tbl_ref, out_ref):
    out_ref[0] = jnp.take(tbl_ref[:], ids_ref[0, :], axis=0)


def kernel_C(ids_ref, tbl_ref, out_ref):
    def body(i, _):
        out_ref[0, i, :] = tbl_ref[ids_ref[0, i], :]
        return 0
    jax.lax.fori_loop(0, W, body, 0)


def make_call(kernel):
    @jax.jit
    def run(ids, tbl):
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (i, 0),
                             memory_space=pltpu.SMEM)
                if kernel is kernel_C else
                pl.BlockSpec((1, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CAP, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W, 16), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NB, W, 16), jnp.float32),
        )(ids.reshape(NB, W), tbl)
    return run


def main():
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (CAP, 16), jnp.float32)
    ids = jax.random.randint(key, (NB * W,), 0, CAP, jnp.int32)

    print(f"table {CAP}x16 f32 ({CAP*64/1e6:.1f} MB), {NB} blocks x {W} ids")
    bench("D: XLA tbl[ids] (outside kernel)",
          jax.jit(lambda i, t: t[i]), ids, tbl)
    bench("A: in-kernel tbl[ids] VMEM", make_call(kernel_A), ids, tbl)
    bench("B: in-kernel jnp.take VMEM", make_call(kernel_B), ids, tbl)
    bench("C: in-kernel fori scalar rows", make_call(kernel_C), ids, tbl)


if __name__ == "__main__":
    main()
