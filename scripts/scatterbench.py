"""Accumulation-primitive shootout for the flat pair-queue engine.

Per 65k-pair chunk the walk must add (CH, 64, 3) masked contributions into
a (16384, 64, 3) per-group accumulator, with gids forming sorted contiguous
runs. Candidates:

  m1 jax.ops.segment_sum -> full (NG, ...) output per chunk
  m2 acc.at[gids].add(vals)
  m3 local segment_sum to a (SPAN, ...) window + dynamic_update_slice add
  m4 flat scatter .at[dest].set of CH int32 (near-list emission cost)
  m5 cumsum compaction position compute (CH,)

Run: python scripts/scatterbench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CH = 65536
NG = 16384
G = 64
SPAN = 2048
REPS = 5


def timeit(label, fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<56s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((CH, G, 3)).astype(np.float32))
    # sorted contiguous run gids spanning ~1500 groups
    gids_np = np.sort(rng.integers(7000, 8500, size=CH)).astype(np.int32)
    gids = jnp.asarray(gids_np)
    acc = jnp.zeros((NG, G, 3), jnp.float32)

    @jax.jit
    def m1(acc, vals, gids):
        return acc + jax.ops.segment_sum(vals, gids, num_segments=NG,
                                         indices_are_sorted=True)

    @jax.jit
    def m1u(acc, vals, gids):
        return acc + jax.ops.segment_sum(vals, gids, num_segments=NG)

    @jax.jit
    def m2(acc, vals, gids):
        return acc.at[gids].add(vals)

    @jax.jit
    def m3(acc, vals, gids):
        g0 = gids[0]
        loc = jax.ops.segment_sum(vals, jnp.clip(gids - g0, 0, SPAN - 1),
                                  num_segments=SPAN,
                                  indices_are_sorted=True)
        win = lax.dynamic_slice(acc, (g0, 0, 0), (SPAN, G, 3))
        return lax.dynamic_update_slice(acc, win + loc, (g0, 0, 0))

    flat = jnp.full(8 * 1024 * 1024, 2**31 - 1, jnp.int32)
    ev = jnp.asarray(rng.integers(0, 1 << 30, CH).astype(np.int32))
    mask = jnp.asarray(rng.random(CH) < 0.3)

    @jax.jit
    def m4(flat, ev, mask):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dest = jnp.where(mask, pos, flat.shape[0] - 1)
        return flat.at[dest].set(jnp.where(mask, ev, flat[-1]))

    @jax.jit
    def m5(mask):
        return jnp.cumsum(mask.astype(jnp.int32))

    timeit("m1 segment_sum sorted -> (16k,64,3)", m1, acc, vals, gids)
    timeit("m1u segment_sum unsorted-flag", m1u, acc, vals, gids)
    timeit("m2 at[gids].add", m2, acc, vals, gids)
    timeit("m3 local segsum SPAN=2048 + dyn window add", m3, acc, vals,
           gids)
    timeit("m4 flat emission scatter (CH int32)", m4, flat, ev, mask)
    timeit("m5 cumsum positions (CH,)", m5, mask)
    # correctness spot check m3 vs m1
    a1 = m1(acc, vals, gids)
    a3 = m3(acc, vals, gids)
    print("m3 == m1:", bool(jnp.allclose(a1, a3, atol=1e-3)), flush=True)


if __name__ == "__main__":
    main()
