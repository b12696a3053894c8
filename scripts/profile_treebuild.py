"""Attribute build_octree's cost at bench scale: sort, per-level segment
reductions, child links, and the refresh_octree variants.

Run: python scripts/profile_treebuild.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def sync(out):
    # host-read sync: block_until_ready alone does not force execution
    # through the axon tunnel
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ravel")]
    s = 0.0
    for x in leaves[:3]:
        s += float(jnp.sum(x.astype(jnp.float32).ravel()[:16]))
    return s


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = fn(*args)
    sync(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.1f} ms   (c+1st {tc:.1f}s)", flush=True)
    return out, dt


def main():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.morton import bounding_cube, morton_keys2
    from sidm_tpu.ops.tree import _level_caps, build_octree, refresh_octree

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    depth = ff.default_depth(N)
    caps = _level_caps(N, depth)
    print("level caps:", caps, flush=True)

    build = jax.jit(lambda p, m, e, v: build_octree(p, m, e, v, box=0.0,
                                                    depth=depth))
    tree, _ = timeit("build_octree (full)", build, pos, mass, eps, valid)
    refresh = jax.jit(refresh_octree)
    timeit("refresh_octree (full)", refresh, tree, pos, mass, eps, valid)

    # components
    def keys(p, v):
        origin, extent = bounding_cube(p, v, box=0.0)
        hi, lo = morton_keys2(p, origin, extent, depth)
        return hi, lo
    (hi, lo), _ = timeit("morton keys", jax.jit(keys), pos, valid)

    def sort2(hi, lo):
        p1 = jnp.argsort(lo, stable=True)
        return p1[jnp.argsort(hi[p1], stable=True)]
    perm, _ = timeit("two-pass argsort", jax.jit(sort2), hi, lo)

    pos_s = pos[perm]
    mass_s = mass[perm]
    x, y, z = pos_s[:, 0], pos_s[:, 1], pos_s[:, 2]
    prods = jnp.stack([mass_s, mass_s * x, mass_s * y, mass_s * z,
                       mass_s * x * x, mass_s * y * y, mass_s * z * z,
                       mass_s * x * y, mass_s * x * z, mass_s * y * z,
                       jnp.ones(N, jnp.float32)], axis=1)
    seg13 = jnp.cumsum((tree.bound_level <= depth).astype(jnp.int32)) - 1

    def one_cumsum(b):
        return jnp.cumsum(b)
    timeit("one cumsum (N,) int32", jax.jit(one_cumsum),
           (tree.bound_level <= depth).astype(jnp.int32))

    cap = caps[depth]

    def one_segsum(pr, seg):
        return jax.ops.segment_sum(pr, jnp.clip(seg, 0, cap - 1),
                                   num_segments=cap,
                                   indices_are_sorted=True)
    timeit("one segment_sum (N,11) -> cap", jax.jit(one_segsum), prods,
           seg13)

    def one_segsum_unsorted(pr, seg):
        return jax.ops.segment_sum(pr, jnp.clip(seg, 0, cap - 1),
                                   num_segments=cap)
    timeit("one segment_sum (N,11), unsorted flag", jax.jit(
        one_segsum_unsorted), prods, seg13)

    def one_segmax(e, seg):
        return jax.ops.segment_max(e, jnp.clip(seg, 0, cap - 1),
                                   num_segments=cap,
                                   indices_are_sorted=True)
    timeit("one segment_max (N,) -> cap", jax.jit(one_segmax), eps, seg13)

    def one_segmin(seg):
        idx = jnp.arange(N, dtype=jnp.int32)
        return jax.ops.segment_min(idx, jnp.clip(seg, 0, cap - 1),
                                   num_segments=cap,
                                   indices_are_sorted=True)
    timeit("one segment_min (N,) -> cap", jax.jit(one_segmin), seg13)

    # diff-of-ends formulation: boundary-gather variant of a sorted
    # segment sum — cumsum along N then gather at segment ends
    def seg_by_ends(pr, seg):
        c = jnp.cumsum(pr, axis=0)
        idx = jnp.arange(N, dtype=jnp.int32)
        last = jax.ops.segment_max(idx, jnp.clip(seg, 0, cap - 1),
                                   num_segments=cap,
                                   indices_are_sorted=True)
        lastc = jnp.clip(last, 0, N - 1)
        ends = c[lastc]
        return ends
    timeit("cumsum(N,11) + end gather", jax.jit(seg_by_ends), prods, seg13)


if __name__ == "__main__" and not os.environ.get("TB_VARIANTS"):
    main()


def variants():
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.tree import build_octree

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(N, 0.3, jnp.float32)
    valid = jnp.ones(N, bool)
    depth = ff.default_depth(N)
    for skip in [(), ("emax",), ("children",), ("moments",),
                 ("emax", "children", "moments")]:
        fn = jax.jit(lambda p, m, e, v, s=skip: build_octree(
            p, m, e, v, box=0.0, depth=depth, _skip=s))
        timeit(f"build skip={skip}", fn, pos, mass, eps, valid)


if __name__ == "__main__" and os.environ.get("TB_VARIANTS"):
    variants()
