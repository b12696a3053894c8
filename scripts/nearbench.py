"""Near-pass formulation shootout on real TPU shapes.

Synthesizes the near-field workload measured at N=1e6 (5.5M live segment
entries over ~16k groups of 64 targets) and times:

  v0  current: lax.map(blocks) + while(chunks), interleaved 16-pack rows,
      reshape deinterleave, SC=16
  v1  v0 with SC=64 (fewer, bigger chunks)
  v2  v0 with the deinterleave done as ONE 0/1-matrix matmul (MXU permute)
  v3  flat worklist: globally compacted entries, one gather of part rows +
      one gather of packed 64-target rows per chunk, segment-sum scatter
  v4  v3 + planar-by-16 particle rows (lane-contiguous field slices)

Run: python scripts/nearbench.py [n_entries] [reps]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

M = int(sys.argv[1]) if len(sys.argv) > 1 else 5_500_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

N = 1 << 20          # particles
NG = 16384           # groups
G = 64               # targets per group
GB = 32              # groups per block
NB = NG // GB
W = 352              # per-level live seg width cap per group (synthetic)
IMAX = jnp.int32(2147483647)


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.1f} ms  (compile {tc:.0f}s)", flush=True)
    return out, dt


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    # particle table, interleaved 16-pack: (N/16, 128)
    part = rng.standard_normal((N, 8)).astype(np.float32)
    part[:, 3] = np.abs(part[:, 3])  # mass
    part[:, 4] = 0.05                # eps
    part16 = part.reshape(N // 16, 128)
    # planar-by-16: [x0..15 y z m eps pad] -> (N/16, 128)
    planar = np.zeros((N // 16, 8, 16), np.float32)
    pr = part.reshape(N // 16, 16, 8)
    for f in range(8):
        planar[:, f, :] = pr[:, :, f]
    planar16 = planar.reshape(N // 16, 128)

    # entries: per group W slots, ~M/NG live each, sorted live-first
    per = M // NG
    ent = np.full((NG, W), 2**31 - 1, np.int64)
    starts = rng.integers(0, N - 16, size=(NG, per))
    starts.sort(axis=1)
    cnts = rng.integers(4, 16, size=(NG, per))
    ent[:, :per] = starts * 32 + cnts
    ent = ent.astype(np.int32)
    nlive = np.full((NB,), per, np.int32)

    # targets
    xr = rng.standard_normal((NG, G, 3)).astype(np.float32)
    te = np.full((NG, G), 0.05, np.float32)
    # packed target rows: x[64] y[64] z[64] eps[64] -> (NG, 256)
    trow = np.concatenate([xr[:, :, 0], xr[:, :, 1], xr[:, :, 2], te],
                          axis=1).astype(np.float32)
    # flat worklist for v3/v4: (M,) entry vals + group ids
    flat_e = ent[:, :per].reshape(-1)
    flat_g = np.repeat(np.arange(NG, dtype=np.int32), per)
    return (jnp.asarray(part16), jnp.asarray(planar16), jnp.asarray(ent),
            jnp.asarray(nlive), jnp.asarray(xr), jnp.asarray(te),
            jnp.asarray(trow), jnp.asarray(flat_e), jnp.asarray(flat_g))


def pair_math(d0, d1, d2, ym, yeps, te, need=True):
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te, yeps)
    # cheap stand-in for softened_inv_r3 (same op count class)
    inv = jnp.where(r > h, 1.0 / jnp.maximum(r2 * r, 1e-30),
                    1.0 / jnp.maximum(h * h * h, 1e-30))
    fac = ym * inv
    return (jnp.sum(fac * d0, -1), jnp.sum(fac * d1, -1),
            jnp.sum(fac * d2, -1))


# ---------------- v0/v1: current structure ----------------
def near_map_while(part16, ent, nlive, xr, te, SC):
    dtype = xr.dtype

    def near_block(args):
        ent_b, xrb, teb, max_b = args
        accb = jnp.zeros((GB, G, 3), dtype)

        def chunk(state):
            ci, accb = state
            e = lax.dynamic_slice(ent_b, (jnp.int32(0), ci * SC), (GB, SC))
            live = e != IMAX
            ev = jnp.where(live, e, 0)
            start = ev >> 5
            cnt = jnp.where(live, ev & 31, 0)
            row0 = start >> 4
            off = start & 15
            nrows = part16.shape[0]
            rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], -1)
            g = part16[rid.reshape(-1)].reshape(GB, SC, 2, 16, 8)
            g = g.reshape(GB, SC, 32, 8)
            slot = jnp.arange(32, dtype=jnp.int32)
            ok = (slot[None, None, :] >= off[:, :, None]) \
                & (slot[None, None, :] < (off + cnt)[:, :, None]) \
                & live[:, :, None]
            S = SC * 32
            y = g[..., 0:3].reshape(GB, S, 3)
            ym = jnp.where(ok, g[..., 3], 0.0).reshape(GB, S)
            yeps = g[..., 4].reshape(GB, S)
            d0 = xrb[:, :, None, 0] - y[:, None, :, 0]
            d1 = xrb[:, :, None, 1] - y[:, None, :, 1]
            d2 = xrb[:, :, None, 2] - y[:, None, :, 2]
            a0, a1, a2 = pair_math(d0, d1, d2, ym[:, None, :],
                                   yeps[:, None, :], teb[:, :, None])
            return ci + 1, accb - jnp.stack([a0, a1, a2], -1)

        def cond(state):
            return state[0] * SC < max_b

        _, accb = lax.while_loop(cond, chunk, (jnp.int32(0), accb))
        return accb

    acc = lax.map(near_block, (ent.reshape(NB, GB, W),
                               xr.reshape(NB, GB, G, 3),
                               te.reshape(NB, GB, G), nlive))
    return acc.reshape(NG, G, 3)


# ---------------- v2: matmul deinterleave ----------------
def near_matmul_deint(part16, ent, nlive, xr, te, SC):
    dtype = xr.dtype
    # 0/1 selection: (256 in-lanes) -> [x(32) y(32) z(32) m(32) eps(32)]
    sel = np.zeros((256, 160), np.float32)
    for s in range(32):
        src = (s // 16) * 128 + (s % 16) * 8
        for f in range(5):
            sel[src + f, f * 32 + s] = 1.0
    selj = jnp.asarray(sel)

    def near_block(args):
        ent_b, xrb, teb, max_b = args
        accb = jnp.zeros((GB, G, 3), dtype)

        def chunk(state):
            ci, accb = state
            e = lax.dynamic_slice(ent_b, (jnp.int32(0), ci * SC), (GB, SC))
            live = e != IMAX
            ev = jnp.where(live, e, 0)
            start = ev >> 5
            cnt = jnp.where(live, ev & 31, 0)
            row0 = start >> 4
            off = start & 15
            nrows = part16.shape[0]
            rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], -1)
            g = part16[rid.reshape(-1)].reshape(GB * SC, 256)
            gf = jnp.dot(g, selj, precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
            gf = gf.reshape(GB, SC, 160)
            S = SC * 32
            slot = jnp.arange(32, dtype=jnp.int32)
            ok = (slot[None, None, :] >= off[:, :, None]) \
                & (slot[None, None, :] < (off + cnt)[:, :, None]) \
                & live[:, :, None]
            yx = gf[..., 0:32].reshape(GB, S)
            yy = gf[..., 32:64].reshape(GB, S)
            yz = gf[..., 64:96].reshape(GB, S)
            ym = jnp.where(ok, gf[..., 96:128], 0.0).reshape(GB, S)
            yeps = gf[..., 128:160].reshape(GB, S)
            d0 = xrb[:, :, None, 0] - yx[:, None, :]
            d1 = xrb[:, :, None, 1] - yy[:, None, :]
            d2 = xrb[:, :, None, 2] - yz[:, None, :]
            a0, a1, a2 = pair_math(d0, d1, d2, ym[:, None, :],
                                   yeps[:, None, :], teb[:, :, None])
            return ci + 1, accb - jnp.stack([a0, a1, a2], -1)

        def cond(state):
            return state[0] * SC < max_b

        _, accb = lax.while_loop(cond, chunk, (jnp.int32(0), accb))
        return accb

    acc = lax.map(near_block, (ent.reshape(NB, GB, W),
                               xr.reshape(NB, GB, G, 3),
                               te.reshape(NB, GB, G), nlive))
    return acc.reshape(NG, G, 3)


# ---------------- v3/v4: flat worklist ----------------
def near_flat(part16, trow, flat_e, flat_g, CH, planar):
    """One scan over M entries in chunks of CH; per chunk: gather part rows,
    gather target rows, math (CH, 32|G), segment-sum into (NG, G, 3)."""
    dtype = trow.dtype
    Mtot = flat_e.shape[0]
    nch = Mtot // CH
    nrows = part16.shape[0]

    def chunk(carry, xs):
        acc = carry
        e, gid = xs
        start = e >> 5
        cnt = e & 31
        row0 = start >> 4
        off = start & 15
        rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], -1)
        g = part16[rid.reshape(-1)].reshape(CH, 2, 128)
        if planar:
            yx = jnp.concatenate([g[:, 0, 0:16], g[:, 1, 0:16]], -1)
            yy = jnp.concatenate([g[:, 0, 16:32], g[:, 1, 16:32]], -1)
            yz = jnp.concatenate([g[:, 0, 32:48], g[:, 1, 32:48]], -1)
            ym = jnp.concatenate([g[:, 0, 48:64], g[:, 1, 48:64]], -1)
            yeps = jnp.concatenate([g[:, 0, 64:80], g[:, 1, 64:80]], -1)
        else:
            gr = g.reshape(CH, 32, 8)
            yx, yy, yz = gr[..., 0], gr[..., 1], gr[..., 2]
            ym, yeps = gr[..., 3], gr[..., 4]
        slot = jnp.arange(32, dtype=jnp.int32)
        ok = (slot[None, :] >= off[:, None]) \
            & (slot[None, :] < (off + cnt)[:, None])
        ym = jnp.where(ok, ym, 0.0)
        tr = trow[gid]                      # (CH, 256)
        tx, ty, tz, teps = (tr[:, 0:64], tr[:, 64:128], tr[:, 128:192],
                            tr[:, 192:256])
        # (CH, G, 32)
        d0 = tx[:, :, None] - yx[:, None, :]
        d1 = ty[:, :, None] - yy[:, None, :]
        d2 = tz[:, :, None] - yz[:, None, :]
        a0, a1, a2 = pair_math(d0, d1, d2, ym[:, None, :],
                               yeps[:, None, :], teps[:, :, None])
        da = -jnp.stack([a0, a1, a2], -1)   # (CH, G, 3)
        acc = acc + jax.ops.segment_sum(da, gid, num_segments=NG,
                                        indices_are_sorted=True)
        return acc, 0

    acc0 = jnp.zeros((NG, G, 3), dtype)
    acc, _ = lax.scan(chunk, acc0,
                      (flat_e[:nch * CH].reshape(nch, CH),
                       flat_g[:nch * CH].reshape(nch, CH)))
    return acc


def main():
    print(f"M={M} entries, NG={NG} groups, devices={jax.devices()}",
          flush=True)
    (part16, planar16, ent, nlive, xr, te, trow, flat_e,
     flat_g) = make_data()

    v0 = jax.jit(partial(near_map_while, SC=16))
    timeit("v0 map/while SC=16 interleaved", v0, part16, ent, nlive, xr, te)
    v1 = jax.jit(partial(near_map_while, SC=64))
    timeit("v1 map/while SC=64 interleaved", v1, part16, ent, nlive, xr, te)
    v2 = jax.jit(partial(near_matmul_deint, SC=64))
    timeit("v2 map/while SC=64 matmul-deinterleave", v2,
           part16, ent, nlive, xr, te)
    for CH in (16384, 65536):
        v3 = jax.jit(partial(near_flat, CH=CH, planar=False))
        timeit(f"v3 flat scan CH={CH} interleaved", v3,
               part16, trow, flat_e, flat_g)
    for CH in (16384, 65536):
        v4 = jax.jit(partial(near_flat, CH=CH, planar=True))
        timeit(f"v4 flat scan CH={CH} planar16", v4,
               planar16, trow, flat_e, flat_g)


if __name__ == "__main__":
    main()
