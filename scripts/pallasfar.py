"""Prototype: Pallas far-unit kernel vs XLA elementwise far math.

Far pairs are padded into UNITS of 32 pairs sharing one target group.
The kernel processes tiles of 4 units = (64 targets x 128 pairs) f32
VPU tiles, reducing the 32-pair lane groups per unit with a 0/1 MXU
matmul at HIGHEST precision. Validates numerics against the XLA form.

Run: python scripts/pallasfar.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NU = 2048            # units per chunk (x32 pairs = 65536)
TU = 4               # units per tile
NT = NU // TU        # tiles (grid)
NG = 16384
G = 64
NCHUNK = 25          # chunks to time (=> 1.6M units = 52M pairs)


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:8]
                         .astype(jnp.float32)))


def _sync_full(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]
                         .astype(jnp.float32)))


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<52s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


SUB = 8              # tiles per grid step (sublane-aligned blocks)


def far_kernel(com0, com1, com2, m, q0, q1, q2, q3, q4, q5, eni,
               tgtT, out):
    """SUB tiles, each 4 units x 32 pairs against their 4 target rows.

    tgtT block: (SUB, 64, 16) with [tx(4) ty(4) tz(4) tie(4)] per target
    row; fields: (SUB, 128) per-pair lanes."""
    for s in range(SUB):
        tt = tgtT[s]                                  # (64, 16)
        # unit-major broadcast (64,4)->(64,128) as an exact 0/1 matmul
        # (one term per output -> exact in f32 at HIGHEST precision)
        ucol = lax.broadcasted_iota(jnp.int32, (TU, 128), 0)
        lane = lax.broadcasted_iota(jnp.int32, (TU, 128), 1)
        bsel = ((lane // 32) == ucol).astype(jnp.float32)

        def rep(c):   # target field c -> (64, 128) unit-major broadcast
            return jnp.dot(tt[:, 4 * c:4 * (c + 1)], bsel,
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

        txr, tyr, tzr, tier = rep(0), rep(1), rep(2), rep(3)
        c0 = com0[s][None, :]        # (1,128) -> broadcast (64,128)
        c1 = com1[s][None, :]
        c2 = com2[s][None, :]
        d0 = c0 - txr
        d1 = c1 - tyr
        d2 = c2 - tzr
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        inv_r = lax.rsqrt(jnp.maximum(r2, 1e-37))
        h_inv = jnp.minimum(tier, eni[s][None, :]) * (1.0 / 2.8)
        r = r2 * inv_r
        u = r * h_inv
        inv_r3 = inv_r * inv_r * inv_r
        u2 = u * u
        u3 = u2 * u
        h_inv3 = h_inv * h_inv * h_inv
        inner = 32.0 * (1.0 / 3.0 - 1.2 * u2 + u3) * h_inv3
        outer = (64.0 * (1.0 / 3.0 - 0.75 * u + 0.6 * u2 - u3 / 6.0)
                 ) * h_inv3 - inv_r3 * (1.0 / 15.0)
        wf = jnp.where(u < 0.5, inner, outer)
        newton = u >= 1.0
        fac = m[s][None, :] * jnp.where(newton, inv_r3, wf)
        a0, a1, a2 = fac * d0, fac * d1, fac * d2

        ir = jnp.where(newton, inv_r, 0.0)
        ir2 = ir * ir
        w5 = ir2 * ir2 * ir
        w7 = w5 * ir2
        u0 = q0[s][None, :] * d0 + q3[s][None, :] * d1 \
            + q4[s][None, :] * d2
        u1 = q3[s][None, :] * d0 + q1[s][None, :] * d1 \
            + q5[s][None, :] * d2
        u2_ = q4[s][None, :] * d0 + q5[s][None, :] * d1 \
            + q2[s][None, :] * d2
        dqd = d0 * u0 + d1 * u1 + d2 * u2_
        t7 = 2.5 * w7 * dqd
        a0 = a0 - w5 * u0 + t7 * d0
        a1 = a1 - w5 * u1 + t7 * d1
        a2 = a2 - w5 * u2_ + t7 * d2
        # potential (4th component)
        wp_in = (16.0 / 3.0 * u2 - 9.6 * u2 * u2 + 6.4 * u2 * u3
                 - 2.8) * h_inv
        wp_out = (inv_r * (1.0 / 15.0)
                  + (32.0 / 3.0 * u2 - 16.0 * u3 + 9.6 * u2 * u2
                     - 32.0 / 15.0 * u2 * u3 - 3.2) * h_inv)
        wp = jnp.where(u < 0.5, wp_in, wp_out)
        p = m[s][None, :] * jnp.where(newton, -inv_r, wp) \
            - 0.5 * dqd * w5

        # reduce 32-pair lane groups per unit: (64,128)@(128,4) 0/1 matmul
        lane = lax.broadcasted_iota(jnp.int32, (128, TU), 0)
        ucol = lax.broadcasted_iota(jnp.int32, (128, TU), 1)
        sel = ((lane // 32) == ucol).astype(jnp.float32)
        for c, arr in enumerate((a0, a1, a2, p)):
            red = jnp.dot(arr, sel, precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)   # (64, 4)
            out[s, :, c * TU:(c + 1) * TU] = red


def far_pallas_chunk(fields, tgtT):
    """fields: 11 x (NT, 128); tgtT: (NT, 64, 16). -> (NT, 64, 16)."""
    specs1 = [pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)] * 11
    spec2 = pl.BlockSpec((SUB, 64, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        far_kernel,
        grid=(NT // SUB,),
        in_specs=specs1 + [spec2],
        out_specs=pl.BlockSpec((SUB, 64, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, 64, 16), jnp.float32),
    )(*fields, tgtT)


def make_chunk(rng):
    rows = rng.standard_normal((NU * 32, 16)).astype(np.float32)
    rows[:, 3] = np.abs(rows[:, 3])
    rows[:, 14] = 1.0 / 0.3
    ugid = np.sort(rng.integers(0, NG, NU)).astype(np.int32)
    tgt = rng.standard_normal((NU, 256)).astype(np.float32)
    tgt[:, 192:] = 1.0 / 0.3
    return jnp.asarray(rows), jnp.asarray(tgt), jnp.asarray(ugid)


def xla_ref(rows, tgt):
    """Same math, XLA elementwise (the flat-engine _far_pass form)."""
    com = rows[:, 0:3]
    m = rows[:, 3]
    tr = jnp.repeat(tgt, 32, axis=0)          # (NU*32, 256)
    tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2*G], tr[:, 2*G:3*G],
                       tr[:, 3*G:4*G])
    d0 = com[:, 0:1] - tx
    d1 = com[:, 1:2] - ty
    d2 = com[:, 2:3] - tz
    r2 = d0*d0 + d1*d1 + d2*d2
    inv_r = lax.rsqrt(jnp.maximum(r2, 1e-37))
    h_inv = jnp.minimum(tie, rows[:, 14:15]) * (1.0/2.8)
    r = r2 * inv_r
    u = r * h_inv
    inv_r3 = inv_r * inv_r * inv_r
    u2 = u * u
    u3 = u2 * u
    h_inv3 = h_inv * h_inv * h_inv
    inner = 32.0*(1.0/3.0 - 1.2*u2 + u3)*h_inv3
    outer = 64.0*(1.0/3.0 - 0.75*u + 0.6*u2 - u3/6.0)*h_inv3 \
        - inv_r3*(1.0/15.0)
    wf = jnp.where(u < 0.5, inner, outer)
    newton = u >= 1.0
    fac = m[:, None]*jnp.where(newton, inv_r3, wf)
    a0, a1, a2 = fac*d0, fac*d1, fac*d2
    q = rows[:, 8:14]
    ir = jnp.where(newton, inv_r, 0.0)
    ir2 = ir*ir
    w5 = ir2*ir2*ir
    w7 = w5*ir2
    u0 = q[:, 0:1]*d0 + q[:, 3:4]*d1 + q[:, 4:5]*d2
    u1 = q[:, 3:4]*d0 + q[:, 1:2]*d1 + q[:, 5:6]*d2
    u2_ = q[:, 4:5]*d0 + q[:, 5:6]*d1 + q[:, 2:3]*d2
    dqd = d0*u0 + d1*u1 + d2*u2_
    t7 = 2.5*w7*dqd
    a0 = a0 - w5*u0 + t7*d0
    a1 = a1 - w5*u1 + t7*d1
    a2 = a2 - w5*u2_ + t7*d2
    wp_in = (16.0/3.0*u2 - 9.6*u2*u2 + 6.4*u2*u3 - 2.8)*h_inv
    wp_out = inv_r*(1.0/15.0) + (32.0/3.0*u2 - 16.0*u3 + 9.6*u2*u2
                                 - 32.0/15.0*u2*u3 - 3.2)*h_inv
    wp = jnp.where(u < 0.5, wp_in, wp_out)
    p = m[:, None]*jnp.where(newton, -inv_r, wp) - 0.5*dqd*w5
    # per-unit sums
    def red(a):
        return jnp.sum(a.reshape(NU, 32, G), axis=1)
    return red(a0), red(a1), red(a2), red(p)


def split_fields(rows):
    r = rows.reshape(NT, TU * 32, 16)
    fields = [r[:, :, i] for i in (0, 1, 2, 3, 8, 9, 10, 11, 12, 13, 14)]
    return fields


def split_tgt(tgt):
    """(NU, 256) -> (NT, 64, 16): per target row [tx(4) ty(4) tz(4)
    tie(4)] across the tile's 4 units."""
    t = tgt.reshape(NT, TU, 4, G)        # (NT, 4u, 4f, 64)
    return jnp.transpose(t, (0, 3, 2, 1)).reshape(NT, G, 16)


def main():
    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    rows, tgt, ugid = make_chunk(rng)

    # numerics check
    fields = split_fields(rows)
    tgts = split_tgt(tgt)
    out = far_pallas_chunk(fields, tgts)          # (NT, 64, 16)
    def comp(c):
        return jnp.transpose(out[:, :, c*TU:(c+1)*TU],
                             (0, 2, 1)).reshape(NU, G)
    a0p, a1p, a2p, ppp = comp(0), comp(1), comp(2), comp(3)
    a0r, a1r, a2r, pr = jax.jit(xla_ref)(rows, tgt)
    for nm, ap, ar in (("a0", a0p, a0r), ("a1", a1p, a1r),
                       ("a2", a2p, a2r), ("pot", ppp, pr)):
        d = float(jnp.max(jnp.abs(ap - ar))
                  / jnp.maximum(jnp.max(jnp.abs(ar)), 1e-30))
        print(f"  {nm} max rel diff vs XLA: {d:.2e}", flush=True)

    # timing: NCHUNK chunks through a lax.scan (simulates the while loop)
    @jax.jit
    def many_pallas(rows, tgt):
        def body(c, _):
            f = split_fields(rows + c)
            t = split_tgt(tgt)
            o = far_pallas_chunk(f, t)
            return c + jnp.sum(o) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=NCHUNK)
        return c

    @jax.jit
    def many_xla(rows, tgt):
        def body(c, _):
            o = xla_ref(rows + c, tgt)
            return c + (jnp.sum(o[0]) + jnp.sum(o[1]) + jnp.sum(o[2]) + jnp.sum(o[3])) * 1e-30, None
        c, _ = lax.scan(body, jnp.float32(0), None, length=NCHUNK)
        return c

    timeit(f"pallas far {NCHUNK} chunks ({NCHUNK*NU*32//1000000}M pairs)",
           many_pallas, rows, tgt)
    timeit(f"xla    far {NCHUNK} chunks", many_xla, rows, tgt)


if __name__ == "__main__":
    main()


NL = 1 << 20


def variant_A(tbl, trow, fid, ugid):
    """while_loop + acc carry + per-chunk segment_sum (current engine)."""
    nch = fid.shape[0] // (NU * 32)
    acc = jnp.zeros((NG, G, 4), jnp.float32)

    def body(state):
        ci, acc = state
        ids = lax.dynamic_slice(fid, (ci * NU * 32,), (NU * 32,))
        ug = lax.dynamic_slice(ugid, (ci * NU,), (NU,))
        rows = tbl[jnp.clip(ids, 0, NL - 1)]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        f = split_fields(rows)
        tt = split_tgt(tgt)
        o = far_pallas_chunk(f, tt)                 # (NT, 64, 16)
        o4 = jnp.transpose(o.reshape(NT, G, 4, TU),
                           (0, 3, 1, 2)).reshape(NU, G, 4)
        acc = acc + jax.ops.segment_sum(o4, ug, num_segments=NG)
        return ci + 1, acc

    def cond(state):
        return state[0] < nch

    return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]


def variant_B(tbl, trow, fid, ugid):
    """scan emitting unit partials; one segment_sum at the end."""
    nch = fid.shape[0] // (NU * 32)

    def body(_, xs):
        ids, ug = xs
        rows = tbl[jnp.clip(ids, 0, NL - 1)]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        f = split_fields(rows)
        tt = split_tgt(tgt)
        o = far_pallas_chunk(f, tt)
        o4 = jnp.transpose(o.reshape(NT, G, 4, TU),
                           (0, 3, 1, 2)).reshape(NU, G, 4)
        return 0, o4

    _, parts = lax.scan(body, 0, (fid.reshape(nch, NU * 32),
                                  ugid.reshape(nch, NU)))
    return jax.ops.segment_sum(parts.reshape(-1, G, 4),
                               ugid, num_segments=NG)


def main3():
    rng = np.random.default_rng(1)
    nch = NCHUNK
    tbl = jnp.asarray(rng.standard_normal((NL, 16)).astype(np.float32))
    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    fid = jnp.asarray(rng.integers(0, NL, nch * NU * 32).astype(np.int32))
    ugid = jnp.asarray(np.sort(rng.integers(0, NG, nch * NU))
                       .astype(np.int32))
    a, _ = timeit("A while+acc-carry+chunk segsum", jax.jit(variant_A),
                  tbl, trow, fid, ugid)
    b, _ = timeit("B scan partials + one segsum", jax.jit(variant_B),
                  tbl, trow, fid, ugid)
    print("A==B:", float(jnp.max(jnp.abs(a - b))), flush=True)


def variant_C(tbl, trow, fid, ugid):
    """while+acc like A but XLA unit math (repeat broadcast + reshape
    reductions) instead of the Pallas kernel."""
    nch = fid.shape[0] // (NU * 32)
    acc = jnp.zeros((NG, G, 4), jnp.float32)

    def body(state):
        ci, acc = state
        ids = lax.dynamic_slice(fid, (ci * NU * 32,), (NU * 32,))
        ug = lax.dynamic_slice(ugid, (ci * NU,), (NU,))
        rows = tbl[jnp.clip(ids, 0, NL - 1)]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        a0, a1, a2, p = xla_ref(rows, tgt)
        o4 = jnp.stack([a0, a1, a2, p], axis=-1)     # (NU, G, 4)
        acc = acc + jax.ops.segment_sum(o4, ug, num_segments=NG)
        return ci + 1, acc

    def cond(state):
        return state[0] < nch

    return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]


def main4():
    rng = np.random.default_rng(1)
    nch = NCHUNK
    tbl = jnp.asarray(rng.standard_normal((NL, 16)).astype(np.float32))
    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    fid = jnp.asarray(rng.integers(0, NL, nch * NU * 32).astype(np.int32))
    ugid = jnp.asarray(np.sort(rng.integers(0, NG, nch * NU))
                       .astype(np.int32))
    c, _ = timeit("C while+acc, XLA unit math", jax.jit(variant_C),
                  tbl, trow, fid, ugid)
    a, _ = timeit("A while+acc, pallas kernel", jax.jit(variant_A),
                  tbl, trow, fid, ugid)
    print("C==A:", float(jnp.max(jnp.abs(a - c))), flush=True)


def variant_D(tbl, trow, fid, ugid, n_units):
    """variant_C but with a TRACED while bound (like the real engine)."""
    acc = jnp.zeros((NG, G, 4), jnp.float32)

    def body(state):
        ci, acc = state
        ids = lax.dynamic_slice(fid, (ci * NU * 32,), (NU * 32,))
        ug = lax.dynamic_slice(ugid, (ci * NU,), (NU,))
        rows = tbl[jnp.clip(ids, 0, NL - 1)]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        a0, a1, a2, p = xla_ref(rows, tgt)
        o4 = jnp.stack([a0, a1, a2, p], axis=-1)
        acc = acc + jax.ops.segment_sum(o4, ug, num_segments=NG)
        return ci + 1, acc

    def cond(state):
        return state[0] * NU < n_units

    return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]


def variant_E(tbl, trow, fid, ugid, n_units):
    """variant_C with traced bound AND per-pair trow gather (the real
    engine's exact access pattern)."""
    acc = jnp.zeros((NG, G, 4), jnp.float32)

    def body(state):
        ci, acc = state
        ids = lax.dynamic_slice(fid, (ci * NU * 32,), (NU * 32,))
        ug = lax.dynamic_slice(ugid, (ci * NU,), (NU,))
        rows = tbl[jnp.clip(ids, 0, NL - 1)]
        gid_pair = jnp.repeat(ug, 32)
        tr = trow[jnp.clip(gid_pair, 0, NG - 1)]     # per-pair 1KB gather
        com = rows[:, 0:3]
        m = rows[:, 3]
        tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2*G], tr[:, 2*G:3*G],
                           tr[:, 3*G:4*G])
        d0 = com[:, 0:1] - tx
        d1 = com[:, 1:2] - ty
        d2 = com[:, 2:3] - tz
        r2 = d0*d0 + d1*d1 + d2*d2
        inv_r = lax.rsqrt(jnp.maximum(r2, 1e-37))
        h_inv = jnp.minimum(tie, rows[:, 14:15]) * (1.0/2.8)
        r = r2 * inv_r
        u = r * h_inv
        inv_r3 = inv_r * inv_r * inv_r
        u2 = u*u; u3 = u2*u
        h_inv3 = h_inv*h_inv*h_inv
        inner = 32.0*(1.0/3.0 - 1.2*u2 + u3)*h_inv3
        outer = 64.0*(1.0/3.0 - 0.75*u + 0.6*u2 - u3/6.0)*h_inv3 \
            - inv_r3*(1.0/15.0)
        wf = jnp.where(u < 0.5, inner, outer)
        newton = u >= 1.0
        fac = m[:, None]*jnp.where(newton, inv_r3, wf)
        a0 = jnp.sum((fac*d0).reshape(NU, 32, G), axis=1)
        a1 = jnp.sum((fac*d1).reshape(NU, 32, G), axis=1)
        a2 = jnp.sum((fac*d2).reshape(NU, 32, G), axis=1)
        o4 = jnp.stack([a0, a1, a2, a0], axis=-1)
        acc = acc + jax.ops.segment_sum(o4, ug, num_segments=NG)
        return ci + 1, acc

    def cond(state):
        return state[0] * NU < n_units

    return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]


def main5():
    rng = np.random.default_rng(1)
    nch = NCHUNK
    tbl = jnp.asarray(rng.standard_normal((NL, 16)).astype(np.float32))
    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    fid = jnp.asarray(rng.integers(0, NL, nch * NU * 32).astype(np.int32))
    ugid = jnp.asarray(np.sort(rng.integers(0, NG, nch * NU))
                       .astype(np.int32))
    n_units = jnp.asarray(nch * NU, jnp.int32)
    timeit("D traced-bound while, unit gather", jax.jit(variant_D),
           tbl, trow, fid, ugid, n_units)
    timeit("E traced-bound while, per-pair gather (real)",
           jax.jit(variant_E), tbl, trow, fid, ugid, n_units)
