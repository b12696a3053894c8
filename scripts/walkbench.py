"""Isolate the flat-engine walk-chunk costs on TPU.

One synthetic level: 8M pairs in CH chunks, components toggled:
  g   node-row gather (CH,16) + geom gather (CH,8)
  c   classify ops
  e   emissions (cumsum + flat scatter) x4
  f   far eval (trow gather + monopole+quad)    [variants: div, nodiv, pack128]
  s   segment_sum accumulate

Run: python scripts/walkbench.py
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

NP_ = 8_003_274        # live pairs
CAP = 1 << 23
CH = 65536
NG = 16384
G = 64
NL = 1 << 20           # nodes at this level
IMAX = jnp.int32(2147483647)


def _sync(out):
    """block_until_ready is unreliable on the tunneled axon backend; a
    scalar readback is the only trustworthy fence."""
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<54s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def make():
    rng = np.random.default_rng(0)
    tbl = rng.standard_normal((NL, 16)).astype(np.float32)
    tbl[:, 3] = np.abs(tbl[:, 3])
    tbl[:, 4] = rng.integers(1, 200, NL)
    tbl[:, 14] = 0.3
    geom = rng.standard_normal((NG, 8)).astype(np.float32)
    geom[:, 6] = np.abs(geom[:, 6]) * 1e-3
    trow = rng.standard_normal((NG, 256)).astype(np.float32)
    trow[:, 192:256] = 0.3
    qN = np.full(CAP + 1, -1, np.int32)
    qN[:NP_] = rng.integers(0, NL, NP_)
    qG = np.full(CAP + 1, NG, np.int32)
    qG[:NP_] = np.sort(rng.integers(0, NG, NP_))
    return (jnp.asarray(tbl), jnp.asarray(geom), jnp.asarray(trow),
            jnp.asarray(qN), jnp.asarray(qG))


def walk(tbl, geom, trow, qN, qG, *, do_gather, do_classify, do_emit,
         do_far, far_mode, do_seg):
    dtype = jnp.float32
    n_q = jnp.asarray(NP_, jnp.int32)
    s_l = jnp.asarray(0.05, dtype)
    theta2 = 0.25

    segE = jnp.full(CAP + 1, IMAX, jnp.int32)
    outN = jnp.full(CAP + 1, -1, jnp.int32)
    acc = jnp.zeros((NG, G, 3), dtype)
    n_seg = jnp.zeros((), jnp.int32)
    n_out = jnp.zeros((), jnp.int32)

    def emit(buf, n_buf, vals, valid):
        v = valid.reshape(-1)
        x = vals.reshape(-1)
        pos = jnp.cumsum(v.astype(jnp.int32)) - 1
        count = jnp.sum(v.astype(jnp.int32))
        dest = jnp.where(v, jnp.minimum(n_buf + pos, CAP), CAP)
        buf = buf.at[dest].set(jnp.where(v, x, buf[CAP]))
        return buf, jnp.minimum(n_buf + count, CAP)

    def body(state):
        ci, acc, segE, outN, n_seg, n_out = state
        c0 = ci * CH
        ids = lax.dynamic_slice(qN, (c0,), (CH,))
        gid = lax.dynamic_slice(qG, (c0,), (CH,))
        acc_d = jnp.zeros((CH, G, 3), dtype)
        if do_gather:
            ids_ok = (ids >= 0) & (ids < NL)
            rows = tbl[jnp.clip(ids, 0, NL - 1)]
            rows = jnp.where(ids_ok[:, None], rows, 0.0)
            gidc = jnp.clip(gid, 0, NG - 1)
            geo = geom[gidc]
        else:
            rows = jnp.zeros((CH, 16), dtype)
            geo = jnp.zeros((CH, 8), dtype)
            gidc = jnp.clip(gid, 0, NG - 1)
            ids_ok = ids >= 0
        com = rows[:, 0:3]
        m = rows[:, 3]
        cnt = rows[:, 4].astype(jnp.int32)
        if do_classify:
            dx = jnp.maximum(jnp.maximum(geo[:, 0:3] - com,
                                         com - geo[:, 3:6]), 0.0)
            r2b = jnp.sum(dx * dx, axis=1)
            s2 = s_l * s_l
            geo_open = s2 > theta2 * r2b
            oac = geo[:, 6]
            rel = m * s2 * s2 > oac * r2b * r2b * r2b
            mac_open = jnp.where(oac > 0, rel, geo_open)
            mac_open = mac_open | (r2b <= 3.0 * s2)
        else:
            mac_open = ids < (NL // 3)
        live = (cnt > 0) & ids_ok
        far = live & ~mac_open
        seg = live & mac_open & (cnt <= 16)
        deep = live & mac_open & (cnt > 16)

        if do_far:
            tr = trow[gidc]
            tx, ty, tz, teps = (tr[:, 0:G], tr[:, G:2 * G],
                                tr[:, 2 * G:3 * G], tr[:, 3 * G:4 * G])
            mfar = jnp.where(far, m, 0.0)
            epsn = rows[:, 14]
            q = rows[:, 8:14]
            if far_mode == "pack128":
                C2 = CH // 2

                def p2(a):        # (CH,) per-pair -> (C2, 128)
                    return jnp.broadcast_to(
                        a.reshape(C2, 2, 1), (C2, 2, G)).reshape(C2, 2 * G)

                def t2(a):        # (CH, 64) per-pair-target -> (C2, 128)
                    return a.reshape(C2, 2 * G)

                tx, ty, tz, teps = t2(tx), t2(ty), t2(tz), t2(teps)
                c0_, c1_, c2_ = p2(com[:, 0]), p2(com[:, 1]), p2(com[:, 2])
                mf, en = p2(mfar), p2(epsn)
                q0, q1, q2 = p2(q[:, 0]), p2(q[:, 1]), p2(q[:, 2])
                q3, q4, q5 = p2(q[:, 3]), p2(q[:, 4]), p2(q[:, 5])
                d0, d1, d2 = c0_ - tx, c1_ - ty, c2_ - tz
            else:
                c0_, c1_, c2_ = com[:, 0:1], com[:, 1:2], com[:, 2:3]
                mf, en = mfar[:, None], epsn[:, None]
                q0, q1, q2 = q[:, 0:1], q[:, 1:2], q[:, 2:3]
                q3, q4, q5 = q[:, 3:4], q[:, 4:5], q[:, 5:6]
                d0, d1, d2 = c0_ - tx, c1_ - ty, c2_ - tz
            r2 = d0 * d0 + d1 * d1 + d2 * d2
            if far_mode == "div":
                r = jnp.sqrt(r2)
                h = 2.8 * jnp.maximum(teps, en)
                h_inv = 1.0 / h
                u = r * h_inv
                rs = jnp.maximum(r, 1e-30)
                newton = 1.0 / (rs * rs * rs)
                u2 = u * u
                u3 = u2 * u
                inner = 32.0 * (1.0 / 3.0 - 1.2 * u2 + u3)
                us = jnp.maximum(u, 1e-12)
                outer = (64.0 * (1.0 / 3.0 - 0.75 * u + 0.6 * u2
                                 - u3 / 6.0) - 1.0 / 15.0 / (us * us * us))
                wf = jnp.where(u < 0.5, inner, outer)
                fac = mf * jnp.where(u >= 1.0, newton,
                                     wf * h_inv * h_inv * h_inv)
                newton_mask = u >= 1.0
                ir = jnp.where(newton_mask, 1.0 / rs, 0.0)
            else:
                inv_r = lax.rsqrt(jnp.maximum(r2, 1e-37))
                # teps already stores 1/eps for nodiv in real engine; here
                # emulate cost with rsqrt-free reciprocals via min()
                h_inv = jnp.minimum(teps, en) * (1.0 / 2.8)
                r = r2 * inv_r
                u = r * h_inv
                inv_r3 = inv_r * inv_r * inv_r
                u2 = u * u
                u3 = u2 * u
                h_inv3 = h_inv * h_inv * h_inv
                inner = 32.0 * (1.0 / 3.0 - 1.2 * u2 + u3) * h_inv3
                outer = (64.0 * (1.0 / 3.0 - 0.75 * u + 0.6 * u2
                                 - u3 / 6.0)) * h_inv3 - inv_r3 / 15.0
                wf = jnp.where(u < 0.5, inner, outer)
                fac = mf * jnp.where(u >= 1.0, inv_r3, wf)
                newton_mask = u >= 1.0
                ir = jnp.where(newton_mask, inv_r, 0.0)
            a0, a1, a2 = fac * d0, fac * d1, fac * d2
            ir2 = ir * ir
            w5 = ir2 * ir2 * ir
            w7 = w5 * ir2
            u0 = q0 * d0 + q3 * d1 + q4 * d2
            u1 = q3 * d0 + q1 * d1 + q5 * d2
            u2_ = q4 * d0 + q5 * d1 + q2 * d2
            dqd = d0 * u0 + d1 * u1 + d2 * u2_
            t7 = 2.5 * w7 * dqd
            a0 = a0 - w5 * u0 + t7 * d0
            a1 = a1 - w5 * u1 + t7 * d1
            a2 = a2 - w5 * u2_ + t7 * d2
            if far_mode == "pack128":
                C2 = CH // 2
                a0 = a0.reshape(CH, G)
                a1 = a1.reshape(CH, G)
                a2 = a2.reshape(CH, G)
            acc_d = jnp.stack([a0, a1, a2], axis=-1)

        if do_seg:
            gseg = jnp.where(live, gidc, NG)
            acc = acc + jax.ops.segment_sum(acc_d, gseg,
                                            num_segments=NG + 1)[:NG]
        if do_emit:
            starts = rows[:, 5].astype(jnp.int32)
            ek = starts * 32 + jnp.clip(cnt, 0, 16)
            segE, n_seg = emit(segE, n_seg, ek, seg)
            cs = rows[:, 6].astype(jnp.int32)
            cc = rows[:, 7].astype(jnp.int32)
            k8 = jnp.arange(8, dtype=jnp.int32)
            kid = cs[:, None] + k8[None, :]
            kvalid = deep[:, None] & (k8[None, :] < cc[:, None])
            outN, n_out = emit(outN, n_out, kid, kvalid)
        return ci + 1, acc, segE, outN, n_seg, n_out

    def cond(state):
        return state[0] * CH < n_q

    state = (jnp.int32(0), acc, segE, outN, n_seg, n_out)
    state = lax.while_loop(cond, body, state)
    return state[1], state[4], state[5]


def main():
    print(f"pairs={NP_}, CH={CH}, chunks={-(-NP_//CH)}, "
          f"devices={jax.devices()}", flush=True)
    tbl, geom, trow, qN, qG = make()
    base = dict(do_gather=True, do_classify=True, do_emit=True,
                do_far=False, far_mode="div", do_seg=False)

    def run(**kw):
        d = dict(base)
        d.update(kw)
        return jax.jit(partial(walk, **d))

    timeit("nothing (loop+slice only)", run(do_gather=False,
                                            do_classify=False,
                                            do_emit=False),
           tbl, geom, trow, qN, qG)
    timeit("gather only", run(do_classify=False, do_emit=False),
           tbl, geom, trow, qN, qG)
    timeit("gather+classify", run(do_emit=False), tbl, geom, trow, qN, qG)
    timeit("gather+classify+emit  (walk body)", run(),
           tbl, geom, trow, qN, qG)
    timeit("walk + far(div) + segsum",
           run(do_far=True, do_seg=True), tbl, geom, trow, qN, qG)
    timeit("walk + far(nodiv) + segsum",
           run(do_far=True, far_mode="nodiv", do_seg=True),
           tbl, geom, trow, qN, qG)
    timeit("walk + far(nodiv pack128) + segsum",
           run(do_far=True, far_mode="pack128", do_seg=True),
           tbl, geom, trow, qN, qG)


if __name__ == "__main__":
    main()


def far_only(tbl, geom, trow, qN, qG, mode):
    """Isolate the far-pass body: gather variants + fixed math."""
    n_q = jnp.asarray(NP_, jnp.int32)
    acc = jnp.zeros((NG, G, 3), jnp.float32)

    def body(state):
        ci, acc = state
        c0 = ci * CH
        fid = lax.dynamic_slice(qN, (c0,), (CH,))
        gid = lax.dynamic_slice(qG, (c0,), (CH,))
        live = fid >= 0
        rows = tbl[jnp.clip(fid, 0, NL - 1)]
        m = jnp.where(live, rows[:, 3], 0.0)
        gidc = jnp.clip(gid, 0, NG - 1)
        if mode == "gather":
            tr = trow[gidc]
        elif mode == "samerow":
            tr = trow[jnp.zeros(CH, jnp.int32) + gidc[0]]
        elif mode == "window":
            g0 = jnp.clip(gidc[0], 0, NG - 2048)
            win = lax.dynamic_slice(trow, (g0, 0), (2048, 256))
            loc = jnp.clip(gidc - g0, 0, 2047)
            tr = win[loc]
        else:  # nogather
            tr = jnp.broadcast_to(trow[0], (CH, 256))
        tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2*G], tr[:, 2*G:3*G],
                           tr[:, 3*G:4*G])
        com = rows[:, 0:3]
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
        nl_ = newton & live[:, None]
        ir = jnp.where(nl_, inv_r, 0.0)
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
        dacc = jnp.stack([a0, a1, a2], axis=-1)
        gseg = jnp.where(live, gidc, NG)
        acc = acc + jax.ops.segment_sum(dacc, gseg, num_segments=NG+1)[:NG]
        return ci + 1, acc

    def cond(state):
        return state[0] * CH < n_q

    return lax.while_loop(cond, body, (jnp.int32(0), acc))[1]


def main2():
    tbl, geom, trow, qN, qG = make()
    for mode in ("nogather", "samerow", "window", "gather"):
        fn = jax.jit(partial(far_only, mode=mode))
        timeit(f"far-only mode={mode}", fn, tbl, geom, trow, qN, qG)


if __name__ == "__main__":
    pass
