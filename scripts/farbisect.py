"""Bisect real _far_pass (1982ms/50M) vs variant C (86ms/52M).

Strips one difference at a time from a local copy of _far_pass.

Run: python scripts/farbisect.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sidm_tpu.ops.flat_force import (FAR_U, _spline_force_nodiv,
                                     _spline_pot_nodiv)

NG = 16400
G = 64
N = 1 << 20
M = 1 << 20
FH = 65536
NUF = FH // FAR_U
N_FAR = 50_000_000
FAR_CAP = 50331648


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:8]
                         .astype(jnp.float32)))


def timeit(label, fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / reps
    print(f"{label:<56s} {dt*1e3:9.1f} ms", flush=True)
    return out, dt


def far_pass_mod(acc, pot, farN, farG, n_far, flat_tbl, trow, *,
                 mode):
    def body(state):
        ci, acc, pot = state
        c0 = ci * FH
        fid = lax.dynamic_slice(farN, (c0,), (FH,))
        gseq = lax.dynamic_slice(farG, (c0,), (FH,))
        if mode >= 1:   # ug via gather of strided positions vs reshape
            ug = gseq.reshape(NUF, FAR_U)[:, 0]
        else:
            ug = gseq[::FAR_U]
        live = fid >= 0
        rows = flat_tbl[jnp.clip(fid, 0, flat_tbl.shape[0] - 1)]
        if mode >= 2:
            m = jnp.where(live, rows[:, 3], 0.0)
        else:
            m = rows[:, 3]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        tr = jnp.repeat(tgt, FAR_U, axis=0)
        tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                           tr[:, 3 * G:4 * G])
        com = rows[:, 0:3]
        d0 = com[:, 0:1] - tx
        d1 = com[:, 1:2] - ty
        d2 = com[:, 2:3] - tz
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        if mode >= 3:
            eni = 1.0 / jnp.maximum(rows[:, 14], 1e-30)
            h_inv = jnp.minimum(tie, eni[:, None]) * (1.0 / 2.8)
        else:
            h_inv = jnp.minimum(tie, rows[:, 14:15]) * (1.0 / 2.8)
        f, inv_r, newton = _spline_force_nodiv(r2, h_inv)
        fac = m[:, None] * f
        a0, a1, a2 = fac * d0, fac * d1, fac * d2

        q = rows[:, 8:14]
        if mode >= 4:
            nl = newton & live[:, None]
        else:
            nl = newton
        ir = jnp.where(nl, inv_r, 0.0)
        ir2 = ir * ir
        w5 = ir2 * ir2 * ir
        w7 = w5 * ir2
        u0 = q[:, 0:1] * d0 + q[:, 3:4] * d1 + q[:, 4:5] * d2
        u1 = q[:, 3:4] * d0 + q[:, 1:2] * d1 + q[:, 5:6] * d2
        u2_ = q[:, 4:5] * d0 + q[:, 5:6] * d1 + q[:, 2:3] * d2
        dqd = d0 * u0 + d1 * u1 + d2 * u2_
        t7 = 2.5 * w7 * dqd
        a0 = a0 - w5 * u0 + t7 * d0
        a1 = a1 - w5 * u1 + t7 * d1
        a2 = a2 - w5 * u2_ + t7 * d2

        def ured(a):
            return jnp.sum(a.reshape(NUF, FAR_U, G), axis=1)

        dacc = jnp.stack([ured(a0), ured(a1), ured(a2)], axis=-1)
        if mode >= 5:
            useg = jnp.where(ug < NG, ug, NG)
            acc = acc + jax.ops.segment_sum(
                dacc, useg, num_segments=NG + 1)[:NG]
        else:
            acc = acc + jax.ops.segment_sum(
                dacc, jnp.clip(ug, 0, NG - 1), num_segments=NG)
        return ci + 1, acc, pot

    def cond(state):
        return state[0] * FH < n_far

    return lax.while_loop(cond, body, (jnp.int32(0), acc, pot))[1]


def main():
    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    nuf = N_FAR // FAR_U
    ug = np.sort(rng.integers(0, NG, nuf)).astype(np.int32)
    farG = np.full(FAR_CAP + 1, NG, np.int32)
    farG[:N_FAR] = np.repeat(ug, FAR_U)
    farN = np.full(FAR_CAP + 1, -1, np.int32)
    farN[:N_FAR] = rng.integers(0, M, N_FAR)
    tbl = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))
    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    acc = jnp.zeros((NG, G, 3), jnp.float32)
    pot = jnp.zeros((NG, G), jnp.float32)
    fN = jnp.asarray(farN)
    fG = jnp.asarray(farG)
    n_far = jnp.int32(N_FAR)

    from functools import partial
    for mode in (0, 1, 2, 3, 4, 5):
        fn = jax.jit(partial(far_pass_mod, mode=mode))
        timeit(f"mode {mode}", fn, acc, pot, fN, fG, n_far, tbl, trow)


if __name__ == "__main__":
    main()


def far_pass_m6(acc, farN, farUG, n_far, flat_tbl, trow, *, const_trip,
                with_pot_carry):
    """Separate per-unit gid array; optional pot carry / constant trip."""
    pot = jnp.zeros((NG, G), jnp.float32)

    def body(state):
        if with_pot_carry:
            ci, acc, pot = state
        else:
            ci, acc = state
        c0 = ci * FH
        fid = lax.dynamic_slice(farN, (c0,), (FH,))
        ug = lax.dynamic_slice(farUG, (ci * NUF,), (NUF,))
        rows = flat_tbl[jnp.clip(fid, 0, flat_tbl.shape[0] - 1)]
        m = rows[:, 3]
        tgt = trow[jnp.clip(ug, 0, NG - 1)]
        tr = jnp.repeat(tgt, FAR_U, axis=0)
        tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                           tr[:, 3 * G:4 * G])
        com = rows[:, 0:3]
        d0 = com[:, 0:1] - tx
        d1 = com[:, 1:2] - ty
        d2 = com[:, 2:3] - tz
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        h_inv = jnp.minimum(tie, rows[:, 14:15]) * (1.0 / 2.8)
        f, inv_r, newton = _spline_force_nodiv(r2, h_inv)
        fac = m[:, None] * f
        a0, a1, a2 = fac * d0, fac * d1, fac * d2
        q = rows[:, 8:14]
        ir = jnp.where(newton, inv_r, 0.0)
        ir2 = ir * ir
        w5 = ir2 * ir2 * ir
        w7 = w5 * ir2
        u0 = q[:, 0:1] * d0 + q[:, 3:4] * d1 + q[:, 4:5] * d2
        u1 = q[:, 3:4] * d0 + q[:, 1:2] * d1 + q[:, 5:6] * d2
        u2_ = q[:, 4:5] * d0 + q[:, 5:6] * d1 + q[:, 2:3] * d2
        dqd = d0 * u0 + d1 * u1 + d2 * u2_
        t7 = 2.5 * w7 * dqd
        a0 = a0 - w5 * u0 + t7 * d0
        a1 = a1 - w5 * u1 + t7 * d1
        a2 = a2 - w5 * u2_ + t7 * d2

        def ured(a):
            return jnp.sum(a.reshape(NUF, FAR_U, G), axis=1)

        dacc = jnp.stack([ured(a0), ured(a1), ured(a2)], axis=-1)
        acc = acc + jax.ops.segment_sum(dacc, jnp.clip(ug, 0, NG - 1),
                                        num_segments=NG)
        if with_pot_carry:
            return ci + 1, acc, pot
        return ci + 1, acc

    if const_trip:
        def cond(state):
            return state[0] < N_FAR // FH
    else:
        def cond(state):
            return state[0] * FH < n_far

    init = (jnp.int32(0), acc, pot) if with_pot_carry \
        else (jnp.int32(0), acc)
    return lax.while_loop(cond, body, init)[1]


def main2():
    from functools import partial
    rng = np.random.default_rng(0)
    nuf = N_FAR // FAR_U
    ug = np.sort(rng.integers(0, NG, nuf)).astype(np.int32)
    ugpad = np.full(FAR_CAP // FAR_U + 1, NG, np.int32)
    ugpad[:nuf] = ug
    farN = np.full(FAR_CAP + 1, -1, np.int32)
    farN[:N_FAR] = rng.integers(0, M, N_FAR)
    tbl = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))
    trow = jnp.asarray(rng.standard_normal((NG, 256)).astype(np.float32))
    acc = jnp.zeros((NG, G, 3), jnp.float32)
    fN = jnp.asarray(farN)
    fU = jnp.asarray(ugpad)
    n_far = jnp.int32(N_FAR)
    for ct in (False, True):
        for wp in (False, True):
            fn = jax.jit(partial(far_pass_m6, const_trip=ct,
                                 with_pot_carry=wp))
            timeit(f"m6 const_trip={ct} pot_carry={wp}",
                   fn, acc, fN, fU, n_far, tbl, trow)
