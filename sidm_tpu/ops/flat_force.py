"""Flat pair-queue Barnes-Hut gravity: the v2 TPU engine.

Replaces the blocked frontier engine (ops/fused_force.py) after a measured
finding: at N=1e6 the blocked walk's cost is dominated by the ~0.4 ms fixed
overhead of every (level, block) ``lax.map``/``lax.while_loop`` invocation
(512 blocks x 13 levels x 2 passes ~ 5 s), not by pair work. This engine
keeps the same physics and opening criteria (reference semantics:
``force_treeevaluate``, nbody/forcetree.c:786-1377) but processes ONE global
flat queue of (node, target-group) pairs per level in 65k-pair chunks:

* no per-group frontier width caps, no per-block live-width bookkeeping,
  no minor-axis compaction sorts — compaction is a cumsum + flat scatter
  (measured 0.04-0.11 ms per 65k chunk on v5e);
* gathers are one node-row gather (64 B) + one packed 64-target row
  (1 KB) + one group-geometry row (32 B) per pair — all fast-path TPU row
  gathers;
* classification AND the far-field (monopole + traceless quadrupole,
  spline softening h=2.8 eps, forcetree.c:834,1002-1060) evaluate inline
  in raw target coordinates (no group-centered |x|^2+|y|^2-2xy expansion,
  so no bf16-MXU cancellation hazard and no Precision.HIGHEST einsums);
* opened cells expand their (contiguous, child-compacted) children
  directly into the next level's flat queue;
* leaf cells emit 16-particle segment entries into ONE cross-level flat
  near list, evaluated afterwards in planar-packed 65k-entry chunks
  (measured 5.5M entries in ~0.6 s vs 3.4 s for the blocked near pass).

Both opening criteria are supported: geometric BH (len^2 > theta^2 r^2,
forcetree.c:967) and relative (m len^4 > |a_old| ErrTolForceAcc r^6,
forcetree.c:1254-1257) with BH fallback when a_old is unavailable, plus
the containment guard r^2 <= 3 len^2.

Non-periodic only (periodic Ewald runs use ops/treeforce.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import softened_inv_r3, softened_potential
from .fused_force import (IMAX, FusedTree, default_depth, make_windows,
                          pack_tree)
from .tree import Octree, build_octree

# packed node row layout (see fused_force.pack_tree)
_COM = slice(0, 3)
_MASS = 3
_CNT = 4
_NSTART = 5
_CSTART = 6
_CCNT = 7
_QUAD = slice(8, 14)
_EPS = 14


class FlatConfig(NamedTuple):
    group_size: int = 64       # targets per Morton window
    start_level: int = 2
    leaf_cap: int = 16
    chunk: int = 65536         # classify/far pairs per chunk
    near_chunk: int = 32768    # near entries per chunk
    pair_cap: int = 1 << 23    # flat pair-queue capacity per level
    seg_cap_mult: int = 8      # near-list capacity = mult * n
    big_chunks: int = 8        # 16-particle chunks per overfull deepest cell
    break_level: int = 4       # Morton-window restart level
    # profiling/debug knobs (results are WRONG when a stage is skipped)
    skip_far: bool = False
    skip_near: bool = False


def pack_planar16(tree: Octree):
    """Planar-by-16 particle rows: [x0..15, y0..15, z0..15, m0..15,
    eps0..15, pad48] per (N/16, 128) row. Field extraction in the near
    pass is then a contiguous lane slice (the interleaved 16-pack needs a
    (..,32,8) reshape whose 8-wide lanes cost ~2x the whole near pass)."""
    n = tree.pos_s.shape[0]
    np16 = -(-n // 16)
    dtype = tree.pos_s.dtype

    def plane(x, fill=0.0):
        if np16 * 16 != n:
            x = jnp.concatenate(
                [x, jnp.full(np16 * 16 - n, fill, dtype)])
        return x.reshape(np16, 16)

    return jnp.concatenate([
        plane(tree.pos_s[:, 0]), plane(tree.pos_s[:, 1]),
        plane(tree.pos_s[:, 2]), plane(tree.mass_s),
        plane(tree.eps_s), jnp.zeros((np16, 48), dtype)], axis=1)


def _queue_caps(cfg: FlatConfig, depth: int, ng: int, caps_node):
    """Static per-level pair-queue capacities."""
    CH = cfg.chunk
    l0 = cfg.start_level
    w0 = min(8 ** l0, caps_node[l0])
    qcaps = {}
    q = ng * w0
    for l in range(l0, depth + 1):
        q = min(q, ng * caps_node[l], cfg.pair_cap)
        qcaps[l] = -(-q // CH) * CH
        q = qcaps[l] * 8
    return qcaps


def _level_chunk(ids, gid, slot_ok, tbl, geom, trow, nl_real, s_l,
                 theta2, use_relative, leaf_cap, last, big_chunks,
                 skip_far, need_pot, ng, dtype):
    """Classify + far-eval one flat chunk of (node, group) pairs.

    Returns (dacc (CH,G,3), dpot (CH,G), gidc, seg entries (CH,KMAX) +
    validity, children (CH,8) + validity)."""
    CH = ids.shape[0]
    ids_ok = (ids >= 0) & (ids < nl_real) & slot_ok
    rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
    rows = jnp.where(ids_ok[:, None], rows, 0.0)
    gidc = jnp.clip(gid, 0, ng - 1)
    geo = geom[gidc]                              # (CH, 8)

    com = rows[:, _COM]
    m = rows[:, _MASS]
    cnt = rows[:, _CNT].astype(jnp.int32)
    dx = jnp.maximum(jnp.maximum(geo[:, 0:3] - com, com - geo[:, 3:6]), 0.0)
    r2b = jnp.sum(dx * dx, axis=1)
    s2 = s_l * s_l
    geo_open = s2 > theta2 * r2b
    if use_relative:
        oac = geo[:, 6]
        rel = m * s2 * s2 > oac * r2b * r2b * r2b
        mac_open = jnp.where(oac > 0, rel, geo_open)
    else:
        mac_open = geo_open
    mac_open = mac_open | (r2b <= 3.0 * s2)
    live = (cnt > 0) & ids_ok
    far = live & ~mac_open
    is_small = cnt <= leaf_cap
    seg = live & mac_open & is_small
    deep = live & mac_open & ~is_small

    dacc = dpot = None
    if not skip_far:
        tr = trow[gidc]                           # (CH, 256)
        G = 64
        tx, ty, tz, teps = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                            tr[:, 3 * G:4 * G])
        mfar = jnp.where(far, m, 0.0)
        d0 = com[:, 0:1] - tx                     # (CH, G): node - target
        d1 = com[:, 1:2] - ty
        d2 = com[:, 2:3] - tz
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        r = jnp.sqrt(r2)
        h = 2.8 * jnp.maximum(teps, rows[:, _EPS][:, None])
        fac = mfar[:, None] * softened_inv_r3(r, h)
        a0, a1, a2 = fac * d0, fac * d1, fac * d2
        if need_pot:
            dpot = mfar[:, None] * softened_potential(r, h)

        # traceless quadrupole, Newtonian range only (forcetree.c:1002-1060)
        q = rows[:, _QUAD]
        newton = (r >= h) & far[:, None]
        r_safe = jnp.maximum(r, 1e-30)
        ir = jnp.where(newton, 1.0 / r_safe, 0.0)
        ir2 = ir * ir
        w5 = ir2 * ir2 * ir
        w7 = w5 * ir2
        qxx, qyy, qzz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        qxy, qxz, qyz = q[:, 3:4], q[:, 4:5], q[:, 5:6]
        u0 = qxx * d0 + qxy * d1 + qxz * d2
        u1 = qxy * d0 + qyy * d1 + qyz * d2
        u2 = qxz * d0 + qyz * d1 + qzz * d2
        dqd = d0 * u0 + d1 * u1 + d2 * u2
        t7 = 2.5 * w7 * dqd
        a0 = a0 - w5 * u0 + t7 * d0
        a1 = a1 - w5 * u1 + t7 * d1
        a2 = a2 - w5 * u2 + t7 * d2
        dacc = jnp.stack([a0, a1, a2], axis=-1)   # (CH, G, 3)
        if need_pot:
            dpot = dpot - 0.5 * dqd * w5

    # near-list emission: leaves always; overfull deepest cells as
    # 16-particle chunks (the 'big' path)
    starts = rows[:, _NSTART].astype(jnp.int32)
    kmax = big_chunks if last else 1
    emit_cnt = jnp.where(seg, cnt, 0)
    if last:
        emit_cnt = jnp.where(deep, cnt, emit_cnt)
    k16 = jnp.arange(kmax, dtype=jnp.int32) * 16
    ck = jnp.clip(emit_cnt[:, None] - k16[None, :], 0, 16)    # (CH, KMAX)
    ek = (starts[:, None] + k16[None, :]) * 32 + ck
    evalid = ck > 0
    ebig_drop = jnp.where(last & deep, jnp.maximum(cnt - 16 * kmax, 0),
                          0) if last else jnp.zeros(CH, jnp.int32)

    # child expansion (contiguous child-compacted ranges)
    cs = rows[:, _CSTART].astype(jnp.int32)
    cc = rows[:, _CCNT].astype(jnp.int32)
    k8 = jnp.arange(8, dtype=jnp.int32)
    kid = cs[:, None] + k8[None, :]
    kvalid = deep[:, None] & (k8[None, :] < cc[:, None])
    if last:
        kvalid = jnp.zeros_like(kvalid)
    return (dacc, dpot, gidc, live, ek, evalid, jnp.sum(ebig_drop),
            kid, kvalid)


def _emit(buf, n_buf, vals, valid, cap, ovf, ovf_slot):
    """Compact `vals[valid]` onto buf[n_buf:...]; returns updated buf,
    count, ovf. buf has cap+1 slots (last = dump)."""
    v = valid.reshape(-1)
    x = vals.reshape(-1)
    pos = jnp.cumsum(v.astype(jnp.int32)) - 1
    count = jnp.sum(v.astype(jnp.int32))
    dest = jnp.where(v, jnp.minimum(n_buf + pos, cap), cap)
    buf = buf.at[dest].set(jnp.where(v, x, buf[cap]))
    ovf = ovf.at[ovf_slot].add(jnp.maximum(n_buf + count - cap, 0))
    return buf, jnp.minimum(n_buf + count, cap), ovf


@partial(jax.jit,
         static_argnames=("theta", "use_relative", "cfg", "depth", "n_real",
                          "ng", "need_pot"))
def _flat_eval(ftree: FusedTree, planar16, trow, geom, extent,
               theta: float, use_relative: bool, cfg: FlatConfig,
               depth: int, n_real: int, ng: int, need_pot: bool):
    dtype = trow.dtype
    G = cfg.group_size
    assert G == 64, "trow packing assumes 64 targets/group"
    theta2 = theta * theta
    CH = cfg.chunk
    l0 = cfg.start_level

    caps_node = [min(8 ** l, n_real) for l in range(depth + 1)]
    qcaps = _queue_caps(cfg, depth, ng, caps_node)
    seg_cap = -(-cfg.seg_cap_mult * n_real // cfg.near_chunk) \
        * cfg.near_chunk

    acc = jnp.zeros((ng, G, 3), dtype)
    pot = jnp.zeros((ng, G), dtype)
    segE = jnp.full(seg_cap + 1, IMAX, jnp.int32)
    segG = jnp.full(seg_cap + 1, ng, jnp.int32)
    n_seg = jnp.zeros((), jnp.int32)
    ovf = jnp.zeros(3, jnp.int32)      # queue, seg-list, big-cell drops
    lvl_pairs = []

    # initial queue: every start-level cell x every group, group-major
    # (expansion preserves group-major order down the levels)
    W0 = min(8 ** l0, caps_node[l0])
    cap0 = qcaps[l0]
    qN = jnp.full(cap0 + 1, -1, jnp.int32)
    qN = qN.at[:ng * W0].set(
        jnp.tile(jnp.arange(W0, dtype=jnp.int32), (ng,)))
    qG = jnp.full(cap0 + 1, ng, jnp.int32)
    qG = qG.at[:ng * W0].set(
        jnp.repeat(jnp.arange(ng, dtype=jnp.int32), W0))
    n_q = jnp.asarray(ng * W0, jnp.int32)

    def make_level(l, last):
        tbl_l = ftree.levels[l]
        nl_real = ftree.n_levels[l]
        s_l = jnp.asarray(extent / (1 << l), dtype)
        cap_next = qcaps[min(l + 1, depth)]
        kmax = cfg.big_chunks if last else 1

        def run(qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf):
            outN = jnp.full(cap_next + 1, -1, jnp.int32)
            outG = jnp.full(cap_next + 1, ng, jnp.int32)
            n_out = jnp.zeros((), jnp.int32)

            def body(state):
                (ci, acc, pot, outN, outG, n_out, segE, segG, n_seg,
                 ovf) = state
                c0 = ci * CH
                ids = lax.dynamic_slice(qN, (c0,), (CH,))
                gid = lax.dynamic_slice(qG, (c0,), (CH,))
                slot_ok = (jnp.arange(CH, dtype=jnp.int32) + c0) < n_q
                (dacc, dpot, gidc, live, ek, evalid, big_drop, kid,
                 kvalid) = _level_chunk(
                    ids, gid, slot_ok, tbl_l, geom, trow, nl_real, s_l,
                    theta2, use_relative, cfg.leaf_cap, last,
                    cfg.big_chunks, cfg.skip_far, need_pot, ng, dtype)
                if dacc is not None:
                    gseg = jnp.where(live, gidc, ng)
                    acc = acc + jax.ops.segment_sum(
                        dacc, gseg, num_segments=ng + 1)[:ng]
                    if need_pot:
                        pot = pot + jax.ops.segment_sum(
                            dpot, gseg, num_segments=ng + 1)[:ng]
                segE, n_seg2, ovf = _emit(segE, n_seg, ek, evalid,
                                          seg_cap, ovf, 1)
                gk = jnp.broadcast_to(gid[:, None], (CH, kmax))
                segG, _, ovf0 = _emit(segG, n_seg, gk, evalid, seg_cap,
                                      jnp.zeros(3, jnp.int32), 0)
                n_seg = n_seg2
                ovf = ovf.at[2].add(big_drop)
                if not last:
                    outN, n_out2, ovf = _emit(outN, n_out, kid, kvalid,
                                              cap_next, ovf, 0)
                    gk8 = jnp.broadcast_to(gid[:, None], (CH, 8))
                    outG, _, _ = _emit(outG, n_out, gk8, kvalid, cap_next,
                                       jnp.zeros(3, jnp.int32), 0)
                    n_out = n_out2
                return (ci + 1, acc, pot, outN, outG, n_out, segE, segG,
                        n_seg, ovf)

            def cond(state):
                return state[0] * CH < n_q

            state = (jnp.int32(0), acc, pot, outN, outG, n_out, segE,
                     segG, n_seg, ovf)
            state = lax.while_loop(cond, body, state)
            (_, acc, pot, outN, outG, n_out, segE, segG, n_seg,
             ovf) = state
            return outN, outG, n_out, acc, pot, segE, segG, n_seg, ovf

        return run

    # scan deeper uniform-shape levels in ONE body (compile-time control;
    # see fused_force._fused_eval for the rationale)
    l_scan = depth
    while (l_scan - 1 > l0
           and ftree.levels[l_scan - 1].shape == ftree.levels[depth - 1].shape
           and qcaps[l_scan - 1] == qcaps[depth - 1]
           and qcaps[l_scan] == qcaps[depth]):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    for l in range(l0, min(l_scan, depth)):
        run = make_level(l, last=False)
        qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf = run(
            qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf)
        lvl_pairs.append(n_q)

    if l_scan < depth:
        cap_s = max(ftree.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate(
                [t, jnp.zeros((cap_s - t.shape[0], 16), dtype)])
            if t.shape[0] < cap_s else t
            for t in (ftree.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l), dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(ftree.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])

        def scan_body(carry, xs):
            qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf = carry
            tbl_l, s_l, nl_real = xs
            cap_next = qcaps[depth - 1]

            # same chunk loop as make_level, parameterized by xs
            outN = jnp.full(cap_next + 1, -1, jnp.int32)
            outG = jnp.full(cap_next + 1, ng, jnp.int32)
            n_out = jnp.zeros((), jnp.int32)

            def body(state):
                (ci, acc, pot, outN, outG, n_out, segE, segG, n_seg,
                 ovf) = state
                c0 = ci * CH
                ids = lax.dynamic_slice(qN, (c0,), (CH,))
                gid = lax.dynamic_slice(qG, (c0,), (CH,))
                slot_ok = (jnp.arange(CH, dtype=jnp.int32) + c0) < n_q
                (dacc, dpot, gidc, live, ek, evalid, _bd, kid,
                 kvalid) = _level_chunk(
                    ids, gid, slot_ok, tbl_l, geom, trow, nl_real, s_l,
                    theta2, use_relative, cfg.leaf_cap, False,
                    cfg.big_chunks, cfg.skip_far, need_pot, ng, dtype)
                if dacc is not None:
                    gseg = jnp.where(live, gidc, ng)
                    acc = acc + jax.ops.segment_sum(
                        dacc, gseg, num_segments=ng + 1)[:ng]
                    if need_pot:
                        pot = pot + jax.ops.segment_sum(
                            dpot, gseg, num_segments=ng + 1)[:ng]
                segE, n_seg2, ovf = _emit(segE, n_seg, ek, evalid,
                                          seg_cap, ovf, 1)
                segG, _, _ = _emit(segG, n_seg, gid[:, None], evalid,
                                   seg_cap, jnp.zeros(3, jnp.int32), 0)
                n_seg = n_seg2
                outN, n_out2, ovf = _emit(outN, n_out, kid, kvalid,
                                          cap_next, ovf, 0)
                gk8 = jnp.broadcast_to(gid[:, None], (CH, 8))
                outG, _, _ = _emit(outG, n_out, gk8, kvalid, cap_next,
                                   jnp.zeros(3, jnp.int32), 0)
                return (ci + 1, acc, pot, outN, outG, n_out2, segE, segG,
                        n_seg, ovf)

            def cond(state):
                return state[0] * CH < n_q

            state = (jnp.int32(0), acc, pot, outN, outG, n_out, segE,
                     segG, n_seg, ovf)
            state = lax.while_loop(cond, body, state)
            (_, acc, pot, outN, outG, n_out, segE, segG, n_seg,
             ovf) = state
            return ((outN, outG, n_out, acc, pot, segE, segG, n_seg, ovf),
                    n_out)

        carry = (qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf)
        carry, npairs = lax.scan(scan_body, carry, (tbls, sls, nls))
        qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf = carry
        lvl_pairs.append(jnp.max(npairs))

    # deepest level: no expansion, big cells chunked into the near list
    run = make_level(depth, last=True)
    _, _, _, acc, pot, segE, segG, n_seg, ovf = run(
        qN, qG, n_q, acc, pot, segE, segG, n_seg, ovf)

    if not cfg.skip_near:
        acc, pot = _near_pass(acc, pot, segE, segG, n_seg, planar16, trow,
                              cfg, ng, need_pot)

    info = dict(ovf_open=ovf[0], ovf_seg=ovf[1], ovf_big=ovf[2],
                n_segs=n_seg,
                max_pairs=jnp.max(jnp.stack(lvl_pairs)) if lvl_pairs
                else jnp.zeros((), jnp.int32))
    return acc, pot, info


def _near_pass(acc, pot, segE, segG, n_seg, planar16, trow,
               cfg: FlatConfig, ng: int, need_pot: bool):
    """Flat near-field pass over the cross-level segment list.

    Entries are packed start*32+cnt (cnt<=16); particles come from
    planar-by-16 rows (two consecutive rows cover any off+cnt<=31
    window)."""
    NC = cfg.near_chunk
    G = 64
    dtype = trow.dtype
    n16 = planar16.shape[0]

    def body(state):
        ci, acc, pot = state
        c0 = ci * NC
        e = lax.dynamic_slice(segE, (c0,), (NC,))
        g = lax.dynamic_slice(segG, (c0,), (NC,))
        live = e != IMAX
        ev = jnp.where(live, e, 0)
        start = ev >> 5
        cnt = jnp.where(live, ev & 31, 0)
        row0 = start >> 4
        off = start & 15
        rid = jnp.stack([row0, jnp.minimum(row0 + 1, n16 - 1)], axis=-1)
        rows = planar16[rid.reshape(-1)].reshape(NC, 2, 128)

        def field(f):
            return jnp.concatenate([rows[:, 0, 16 * f:16 * (f + 1)],
                                    rows[:, 1, 16 * f:16 * (f + 1)]],
                                   axis=-1)                  # (NC, 32)

        yx, yy, yz, ym, yeps = (field(0), field(1), field(2), field(3),
                                field(4))
        slot = jnp.arange(32, dtype=jnp.int32)
        ok = (slot[None, :] >= off[:, None]) \
            & (slot[None, :] < (off + cnt)[:, None])
        ym = jnp.where(ok, ym, 0.0)

        gc = jnp.clip(g, 0, ng - 1)
        tr = trow[gc]
        tx, ty, tz, teps = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                            tr[:, 3 * G:4 * G])
        # (NC, G, 32): node-particle minus target
        d0 = yx[:, None, :] - tx[:, :, None]
        d1 = yy[:, None, :] - ty[:, :, None]
        d2 = yz[:, None, :] - tz[:, :, None]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        r = jnp.sqrt(r2)
        h = 2.8 * jnp.maximum(teps[:, :, None], yeps[:, None, :])
        fac = ym[:, None, :] * softened_inv_r3(r, h)
        dacc = jnp.stack([jnp.sum(fac * d0, -1), jnp.sum(fac * d1, -1),
                          jnp.sum(fac * d2, -1)], axis=-1)   # (NC, G, 3)
        gseg = jnp.where(live, gc, ng)
        acc = acc + jax.ops.segment_sum(dacc, gseg,
                                        num_segments=ng + 1)[:ng]
        if need_pot:
            dpot = jnp.sum(ym[:, None, :] * softened_potential(r, h), -1)
            pot = pot + jax.ops.segment_sum(dpot, gseg,
                                            num_segments=ng + 1)[:ng]
        return ci + 1, acc, pot

    def cond(state):
        return state[0] * NC < n_seg

    _, acc, pot = lax.while_loop(cond, body, (jnp.int32(0), acc, pot))
    return acc, pot


def flat_gravity_tree(tree: Octree, mass, eps, old_acc, *, theta=0.5,
                      opening=1, err_tol_force_acc=0.005,
                      config: Optional[FlatConfig] = None,
                      return_info: bool = False, need_pot: bool = True,
                      shard: Optional[tuple] = None):
    """Flat walk/eval on a PREBUILT octree. Same API as
    fused_force.fused_gravity_tree (incl. the multi-chip ``shard``
    contract: partial sums, caller psums and adds self-potential)."""
    cfg = config or FlatConfig()
    n = tree.pos_s.shape[0]
    depth = tree.depth
    valid = mass > 0
    dtype = tree.pos_s.dtype

    ftree = pack_tree(tree)
    planar16 = pack_planar16(tree)
    G = cfg.group_size
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid[tree.perm], n, G, depth, cfg.break_level,
        group_block=1, sort_groups=False)

    if shard is not None:
        sidx, nsh = shard
        ng_pad = -(-ngp // nsh) * nsh
        if ng_pad != ngp:
            extra = ng_pad - ngp
            pidx = jnp.concatenate([pidx, jnp.zeros((extra, G),
                                                    pidx.dtype)])
            gvalid = jnp.concatenate([gvalid, jnp.zeros((extra, G), bool)])
            ngp = ng_pad
        ngd = ngp // nsh
        sidx = jnp.asarray(sidx, jnp.int32)
        # strided rows: Morton-adjacent groups have similar cost, striding
        # balances the dense core across shards
        pidx = lax.dynamic_slice(
            pidx.reshape(ngd, nsh, G), (jnp.int32(0), sidx, jnp.int32(0)),
            (ngd, 1, G)).reshape(ngd, G)
        gvalid = lax.dynamic_slice(
            gvalid.reshape(ngd, nsh, G),
            (jnp.int32(0), sidx, jnp.int32(0)),
            (ngd, 1, G)).reshape(ngd, G)
        ngp = ngd

    toac = (old_acc[tree.perm] * err_tol_force_acc).astype(dtype)
    gtargets = tree.pos_s[pidx]                       # (ngp, G, 3)
    geps = jnp.where(gvalid, tree.eps_s[pidx], 1.0)
    goac = jnp.where(gvalid, toac[pidx], 0.0)

    big = jnp.asarray(1e30, dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    far_here = tree.origin + 4.0 * tree.extent
    glo = jnp.where(any_v[:, None], glo, far_here)
    ghi = jnp.where(any_v[:, None], ghi, far_here)
    oac = jnp.min(jnp.where(gvalid & (goac > 0), goac, big), axis=1)
    oac = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac, 0.0)

    trow = jnp.concatenate([gtargets[:, :, 0], gtargets[:, :, 1],
                            gtargets[:, :, 2], geps], axis=1)  # (ngp, 256)
    geom = jnp.concatenate([glo, ghi, oac[:, None],
                            jnp.zeros((ngp, 1), dtype)], axis=1)

    acc_g, pot_g, info = _flat_eval(
        ftree, planar16, trow, geom, tree.extent, float(theta),
        bool(opening == 1), cfg, depth, int(n), int(ngp), bool(need_pot))

    didx = jnp.where(gvalid, pidx, n).reshape(-1)
    acc_s = jnp.zeros((n + 1, 3), dtype).at[didx].set(
        acc_g.reshape(-1, 3))[:n]
    pot_s = jnp.zeros(n + 1, dtype).at[didx].set(pot_g.reshape(-1))[:n]
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    acc = acc_s[inv]
    pot = pot_s[inv]
    if need_pot and shard is None:
        # remove spline self-potential (potential.c:136)
        pot = pot + mass / jnp.maximum(eps, 1e-30)
        pot = jnp.where(valid, pot, 0.0)
    acc = jnp.where(valid[:, None], acc, 0.0)
    if return_info:
        return acc, pot, info
    return acc, pot


def flat_gravity(pos, mass, eps, old_acc, *, theta=0.5, opening=1,
                 err_tol_force_acc=0.005, depth: Optional[int] = None,
                 config: Optional[FlatConfig] = None,
                 return_info: bool = False, need_pot: bool = True):
    """Raw acceleration and potential (no G factor) for all particles."""
    n = pos.shape[0]
    if depth is None:
        depth = default_depth(n)
    if n > (1 << 24):
        raise ValueError("flat engine packs segment starts in 26 bits; "
                         "N per shard must be <= 2^24")
    valid = mass > 0
    tree = build_octree(pos, mass, eps, valid, box=0.0, depth=depth)
    return flat_gravity_tree(
        tree, mass, eps, old_acc, theta=theta, opening=opening,
        err_tol_force_acc=err_tol_force_acc, config=config,
        return_info=return_info, need_pot=need_pot)
