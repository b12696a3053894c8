"""Flat pair-queue range walk + DSMC near pass for SIDM (v2 engine).

The SIDM counterpart of ops/flat_force.py, replacing the blocked frontier
range walk (ops/fused_range.py) whose per-(level, block) loop overheads
dominate at N=1e6. Reference semantics: per-target neighbour enumeration
within Hsml and the kernel-weighted pair probabilities of sidm()
(nbody/sidm.c:319-461), with the order-free Gumbel-max partner selection
of ops/sidm_tree.py.

Structure:

* WALK: one global flat (cell, group) pair queue per level; cells whose
  box lies within ``pad`` (max target Hsml) of the group bbox descend,
  leaf cells emit 16-particle segment entries into ONE cross-level flat
  near list, unit-padded (4 entries per unit share a group) exactly like
  the force engine's near list. No far field.
* NEAR DSMC: per 16-particle entry, kernel-weighted scatter probabilities
  against the unit's 64 targets; per-target accumulators (P_tot, ngb
  count) and a running (Gumbel key, partner) argmax combined per chunk
  through two segment-max reductions.

Particle rows are planar-by-16: [x y z vx vy vz m aux] x 16 = one 128-lane
row per field-major block (aux = ptype + 8*pending-kick flag).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import sph_kernel
from ..sidm_common import sigma_v_product, salt_u32 as _salt_u32
from .fused_force import IMAX, default_depth, make_windows
from .flat_force import NEAR_U, FlatConfig, _emit2, _emit_units
from .sidm import SidmParams
from .sidm_tree import _pair_gumbel
from .tree import Octree, level_offsets

# range node row layout (8-wide): center xyz, count, node_start,
# child_start (local, next level), child_count, pad
_CTR = slice(0, 3)
_CNT = 3
_NSTART = 4
_CSTART = 5
_CCNT = 6


class FlatRangeTree(NamedTuple):
    levels: tuple          # per level (cap_l, 8) f32 packed node rows
    planar16: jax.Array    # (ceil(N/16), 128): field-planar 16-pack
    n_levels: tuple


def pack_flat_range_tree(tree: Octree, rows_sorted) -> FlatRangeTree:
    """Range node tables (geometric center + particle/child ranges) and
    the planar-by-16 SIDM particle rows [x y z vx vy vz m aux]."""
    n = tree.pos_s.shape[0]
    depth = tree.depth
    offs = level_offsets(n, depth)
    dtype = tree.pos_s.dtype

    levels = []
    for l in range(depth + 1):
        sl = slice(offs[l], offs[l + 1])
        mac = tree.mac_rows[sl]
        child_local = tree.child_start[sl] - (offs[l + 1] if l < depth
                                              else 0)
        row = jnp.concatenate([
            mac[:, 4:7],                                  # geometric center
            mac[:, 7:8],                                  # count
            tree.node_start[sl, None].astype(dtype),
            jnp.maximum(child_local, 0)[:, None].astype(dtype),
            tree.child_count[sl, None].astype(dtype),
            jnp.zeros((mac.shape[0], 1), dtype),
        ], axis=1)
        levels.append(row)

    np16 = -(-n // 16)

    def plane(x, fill=0.0):
        if np16 * 16 != n:
            x = jnp.concatenate([x, jnp.full(np16 * 16 - n, fill, dtype)])
        return x.reshape(np16, 16)

    planar16 = jnp.concatenate([plane(rows_sorted[:, f])
                                for f in range(8)], axis=1)
    return FlatRangeTree(levels=tuple(levels), planar16=planar16,
                         n_levels=tuple(tree.n_nodes))


def _range_walk_level(qN, qG, n_q, lists, tbl_l, geom, nl_real, s_l,
                      *, cfg, last, ng):
    """One level of the range walk: emit near segments + opened cells."""
    CH = cfg.chunk
    (segE, segG, n_seg, opC, opG, n_op, ovf) = lists
    seg_cap = segE.shape[0] - 1
    op_cap = opC.shape[0] - 1
    kmax = cfg.big_chunks if last else 1

    def body(state):
        ci, segE, segG, n_seg, opC, opG, n_op, ovf = state
        c0 = ci * CH
        ids = lax.dynamic_slice(qN, (c0,), (CH,))
        gid = lax.dynamic_slice(qG, (c0,), (CH,))
        slot_ok = (jnp.arange(CH, dtype=jnp.int32) + c0) < n_q
        ids_ok = (ids >= 0) & (ids < nl_real) & slot_ok
        rows = tbl_l[jnp.clip(ids, 0, tbl_l.shape[0] - 1)]
        rows = jnp.where(ids_ok[:, None], rows, 0.0)
        gidc = jnp.clip(gid, 0, ng - 1)
        geo = geom[gidc]

        ctr = rows[:, _CTR]
        cnt = rows[:, _CNT].astype(jnp.int32)
        half = 0.5 * s_l
        dx = jnp.maximum(jnp.maximum(geo[:, 0:3] - ctr,
                                     ctr - geo[:, 3:6]) - half, 0.0)
        d2 = jnp.sum(dx * dx, axis=1)
        pad = geo[:, 6]
        inr = d2 <= pad * pad
        live = (cnt > 0) & ids_ok & inr
        seg = live & (cnt <= cfg.leaf_cap)
        deep = live & (cnt > cfg.leaf_cap)

        starts = rows[:, _NSTART].astype(jnp.int32)
        emit_cnt = jnp.where(seg, cnt, 0)
        if last:
            emit_cnt = jnp.where(deep, cnt, emit_cnt)
            ovf = ovf.at[2].add(jnp.sum(jnp.where(
                deep, jnp.maximum(cnt - 16 * kmax, 0), 0)))
        k16 = jnp.arange(kmax, dtype=jnp.int32) * 16
        ck = jnp.clip(emit_cnt[:, None] - k16[None, :], 0, 16)
        ek = (starts[:, None] + k16[None, :]) * 32 + ck
        gk = jnp.broadcast_to(gid[:, None], (CH, kmax))
        segE, segG, n_seg, ovf = _emit_units(
            segE, segG, n_seg, ek, gk, ck > 0, NEAR_U, ng, seg_cap,
            ovf, 1)

        if not last:
            cs = rows[:, _CSTART].astype(jnp.int32)
            cc = rows[:, _CCNT].astype(jnp.int32)
            opC, opG, n_op, ovf = _emit2(
                opC, opG, n_op, cs * 16 + cc, gid, deep, op_cap, ovf, 0)
        return ci + 1, segE, segG, n_seg, opC, opG, n_op, ovf

    def cond(state):
        return state[0] * CH < n_q

    state = (jnp.int32(0), segE, segG, n_seg, opC, opG, n_op, ovf)
    state = lax.while_loop(cond, body, state)
    return state[1:]


def _expand_opens_r(opC, opG, n_op, cap_next, ng):
    from .flat_force import _expand_opens
    return _expand_opens(opC, opG, n_op, cap_next, ng)


def _dsmc_near_pass(segE, segG, n_seg, planar16, trA, trB, trI, salt,
                    time, sigma_co, cfg: FlatConfig, ng: int,
                    params: SidmParams):
    """DSMC probabilities + Gumbel-max partner over the unit-padded near
    list. Returns per-(group, target) (ptot, cnt, bestk, bestj)."""
    NC = cfg.near_chunk
    NUN = NC // NEAR_U
    G = 64
    n16 = planar16.shape[0]
    dtype = trA.dtype

    ptot = jnp.zeros((ng, G), dtype)
    ncnt = jnp.zeros((ng, G), jnp.int32)
    bestk = jnp.full((ng, G), -jnp.inf, jnp.float32)
    bestj = jnp.full((ng, G), -1, jnp.int32)

    def body(state):
        ci, ptot, ncnt, bestk, bestj = state
        c0 = ci * NC
        e = lax.dynamic_slice(segE, (c0,), (NC,))
        g = lax.dynamic_slice(segG, (c0,), (NC,))
        ug = g.reshape(NUN, NEAR_U)[:, 0]
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

        sx, sy, sz = field(0), field(1), field(2)
        svx, svy, svz = field(3), field(4), field(5)
        sm, aux = field(6), field(7)
        s_type = jnp.mod(aux, 8.0).astype(jnp.int32)
        s_pend = aux >= 8.0
        slot = jnp.arange(32, dtype=jnp.int32)
        okw = (slot[None, :] >= off[:, None]) \
            & (slot[None, :] < (off + cnt)[:, None]) & live[:, None]
        # particle index of each slot: 16-aligned row base + slot
        j_idx = ((row0 * 16)[:, None] + slot[None, :])       # (NC, 32)

        ugc = jnp.clip(ug, 0, ng - 1)
        tA = jnp.repeat(trA[ugc], NEAR_U, axis=0)            # (NC, 256)
        tB = jnp.repeat(trB[ugc], NEAR_U, axis=0)
        tI = jnp.repeat(trI[ugc], NEAR_U, axis=0)            # (NC, 128) i32
        tx, ty, tz, thi = (tA[:, 0:G], tA[:, G:2 * G], tA[:, 2 * G:3 * G],
                           tA[:, 3 * G:4 * G])    # thi = 1/Hsml
        tvx, tvy, tvz, tdt = (tB[:, 0:G], tB[:, G:2 * G],
                              tB[:, 2 * G:3 * G], tB[:, 3 * G:4 * G])
        tix = tI[:, 0:G]
        tty = tI[:, G:2 * G]

        d0 = tx[:, :, None] - sx[:, None, :]
        d1 = ty[:, :, None] - sy[:, None, :]
        d2c = tz[:, :, None] - sz[:, None, :]
        r = jnp.sqrt(d0 * d0 + d1 * d1 + d2c * d2c)          # (NC, G, 32)
        u = r * thi[:, :, None]
        ok = (okw[:, None, :]
              & (j_idx[:, None, :] != tix[:, :, None])
              & (u < 1.0) & (thi[:, :, None] > 0)
              & (~s_pend)[:, None, :]
              & (s_type[:, None, :] == tty[:, :, None]))
        hi3 = thi * thi * thi
        wk = sph_kernel(jnp.minimum(u, 1.0)) * hi3[:, :, None]

        w0 = tvx[:, :, None] - svx[:, None, :]
        w1 = tvy[:, :, None] - svy[:, None, :]
        w2 = tvz[:, :, None] - svz[:, None, :]
        rv = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
        sgv = sigma_v_product(rv, time, sigma_co,
                              params.cross_section_type,
                              params.yukawa_velocity,
                              params.cross_section_vel_scale,
                              params.cross_section_pow_law,
                              params.comoving)
        prob = jnp.where(ok, 0.5 * sm[:, None, :] * wk * sgv
                         * tdt[:, :, None], 0.0)
        key = jnp.where(prob > 0,
                        jnp.log(jnp.maximum(prob, 1e-37))
                        .astype(jnp.float32)
                        + _pair_gumbel(tix[:, :, None], j_idx[:, None, :],
                                       salt),
                        -jnp.inf)

        def ured(a):
            return jnp.sum(a.reshape(NUN, NEAR_U, G, 32), axis=(1, 3))

        dptot = ured(prob)
        dcnt = jnp.sum(ok.astype(jnp.int32).reshape(NUN, NEAR_U, G, 32),
                       axis=(1, 3))
        # per-unit argmax over (NEAR_U x 32) slots
        ku = key.reshape(NUN, NEAR_U, G, 32)
        km = jnp.max(ku, axis=(1, 3))                        # (NUN, G)
        ju = jnp.broadcast_to(
            j_idx.reshape(NUN, NEAR_U, 1, 32), ku.shape)
        jm = jnp.max(jnp.where(ku >= km[:, None, :, None], ju, -1),
                     axis=(1, 3))

        useg = jnp.where(ug < ng, ug, ng)
        ptot = ptot + jax.ops.segment_sum(dptot, useg,
                                          num_segments=ng + 1)[:ng]
        ncnt = ncnt + jax.ops.segment_sum(dcnt, useg,
                                          num_segments=ng + 1)[:ng]
        # two-stage segment argmax: chunk max per group, then winner j
        m1 = jax.ops.segment_max(km, useg, num_segments=ng + 1)[:ng]
        jwin = jax.ops.segment_max(
            jnp.where(km >= m1[jnp.minimum(useg, ng - 1)], jm, -1),
            useg, num_segments=ng + 1)[:ng]
        upd = m1 > bestk
        bestk = jnp.where(upd, m1, bestk)
        bestj = jnp.where(upd, jwin, bestj)
        return ci + 1, ptot, ncnt, bestk, bestj

    def cond(state):
        return state[0] * NC < n_seg

    state = (jnp.int32(0), ptot, ncnt, bestk, bestj)
    state = lax.while_loop(cond, body, state)
    return state[1:]


@partial(jax.jit, static_argnames=("cfg", "depth", "n_real", "ng",
                                   "params"))
def _flat_range_eval(rt: FlatRangeTree, trA, trB, trI, geom, extent,
                     salt, time, sigma_co, cfg: FlatConfig, depth: int,
                     n_real: int, ng: int, params: SidmParams):
    """Range walk + DSMC near pass over all levels."""
    dtype = trA.dtype
    l0 = cfg.start_level
    caps_node = [min(8 ** l, n_real) for l in range(depth + 1)]
    from .flat_force import _queue_caps
    qcaps = _queue_caps(cfg, depth, ng, caps_node)
    seg_cap = -(-cfg.seg_cap_mult * n_real // cfg.near_chunk) \
        * cfg.near_chunk

    segE = jnp.full(seg_cap + 1, IMAX, jnp.int32)
    segG = jnp.full(seg_cap + 1, ng, jnp.int32)
    n_seg = jnp.zeros((), jnp.int32)
    ovf = jnp.zeros(4, jnp.int32)

    W0 = min(8 ** l0, caps_node[l0])
    cap0 = qcaps[l0]
    qN = jnp.full(cap0 + 1, -1, jnp.int32)
    qN = qN.at[:ng * W0].set(
        jnp.tile(jnp.arange(W0, dtype=jnp.int32), (ng,)))
    qG = jnp.full(cap0 + 1, ng, jnp.int32)
    qG = qG.at[:ng * W0].set(
        jnp.repeat(jnp.arange(ng, dtype=jnp.int32), W0))
    n_q = jnp.asarray(ng * W0, jnp.int32)

    l_scan = depth
    while (l_scan - 1 > l0
           and rt.levels[l_scan - 1].shape == rt.levels[depth - 1].shape
           and qcaps[l_scan - 1] == qcaps[depth - 1]
           and qcaps[l_scan] == qcaps[depth - 1]):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    def level_step(qN, qG, n_q, segE, segG, n_seg, ovf, tbl_l, nl_real,
                   s_l, cap_next, last):
        op_cap = (cap_next // 8 + cfg.chunk) if not last else 1
        opC = jnp.zeros(op_cap + 1, jnp.int32)
        opG = jnp.full(op_cap + 1, ng, jnp.int32)
        lists = (segE, segG, n_seg, opC, opG, jnp.zeros((), jnp.int32),
                 ovf)
        (segE, segG, n_seg, opC, opG, n_op, ovf) = _range_walk_level(
            qN, qG, n_q, lists, tbl_l, geom, nl_real, s_l, cfg=cfg,
            last=last, ng=ng)
        if not last:
            qN, qG, n_q, drop = _expand_opens_r(opC, opG, n_op, cap_next,
                                                ng)
            ovf = ovf.at[0].add(drop)
        return qN, qG, n_q, segE, segG, n_seg, ovf

    for l in range(l0, min(l_scan, depth)):
        qN, qG, n_q, segE, segG, n_seg, ovf = level_step(
            qN, qG, n_q, segE, segG, n_seg, ovf, rt.levels[l],
            rt.n_levels[l], jnp.asarray(extent / (1 << l), dtype),
            qcaps[min(l + 1, depth)], last=False)

    if l_scan < depth:
        cap_s = max(rt.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate([t, jnp.zeros((cap_s - t.shape[0], 8),
                                          dtype)])
            if t.shape[0] < cap_s else t
            for t in (rt.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l), dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(rt.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])
        cap_next = qcaps[depth - 1]

        def scan_body(carry, xs):
            qN, qG, n_q, segE, segG, n_seg, ovf = carry
            tbl_l, s_l, nl_real = xs
            out = level_step(qN, qG, n_q, segE, segG, n_seg, ovf, tbl_l,
                             nl_real, s_l, cap_next, last=False)
            return out, out[2]

        carry = (qN, qG, n_q, segE, segG, n_seg, ovf)
        carry, _ = lax.scan(scan_body, carry, (tbls, sls, nls))
        (qN, qG, n_q, segE, segG, n_seg, ovf) = carry

    _, _, _, segE, segG, n_seg, ovf = level_step(
        qN, qG, n_q, segE, segG, n_seg, ovf, rt.levels[depth],
        rt.n_levels[depth], jnp.asarray(extent / (1 << depth), dtype),
        1, last=True)

    ptot, ncnt, bestk, bestj = _dsmc_near_pass(
        segE, segG, n_seg, rt.planar16, trA, trB, trI, salt, time,
        sigma_co, cfg, ng, params)
    return ptot, ncnt, bestk, bestj, ovf, n_seg


def sidm_scatter_flat(p, pos_pred, tree: Octree, time, active, vmax, key,
                      params: SidmParams,
                      cfg: Optional[FlatConfig] = None, salt: int = 0):
    """Flat-queue DSMC pass: drop-in for sidm_scatter_fused (isolated
    runs; the periodic box stays on the segment engine)."""
    from .sidm_tree import _tree_sidm_finish, _tree_sidm_prep

    cfg = cfg or FlatConfig()
    n = pos_pred.shape[0]
    G = cfg.group_size
    depth = tree.depth
    dtype = tree.pos_s.dtype

    rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand = \
        _tree_sidm_prep(p, pos_pred, tree.perm, time, active, vmax, key,
                        params)
    rt = pack_flat_range_tree(tree, rows)

    from .fused_range import make_gated_windows
    pidx, gvalid, ngp, GB, NB = make_gated_windows(
        tree.keys_s, hs, n, G, depth, cfg.break_level,
        group_block=1, sort_groups=False)

    gt = tree.pos_s[pidx]
    gv = jnp.where(gvalid[..., None], rows[pidx][..., 3:6], 0.0)
    gh = jnp.where(gvalid, hs[pidx], 0.0)
    gdt = jnp.where(gvalid, dts[pidx], 0.0)
    gty = jnp.where(gvalid, typs[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)

    big = jnp.asarray(1e30, dtype)
    live_t = gvalid & (gh > 0)
    glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
    any_v = jnp.any(live_t, axis=1)
    far_here = tree.origin + 4.0 * tree.extent
    glo = jnp.where(any_v[:, None], glo, far_here)
    ghi = jnp.where(any_v[:, None], ghi, far_here)
    # tree.drift inflates the containment pad on a refreshed frozen
    # topology (leaf particles can leave their nominal cell between
    # topology rebuilds)
    pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1) + tree.drift

    thi = jnp.where(gh > 0, 1.0 / jnp.maximum(gh, 1e-30), 0.0)
    trA = jnp.concatenate([gt[:, :, 0], gt[:, :, 1], gt[:, :, 2], thi],
                          axis=1)
    trB = jnp.concatenate([gv[:, :, 0], gv[:, :, 1], gv[:, :, 2], gdt],
                          axis=1)
    trI = jnp.concatenate([gidx, gty], axis=1).astype(jnp.int32)
    geom = jnp.concatenate([glo, ghi, pad[:, None],
                            jnp.zeros((ngp, 1), dtype)], axis=1)

    ptot, ncnt, bestk, bestj, ovf, n_seg = _flat_range_eval(
        rt, trA, trB, trI, geom, tree.extent,
        _salt_u32(salt), time, sigma_co, cfg, depth,
        int(n), int(ngp), params)

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))

    def unflat(x, fill):
        flat_idx = jnp.where(gvalid, pidx, n).reshape(-1)
        buf = jnp.full((n + 1,), fill, x.dtype)
        return buf.at[flat_idx].set(x.reshape(-1))[:n]

    out = _tree_sidm_finish(
        p, pos_pred, tree.perm, inv, unflat(ptot, 0.0),
        unflat(bestk, -jnp.inf), unflat(ncnt, 0), unflat(bestj, -1),
        time, active, scan, p_max, rand, vmax, key, params,
        params.log_events)
    p2, n_scat, ev = out
    if params.log_events:
        return p2, n_scat, ev
    return p2, n_scat


def tree_hsml_init_flat(p, tree: Octree, k: int,
                        cfg: Optional[FlatConfig] = None,
                        iters: int = 10):
    """Initial smoothing lengths via the flat range walk
    (setup_smoothinglengths_sidm analog, nbody/init.c:159)."""
    import dataclasses

    from .sidm_tree import _HSML_PARAMS

    cfg = cfg or FlatConfig()
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    depth = tree.depth
    offs = tree.level_offsets

    # density seed: deepest ancestor cell holding >= 2k particles
    s_sel = jnp.full(n, 1.0, dtype) * tree.extent
    c_sel = jnp.full(n, float(n), dtype)
    ends = list(offs[1:]) + [tree.node_start.shape[0]]
    for l in range(1, depth + 1):
        o = offs[l]
        cap_l = ends[l] - o
        ids = o + jnp.arange(cap_l, dtype=jnp.int32)
        valid_l = jnp.arange(cap_l) < tree.n_nodes[l]
        cnts = tree.node_count[ids]
        tgt = jnp.where(valid_l & (cnts > 0), tree.node_start[ids], n)
        mark = jnp.full(n + 1, -1, jnp.int32).at[tgt].set(ids)[:n]
        nid = lax.cummax(mark)
        c_p = tree.node_count[jnp.maximum(nid, 0)].astype(dtype)
        ok = (nid >= 0) & (c_p >= 2 * k)
        s_l = tree.extent / (1 << l)
        s_sel = jnp.where(ok, s_l, s_sel)
        c_sel = jnp.where(ok, c_p, c_sel)
    h_sorted = s_sel * (3.0 * k / (4.0 * jnp.pi * c_sel)) ** (1.0 / 3.0)
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    h = h_sorted[inv]
    col = p.is_collisionless & p.valid
    h = jnp.where(col, h, 0.0)
    hcap = 8.0 * jnp.nanmedian(jnp.where(col, h, jnp.nan))
    hcap = jnp.nan_to_num(hcap, nan=jnp.inf)

    def cap(hh):
        return jnp.where(col, jnp.minimum(hh, hcap), hh)

    h = cap(h)

    typs_s = jnp.where(col, p.ptype, -9)[tree.perm].astype(jnp.int32)
    aux = jnp.clip(p.ptype, 0, 7).astype(dtype)[tree.perm]
    rows = jnp.concatenate([
        tree.pos_s, jnp.zeros((n, 3), dtype),
        jnp.ones((n, 1), dtype), aux[:, None]], axis=1)
    rt = pack_flat_range_tree(tree, rows)

    valid_s = p.valid[tree.perm]
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid_s, n, cfg.group_size, depth, cfg.break_level,
        group_block=1, sort_groups=False)
    gt = tree.pos_s[pidx]
    gdt = jnp.where(gvalid, 1.0, 0.0).astype(dtype)
    gty = jnp.where(gvalid, typs_s[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)
    big = jnp.asarray(1e30, dtype)
    far_here = tree.origin + 4.0 * tree.extent

    trB = jnp.concatenate([jnp.zeros((ngp, 192), dtype), gdt], axis=1)
    trI = jnp.concatenate([gidx, gty], axis=1).astype(jnp.int32)

    cnt_flat = jnp.zeros(n, jnp.int32)
    for it in range(iters + 1):  # last pass counts at the final h
        hs = h[tree.perm]
        gh = jnp.where(gvalid, hs[pidx], 0.0)
        live_t = gvalid & (gh > 0)
        glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
        ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
        any_v = jnp.any(live_t, axis=1)
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
        pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1)
        thi = jnp.where(gh > 0, 1.0 / jnp.maximum(gh, 1e-30), 0.0)
        trA = jnp.concatenate([gt[:, :, 0], gt[:, :, 1], gt[:, :, 2],
                               thi], axis=1)
        geom = jnp.concatenate([glo, ghi, pad[:, None],
                                jnp.zeros((ngp, 1), dtype)], axis=1)

        _, ncnt, _, _, ovf, _ = _flat_range_eval(
            rt, trA, trB, trI, geom, tree.extent, jnp.uint32(it),
            jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype), cfg,
            depth, int(n), int(ngp), _HSML_PARAMS)

        flat_idx = jnp.where(gvalid, pidx, n).reshape(-1)
        cnt_sorted = jnp.zeros(n + 1, jnp.int32).at[flat_idx].set(
            ncnt.reshape(-1))[:n]
        cnt_flat = cnt_sorted[inv]
        if it < iters:
            ratio = (k / jnp.maximum(cnt_flat, 1).astype(dtype)) \
                ** (1.0 / 3.0)
            h = cap(jnp.where(col, h * jnp.clip(ratio, 0.5, 2.0), h))

    return dataclasses.replace(
        p,
        hsml_vd=jnp.where(col, h, p.hsml_vd),
        ngb_vd=jnp.where(col, cnt_flat, p.ngb_vd).astype(jnp.int32))
