"""Fused frontier range walk + DSMC near pass for SIDM.

Replaces the flat-segment range walk + global-sort scan (ops/sidm_tree.py
``range_walk``/``_scan_all``) with the force engine's frontier machinery
(ops/fused_force.py): per-level frontiers of node ids, per-BLOCK live
widths, child-compacted expansion, and a near pass over 16-particle packed
rows. Reference semantics: per-target neighbour enumeration within Hsml
and the kernel-weighted pair probabilities of sidm() (nbody/sidm.c:319-461),
with the order-free Gumbel-max partner selection of ops/sidm_tree.py.

Structural differences from the gravity walk:

* classification is a RANGE test (cell box within the group's padded bbox)
  instead of a multipole-acceptance test — cells out of range are DROPPED,
  there is no far field;
* the near pass accumulates (P_tot, neighbour count, running (Gumbel key,
  argmax partner)) per target instead of accelerations. The argmax rides
  the chunk loop as a running (max, arg) pair, so no second recovery pass
  is needed;
* only pre-gated targets (P_max gate, sidm.c:338-346, applied in
  _tree_sidm_prep) carry a nonzero search radius — groups whose slots are
  all ungated park their bbox and the frontier dies at the start level.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import sph_kernel
from ..sidm_common import sigma_v_product, salt_u32 as _salt_u32
from .fused_force import (IMAX, FusedConfig, _expand_open, _w_schedule,
                          compact_plane, make_windows)
from .sidm import SidmParams
from .sidm_tree import _pair_gumbel
from .tree import Octree, level_offsets

# range node row layout (8-wide)
_CTR = slice(0, 3)
_CNT = 3
_NSTART = 4
_CSTART = 5
_CCNT = 6


class RangeTree(NamedTuple):
    levels: tuple          # per level (cap_l, 8) f32 packed node rows
    rows16: jax.Array      # (ceil(N/16), 128) planar [x16|y16|z16|vx16|
                           #  vy16|vz16|m16|aux16]
    n_levels: tuple


def pack_range_tree(tree: Octree, rows_sorted) -> RangeTree:
    """Per-level 8-wide node rows (geometric center instead of moments)
    and the 16-particle packing of the SIDM particle rows
    [pos3, vel3, mass, aux] in Morton order."""
    n = tree.pos_s.shape[0]
    depth = tree.depth
    offs = level_offsets(n, depth)
    dtype = tree.pos_s.dtype

    levels = []
    for l in range(depth + 1):
        sl = slice(offs[l], offs[l + 1])
        mac = tree.mac_rows[sl]
        child_local = tree.child_start[sl] - (offs[l + 1] if l < depth else 0)
        row = jnp.concatenate([
            mac[:, 4:7],                                  # geometric center
            mac[:, 7:8],                                  # count
            tree.node_start[sl, None].astype(dtype),
            jnp.maximum(child_local, 0)[:, None].astype(dtype),
            tree.child_count[sl, None].astype(dtype),
            jnp.zeros((mac.shape[0], 1), dtype),
        ], axis=1)
        levels.append(row)

    # PLANAR-by-16 rows [x16|y16|z16|vx16|vy16|vz16|m16|aux16] — the 8
    # SIDM fields fill the 128 lanes exactly; field extraction in the
    # near tile is a contiguous lane slice (the interleaved pack's
    # (..,32,8) reshape costs ~2x the whole pass; see
    # fused_force.pack_tree)
    np16 = -(-n // 16)

    def plane(v):
        if np16 * 16 != n:
            v = jnp.concatenate([v, jnp.zeros(np16 * 16 - n, dtype)])
        return v.reshape(np16, 16)

    rows16 = jnp.concatenate([plane(rows_sorted[:, k]) for k in range(8)],
                             axis=1)
    return RangeTree(levels=tuple(levels), rows16=rows16,
                     n_levels=tuple(tree.n_nodes))


def _range_classify(rows, glo, ghi, pad, s_l, leaf_cap, last_level,
                    box=0.0):
    """Descend/accept decision: cell box (center +- s_l/2) within ``pad``
    of the group bbox. box > 0: minimum-image distances."""
    ctr = rows[..., _CTR]
    cnt = rows[..., _CNT]
    half = 0.5 * s_l
    if box:
        gc = 0.5 * (glo + ghi)[:, None, :]
        hw = 0.5 * (ghi - glo)[:, None, :]
        delta = ctr - gc
        delta = delta - box * jnp.round(delta / box)
        dx = jnp.maximum(jnp.abs(delta) - hw - half, 0.0)
    else:
        dx = jnp.maximum(
            jnp.maximum(glo[:, None, :] - ctr, ctr - ghi[:, None, :])
            - half, 0.0)
    d2 = jnp.sum(dx * dx, axis=-1)                        # (GB, WC)
    inr = d2 <= (pad * pad)[:, None]
    live = (cnt > 0) & inr
    is_leaf = cnt <= leaf_cap
    seg = live & is_leaf
    deep = live & ~is_leaf
    if last_level:
        return seg, jnp.zeros_like(deep), deep
    return seg, deep, jnp.zeros_like(deep)


def _sidm_near_tile(ent, rows16, gt, gv, gh, gdt, gty, gidx, salt, time,
                    sigma_co, params: SidmParams, box=0.0):
    """DSMC pair pass of packed segment entries against one group block.

    ent: (GB, SC) packed start*32+cnt (IMAX dead). Per-target returns
    (dptot (GB,G), dcnt, key (GB,G,S), j_idx (GB,S)) for the caller's
    running-max combine."""
    dtype = gt.dtype
    gb, sc = ent.shape
    G = gt.shape[1]
    live = ent != IMAX
    e = jnp.where(live, ent, 0)
    start = e >> 5
    cnt = jnp.where(live, e & 31, 0)
    row0 = start >> 4
    off = start & 15

    nrows = rows16.shape[0]
    rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], axis=-1)
    g = rows16[rid.reshape(-1)].reshape(gb, sc, 2, 128)
    slot = jnp.arange(32, dtype=jnp.int32)
    okw = (slot[None, None, :] >= off[:, :, None]) \
        & (slot[None, None, :] < (off + cnt)[:, :, None]) \
        & live[:, :, None]

    S = sc * 32
    j_idx = ((start >> 4 << 4)[:, :, None]
             + slot[None, None, :]).reshape(gb, S)        # 16-aligned base
    okw = okw.reshape(gb, S)

    def field(f):
        # planar rows: two consecutive 16-packs cover any off+cnt<=31
        # window with one contiguous lane slice per field
        return jnp.concatenate([g[..., 0, 16 * f:16 * (f + 1)],
                                g[..., 1, 16 * f:16 * (f + 1)]],
                               axis=-1).reshape(gb, S)

    spx, spy, spz = field(0), field(1), field(2)
    svx, svy, svz = field(3), field(4), field(5)
    sm = field(6)
    aux = field(7)
    s_type = jnp.mod(aux, 8.0).astype(jnp.int32)
    s_pend = aux >= 8.0

    # raw-coordinate pair distances (see fused_force near tile)
    d0 = gt[:, :, None, 0] - spx[:, None, :]
    d1 = gt[:, :, None, 1] - spy[:, None, :]
    d2c = gt[:, :, None, 2] - spz[:, None, :]
    if box:
        d0 = d0 - box * jnp.round(d0 / box)
        d1 = d1 - box * jnp.round(d1 / box)
        d2c = d2c - box * jnp.round(d2c / box)
    r = jnp.sqrt(d0 * d0 + d1 * d1 + d2c * d2c)           # (GB, G, S)

    ok = (okw[:, None, :] & (j_idx[:, None, :] != gidx[:, :, None])
          & (r < gh[:, :, None]) & (~s_pend)[:, None, :]
          & (s_type[:, None, :] == gty[:, :, None]))
    h_safe = jnp.maximum(gh, 1e-30)[:, :, None]
    wk = sph_kernel(r / h_safe) / h_safe**3

    w0 = gv[:, :, None, 0] - svx[:, None, :]
    w1 = gv[:, :, None, 1] - svy[:, None, :]
    w2 = gv[:, :, None, 2] - svz[:, None, :]
    rv = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
    sgv = sigma_v_product(rv, time, sigma_co, params.cross_section_type,
                          params.yukawa_velocity,
                          params.cross_section_vel_scale,
                          params.cross_section_pow_law, params.comoving)
    prob = jnp.where(ok, 0.5 * sm[:, None, :] * wk * sgv
                     * gdt[:, :, None], 0.0)
    key = jnp.where(prob > 0,
                    jnp.log(jnp.maximum(prob, 1e-37)).astype(jnp.float32)
                    + _pair_gumbel(gidx[:, :, None], j_idx[:, None, :],
                                   salt),
                    -jnp.inf)
    dptot = jnp.sum(prob, axis=-1)
    dcnt = jnp.sum(ok.astype(jnp.int32), axis=-1)
    return dptot, dcnt, key, j_idx


def _sidm_near_level(state, seg_sorted, max_live, rt: RangeTree, gt_b, gv_b,
                     gh_b, gdt_b, gty_b, gidx_b, salt, time, sigma_co,
                     params: SidmParams, cfg: FusedConfig, NB, GB,
                     box=0.0):
    """Near DSMC pass over one level's sorted (ng, W) segment-key plane."""
    ptot, ncnt, bestk, bestj = state
    ng, W = seg_sorted.shape
    G = gt_b.shape[2]
    SC = min(cfg.sc, W)

    def near_block(args):
        ent_b, gtb, gvb, ghb, gdtb, gtyb, gidxb, max_b = args
        pt = jnp.zeros((GB, G), gt_b.dtype)
        nc = jnp.zeros((GB, G), jnp.int32)
        bk = jnp.full((GB, G), -jnp.inf, jnp.float32)
        bj = jnp.full((GB, G), -1, jnp.int32)

        def chunk(state):
            ci, pt, nc, bk, bj = state
            e = lax.dynamic_slice(ent_b, (jnp.int32(0), ci * SC), (GB, SC))
            dp, dc, key, j_idx = _sidm_near_tile(
                e, rt.rows16, gtb, gvb, ghb, gdtb, gtyb, gidxb, salt,
                time, sigma_co, params, box)
            km = jnp.max(key, axis=-1)                    # (GB, G)
            jm = jnp.max(jnp.where(key == km[..., None],
                                   j_idx[:, None, :], -1), axis=-1)
            upd = km > bk
            bk = jnp.where(upd, km, bk)
            bj = jnp.where(upd, jm, bj)
            return ci + 1, pt + dp, nc + dc, bk, bj

        def cond(state):
            return state[0] * SC < max_b

        _, pt, nc, bk, bj = lax.while_loop(
            cond, chunk, (jnp.int32(0), pt, nc, bk, bj))
        return pt, nc, bk, bj

    ent = seg_sorted.reshape(NB, GB, W)
    pt, nc, bk, bj = lax.map(near_block, (ent, gt_b, gv_b, gh_b, gdt_b,
                                          gty_b, gidx_b, max_live))
    pt = pt.reshape(ng, G)
    nc = nc.reshape(ng, G)
    bk = bk.reshape(ng, G)
    bj = bj.reshape(ng, G)
    upd = bk > bestk
    return (ptot + pt, ncnt + nc, jnp.where(upd, bk, bestk),
            jnp.where(upd, bj, bestj))


def _range_level_pass(fids, live_w, tbl, s_l, nl_real, glo_b, ghi_b, pad_b,
                      *, W, WC, last, cfg, NB, GB, ng, box=0.0):
    """One level of the range walk: classify the frontier, emit seg/open
    (and big at the last level) key planes."""

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    def block_body(args):
        fids_b, glob, ghib, padb, live_b = args
        segk = jnp.full((GB, W), IMAX, jnp.int32)
        openk = jnp.full((GB, W), IMAX, jnp.int32)
        bigk = jnp.full((GB, W), IMAX, jnp.int32)

        def chunk(state):
            ci, segk, openk, bigk = state
            c0 = ci * WC
            ids = lax.dynamic_slice(fids_b, (jnp.int32(0), c0), (GB, WC))
            dead = (ids < 0) | (ids >= nl_real)
            rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
            rows = jnp.where(dead[..., None], 0.0, rows)
            seg, opn, big = _range_classify(rows, glob, ghib, padb, s_l,
                                            cfg.leaf_cap, last, box)
            starts = rows[..., _NSTART].astype(jnp.int32)
            cnts = rows[..., _CNT].astype(jnp.int32)
            sk = jnp.where(seg, starts * 32 + jnp.minimum(cnts, 31), IMAX)
            segk = lax.dynamic_update_slice(segk, sk, (jnp.int32(0), c0))
            cs = rows[..., _CSTART].astype(jnp.int32)
            cc = rows[..., _CCNT].astype(jnp.int32)
            okk = jnp.where(opn, cs * 16 + cc, IMAX)
            openk = lax.dynamic_update_slice(openk, okk, (jnp.int32(0), c0))
            if last:
                bk = jnp.where(big, ids, IMAX)
                bigk = lax.dynamic_update_slice(bigk, bk,
                                                (jnp.int32(0), c0))
            return ci + 1, segk, openk, bigk

        def cond(state):
            return state[0] * WC < jnp.minimum(live_b, W)

        _, segk, openk, bigk = lax.while_loop(
            cond, chunk, (jnp.int32(0), segk, openk, bigk))
        return segk, openk, bigk

    segk, openk, bigk = lax.map(
        block_body, (blk(fids), glo_b, ghi_b, pad_b, live_w))
    return (segk.reshape(ng, W), openk.reshape(ng, W),
            bigk.reshape(ng, W))


@partial(jax.jit, static_argnames=("cfg", "depth", "n_real", "params",
                                   "box"))
def _range_eval(rt: RangeTree, gt, gv, gh, gdt, gty, gidx, glo, ghi, pad,
                extent, origin, salt, time, sigma_co, cfg: FusedConfig,
                depth: int, n_real: int, params: SidmParams,
                box: float = 0.0):
    """Range walk + DSMC near pass over all levels (scan-consolidated like
    fused_force._fused_eval). Returns per-slot (ptot, cnt, bestk, bestj)."""
    ng, G, _ = gt.shape
    dtype = gt.dtype
    GB = min(cfg.group_block, ng)
    NB = ng // GB
    assert NB * GB == ng

    ws = _w_schedule(cfg, depth, n_real, 0.5, True)
    l0 = cfg.start_level
    W0 = ws[l0]

    ptot = jnp.zeros((ng, G), dtype)
    ncnt = jnp.zeros((ng, G), jnp.int32)
    bestk = jnp.full((ng, G), -jnp.inf, jnp.float32)
    bestj = jnp.full((ng, G), -1, jnp.int32)
    ovf = jnp.zeros(2, jnp.int32)

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    gt_b, gv_b, gh_b = blk(gt), blk(gv), blk(gh)
    gdt_b, gty_b, gidx_b = blk(gdt), blk(gty), blk(gidx)
    glo_b, ghi_b, pad_b = blk(glo), blk(ghi), blk(pad)

    fids = jnp.tile(jnp.arange(W0, dtype=jnp.int32)[None, :], (ng, 1))
    live_w = jnp.full((NB,), W0, jnp.int32)

    l_scan = depth
    while (l_scan - 1 >= l0
           and ws[l_scan - 1] == ws[depth - 1]
           and (l_scan - 1 == depth - 1 or ws[l_scan] == ws[depth - 1])):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    state = (ptot, ncnt, bestk, bestj)

    def run_level(state, fids, live_w, ovf, tbl, s_l, nl_real, W, last,
                  Wn):
        segk, openk, bigk = _range_level_pass(
            fids, live_w, tbl, s_l, nl_real, glo_b, ghi_b, pad_b,
            W=W, WC=min(cfg.wc, W), last=last, cfg=cfg, NB=NB, GB=GB,
            ng=ng, box=box)
        seg_sorted = (jnp.sort(segk, axis=1) if cfg.sort_compact
                      else compact_plane(segk))
        n_seg = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
        state = _sidm_near_level(
            state, seg_sorted, jnp.max(n_seg.reshape(NB, GB), axis=1),
            rt, gt_b, gv_b, gh_b, gdt_b, gty_b, gidx_b, salt, time,
            sigma_co, params, cfg, NB, GB, box)
        if last:
            return state, None, None, ovf, bigk
        fids, live_w, ovf, _ = _expand_open(
            openk, ovf, Wn=Wn, cfg=cfg, NB=NB, GB=GB, ng=ng)
        return state, fids, live_w, ovf, None

    for l in range(l0, min(l_scan, depth)):
        state, fids, live_w, ovf, _ = run_level(
            state, fids, live_w, ovf, rt.levels[l], extent / (1 << l),
            rt.n_levels[l], ws[l], False, ws[l + 1])

    if l_scan < depth:
        W = ws[l_scan]
        cap_s = max(rt.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate([t, jnp.zeros((cap_s - t.shape[0], 8), dtype)])
            if t.shape[0] < cap_s else t
            for t in (rt.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l), dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(rt.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])

        def scan_body(carry, xs):
            state, fids, live_w, ovf = carry
            tbl, s_l, nl_real = xs
            state, fids, live_w, ovf, _ = run_level(
                state, fids, live_w, ovf, tbl, s_l, nl_real, W, False, W)
            return (state, fids, live_w, ovf), None

        (state, fids, live_w, ovf), _ = lax.scan(
            scan_body, (state, fids, live_w, ovf), (tbls, sls, nls))

    # last level + overfull-cell chunking
    W = ws[depth]
    tbl = rt.levels[depth]
    state, _, _, ovf, bigk = run_level(
        state, fids, live_w, ovf, tbl, extent / (1 << depth),
        rt.n_levels[depth], W, True, W)

    bid = (jnp.sort(bigk, axis=1) if cfg.sort_compact
           else compact_plane(bigk))[:, :cfg.big_cap]
    bval = bid != IMAX
    brow = tbl[jnp.clip(bid, 0, tbl.shape[0] - 1)]
    bstart = brow[..., _NSTART].astype(jnp.int32)
    bcnt = jnp.where(bval, brow[..., _CNT].astype(jnp.int32), 0)
    k16 = jnp.arange(cfg.big_chunks, dtype=jnp.int32) * 16
    cst = bstart[:, :, None] + k16[None, None, :]
    ccn = jnp.clip(bcnt[:, :, None] - k16[None, None, :], 0, 16)
    bkey = jnp.where(ccn > 0, cst * 32 + ccn,
                     IMAX).reshape(ng, cfg.big_cap * cfg.big_chunks)
    bkey = (jnp.sort(bkey, axis=1) if cfg.sort_compact
            else compact_plane(bkey))
    n_bk = jnp.sum((bkey != IMAX).astype(jnp.int32), axis=1)
    state = _sidm_near_level(
        state, bkey, jnp.max(n_bk.reshape(NB, GB), axis=1),
        rt, gt_b, gv_b, gh_b, gdt_b, gty_b, gidx_b, salt, time, sigma_co,
        params, cfg, NB, GB, box)
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[1].add(
        jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0), dtype=jnp.int32)
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32))

    ptot, ncnt, bestk, bestj = state
    return ptot, ncnt, bestk, bestj, ovf


def make_gated_windows(keys_s, hs, n: int, G: int, depth: int,
                       break_level: int, group_block: int,
                       sort_groups: bool = True):
    """Morton windows over the COMPACTED gated-target subset.

    The P_max pre-gate (sidm.c:338-346) passes only a few percent of
    targets per step; plain make_windows would leave them scattered one-
    or-two per 64-slot group, and every live group pays full near-tile
    math for all 64 slots. Compacting the gated particles (they stay
    Morton-sorted) packs them ~G per group, cutting live-group count and
    the per-pair amplification by ~1/gate-rate.

    Returns (pidx, gvalid, ngp, GB, NB) with pidx in SORTED particle
    space (like make_windows on the full set)."""
    gate = hs > 0
    idx = jnp.arange(n, dtype=jnp.int32)
    cpos = jnp.cumsum(gate.astype(jnp.int32))
    n_gated = cpos[n - 1]
    dest = jnp.where(gate, cpos - 1, n)
    gpos = jnp.zeros(n + 1, jnp.int32).at[dest].set(idx)[:n]
    slotmask = idx < n_gated
    sentinel = jnp.uint32(0xFFFFFFFF)
    keys_g = jnp.where(slotmask, keys_s[jnp.clip(gpos, 0, n - 1)], sentinel)
    pidx_g, gvalid, ngp, GB, NB = make_windows(
        keys_g, slotmask, n, G, depth, break_level, group_block,
        sort_groups=sort_groups)
    pidx = jnp.clip(gpos, 0, n - 1)[pidx_g]
    return pidx, gvalid, ngp, GB, NB


def sidm_scatter_fused(p, pos_pred, tree: Octree, time, active, vmax, key,
                       params: SidmParams, cfg: Optional[FusedConfig] = None,
                       salt: int = 0, return_info: bool = False,
                       box: float = 0.0, shard: Optional[tuple] = None,
                       axis_name=None):
    """Fused-frontier DSMC pass: drop-in for sidm_scatter_tree. box > 0
    selects minimum-image distances (periodic runs; the tree must be
    built on the box cube).

    shard: optional ``(shard_index, n_shards)`` — the gated target-group
    blocks are strided round-robin across shards and ONLY the local slice
    is walked (the multi-chip proposal decomposition replacing the
    reference's 3-phase exported-particle handshake, sidm.c:204-603: each
    rank proposes for its own targets, then the per-target proposal
    fields are combined globally). Requires ``axis_name`` (the shard_map
    mesh axis): the partial (ptot, cnt, bestk, bestj) arrays are combined
    with one psum/pmax round — each gated target lives in exactly one
    group, hence on exactly one shard, so the fills (0, 0, -inf, -1)
    combine exactly. The scatter decision + conflict resolution + kicks
    then run replicated (identical RNG on every device -> identical
    kicks, deterministic under any device count)."""
    from .sidm_tree import _tree_sidm_finish, _tree_sidm_prep

    # group_block=32: measured 5.6/5.7/6.7/8.9 s per SIDM pass at
    # group_block 32/64/128/256 (NFW 1e6, v5e) — same small-block win as
    # the force walk
    cfg = cfg or FusedConfig()
    n = pos_pred.shape[0]
    G = cfg.group_size
    depth = tree.depth

    rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand = \
        _tree_sidm_prep(p, pos_pred, tree.perm, time, active, vmax, key,
                        params)
    rt = pack_range_tree(tree, rows)

    pidx, gvalid, ngp, GB, NB = make_gated_windows(
        tree.keys_s, hs, n, G, depth, cfg.break_level, cfg.group_block)

    if shard is not None:
        sidx, nsh = shard
        # pad the block axis to a multiple of n_shards, then stride
        # (blocks are ordered dense-first; striding balances work — the
        # same static balancing as fused_gravity_tree's shard mode)
        nb_pad = -(-NB // nsh) * nsh
        if nb_pad != NB:
            extra = (nb_pad - NB) * GB
            pidx = jnp.concatenate(
                [pidx, jnp.zeros((extra, G), pidx.dtype)])
            gvalid = jnp.concatenate(
                [gvalid, jnp.zeros((extra, G), bool)])
            NB, ngp = nb_pad, nb_pad * GB
        ngd = (NB // nsh) * GB
        sidx = jnp.asarray(sidx, jnp.int32)
        pidx = lax.dynamic_slice(
            pidx.reshape(NB // nsh, nsh, GB * G),
            (jnp.int32(0), sidx, jnp.int32(0)),
            (NB // nsh, 1, GB * G)).reshape(ngd, G)
        gvalid = lax.dynamic_slice(
            gvalid.reshape(NB // nsh, nsh, GB * G),
            (jnp.int32(0), sidx, jnp.int32(0)),
            (NB // nsh, 1, GB * G)).reshape(ngd, G)
        ngp, NB = ngd, NB // nsh

    gt = tree.pos_s[pidx]
    gv = jnp.where(gvalid[..., None], rows[pidx][..., 3:6], 0.0)
    gh = jnp.where(gvalid, hs[pidx], 0.0)
    gdt = jnp.where(gvalid, dts[pidx], 0.0)
    gty = jnp.where(gvalid, typs[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)

    big = jnp.asarray(1e30, gt.dtype)
    live_t = gvalid & (gh > 0)
    glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
    any_v = jnp.any(live_t, axis=1)
    if box:
        # no 'far outside' under the minimum image: park dead groups
        # with an inverted huge bbox (see fused_force parking note)
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, gt.dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, gt.dtype))
    else:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    # tree.drift inflates the containment pad on a refreshed frozen
    # topology: leaf particles can sit outside their nominal cell by the
    # accumulated displacement since the topology build
    pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1) + tree.drift

    ptot, ncnt, bestk, bestj, ovf = _range_eval(
        rt, gt, gv, gh, gdt, gty, gidx, glo, ghi, pad, tree.extent,
        tree.origin, _salt_u32(salt), time, sigma_co, cfg,
        depth, n, params, float(box))

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))

    def unflat(x, fill):
        flat_idx = jnp.where(gvalid, pidx, n).reshape(-1)
        buf = jnp.full((n + 1,), fill, x.dtype)
        return buf.at[flat_idx].set(x.reshape(-1))[:n]

    ptot_f = unflat(ptot, 0.0)
    bestk_f = unflat(bestk, -jnp.inf)
    ncnt_f = unflat(ncnt, 0)
    bestj_f = unflat(bestj, -1)
    if axis_name is not None:
        # combine the shard-partial proposal fields: each gated target
        # lives in exactly one group window, hence on exactly one shard
        # — the other shards contribute the fills (0 / -inf / 0 / -1),
        # so sum/max recover the owner's values exactly
        ptot_f = lax.psum(ptot_f, axis_name)
        bestk_f = lax.pmax(bestk_f, axis_name)
        ncnt_f = lax.psum(ncnt_f, axis_name)
        bestj_f = lax.psum(bestj_f + 1, axis_name) - 1

    out = _tree_sidm_finish(
        p, pos_pred, tree.perm, inv, ptot_f,
        bestk_f, ncnt_f, bestj_f,
        time, active, scan, p_max, rand, vmax, key, params,
        params.log_events)
    p2, n_scat, ev = out
    if return_info:
        info = dict(ovf_open=ovf[0], ovf_big=ovf[1],
                    n_gated=jnp.sum((hs > 0).astype(jnp.int32)),
                    ngb_total=jnp.sum(ncnt))
        if params.log_events:
            return p2, n_scat, ev, info
        return p2, n_scat, info
    if params.log_events:
        return p2, n_scat, ev
    return p2, n_scat

def cell_count_hsml_seed(tree: Octree, k: int):
    """Per-particle smoothing-length seed from tree cell counts: the
    deepest ancestor cell holding >= 2k particles gives a local number
    density, and h = s_cell * (3k / (4 pi count))^(1/3) (the fused analog
    of the reference's density-based initial guess, forcetree.c:2326-2347).
    Returns h in ORIGINAL particle order; within a few x of the exact
    k-neighbour radius, so a multiplicative count controller converges in
    a handful of passes."""
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    depth = tree.depth
    offs = tree.level_offsets
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
    return h_sorted[inv]


def tree_hsml_init_fused(p, tree: Octree, k: int,
                         cfg: Optional[FusedConfig] = None,
                         iters: int = 10, box: float = 0.0):
    """Initial smoothing lengths via the fused range walk
    (setup_smoothinglengths_sidm analog, init.c:159; replaces the
    segment-budget walk of sidm_tree.tree_hsml_init, whose fixed cap
    overflowed — dropping segments and under-counting — at N=1e6).

    Density seed from tree cell counts, then the multiplicative
    neighbour-count controller for ``iters`` fused counting passes."""
    import dataclasses

    from .sidm_tree import _HSML_PARAMS

    # group_block=32: measured 5.6/5.7/6.7/8.9 s per SIDM pass at
    # group_block 32/64/128/256 (NFW 1e6, v5e) — same small-block win as
    # the force walk
    cfg = cfg or FusedConfig()
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    depth = tree.depth
    offs = tree.level_offsets

    h = cell_count_hsml_seed(tree, k)
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
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
    rt = pack_range_tree(tree, rows)

    valid_s = p.valid[tree.perm]
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid_s, n, cfg.group_size, depth, cfg.break_level,
        cfg.group_block)
    gt = tree.pos_s[pidx]
    gv = jnp.zeros_like(gt)
    gdt = jnp.where(gvalid, 1.0, 0.0).astype(dtype)
    gty = jnp.where(gvalid, typs_s[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)
    big = jnp.asarray(1e30, dtype)
    far_here = tree.origin + 4.0 * tree.extent

    cnt_flat = jnp.zeros(n, jnp.int32)
    for it in range(iters + 1):  # last pass counts at the final h
        hs = h[tree.perm]
        gh = jnp.where(gvalid, hs[pidx], 0.0)
        live_t = gvalid & (gh > 0)
        glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
        ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
        any_v = jnp.any(live_t, axis=1)
        if box:
            glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, dtype))
            ghi = jnp.where(any_v[:, None], ghi,
                            jnp.asarray(-1e18, dtype))
        else:
            glo = jnp.where(any_v[:, None], glo, far_here)
            ghi = jnp.where(any_v[:, None], ghi, far_here)
        pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1)

        _, ncnt, _, _, ovf = _range_eval(
            rt, gt, gv, gh, gdt, gty, gidx, glo, ghi, pad, tree.extent,
            tree.origin, jnp.uint32(it), jnp.asarray(1.0, dtype),
            jnp.asarray(0.0, dtype), cfg, depth, n, _HSML_PARAMS,
            float(box))

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
