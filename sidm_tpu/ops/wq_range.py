"""Work-queue SIDM range walk + DSMC near pass.

ops/wq_force.py's flattened-item schedule applied to the SIDM engine
(ops/fused_range.py): identical classify/pair math over the same gated
group windows, but each level runs as ONE batched classify over the live
(group, chunk) items and ONE batched DSMC pass over the live
(group, SC-segment-chunk) items — no per-(level, block) ``lax.map``/
``lax.while_loop`` chains.

Per-group reductions over the item axis:

* scattering probability sums and neighbour counts: the scatter-free
  blocked range sums of ops/tree.py (items of a group are consecutive);
* the Gumbel-max partner ARGMAX (sidm_tree._pair_gumbel keys): max has
  no differencing inverse, so group maxima come from a SEGMENTED
  Hillis-Steele scan over the item axis — log2(max items/group) masked
  shift passes carrying (key, argmax) pairs — and a gather at each
  group's last item.

Reference semantics unchanged: neighbour enumeration within Hsml and
kernel-weighted pair probabilities of sidm() (nbody/sidm.c:319-461).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fused_range import (RangeTree, _range_classify, _sidm_near_tile,
                          make_gated_windows, pack_range_tree)
from .fused_force import FusedConfig, IMAX, _w_schedule, compact_plane
from .sidm import SidmParams
from .tree import Octree, block_prefix, range_sum
from .wq_force import (_chunk_rows, _expand_open_wq, _flatten_items,
                       _item_caps)

_CNT = 3
_NSTART = 4
_CSTART = 5
_CCNT = 6


def _seg_scan_argmax(key, j, gid, max_run: int):
    """Segmented inclusive running argmax over consecutive same-gid runs.

    key, j: (cap, G); gid: (cap,). Hillis-Steele with segment masking:
    log2(max_run) shift passes. Returns the running (key, j) so the
    caller reads each run's total at its last row."""
    cap = key.shape[0]
    d = 1
    while d < max_run and d < cap:
        key_s = jnp.concatenate(
            [jnp.full((d,) + key.shape[1:], -jnp.inf, key.dtype),
             key[:-d]])
        j_s = jnp.concatenate(
            [jnp.full((d,) + j.shape[1:], -1, j.dtype), j[:-d]])
        g_s = jnp.concatenate(
            [jnp.full((d,), -2, gid.dtype), gid[:-d]])
        ok = (g_s == gid)[:, None]
        upd = ok & (key_s > key)
        key = jnp.where(upd, key_s, key)
        j = jnp.where(upd, j_s, j)
        d *= 2
    return key, j


def _range_level_wq(fids, n_live, tbl, s_l, nl_real, glo, ghi, pad,
                    ovf_items, *, W, WC, cap_i, last, cfg, ng, box=0.0):
    """One level's classify over flattened items -> key planes."""
    maxc = W // WC
    nc = -(-jnp.minimum(n_live, W) // WC)
    items, pos, ovf = _flatten_items(nc, maxc, cap_i)
    n_items = jnp.sum(nc, dtype=jnp.int32)
    ovf_items = ovf_items.at[0].add(ovf)
    ovf_items = ovf_items.at[1].max(n_items)
    fids_c = fids.reshape(ng * maxc, WC)

    SB = min(cfg.wq_block, items.shape[0])
    if items.shape[0] % SB:
        items = jnp.concatenate(
            [items, jnp.full(SB - items.shape[0] % SB, IMAX, jnp.int32)])
    nsb = items.shape[0] // SB

    def eval_block(args):
        items_b, blk = args
        live_i = items_b != IMAX
        it = jnp.where(live_i, items_b, 0)
        g_of = it // maxc
        ids = fids_c[it]
        dead = (~live_i[:, None]) | (ids < 0) | (ids >= nl_real)
        rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
        rows = jnp.where(dead[..., None], 0.0, rows)
        seg, opn, big = _range_classify(rows, glo[g_of], ghi[g_of],
                                        pad[g_of], s_l, cfg.leaf_cap,
                                        last, box)
        starts = rows[..., _NSTART].astype(jnp.int32)
        cnts = rows[..., _CNT].astype(jnp.int32)
        sk = jnp.where(seg, starts * 32 + jnp.minimum(cnts, 31), IMAX)
        cs = rows[..., _CSTART].astype(jnp.int32)
        cc = rows[..., _CCNT].astype(jnp.int32)
        okk = jnp.where(opn, cs * 16 + cc, IMAX)
        bk = jnp.where(big, ids, IMAX) if last \
            else jnp.full((SB, WC), IMAX, jnp.int32)
        return sk, okk, bk

    def dead_block(args):
        z = jnp.full((SB, WC), IMAX, jnp.int32)
        return z, z, z

    def body(args):
        items_b, blk = args
        return lax.cond(blk * SB < n_items, eval_block, dead_block,
                        (items_b, blk))

    sk, okk, bk = lax.map(
        body, (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
    segk = _chunk_rows(sk.reshape(-1, WC), pos, nc, maxc,
                       IMAX).reshape(ng, W)
    openk = _chunk_rows(okk.reshape(-1, WC), pos, nc, maxc,
                        IMAX).reshape(ng, W)
    if last:
        bigk = _chunk_rows(bk.reshape(-1, WC), pos, nc, maxc,
                           IMAX).reshape(ng, W)
    else:
        bigk = jnp.full((ng, W), IMAX, jnp.int32)
    return segk, openk, bigk, ovf_items


def _sidm_near_wq(state, seg_sorted, n_seg, rt: RangeTree, gt, gv, gh,
                  gdt, gty, gidx, salt, time, sigma_co,
                  params: SidmParams, ovf_items, *, cap_n, cfg, ng, G,
                  box=0.0):
    """DSMC near pass over one level's compacted segment-key plane, as
    one batched _sidm_near_tile over flattened (group, SC-chunk) items
    with scatter-free per-group combines."""
    dtype = gt.dtype
    W = seg_sorted.shape[1]
    SC = min(cfg.sc, W)
    maxc = W // SC
    nc = -(-n_seg // SC)
    items, pos, ovf = _flatten_items(nc, maxc, cap_n)
    n_items = jnp.sum(nc, dtype=jnp.int32)
    ovf_items = ovf_items.at[0].add(ovf)
    ovf_items = ovf_items.at[2].max(n_items)
    seg_c = seg_sorted.reshape(ng * maxc, SC)

    SB = min(cfg.wq_near_block, items.shape[0])
    if items.shape[0] % SB:
        items = jnp.concatenate(
            [items, jnp.full(SB - items.shape[0] % SB, IMAX, jnp.int32)])
    nsb = items.shape[0] // SB
    cap = items.shape[0]

    def eval_block(args):
        items_b, blk = args
        live_i = items_b != IMAX
        it = jnp.where(live_i, items_b, 0)
        g_of = it // maxc
        ent = jnp.where(live_i[:, None], seg_c[it], IMAX)
        dp, dc, key, j_idx = _sidm_near_tile(
            ent, rt.rows16, gt[g_of], gv[g_of], gh[g_of], gdt[g_of],
            gty[g_of], gidx[g_of], salt, time, sigma_co, params, box)
        km = jnp.max(key, axis=-1)                       # (SB, G)
        jm = jnp.max(jnp.where(key == km[..., None],
                               j_idx[:, None, :], -1), axis=-1)
        return dp, dc, km, jm

    def dead_block(args):
        return (jnp.zeros((SB, G), dtype), jnp.zeros((SB, G), jnp.int32),
                jnp.full((SB, G), -jnp.inf, jnp.float32),
                jnp.full((SB, G), -1, jnp.int32))

    def body(args):
        items_b, blk = args
        return lax.cond(blk * SB < n_items, eval_block, dead_block,
                        (items_b, blk))

    dp, dc, km, jm = lax.map(
        body, (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
    dp = dp.reshape(cap, G)
    dc = dc.reshape(cap, G)
    km = km.reshape(cap, G)
    jm = jm.reshape(cap, G)

    # per-group sums (consecutive item runs)
    bp = block_prefix(jnp.concatenate([dp, dc.astype(dtype)], axis=1))
    s = range_sum(bp, pos, pos + nc)
    pt = s[:, :G]
    ncn = jnp.round(s[:, G:]).astype(jnp.int32)

    # per-group argmax: segmented scan + gather at each group's last item
    live_items = items != IMAX
    gid = jnp.where(live_items, jnp.where(live_items, items, 0) // maxc,
                    ng)
    ks, js = _seg_scan_argmax(km, jm, gid, maxc)
    last_i = jnp.clip(pos + nc - 1, 0, cap - 1)
    has = (nc > 0)[:, None]
    bk = jnp.where(has, ks[last_i], -jnp.inf)
    bj = jnp.where(has, js[last_i], -1)

    ptot, ncnt, bestk, bestj = state
    upd = bk > bestk
    return (ptot + pt, ncnt + ncn, jnp.where(upd, bk, bestk),
            jnp.where(upd, bj, bestj)), ovf_items


@partial(jax.jit, static_argnames=("cfg", "depth", "n_real", "params",
                                   "box"))
def _range_eval_wq(rt: RangeTree, gt, gv, gh, gdt, gty, gidx, glo, ghi,
                   pad, extent, origin, salt, time, sigma_co,
                   cfg: FusedConfig, depth: int, n_real: int,
                   params: SidmParams, box: float = 0.0):
    """Work-queue range walk + DSMC near pass over all levels
    (fused_range._range_eval analog)."""
    ng, G, _ = gt.shape
    dtype = gt.dtype

    ws = _w_schedule(cfg, depth, n_real, 0.5, True)
    caps = _item_caps(cfg, ws, ng, depth)
    l0 = cfg.start_level
    W0 = ws[l0]

    state = (jnp.zeros((ng, G), dtype), jnp.zeros((ng, G), jnp.int32),
             jnp.full((ng, G), -jnp.inf, jnp.float32),
             jnp.full((ng, G), -1, jnp.int32))
    ovf = jnp.zeros(2, jnp.int32)
    ovf_items = jnp.zeros(3, jnp.int32)

    fids = jnp.tile(jnp.arange(W0, dtype=jnp.int32)[None, :], (ng, 1))
    n_live = jnp.full((ng,), W0, jnp.int32)

    l_scan = depth
    while (l_scan - 1 >= l0
           and ws[l_scan - 1] == ws[depth - 1]
           and (l_scan - 1 == depth - 1 or ws[l_scan] == ws[depth - 1])):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    def run_level(state, fids, n_live, ovf, ovf_items, tbl, s_l, nl_real,
                  W, last, Wn, cap_i, cap_n):
        segk, openk, bigk, ovf_items = _range_level_wq(
            fids, n_live, tbl, s_l, nl_real, glo, ghi, pad, ovf_items,
            W=W, WC=min(cfg.wc, W), cap_i=cap_i, last=last, cfg=cfg,
            ng=ng, box=box)
        seg_sorted = (jnp.sort(segk, axis=1) if cfg.sort_compact
                      else compact_plane(segk))
        n_seg = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
        state, ovf_items = _sidm_near_wq(
            state, seg_sorted, n_seg, rt, gt, gv, gh, gdt, gty, gidx,
            salt, time, sigma_co, params, ovf_items, cap_n=cap_n,
            cfg=cfg, ng=ng, G=G, box=box)
        if last:
            return state, None, None, ovf, ovf_items, bigk
        fids, n_live, ovf, _ = _expand_open_wq(openk, ovf, Wn=Wn, cfg=cfg)
        return state, fids, n_live, ovf, ovf_items, None

    for l in range(l0, min(l_scan, depth)):
        ci, cn = caps[l]
        state, fids, n_live, ovf, ovf_items, _ = run_level(
            state, fids, n_live, ovf, ovf_items, rt.levels[l],
            extent / (1 << l), rt.n_levels[l], ws[l], False, ws[l + 1],
            ci, cn)

    if l_scan < depth:
        W = ws[l_scan]
        ci, cn = caps[l_scan]
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
            state, fids, n_live, ovf, ovf_items = carry
            tbl, s_l, nl_real = xs
            state, fids, n_live, ovf, ovf_items, _ = run_level(
                state, fids, n_live, ovf, ovf_items, tbl, s_l, nl_real,
                W, False, W, ci, cn)
            return (state, fids, n_live, ovf, ovf_items), None

        (state, fids, n_live, ovf, ovf_items), _ = lax.scan(
            scan_body, (state, fids, n_live, ovf, ovf_items),
            (tbls, sls, nls))

    # last level + overfull-cell chunking
    W = ws[depth]
    ci, cn = caps[depth]
    tbl = rt.levels[depth]
    state, _, _, ovf, ovf_items, bigk = run_level(
        state, fids, n_live, ovf, ovf_items, tbl, extent / (1 << depth),
        rt.n_levels[depth], W, True, W, ci, cn)

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
    state, ovf_items = _sidm_near_wq(
        state, bkey, n_bk, rt, gt, gv, gh, gdt, gty, gidx, salt, time,
        sigma_co, params, ovf_items,
        cap_n=min(ng * max(bkey.shape[1] // min(cfg.sc, bkey.shape[1]),
                           1), cfg.wq_near_cap),
        cfg=cfg, ng=ng, G=G, box=box)
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[1].add(
        jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0), dtype=jnp.int32)
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32))

    ptot, ncnt, bestk, bestj = state
    return ptot, ncnt, bestk, bestj, ovf, ovf_items


def sidm_scatter_wq(p, pos_pred, tree: Octree, time, active, vmax, key,
                    params: SidmParams,
                    cfg: Optional[FusedConfig] = None, salt: int = 0,
                    return_info: bool = False, box: float = 0.0):
    """Work-queue DSMC pass: drop-in for fused_range.sidm_scatter_fused."""
    from .sidm_tree import _tree_sidm_finish, _tree_sidm_prep

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
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, gt.dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, gt.dtype))
    else:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1) + tree.drift

    ptot, ncnt, bestk, bestj, ovf, ovf_items = _range_eval_wq(
        rt, gt, gv, gh, gdt, gty, gidx, glo, ghi, pad, tree.extent,
        tree.origin, _salt_u32(salt), time, sigma_co, cfg,
        depth, n, params, float(box))

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
    if return_info:
        info = dict(ovf_open=ovf[0], ovf_big=ovf[1],
                    ovf_items=ovf_items[0],
                    max_walk_items=ovf_items[1],
                    max_near_items=ovf_items[2],
                    n_gated=jnp.sum((hs > 0).astype(jnp.int32)),
                    ngb_total=jnp.sum(ncnt))
        if params.log_events:
            return p2, n_scat, ev, info
        return p2, n_scat, info
    if params.log_events:
        return p2, n_scat, ev
    return p2, n_scat
