"""Work-queue Barnes-Hut gravity: flattened live-chunk items per level.

Same walk semantics as ops/fused_force.py (identical accepted pair sets:
it reuses _classify/_far_tile/_near_tile verbatim), different execution
schedule. The fused engine runs ``lax.map`` over group blocks with a
``lax.while_loop`` chunk pass inside; the measured v5e cost of that
schedule is dominated by the ~0.4 ms fixed overhead of every
(level, block) invocation plus ~30 GFLOP/s effective utilization on the
small per-chunk ops — not by pair work (see BASELINE.md).

This engine instead flattens each level's live (group, chunk) pairs into
ONE dense item list:

* per-group live frontier widths (tighter than the fused engine's
  per-block maxima — no group pays for a dense neighbour in its block),
* ONE batched gather + classify + far-tile eval over all items of the
  level (big ops; XLA fuses the classify soup and batches the einsums),
* per-group accumulation via the scatter-free blocked range sums of
  ops/tree.py (items of a group are consecutive by construction),
* key planes reassembled by GATHER (chunk rows pulled from the item
  axis), never by scatter.

Item flattening itself is one compact_plane pass over the (group, chunk)
occupancy plane. Overflow counters (info["ovf_items"]) report any work
dropped by the static item caps; the caps default high enough that all
validated configs report zero (tests assert this).

Reference: nbody/forcetree.c:786-1377 (force_treeevaluate), via the same
fused-engine decomposition documented in ops/fused_force.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fused_force import (IMAX, FusedConfig, FusedTree, _classify,
                          _far_tile, _far_tile_pbc, _near_tile, _PREC_MAP,
                          _w_schedule, compact_plane, default_depth,
                          make_windows, pack_tree)
from .tree import block_prefix, build_octree, range_sum

_CNT = 4
_NSTART = 5
_CSTART = 6
_CCNT = 7


def _flatten_items(nc, maxc: int, cap: int):
    """Flatten per-group live chunk counts into a dense item list.

    nc: (ng,) int32 live chunk counts (0..maxc). Returns
    (items (cap,) int32 keys g*maxc+ci or IMAX, pos (ng,) exclusive item
    offsets, ovf () int32 items dropped)."""
    ng = nc.shape[0]
    ci = jnp.arange(maxc, dtype=jnp.int32)
    gk = (jnp.arange(ng, dtype=jnp.int32) * maxc)[:, None] + ci[None, :]
    keys = jnp.where(ci[None, :] < nc[:, None], gk, IMAX)
    flat = compact_plane(keys.reshape(1, ng * maxc))[0]
    n_items = jnp.sum(nc, dtype=jnp.int32)
    ovf = jnp.maximum(n_items - cap, 0)
    if cap < ng * maxc:
        flat = flat[:cap]
    else:
        cap_pad = cap - ng * maxc
        if cap_pad:
            flat = jnp.concatenate(
                [flat, jnp.full(cap_pad, IMAX, jnp.int32)])
    pos = jnp.cumsum(nc, dtype=jnp.int32) - nc
    return flat, pos, ovf


def _chunk_rows(item_data, pos, nc, maxc: int, fill):
    """Inverse of _flatten_items for per-item row data: gather the item
    rows back into a (ng, maxc, ...) plane (dead chunks = fill)."""
    ng = nc.shape[0]
    cap = item_data.shape[0]
    ci = jnp.arange(maxc, dtype=jnp.int32)
    live = ci[None, :] < nc[:, None]
    idx = jnp.where(live, pos[:, None] + ci[None, :], cap)
    pad = jnp.full((1,) + item_data.shape[1:], fill, item_data.dtype)
    data = jnp.concatenate([item_data, pad])
    return data[jnp.clip(idx, 0, cap)]


def _group_sums(dacc, dpot, pos, nc, ng: int, G: int, dtype):
    """Per-group sums of consecutive item rows, scatter-free."""
    flat = jnp.concatenate(
        [dacc.reshape(-1, G * 3), dpot.reshape(-1, G)], axis=1)
    bp = block_prefix(flat)
    s = range_sum(bp, pos, pos + nc)
    return s[:, :G * 3].reshape(ng, G, 3), s[:, G * 3:].reshape(ng, G)


def _level_pass_wq(fids, n_live, acc, pot, n_seg_total, tbl, s_l, nl_real,
                   xc, te, xr, glo, ghi, oac, gc, part16, ovf_items,
                   *, W, WC, cap_i, cap_n, last, theta2, use_relative,
                   cfg, need_pot, ng, G, dtype, pbc=None, tr_tbl=None,
                   tgt_scal=None):
    """One level: flatten items -> one batched gather/classify/far-tile ->
    per-group sums -> key planes -> batched near pass.

    Returns (acc, pot, n_seg_total, ovf_items, openk, bigk)."""
    maxc = W // WC
    nc = -(-jnp.minimum(n_live, W) // WC)
    items, pos, ovf = _flatten_items(nc, maxc, cap_i)
    n_items = jnp.sum(nc, dtype=jnp.int32)
    ovf_items = ovf_items.at[0].add(ovf)
    ovf_items = ovf_items.at[1].max(n_items)
    fids_c = fids.reshape(ng * maxc, WC)

    use_pallas = (cfg.wq_pallas and WC == 128 and pbc is None
                  and not cfg.skip_far and dtype == jnp.float32)
    if use_pallas:
        from .pallas_far import far_items, pack_rows_t
        tgt, scal = tgt_scal
        interp = jax.default_backend() != "tpu"
        SB = min(cfg.wq_block, items.shape[0])
        if items.shape[0] % SB:
            items = jnp.concatenate(
                [items,
                 jnp.full(SB - items.shape[0] % SB, IMAX, jnp.int32)])
        nsb = items.shape[0] // SB

        def live_blk(args):
            accg, items_b, blk = args
            live_i = items_b != IMAX
            it = jnp.where(live_i, items_b, 0)
            g_of = jnp.where(live_i, it // maxc, ng).astype(jnp.int32)
            ids = fids_c[it]
            dead = (~live_i[:, None]) | (ids < 0) | (ids >= nl_real)
            rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
            rows_t = pack_rows_t(rows, ids, dead)
            acc_out, keys = far_items(
                g_of, jnp.asarray(s_l, dtype), rows_t, tgt, scal, G=G,
                WC=WC, theta2=float(theta2), use_relative=use_relative,
                leaf_cap=cfg.leaf_cap, last=last, need_pot=need_pot,
                interpret=interp)
            # only groups whose item run intersects this block were
            # visited; everything else in acc_out is garbage
            b0 = blk * SB
            vis = (nc > 0) & (pos < b0 + SB) & (pos + nc > b0)
            accg = accg + jnp.where(vis[:, None, None],
                                    acc_out[:ng, :, 0:4], 0.0)
            return accg, keys

        def dead_blk(args):
            accg, items_b, blk = args
            return accg, jnp.full((SB, 4, WC), IMAX, jnp.int32)

        def scan_blk(accg, xs):
            items_b, blk = xs
            return lax.cond(blk * SB < n_items, live_blk, dead_blk,
                            (accg, items_b, blk))

        accg, keys = lax.scan(
            scan_blk, jnp.zeros((ng, G, 4), dtype),
            (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
        acc = acc + accg[:, :, 0:3]
        if need_pot:
            pot = pot + accg[:, :, 3]
        keys = keys.reshape(nsb * SB, 4, WC)
        sk = keys[:, 0, :]
        okk = keys[:, 1, :]
        bk = keys[:, 2, :]
        segk = _chunk_rows(sk, pos, nc, maxc, IMAX).reshape(ng, W)
        openk = _chunk_rows(okk, pos, nc, maxc, IMAX).reshape(ng, W)
        if last:
            bigk = _chunk_rows(bk, pos, nc, maxc, IMAX).reshape(ng, W)
        else:
            bigk = jnp.full((ng, W), IMAX, jnp.int32)
        return _finish_level(acc, pot, n_seg_total, ovf_items, segk,
                             openk, bigk, part16, xr, te, cap_n=cap_n,
                             cfg=cfg, need_pot=need_pot, ng=ng, G=G,
                             dtype=dtype, pbc=pbc, tgt_scal=tgt_scal)

    # eval in item SUPER-BLOCKS: bounds the (B, G, WC) far-tile
    # intermediates (~256 MB at B=8192) while keeping each op huge; dead
    # blocks (beyond the live item count) short-circuit via lax.cond
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
        ids = fids_c[it]                                    # (SB, WC)
        dead = (~live_i[:, None]) | (ids < 0) | (ids >= nl_real)
        rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
        rows = jnp.where(dead[..., None], 0.0, rows)
        tei = te[g_of]
        far, seg, opn, big = _classify(
            rows, glo[g_of], ghi[g_of], oac[g_of], s_l, theta2,
            use_relative, cfg.leaf_cap, last, pbc)
        rows_far = rows.at[..., 3].set(
            jnp.where(far, rows[..., 3], 0.0))
        if cfg.skip_far:
            da = jnp.zeros((SB, G, 3), dtype)
            dp = jnp.zeros((SB, G), dtype)
        elif pbc is not None:
            trr = jnp.where(
                dead | ~far, 0.0,
                tr_tbl[jnp.clip(ids, 0, tr_tbl.shape[0] - 1)])
            da, dp = _far_tile_pbc(rows_far, trr, xr[g_of], tei, pbc,
                                   need_pot)
        else:
            da, dp = _far_tile(rows_far, xc[g_of], tei, gc[g_of],
                               _PREC_MAP[cfg.precision], need_pot)
        starts = rows[..., _NSTART].astype(jnp.int32)
        cnts = rows[..., _CNT].astype(jnp.int32)
        sk = jnp.where(seg, starts * 32 + jnp.minimum(cnts, 31), IMAX)
        cs = rows[..., _CSTART].astype(jnp.int32)
        cc = rows[..., _CCNT].astype(jnp.int32)
        okk = jnp.where(opn, cs * 16 + cc, IMAX)
        bk = jnp.where(big, ids, IMAX) if last \
            else jnp.full((SB, WC), IMAX, jnp.int32)
        return da, dp, sk, okk, bk

    def dead_block(args):
        items_b, blk = args
        return (jnp.zeros((SB, G, 3), dtype), jnp.zeros((SB, G), dtype),
                jnp.full((SB, WC), IMAX, jnp.int32),
                jnp.full((SB, WC), IMAX, jnp.int32),
                jnp.full((SB, WC), IMAX, jnp.int32))

    def body(args):
        items_b, blk = args
        return lax.cond(blk * SB < n_items, eval_block, dead_block,
                        (items_b, blk))

    da, dp, sk, okk, bk = lax.map(
        body, (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
    if not cfg.skip_far:
        ga, gp = _group_sums(da.reshape(-1, G, 3), dp.reshape(-1, G),
                             pos, nc, ng, G, dtype)
        acc = acc + ga
        pot = pot + gp
    sk = sk.reshape(-1, WC)
    okk = okk.reshape(-1, WC)

    segk = _chunk_rows(sk, pos, nc, maxc, IMAX).reshape(ng, W)
    openk = _chunk_rows(okk, pos, nc, maxc, IMAX).reshape(ng, W)
    if last:
        bigk = _chunk_rows(bk.reshape(-1, WC), pos, nc, maxc,
                           IMAX).reshape(ng, W)
    else:
        bigk = jnp.full((ng, W), IMAX, jnp.int32)

    return _finish_level(acc, pot, n_seg_total, ovf_items, segk, openk,
                         bigk, part16, xr, te, cap_n=cap_n, cfg=cfg,
                         need_pot=need_pot, ng=ng, G=G, dtype=dtype,
                         pbc=pbc, tgt_scal=tgt_scal)


def _finish_level(acc, pot, n_seg_total, ovf_items, segk, openk, bigk,
                  part16, xr, te, *, cap_n, cfg, need_pot, ng, G, dtype,
                  pbc=None, tgt_scal=None):
    """Shared level tail: segment compaction + the near pass."""
    seg_sorted = (jnp.sort(segk, axis=1) if cfg.sort_compact
                  else compact_plane(segk))
    n_seg = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
    n_seg_total = n_seg_total + jnp.sum(n_seg, dtype=jnp.int32)
    if not cfg.skip_near:
        acc, pot, ovf_items = _near_wq(
            acc, pot, seg_sorted, n_seg, part16, xr, te, ovf_items,
            cap_n=cap_n, cfg=cfg, need_pot=need_pot, ng=ng, G=G,
            dtype=dtype, pbc=pbc, tgt_scal=tgt_scal)
    return acc, pot, n_seg_total, ovf_items, openk, bigk


def _near_wq(acc, pot, seg_sorted, n_seg, part16, xr, te, ovf_items, *,
             cap_n, cfg, need_pot, ng, G, dtype, pbc=None, tgt_scal=None):
    """Near pass over a compacted (ng, W) segment-key plane, as one
    batched _near_tile over flattened (group, SC-chunk) items."""
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

    use_pallas = (cfg.wq_pallas and pbc is None and dtype == jnp.float32
                  and tgt_scal is not None)
    if use_pallas:
        from .pallas_near import near_items, pack_near_fields
        tgt, _ = tgt_scal
        interp = jax.default_backend() != "tpu"

        def live_blk(args):
            accg, items_b, blk = args
            live_i = items_b != IMAX
            it = jnp.where(live_i, items_b, 0)
            g_of = jnp.where(live_i, it // maxc, ng).astype(jnp.int32)
            ent = jnp.where(live_i[:, None], seg_c[it], IMAX)
            fields = pack_near_fields(ent, part16)
            acc_out = near_items(g_of, fields, tgt, G=G, S=SC * 32,
                                 need_pot=need_pot, interpret=interp)
            b0 = blk * SB
            vis = (nc > 0) & (pos < b0 + SB) & (pos + nc > b0)
            return accg + jnp.where(vis[:, None, None],
                                    acc_out[:ng, :, 0:4], 0.0)

        def dead_blk(args):
            return args[0]

        def scan_blk(accg, xs):
            items_b, blk = xs
            return lax.cond(blk * SB < n_items, live_blk, dead_blk,
                            (accg, items_b, blk)), None

        accg, _ = lax.scan(
            scan_blk, jnp.zeros((ng, G, 4), dtype),
            (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
        pot_d = accg[:, :, 3] if need_pot else 0.0
        return acc + accg[:, :, 0:3], pot + pot_d, ovf_items

    def eval_block(args):
        items_b, blk = args
        live_i = items_b != IMAX
        it = jnp.where(live_i, items_b, 0)
        g_of = it // maxc
        ent = jnp.where(live_i[:, None], seg_c[it], IMAX)
        return _near_tile(ent, part16, xr[g_of], te[g_of], need_pot, pbc)

    def dead_block(args):
        return (jnp.zeros((SB, G, 3), dtype), jnp.zeros((SB, G), dtype))

    def body(args):
        items_b, blk = args
        return lax.cond(blk * SB < n_items, eval_block, dead_block,
                        (items_b, blk))

    da, dp = lax.map(
        body, (items.reshape(nsb, SB), jnp.arange(nsb, dtype=jnp.int32)))
    ga, gp = _group_sums(da.reshape(-1, G, 3), dp.reshape(-1, G),
                         pos, nc, ng, G, dtype)
    return acc + ga, pot + gp, ovf_items


def _expand_open_wq(openk, ovf, *, Wn, cfg):
    """Open keys -> next frontier with per-GROUP live counts."""
    ng, W = openk.shape
    O = min(W, cfg.open_cap)
    open_sorted = (jnp.sort(openk, axis=1) if cfg.sort_compact
                   else compact_plane(openk))[:, :O]
    n_open = jnp.sum((openk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[0].add(jnp.sum(jnp.maximum(n_open - O, 0),
                                dtype=jnp.int32))
    oval = open_sorted != IMAX
    cs = jnp.where(oval, open_sorted >> 4, 0)
    cc = jnp.where(oval, open_sorted & 15, 0)
    k = jnp.arange(8, dtype=jnp.int32)
    kids = jnp.where(k[None, None, :] < cc[:, :, None],
                     cs[:, :, None] + k[None, None, :],
                     IMAX).reshape(ng, 8 * O)
    n_child = jnp.sum((kids != IMAX).astype(jnp.int32), axis=1)
    kids = (jnp.sort(kids, axis=1) if cfg.sort_compact
            else compact_plane(kids))
    if 8 * O > Wn:
        kids = kids[:, :Wn]
        ovf = ovf.at[0].add(jnp.sum(jnp.maximum(n_child - Wn, 0),
                                    dtype=jnp.int32))
    else:
        kids = jnp.concatenate(
            [kids, jnp.full((ng, Wn - 8 * O), IMAX, jnp.int32)], axis=1)
    fids = jnp.where(kids == IMAX, -1, kids)
    n_live = jnp.minimum(n_child, Wn)
    return fids, n_live, ovf, jnp.max(n_open)


def _item_caps(cfg: FusedConfig, ws: dict, ng: int, depth: int):
    """Static per-level item caps (walk and near), scan-uniform deep."""
    caps = {}
    for l, W in ws.items():
        maxc = W // min(cfg.wc, W)
        maxn = W // min(cfg.sc, W)
        caps[l] = (min(ng * maxc, cfg.wq_cap),
                   min(ng * maxn, cfg.wq_near_cap))
    return caps


@partial(jax.jit, static_argnames=("theta", "use_relative", "cfg", "depth",
                                   "n_real", "need_pot", "pbc"))
def _wq_eval(ftree: FusedTree, gtargets, geps, glo, ghi, oac, gvalid,
             extent, drift, theta: float, use_relative: bool,
             cfg: FusedConfig, depth: int, n_real: int,
             need_pot: bool = True, pbc=None):
    """The work-queue walk+eval over all levels (fused_force._fused_eval
    analog; same level scheduling incl. the deep-level lax.scan)."""
    ng, G, _ = gtargets.shape
    dtype = gtargets.dtype
    theta2 = theta * theta

    gc = 0.5 * (glo + ghi)
    xc = gtargets - gc[:, None, :]
    xc = jnp.where(gvalid[..., None], xc, 0.0)

    ws = _w_schedule(cfg, depth, n_real, theta, use_relative)
    caps = _item_caps(cfg, ws, ng, depth)
    l0 = cfg.start_level
    W0 = ws[l0]

    acc = jnp.zeros((ng, G, 3), dtype)
    pot = jnp.zeros((ng, G), dtype)
    ovf = jnp.zeros(2, jnp.int32)
    # [0]=dropped items (must be 0), [1]=max walk items/level,
    # [2]=max near items/level — cap-sizing telemetry
    ovf_items = jnp.zeros(3, jnp.int32)
    n_seg_total = jnp.zeros((), jnp.int32)
    lvl_max_open = []

    fids = jnp.tile(jnp.arange(W0, dtype=jnp.int32)[None, :], (ng, 1))
    n_live = jnp.full((ng,), W0, jnp.int32)

    l_scan = depth
    while (l_scan - 1 >= l0
           and ws[l_scan - 1] == ws[depth - 1]
           and (l_scan - 1 == depth - 1
                or ws[l_scan] == ws[depth - 1])):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    tgt_scal = None
    if cfg.wq_pallas and pbc is None and dtype == jnp.float32:
        from .pallas_far import pack_tgt_scal
        tgt_scal = pack_tgt_scal(xc, geps, gtargets, glo, ghi, oac)
    common = dict(xc=xc, te=geps, xr=gtargets, glo=glo, ghi=ghi, oac=oac,
                  gc=gc, part16=ftree.part16, theta2=theta2,
                  use_relative=use_relative, cfg=cfg, need_pot=need_pot,
                  ng=ng, G=G, dtype=dtype, pbc=pbc, tgt_scal=tgt_scal)

    for l in range(l0, min(l_scan, depth)):
        W = ws[l]
        ci, cn = caps[l]
        acc, pot, n_seg_total, ovf_items, openk, _ = _level_pass_wq(
            fids, n_live, acc, pot, n_seg_total, ftree.levels[l],
            extent / (1 << l) + 2.0 * drift, ftree.n_levels[l],
            ovf_items=ovf_items, W=W, WC=min(cfg.wc, W), cap_i=ci,
            cap_n=cn, last=False, tr_tbl=ftree.levels_tr[l], **common)
        fids, n_live, ovf, mo = _expand_open_wq(
            openk, ovf, Wn=ws[l + 1], cfg=cfg)
        lvl_max_open.append(mo)

    if l_scan < depth:
        W = ws[l_scan]
        ci, cn = caps[l_scan]
        cap_s = max(ftree.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate([
                t, jnp.zeros((cap_s - t.shape[0], 16), dtype)])
            if t.shape[0] < cap_s else t
            for t in (ftree.levels[l] for l in range(l_scan, depth))])
        trs = jnp.stack([
            jnp.concatenate([t, jnp.zeros(cap_s - t.shape[0], dtype)])
            if t.shape[0] < cap_s else t
            for t in (ftree.levels_tr[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l) + 2.0 * drift, dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(ftree.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])

        def scan_body(carry, xs):
            fids, n_live, acc, pot, ovf, ovf_items, n_seg_total = carry
            tbl, tr_t, s_l, nl_real = xs
            acc, pot, n_seg_total, ovf_items, openk, _ = _level_pass_wq(
                fids, n_live, acc, pot, n_seg_total, tbl, s_l, nl_real,
                ovf_items=ovf_items, W=W, WC=min(cfg.wc, W), cap_i=ci,
                cap_n=cn, last=False, tr_tbl=tr_t, **common)
            fids, n_live, ovf, mo = _expand_open_wq(
                openk, ovf, Wn=W, cfg=cfg)
            return (fids, n_live, acc, pot, ovf, ovf_items,
                    n_seg_total), mo

        carry = (fids, n_live, acc, pot, ovf, ovf_items, n_seg_total)
        carry, mos = lax.scan(scan_body, carry, (tbls, trs, sls, nls))
        fids, n_live, acc, pot, ovf, ovf_items, n_seg_total = carry
        lvl_max_open.append(jnp.max(mos))

    # last level, with the overfull-cell (big) path
    W = ws[depth]
    ci, cn = caps[depth]
    tbl = ftree.levels[depth]
    acc, pot, n_seg_total, ovf_items, _, bigk = _level_pass_wq(
        fids, n_live, acc, pot, n_seg_total, tbl,
        extent / (1 << depth) + 2.0 * drift, ftree.n_levels[depth],
        ovf_items=ovf_items, W=W, WC=min(cfg.wc, W), cap_i=ci, cap_n=cn,
        last=True, tr_tbl=ftree.levels_tr[depth], **common)

    # overfull deepest cells -> 16-particle chunks, same near pass
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
    n_seg_total = n_seg_total + jnp.sum(n_bk, dtype=jnp.int32)
    if not cfg.skip_near:
        # bkey width is big_cap*big_chunks (not a multiple of W's sc
        # schedule); cap at the full item bound
        acc, pot, ovf_items = _near_wq(
            acc, pot, bkey, n_bk, ftree.part16, gtargets, geps, ovf_items,
            cap_n=min(ng * max(bkey.shape[1] // min(cfg.sc,
                                                    bkey.shape[1]), 1),
                      cfg.wq_near_cap),
            cfg=cfg, need_pot=need_pot, ng=ng, G=G, dtype=dtype, pbc=pbc,
            tgt_scal=tgt_scal)
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[1].add(
        jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0), dtype=jnp.int32)
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32))

    info = dict(ovf_open=ovf[0], ovf_big=ovf[1], ovf_items=ovf_items[0],
                max_walk_items=ovf_items[1], max_near_items=ovf_items[2],
                n_segs=n_seg_total,
                max_open=jnp.stack(lvl_max_open) if lvl_max_open
                else jnp.zeros(1, jnp.int32))
    return acc, pot, info


def wq_gravity_tree(tree, mass, eps, old_acc, *, theta=0.5, opening=1,
                    err_tol_force_acc=0.005,
                    config: Optional[FusedConfig] = None,
                    return_info: bool = False, need_pot: bool = True,
                    pbc: Optional[tuple] = None):
    """Work-queue walk/eval on a PREBUILT octree; drop-in for
    fused_force.fused_gravity_tree (single-chip path)."""
    cfg = config or FusedConfig()
    n = tree.pos_s.shape[0]
    depth = tree.depth
    valid = mass > 0

    ftree = pack_tree(tree)
    G = cfg.group_size
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid[tree.perm], n, G, depth, cfg.break_level,
        cfg.group_block, cfg.sort_groups)

    dtype = tree.pos_s.dtype
    toac = (old_acc[tree.perm] * err_tol_force_acc).astype(dtype)
    gtargets = tree.pos_s[pidx]
    geps = jnp.where(gvalid, tree.eps_s[pidx], 1.0)
    goac = jnp.where(gvalid, toac[pidx], 0.0)

    big = jnp.asarray(1e30, dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    if pbc is None:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    else:
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, dtype))
    oac = jnp.min(jnp.where(gvalid & (goac > 0), goac, big), axis=1)
    oac = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac, 0.0)

    acc_g, pot_g, info = _wq_eval(
        ftree, gtargets, geps, glo, ghi, oac, gvalid, tree.extent,
        tree.drift, float(theta), bool(opening == 1), cfg, depth, int(n),
        bool(need_pot),
        tuple(float(v) for v in pbc) if pbc is not None else None)

    didx = jnp.where(gvalid, pidx, n).reshape(-1)
    acc_s = jnp.zeros((n + 1, 3), dtype).at[didx].set(
        acc_g.reshape(-1, 3))[:n]
    pot_s = jnp.zeros(n + 1, dtype).at[didx].set(pot_g.reshape(-1))[:n]
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    acc = acc_s[inv]
    pot = pot_s[inv]
    if need_pot:
        pot = pot + mass / jnp.maximum(eps, 1e-30)
        if pbc is not None:
            pot = pot - mass * (2.0 * float(pbc[1]) / (jnp.pi ** 0.5))
        pot = jnp.where(valid, pot, 0.0)
    acc = jnp.where(valid[:, None], acc, 0.0)
    if return_info:
        return acc, pot, info
    return acc, pot


def wq_gravity(pos, mass, eps, old_acc, *, theta=0.5, opening=1,
               err_tol_force_acc=0.005, depth: Optional[int] = None,
               config: Optional[FusedConfig] = None,
               return_info: bool = False, need_pot: bool = True,
               pbc: Optional[tuple] = None):
    """Raw acceleration/potential for all particles (wq engine)."""
    n = pos.shape[0]
    if depth is None:
        depth = default_depth(n)
    if n > (1 << 24):
        raise ValueError("wq engine packs indices as exact f32; "
                         "N per shard must be <= 2^24")
    valid = mass > 0
    tree = build_octree(pos, mass, eps, valid,
                        box=pbc[0] if pbc is not None else 0.0, depth=depth)
    return wq_gravity_tree(
        tree, mass, eps, old_acc, theta=theta, opening=opening,
        err_tol_force_acc=err_tol_force_acc, config=config,
        return_info=return_info, need_pot=need_pot, pbc=pbc)
