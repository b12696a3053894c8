"""Cached per-particle SIDM candidate lists (Verlet lists for DSMC).

The fused range walk (ops/fused_range.py) re-walks the octree every step
to enumerate neighbours of the P_max-gated targets (sidm.c:319-461). But
the neighbour sets change as slowly as the force lists: a per-particle
candidate list recorded once per tree rebuild under a radius pad

    R_i = pad_fac * h_i(record) + skin

stays a SUPERSET of ball(h_i(now)) while every particle has moved less
than skin/2 and h_i has not outgrown the pad — exactly the Verlet-list
invariant, monitored per step.

Per step the DSMC pass then touches ONLY the gated targets: compact them
(they are ~10-20% of particles), gather their K candidates, and run the
kernel-weighted pair probabilities + Gumbel-max partner selection in one
dense (n_gated, K) tile. No walk, no segment machinery.

Record-time structure reuses the force-list walk pieces: the range
classification of fused_range (cell within the group's padded bbox) with
the consolidated segment planes of list_force, followed by a candidate
emission pass that tests the segment particles against each target's own
padded radius.

Reference semantics: neighbour enumeration within Hsml for the scatter
probability sum (sidm.c:352-386) and the neighbour-count input of the
Hsml controller (sidm_ensure_neighbours, sidm.c:814-968); conflict
resolution and kicks stay in sidm_tree._tree_sidm_finish.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import sph_kernel
from ..sidm_common import sigma_v_product
from .fused_force import (IMAX, FusedConfig, _expand_open, _w_schedule,
                          compact_plane, make_windows)
from .fused_range import (RangeTree, _range_level_pass, pack_range_tree,
                          _CNT, _NSTART)
from .list_force import _append_plane
from .sidm import SidmParams
from .sidm_tree import _pair_gumbel
from .tree import Octree


class RangeListConfig(NamedTuple):
    k_cap: int = 384          # candidates per particle (the flagship
                              # N=1e6 NFW first record demands ~740 for
                              # unconverged-hsml outliers; 384 is the
                              # accept-with-truncation ceiling, see
                              # Simulation._SIDM_K_CEILING)
    seg_cap: int = 8192       # consolidated range segments per group
                              # (flagship demand ~6.5k)
    lvl_cap: int = 4096       # per-level recording width
    sc: int = 32              # segment chunk width in the emission pass
                              # (sc=128 measured 8.4 s vs 4.9 s at 32:
                              # the padded (G, sc*32) pair tile wastes
                              # more than the item-count saving)
    pad_fac: float = 1.2      # radius pad factor over h(record)
    gated_frac: float = 0.3   # static cap on gated targets per step, as a
                              # fraction of n (compaction buffer size)
    k_dense: int = 96         # two-tier eval: targets with ncand <=
                              # k_dense run in the dense tier (mean
                              # flagship demand ~54); the rest run in a
                              # small full-K tail tier — kills the 7x
                              # K-padding of a single (ngc, k_cap) tile
    tail_frac: float = 0.25   # tail-tier capacity as a fraction of the
                              # gated capacity (fallback when tail_cap=0)
    tail_cap: int = 0         # absolute tail-tier capacity; the driver
                              # auto-fits it per record from the actual
                              # count of long lists (ncand > k_dense) so
                              # the tail tile isn't padded to a
                              # worst-case fraction


class SidmCandidates(NamedTuple):
    cand: jax.Array       # (n, K) int32 SORTED-order candidate ids, -1 pad
    ncand: jax.Array      # (n,) int32
    r_ref: jax.Array      # (n,) record search radius R_i (sorted order)
    pos_ref: jax.Array    # (n, 3) sorted positions at record
    ovf: jax.Array        # (2,) int32 [segment-plane drops, K drops]
    skin: jax.Array       # ()
    need: jax.Array       # (2,) int32 [max seg entries/group, max
                          # candidates/particle] — uncapped demand, for
                          # auto-sizing seg_cap/k_cap after an overflow


def _record_segments(rt: RangeTree, glo, ghi, pad, extent, cfg: FusedConfig,
                     rcfg: RangeListConfig, depth: int, n_real: int,
                     box: float = 0.0):
    """Range walk emitting one consolidated segment plane per group."""
    ng = glo.shape[0]
    GB = min(cfg.group_block, ng)
    while ng % GB:
        GB -= 1
    NB = ng // GB

    ws = _w_schedule(cfg, depth, n_real, 0.5, True)
    l0 = cfg.start_level
    W0 = ws[l0]

    LR = rcfg.seg_cap
    near = jnp.full((ng, LR), IMAX, jnp.int32)
    nn = jnp.zeros(ng, jnp.int32)
    needn = jnp.zeros(ng, jnp.int32)   # uncapped per-group demand
    ovf_n = jnp.zeros((), jnp.int32)
    ovf_open = jnp.zeros(2, jnp.int32)

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

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

    def do_level(l, fids, live_w, near, nn, needn, ovf_n, tbl=None,
                 s_l=None, nl=None):
        W = ws[min(l, depth)]
        segk, openk, bigk = _range_level_pass(
            fids, live_w, rt.levels[l] if tbl is None else tbl,
            extent / (1 << l) if s_l is None else s_l,
            rt.n_levels[l] if nl is None else nl,
            glo_b, ghi_b, pad_b, W=W, WC=min(cfg.wc, W),
            last=(l >= depth), cfg=cfg, NB=NB, GB=GB, ng=ng, box=box)
        LC = min(rcfg.lvl_cap, W)
        n_live = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
        needn = needn + n_live
        segp = compact_plane(segk)[:, :LC]
        ovf_n2 = jnp.sum(jnp.maximum(n_live - LC, 0), dtype=jnp.int32)
        near, nn, ovf_n = _append_plane(near, nn, ovf_n + ovf_n2, segp, LC)
        return segk, openk, bigk, near, nn, needn, ovf_n

    for l in range(l0, min(l_scan, depth)):
        _, openk, _, near, nn, needn, ovf_n = do_level(
            l, fids, live_w, near, nn, needn, ovf_n)
        fids, live_w, ovf_open, _ = _expand_open(
            openk, ovf_open, Wn=ws[l + 1], cfg=cfg, NB=NB, GB=GB, ng=ng)

    if l_scan < depth:
        W = ws[l_scan]
        dtype = rt.levels[0].dtype
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
            fids, live_w, near, nn, needn, ovf_n, ovf_open = carry
            tbl, s_l, nl = xs
            _, openk, _, near, nn, needn, ovf_n = do_level(
                l_scan, fids, live_w, near, nn, needn, ovf_n, tbl=tbl,
                s_l=s_l, nl=nl)
            fids, live_w, ovf_open, _ = _expand_open(
                openk, ovf_open, Wn=W, cfg=cfg, NB=NB, GB=GB, ng=ng)
            return (fids, live_w, near, nn, needn, ovf_n, ovf_open), None

        carry = (fids, live_w, near, nn, needn, ovf_n, ovf_open)
        carry, _ = lax.scan(scan_body, carry, (tbls, sls, nls))
        fids, live_w, near, nn, needn, ovf_n, ovf_open = carry

    # last level + overfull-cell chunking
    tbl = rt.levels[depth]
    _, _, bigk, near, nn, needn, ovf_n = do_level(depth, fids, live_w,
                                                  near, nn, needn, ovf_n)
    bid = compact_plane(bigk)[:, :cfg.big_cap]
    bval = bid != IMAX
    brow = tbl[jnp.clip(bid, 0, tbl.shape[0] - 1)]
    bstart = brow[..., _NSTART].astype(jnp.int32)
    bcnt = jnp.where(bval, brow[..., _CNT].astype(jnp.int32), 0)
    k16 = jnp.arange(cfg.big_chunks, dtype=jnp.int32) * 16
    cst = bstart[:, :, None] + k16[None, None, :]
    ccn = jnp.clip(bcnt[:, :, None] - k16[None, None, :], 0, 16)
    bkey = jnp.where(ccn > 0, cst * 32 + ccn,
                     IMAX).reshape(ng, cfg.big_cap * cfg.big_chunks)
    bkey = compact_plane(bkey)
    big_drop = jnp.maximum(
        jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1) - cfg.big_cap, 0)
    needn = (needn + jnp.sum((bkey != IMAX).astype(jnp.int32), axis=1)
             + big_drop * cfg.big_chunks)
    near, nn, ovf_n = _append_plane(near, nn, ovf_n, bkey, bkey.shape[1])
    ovf_n = ovf_n + ovf_open[0] + jnp.sum(big_drop, dtype=jnp.int32)
    return near, nn, ovf_n, jnp.max(needn)


def _emit_candidates(near, nn, rows16, gt, gty, gr, gidx, gvalid,
                     cfg: FusedConfig, rcfg: RangeListConfig,
                     box: float = 0.0):
    """Per-target candidate ids from the group segment planes.

    gt (ng,G,3) targets, gty (ng,G) types, gr (ng,G) padded radii,
    gidx (ng,G) sorted ids. Returns cand (ng,G,K), ncand, K-overflow.

    Work schedule: groups are LENGTH-SORTED by their segment count and
    the live (block, chunk) pairs flatten into one item list under a
    single while_loop (the list_force._item_schedule pattern) — a
    map-of-while over unsorted blocks runs every block to its longest
    member's chunk count and paid a full-width append per dead chunk
    (measured 16.9 s of a 21.2 s record at N=1e6; this schedule brings
    emission in line with the ~4 s walk)."""
    from .list_force import _item_schedule

    ng, G, _ = gt.shape
    K = rcfg.k_cap
    SC = rcfg.sc
    GB = min(cfg.group_block, ng)
    while ng % GB:
        GB -= 1
    NB = ng // GB

    o = jnp.argsort(-nn)
    inv = jnp.zeros(ng, jnp.int32).at[o].set(
        jnp.arange(ng, dtype=jnp.int32))
    near_s = near[o]
    gt_s, gty_s, gr_s, gidx_s = gt[o], gty[o], gr[o], gidx[o]
    bi_a, ci_a, n_items = _item_schedule(
        nn[o].reshape(NB, GB), SC, NB * (near.shape[1] // SC + 1))

    nrows = rows16.shape[0]
    slot = jnp.arange(32, dtype=jnp.int32)

    def item(state):
        i, cand, ncand, kovf, needk = state
        g0 = bi_a[i] * GB
        ci = ci_a[i]
        e = lax.dynamic_slice(near_s, (g0, ci * SC), (GB, SC))
        gtb = lax.dynamic_slice(gt_s, (g0, 0, 0), (GB, G, 3))
        gtyb = lax.dynamic_slice(gty_s, (g0, 0), (GB, G))
        grb = lax.dynamic_slice(gr_s, (g0, 0), (GB, G))
        gidxb = lax.dynamic_slice(gidx_s, (g0, 0), (GB, G))

        live = e != IMAX
        ee = jnp.where(live, e, 0)
        start = ee >> 5
        cnt = jnp.where(live, ee & 31, 0)
        row0 = start >> 4
        off = start & 15
        rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)],
                        axis=-1)
        g = rows16[rid.reshape(-1)].reshape(GB, SC, 2, 128)
        okw = (slot[None, None, :] >= off[:, :, None]) \
            & (slot[None, None, :] < (off + cnt)[:, :, None]) \
            & live[:, :, None]
        S = SC * 32
        j_idx = ((row0 << 4)[:, :, None]
                 + slot[None, None, :]).reshape(GB, S)
        okw = okw.reshape(GB, S)

        def field(f):
            return jnp.concatenate(
                [g[..., 0, 16 * f:16 * (f + 1)],
                 g[..., 1, 16 * f:16 * (f + 1)]],
                axis=-1).reshape(GB, S)

        spx, spy, spz = field(0), field(1), field(2)
        aux = field(7)
        s_type = jnp.mod(aux, 8.0).astype(jnp.int32)

        d0 = gtb[:, :, None, 0] - spx[:, None, :]
        d1 = gtb[:, :, None, 1] - spy[:, None, :]
        d2 = gtb[:, :, None, 2] - spz[:, None, :]
        if box:
            # minimum image (the eval pass wraps too; without this,
            # neighbours across the periodic faces never record)
            d0 = d0 - box * jnp.round(d0 / box)
            d1 = d1 - box * jnp.round(d1 / box)
            d2 = d2 - box * jnp.round(d2 / box)
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        ok = (okw[:, None, :]
              & (r2 < (grb * grb)[:, :, None])
              & (j_idx[:, None, :] != gidxb[:, :, None])
              & (s_type[:, None, :] == gtyb[:, :, None]))

        # compact this chunk's hits and append to each target's list
        keys = jnp.where(ok, j_idx[:, None, :], IMAX).reshape(GB * G, S)
        keysc = compact_plane(keys)[:, :K]
        n_hit = jnp.sum(ok.astype(jnp.int32), axis=-1)
        needk = lax.dynamic_update_slice(
            needk,
            lax.dynamic_slice(needk, (g0, 0), (GB, G)) + n_hit, (g0, 0))
        kovf = kovf + jnp.sum(jnp.maximum(n_hit - K, 0), dtype=jnp.int32)
        cb = lax.dynamic_slice(cand, (g0, 0, 0),
                               (GB, G, K)).reshape(GB * G, K)
        nb = lax.dynamic_slice(ncand, (g0, 0), (GB, G)).reshape(GB * G)
        cb, nb, kovf = _append_plane(cb, nb, kovf, keysc, K)
        cand = lax.dynamic_update_slice(cand, cb.reshape(GB, G, K),
                                        (g0, 0, 0))
        ncand = lax.dynamic_update_slice(ncand, nb.reshape(GB, G),
                                         (g0, 0))
        return i + 1, cand, ncand, kovf, needk

    cand0 = jnp.full((ng, G, K), IMAX, jnp.int32)
    ncand0 = jnp.zeros((ng, G), jnp.int32)
    needk0 = jnp.zeros((ng, G), jnp.int32)
    _, cand, ncand, kovf, needk = lax.while_loop(
        lambda s: s[0] < n_items, item,
        (jnp.int32(0), cand0, ncand0, jnp.zeros((), jnp.int32), needk0))
    return (cand[inv], ncand[inv], kovf, jnp.max(needk))


@partial(jax.jit, static_argnames=("cfg", "rcfg", "depth", "n_real",
                                   "box"))
def _record(rt: RangeTree, gt, gty, gr, gidx, gvalid, glo, ghi, pad,
            extent, cfg: FusedConfig, rcfg: RangeListConfig, depth: int,
            n_real: int, box: float = 0.0):
    near, nn, ovf_seg, need_seg = _record_segments(
        rt, glo, ghi, pad, extent, cfg, rcfg, depth, n_real, box)
    cand, ncand, ovf_k, need_k = _emit_candidates(
        near, nn, rt.rows16, gt, gty, gr, gidx, gvalid, cfg, rcfg, box)
    return cand, ncand, jnp.stack([ovf_seg, ovf_k]), \
        jnp.stack([need_seg, need_k])


def record_candidates(tree: Octree, rows_sorted, h_all_sorted,
                      type_sorted, valid_sorted, *, skin=0.0,
                      cfg: Optional[FusedConfig] = None,
                      rcfg: Optional[RangeListConfig] = None,
                      box: float = 0.0) -> SidmCandidates:
    """Build per-particle candidate lists for ALL valid collisionless
    particles of ``tree``.

    rows_sorted: (n,8) [pos3, vel3, mass, aux] in sorted order (the SIDM
    pack of _tree_sidm_prep); h_all_sorted: per-particle h_eff in sorted
    order (ungated too — lists must serve any future gating);
    type_sorted: particle type (or -9 for non-collisionless)."""
    cfg = cfg or FusedConfig()
    rcfg = rcfg or RangeListConfig()
    n = tree.pos_s.shape[0]
    depth = tree.depth
    dtype = tree.pos_s.dtype

    rt = pack_range_tree(tree, rows_sorted)
    G = cfg.group_size
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid_sorted, n, G, depth, cfg.break_level,
        cfg.group_block, cfg.sort_groups)

    skin = jnp.asarray(skin, dtype)
    r_all = jnp.where(valid_sorted & (type_sorted >= 0),
                      rcfg.pad_fac * h_all_sorted + skin, 0.0)
    gt = tree.pos_s[pidx]
    gr = jnp.where(gvalid, r_all[pidx], 0.0)
    gty = jnp.where(gvalid, type_sorted[pidx], -9).astype(jnp.int32)
    gidx = jnp.where(gvalid, pidx, -1)

    big = jnp.asarray(1e30, dtype)
    live_t = gvalid & (gr > 0)
    glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
    any_v = jnp.any(live_t, axis=1)
    if box:
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, dtype))
    else:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    pad = jnp.max(jnp.where(live_t, gr, 0.0), axis=1) + tree.drift

    cand_g, ncand_g, ovf, need = _record(
        rt, gt, gty, gr, gidx, gvalid, glo, ghi, pad, tree.extent, cfg,
        rcfg, depth, int(n), float(box))

    # scatter group slots back to (n, K) sorted-order rows
    K = rcfg.k_cap
    didx = jnp.where(gvalid, pidx, n).reshape(-1)
    cand = jnp.full((n + 1, K), IMAX, jnp.int32).at[didx].set(
        cand_g.reshape(-1, K))[:n]
    ncand = jnp.zeros(n + 1, jnp.int32).at[didx].set(
        ncand_g.reshape(-1))[:n]
    return SidmCandidates(cand=cand, ncand=ncand, r_ref=r_all,
                          pos_ref=tree.pos_s, ovf=ovf, skin=skin,
                          need=need)


@partial(jax.jit, static_argnames=("params", "ngc", "ntail", "kd", "box"))
def _eval_gated(rows, cand, ncand, hs, dts, typs, salt, time, sigma_co,
                params: SidmParams, ngc: int, ntail: int = 0,
                kd: int = 0, box: float = 0.0):
    """Two-tier dense DSMC tiles over the gated targets.

    Targets with ncand <= kd run in a (ngc, kd) DENSE tier; the few whose
    lists are longer run in a (ntail, K) TAIL tier (kd=0 or ntail=0
    restores the single full-K tile). With flagship mean demand ~54 vs
    K=384, the dense tier cuts the gathered bytes and padded pair math
    ~K/kd-fold for ~all targets.

    rows: (n,8) sorted pack; hs: (n,) gated search radius (0 = ungated).
    Returns sorted-space (ptot, cnt, best_key, best_j, ovf2) with ovf2 =
    [gated-capacity drops, tail-capacity drops]."""
    n, K = cand.shape[0], cand.shape[1]
    dtype = rows.dtype
    two_tier = 0 < kd < K and ntail > 0

    gate = hs > 0
    idx = jnp.arange(n, dtype=jnp.int32)

    def compact(mask, cap):
        cpos = jnp.cumsum(mask.astype(jnp.int32))
        n_m = cpos[n - 1]
        dest = jnp.where(mask, cpos - 1, n)
        gpos = jnp.full(n + 1, 0, jnp.int32).at[dest].set(idx)[:n]
        if cap > n:      # static: tid must be exactly cap-sized
            gpos = jnp.concatenate(
                [gpos, jnp.zeros(cap - n, jnp.int32)])
        slot = jnp.arange(cap, dtype=jnp.int32)
        tid = jnp.where(slot < jnp.minimum(n_m, cap), gpos[:cap], -1)
        return tid, n_m

    def run_tier(tid, cap, Kt):
        B = min(32768, cap)
        while cap % B:
            B -= 1

        def tile(tid_b):
            tv = tid_b >= 0
            tidc = jnp.clip(tid_b, 0, n - 1)
            trow = rows[tidc]                                # (B, 8)
            th = jnp.where(tv, hs[tidc], 0.0)
            tdt = jnp.where(tv, dts[tidc], 0.0)
            cj = cand[tidc, :Kt]                             # (B, Kt)
            cv = (cj != IMAX) & tv[:, None] \
                & (jax.lax.broadcasted_iota(jnp.int32, (B, Kt), 1)
                   < ncand[tidc][:, None])
            cjc = jnp.clip(jnp.where(cv, cj, 0), 0, n - 1)
            jrow = rows[cjc.reshape(-1)].reshape(B, Kt, 8)

            d0 = trow[:, None, 0] - jrow[..., 0]
            d1 = trow[:, None, 1] - jrow[..., 1]
            d2 = trow[:, None, 2] - jrow[..., 2]
            if box:
                d0 = d0 - box * jnp.round(d0 / box)
                d1 = d1 - box * jnp.round(d1 / box)
                d2 = d2 - box * jnp.round(d2 / box)
            r = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)

            s_pend = jrow[..., 7] >= 8.0
            ok = cv & (r < th[:, None]) & (~s_pend)
            h_safe = jnp.maximum(th, 1e-30)[:, None]
            wk = sph_kernel(r / h_safe) / h_safe ** 3

            w0 = trow[:, None, 3] - jrow[..., 3]
            w1 = trow[:, None, 4] - jrow[..., 4]
            w2 = trow[:, None, 5] - jrow[..., 5]
            rv = jnp.sqrt(w0 * w0 + w1 * w1 + w2 * w2)
            sgv = sigma_v_product(rv, time, sigma_co,
                                  params.cross_section_type,
                                  params.yukawa_velocity,
                                  params.cross_section_vel_scale,
                                  params.cross_section_pow_law,
                                  params.comoving)
            prob = jnp.where(ok, 0.5 * jrow[..., 6] * wk * sgv
                             * tdt[:, None], 0.0)
            key = jnp.where(
                prob > 0,
                jnp.log(jnp.maximum(prob, 1e-37)).astype(jnp.float32)
                + _pair_gumbel(tid_b[:, None], cjc, salt),
                -jnp.inf)
            ptot_b = jnp.sum(prob, axis=-1)
            cnt_b = jnp.sum(ok.astype(jnp.int32), axis=-1)
            km = jnp.max(key, axis=-1)
            jm = jnp.max(jnp.where(key == km[:, None], cjc, -1), axis=-1)
            jm = jnp.where(jnp.isfinite(km), jm, -1)
            return ptot_b, cnt_b, km, jm

        ptot_g, cnt_g, km, jm = lax.map(tile, tid.reshape(cap // B, B))
        return (x.reshape(cap) for x in (ptot_g, cnt_g, km, jm))

    ptot = jnp.zeros(n + 1, dtype)
    cnt = jnp.zeros(n + 1, jnp.int32)
    bestk = jnp.full(n + 1, -jnp.inf, jnp.float32)
    bestj = jnp.full(n + 1, -1, jnp.int32)

    if two_tier:
        tail = gate & (ncand > kd)
        tidA, nA = compact(gate & ~tail, ngc)
        tidB, nB = compact(tail, ntail)
        for tid, cap, Kt in ((tidA, ngc, kd), (tidB, ntail, K)):
            ptot_g, cnt_g, km, jm = run_tier(tid, cap, Kt)
            tdst = jnp.where(tid >= 0, tid, n)
            ptot = ptot.at[tdst].set(ptot_g)
            cnt = cnt.at[tdst].set(cnt_g)
            bestk = bestk.at[tdst].set(km)
            bestj = bestj.at[tdst].set(jm)
        ovf2 = jnp.stack([jnp.maximum(nA - ngc, 0),
                          jnp.maximum(nB - ntail, 0)])
    else:
        tid, n_gated = compact(gate, ngc)
        ptot_g, cnt_g, km, jm = run_tier(tid, ngc, K)
        tdst = jnp.where(tid >= 0, tid, n)
        ptot = ptot.at[tdst].set(ptot_g)
        cnt = cnt.at[tdst].set(cnt_g)
        bestk = bestk.at[tdst].set(km)
        bestj = bestj.at[tdst].set(jm)
        ovf2 = jnp.stack([jnp.maximum(n_gated - ngc, 0),
                          jnp.zeros((), jnp.int32)])
    return ptot[:n], cnt[:n], bestk[:n], bestj[:n], ovf2


def candidates_valid(cands: SidmCandidates, pos_sorted, h_eff_sorted):
    """Worst-case validity margin: positive = some particle's current
    search ball may exceed its recorded candidate ball."""
    d = pos_sorted - cands.pos_ref
    md = jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))
    slack = cands.r_ref - h_eff_sorted
    return 2.0 * md - jnp.min(jnp.where(cands.r_ref > 0, slack,
                                        jnp.inf))


def sidm_scatter_lists(p, pos_pred, tree: Octree, cands: SidmCandidates,
                       time, active, vmax, key, params: SidmParams,
                       cfg: Optional[FusedConfig] = None,
                       rcfg: Optional[RangeListConfig] = None,
                       salt: int = 0, box: float = 0.0):
    """Per-step DSMC from cached candidate lists: drop-in for
    sidm_scatter_fused (plus a validity margin in the info dict)."""
    from .sidm_tree import _tree_sidm_finish, _tree_sidm_prep

    cfg = cfg or FusedConfig()
    rcfg = rcfg or RangeListConfig()
    n = pos_pred.shape[0]

    rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand = \
        _tree_sidm_prep(p, pos_pred, tree.perm, time, active, vmax, key,
                        params)

    # validity BY CONSTRUCTION: clamp each target's enumeration radius
    # to what its recorded candidate ball still covers after the drift
    # since record time (r_ref - 2*max_disp). The kernel-weighted rate
    # estimate is unbiased for any enumeration radius, so a clamped
    # step costs variance, not bias — and no global rebuild trigger is
    # needed (the old min-slack margin forced a rebuild every 2-3 steps
    # at flagship scale). h out-growing the pad is handled the same way.
    d = tree.pos_s - cands.pos_ref
    md = jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))
    slack = jnp.maximum(cands.r_ref - 2.0 * md, 0.0)
    hs = jnp.minimum(hs, slack)

    ngc = int(rcfg.gated_frac * n)
    ngc = max(4096, -(-ngc // 4096) * 4096)
    ntail = int(rcfg.tail_cap) or int(rcfg.tail_frac * ngc)
    ntail = max(4096, -(-ntail // 4096) * 4096)
    kd = min(int(rcfg.k_dense), rcfg.k_cap)
    ptot_t, cnt_t, best_t, bj_t, ovf_g = _eval_gated(
        rows, cands.cand, cands.ncand, hs, dts, typs,
        jnp.asarray(salt, jnp.uint32), time, sigma_co, params, ngc,
        ntail, kd, float(box))

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    out = _tree_sidm_finish(
        p, pos_pred, tree.perm, inv, ptot_t, best_t, cnt_t, bj_t, time,
        active, scan, p_max, rand, vmax, key, params, params.log_events)
    viol = candidates_valid(cands, tree.pos_s, h_eff[tree.perm])
    p2, n_scat, ev = out
    if params.log_events:
        return p2, n_scat, ev, viol, ovf_g
    return p2, n_scat, viol, ovf_g


def h_eff_all(p, params: SidmParams):
    """Per-particle enumeration radius h_eff for ALL collisionless
    particles — the ungated twin of _tree_sidm_prep's gated radius
    (SCAT_KERNEL_FACTOR * hsml_vd, capped at 8x the median; the cap keeps
    outskirt particles from recording system-sized candidate balls)."""
    from ..constants import SCAT_KERNEL_FACTOR
    h_med = jnp.nanmedian(jnp.where(p.is_collisionless & p.valid,
                                    p.hsml_vd, jnp.nan))
    h_cap = jnp.nan_to_num(8.0 * h_med, nan=jnp.inf)
    return jnp.minimum(SCAT_KERNEL_FACTOR * p.hsml_vd,
                       jnp.maximum(h_cap, 1e-30))


def record_candidates_from_particles(p, pos_pred, tree: Octree, *,
                                     skin=0.0, params: SidmParams,
                                     cfg: Optional[FusedConfig] = None,
                                     rcfg: Optional[RangeListConfig] = None,
                                     box: float = 0.0) -> SidmCandidates:
    """Pack the SIDM rows (pos_pred, vel, mass, aux) and record candidate
    lists for the current tree topology."""
    dtype = pos_pred.dtype
    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    aux = (jnp.clip(p.ptype, 0, 7).astype(dtype)
           + 8.0 * has_pending.astype(dtype))
    rows = jnp.concatenate([
        pos_pred, p.vel, p.mass[:, None], aux[:, None]],
        axis=1)[tree.perm]
    h_all = jnp.where(p.is_collisionless & p.valid, h_eff_all(p, params),
                      0.0)[tree.perm]
    typ = jnp.where(p.is_collisionless & p.valid, p.ptype,
                    -9)[tree.perm].astype(jnp.int32)
    valid_sorted = (jnp.where(p.valid, p.mass, 0.0) > 0)[tree.perm]
    return record_candidates(tree, rows, h_all, typ, valid_sorted,
                             skin=skin, cfg=cfg, rcfg=rcfg, box=box)
