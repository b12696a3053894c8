"""Cached interaction lists: walk once, evaluate every step.

The fused frontier engine (ops/fused_force.py) re-walks the octree every
force call; measured on v5e at N=1e6 the walk/classify phase costs 3.2 s
of the 6.3 s force while the actual pair math (far 0.6 s + near 2.6 s) is
what physics requires. But opening decisions change slowly: the reference
itself reuses a STALE tree for many steps (gravtree.c:63
TreeUpdateFrequency + MaxNodeMove node drift), and MD codes have reused
neighbour lists under a displacement "skin" since Verlet 1967.

This module splits the engine:

* ``record_lists`` — one walk over a freshly built tree that RECORDS the
  classification instead of evaluating it: per target group, the flat
  node ids accepted as multipoles ("far") and the particle segments of
  opened leaves ("near"). Group bboxes are inflated by a ``skin`` so the
  acceptances remain MAC-valid while no particle has moved more than
  skin/2 (target and node motion each shrink pair distances by at most
  the max displacement).
* ``eval_lists`` — the per-step force: gather node rows / particle packs
  straight off the recorded lists and run the SAME far/near tiles as the
  fused engine (_far_tile/_far_tile_pbc/_near_tile). No classification,
  no compaction, no per-level machinery — dense chunked gathers and pair
  math only.

Between rebuilds the tree topology is frozen; refresh_octree recomputes
exact node moments from current positions (so the multipoles the far tile
reads are CURRENT — only the acceptance geometry is stale, which the skin
covers). Validity is monitored by ``max_displacement`` against pos_ref.

Reference semantics preserved: force_treeevaluate's partition of mass
into accepted multipoles + opened leaf particles (forcetree.c:786-1377)
is exactly what the lists freeze; BMAX containment and the relative
criterion are applied at record time with the build-step old_acc, as the
reference does within a tree-update period.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fused_force import (IMAX, FusedConfig, FusedTree, _classify,
                          _expand_open, _far_tile, _far_tile_pbc,
                          _near_tile, _w_schedule, compact_plane,
                          make_windows, pack_part16, pack_tree, _CNT,
                          _CSTART, _CCNT, _NSTART, _PREC_MAP)
from .tree import Octree, level_offsets


class ListConfig(NamedTuple):
    # caps sized to the measured flagship demand (N=1e6 NFW, skin for a
    # 16-step cycle: far/grp 7020, near/grp 4421, used 231881) plus
    # ~15%; the append shift networks scale with the cap width, so
    # oversized caps tax every record. The auto-refit machinery grows
    # them from telemetry if a run demands more.
    far_cap: int = 8192       # per-group recorded far (node) entries
    near_cap: int = 5120      # per-group recorded near (segment) entries
    lvl_cap: int = 3072       # per-level recording width (pre-consolidation)
    used_cap: int = 294912    # distinct-node cap for the compact gather
                              # table (measured 243k used of 7.6M at
                              # N=1e6; XLA row-gather runs ~39M rows/s
                              # from the 467 MB flat table vs ~120M from
                              # a 32 MB one — see scripts/gatherbench.py)
    fc: int = 512             # far-eval chunk width (node slots)
    sc: int = 64              # near-eval chunk width (segment slots)
    far_block: int = 256      # groups per far-eval block
    near_block: int = 128     # groups per near-eval block
    sort_eval: bool = True    # order groups by list length per pass so
                              # per-block live bounds are tight (each pass
                              # has its own order; results are scattered
                              # back through pidx either way)
    materialize: bool = False # record the far NODE ROWS themselves in
                              # item-major order (sequential streaming at
                              # eval instead of 64-byte random gathers);
                              # drift-mode only (node COMs advance by the
                              # materialized vcom, moments stay frozen)
    mat_cap: int = 512        # max materialized far items; one item =
                              # (far_block, fc, 16) f32 = far_block*fc*64
                              # bytes (8.4 MB -> 4.3 GB at 512; the
                              # allocation also clamps to what the
                              # schedule can produce, so small runs stay
                              # small). Auto-resized from telemetry on
                              # overflow like the other caps; flagship
                              # N=1e6 demand is ~421 items.


class InteractionLists(NamedTuple):
    far: jax.Array        # (ngp, LF) int32 flat node ids, IMAX-padded
    near: jax.Array       # (ngp, LN) int32 segment keys start*32+cnt
    nf: jax.Array         # (ngp,) int32 live far count
    nn: jax.Array         # (ngp,) int32 live near count
    pidx: jax.Array       # (ngp, G) int32 sorted-order target index
    gvalid: jax.Array     # (ngp, G) bool
    pos_ref: jax.Array    # (n, 3) sorted positions at record time
    ovf: jax.Array        # (5,) int32: [level-cap, far_cap, near_cap,
                          #  used-cap, mat-item] drops
    skin: jax.Array       # () skin the record used
    vcom: jax.Array       # (M, 3) node mass-weighted mean velocity at
                          # record — the reference's node drift velocity
                          # (forcetree.c vs), used by advance_tree
    t_ref: jax.Array      # () simulation time at record
    src: jax.Array        # (used_cap,) int32 flat-node id per compact
                          # row; far entries are REMAPPED to compact ids
                          # (dead = used_cap -> the appended zero row)
    need: jax.Array       # (4,) int32 [max far entries/group, max near
                          # entries/group, distinct used nodes, far
                          # items] — uncapped demand, for auto-sizing
                          # the caps after an overflow
    matf: Optional[jax.Array] = None
                          # (mat_cap, far_block, fc, 16) f32 materialized
                          # far node rows in item-major schedule order
                          # (lcfg.materialize); slots 4:7 = node vcom


def flat_tables(ftree: FusedTree):
    """All-level node table (M,16) + trace (M,) for flat-id gathers."""
    tbl = jnp.concatenate(list(ftree.levels), axis=0)
    tr = jnp.concatenate(list(ftree.levels_tr), axis=0)
    return tbl, tr


def _append_plane(dst, n_dst, ovf, plane, cap_l):
    """Append each row's live prefix of ``plane`` (compacted, IMAX-padded)
    into dst at column offset n_dst via one masked scatter-free shift:
    pad plane to dst width, then per-row roll by n_dst using the binary
    shift network (log2 W passes)."""
    ng, W = plane.shape
    LD = dst.shape[1]
    n_live = jnp.sum((plane != IMAX).astype(jnp.int32), axis=1)
    take = jnp.minimum(n_live, cap_l)
    ovf = ovf + jnp.sum(n_live - take, dtype=jnp.int32)
    # right-shift the plane by n_dst (per row), into width LD
    x = jnp.concatenate(
        [plane, jnp.full((ng, LD - W), IMAX, jnp.int32)], axis=1) \
        if W < LD else plane[:, :LD]
    col = jax.lax.broadcasted_iota(jnp.int32, (ng, LD), 1)
    # mask out entries beyond the per-level cap BEFORE shifting; rows whose
    # list is already full drop everything (counted by the n_new clamp)
    x = jnp.where((col < take[:, None]) & (n_dst < LD)[:, None], x, IMAX)
    s = jnp.minimum(n_dst, LD - 1)
    k = 0
    while (1 << k) < LD:
        bit = 1 << k
        do = (s & bit) != 0
        pad = jnp.full((ng, bit), IMAX, jnp.int32)
        x_shift = jnp.concatenate([pad, x[:, :-bit]], axis=1)
        x = jnp.where(do[:, None], x_shift, x)
        k += 1
    dst = jnp.minimum(dst, x)
    n_new = jnp.minimum(n_dst + take, LD)
    ovf = ovf + jnp.sum((n_dst + take) - n_new, dtype=jnp.int32)
    return dst, n_new, ovf


def _walk_level_keys(fids, live_w, tbl, s_l, nl_real, glo_b, ghi_b, oac_b,
                     lvl_base, *, W, WC, last, theta2, use_relative,
                     cfg: FusedConfig, NB, GB, ng, pbc=None):
    """Gather + classify one level's frontier; emit key planes only.

    Returns (fark, segk, openk, bigk) each (ng, W): far keys are FLAT node
    ids (lvl_base + local id); seg keys are start*32+cnt particle
    segments; open keys are child_start*16+child_count; big keys are
    local node ids (last level only)."""

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    def block_body(args):
        fids_b, glob, ghib, oacb, live_b = args
        fark = jnp.full((GB, W), IMAX, jnp.int32)
        segk = jnp.full((GB, W), IMAX, jnp.int32)
        openk = jnp.full((GB, W), IMAX, jnp.int32)
        bigk = jnp.full((GB, W), IMAX, jnp.int32)

        def chunk(state):
            ci, fark, segk, openk, bigk = state
            c0 = ci * WC
            ids = lax.dynamic_slice(fids_b, (jnp.int32(0), c0), (GB, WC))
            dead = (ids < 0) | (ids >= nl_real)
            rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
            rows = jnp.where(dead[..., None], 0.0, rows)
            far, seg, opn, big = _classify(
                rows, glob, ghib, oacb, s_l, theta2, use_relative,
                cfg.leaf_cap, last, pbc)
            fk = jnp.where(far & ~dead, lvl_base + ids, IMAX)
            fark = lax.dynamic_update_slice(fark, fk, (jnp.int32(0), c0))
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
            return ci + 1, fark, segk, openk, bigk

        def cond(state):
            return state[0] * WC < jnp.minimum(live_b, W)

        _, fark, segk, openk, bigk = lax.while_loop(
            cond, chunk, (jnp.int32(0), fark, segk, openk, bigk))
        return fark, segk, openk, bigk

    outs = lax.map(block_body, (blk(fids), glo_b, ghi_b, oac_b, live_w))
    fark, segk, openk, bigk = (o.reshape(ng, W) for o in outs)
    return fark, segk, openk, bigk


@partial(jax.jit, static_argnames=("theta", "use_relative", "cfg", "lcfg",
                                   "depth", "n_real", "pbc"))
def _record(ftree: FusedTree, glo, ghi, oac, extent, drift,
            theta: float, use_relative: bool, cfg: FusedConfig,
            lcfg: ListConfig, depth: int, n_real: int, pbc=None):
    """The recording walk: same level schedule as fused_force._fused_eval,
    but every level's far/seg key planes are compacted and appended into
    consolidated per-group lists instead of being evaluated."""
    ng = glo.shape[0]
    GB = min(cfg.group_block, ng)
    while ng % GB:
        GB -= 1
    NB = ng // GB
    theta2 = theta * theta

    ws = _w_schedule(cfg, depth, n_real, theta, use_relative)
    l0 = cfg.start_level
    W0 = ws[l0]
    offs = level_offsets(n_real, depth)

    LF, LN = lcfg.far_cap, lcfg.near_cap
    far = jnp.full((ng, LF), IMAX, jnp.int32)
    near = jnp.full((ng, LN), IMAX, jnp.int32)
    nf = jnp.zeros(ng, jnp.int32)
    nn = jnp.zeros(ng, jnp.int32)
    needf = jnp.zeros(ng, jnp.int32)   # uncapped per-group demand
    needn = jnp.zeros(ng, jnp.int32)
    ovf_l = jnp.zeros((), jnp.int32)
    ovf_f = jnp.zeros((), jnp.int32)
    ovf_n = jnp.zeros((), jnp.int32)
    ovf_open = jnp.zeros(2, jnp.int32)

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    glo_b, ghi_b, oac_b = blk(glo), blk(ghi), blk(oac)

    fids = jnp.tile(jnp.arange(W0, dtype=jnp.int32)[None, :], (ng, 1))
    live_w = jnp.full((NB,), W0, jnp.int32)

    # the same single-scan-body grouping of uniform-width deep levels as
    # _fused_eval (compile time: the unrolled form is minutes at depth 13)
    l_scan = depth
    while (l_scan - 1 >= l0
           and ws[l_scan - 1] == ws[depth - 1]
           and (l_scan - 1 == depth - 1 or ws[l_scan] == ws[depth - 1])):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    def do_level(l, fids, live_w, far, nf, near, nn, needf, needn, ovf_l,
                 ovf_f, ovf_n, ovf_open, tbl=None, s_l=None, nl=None,
                 base=None):
        W = ws[min(l, depth)]
        fark, segk, openk, bigk = _walk_level_keys(
            fids, live_w, ftree.levels[l] if tbl is None else tbl,
            extent / (1 << l) + 2.0 * drift if s_l is None else s_l,
            ftree.n_levels[l] if nl is None else nl,
            glo_b, ghi_b, oac_b,
            jnp.int32(offs[l]) if base is None else base,
            W=W, WC=min(cfg.wc, W), last=(l >= depth), theta2=theta2,
            use_relative=use_relative, cfg=cfg, NB=NB, GB=GB, ng=ng,
            pbc=pbc)
        LC = min(lcfg.lvl_cap, W)
        farp = compact_plane(fark)[:, :LC]
        segp = compact_plane(segk)[:, :LC]
        nlive_f = jnp.sum((fark != IMAX).astype(jnp.int32), axis=1)
        nlive_n = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
        needf = needf + nlive_f
        needn = needn + nlive_n
        # level-cap drops beyond LC
        ovf_l = ovf_l + jnp.sum(jnp.maximum(nlive_f - LC, 0),
                                dtype=jnp.int32) \
            + jnp.sum(jnp.maximum(nlive_n - LC, 0), dtype=jnp.int32)
        far, nf, ovf_f = _append_plane(far, nf, ovf_f, farp, LC)
        near, nn, ovf_n = _append_plane(near, nn, ovf_n, segp, LC)
        return fark, segk, openk, bigk, far, nf, near, nn, needf, needn, \
            ovf_l, ovf_f, ovf_n

    for l in range(l0, min(l_scan, depth)):
        (_, _, openk, _, far, nf, near, nn, needf, needn, ovf_l, ovf_f,
         ovf_n) = do_level(l, fids, live_w, far, nf, near, nn, needf,
                           needn, ovf_l, ovf_f, ovf_n, ovf_open)
        fids, live_w, ovf_open, _ = _expand_open(
            openk, ovf_open, Wn=ws[l + 1], cfg=cfg, NB=NB, GB=GB, ng=ng)

    if l_scan < depth:
        W = ws[l_scan]
        cap_s = max(ftree.levels[l].shape[0] for l in range(l_scan, depth))
        dtype = ftree.levels[0].dtype
        tbls = jnp.stack([
            jnp.concatenate([t, jnp.zeros((cap_s - t.shape[0], 16), dtype)])
            if t.shape[0] < cap_s else t
            for t in (ftree.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l) + 2.0 * drift,
                                     dtype) for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(ftree.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])
        bases = jnp.stack([jnp.int32(offs[l])
                           for l in range(l_scan, depth)])

        def scan_body(carry, xs):
            (fids, live_w, far, nf, near, nn, needf, needn, ovf_l, ovf_f,
             ovf_n, ovf_open) = carry
            tbl, s_l, nl, base = xs
            (_, _, openk, _, far, nf, near, nn, needf, needn, ovf_l,
             ovf_f, ovf_n) = do_level(
                l_scan, fids, live_w, far, nf, near, nn, needf, needn,
                ovf_l, ovf_f, ovf_n, ovf_open, tbl=tbl, s_l=s_l, nl=nl,
                base=base)
            fids, live_w, ovf_open, _ = _expand_open(
                openk, ovf_open, Wn=W, cfg=cfg, NB=NB, GB=GB, ng=ng)
            return (fids, live_w, far, nf, near, nn, needf, needn, ovf_l,
                    ovf_f, ovf_n, ovf_open), None

        carry = (fids, live_w, far, nf, near, nn, needf, needn, ovf_l,
                 ovf_f, ovf_n, ovf_open)
        carry, _ = lax.scan(scan_body, carry, (tbls, sls, nls, bases))
        (fids, live_w, far, nf, near, nn, needf, needn, ovf_l, ovf_f,
         ovf_n, ovf_open) = carry

    # last level: far/seg keys plus overfull-cell expansion into 16-chunks
    W = ws[depth]
    tbl = ftree.levels[depth]
    (fark, segk, openk, bigk, far, nf, near, nn, needf, needn, ovf_l,
     ovf_f, ovf_n) = do_level(depth, fids, live_w, far, nf, near, nn,
                              needf, needn, ovf_l, ovf_f, ovf_n, ovf_open)
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
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    needn = (needn + jnp.sum((bkey != IMAX).astype(jnp.int32), axis=1)
             + jnp.maximum(n_big - cfg.big_cap, 0) * cfg.big_chunks)
    near, nn, ovf_n = _append_plane(near, nn, ovf_n, bkey, bkey.shape[1])
    ovf_l = ovf_l + jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0),
                            dtype=jnp.int32) \
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32) + ovf_open[0]

    ovf = jnp.stack([ovf_l, ovf_f, ovf_n])
    need = jnp.stack([jnp.max(needf), jnp.max(needn)])
    return far, near, nf, nn, ovf, need


def record_lists(tree: Octree, old_acc_sorted, valid_sorted, *,
                 theta=0.5, use_relative=True, err_tol_force_acc=0.005,
                 cfg: Optional[FusedConfig] = None,
                 lcfg: Optional[ListConfig] = None,
                 skin=0.0, pbc=None, vel=None,
                 t_now=0.0) -> InteractionLists:
    """Build interaction lists for every target group of ``tree``.

    old_acc_sorted: |a_old| in SORTED order (relative criterion input);
    valid_sorted: particle validity in sorted order. The group windows are
    the same deterministic Morton windows the fused engine uses, so a
    list-eval reproduces a fused-eval's pair partition exactly when
    skin=0 and the tree is fresh."""
    cfg = cfg or FusedConfig()
    lcfg = lcfg or ListConfig()
    n = tree.pos_s.shape[0]
    depth = tree.depth
    dtype = tree.pos_s.dtype

    ftree = pack_tree(tree)
    G = cfg.group_size
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid_sorted, n, G, depth, cfg.break_level,
        cfg.group_block, cfg.sort_groups)

    gtargets = tree.pos_s[pidx]
    toac = (old_acc_sorted * err_tol_force_acc).astype(dtype)
    goac = jnp.where(gvalid, toac[pidx], 0.0)

    big = jnp.asarray(1e30, dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    skin = jnp.asarray(skin, dtype)
    glo = glo - skin
    ghi = ghi + skin
    if pbc is None or pbc[0] <= 0:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    else:
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, dtype))
    oac = jnp.min(jnp.where(gvalid & (goac > 0), goac, big), axis=1)
    oac = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac, 0.0)

    far, near, nf, nn, ovf, need = _record(
        ftree, glo, ghi, oac, tree.extent, tree.drift, float(theta),
        bool(use_relative), cfg, lcfg, depth, int(n),
        tuple(float(v) for v in pbc) if pbc is not None else None)

    # used-rows compaction: the eval then gathers from a small hot table
    # instead of the full flat node table (39M vs ~120M rows/s, see
    # gatherbench); dead entries point at an appended zero row, which
    # also removes the per-chunk mass-zeroing copy.
    M = level_offsets(n, depth)[-1]
    U = lcfg.used_cap
    ids_all = jnp.where(far == IMAX, M, far).reshape(-1)
    used = jnp.zeros(M + 1, bool).at[ids_all].set(True)[:M]
    rank = jnp.cumsum(used.astype(jnp.int32)) - 1
    n_used = rank[-1] + 1
    far_c = jnp.where(far == IMAX, U,
                      jnp.minimum(rank[jnp.clip(far, 0, M - 1)], U))
    dest = jnp.where(used & (rank < U), rank, U)
    src = jnp.zeros(U + 1, jnp.int32).at[dest].set(
        jnp.arange(M, dtype=jnp.int32))[:U]
    ovf = jnp.concatenate(
        [ovf, jnp.maximum(n_used - U, 0)[None].astype(jnp.int32)])

    if vel is not None:
        vcom = node_velocities(tree, vel)
    else:
        vcom = jnp.zeros_like(tree.mac_rows[:, 0:3])
    need = jnp.concatenate([need, n_used[None].astype(jnp.int32)])

    matf = None
    ni_f = jnp.zeros((), jnp.int32)
    if lcfg.materialize:
        # stream-materialize the far node rows in item-major schedule
        # order (sequential reads at every eval of this record period)
        tbl_all, _ = flat_tables(ftree)
        ctbl = jnp.concatenate(
            [tbl_all[src], jnp.zeros((1, 16), tbl_all.dtype)])
        ctbl = ctbl.at[:-1, 4:7].set(vcom[src]).at[:, 7].set(0.0)
        of, _, bi_f, ci_f, ni_f, GBf, NBf_s = _far_schedule(
            nf, lcfg, ngp, lcfg.far_cap)
        far_s = far_c[of]
        FC = lcfg.fc
        # never allocate beyond what the schedule can produce (small-N
        # runs would otherwise pay the flagship-sized buffer)
        cap_i = min(lcfg.mat_cap, NBf_s * (lcfg.far_cap // FC + 1))

        def mat_item(state):
            i, mat = state
            g0 = bi_f[i] * GBf
            ids = lax.dynamic_slice(far_s, (g0, ci_f[i] * FC), (GBf, FC))
            rows = ctbl[ids]
            # (GBf, FC, 16) -> (GBf, FC//8, 128): 8 node rows per
            # 128-lane row, so the stored buffer tiles (8, 128) with no
            # lane padding (a 16-wide minor dim pads 8x in HBM)
            mat = lax.dynamic_update_slice(
                mat, rows.reshape(GBf, FC // 8, 128)[None],
                (jnp.minimum(i, cap_i - 1), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0)))
            return i + 1, mat

        mat0 = jnp.zeros((cap_i, GBf, FC // 8, 128), dtype)
        _, matf = lax.while_loop(
            lambda s: s[0] < jnp.minimum(ni_f, cap_i), mat_item,
            (jnp.int32(0), mat0))
    ovf = jnp.concatenate(
        [ovf, jnp.maximum(ni_f - lcfg.mat_cap, 0)[None]
         .astype(jnp.int32)])
    need = jnp.concatenate([need, ni_f[None].astype(jnp.int32)])
    return InteractionLists(far=far_c, near=near, nf=nf, nn=nn, pidx=pidx,
                            gvalid=gvalid, pos_ref=tree.pos_s, ovf=ovf,
                            skin=skin, vcom=vcom,
                            t_ref=jnp.asarray(t_now, dtype), src=src,
                            need=need, matf=matf)


def max_displacement(lists: InteractionLists, pos_sorted):
    """Max |pos - pos_ref| since record time (validity: <= skin/2)."""
    d = pos_sorted - lists.pos_ref
    return jnp.sqrt(jnp.max(jnp.sum(d * d, axis=-1)))


def node_velocities(tree: Octree, vel):
    """(M, 3) mass-weighted mean node velocity — the reference's node
    drift velocity (forcetree.c ``vs``), computed once per rebuild from
    the sorted particle ranges via the blocked range-sum structure."""
    from .tree import block_prefix, range_sum
    mv = vel[tree.perm] * tree.mass_s[:, None]
    bp = block_prefix(mv)
    s = range_sum(bp, tree.node_start, tree.node_start + tree.node_count)
    m = jnp.maximum(tree.mac_rows[:, 3], 1e-30)
    return s / m[:, None]


def advance_tree(tree: Octree, lists: InteractionLists, pos_pred, t_now):
    """Cheap per-step tree update between rebuilds (replaces the full
    moments refresh on the list path): current sorted positions for
    targets and the near-field pack, node COMs drifted by vs*(t-t_ref)
    exactly as the reference predicts nodes during a tree-update period
    (forcetree.c:941-948 s + vs*dt). Quadrupoles/eps/bmax stay at their
    rebuild values, as in the reference."""
    import dataclasses
    dt = (t_now - lists.t_ref).astype(tree.pos_s.dtype)
    mac = tree.mac_rows
    mac = mac.at[:, 0:3].add(lists.vcom * dt)
    pos_s = pos_pred[tree.perm].astype(tree.pos_s.dtype)
    return dataclasses.replace(tree, pos_s=pos_s, mac_rows=mac)


def _item_schedule(counts_blocked, chunk, cap):
    """Flatten live (block, chunk) pairs into one item list.

    counts_blocked: (NB, GB) live counts; chunk: slot width. Returns
    (item_bi (cap,), item_ci (cap,), n_items ()) — the classic flattened
    work queue, so ONE while_loop covers all blocks with zero dead
    iterations (a map-of-while pays its sequencing overhead per block
    whether or not the block has work; measured 2.4 s vs a 0.65 s
    gather+math floor on the N=1e6 far pass)."""
    nb = counts_blocked.shape[0]
    mf = jnp.max(counts_blocked, axis=1)
    nch = (mf + chunk - 1) // chunk
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(nch.astype(jnp.int32))])
    total = offs[-1]
    i = jnp.arange(cap, dtype=jnp.int32)
    bi = jnp.searchsorted(offs, i, side="right").astype(jnp.int32) - 1
    bi = jnp.clip(bi, 0, nb - 1)
    ci = i - offs[bi]
    return bi, ci, jnp.minimum(total, cap)


def _far_schedule(nf, lcfg: ListConfig, ng, far_width):
    """Deterministic far-pass work schedule shared by the eval and the
    materializer: length-sorted group order + flattened (block, chunk)
    items. Must be identical in both (the materialized stream is laid
    out item-major in exactly this order)."""
    FC = lcfg.fc
    gb = min(lcfg.far_block, ng)
    while ng % gb:
        gb -= 1
    NBf = ng // gb
    if lcfg.sort_eval:
        of = jnp.argsort(-nf)
    else:
        of = jnp.arange(ng, dtype=jnp.int32)
    inv_f = jnp.zeros(ng, jnp.int32).at[of].set(
        jnp.arange(ng, dtype=jnp.int32))
    bi, ci, ni = _item_schedule(nf[of].reshape(NBf, gb), FC,
                                NBf * (far_width // FC + 1))
    return of, inv_f, bi, ci, ni, gb, NBf


@partial(jax.jit, static_argnames=("cfg", "lcfg", "need_pot", "pbc"))
def _eval(tbl_flat, tr_flat, part16, far, near, nf, nn, gtargets, geps,
          gvalid, cfg: FusedConfig, lcfg: ListConfig,
          need_pot: bool = True, pbc=None, matf=None, t_rel=None):
    """Per-step force from recorded lists: dense chunked far + near.

    Each pass runs over its OWN length-sorted group order (sort_eval) so
    per-block live bounds are tight, and processes its flattened live
    (block, chunk) items under ONE while_loop."""
    ng, G, _ = gtargets.shape
    dtype = gtargets.dtype
    FC = lcfg.fc

    big = jnp.asarray(1e30, dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    gc = 0.5 * (glo + ghi)
    any_v = jnp.any(gvalid, axis=1)
    gc = jnp.where(any_v[:, None], gc, 0.0)
    xc = jnp.where(gvalid[..., None], gtargets - gc[:, None, :], 0.0)
    te = jnp.where(gvalid, geps, 1.0)

    def block_div(pref):
        gb = min(pref, ng)
        while ng % gb:
            gb -= 1
        return gb, ng // gb

    def order(counts):
        if lcfg.sort_eval:
            o = jnp.argsort(-counts)
        else:
            o = jnp.arange(ng, dtype=jnp.int32)
        inv = jnp.zeros(ng, jnp.int32).at[o].set(
            jnp.arange(ng, dtype=jnp.int32))
        return o, inv

    # ---- far pass
    of, inv_f, bi_f, ci_f, ni_f, GBf, NBf = _far_schedule(
        nf, lcfg, ng, far.shape[1])
    far_s = far[of]
    xc_s, te_s, xr_s, gc_s = xc[of], te[of], gtargets[of], gc[of]

    def far_item(state):
        i, acc, pot = state
        bi, ci = bi_f[i], ci_f[i]
        g0 = bi * GBf
        if matf is not None:
            # MATERIALIZED stream: item-major node rows recorded once per
            # rebuild (sequential HBM reads instead of 64-byte random
            # gathers — measured 35-125M rows/s gather vs full-bandwidth
            # streaming). Slots 4:7 carry the node drift velocity: the
            # forcetree.c:941-948 node prediction s + vs*dt applied
            # in-tile.
            rows = lax.dynamic_slice(
                matf, (i, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                (1, GBf, FC // 8, 128))[0].reshape(GBf, FC, 16)
            rows = rows.at[..., 0:3].add(rows[..., 4:7] * t_rel)
        else:
            ids = lax.dynamic_slice(far_s, (g0, ci * FC), (GBf, FC))
            # ids are COMPACT-table ranks; dead entries point at the zero
            # row (mass 0 contributes nothing in every tile)
            rows = tbl_flat[ids]
        teb = lax.dynamic_slice(te_s, (g0, 0), (GBf, G))
        if pbc is not None:
            ids = lax.dynamic_slice(far_s, (g0, ci * FC), (GBf, FC))
            rows_p = tbl_flat[ids]
            trr = tr_flat[ids]
            xrb = lax.dynamic_slice(xr_s, (g0, 0, 0), (GBf, G, 3))
            da, dp = _far_tile_pbc(rows_p, trr, xrb, teb, pbc, need_pot)
        else:
            xcb = lax.dynamic_slice(xc_s, (g0, 0, 0), (GBf, G, 3))
            gcb = lax.dynamic_slice(gc_s, (g0, 0), (GBf, 3))
            da, dp = _far_tile(rows, xcb, teb, gcb,
                               _PREC_MAP[cfg.precision], need_pot)
        acc = lax.dynamic_update_slice(
            acc, lax.dynamic_slice(acc, (g0, 0, 0), (GBf, G, 3)) + da,
            (g0, 0, 0))
        pot = lax.dynamic_update_slice(
            pot, lax.dynamic_slice(pot, (g0, 0), (GBf, G)) + dp, (g0, 0))
        return i + 1, acc, pot

    acc0 = jnp.zeros((ng, G, 3), dtype)
    pot0 = jnp.zeros((ng, G), dtype)
    _, acc_f, pot_f = lax.while_loop(
        lambda s: s[0] < ni_f, far_item, (jnp.int32(0), acc0, pot0))
    acc = acc_f[inv_f]
    pot = pot_f[inv_f]

    # ---- near pass (flattened items over the consolidated plane)
    GBn, NBn = block_div(lcfg.near_block)
    SC = lcfg.sc
    on, inv_n = order(nn)
    near_s = near[on]
    xr_n, te_n = gtargets[on], te[on]
    bi_n, ci_n, ni_n = _item_schedule(nn[on].reshape(NBn, GBn), SC,
                                      NBn * (near.shape[1] // SC + 1))

    def near_item(state):
        i, acc, pot = state
        bi, ci = bi_n[i], ci_n[i]
        g0 = bi * GBn
        ent = lax.dynamic_slice(near_s, (g0, ci * SC), (GBn, SC))
        xrb = lax.dynamic_slice(xr_n, (g0, 0, 0), (GBn, G, 3))
        teb = lax.dynamic_slice(te_n, (g0, 0), (GBn, G))
        da, dp = _near_tile(ent, part16, xrb, teb, need_pot, pbc)
        acc = lax.dynamic_update_slice(
            acc, lax.dynamic_slice(acc, (g0, 0, 0), (GBn, G, 3)) + da,
            (g0, 0, 0))
        pot = lax.dynamic_update_slice(
            pot, lax.dynamic_slice(pot, (g0, 0), (GBn, G)) + dp, (g0, 0))
        return i + 1, acc, pot

    _, acc_n, pot_n = lax.while_loop(
        lambda s: s[0] < ni_n, near_item,
        (jnp.int32(0), jnp.zeros((ng, G, 3), dtype),
         jnp.zeros((ng, G), dtype)))
    return acc + acc_n[inv_n], pot + pot_n[inv_n]


def eval_lists(tree: Octree, lists: InteractionLists, mass, eps, *,
               cfg: Optional[FusedConfig] = None,
               lcfg: Optional[ListConfig] = None,
               need_pot: bool = True, pbc=None, t_now=None):
    """Force/potential for all particles from recorded lists against the
    CURRENT tree moments (tree = refresh_octree(...) of the recording
    topology). mass/eps in ORIGINAL order; returns (acc, pot) in original
    order, with the same postprocessing as fused_gravity_tree.

    When ``lists.matf`` is set (lcfg.materialize, drift mode) the far
    pass streams the recorded node rows and predicts node COMs by
    vcom*(t_now - t_ref) in-tile — pass ``t_now``."""
    cfg = cfg or FusedConfig()
    lcfg = lcfg or ListConfig()
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    valid = mass > 0

    use_mat = (lists.matf is not None and pbc is None)
    if use_mat:
        # materialized far stream: the per-step node-table repack and the
        # compact gather table are not needed — only the 16-packed
        # particle rows for the near pass
        part16 = pack_part16(tree)
        ctbl = jnp.zeros((1, 16), dtype)
        ctr = jnp.zeros(1, dtype)
        t_rel = (jnp.asarray(t_now, dtype) - lists.t_ref
                 if t_now is not None else jnp.zeros((), dtype))
    else:
        ftree = pack_tree(tree)
        tbl_all, tr_all = flat_tables(ftree)
        part16 = ftree.part16
        # per-step compact gather table: used rows + one zero row
        ctbl = jnp.concatenate(
            [tbl_all[lists.src], jnp.zeros((1, 16), tbl_all.dtype)])
        ctr = jnp.concatenate(
            [tr_all[lists.src], jnp.zeros(1, tr_all.dtype)])
        t_rel = jnp.zeros((), dtype)

    pidx, gvalid = lists.pidx, lists.gvalid
    gtargets = tree.pos_s[pidx]
    geps = tree.eps_s[pidx]

    acc_g, pot_g = _eval(
        ctbl, ctr, part16, lists.far, lists.near, lists.nf,
        lists.nn, gtargets, geps, gvalid, cfg, lcfg, bool(need_pot),
        tuple(float(v) for v in pbc) if pbc is not None else None,
        matf=lists.matf if use_mat else None, t_rel=t_rel)

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
    return acc, pot
