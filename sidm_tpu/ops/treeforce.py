"""Barnes-Hut gravity: global level-synchronous traversal + flat-pair
multipole evaluation.

TPU-native counterpart of the per-target recursive walk
(``force_treeevaluate`` / ``_single_BH`` / ``_single``,
nbody/forcetree.c:786-1377), designed around TPU memory behavior (random
gathers move 512-byte sublanes; sorts and dense vector math are cheap;
per-element scatters and fixed per-group caps are not):

* Morton-adjacent targets form groups; the opening criterion is evaluated
  once per (group, node) pair against the group's bounding box
  (conservative, so per-target forces are exact for the emitted lists).
* The traversal frontier is ONE global array of (group, node) pairs across
  all groups. Each level: gather packed 32-byte MAC rows, classify into
  {open, accept, leaf-segment, dead}, partition with a single stable argsort
  per level, append accepted/segment pairs to flat interaction buffers with
  ``dynamic_update_slice`` (no scatter), and expand open pairs' children
  into the next frontier. Buffer sizes adapt to the *actual* total work, not
  per-group worst cases.
* Evaluation is over the flat pair lists in fixed chunks: each (group,node)
  row interacts with all group targets ((rows, G) dense vector math), with
  monopole + traceless quadrupole (forcetree.c:1002-1060) and spline
  softening h = 2.8*max(eps_target, eps_node) (forcetree.c:834,1914-1917);
  per-group accumulation by indexed add of whole (G,3) rows.

Opening criteria — both of the reference's:
* geometric BH (TypeOfOpeningCriterion 0): open if len^2 > theta^2 r^2
  (forcetree.c:967);
* relative (1): open if m*len^4 > |a_old|*ErrTolForceAcc*r^6
  (forcetree.c:1254-1257) using the group's min |a_old| (conservative);
  falls back to BH when a_old is unavailable (first force call).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import softened_inv_r3, softened_potential
from .morton import morton_keys
from .tree import Octree, build_octree


class WalkConfig(NamedTuple):
    group_size: int = 64         # targets per traversal group
    frontier_factor: int = 12    # global frontier cap = factor * n_targets
    pair_factor: int = 48        # node-pair buffer cap = factor * n_targets
    seg_factor: int = 16         # segment buffer cap = factor * n_targets
    leaf_cap: int = 16           # open cells down to <= this many particles
    seg_gather: int = 16         # particle slots per segment row (>= leaf_cap)
    big_cell_cap: int = 8192     # distinct overfull deepest-level cells
    final_chunks: int = 64       # chunks each overfull deepest cell may span
    node_chunk: int = 65536      # pair rows per eval step
    seg_chunk: int = 4096        # segment rows per eval step
    start_level: int = 2


def _min_image(d, box):
    if box is None:
        return d
    return d - box * jnp.round(d / box)


def _bbox_dist2(lo, hi, c, box):
    if box is not None:
        mid = 0.5 * (lo + hi)
        c = mid + _min_image(c - mid, box)
    dx = jnp.maximum(jnp.maximum(lo - c, c - hi), 0.0)
    return jnp.sum(dx * dx, axis=-1)


def _pack3(category, F):
    """Stable partition by category (0,1,2,3) via one argsort.

    Returns (perm, n0, n01, n012): perm orders category-0 entries first (in
    original order), then 1, then 2; counts give region boundaries."""
    idx = jnp.arange(F, dtype=jnp.int32)
    key = category.astype(jnp.int32) * F + idx
    perm = jnp.argsort(key)
    n0 = jnp.sum((category == 0).astype(jnp.int32))
    n1 = jnp.sum((category == 1).astype(jnp.int32))
    n2 = jnp.sum((category == 2).astype(jnp.int32))
    return perm, n0, n0 + n1, n0 + n1 + n2


def _append(buf_list, cnt, arrs, count_new, cap):
    """Append ``count_new`` leading entries of each arr (len F) to buffers at
    offset cnt via dynamic_update_slice. Buffers have F slack beyond cap."""
    out = []
    w = jnp.minimum(cnt, cap)
    for buf, a in zip(buf_list, arrs):
        out.append(lax.dynamic_update_slice_in_dim(buf, a, w, axis=0))
    overflow = jnp.maximum(cnt + count_new - cap, 0) - jnp.maximum(cnt - cap, 0)
    return out, cnt + count_new, overflow


def global_walk(tree: Octree, group_lo, group_hi, group_oac, cfg: WalkConfig,
                theta, use_relative, box, n_ref=None, n_groups=None):
    """Traverse for all groups at once.

    ``n_ref`` sets the interaction-buffer scale (defaults to
    ngroups*group_size; pass the true particle count when the group axis is
    a padded static cap). ``n_groups`` masks dead group slots.

    Returns flat (group, node) pair buffers for multipole interactions and
    flat (group, start, count) segment buffers for near-field particle
    interactions, plus counts and an overflow tally."""
    ngroups = group_lo.shape[0]
    depth = tree.depth
    l0 = cfg.start_level
    cap0 = min(8 ** l0, tree.pos_s.shape[0])
    if n_ref is None:
        n_ref = ngroups * cfg.group_size
    # interaction counts grow ~theta^-3; scale the static buffers so tight
    # opening angles don't overflow them
    tscale = max(1.0, (0.5 / max(theta, 1e-3)) ** 3) if not use_relative \
        else 1.0
    F = max(1 << 14, int(cfg.frontier_factor * n_ref * tscale),
            ngroups * cap0)
    F = -(-F // 8) * 8
    P_cap = int(cfg.pair_factor * n_ref * tscale)
    S_cap = int(cfg.seg_factor * n_ref * tscale)
    dtype = tree.pos_s.dtype

    # initial frontier: every group x every real node at the start level
    fg = jnp.repeat(jnp.arange(ngroups, dtype=jnp.int32), cap0,
                    total_repeat_length=ngroups * cap0)
    fn = jnp.tile(tree.level_offsets[l0]
                  + jnp.arange(cap0, dtype=jnp.int32), ngroups)
    pad = F - ngroups * cap0
    if pad < 0:
        raise ValueError("frontier cap too small for the start level")
    fg = jnp.concatenate([fg, jnp.zeros(pad, jnp.int32)])
    fn = jnp.concatenate([fn, jnp.zeros(pad, jnp.int32)])
    fcnt = jnp.int32(ngroups * cap0)
    # mask out start-level nodes beyond the real count per group, and any
    # dead group slots beyond n_groups
    slot = jnp.tile(jnp.arange(cap0, dtype=jnp.int32), ngroups)
    slot = jnp.concatenate([slot, jnp.full(pad, 1 << 30, jnp.int32)])
    alive0 = slot < tree.n_nodes[l0]
    if n_groups is not None:
        alive0 = alive0 & (fg < n_groups)

    pair_g = jnp.zeros(P_cap + F, jnp.int32)
    pair_n = jnp.zeros(P_cap + F, jnp.int32)
    pcnt = jnp.int32(0)
    seg_g = jnp.zeros(S_cap + F, jnp.int32)
    seg_s = jnp.zeros(S_cap + F, jnp.int32)
    seg_c = jnp.zeros(S_cap + F, jnp.int32)
    scnt = jnp.int32(0)
    big_g = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    big_s = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    big_c = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    bcnt = jnp.int32(0)
    overflow = jnp.int32(0)

    theta2 = theta * theta
    alive = alive0

    for l in range(l0, depth + 1):
        rows = tree.mac_rows[fn]                     # (F,8)
        com = rows[:, 0:3]
        mass = rows[:, 3]
        ctr = rows[:, 4:7]
        cnt = rows[:, 7]
        s_l = tree.extent / (1 << l)

        glo = group_lo[fg]
        ghi = group_hi[fg]
        r2 = _bbox_dist2(glo, ghi, com, box)
        geo_open = s_l * s_l > theta2 * r2
        if use_relative:
            oac = group_oac[fg]
            rel_open = mass * s_l**4 > oac * r2 * r2 * r2
            mac_open = jnp.where(oac > 0, rel_open, geo_open)
        else:
            mac_open = geo_open
        c2 = _bbox_dist2(glo - 0.5 * s_l, ghi + 0.5 * s_l, ctr, box)
        mac_open = mac_open | (c2 <= 0.0)

        live = alive & (jnp.arange(F) < fcnt) & (cnt > 0)
        is_small = cnt <= cfg.leaf_cap
        # categories: 0 = open further, 1 = accept multipole, 2 = to segment
        to_open = live & mac_open & (~is_small) & (l < depth)
        acc = live & (~mac_open)
        seg = live & mac_open & (is_small | (l == depth))
        category = jnp.where(to_open, 0, jnp.where(acc, 1,
                             jnp.where(seg, 2, 3)))
        perm, n_open, n_oa, n_oas = _pack3(category, F)
        fg_p = fg[perm]
        fn_p = fn[perm]
        # zero-padded copies so a dynamic_slice starting anywhere in [0, F]
        # is never clamped back (dynamic_slice clamps start to fit)
        zpad = jnp.zeros(F, jnp.int32)
        fg_pp = jnp.concatenate([fg_p, zpad])
        fn_pp = jnp.concatenate([fn_p, zpad])

        # accepted pairs: region [n_open, n_oa)
        accg = lax.dynamic_slice_in_dim(fg_pp, n_open, F)
        accn = lax.dynamic_slice_in_dim(fn_pp, n_open, F)
        (pair_g, pair_n), pcnt, ov = _append(
            [pair_g, pair_n], pcnt, [accg, accn], n_oa - n_open, P_cap)
        overflow += ov

        # segment pairs: region [n_oa, n_oas)
        sgg = lax.dynamic_slice_in_dim(fg_pp, n_oa, F)
        sgn = lax.dynamic_slice_in_dim(fn_pp, n_oa, F)
        sg_start = tree.node_start[sgn]
        sg_cnt_full = tree.node_count[sgn]
        n_seg = n_oas - n_oa
        in_seg = jnp.arange(F) < n_seg
        if l < depth:
            (seg_g, seg_s, seg_c), scnt, ov = _append(
                [seg_g, seg_s, seg_c], scnt,
                [sgg, sg_start, jnp.minimum(sg_cnt_full, cfg.seg_gather)],
                n_seg, S_cap)
            overflow += ov
        else:
            # deepest level: small cells go to the segment list; overfull
            # cells go to the (short) big-cell list and are chunked below
            small = in_seg & (sg_cnt_full <= cfg.seg_gather)
            perm2, n_sm, n_smb, _ = _pack3(
                jnp.where(small, 0, jnp.where(in_seg, 1, 2)), F)
            sgg2 = jnp.concatenate([sgg[perm2], zpad])
            sgn2 = sgn[perm2]
            st2 = jnp.concatenate([sg_start[perm2], zpad])
            cf2 = jnp.concatenate([sg_cnt_full[perm2], zpad])
            (seg_g, seg_s, seg_c), scnt, ov = _append(
                [seg_g, seg_s, seg_c], scnt,
                [sgg2[:F], st2[:F], jnp.minimum(cf2[:F], cfg.seg_gather)],
                n_sm, S_cap)
            overflow += ov
            bigg = lax.dynamic_slice_in_dim(sgg2, n_sm, F)
            bigs = lax.dynamic_slice_in_dim(st2, n_sm, F)
            bigc = lax.dynamic_slice_in_dim(cf2, n_sm, F)
            (big_g, big_s, big_c), bcnt, ov = _append(
                [big_g, big_s, big_c], bcnt, [bigg, bigs, bigc],
                n_smb - n_sm, cfg.big_cell_cap)
            overflow += ov

        if l == depth:
            break

        # expand open region [0, min(n_open, F/8)) into children WITHOUT a
        # second pack: the next frontier is (F/8, 8) masked slots — the dead
        # ones are skipped by the next level's single pack
        O = F // 8
        og = fg_p[:O]
        on = fn_p[:O]
        open_ok = jnp.arange(O) < n_open
        overflow += jnp.maximum(n_open - O, 0)
        cs = tree.child_start[on]
        cc = tree.child_count[on]
        k = jnp.arange(8, dtype=jnp.int32)
        fn = (cs[:, None] + k[None, :]).reshape(-1)               # (F,)
        fg = jnp.repeat(og, 8, total_repeat_length=F)
        alive = ((k[None, :] < cc[:, None])
                 & open_ok[:, None]).reshape(-1)
        fcnt = jnp.int32(F)

    # expand overfull deepest cells into seg_gather-sized chunks
    C = cfg.seg_gather
    K = cfg.final_chunks
    B = cfg.big_cell_cap
    kk = jnp.arange(K, dtype=jnp.int32)
    ch_start = (big_s[:B, None] + kk[None, :] * C).reshape(-1)
    ch_cnt = jnp.clip(big_c[:B, None] - kk[None, :] * C, 0, C).reshape(-1)
    ch_g = jnp.repeat(big_g[:B], K, total_repeat_length=B * K)
    ok = (ch_cnt > 0) & (jnp.repeat(jnp.arange(B), K,
                                    total_repeat_length=B * K) < bcnt)
    perm4, n_ch, _, _ = _pack3(jnp.where(ok, 0, 3), B * K)
    # big-cell chunk lists are usually short; append the leading F entries
    take = min(F, B * K)
    (seg_g, seg_s, seg_c), scnt, ov = _append(
        [seg_g, seg_s, seg_c], scnt,
        [ch_g[perm4][:take], ch_start[perm4][:take], ch_cnt[perm4][:take]],
        jnp.minimum(n_ch, take), S_cap)
    overflow += ov + jnp.maximum(n_ch - take, 0)
    overflow += jnp.sum(jnp.where(jnp.arange(B) < bcnt,
                                  jnp.maximum(big_c[:B] - K * C, 0), 0))

    return (pair_g[:P_cap], pair_n[:P_cap], jnp.minimum(pcnt, P_cap),
            seg_g[:S_cap], seg_s[:S_cap], seg_c[:S_cap],
            jnp.minimum(scnt, S_cap), overflow)


def _quad_accel(qrow, d, inv_r5, inv_r7):
    """Quadrupole contribution; d = com - x, Q packed in qrow[:, 0:6]."""
    qd = jnp.stack([
        qrow[..., 0] * d[..., 0] + qrow[..., 3] * d[..., 1]
        + qrow[..., 4] * d[..., 2],
        qrow[..., 3] * d[..., 0] + qrow[..., 1] * d[..., 1]
        + qrow[..., 5] * d[..., 2],
        qrow[..., 4] * d[..., 0] + qrow[..., 5] * d[..., 1]
        + qrow[..., 2] * d[..., 2],
    ], axis=-1)
    dqd = jnp.sum(qd * d, axis=-1)
    acc = -qd * inv_r5[..., None] + 2.5 * (dqd * inv_r7)[..., None] * d
    pot = -0.5 * dqd * inv_r5
    return acc, pot


def eval_flat(tree: Octree, gtargets, geps, walk_out, cfg: WalkConfig,
              box, ewald=None):
    """Evaluate the flat interaction lists.

    gtargets: (ngroups, G, 3); geps: (ngroups, G). Returns per-target
    (ngroups, G, 3) accel and (ngroups, G) potential."""
    (pair_g, pair_n, pcnt, seg_g, seg_s, seg_c, scnt, _) = walk_out
    ngroups, G, _ = gtargets.shape
    dtype = gtargets.dtype

    acc = jnp.zeros((ngroups, G, 3), dtype)
    pot = jnp.zeros((ngroups, G), dtype)

    # Sort interaction lists by group (junk rows keyed to the overflow
    # segment `ngroups`): per-chunk accumulation then becomes a SORTED
    # segment-sum — a streaming reduction — instead of a scatter-add, which
    # XLA serializes per index on TPU.
    pkey = jnp.where(jnp.arange(pair_g.shape[0]) < pcnt, pair_g, ngroups)
    porder = jnp.argsort(pkey)
    pair_g = pkey[porder]
    pair_n = pair_n[porder]
    skey = jnp.where(jnp.arange(seg_g.shape[0]) < scnt, seg_g, ngroups)
    sorder = jnp.argsort(skey)
    seg_g = skey[sorder]
    seg_s = seg_s[sorder]
    seg_c = seg_c[sorder]

    # ---- multipole pairs ----
    R = min(cfg.node_chunk, pair_g.shape[0])
    nch = -(-pair_g.shape[0] // R)

    def node_chunk(carry, i):
        acc, pot = carry
        fg = lax.dynamic_slice_in_dim(pair_g, i * R, R)
        fn = lax.dynamic_slice_in_dim(pair_n, i * R, R)
        live = fg < ngroups
        fgc = jnp.minimum(fg, ngroups - 1)
        mrow = tree.mac_rows[fn]
        qrow = tree.quad_rows[fn]
        tg = gtargets[fgc]                             # (R,G,3)
        te = geps[fgc]                                 # (R,G)
        com = mrow[:, 0:3]
        m = jnp.where(live, mrow[:, 3], 0.0)
        d = com[:, None, :] - tg
        d = _min_image(d, box)
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        h = 2.8 * jnp.maximum(te, qrow[:, 6][:, None])
        fac = softened_inv_r3(r, h) * m[:, None]
        a = fac[..., None] * d
        p = softened_potential(r, h) * m[:, None]
        r_safe = jnp.maximum(r, 1e-30)
        newton = (r >= h) & live[:, None]
        inv_r5 = jnp.where(newton, 1.0 / r_safe**5, 0.0)
        inv_r7 = jnp.where(newton, 1.0 / r_safe**7, 0.0)
        qa, qp = _quad_accel(qrow[:, None, :], d, inv_r5, inv_r7)
        a = a + qa
        p = p + qp
        if ewald is not None:
            a = a + m[:, None, None] * ewald.force_correction(d)
            p = p + m[:, None] * ewald.pot_correction(d)
        acc = acc + jax.ops.segment_sum(
            a, fg, num_segments=ngroups + 1,
            indices_are_sorted=True)[:ngroups]
        pot = pot + jax.ops.segment_sum(
            p, fg, num_segments=ngroups + 1,
            indices_are_sorted=True)[:ngroups]
        return (acc, pot), None

    def node_cond(st):
        return st[0] * R < pcnt

    def node_body(st):
        i, acc, pot = st
        (acc, pot), _ = node_chunk((acc, pot), i)
        return i + 1, acc, pot

    _, acc, pot = lax.while_loop(node_cond, node_body,
                                 (jnp.int32(0), acc, pot))

    # ---- particle segments ----
    Rs = min(cfg.seg_chunk, seg_g.shape[0])
    C = cfg.seg_gather
    nchs = -(-seg_g.shape[0] // Rs)

    def seg_chunk(carry, i):
        acc, pot = carry
        fg = lax.dynamic_slice_in_dim(seg_g, i * Rs, Rs)
        st = lax.dynamic_slice_in_dim(seg_s, i * Rs, Rs)
        ct = lax.dynamic_slice_in_dim(seg_c, i * Rs, Rs)
        live = fg < ngroups
        fgc = jnp.minimum(fg, ngroups - 1)
        slot = jnp.arange(C, dtype=jnp.int32)
        pidx = jnp.clip(st[:, None] + slot[None, :], 0,
                        tree.pos_s.shape[0] - 1)       # (Rs,C) contiguous
        prow = tree.part_rows[pidx]                    # (Rs,C,8)
        pm = jnp.where(live[:, None] & (slot[None, :] < ct[:, None]),
                       prow[..., 3], 0.0).reshape(-1)  # (Rs*C,)
        # flatten segment slots into particle-pair rows: one dense pass with
        # one group-sorted reduction (a fori over slots pays per-slot launch
        # and reduction overheads C times)
        RC = Rs * C
        pp = prow[..., 0:3].reshape(RC, 3)
        pe = prow[..., 4].reshape(RC)
        fgx = jnp.repeat(fg, C, total_repeat_length=RC)
        fgcx = jnp.repeat(fgc, C, total_repeat_length=RC)
        tg = gtargets[fgcx]                            # (RC,G,3)
        te = geps[fgcx]
        d = pp[:, None, :] - tg
        d = _min_image(d, box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        h = 2.8 * jnp.maximum(te, pe[:, None])
        fac = softened_inv_r3(r, h) * pm[:, None]
        a = fac[..., None] * d
        p = softened_potential(r, h) * pm[:, None]
        if ewald is not None:
            a = a + pm[:, None, None] * ewald.force_correction(d)
            p = p + pm[:, None] * ewald.pot_correction(d)
        acc = acc + jax.ops.segment_sum(
            a, fgx, num_segments=ngroups + 1,
            indices_are_sorted=True)[:ngroups]
        pot = pot + jax.ops.segment_sum(
            p, fgx, num_segments=ngroups + 1,
            indices_are_sorted=True)[:ngroups]
        return (acc, pot), None

    def seg_cond(st):
        return st[0] * Rs < scnt

    def seg_body(st):
        i, acc, pot = st
        (acc, pot), _ = seg_chunk((acc, pot), i)
        return i + 1, acc, pot

    _, acc, pot = lax.while_loop(seg_cond, seg_body,
                                 (jnp.int32(0), acc, pot))
    return acc, pot


def gather_groups(tree: Octree, grp_start, grp_cnt, n_groups, *arrays,
                  fills=None):
    """Gather per-target arrays into (Gcap, G, ...) group layout.

    Returns (slots_index (Gcap,G), slot_valid (Gcap,G), gathered arrays)."""
    Gcap = grp_start.shape[0]
    slot = jnp.arange(GROUP_SIZE, dtype=jnp.int32)
    gvalid = (slot[None, :] < grp_cnt[:, None]) \
        & (jnp.arange(Gcap)[:, None] < n_groups)
    idx = jnp.clip(grp_start[:, None] + slot[None, :], 0,
                   tree.pos_s.shape[0] - 1)
    outs = []
    fills = fills or [0.0] * len(arrays)
    for a, f in zip(arrays, fills):
        g = a[idx]
        g = jnp.where(gvalid.reshape(gvalid.shape + (1,) * (g.ndim - 2)),
                      g, f)
        outs.append(g)
    return idx, gvalid, outs


GROUP_SIZE = 64


def eval_targets(tree: Octree, tpos, teps, toac, tvalid, *, box=None,
                 theta=0.5, use_relative=True,
                 config: Optional[WalkConfig] = None, ewald=None,
                 presorted: bool = False):
    """Force/potential for an arbitrary target set against ``tree``.

    ``presorted`` targets (== tree.pos_s) reshape directly into fixed
    Morton-order windows: for force, every target group is evaluated against
    the cells its bbox opens, so full 64-slot occupancy beats the tighter
    bboxes of tree-cell groups (measured 17.6s vs 40.6s per 1e6-particle
    force pass; the SIDM range scan makes the opposite trade — see
    sidm_tree._group_geometry). Arbitrary target sets are Morton-sorted
    first. Results return in input order."""
    cfg = config or WalkConfig()
    nt = tpos.shape[0]
    G = cfg.group_size

    if presorted:
        ng = -(-nt // G)
        npad = ng * G

        def padp(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((npad - nt,) + x.shape[1:], fill, x.dtype)])

        gtargets = padp(tpos).reshape(ng, G, 3)
        geps = padp(teps, 1.0).reshape(ng, G)
        goac = padp(toac).reshape(ng, G)
        gvalid = jnp.concatenate([tvalid, jnp.zeros(npad - nt, bool)]
                                 ).reshape(ng, G)
        n_groups = jnp.int32(ng)
    else:
        keys = morton_keys(tpos, tree.origin, tree.extent, tree.depth)
        keys = jnp.where(tvalid, keys, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keys)
        spos, seps = tpos[order], teps[order]
        soac, svalid = toac[order], tvalid[order]
        ng = -(-nt // G)
        npad = ng * G

        def padn(x, fill=0.0):
            return jnp.concatenate(
                [x, jnp.full((npad - nt,) + x.shape[1:], fill, x.dtype)])

        gtargets = padn(spos).reshape(ng, G, 3)
        geps = padn(seps, 1.0).reshape(ng, G)
        goac = padn(soac).reshape(ng, G)
        gvalid = jnp.concatenate([svalid, jnp.zeros(npad - nt, bool)]
                                 ).reshape(ng, G)
        n_groups = jnp.int32(ng)

    big = jnp.asarray(1e30, tpos.dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    glo = jnp.where(any_v[:, None], glo, 0.0)
    ghi = jnp.where(any_v[:, None], ghi, 0.0)
    oac_min = jnp.min(jnp.where(gvalid, goac, big), axis=1)
    oac_min = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac_min, 0.0)

    walk_out = global_walk(tree, glo, ghi, oac_min, cfg, theta,
                           use_relative and True, box, n_ref=nt,
                           n_groups=n_groups)
    acc_g, pot_g = eval_flat(tree, gtargets, geps, walk_out, cfg, box,
                             ewald=ewald)

    if presorted:
        acc = acc_g.reshape(npad, 3)[:nt]
        pot = pot_g.reshape(npad)[:nt]
    else:
        acc = acc_g.reshape(npad, 3)[:nt]
        pot = pot_g.reshape(npad)[:nt]
        inv = jnp.zeros(nt, jnp.int32).at[order].set(
            jnp.arange(nt, dtype=jnp.int32))
        acc, pot = acc[inv], pot[inv]
    info = dict(dropped=walk_out[7], n_pairs=walk_out[2],
                n_segs=walk_out[6])
    return acc, pot, info


def tree_gravity(pos, mass, eps, old_acc, *, box=None, theta=0.5,
                 opening=1, err_tol_force_acc=0.005,
                 config: Optional[WalkConfig] = None, depth: int = 10,
                 ewald=None, return_info: bool = False):
    """Raw gravitational acceleration and potential (no G factor) for all
    particles. Replaces gravity_tree()'s bunch pipeline (gravtree.c:18-246)."""
    cfg = config or WalkConfig()
    n = pos.shape[0]
    valid = mass > 0
    tree = build_octree(pos, mass, eps, valid, box=box or 0.0, depth=depth)

    toac = (old_acc[tree.perm] * err_tol_force_acc).astype(pos.dtype)
    acc, pot, info = eval_targets(
        tree, tree.pos_s, tree.eps_s, toac, valid[tree.perm], box=box,
        theta=theta, use_relative=(opening == 1), config=cfg, ewald=ewald,
        presorted=True)

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    acc = acc[inv]
    pot = pot[inv]
    # remove spline self-potential (potential.c:136); the Ewald self term
    # enters via the d=0 segment lookup and stays, as in the reference walk
    pot = pot + mass / jnp.maximum(eps, 1e-30)
    pot = jnp.where(valid, pot, 0.0)
    acc = jnp.where(valid[:, None], acc, 0.0)
    if return_info:
        return acc, pot, info
    return acc, pot


@jax.jit
def make_groups(tree: Octree, G: int = 64):
    """Target groups = maximal tree cells with <= G particles.

    Fixed-size Morton windows make terrible groups in sparse regions (64
    consecutive Morton indices can span octants, giving bounding boxes as
    large as the system and interaction lists to match). Tree cells are
    spatially compact; descending only into cells with more than G particles
    makes every emitted cell maximal, and the emitted set partitions the
    Morton-sorted particle range. Overfull deepest-level cells are split
    into consecutive G-sized chunks.

    Returns (grp_start (Gcap,), grp_cnt (Gcap,), n_groups, overflow).
    """
    n = tree.pos_s.shape[0]
    Gcap = max(n // 8, 2048)
    depth = tree.depth
    offs = list(tree.level_offsets)
    F = max(Gcap, 4096)

    frontier = jnp.zeros(F, jnp.int32)
    frontier = frontier.at[0].set(offs[0])
    alive = jnp.zeros(F, bool).at[0].set(True)

    gs = jnp.zeros(Gcap + F, jnp.int32)
    gc = jnp.zeros(Gcap + F, jnp.int32)
    gcnt = jnp.int32(0)
    overflow = jnp.int32(0)

    K_FINAL = 64  # chunks for an overfull deepest cell (<= 4096 particles)
    for l in range(depth + 1):
        cnt = tree.node_count[frontier]
        start = tree.node_start[frontier]
        live = alive & (cnt > 0)
        emit = live & (cnt <= G)
        desc = live & (cnt > G) & (l < depth)
        big = live & (cnt > G) & (l == depth)

        perm, n_desc, n_de, n_deb = _pack3(
            jnp.where(desc, 0, jnp.where(emit, 1, jnp.where(big, 2, 3))), F)
        fr_p = frontier[perm]
        st_p = start[perm]
        ct_p = cnt[perm]
        zpad = jnp.zeros(F, jnp.int32)
        st_pp = jnp.concatenate([st_p, zpad])
        ct_pp = jnp.concatenate([ct_p, zpad])

        es = lax.dynamic_slice_in_dim(st_pp, n_desc, F)
        ec = lax.dynamic_slice_in_dim(ct_pp, n_desc, F)
        (gs, gc), gcnt, ov = _append([gs, gc], gcnt, [es, ec],
                                     n_de - n_desc, Gcap)
        overflow += ov

        if l == depth:
            # overfull deepest cells -> consecutive G-chunks
            bs = lax.dynamic_slice_in_dim(st_pp, n_de, F)
            bc = lax.dynamic_slice_in_dim(ct_pp, n_de, F)
            nbig = n_deb - n_de
            BK = min(F, 1 << 14)
            kk = jnp.arange(K_FINAL, dtype=jnp.int32)
            ch_s = (bs[:BK, None] + kk[None, :] * G).reshape(-1)
            ch_c = jnp.clip(bc[:BK, None] - kk[None, :] * G, 0, G).reshape(-1)
            ok = ((jnp.arange(BK)[:, None] < nbig).repeat(K_FINAL, 1)
                  .reshape(-1)) & (ch_c > 0)
            perm2, n0, _, _ = _pack3(jnp.where(ok, 0, 3), BK * K_FINAL)
            take = min(F, BK * K_FINAL)
            (gs, gc), gcnt, ov = _append(
                [gs, gc], gcnt,
                [ch_s[perm2][:take], ch_c[perm2][:take]],
                jnp.minimum(n0, take), Gcap)
            overflow += ov + jnp.maximum(n0 - take, 0)
            break

        O = F // 8
        on = fr_p[:O]
        ok_open = jnp.arange(O) < n_desc
        overflow += jnp.maximum(n_desc - O, 0)
        cs = tree.child_start[on]
        cc = tree.child_count[on]
        k = jnp.arange(8, dtype=jnp.int32)
        frontier = (cs[:, None] + k[None, :]).reshape(-1)
        alive = ((k[None, :] < cc[:, None]) & ok_open[:, None]).reshape(-1)

    return gs[:Gcap], gc[:Gcap], jnp.minimum(gcnt, Gcap), overflow
