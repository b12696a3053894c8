"""Flat pair-queue Barnes-Hut gravity: the v3 TPU engine.

Replaces the blocked frontier engine (ops/fused_force.py) after measured
findings on v5e at N=1e6:

* the blocked walk's cost is dominated by the ~0.4 ms fixed overhead of
  every (level, block) ``lax.map``/``lax.while_loop`` invocation (512
  blocks x 13 levels x 2 passes ~ 5 s), not by pair work;
* ~85% of walk pairs are far-accepts, and compacting them into a 42M
  far list (cumsum+scatter emission) then re-gathering node rows and
  target rows for a separate eval pass costs MORE than the far math
  itself (~2.3 ms per 65k-pair chunk is the measured v5e floor for the
  monopole+quadrupole spline math, XLA and Pallas alike).

This v3 engine therefore evaluates the far field INSIDE the walk: each
chunk classifies its (node, group) pairs (geometric BH criterion
forcetree.c:967, or relative criterion forcetree.c:1254-1257 with BH
fallback plus the BMAX containment guard) and immediately runs the
masked monopole+quadrupole math (spline softening h=2.8 eps,
forcetree.c:834,1002-1060) on the rows it already gathered, accumulating
per-(group, target) partial sums. Only two small lists are emitted:

* leaf segments (16-particle ranges) into one cross-level unit-padded
  near list (~13% of pairs), and
* opened cells, expanded (contiguous, child-compacted children) into
  the next level's pair queue.

The queue is UNIT-ALIGNED by construction: the open expansion pads each
group's child run to a multiple of FAR_U=32, so every aligned 32-slot
unit of a chunk belongs to ONE group and the packed 256-float target row
is gathered once per unit, not once per pair.

The NEAR pass consumes the segment list against planar-by-16 packed
particle rows, two rows (32 lanes) per entry.

Non-periodic only (periodic Ewald runs use ops/treeforce.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .fused_force import (IMAX, FusedTree, default_depth, make_windows,
                          pack_tree)
from .tree import Octree, build_octree, level_offsets

# packed node row layout (see fused_force.pack_tree)
_COM = slice(0, 3)
_MASS = 3
_CNT = 4
_NSTART = 5
_CSTART = 6
_CCNT = 7
_QUAD = slice(8, 14)
_EPS = 14
_BMAX2 = 15


FAR_U = 32    # queue/eval unit: pairs sharing one packed target row
NEAR_U = 4    # near-list unit: 16-particle entries sharing one target row


class FlatConfig(NamedTuple):
    group_size: int = 64       # targets per Morton window
    start_level: int = 2
    leaf_cap: int = 16
    chunk: int = 65536         # walk pairs per chunk
    near_chunk: int = 32768    # near entries per chunk
    pair_cap: int = 1 << 23    # flat pair-queue capacity per level
    seg_cap_mult: int = 8      # near-list capacity = mult * n
    big_chunks: int = 8        # 16-particle chunks per overfull deepest cell
    break_level: int = 4       # Morton-window restart level
    # profiling/debug knobs (results are WRONG when a stage is skipped)
    skip_far: bool = False
    skip_near: bool = False
    skip_walk_emit: bool = False


def default_flat_config(n: int) -> FlatConfig:
    """Chunk/cap schedule by problem size: bench-scale runs use 65k-pair
    chunks; small runs shrink the static buffers (and compile time)."""
    if n > (1 << 18):
        return FlatConfig()
    return FlatConfig(chunk=8192, near_chunk=4096, pair_cap=1 << 20)


def pack_planar16(tree: Octree):
    """Planar-by-16 particle rows: [x0..15, y0..15, z0..15, m0..15,
    inv_eps0..15, pad48] per (N/16, 128) row. Field extraction in the
    near pass is then a contiguous lane slice (the interleaved 16-pack
    needs a (..,32,8) reshape whose 8-wide lanes cost ~2x the whole near
    pass); eps is stored as its reciprocal so the spline path runs
    divide-free."""
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
        plane(1.0 / jnp.maximum(tree.eps_s, 1e-30)),
        jnp.zeros((np16, 48), dtype)], axis=1)


def _spline_force_nodiv(r2, h_inv):
    """m-free softened force factor f with force = m*f*dx, computed from
    r^2 and 1/h only (no divides; forcetree.c:1775-1789 piecewise spline,
    Newtonian 1/r^3 outside). Returns (f, inv_r, newton_mask)."""
    inv_r = lax.rsqrt(jnp.maximum(r2, 1e-37))
    r = r2 * inv_r
    u = r * h_inv
    inv_r3 = inv_r * inv_r * inv_r
    u2 = u * u
    u3 = u2 * u
    h_inv3 = h_inv * h_inv * h_inv
    inner = 32.0 * (1.0 / 3.0 - 1.2 * u2 + u3) * h_inv3
    outer = (64.0 * (1.0 / 3.0 - 0.75 * u + 0.6 * u2 - u3 / 6.0)
             ) * h_inv3 - inv_r3 * (1.0 / 15.0)
    wf = jnp.where(u < 0.5, inner, outer)
    newton = u >= 1.0
    return jnp.where(newton, inv_r3, wf), inv_r, newton


def _spline_pot_nodiv(r2, h_inv, inv_r, newton):
    """m-free softened potential phi/m from r^2 and 1/h (no divides)."""
    r = r2 * inv_r
    u = r * h_inv
    u2 = u * u
    u3 = u2 * u
    wp_in = (16.0 / 3.0 * u2 - 9.6 * u2 * u2 + 6.4 * u2 * u3
             - 2.8) * h_inv
    wp_out = (inv_r * (1.0 / 15.0)
              + (32.0 / 3.0 * u2 - 16.0 * u3 + 9.6 * u2 * u2
                 - 32.0 / 15.0 * u2 * u3 - 3.2) * h_inv)
    wp = jnp.where(u < 0.5, wp_in, wp_out)
    return jnp.where(newton, -inv_r, wp)


def _queue_caps(cfg: FlatConfig, depth: int, ng: int, caps_node):
    """Static per-level pair-queue capacities."""
    CH = cfg.chunk
    l0 = cfg.start_level
    w0 = -(-min(8 ** l0, caps_node[l0]) // FAR_U) * FAR_U
    qcaps = {}
    q = ng * w0
    for l in range(l0, depth + 1):
        # unit padding adds < FAR_U per (group, level)
        q = min(q + ng * FAR_U, ng * caps_node[l] + ng * FAR_U,
                cfg.pair_cap)
        qcaps[l] = -(-q // CH) * CH
        q = qcaps[l] * 8
    return qcaps


def _emit2(bufA, bufB, n_buf, valsA, valsB, valid, cap, ovf, ovf_slot):
    """Compact (valsA, valsB)[valid] onto two parallel lists sharing one
    position cumsum. Buffers have cap+1 slots (last = dump)."""
    v = valid.reshape(-1)
    pos = jnp.cumsum(v.astype(jnp.int32)) - 1
    count = jnp.sum(v.astype(jnp.int32))
    dest = jnp.where(v, jnp.minimum(n_buf + pos, cap), cap)
    bufA = bufA.at[dest].set(jnp.where(v, valsA.reshape(-1), bufA[cap]))
    bufB = bufB.at[dest].set(jnp.where(v, valsB.reshape(-1), bufB[cap]))
    ovf = ovf.at[ovf_slot].add(jnp.maximum(n_buf + count - cap, 0))
    return bufA, bufB, jnp.minimum(n_buf + count, cap), ovf


def _emit_units(bufA, bufB, n_buf, valsA, gid, valid, U, ng, cap, ovf,
                ovf_slot):
    """UNIT-PADDED compaction: group runs of valid entries are padded to
    multiples of U so that every aligned U-slot 'unit' of the list belongs
    to ONE group (its gid readable from the unit's first, always-live,
    slot). Pads stay at the buffers' init values (dead ids / dump gid).

    The eval passes then gather ONE packed target row per unit instead of
    per element — measured 70x faster than per-pair windowed gathers.
    Inputs are group-major (the queue order), so each group's entries are
    consecutive; a group crossing a chunk boundary costs <= U-1 pads."""
    v = valid.reshape(-1)
    g = gid.reshape(-1)
    x = valsA.reshape(-1)
    gc = jnp.where(v, jnp.clip(g, 0, ng - 1), ng)
    pos = jnp.cumsum(v.astype(jnp.int32)) - 1
    big = jnp.int32(1 << 30)
    first = jax.ops.segment_min(jnp.where(v, pos, big), gc,
                                num_segments=ng + 1)
    cnt_g = jax.ops.segment_sum(v.astype(jnp.int32), gc,
                                num_segments=ng + 1)
    pad_g = -(-cnt_g // U) * U
    pad_g = pad_g.at[ng].set(0)
    off_g = jnp.cumsum(pad_g) - pad_g          # exclusive prefix
    total = jnp.sum(pad_g)
    idx = pos - first[gc]
    dest = jnp.where(v, jnp.minimum(n_buf + off_g[gc] + idx, cap), cap)
    bufA = bufA.at[dest].set(jnp.where(v, x, bufA[cap]))
    bufB = bufB.at[dest].set(jnp.where(v, jnp.clip(g, 0, ng - 1),
                                       bufB[cap]))
    ovf = ovf.at[ovf_slot].add(jnp.maximum(n_buf + total - cap, 0))
    return bufA, bufB, jnp.minimum(n_buf + total, cap), ovf


# ----------------------------------------------------------------------
# WALK + fused far eval
# ----------------------------------------------------------------------

def _classify(rows, geo, ids_ok, s_l, theta2, use_relative, leaf_cap):
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
    # containment guard: open any cell the nearest target could be inside
    # of — the reference's BMAX guard (forcetree.c:1254-1257), tighter
    # than the sqrt(3)*len bound since it uses the true com-to-corner
    # distance per node
    mac_open = mac_open | (r2b <= rows[:, _BMAX2])
    live = (cnt > 0) & ids_ok
    far = live & ~mac_open
    is_small = cnt <= leaf_cap
    seg = live & mac_open & is_small
    deep = live & mac_open & ~is_small
    return far, seg, deep, cnt


def _far_eval_chunk(rows, far, ug, trow, ng, need_pot):
    """Masked monopole+quadrupole on one walk chunk. rows (CH, 16), far
    mask (CH,), per-unit gids ug (CH/FAR_U,). Returns per-unit partial
    sums dacc (NU, G, 3) and dpot (NU, G)."""
    CH = rows.shape[0]
    NUF = CH // FAR_U
    G = 64
    tgt = trow[jnp.clip(ug, 0, ng - 1)]            # (NUF, 256)
    tr = jnp.repeat(tgt, FAR_U, axis=0)            # (CH, 256)
    tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                       tr[:, 3 * G:4 * G])         # tie = 1/eps_target
    m = jnp.where(far, rows[:, _MASS], 0.0)
    com = rows[:, _COM]
    d0 = com[:, 0:1] - tx
    d1 = com[:, 1:2] - ty
    d2 = com[:, 2:3] - tz
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    # h = 2.8*max(eps_t, eps_node): carried as reciprocals so the
    # spline path needs no divides (1/u^3 * h^-3 == inv_r^3). Node
    # rows store eps_max directly; its reciprocal is one (CH,) divide.
    eni = 1.0 / jnp.maximum(rows[:, _EPS], 1e-30)
    h_inv = jnp.minimum(tie, eni[:, None]) * (1.0 / 2.8)
    f, inv_r, newton = _spline_force_nodiv(r2, h_inv)
    fac = m[:, None] * f
    a0, a1, a2 = fac * d0, fac * d1, fac * d2

    # traceless quadrupole, Newtonian range only (forcetree.c:1002-1060);
    # the quad terms carry no mass factor, so mask via the ir zeroing
    q = rows[:, _QUAD]
    nl = newton & far[:, None]
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

    def ured(a):                                   # per-unit target sums
        return jnp.sum(a.reshape(NUF, FAR_U, G), axis=1)

    dacc = jnp.stack([ured(a0), ured(a1), ured(a2)], axis=-1)
    if need_pot:
        wp = _spline_pot_nodiv(r2, h_inv, inv_r, newton)
        dpot = ured(m[:, None] * wp - 0.5 * dqd * w5)
    else:
        dpot = jnp.zeros((NUF, G), rows.dtype)
    return dacc, dpot


def _walk_level(qN, qG, n_q, lists, tbl_l, trow, geom, nl_real, s_l,
                *, cfg, theta2, use_relative, last, ng, need_pot):
    """One level's walk: classify chunks, run the fused far eval on the
    accepted pairs in place, emit leaf segments (16-particle ranges,
    plus big-cell 16-chunks at the last level) and opened cells."""
    CH = cfg.chunk
    NUF = CH // FAR_U
    (acc, pot, n_far, segE, segG, n_seg, opC, opG, n_op, ovf) = lists
    seg_cap = segE.shape[0] - 1
    op_cap = opC.shape[0] - 1
    kmax = cfg.big_chunks if last else 1

    def body(state):
        (ci, acc, pot, n_far, segE, segG, n_seg, opC, opG, n_op,
         ovf) = state
        c0 = ci * CH
        ids = lax.dynamic_slice(qN, (c0,), (CH,))
        gid = lax.dynamic_slice(qG, (c0,), (CH,))
        slot_ok = (jnp.arange(CH, dtype=jnp.int32) + c0) < n_q
        ids_ok = (ids >= 0) & (ids < nl_real) & slot_ok
        rows = tbl_l[jnp.clip(ids, 0, tbl_l.shape[0] - 1)]
        rows = jnp.where(ids_ok[:, None], rows, 0.0)
        gidc = jnp.clip(gid, 0, ng - 1)
        geo = geom[gidc]
        far, seg, deep, cnt = _classify(rows, geo, ids_ok, s_l, theta2,
                                        use_relative, cfg.leaf_cap)
        n_far = n_far + jnp.sum(far.astype(jnp.int32))

        if not cfg.skip_far:
            # the queue is unit-aligned: slot 0 of each 32-slot unit is
            # live and all live slots of a unit share one group
            ug = gid.reshape(NUF, FAR_U)[:, 0]
            dacc, dpot = _far_eval_chunk(rows, far, ug, trow, ng,
                                         need_pot)
            useg = jnp.clip(ug, 0, ng - 1)         # dead units: m == 0
            acc = acc + jax.ops.segment_sum(dacc, useg,
                                            num_segments=ng)
            if need_pot:
                pot = pot + jax.ops.segment_sum(dpot, useg,
                                                num_segments=ng)

        if not cfg.skip_walk_emit:
            # seg-list emission (the open emission below always runs so
            # the queue advances even in profiling mode)
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
                opC, opG, n_op, cs * 16 + cc, gid, deep, op_cap,
                ovf, 0)
        return (ci + 1, acc, pot, n_far, segE, segG, n_seg, opC, opG,
                n_op, ovf)

    def cond(state):
        return state[0] * CH < n_q

    state = (jnp.int32(0), acc, pot, n_far, segE, segG, n_seg, opC,
             opG, n_op, ovf)
    state = lax.while_loop(cond, body, state)
    return state[1:]


def _expand_opens(opC, opG, n_op, cap_next, ng):
    """Opened cells -> next level's pair queue (children are contiguous
    child-compacted ranges at the next level). The emission is
    UNIT-PADDED by group so the next level's chunks stay unit-aligned
    (opC is group-major: the walk preserves queue order)."""
    O = opC.shape[0] - 1
    val = jnp.arange(O, dtype=jnp.int32) < n_op
    c = jnp.where(val, opC[:O], 0)
    cs = c >> 4
    cc = c & 15
    k8 = jnp.arange(8, dtype=jnp.int32)
    kid = cs[:, None] + k8[None, :]
    kvalid = val[:, None] & (k8[None, :] < cc[:, None])
    g8 = jnp.broadcast_to(opG[:O, None], (O, 8))

    qN = jnp.full(cap_next + 1, -1, jnp.int32)
    qG = jnp.full(cap_next + 1, ng, jnp.int32)
    ovf = jnp.zeros(1, jnp.int32)
    qN, qG, n_q, ovf = _emit_units(
        qN, qG, jnp.zeros((), jnp.int32), kid, g8, kvalid, FAR_U, ng,
        cap_next, ovf, 0)
    return qN, qG, n_q, ovf[0]


# ----------------------------------------------------------------------
# NEAR pass
# ----------------------------------------------------------------------

def _near_pass(acc, pot, segE, segG, n_seg, planar16, trow, cfg, ng,
               need_pot):
    """Flat near-field pass over the cross-level segment list. Entries are
    packed start*32+cnt (cnt<=16); two consecutive planar-by-16 rows cover
    any off+cnt<=31 window."""
    NC = cfg.near_chunk
    NUN = NC // NEAR_U
    G = 64
    n16 = planar16.shape[0]

    def body(state):
        ci, acc, pot = state
        c0 = ci * NC
        e = lax.dynamic_slice(segE, (c0,), (NC,))
        g = lax.dynamic_slice(segG, (c0,), (NC,))
        ug = g.reshape(NUN, NEAR_U)[:, 0]          # unit gid (live slot 0)
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

        yx, yy, yz, ym, yei = (field(0), field(1), field(2), field(3),
                               field(4))           # yei = 1/eps_particle
        slot = jnp.arange(32, dtype=jnp.int32)
        ok = (slot[None, :] >= off[:, None]) \
            & (slot[None, :] < (off + cnt)[:, None])
        ym = jnp.where(ok & live[:, None], ym, 0.0)

        tgt = trow[jnp.clip(ug, 0, ng - 1)]        # (NUN, 256)
        tr = jnp.repeat(tgt, NEAR_U, axis=0)       # (NC, 256)
        tx, ty, tz, tie = (tr[:, 0:G], tr[:, G:2 * G], tr[:, 2 * G:3 * G],
                           tr[:, 3 * G:4 * G])
        # (NC, G, 32): leaf particle minus target
        d0 = yx[:, None, :] - tx[:, :, None]
        d1 = yy[:, None, :] - ty[:, :, None]
        d2 = yz[:, None, :] - tz[:, :, None]
        r2 = d0 * d0 + d1 * d1 + d2 * d2
        h_inv = jnp.minimum(tie[:, :, None], yei[:, None, :]) * (1.0 / 2.8)
        f, inv_r, newton = _spline_force_nodiv(r2, h_inv)
        fac = ym[:, None, :] * f

        def ured(a):       # (NC, G) -> per-unit target sums (NUN, G)
            return jnp.sum(a.reshape(NUN, NEAR_U, G), axis=1)

        dacc = jnp.stack([ured(jnp.sum(fac * d0, -1)),
                          ured(jnp.sum(fac * d1, -1)),
                          ured(jnp.sum(fac * d2, -1))], axis=-1)
        useg = jnp.clip(ug, 0, ng - 1)             # dead entries: ym == 0
        acc = acc + jax.ops.segment_sum(dacc, useg, num_segments=ng)
        if need_pot:
            wp = _spline_pot_nodiv(r2, h_inv, inv_r, newton)
            dpot = ured(jnp.sum(ym[:, None, :] * wp, -1))
            pot = pot + jax.ops.segment_sum(dpot, useg, num_segments=ng)
        return ci + 1, acc, pot

    def cond(state):
        return state[0] * NC < n_seg

    _, acc, pot = lax.while_loop(cond, body, (jnp.int32(0), acc, pot))
    return acc, pot


# ----------------------------------------------------------------------
# driver
# ----------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("theta", "use_relative", "cfg", "depth", "n_real",
                          "ng", "need_pot"))
def _flat_eval(ftree: FusedTree, planar16, trow, geom, extent, drift,
               theta: float, use_relative: bool, cfg: FlatConfig,
               depth: int, n_real: int, ng: int, need_pot: bool):
    dtype = trow.dtype
    G = cfg.group_size
    assert G == 64, "trow packing assumes 64 targets/group"
    theta2 = theta * theta
    l0 = cfg.start_level

    caps_node = [min(8 ** l, n_real) for l in range(depth + 1)]
    qcaps = _queue_caps(cfg, depth, ng, caps_node)
    seg_cap = -(-cfg.seg_cap_mult * n_real // cfg.near_chunk) \
        * cfg.near_chunk

    acc = jnp.zeros((ng, G, 3), dtype)
    pot = jnp.zeros((ng, G), dtype)
    segE = jnp.full(seg_cap + 1, IMAX, jnp.int32)
    segG = jnp.full(seg_cap + 1, ng, jnp.int32)
    n_far = jnp.zeros((), jnp.int32)
    n_seg = jnp.zeros((), jnp.int32)
    # ovf slots: 0 = open/queue drops, 1 = seg drops, 2 = big drops,
    # 3 = spare
    ovf = jnp.zeros(4, jnp.int32)

    # initial queue: every start-level cell x every group, group-major;
    # per-group runs are padded to a FAR_U multiple (dead id -1) so the
    # queue starts unit-aligned even when the start level is small
    W0 = min(8 ** l0, caps_node[l0])
    W0p = -(-W0 // FAR_U) * FAR_U
    cap0 = qcaps[l0]
    qN = jnp.full(cap0 + 1, -1, jnp.int32)
    row0 = jnp.where(jnp.arange(W0p, dtype=jnp.int32) < W0,
                     jnp.arange(W0p, dtype=jnp.int32), -1)
    qN = qN.at[:ng * W0p].set(jnp.tile(row0, (ng,)))
    qG = jnp.full(cap0 + 1, ng, jnp.int32)
    qG = qG.at[:ng * W0p].set(
        jnp.repeat(jnp.arange(ng, dtype=jnp.int32), W0p))
    n_q = jnp.asarray(ng * W0p, jnp.int32)
    lvl_pairs = [n_q]

    # scan deeper uniform-shape levels in ONE body (compile-time control)
    l_scan = depth
    while (l_scan - 1 > l0
           and ftree.levels[l_scan - 1].shape
           == ftree.levels[depth - 1].shape
           and qcaps[l_scan - 1] == qcaps[depth - 1]
           and qcaps[l_scan] == qcaps[depth - 1]):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth

    def level_step(qN, qG, n_q, lists, tbl_l, nl_real, s_l, cap_next,
                   last):
        lists = _walk_level(
            qN, qG, n_q, lists, tbl_l, trow, geom, nl_real, s_l,
            cfg=cfg, theta2=theta2, use_relative=use_relative, last=last,
            ng=ng, need_pot=need_pot)
        (acc, pot, n_far, segE, segG, n_seg, opC, opG, n_op, ovf) = lists
        if not last:
            qN, qG, n_q, drop = _expand_opens(opC, opG, n_op, cap_next,
                                              ng)
            ovf = ovf.at[0].add(drop)
        return (qN, qG, n_q,
                (acc, pot, n_far, segE, segG, n_seg, opC, opG,
                 jnp.zeros((), jnp.int32), ovf))

    lvl_far = [n_far]
    for l in range(l0, min(l_scan, depth)):
        op_cap = qcaps[min(l + 1, depth)] // 8 + cfg.chunk
        opC = jnp.full(op_cap + 1, 0, jnp.int32)
        opG = jnp.full(op_cap + 1, ng, jnp.int32)
        lists = (acc, pot, n_far, segE, segG, n_seg, opC, opG,
                 jnp.zeros((), jnp.int32), ovf)
        qN, qG, n_q, lists = level_step(
            qN, qG, n_q, lists, ftree.levels[l], ftree.n_levels[l],
            jnp.asarray(extent / (1 << l) + 2.0 * drift, dtype),
            qcaps[min(l + 1, depth)], last=False)
        (acc, pot, n_far, segE, segG, n_seg, _, _, _, ovf) = lists
        lvl_pairs.append(n_q)
        lvl_far.append(n_far)

    if l_scan < depth:
        cap_s = max(ftree.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate(
                [t, jnp.zeros((cap_s - t.shape[0], 16), dtype)])
            if t.shape[0] < cap_s else t
            for t in (ftree.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l) + 2.0 * drift, dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(ftree.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])
        cap_next = qcaps[depth - 1]
        op_cap = cap_next // 8 + cfg.chunk

        def scan_body(carry, xs):
            (qN, qG, n_q, acc, pot, n_far, segE, segG, n_seg,
             ovf) = carry
            tbl_l, s_l, nl_real = xs
            opC = jnp.full(op_cap + 1, 0, jnp.int32)
            opG = jnp.full(op_cap + 1, ng, jnp.int32)
            lists = (acc, pot, n_far, segE, segG, n_seg, opC, opG,
                     jnp.zeros((), jnp.int32), ovf)
            qN, qG, n_q, lists = level_step(
                qN, qG, n_q, lists, tbl_l, nl_real, s_l, cap_next,
                last=False)
            (acc, pot, n_far, segE, segG, n_seg, _, _, _, ovf) = lists
            return ((qN, qG, n_q, acc, pot, n_far, segE, segG, n_seg,
                     ovf), n_q)

        carry = (qN, qG, n_q, acc, pot, n_far, segE, segG, n_seg, ovf)
        carry, nqs = lax.scan(scan_body, carry, (tbls, sls, nls))
        (qN, qG, n_q, acc, pot, n_far, segE, segG, n_seg, ovf) = carry
        lvl_pairs.append(jnp.max(nqs))

    # deepest level: no expansion, big cells chunked into the near list
    opC = jnp.zeros(1 + 1, jnp.int32)
    opG = jnp.full(1 + 1, ng, jnp.int32)
    lists = (acc, pot, n_far, segE, segG, n_seg, opC, opG,
             jnp.zeros((), jnp.int32), ovf)
    _, _, _, lists = level_step(
        qN, qG, n_q, lists, ftree.levels[depth], ftree.n_levels[depth],
        jnp.asarray(extent / (1 << depth) + 2.0 * drift, dtype), 1,
        last=True)
    (acc, pot, n_far, segE, segG, n_seg, _, _, _, ovf) = lists

    if not cfg.skip_near:
        acc, pot = _near_pass(acc, pot, segE, segG, n_seg, planar16,
                              trow, cfg, ng, need_pot)

    info = dict(ovf_open=ovf[0], ovf_seg=ovf[1], ovf_big=ovf[2],
                n_segs=n_seg, n_far=n_far,
                max_pairs=jnp.max(jnp.stack(lvl_pairs)),
                lvl_pairs=jnp.stack(lvl_pairs),
                lvl_far=jnp.stack(lvl_far))
    return acc, pot, info


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

    # packed target rows carry 1/eps (the far pass needs only reciprocals)
    trow = jnp.concatenate([gtargets[:, :, 0], gtargets[:, :, 1],
                            gtargets[:, :, 2],
                            1.0 / jnp.maximum(geps, 1e-30)],
                           axis=1)                     # (ngp, 256)
    geom = jnp.concatenate([glo, ghi, oac[:, None],
                            jnp.zeros((ngp, 1), dtype)], axis=1)

    acc_g, pot_g, info = _flat_eval(
        ftree, planar16, trow, geom, tree.extent, tree.drift, float(theta),
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
