"""Fused dense Barnes-Hut gravity: per-group frontier, eval-at-discovery.

TPU-native replacement for the flat-pair walk + chunked eval
(ops/treeforce.py), designed from measured v5e primitive rates:

* global argsort costs ~60 ms per million rows — the old walk's `_pack3`
  partitions and the eval's group sort dominated the step (11.5 s walk +
  2.9 s sort at N=1e6). Batched MINOR-AXIS sorts are ~70x cheaper, so all
  compaction here is per-group `jnp.sort(axis=1)` over packed int keys.
* random row gathers run ~400M rows/s from tables <~8 MB and ~150M rows/s
  from ~64 MB tables — so node data lives in PER-LEVEL packed tables
  (levels <= 6 are all in the fast zone) and is gathered once per frontier
  slot per level, serving BOTH the opening criterion and the force math.
* narrow trailing dims are lane-padded to 128 (f32[N,8] occupies 512 B/row),
  so node rows pack all 16 force fields in one gather row, and near-field
  particles pack 16-to-a-row in a (N/16, 128) table.

Structure (reference semantics: force_treeevaluate, forcetree.c:786-1377):

* Targets = fixed 64-wide Morton windows of the sorted particle array;
  opening criteria evaluated once per (group, node) against the group bbox
  (conservative; per-target forces exact for the accepted sets).
* The frontier is (ngroups, W_l) per-level LOCAL node ids. Each level:
  gather rows -> classify {open, far-accept, leaf-accept, dead} ->
  ACCEPTED MULTIPOLES ARE EVALUATED IMMEDIATELY (monopole + traceless
  quadrupole, spline softening h=2.8 eps, forcetree.c:834,1002-1060) using
  the just-gathered rows -> leaf segments are compacted by one axis-1 sort
  and their PARTICLES EVALUATED IN THE SAME LEVEL (so nothing is ever
  dropped) -> open slots are compacted by another axis-1 sort, expanded x8.
* Near-field entries are (start, count<=16) particle ranges read as two
  16-particle packed rows with an in-window mask. i==j self pairs cancel
  exactly in the sum-factorised accumulation.
* Pair math: far-field r^2 via the |x|^2+|y|^2-2x.y expansion on
  GROUP-CENTERED coordinates (cancellation ~eps*(bbox/r)^2 is safe there
  because the MAC keeps r >~ bbox); NEAR-field r^2 by exact component
  differencing (sparse Morton groups have bbox >> pair separation, where
  the expansion loses >1e-2). Force accumulation stays MXU-shaped
  (64,W)x(W,3) contractions at Precision.HIGHEST — TPU default bf16
  truncation breaks both the cancellation and the 1e-3 oracle bar.

Both opening criteria are supported: geometric BH (len^2 > theta^2 r^2,
forcetree.c:967) and relative (m len^4 > |a_old| ErrTolForceAcc r^6,
forcetree.c:1254-1257) with BH fallback when a_old is unavailable.

Periodic (Ewald) runs stay on the legacy engine: minimum-image breaks the
r^2 expansion and table lookups the gather budget; see treeforce.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import softened_inv_r3, softened_potential
from .tree import Octree, build_octree, level_offsets

IMAX = jnp.int32(2147483647)

# TPU MXU default-precision truncates einsum inputs to bf16; the r^2
# |x|^2+|y|^2-2x.y expansion then cancels catastrophically for near pairs
# (measured p99 error 13 on v5e vs 4e-4 on CPU). HIGHEST (f32-exact 6-pass)
# costs nothing here: the engine is gather/HBM bound, not MXU bound.
_PREC = lax.Precision.HIGHEST


_PREC_MAP = {"highest": lax.Precision.HIGHEST, "high": lax.Precision.HIGH,
             "default": lax.Precision.DEFAULT}


def _einsum(spec, *ops, dtype, prec=_PREC):
    return jnp.einsum(spec, *ops, precision=prec,
                      preferred_element_type=dtype)


class FusedConfig(NamedTuple):
    group_size: int = 64
    start_level: int = 2
    leaf_cap: int = 16
    w_max: int = 6144          # frontier width cap per level
    open_cap: int = 1024       # opened cells kept per (group, level)
    big_cap: int = 8           # overfull deepest cells per group
    big_chunks: int = 8        # 16-particle chunks per overfull cell
    group_block: int = 32      # groups per eval block: small blocks keep
                               # per-block live-width bounds tight
                               # (measured 9.3/10.0/21.4 s per force at
                               # 32/64/256 on NFW 1e6)
    sort_groups: bool = True   # order groups by local density so blocks
                               # are cost-homogeneous
    wc: int = 128              # frontier columns per eval chunk
    sc: int = 16               # segment entries per near-field chunk
                               # (sc and wc must divide every frontier width
                               #  the schedule emits: powers of two <= wc)
    theta_scale: bool = True   # widen caps for small theta
    sort_compact: bool = False  # True: compact key planes with minor-
                               # axis sorts (the pre-compaction-network
                               # behavior) instead of compact_plane
    break_level: int = 4       # restart groups at this level's cell bounds
    # profiling/debug knobs (results are WRONG when a stage is skipped)
    skip_far: bool = False
    skip_near: bool = False
    precision: str = "highest"  # "highest" | "high" | "default" for einsums
    # work-queue engine (ops/wq_force.py) static item caps per level
    wq_cap: int = 131072       # (group, WC-chunk) walk items
    wq_near_cap: int = 131072  # (group, SC-chunk) near items
    wq_block: int = 8192       # walk items per eval super-block (bounds
                               # the (B, G, WC) intermediates to ~256 MB)
    wq_near_block: int = 4096  # near items per super-block ((B, G, 512))
    wq_pallas: bool = False    # classify+far as the Pallas item kernel
                               # (ops/pallas_far.py); non-periodic only


class FusedTree(NamedTuple):
    levels: tuple          # per level (cap_l, 16) f32 packed node rows
    part16: jax.Array      # (ceil(N/16), 128) packed particles (16 x 8 f32)
    n_levels: tuple        # per level () int32 real node count
    levels_tr: tuple       # per level (cap_l,) raw quadrupole trace tr(Q~)
                           # (only read by the TreePM screened far tile)


# packed node row layout
_COM = slice(0, 3)
_MASS = 3
_CNT = 4
_NSTART = 5
_CSTART = 6
_CCNT = 7
_QUAD = slice(8, 14)
_EPS = 14


def compact_plane(keys, live=None):
    """Stable left-compaction of the non-IMAX entries of each row.

    Replaces ``jnp.sort(keys, axis=1)`` where only COMPACTION is needed
    (the engine's key planes are emitted in frontier order, which is
    already ascending node order): a minor-axis sort is a bitonic
    network of O(log^2 W) full-plane passes, while compaction needs only
    the classic prefix-sum shift network — one cumsum plus log2(W)
    masked-shift passes (LSB-first binary decomposition of each
    element's left-shift distance). Collision-free because compaction
    destinations are strictly monotone over live elements: a resident
    that still has to move owns a remaining shift >= 2^(k+1), which
    would exceed the incoming element's 2^k and violate monotonicity.

    Returns the compacted plane (tail filled with IMAX).
    """
    ng, W = keys.shape
    if live is None:
        live = keys != IMAX
    x = jnp.where(live, keys, IMAX)
    # left-shift distance = dead entries strictly before i (= inclusive
    # dead-count at i for live i); parked at 0 for dead entries
    s = jnp.where(live, jnp.cumsum((~live).astype(jnp.int32), axis=1), 0)
    k = 0
    while (1 << k) < W:
        bit = 1 << k
        pad = jnp.full((ng, bit), IMAX, x.dtype)
        x_r = jnp.concatenate([x[:, bit:], pad], axis=1)
        s_r = jnp.concatenate([s[:, bit:], jnp.zeros((ng, bit),
                                                     s.dtype)], axis=1)
        inc = (x_r != IMAX) & ((s_r & bit) != 0)
        out = (x != IMAX) & ((s & bit) != 0)
        x = jnp.where(inc, x_r, jnp.where(out, IMAX, x))
        s = jnp.where(inc, s_r - bit, jnp.where(out, 0, s))
        k += 1
    return x


def pack_tree(tree: Octree) -> FusedTree:
    """Per-level 16-wide node rows + 16-particle packed rows.

    All integer fields are stored as exact f32 (requires N <= 2^24 per
    shard and node counts <= 2^24, asserted by the caller)."""
    n = tree.pos_s.shape[0]
    depth = tree.depth
    offs = level_offsets(n, depth)
    dtype = tree.pos_s.dtype

    levels = []
    for l in range(depth + 1):
        sl = slice(offs[l], offs[l + 1])
        mac = tree.mac_rows[sl]
        quad = tree.quad_rows[sl]
        child_local = tree.child_start[sl] - (offs[l + 1] if l < depth else 0)
        # bmax^2: max distance from the COM to any point of the cell,
        # bounded by |com - center| + (sqrt(3)/2) len — the reference's
        # BMAX guard for the relative criterion (forcetree.c:1254-1257).
        # tree.drift (nonzero on a refreshed frozen topology) inflates the
        # bound: particles may sit outside their nominal cell by the
        # accumulated displacement (forcetree.c MaxNodeMove analog).
        s_col = quad[:, 7:8]                         # cell size
        bmax = (jnp.linalg.norm(mac[:, 0:3] - mac[:, 4:7], axis=1,
                                keepdims=True)
                + 0.8660255 * s_col + tree.drift)
        row = jnp.concatenate([
            mac[:, 0:3],                                 # com
            mac[:, 3:4],                                 # mass
            mac[:, 7:8],                                 # count
            tree.node_start[sl, None].astype(dtype),
            jnp.maximum(child_local, 0)[:, None].astype(dtype),
            tree.child_count[sl, None].astype(dtype),
            quad[:, 0:6],                                # quadrupole
            quad[:, 6:7],                                # eps_max
            bmax * bmax,
        ], axis=1)
        levels.append(row)

    # PLANAR-by-16 particle rows [x0..15, y0..15, z0..15, m0..15,
    # eps0..15, pad48]: field extraction in the near tile is then a
    # contiguous lane slice — the interleaved 16x8 pack needs a
    # (..,32,8) reshape whose 8-wide lanes cost ~2x the whole near pass
    # (measured on v5e; see flat_force.pack_planar16)
    np16 = -(-n // 16)

    def plane(v, fill=0.0):
        if np16 * 16 != n:
            v = jnp.concatenate([v, jnp.full(np16 * 16 - n, fill, dtype)])
        return v.reshape(np16, 16)

    part16 = pack_part16(tree)
    levels_tr = tuple(tree.trq[offs[l]:offs[l + 1]]
                      for l in range(depth + 1))
    return FusedTree(levels=tuple(levels), part16=part16,
                     n_levels=tuple(tree.n_nodes), levels_tr=levels_tr)


def pack_part16(tree: Octree):
    """Just the PLANAR-by-16 particle rows of pack_tree (the near pass's
    only per-step table on the materialized list path)."""
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    np16 = -(-n // 16)

    def plane(v, fill=0.0):
        if np16 * 16 != n:
            v = jnp.concatenate([v, jnp.full(np16 * 16 - n, fill, dtype)])
        return v.reshape(np16, 16)

    return jnp.concatenate([
        plane(tree.pos_s[:, 0]), plane(tree.pos_s[:, 1]),
        plane(tree.pos_s[:, 2]), plane(tree.mass_s), plane(tree.eps_s),
        jnp.zeros((np16, 48), dtype)], axis=1)


def _w_schedule(cfg: FusedConfig, depth: int, n: int, theta: float,
                use_relative: bool):
    """Static frontier width caps per level."""
    wmax = cfg.w_max
    if cfg.theta_scale and not use_relative and theta < 0.5:
        wmax = min(int(wmax * min((0.5 / max(theta, 0.1)) ** 3, 8.0)), 8192)
    def round_w(w):
        # the eval chunk width must divide W (dynamic_slice would clamp and
        # re-read slots otherwise): round small widths to a power of two
        # that min(wc, W) divides, larger ones to a multiple of wc
        if w >= cfg.wc:
            return -(-w // cfg.wc) * cfg.wc
        p = 8
        while p < w:
            p *= 2
        return p

    ws = {}
    caps = [min(8 ** l, n) for l in range(depth + 1)]
    w = min(8 ** cfg.start_level, caps[cfg.start_level], wmax)
    for l in range(cfg.start_level, depth + 1):
        if l >= cfg.start_level + 2:
            # uniform width from here down so the level loop can run as
            # ONE lax.scan body (shapes must match across levels)
            w = wmax
        w = round_w(max(min(w, caps[l], wmax), 8))
        ws[l] = w
        w = w * 8
    return ws


def _far_tile(rows, xc, te, gc, prec=_PREC, need_pot=True):
    """Monopole + quadrupole of packed node rows against one group block.

    rows: (GB, WC, 16) with mass already zeroed on non-accepted slots;
    xc: (GB, G, 3) group-centered targets; te: (GB, G) target softenings;
    gc: (GB, 3) group centers. Returns (dacc (GB,G,3), dpot (GB,G))."""
    dtype = xc.dtype
    com = rows[..., _COM] - gc[:, None, :]               # (GB,WC,3) centered
    m = rows[..., _MASS]                                 # (GB,WC)
    epsn = rows[..., _EPS]
    q = rows[..., _QUAD]                                 # (GB,WC,6)

    ny2 = jnp.sum(com * com, axis=-1)                    # (GB,WC)
    nx2 = jnp.sum(xc * xc, axis=-1)                      # (GB,G)
    cross = _einsum("gtd,gwd->gtw", xc, com, dtype=dtype, prec=prec)     # (GB,G,WC)
    r2 = jnp.maximum(nx2[:, :, None] + ny2[:, None, :] - 2.0 * cross, 0.0)
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te[:, :, None], epsn[:, None, :])
    fac = m[:, None, :] * softened_inv_r3(r, h)          # (GB,G,WC)

    dacc = _einsum("gtw,gwd->gtd", fac, com, dtype=dtype, prec=prec)
    dacc = dacc - xc * jnp.sum(fac, axis=-1)[..., None]
    if need_pot:
        dpot = jnp.sum(m[:, None, :] * softened_potential(r, h), axis=-1)
    else:
        dpot = jnp.zeros(xc.shape[:2], dtype)

    # quadrupole, Newtonian range only (forcetree.c:1002-1060)
    live = m > 0
    newton = (r >= h) & live[:, None, :]
    r_safe = jnp.maximum(r, 1e-30)
    ir = jnp.where(newton, 1.0 / r_safe, 0.0)
    ir2 = ir * ir
    w5 = ir2 * ir2 * ir                                  # 1/r^5 masked
    w7 = w5 * ir2

    cx, cy, cz = com[..., 0], com[..., 1], com[..., 2]
    qxx, qyy, qzz = q[..., 0], q[..., 1], q[..., 2]
    qxy, qxz, qyz = q[..., 3], q[..., 4], q[..., 5]
    u = jnp.stack([qxx * cx + qxy * cy + qxz * cz,
                   qxy * cx + qyy * cy + qyz * cz,
                   qxz * cx + qyz * cy + qzz * cz], axis=-1)   # (GB,WC,3)
    s = jnp.sum(u * com, axis=-1)                               # (GB,WC)
    xu = _einsum("gtd,gwd->gtw", xc, u, dtype=dtype, prec=prec)
    phi = jnp.stack([xc[..., 0] ** 2, xc[..., 1] ** 2, xc[..., 2] ** 2,
                     2 * xc[..., 0] * xc[..., 1],
                     2 * xc[..., 0] * xc[..., 2],
                     2 * xc[..., 1] * xc[..., 2]], axis=-1)     # (GB,G,6)
    xqx = _einsum("gtq,gwq->gtw", phi, q, dtype=dtype, prec=prec)
    dqd = s[:, None, :] - 2.0 * xu + xqx                        # (GB,G,WC)

    # acc_q = sum_w [-(u - Qx) w5 + 2.5 dqd w7 (com - x)]
    w5u = _einsum("gtw,gwd->gtd", w5, u, dtype=dtype, prec=prec)
    mw = _einsum("gtw,gwq->gtq", w5, q, dtype=dtype, prec=prec)
    bx = (mw[..., 0] * xc[..., 0] + mw[..., 3] * xc[..., 1]
          + mw[..., 4] * xc[..., 2])
    by = (mw[..., 3] * xc[..., 0] + mw[..., 1] * xc[..., 1]
          + mw[..., 5] * xc[..., 2])
    bz = (mw[..., 4] * xc[..., 0] + mw[..., 5] * xc[..., 1]
          + mw[..., 2] * xc[..., 2])
    qxv = jnp.stack([bx, by, bz], axis=-1)                      # (GB,G,3)
    t7 = w7 * dqd
    dacc = dacc - w5u + qxv
    dacc = dacc + 2.5 * (_einsum("gtw,gwd->gtd", t7, com, dtype=dtype, prec=prec)
                         - xc * jnp.sum(t7, axis=-1)[..., None])
    if need_pot:
        dpot = dpot - 0.5 * jnp.sum(dqd * w5, axis=-1)
    return dacc, dpot


def _near_tile(ent, part16, xr, te, need_pot=True, pbc=None):
    """Leaf-segment particles against one group block.

    ent: (GB, SC) packed int32 entries start*32+cnt (IMAX = dead);
    part16: (NP16, 128) packed particles. Returns (dacc, dpot).
    pbc: optional static (box, alpha, rcut) — minimum-image differencing
    and the TreePM screened pair force (ops/pm.py short_range_fac)."""
    dtype = xr.dtype
    gb, sc = ent.shape
    live = ent != IMAX
    e = jnp.where(live, ent, 0)
    start = e >> 5
    cnt = jnp.where(live, e & 31, 0)
    row0 = start >> 4
    off = start & 15

    nrows = part16.shape[0]
    rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], axis=-1)
    g = part16[rid.reshape(-1)].reshape(gb, sc, 2, 128)
    slot = jnp.arange(32, dtype=jnp.int32)
    ok = (slot[None, None, :] >= off[:, :, None]) \
        & (slot[None, None, :] < (off + cnt)[:, :, None]) \
        & live[:, :, None]

    S = sc * 32

    def field(f):
        # planar rows: two consecutive 16-packs cover any off+cnt<=31
        # window with one contiguous lane slice per field
        return jnp.concatenate([g[..., 0, 16 * f:16 * (f + 1)],
                                g[..., 1, 16 * f:16 * (f + 1)]],
                               axis=-1).reshape(gb, S)

    yx, yy, yz = field(0), field(1), field(2)
    ym = jnp.where(ok.reshape(gb, S), field(3), 0.0)
    yeps = field(4)

    # RAW-coordinate per-pair differencing and per-pair accumulation. Both
    # group-centering and the sum-factorised accumulation carry ~bbox*eps_f32
    # absolute rounding per coordinate; for tight pairs (r ~ softening, whose
    # contribution is 10-100x the net force at halo outskirts) that amplifies
    # to >1e-3 net error — measured as the hernquist oracle failure. Raw f32
    # subtraction is correctly rounded at the PAIR scale (like the direct-sum
    # oracle). Unrolled over d so every broadcast stays (GB, G, S) with S on
    # lanes (no trailing dim-3 tensor).
    d0 = xr[:, :, None, 0] - yx[:, None, :]
    d1 = xr[:, :, None, 1] - yy[:, None, :]
    d2 = xr[:, :, None, 2] - yz[:, None, :]
    if pbc is not None and pbc[0] > 0:
        box = pbc[0]
        d0 = d0 - box * jnp.round(d0 / box)
        d1 = d1 - box * jnp.round(d1 / box)
        d2 = d2 - box * jnp.round(d2 / box)
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te[:, :, None], yeps[:, None, :])
    if pbc is not None:
        from .pm import short_range_fac, short_range_pot
        cut = r <= pbc[2]
        fac = ym[:, None, :] * short_range_fac(r, h, pbc[1]) * cut
    else:
        fac = ym[:, None, :] * softened_inv_r3(r, h)
    dacc = jnp.stack([-jnp.sum(fac * d0, axis=-1),
                      -jnp.sum(fac * d1, axis=-1),
                      -jnp.sum(fac * d2, axis=-1)], axis=-1)
    if need_pot:
        if pbc is not None:
            dpot = jnp.sum(ym[:, None, :]
                           * short_range_pot(r, h, pbc[1]) * cut, axis=-1)
        else:
            dpot = jnp.sum(ym[:, None, :] * softened_potential(r, h),
                           axis=-1)
    else:
        dpot = jnp.zeros((gb, xr.shape[1]), dtype)
    return dacc, dpot


def _classify(rows, glo, ghi, oac, s_l, theta2, use_relative, leaf_cap,
              last_level, pbc=None):
    """Opening decision per (group, slot). rows: (GB, WC, 16).

    pbc: optional static (box, alpha, rcut) TreePM split (ops/pm.py). The
    bbox-to-COM distance is then the minimum image, and any cell whose
    bounding sphere cannot reach within rcut of the group is DROPPED
    (neither opened nor far-accepted): its screened short-range force is
    zero and its full contribution lives on the mesh."""
    com = rows[..., _COM]
    m = rows[..., _MASS]
    cnt = rows[..., _CNT]
    if pbc is not None and pbc[0] > 0:
        box = pbc[0]
        gc = 0.5 * (glo + ghi)[:, None, :]
        hw = 0.5 * (ghi - glo)[:, None, :]
        delta = com - gc
        delta = delta - box * jnp.round(delta / box)
        dx = jnp.maximum(jnp.abs(delta) - hw, 0.0)
    else:
        # vacuum (pbc None, or TreePM split with box=0: rcut truncation
        # and the screened pair force without minimum-image wrap)
        dx = jnp.maximum(
            jnp.maximum(glo[:, None, :] - com, com - ghi[:, None, :]), 0.0)
    r2b = jnp.sum(dx * dx, axis=-1)                       # (GB,WC)
    geo = s_l * s_l > theta2 * r2b
    if use_relative:
        rel = m * s_l ** 4 > oac[:, None] * r2b * r2b * r2b
        mac_open = jnp.where(oac[:, None] > 0, rel, geo)
    else:
        mac_open = geo
    if pbc is not None and len(pbc) > 3 and pbc[3] > 0:
        # screening-scale cap: the TreePM screen S(r) varies on the scale
        # 1/(2 alpha); multipoles of cells LARGER than that carry an
        # e-fold screen variation, so force them open (they are within
        # rcut or they'd be dropped below anyway)
        mac_open = mac_open | (s_l > pbc[3])
    # BMAX containment guard (forcetree.c:1254-1257): open any cell whose
    # true bounding sphere around the COM (|com-center| + sqrt(3)/2 len
    # + drift, packed as bmax^2 in pack_tree) can reach the group bbox.
    # Exact per-node bound — tighter than a sqrt(3)*len box test, so it
    # both implements the reference's BMAX option and opens fewer cells.
    mac_open = mac_open | (r2b <= rows[..., 15])
    live = cnt > 0
    if pbc is not None:
        # short-range truncation: min pair distance >= sqrt(r2b) - bmax
        reach = jnp.sqrt(r2b) <= pbc[2] + jnp.sqrt(rows[..., 15])
        live = live & reach
    is_leaf = cnt <= leaf_cap
    far = live & ~mac_open
    seg = live & mac_open & is_leaf
    deep = live & mac_open & ~is_leaf
    if last_level:
        opn = jnp.zeros_like(deep)
        big = deep
    else:
        opn = deep
        big = jnp.zeros_like(deep)
    return far, seg, opn, big


def _far_tile_pbc(rows, trq, xr, te, pbc, need_pot=True):
    """Periodic screened multipole tile: ELEMENTWISE minimum-image pair
    vectors (no group-centered MXU expansion — the wrap is per pair) and
    the EXACT multipole expansion of the screened kernel.

    rows: (GB, WC, 16) mass zeroed on non-accepted slots; trq: (GB, WC)
    raw quadrupole trace; xr: (GB, G, 3) RAW target positions.

    The quadrupole of psi(R) = erfc(aR)/R is NOT S(R) times the Newtonian
    quadrupole: with E = (2a/sqrt(pi)) exp(-a^2 R^2),
      psi''  = 2 a^2 E + 2 S/R^3,
    and the Gaussian term dominates for aR >~ 2 (at aR=3 it is ~17x the
    screened-Newtonian term) — the naive form loses ~2e-2 of the local
    short force near rcut (measured). Exact coefficients (d = y - x):
      a_q = -cA (dQd + tr R^2) d - cB (Qd) - 2.5 cB tr d,   with
      cA = -(2/3) a^4 E ir^2 - (5/3) a^2 E ir^4 - 2.5 S ir^7
      cB =  (2/3) a^2 E ir^2 + S ir^5
    where Qd/dQd use the packed TRACELESS quadrupole (the tr terms fold
    the trace back in; E, S masked to the Newtonian range and rcut).
    Both reduce to the classic -w5 u + 2.5 w7 dqd d at E=0, S=1."""
    from .pm import short_range_screen

    dtype = xr.dtype
    box, alpha, rcut = pbc[0], pbc[1], pbc[2]
    m = rows[..., _MASS]                                  # (GB,WC)
    epsn = rows[..., _EPS]
    q = rows[..., _QUAD]

    d0 = rows[..., None, :, 0] - xr[..., 0][..., None]    # (GB,G,WC)
    d1 = rows[..., None, :, 1] - xr[..., 1][..., None]
    d2 = rows[..., None, :, 2] - xr[..., 2][..., None]
    if box > 0:
        d0 = d0 - box * jnp.round(d0 / box)
        d1 = d1 - box * jnp.round(d1 / box)
        d2 = d2 - box * jnp.round(d2 / box)
    r2 = d0 * d0 + d1 * d1 + d2 * d2
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(te[:, :, None], epsn[:, None, :])
    cut = r <= rcut
    scr = short_range_screen(r, alpha) * cut
    fac = m[:, None, :] * softened_inv_r3(r, h) * scr
    dacc = jnp.stack([jnp.sum(fac * d0, axis=-1),
                      jnp.sum(fac * d1, axis=-1),
                      jnp.sum(fac * d2, axis=-1)], axis=-1)
    if need_pot:
        # screened potential: -erfc(alpha r)/r beyond softening (far-
        # accepted cells are beyond h by the containment guard)
        from .pm import short_range_pot
        dpot = jnp.sum(m[:, None, :] * short_range_pot(r, h, alpha) * cut,
                       axis=-1)
    else:
        dpot = jnp.zeros(xr.shape[:2], dtype)

    # exact screened quadrupole, Newtonian range only
    live = m > 0
    mask = (r >= h) & live[:, None, :] & cut
    r_safe = jnp.maximum(r, 1e-30)
    ir = jnp.where(mask, 1.0 / r_safe, 0.0)
    ir2 = ir * ir
    a2 = alpha * alpha
    Em = jnp.where(mask, (2.0 * alpha / (jnp.pi ** 0.5))
                   * jnp.exp(-a2 * r2), 0.0)
    Sm = jnp.where(mask, short_range_screen(r, alpha), 0.0)
    cA = (-(2.0 / 3.0) * a2 * a2 * Em * ir2
          - (5.0 / 3.0) * a2 * Em * ir2 * ir2
          - 2.5 * Sm * ir2 * ir2 * ir2 * ir)
    cB = (2.0 / 3.0) * a2 * Em * ir2 + Sm * ir2 * ir2 * ir
    qxx, qyy, qzz = q[..., 0], q[..., 1], q[..., 2]
    qxy, qxz, qyz = q[..., 3], q[..., 4], q[..., 5]
    u0 = (qxx[:, None, :] * d0 + qxy[:, None, :] * d1
          + qxz[:, None, :] * d2)
    u1 = (qxy[:, None, :] * d0 + qyy[:, None, :] * d1
          + qyz[:, None, :] * d2)
    u2 = (qxz[:, None, :] * d0 + qyz[:, None, :] * d1
          + qzz[:, None, :] * d2)
    dqd = d0 * u0 + d1 * u1 + d2 * u2
    trr = trq[:, None, :]
    tA = -cA * (dqd + trr * r2) - 2.5 * cB * trr          # coeff of d
    dacc = dacc + jnp.stack([
        jnp.sum(tA * d0 - cB * u0, axis=-1),
        jnp.sum(tA * d1 - cB * u1, axis=-1),
        jnp.sum(tA * d2 - cB * u2, axis=-1)], axis=-1)
    if need_pot:
        # phi_q = 0.5 tr S ir^3 - (dQd + tr R^2)/6 * (2 a^2 E ir^2
        #         + 3 S ir^5); reduces to -0.5 dqd w5 at E=0, S=1
        dpot = dpot + jnp.sum(
            0.5 * trr * Sm * ir2 * ir
            - (dqd + trr * r2) * ((1.0 / 3.0) * a2 * Em * ir2
                                  + 0.5 * Sm * ir2 * ir2 * ir), axis=-1)
    return dacc, dpot


def _level_pass(fids, live_w, acc, pot, n_seg_total, tbl, s_l, nl_real,
                xc_b, te_b, xr_b, glo_b, ghi_b, oac_b, gc_b, part16,
                *, W, WC, last, theta2, use_relative, cfg, need_pot,
                NB, GB, ng, G, dtype, pbc=None, tr_tbl=None):
    """One level: gather/classify/far over the frontier, then the near pass.

    Returns (acc, pot, n_seg_total, segk?, openk, bigk) with openk/bigk as
    (ng, W) key planes for the caller's expansion / big handling."""

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    def block_body(args):
        fids_b, xcb, xrb, teb, glob, ghib, oacb, gcb, live_b = args
        accb = jnp.zeros((GB, G, 3), dtype)
        potb = jnp.zeros((GB, G), dtype)
        segk = jnp.full((GB, W), IMAX, jnp.int32)
        openk = jnp.full((GB, W), IMAX, jnp.int32)
        bigk = jnp.full((GB, W), IMAX, jnp.int32)

        def chunk(state):
            ci, accb, potb, segk, openk, bigk = state
            c0 = ci * WC
            ids = lax.dynamic_slice(fids_b, (jnp.int32(0), c0), (GB, WC))
            # ids beyond the level's REAL node count alias real rows after
            # clipping (the initial arange frontier can exceed it at small
            # n) — treat them as dead, not just negatives
            dead = (ids < 0) | (ids >= nl_real)
            rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
            rows = jnp.where(dead[..., None], 0.0, rows)
            far, seg, opn, big = _classify(
                rows, glob, ghib, oacb, s_l, theta2, use_relative,
                cfg.leaf_cap, last, pbc)
            rows_far = rows.at[..., _MASS].set(
                jnp.where(far, rows[..., _MASS], 0.0))
            if not cfg.skip_far:
                if pbc is not None:
                    trr = jnp.where(
                        dead | ~far,
                        0.0, tr_tbl[jnp.clip(ids, 0, tr_tbl.shape[0] - 1)])
                    da, dp = _far_tile_pbc(rows_far, trr, xrb, teb, pbc,
                                           need_pot)
                else:
                    da, dp = _far_tile(rows_far, xcb, teb, gcb,
                                       _PREC_MAP[cfg.precision], need_pot)
                accb = accb + da
                potb = potb + dp

            starts = rows[..., _NSTART].astype(jnp.int32)
            cnts = rows[..., _CNT].astype(jnp.int32)
            sk = jnp.where(seg, starts * 32 + jnp.minimum(cnts, 31), IMAX)
            segk = lax.dynamic_update_slice(segk, sk, (jnp.int32(0), c0))
            cs = rows[..., _CSTART].astype(jnp.int32)
            cc = rows[..., _CCNT].astype(jnp.int32)
            okk = jnp.where(opn, cs * 16 + cc, IMAX)
            openk = lax.dynamic_update_slice(openk, okk, (jnp.int32(0), c0))
            if last:
                bk = jnp.where(big, ids, IMAX)  # keep node id for big
                bigk = lax.dynamic_update_slice(bigk, bk, (jnp.int32(0), c0))
            return ci + 1, accb, potb, segk, openk, bigk

        def cond(state):
            return state[0] * WC < jnp.minimum(live_b, W)

        _, accb, potb, segk, openk, bigk = lax.while_loop(
            cond, chunk, (jnp.int32(0), accb, potb, segk, openk, bigk))
        return accb, potb, segk, openk, bigk

    outs = lax.map(block_body, (blk(fids), xc_b, xr_b, te_b, glo_b, ghi_b,
                                oac_b, gc_b, live_w))
    accb, potb, segk, openk, bigk = outs
    acc = acc + accb.reshape(ng, G, 3)
    pot = pot + potb.reshape(ng, G)
    segk = segk.reshape(ng, W)
    openk = openk.reshape(ng, W)

    # near field of this level's leaf segments, evaluated immediately from
    # the compacted key plane (no drops: W itself bounds the width;
    # frontier order is ascending node order, so compaction preserves
    # the gather locality a sort would give)
    seg_sorted = (jnp.sort(segk, axis=1) if cfg.sort_compact
                  else compact_plane(segk))
    n_seg = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
    n_seg_total = n_seg_total + jnp.sum(n_seg, dtype=jnp.int32)
    if not cfg.skip_near:
        acc, pot = _near_level(
            acc, pot, seg_sorted, jnp.max(n_seg.reshape(NB, GB), axis=1),
            part16, xr_b, te_b, cfg, NB, GB, need_pot, pbc)
    return acc, pot, n_seg_total, openk, bigk.reshape(ng, W)


def _expand_open(openk, ovf, *, Wn, cfg, NB, GB, ng):
    """Open keys -> next frontier, COMPACTING real children: mean branching
    is ~3.5 of 8, so sorting the absent-child gaps out lets the next
    frontier be ~2.5x narrower than the naive 8*opens bound."""
    W = openk.shape[1]
    O = min(W, cfg.open_cap)
    open_sorted = (jnp.sort(openk, axis=1) if cfg.sort_compact
                   else compact_plane(openk))[:, :O]
    n_open = jnp.sum((openk != IMAX).astype(jnp.int32), axis=1)
    max_open = jnp.max(n_open)
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
    if 8 * O > Wn:
        kids = (jnp.sort(kids, axis=1) if cfg.sort_compact
                else compact_plane(kids))[:, :Wn]
        ovf = ovf.at[0].add(jnp.sum(jnp.maximum(n_child - Wn, 0),
                                    dtype=jnp.int32))
        live_c = jnp.minimum(n_child.reshape(NB, GB), Wn)
    else:
        kids = jnp.concatenate(
            [kids, jnp.full((ng, Wn - 8 * O), IMAX, jnp.int32)], axis=1)
        # unsorted: gaps interleave, so the live bound is 8*opens
        live_c = jnp.minimum(8 * n_open.reshape(NB, GB), Wn)
    fids = jnp.where(kids == IMAX, -1, kids)
    live_w = jnp.max(live_c, axis=1).astype(jnp.int32)
    return fids, live_w, ovf, max_open


@partial(jax.jit, static_argnames=("theta", "use_relative", "cfg", "depth",
                                   "n_real", "need_pot", "pbc"))
def _fused_eval(ftree: FusedTree, gtargets, geps, glo, ghi, oac, gvalid,
                extent, drift, theta: float, use_relative: bool,
                cfg: FusedConfig, depth: int, n_real: int,
                need_pot: bool = True, pbc=None):
    """The fused walk+eval over all levels. All group arrays are padded to a
    multiple of cfg.group_block groups.

    Levels whose (frontier width, table capacity) are constant — everything
    from ~log8(n) down to depth-1 — run under ONE lax.scan body instead of
    being unrolled, which is what keeps XLA compile times sane (the unrolled
    form compiled for 24+ minutes at depth 13)."""
    ng, G, _ = gtargets.shape
    dtype = gtargets.dtype
    GB = min(cfg.group_block, ng)
    while ng % GB:          # largest divisor <= group_block (static)
        GB -= 1
    NB = ng // GB
    theta2 = theta * theta

    gc = 0.5 * (glo + ghi)
    xc = gtargets - gc[:, None, :]
    xc = jnp.where(gvalid[..., None], xc, 0.0)

    ws = _w_schedule(cfg, depth, n_real, theta, use_relative)
    caps = [min(8 ** l, n_real) for l in range(depth + 1)]
    l0 = cfg.start_level
    W0 = ws[l0]

    acc = jnp.zeros((ng, G, 3), dtype)
    pot = jnp.zeros((ng, G), dtype)
    ovf = jnp.zeros(2, jnp.int32)          # open, big overflows
    n_seg_total = jnp.zeros((), jnp.int32)
    lvl_max_open = []

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    xc_b, te_b, xr_b = blk(xc), blk(geps), blk(gtargets)
    glo_b, ghi_b, oac_b, gc_b = blk(glo), blk(ghi), blk(oac), blk(gc)

    # initial frontier: all start-level cells, every group. live_w is the
    # per-BLOCK frontier bound: one saturated group must not force every
    # block through the full cap (Morton order clusters the dense core
    # into few blocks, so per-block bounds are tight).
    fids = jnp.tile(jnp.arange(W0, dtype=jnp.int32)[None, :], (ng, 1))
    live_w = jnp.full((NB,), W0, jnp.int32)

    # run [l_scan, depth-1] under ONE lax.scan body: widths are uniform
    # from l0+2 (see _w_schedule) and level tables are zero-padded to a
    # common capacity below
    l_scan = depth
    while (l_scan - 1 >= l0
           and ws[l_scan - 1] == ws[depth - 1]
           and (l_scan - 1 == depth - 1
                or ws[l_scan] == ws[depth - 1])):
        l_scan -= 1
    if depth - l_scan < 2:
        l_scan = depth  # too short to be worth a scan; unroll all

    common = dict(xc_b=xc_b, te_b=te_b, xr_b=xr_b, glo_b=glo_b,
                  ghi_b=ghi_b, oac_b=oac_b, gc_b=gc_b,
                  part16=ftree.part16, theta2=theta2,
                  use_relative=use_relative, cfg=cfg, need_pot=need_pot,
                  NB=NB, GB=GB, ng=ng, G=G, dtype=dtype, pbc=pbc)

    for l in range(l0, min(l_scan, depth)):
        W = ws[l]
        acc, pot, n_seg_total, openk, _ = _level_pass(
            fids, live_w, acc, pot, n_seg_total, ftree.levels[l],
            extent / (1 << l) + 2.0 * drift, ftree.n_levels[l],
            W=W, WC=min(cfg.wc, W), last=False,
            tr_tbl=ftree.levels_tr[l], **common)
        fids, live_w, ovf, mo = _expand_open(
            openk, ovf, Wn=ws[l + 1], cfg=cfg, NB=NB, GB=GB, ng=ng)
        lvl_max_open.append(mo)

    if l_scan < depth:
        W = ws[l_scan]
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
            fids, live_w, acc, pot, ovf, n_seg_total = carry
            tbl, tr_t, s_l, nl_real = xs
            acc, pot, n_seg_total, openk, _ = _level_pass(
                fids, live_w, acc, pot, n_seg_total, tbl, s_l, nl_real,
                W=W, WC=min(cfg.wc, W), last=False, tr_tbl=tr_t, **common)
            fids, live_w, ovf, mo = _expand_open(
                openk, ovf, Wn=W, cfg=cfg, NB=NB, GB=GB, ng=ng)
            return (fids, live_w, acc, pot, ovf, n_seg_total), mo

        carry = (fids, live_w, acc, pot, ovf, n_seg_total)
        carry, mos = lax.scan(scan_body, carry, (tbls, trs, sls, nls))
        fids, live_w, acc, pot, ovf, n_seg_total = carry
        lvl_max_open.append(jnp.max(mos))

    # last level, with the overfull-cell (big) path
    W = ws[depth]
    tbl = ftree.levels[depth]
    acc, pot, n_seg_total, _, bigk = _level_pass(
        fids, live_w, acc, pot, n_seg_total, tbl,
        extent / (1 << depth) + 2.0 * drift, ftree.n_levels[depth],
        W=W, WC=min(cfg.wc, W), last=True,
        tr_tbl=ftree.levels_tr[depth], **common)

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
        acc, pot = _near_level(
            acc, pot, bkey, jnp.max(n_bk.reshape(NB, GB), axis=1),
            ftree.part16, xr_b, te_b, cfg, NB, GB, need_pot, pbc)
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[1].add(
        jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0), dtype=jnp.int32)
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32))

    info = dict(ovf_open=ovf[0], ovf_big=ovf[1], n_segs=n_seg_total,
                max_open=jnp.stack(lvl_max_open) if lvl_max_open
                else jnp.zeros(1, jnp.int32))
    return acc, pot, info


def _near_level(acc, pot, seg_sorted, max_live, part16, xr_b, te_b,
                cfg: FusedConfig, NB: int, GB: int, need_pot: bool = True,
                pbc=None):
    """Near-field pass over one level's sorted (ng, W) segment-key plane."""
    ng, W = seg_sorted.shape
    G = xr_b.shape[2]
    dtype = xr_b.dtype
    SC = min(cfg.sc, W)

    def near_block(args):
        ent_b, xrb, teb, max_b = args
        accb = jnp.zeros((GB, G, 3), dtype)
        potb = jnp.zeros((GB, G), dtype)

        def chunk(state):
            ci, accb, potb = state
            e = lax.dynamic_slice(ent_b, (jnp.int32(0), ci * SC), (GB, SC))
            da, dp = _near_tile(e, part16, xrb, teb, need_pot, pbc)
            return ci + 1, accb + da, potb + dp

        def cond(state):
            return state[0] * SC < max_b

        _, accb, potb = lax.while_loop(cond, chunk,
                                       (jnp.int32(0), accb, potb))
        return accb, potb

    ent = seg_sorted.reshape(NB, GB, W)
    acc_n, pot_n = lax.map(near_block, (ent, xr_b, te_b, max_live))
    return acc + acc_n.reshape(ng, G, 3), pot + pot_n.reshape(ng, G)


def default_depth(n: int) -> int:
    """Deep enough that the densest cells fit the big path (measured: NFW
    1e6 peaks at 1254/cell at depth 10, 108 at 12, <32 at 13); shallow for
    small n to keep the level loop short."""
    return 10 if n <= (1 << 18) else 13


def make_windows(keys_s, valid_s, n: int, G: int, depth: int,
                 break_level: int, group_block: int,
                 sort_groups: bool = True):
    """Morton target windows RESTARTED at level-L cell boundaries.

    Plain fixed windows can span Morton-curve jumps (measured bbox diag up
    to 2330 on NFW 1e6 vs 239 with L=4 breaking at ~equal group count) —
    huge-bbox groups open half the tree. Returns (pidx (ngp,G) sorted
    particle index per slot, gvalid, ngp, GB, NB). The break level adapts
    to n: the static group bound pays 8^L padded groups.
    """
    import math
    L = max(0, min(break_level, depth,
                   int(math.log(max(n // G, 1), 8) + 1e-9)))
    idx = jnp.arange(n, dtype=jnp.int32)
    # keys_s is the LEVEL-10 hi word regardless of tree depth
    prefL = keys_s >> jnp.uint32(3 * (min(depth, 10) - L))
    newcell = jnp.concatenate(
        [jnp.ones(1, bool), prefL[1:] != prefL[:-1]])
    run_start = lax.cummax(jnp.where(newcell, idx, 0))
    newgroup = newcell | (((idx - run_start) % G) == 0)
    gid = jnp.cumsum(newgroup.astype(jnp.int32)) - 1
    # static bound: ceil(cnt_cell/G) summed over cells <= n/G + #cells
    NGC0 = -(-n // G) + min(8 ** L, n)
    GB = min(group_block, max(NGC0, 1))
    ngp = -(-NGC0 // GB) * GB
    NB = ngp // GB

    # group ids are CONSECUTIVE (cumsum of boundary flags), so starts come
    # from one unique-index scatter of the boundary positions and counts
    # from next-start differences — segment_min/segment_sum lower to
    # scatter-adds that run ~60x off bandwidth on TPU (see ops/tree.py)
    start_buf = jnp.full(ngp + 1, n, jnp.int32).at[
        jnp.where(newgroup, gid, ngp)].set(idx)
    gstart0 = start_buf[:ngp]                     # n for padding groups
    nxt = jnp.concatenate([gstart0[1:], jnp.full(1, n, jnp.int32)])
    gcount = jnp.maximum(jnp.minimum(nxt, n) - gstart0, 0)
    gstart = jnp.where(gcount > 0, gstart0, 0)
    if sort_groups:
        # order groups by the particle count of their break cell (a local
        # density proxy): per-block live frontier bounds are max-over-
        # block, so cost-homogeneous blocks avoid dragging cheap groups
        # through an expensive neighbour's width
        run_id_s = jnp.cumsum(newcell.astype(jnp.int32)) - 1
        ncell_cap = min(8 ** L, n) + 1
        rstart_buf = jnp.full(ncell_cap + 1, n, jnp.int32).at[
            jnp.where(newcell, run_id_s, ncell_cap)].set(idx)
        rstart = rstart_buf[:ncell_cap]
        rnxt = jnp.concatenate([rstart[1:], jnp.full(1, n, jnp.int32)])
        run_len = jnp.maximum(jnp.minimum(rnxt, n) - rstart, 0)
        rid_of_group = run_id_s[jnp.minimum(gstart0, n - 1)]
        proxy = jnp.where(gcount > 0, run_len[rid_of_group], -1)
        order = jnp.argsort(-proxy)
        gstart = gstart[order]
        gcount = gcount[order]
    slot = jnp.arange(G, dtype=jnp.int32)
    pidx = jnp.minimum(gstart[:, None] + slot[None, :], n - 1)   # (ngp, G)
    gvalid = (slot[None, :] < gcount[:, None]) & valid_s[pidx]
    return pidx, gvalid, ngp, GB, NB


def fused_gravity_tree(tree, mass, eps, old_acc, *, theta=0.5, opening=1,
                       err_tol_force_acc=0.005,
                       config: Optional[FusedConfig] = None,
                       return_info: bool = False, need_pot: bool = True,
                       shard: Optional[tuple] = None,
                       pbc: Optional[tuple] = None):
    """Fused walk/eval on a PREBUILT octree (so the simulation step can
    share one tree between gravity and the SIDM range walk). mass/eps/
    old_acc are in ORIGINAL particle order; returns (acc, pot[, info]) in
    original order.

    shard: optional ``(shard_index, n_shards)`` with a traced index and a
    static count. The deterministic group-window set is split into
    ``n_shards`` equal block ranges and ONLY the local range is walked and
    evaluated; returned acc/pot then hold PARTIAL sums (zero for particles
    outside the local groups) that the caller must ``psum`` over the mesh
    axis. This is the multi-chip work decomposition: every device holds the
    same replicated tree, walks its own slice of target groups
    (gravtree.c:127-246's bunch pipeline, inverted: targets sharded,
    tree replicated)."""
    cfg = config or FusedConfig()
    n = tree.pos_s.shape[0]
    depth = tree.depth
    valid = mass > 0

    ftree = pack_tree(tree)
    G = cfg.group_size
    pidx, gvalid, ngp, GB, NB = make_windows(
        tree.keys_s, valid[tree.perm], n, G, depth, cfg.break_level,
        cfg.group_block, cfg.sort_groups)

    if shard is not None:
        sidx, nsh = shard
        # pad the block axis to a multiple of n_shards with dead groups
        nb_pad = -(-NB // nsh) * nsh
        if nb_pad != NB:
            extra = (nb_pad - NB) * GB
            pidx = jnp.concatenate(
                [pidx, jnp.zeros((extra, G), pidx.dtype)])
            gvalid = jnp.concatenate(
                [gvalid, jnp.zeros((extra, G), bool)])
            NB, ngp = nb_pad, nb_pad * GB
        # STRIDED block assignment: blocks are density-sorted (most
        # expensive first), so contiguous slices would send every dense
        # core block to shard 0 — round-robin keeps shard work balanced
        # (the reference balances by GravCost bisection, domain.c:154-280;
        # here homogeneous-cost striding achieves the same end statically)
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

    dtype = tree.pos_s.dtype
    toac = (old_acc[tree.perm] * err_tol_force_acc).astype(dtype)
    gtargets = tree.pos_s[pidx]
    geps = jnp.where(gvalid, tree.eps_s[pidx], 1.0)
    goac = jnp.where(gvalid, toac[pidx], 0.0)

    big = jnp.asarray(1e30, dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gtargets, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gtargets, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    if pbc is None or pbc[0] <= 0:
        # dead groups: park the bbox far outside so nothing opens
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    else:
        # positions wrap under the minimum image, so "far outside" does
        # not exist — park dead groups with an INVERTED huge bbox: the
        # half-width is then hugely negative and every bbox distance
        # becomes ~1e18, killing the frontier at the start level
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, dtype))
    oac = jnp.min(jnp.where(gvalid & (goac > 0), goac, big), axis=1)
    oac = jnp.where(jnp.any(gvalid & (goac > 0), axis=1), oac, 0.0)

    acc_g, pot_g, info = _fused_eval(
        ftree, gtargets, geps, glo, ghi, oac, gvalid, tree.extent,
        tree.drift, float(theta), bool(opening == 1), cfg, depth, int(n),
        bool(need_pot),
        tuple(float(v) for v in pbc) if pbc is not None else None)

    # scatter slots back to sorted particle order (dump row n for dead
    # slots; real indices are unique by construction)
    didx = jnp.where(gvalid, pidx, n).reshape(-1)
    acc_s = jnp.zeros((n + 1, 3), dtype).at[didx].set(
        acc_g.reshape(-1, 3))[:n]
    pot_s = jnp.zeros(n + 1, dtype).at[didx].set(pot_g.reshape(-1))[:n]
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    acc = acc_s[inv]
    pot = pot_s[inv]
    # remove spline self-potential (potential.c:136) — in shard mode the
    # caller applies it AFTER the cross-shard psum (it would otherwise be
    # summed n_shards times). In TreePM (pbc) mode the near pass's self
    # pair contributed m*(-1/eps + 2 alpha/sqrt(pi)); remove BOTH (the
    # mesh-side self terms are the PM caller's to fix, see ops/pm.py).
    if need_pot and shard is None:
        pot = pot + mass / jnp.maximum(eps, 1e-30)
        if pbc is not None:
            pot = pot - mass * (2.0 * float(pbc[1]) / (jnp.pi ** 0.5))
        pot = jnp.where(valid, pot, 0.0)
    acc = jnp.where(valid[:, None], acc, 0.0)
    if return_info:
        return acc, pot, info
    return acc, pot


def fused_gravity(pos, mass, eps, old_acc, *, theta=0.5, opening=1,
                  err_tol_force_acc=0.005, depth: Optional[int] = None,
                  config: Optional[FusedConfig] = None,
                  return_info: bool = False, need_pot: bool = True,
                  pbc: Optional[tuple] = None):
    """Raw acceleration and potential (no G factor) for all particles.

    Drop-in for treeforce.tree_gravity on non-periodic runs. With
    pbc=(box, alpha, rcut) it returns the TreePM SHORT-RANGE part only;
    the caller adds ops.pm.pm_accel's long-range mesh force."""
    n = pos.shape[0]
    if depth is None:
        depth = default_depth(n)
    if n > (1 << 24):
        raise ValueError("fused engine packs indices as exact f32; "
                         "N per shard must be <= 2^24")
    valid = mass > 0
    tree = build_octree(pos, mass, eps, valid,
                        box=pbc[0] if pbc is not None else 0.0, depth=depth)
    return fused_gravity_tree(
        tree, mass, eps, old_acc, theta=theta, opening=opening,
        err_tol_force_acc=err_tol_force_acc, config=config,
        return_info=return_info, need_pot=need_pot, pbc=pbc)
