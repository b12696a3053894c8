"""Level-synchronous octree build from Morton-sorted particles.

Replaces the reference's pointer octree + recursive moment pass
(``force_treebuild``/``force_update_node_recursive``, nbody/forcetree.c:
90-719) with pure array ops:

* particles are sorted by Morton key once;
* a node at level l is a run of equal 3l-bit key prefixes — segment ids come
  from a boundary-flag cumsum, multipole moments (mass, center of mass,
  quadrupole) from segment sums;
* child ranges link a node to the contiguous block of next-level nodes whose
  first particle falls inside it.

Nodes of all levels are packed into FLAT arrays with static per-level
offsets, in two access-pattern-optimized layouts (TPU random gathers move
full 512-byte sublanes, so one packed row per node costs the same as one
scalar):

* ``mac_rows``  (M, 8) f32: com xyz, mass, geometric center xyz, count —
  everything the opening criterion needs in one gather;
* ``quad_rows`` (M, 8) f32: quadrupole (xx,yy,zz,xy,xz,yz), max softening,
  cell size — the remaining force-evaluation fields.

Unlike the reference there is one tree over ALL particle types (the
reference keeps ``trees[6]`` per type, forcetree.c:57, purely to reuse the
gravity tree for same-type neighbour searches — our neighbour engine is
separate; gravity sums over all types anyway).

The reference's lazy node updates (MaxNodeMove drift + TreeUpdateFrequency
rebuild cadence, gravtree.c:63-96) are unnecessary: a full rebuild is one
sort plus segment sums, cheap enough to run every step — and exact.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp

from .morton import (MAX_DEPTH, bounding_cube, cell_of_prefix,
                     cell_of_prefix2, morton_keys, morton_keys2)

U32 = jnp.uint32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm", "pos_s", "mass_s", "eps_s", "keys_s", "part_rows",
                 "mac_rows", "quad_rows", "trq", "node_start", "node_count",
                 "child_start", "child_count", "n_nodes", "origin",
                 "extent", "bound_level", "drift"],
    meta_fields=["level_offsets", "depth"],
)
@dataclass
class Octree:
    # particle data in Morton order
    perm: jax.Array          # (N,) sorted order: sorted_x = x[perm]
    pos_s: jax.Array         # (N,3)
    mass_s: jax.Array        # (N,)
    eps_s: jax.Array         # (N,)
    keys_s: jax.Array        # (N,) uint32 sorted level-10 Morton keys
                             # (hi word; sentinel 0xFFFFFFFF for padding)
    part_rows: jax.Array     # (N,8) f32: pos xyz, mass, eps, 0,0,0 (packed)
    # flat node arrays (levels concatenated; static offsets)
    mac_rows: jax.Array      # (M,8) f32: com xyz, mass, center xyz, count
    quad_rows: jax.Array     # (M,8) f32: quad xx yy zz xy xz yz, eps_max, size
    trq: jax.Array           # (M,) f32 RAW second-moment trace tr(Q~) about
                             # the COM — the traceless packing above loses
                             # it, but the TreePM screened quadrupole
                             # (fused_force._far_tile_pbc) needs it
    node_start: jax.Array    # (M,) int32 first particle (sorted order)
    node_count: jax.Array    # (M,) int32
    child_start: jax.Array   # (M,) int32 FLAT index of first child
    child_count: jax.Array   # (M,) int32
    n_nodes: List[jax.Array]     # per level () int32 real node count
    origin: jax.Array        # (3,)
    extent: jax.Array        # ()
    bound_level: jax.Array   # (N,) int32 shallowest level at which the
                             # particle starts a new Morton segment
    drift: jax.Array         # () accumulated max displacement since the
                             # topology was built (refresh_octree)
    level_offsets: tuple     # static flat offset of each level
    depth: int               # static


def _level_caps(n: int, depth: int) -> List[int]:
    return [min(8**l, n) for l in range(depth + 1)]


# ---------------------------------------------------------------------------
# Blocked sorted-range sums.
#
# jax.ops.segment_sum lowers to a scatter-add that runs ~60x off memory
# bandwidth on TPU (measured 139 ms for one (1M,11)->1M sorted segment sum
# on v5e). For SORTED segments a sum over [a, b) can instead be assembled
# from precomputed within-block prefix/suffix sums — O(1) gathers per
# query. A naive global prefix sum would lose ~eps*N_total relative
# precision to cancellation; a 3-level 128-ary hierarchy keeps relative
# error <= ~128*eps for ANY query, because differencing at level j only
# happens for ranges spanning at least one full unit of level j-1.
# ---------------------------------------------------------------------------

_SEG_B = 128


def _prefix_level(vals, k):
    """One 128-ary level: packed (rows, 3K) [incl-prefix | incl-suffix |
    raw] plus the per-block totals."""
    n, dtype = vals.shape[0], vals.dtype
    nb = -(-n // _SEG_B)
    pad = nb * _SEG_B - n
    v = jnp.concatenate([vals, jnp.zeros((pad, k), dtype)]) if pad else vals
    vb = v.reshape(nb, _SEG_B, k)
    pin = jnp.cumsum(vb, axis=1)
    suf = jnp.flip(jnp.cumsum(jnp.flip(vb, 1), axis=1), 1)
    packed = jnp.concatenate([pin, suf, vb], axis=-1) \
        .reshape(nb * _SEG_B, 3 * k)
    return packed, pin[:, -1]                          # totals (nb, k)


def block_prefix(vals):
    """Precompute the 3-level prefix structure for (N, K) rows.

    Returns an opaque tuple consumed by range_sum(). Supports
    N <= _SEG_B**3 (2M at B=128). Rows pack [prefix|suffix|raw] per
    level so each query costs 2 big + 4 small gathers."""
    n, k = vals.shape
    ps0, bsum0 = _prefix_level(vals, k)
    ps1, bsum1 = _prefix_level(bsum0, k)
    psum2 = jnp.concatenate([jnp.zeros((1, k), vals.dtype),
                             jnp.cumsum(bsum1, axis=0)])  # excl. prefix
    return (ps0, ps1, psum2, n, k)


def range_sum(bp, a, b):
    """Per-query sum of rows [a, b) from a block_prefix structure.

    a, b: (Q,) int32 with 0 <= a and b <= N; b <= a yields zeros.
    Same-block spans difference ONLY within the block (error ~B*eps of
    local magnitude); cross-block spans combine suffix + mid + prefix
    with no long-range cancellation."""
    ps0, ps1, psum2, n, k = bp
    nonempty = b > a
    ac = jnp.clip(a, 0, n - 1)
    bc = jnp.clip(b - 1, 0, n - 1)
    blkA = ac >> 7
    blkB = bc >> 7
    g_a = ps0[ac]                 # [pin | suf | raw] at a
    g_b = ps0[bc]
    pin_a, suf_a, raw_a = g_a[:, :k], g_a[:, k:2 * k], g_a[:, 2 * k:]
    pin_b = g_b[:, :k]
    same0 = (blkA == blkB)[:, None]

    # whole blocks strictly inside: [blkA+1, blkB), same scheme one level
    # up over the block-total rows
    A1 = blkA + 1
    B1 = blkB
    has_mid = (B1 > A1)[:, None]
    nbp = ps1.shape[0]
    bA = jnp.clip(A1, 0, nbp - 1)
    bB = jnp.clip(B1 - 1, 0, nbp - 1)
    sblkA = bA >> 7
    sblkB = bB >> 7
    g1_a = ps1[bA]
    g1_b = ps1[bB]
    pin1_a, suf1_a, raw1_a = (g1_a[:, :k], g1_a[:, k:2 * k],
                              g1_a[:, 2 * k:])
    pin1_b = g1_b[:, :k]
    same1 = (sblkA == sblkB)[:, None]
    mid1 = psum2[sblkB] - psum2[jnp.minimum(sblkA + 1, psum2.shape[0] - 1)]
    mid = jnp.where(same1, pin1_b - pin1_a + raw1_a,
                    suf1_a + mid1 + pin1_b)
    mid = jnp.where(has_mid, mid, 0.0)

    s = jnp.where(same0, pin_b - pin_a + raw_a, suf_a + mid + pin_b)
    return jnp.where(nonempty[:, None], s, 0.0)


def sparse_max_table(vals):
    """Sparse table for O(1) range-MAX queries over a 1-D array.

    Returns (tab (L, N), n) with tab[j, i] = max(vals[i : i + 2^j])
    (clamped at the end). Build is log2(N) shift-max passes; queries are
    EXACT because max is idempotent: max over [a, b) = max(tab[j, a],
    tab[j, b - 2^j]) with j = floor(log2(b - a)) — overlapping windows
    are harmless. The scatter-free analog of segment_max for sorted
    segments (range_sum's differencing trick does not exist for max)."""
    n = vals.shape[0]
    rows = [vals]
    j = 0
    while (1 << (j + 1)) <= n:
        half = 1 << j
        prev = rows[-1]
        shifted = jnp.concatenate([prev[half:], prev[-1:].repeat(half)])
        rows.append(jnp.maximum(prev, shifted))
        j += 1
    return jnp.stack(rows), n


def range_max(tab_n, a, b):
    """Per-query max of vals[a:b] from sparse_max_table; b <= a yields
    the value at a (callers mask empty queries)."""
    tab, n = tab_n
    length = jnp.maximum(b - a, 1)
    # floor(log2(length)) via float exponent bits (exact for int < 2^24)
    j = jnp.clip((jnp.frexp(length.astype(jnp.float32))[1] - 1), 0,
                 tab.shape[0] - 1)
    ac = jnp.clip(a, 0, n - 1)
    b2 = jnp.clip(b - (1 << j.astype(jnp.int32)), 0, n - 1)
    flat = tab.reshape(-1)
    return jnp.maximum(flat[j * n + ac], flat[j * n + b2])


def level_offsets(n: int, depth: int) -> List[int]:
    caps = _level_caps(n, depth)
    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    return offs  # length depth+2; offs[l] = start of level l


def build_octree(pos, mass, eps, valid, *, box=0.0, depth: int = 10,
                 dtype=None, uniform_eps: bool = False,
                 _skip: tuple = ()) -> Octree:
    """Build the full tree. Padding particles (mass 0, valid False) sort last
    via a sentinel key and contribute zero mass/moments.

    uniform_eps: static promise that all VALID particles share one
    softening — node eps_max is then a broadcast instead of a (slow)
    per-level segment_max. The caller asserts this from its softening
    table and the particle types present (single-type DM runs)."""
    dtype = dtype or pos.dtype
    n = pos.shape[0]
    origin, extent = bounding_cube(pos, valid, box=box)
    # two-word keys: hi = levels 1..10, lo = deeper bits (TPU jax silently
    # truncates 64-bit ints without x64 mode, so no single uint64 key)
    hi, lo = morton_keys2(pos, origin, extent, depth)
    hi = jnp.where(valid, hi, U32(0xFFFFFFFF))
    lo = jnp.where(valid, lo, U32(0xFFFFFFFF))
    d_hi = min(depth, MAX_DEPTH)
    if depth > d_hi:
        p1 = jnp.argsort(lo, stable=True)
        perm = p1[jnp.argsort(hi[p1], stable=True)]
    else:
        perm = jnp.argsort(hi)
    keys_s = hi[perm]
    lo_s = lo[perm]
    pos_s = pos[perm]
    mass_s = jnp.where(valid[perm], mass[perm], 0.0)
    eps_s = eps[perm]
    valid_s = valid[perm]

    caps = _level_caps(n, depth)
    offs = level_offsets(n, depth)
    M = offs[-1]

    mac_rows = jnp.zeros((M, 8), dtype)
    quad_rows = jnp.zeros((M, 8), dtype)
    trq_rows = jnp.zeros(M, dtype)
    node_start = jnp.zeros(M, jnp.int32)
    node_count = jnp.zeros(M, jnp.int32)
    child_start = jnp.zeros(M, jnp.int32)
    child_count = jnp.zeros(M, jnp.int32)
    n_nodes = []

    idx_n = jnp.arange(n, dtype=jnp.int32)
    seg_list = []
    # Per-particle moment products, summed ONCE per level as a single
    # (N, 12) matrix segment-sum: [m, m*x, m*y, m*z, m*xx, m*yy, m*zz,
    # m*xy, m*xz, m*yz, count, eps(for max, separate)] — one fused pass
    # instead of ten scalar reductions.
    m_valid = mass_s * valid_s.astype(dtype)
    x, y, z = pos_s[:, 0], pos_s[:, 1], pos_s[:, 2]
    prods = jnp.stack([
        m_valid, m_valid * x, m_valid * y, m_valid * z,
        m_valid * x * x, m_valid * y * y, m_valid * z * z,
        m_valid * x * y, m_valid * x * z, m_valid * y * z,
        valid_s.astype(dtype)], axis=1)                      # (N, 11)

    bp = block_prefix(prods)
    if not uniform_eps and "emax" not in _skip:
        eps_tab = sparse_max_table(jnp.where(valid_s, eps_s, 0.0))

    # ALL levels' boundary indicators, then ONE fused (N, L+1) cumsum for
    # every level's segment ids (14 separate 1M cumsums cost ~20x one
    # 14-wide pass)
    bound_level = jnp.full(n, depth + 1, jnp.int32).at[0].set(0)
    bnd_cols = []
    prefs = []
    for l in range(depth + 1):
        if l <= d_hi:
            pref = keys_s >> U32(3 * (d_hi - l))
            bnd = pref[1:] != pref[:-1]
        else:
            pref = lo_s >> U32(3 * (depth - l))
            bnd = (keys_s[1:] != keys_s[:-1]) | (pref[1:] != pref[:-1])
        prefs.append(pref)
        boundary = jnp.concatenate([
            jnp.ones(1, jnp.int32), bnd.astype(jnp.int32)])
        # shallowest boundary level per particle (Morton prefixes nest),
        # cached so refresh_octree can rebuild segment ids without a sort
        bound_level = jnp.minimum(bound_level,
                                  jnp.where(boundary > 0, l, depth + 1))
        bnd_cols.append(boundary)
    bmat = jnp.stack(bnd_cols, axis=1)                    # (N, L+1)
    segs_all = jnp.cumsum(bmat, axis=0) - 1               # (N, L+1)
    # real node count per level: segment id of the LAST valid particle
    # (valid sort first; padding carries sentinel keys)
    nv = jnp.sum(valid_s.astype(jnp.int32))
    last_valid = jnp.clip(nv - 1, 0, n - 1)
    nreal_all = jnp.where(nv > 0, segs_all[last_valid] + 1, 0)

    starts_l, ends_l = [], []
    for l in range(depth + 1):
        pref = prefs[l]
        boundary = bmat[:, l]
        seg = segs_all[:, l]
        seg_list.append(seg)
        cap = caps[l]
        segc = jnp.clip(seg, 0, cap - 1)

        # segment starts by a unique-index scatter of boundary positions;
        # ends are the next segment's start. Sums come from blocked range
        # sums (segment_sum's scatter-add lowering runs ~60x off
        # bandwidth on TPU; see block_prefix).
        # sentinel-padding segments can exceed cap (they sort after every
        # real segment); route them to the dump slot instead of letting
        # the clipped id clobber the last real segment's start
        start_buf = jnp.full(cap + 1, n, jnp.int32).at[
            jnp.where((boundary > 0) & (seg < cap), seg, cap)].set(idx_n)
        start = start_buf[:cap]
        ends = jnp.concatenate([start[1:], jnp.full(1, n, jnp.int32)])
        ends = jnp.minimum(ends, n)
        startc = jnp.minimum(start, n - 1)
        starts_l.append(startc)
        ends_l.append(ends)

        if "moments" in _skip:
            sums = jnp.zeros((cap, 11), dtype) \
                .at[:, 10].set(jnp.maximum(ends - start, 0).astype(dtype))
        else:
            sums = range_sum(bp, start, ends)            # (cap, 11)
        sm = sums[:, 0]
        smx = sums[:, 1:4]
        com = smx / jnp.maximum(sm, 1e-30)[:, None]
        # second moments -> traceless quadrupole about the COM
        sxx = sums[:, 4] - sm * com[:, 0] * com[:, 0]
        syy = sums[:, 5] - sm * com[:, 1] * com[:, 1]
        szz = sums[:, 6] - sm * com[:, 2] * com[:, 2]
        sxy = sums[:, 7] - sm * com[:, 0] * com[:, 1]
        sxz = sums[:, 8] - sm * com[:, 0] * com[:, 2]
        syz = sums[:, 9] - sm * com[:, 1] * com[:, 2]
        tr = sxx + syy + szz
        # VALID-particle count (sentinel-key padding can share the
        # all-ones-prefix node with real particles; padding sorts last
        # within the segment, so [start, start+cnt) covers the valid ones)
        cnt = jnp.round(sums[:, 10]).astype(jnp.int32)

        start = jnp.where(cnt > 0, start, 0)
        # per-node key prefixes: the segment's FIRST particle (sorted, so
        # min == first) — gathers at starts replace segment_min
        npref = pref[startc]
        if "emax" in _skip:
            emax = jnp.zeros(cap, dtype)
        elif uniform_eps:
            emax = jnp.where(cnt > 0,
                             jnp.max(jnp.where(valid_s, eps_s, 0.0)), 0.0)
        else:
            # scatter-free range max over the sorted node ranges
            emax = jnp.where(cnt > 0,
                             range_max(eps_tab, start, ends), 0.0)
        s_l = extent / (1 << l)
        if l <= d_hi:
            ix, iy, iz = cell_of_prefix(npref, l, d_hi)
        else:
            nhip = keys_s[startc]
            ix, iy, iz = cell_of_prefix2(nhip, npref, l, depth)
        center = origin + (jnp.stack([ix, iy, iz], -1).astype(dtype) + 0.5) * s_l
        com = jnp.where((cnt > 0)[:, None], com, center)

        sl = slice(offs[l], offs[l] + cap)
        mac_rows = mac_rows.at[sl].set(jnp.concatenate([
            com, sm[:, None], center, cnt.astype(dtype)[:, None]], axis=1))
        quad_rows = quad_rows.at[sl].set(jnp.stack([
            3 * sxx - tr, 3 * syy - tr, 3 * szz - tr,
            3 * sxy, 3 * sxz, 3 * syz, emax,
            jnp.full(cap, s_l, dtype)], axis=1))
        trq_rows = trq_rows.at[sl].set(tr)
        node_start = node_start.at[sl].set(start)
        node_count = node_count.at[sl].set(cnt)
        n_nodes.append(jnp.minimum(nreal_all[l], cap).astype(jnp.int32))

    # child links: children of a node are the CONTIGUOUS run of level-
    # (l+1) segments spanned by its particles, so child_start is the
    # child-level segment id of the node's first particle and the count
    # follows from the segment id of its last VALID particle — two
    # gathers per level (segment_min/segment_sum lower to slow scatters)
    for l in range(depth if "children" not in _skip else 0):
        cap, cap_c = caps[l], caps[l + 1]
        sl = slice(offs[l], offs[l] + cap)
        a = starts_l[l]
        cnt_l = node_count[sl]
        last = jnp.clip(a + cnt_l - 1, 0, n - 1)
        seg_c = segs_all[:, l + 1]
        cs = jnp.clip(seg_c[a], 0, cap_c - 1)
        ce = jnp.clip(seg_c[last], 0, cap_c - 1)
        real = cnt_l > 0
        cc = jnp.where(real, ce - cs + 1, 0)
        child_start = child_start.at[sl].set(
            offs[l + 1] + jnp.where(real, cs, 0))
        child_count = child_count.at[sl].set(cc)

    part_rows = jnp.concatenate([
        pos_s, mass_s[:, None], eps_s[:, None],
        jnp.zeros((n, 3), dtype)], axis=1)

    return Octree(
        perm=perm.astype(jnp.int32), pos_s=pos_s, mass_s=mass_s, eps_s=eps_s,
        keys_s=keys_s, part_rows=part_rows,
        mac_rows=mac_rows, quad_rows=quad_rows, trq=trq_rows,
        node_start=node_start, node_count=node_count,
        child_start=child_start, child_count=child_count,
        n_nodes=n_nodes, level_offsets=tuple(offs[:-1]),
        origin=origin, extent=extent, bound_level=bound_level,
        drift=jnp.zeros((), dtype), depth=depth,
    )


def refresh_octree(tree: Octree, pos, mass, eps, valid,
                   box: float = 0.0) -> Octree:
    """Moments-only tree refresh on a FROZEN topology: the Morton
    permutation, segment structure, child links, particle ranges and
    geometric centers are reused; center of mass, mass, quadrupole and
    eps_max are recomputed exactly from the new positions.

    This is the TPU analog of the reference's dynamic node updates
    (force_update_node + MaxNodeMove, nbody/forcetree.c:433-571,941-948;
    rebuild cadence gravtree.c:63): between rebuilds, nodes carry exact
    moments but stale geometry. The accumulated ``drift`` (max particle
    displacement since the build) is returned on the tree so the walk
    can inflate cell sizes / containment bounds conservatively.

    Moments come from blocked range sums over the FROZEN node ranges
    (node_start/node_count) — no per-level cumsums or segment scatters.
    eps_max is kept stale: it only enters the far force through
    h = 2.8*max(eps_t, eps_node), and far-accepted nodes sit beyond the
    bmax containment guard, far outside the softened regime (exact for
    the common static-softening runs)."""
    import dataclasses

    dtype = tree.pos_s.dtype
    n = pos.shape[0]
    depth = tree.depth
    perm = tree.perm
    pos_s = pos[perm]
    valid_s = valid[perm]
    mass_s = jnp.where(valid_s, mass[perm], 0.0)
    eps_s = eps[perm]

    d = pos_s - tree.pos_s
    if box:
        # periodic: displacements are minimum-image (a box_wrap between
        # refreshes jumps raw coordinates by +-box), and the refreshed
        # positions STAY IN THE BUILD'S WRAP IMAGE so frozen nodes remain
        # spatially compact (com/quad would be garbage for a node whose
        # member wrapped; per-pair minimum image in the walk handles the
        # image choice)
        d = d - box * jnp.round(d / box)
        pos_s = tree.pos_s + d
    step_move = jnp.sqrt(jnp.max(jnp.where(
        valid_s, jnp.sum(d * d, axis=1), 0.0)))
    drift = tree.drift + step_move

    caps = _level_caps(n, depth)
    offs = level_offsets(n, depth)

    x, y, z = pos_s[:, 0], pos_s[:, 1], pos_s[:, 2]
    prods = jnp.stack([
        mass_s, mass_s * x, mass_s * y, mass_s * z,
        mass_s * x * x, mass_s * y * y, mass_s * z * z,
        mass_s * x * y, mass_s * x * z, mass_s * y * z], axis=1)
    bp = block_prefix(prods)

    mac_parts, quad_parts, trq_parts = [], [], []
    for l in range(depth + 1):
        cap = caps[l]
        sl = slice(offs[l], offs[l] + cap)
        a = tree.node_start[sl]
        b = a + tree.node_count[sl]
        sums = range_sum(bp, a, b)
        sm = sums[:, 0]
        com = sums[:, 1:4] / jnp.maximum(sm, 1e-30)[:, None]
        sxx = sums[:, 4] - sm * com[:, 0] * com[:, 0]
        syy = sums[:, 5] - sm * com[:, 1] * com[:, 1]
        szz = sums[:, 6] - sm * com[:, 2] * com[:, 2]
        sxy = sums[:, 7] - sm * com[:, 0] * com[:, 1]
        sxz = sums[:, 8] - sm * com[:, 0] * com[:, 2]
        syz = sums[:, 9] - sm * com[:, 1] * com[:, 2]
        tr = sxx + syy + szz
        old_mac = tree.mac_rows[sl]
        center = old_mac[:, 4:7]
        cnt_col = old_mac[:, 7:8]
        com = jnp.where((sm > 0)[:, None], com, center)
        mac_parts.append(jnp.concatenate(
            [com, sm[:, None], center, cnt_col], axis=1))
        quad_parts.append(jnp.concatenate([
            jnp.stack([3 * sxx - tr, 3 * syy - tr, 3 * szz - tr,
                       3 * sxy, 3 * sxz, 3 * syz], axis=1),
            tree.quad_rows[sl, 6:8]], axis=1))      # stale emax, size
        trq_parts.append(tr)

    part_rows = jnp.concatenate([
        pos_s, mass_s[:, None], eps_s[:, None],
        jnp.zeros((n, 3), dtype)], axis=1)

    return dataclasses.replace(
        tree, pos_s=pos_s, mass_s=mass_s, eps_s=eps_s,
        part_rows=part_rows,
        mac_rows=jnp.concatenate(mac_parts, axis=0),
        quad_rows=jnp.concatenate(quad_parts, axis=0),
        trq=jnp.concatenate(trq_parts),
        drift=drift)
