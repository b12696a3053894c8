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
                 "mac_rows", "quad_rows", "node_start", "node_count",
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


def level_offsets(n: int, depth: int) -> List[int]:
    caps = _level_caps(n, depth)
    offs = [0]
    for c in caps:
        offs.append(offs[-1] + c)
    return offs  # length depth+2; offs[l] = start of level l


def build_octree(pos, mass, eps, valid, *, box=0.0, depth: int = 10,
                 dtype=None) -> Octree:
    """Build the full tree. Padding particles (mass 0, valid False) sort last
    via a sentinel key and contribute zero mass/moments."""
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

    bound_level = jnp.full(n, depth + 1, jnp.int32).at[0].set(0)
    for l in range(depth + 1):
        if l <= d_hi:
            pref = keys_s >> U32(3 * (d_hi - l))
            bnd = pref[1:] != pref[:-1]
        else:
            pref = lo_s >> U32(3 * (depth - l))
            bnd = (keys_s[1:] != keys_s[:-1]) | (pref[1:] != pref[:-1])
        boundary = jnp.concatenate([
            jnp.ones(1, jnp.int32), bnd.astype(jnp.int32)])
        # shallowest boundary level per particle (Morton prefixes nest),
        # cached so refresh_octree can rebuild segment ids without a sort
        bound_level = jnp.minimum(bound_level,
                                  jnp.where(boundary > 0, l, depth + 1))
        seg = jnp.cumsum(boundary) - 1
        seg_list.append(seg)
        cap = caps[l]
        segc = jnp.clip(seg, 0, cap - 1)

        sums = jax.ops.segment_sum(prods, segc, num_segments=cap,
                                   indices_are_sorted=True)  # (cap, 11)
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
        cnt = sums[:, 10].astype(jnp.int32)

        start = jax.ops.segment_min(idx_n, segc, num_segments=cap,
                                    indices_are_sorted=True)
        start = jnp.where(cnt > 0, start, 0)
        npref = jax.ops.segment_min(pref, segc, num_segments=cap,
                                    indices_are_sorted=True)
        emax = jax.ops.segment_max(jnp.where(valid_s, eps_s, 0.0), segc,
                                   num_segments=cap, indices_are_sorted=True)
        s_l = extent / (1 << l)
        if l <= d_hi:
            ix, iy, iz = cell_of_prefix(npref, l, d_hi)
        else:
            nhip = jax.ops.segment_min(keys_s, segc, num_segments=cap,
                                       indices_are_sorted=True)
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
        node_start = node_start.at[sl].set(start)
        node_count = node_count.at[sl].set(cnt)
        n_real = jnp.max(jnp.where(valid_s, seg, -1)) + 1
        n_nodes.append(jnp.minimum(n_real, cap).astype(jnp.int32))

    # child links: a node at level l+1 knows its parent (the level-l segment
    # of its first particle); children are contiguous, so parent's
    # child_start/count come from segment min/count over child indices.
    for l in range(depth):
        cap, cap_c = caps[l], caps[l + 1]
        seg_c = jnp.clip(seg_list[l + 1], 0, cap_c - 1)
        # parent segment id of each child node: level-l segment of the
        # child's first particle
        child_first = jax.ops.segment_min(idx_n, seg_c, num_segments=cap_c,
                                          indices_are_sorted=True)
        is_real_c = jnp.arange(cap_c) < n_nodes[l + 1]
        parent = jnp.clip(seg_list[l][jnp.clip(child_first, 0, n - 1)],
                          0, cap - 1)
        # junk segment `cap` for padding children so they pollute nothing
        parent = jnp.where(is_real_c, parent, cap)
        cidx = jnp.arange(cap_c, dtype=jnp.int32)
        cs = jax.ops.segment_min(jnp.where(is_real_c, cidx, cap_c), parent,
                                 num_segments=cap + 1,
                                 indices_are_sorted=True)[:cap]
        cc = jax.ops.segment_sum(is_real_c.astype(jnp.int32), parent,
                                 num_segments=cap + 1,
                                 indices_are_sorted=True)[:cap]
        sl = slice(offs[l], offs[l] + cap)
        child_start = child_start.at[sl].set(
            offs[l + 1] + jnp.clip(cs, 0, cap_c - 1))
        child_count = child_count.at[sl].set(cc)

    part_rows = jnp.concatenate([
        pos_s, mass_s[:, None], eps_s[:, None],
        jnp.zeros((n, 3), dtype)], axis=1)

    return Octree(
        perm=perm.astype(jnp.int32), pos_s=pos_s, mass_s=mass_s, eps_s=eps_s,
        keys_s=keys_s, part_rows=part_rows,
        mac_rows=mac_rows, quad_rows=quad_rows,
        node_start=node_start, node_count=node_count,
        child_start=child_start, child_count=child_count,
        n_nodes=n_nodes, level_offsets=tuple(offs[:-1]),
        origin=origin, extent=extent, bound_level=bound_level,
        drift=jnp.zeros((), dtype), depth=depth,
    )


def refresh_octree(tree: Octree, pos, mass, eps, valid) -> Octree:
    """Moments-only tree refresh on a FROZEN topology: the Morton
    permutation, segment structure, child links, particle ranges and
    geometric centers are reused; center of mass, mass, quadrupole and
    eps_max are recomputed exactly from the new positions.

    This is the TPU analog of the reference's dynamic node updates
    (force_update_node + MaxNodeMove, nbody/forcetree.c:433-571,941-948;
    rebuild cadence gravtree.c:63): between rebuilds, nodes carry exact
    moments but stale geometry. The accumulated ``drift`` (max particle
    displacement since the build) is returned on the tree so the walk
    can inflate cell sizes / containment bounds conservatively."""
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

    blvl = tree.bound_level
    mac_parts, quad_parts = [], []
    for l in range(depth + 1):
        cap = caps[l]
        seg = jnp.cumsum((blvl <= l).astype(jnp.int32)) - 1
        segc = jnp.clip(seg, 0, cap - 1)
        sums = jax.ops.segment_sum(prods, segc, num_segments=cap,
                                   indices_are_sorted=True)
        sm = sums[:, 0]
        com = sums[:, 1:4] / jnp.maximum(sm, 1e-30)[:, None]
        sxx = sums[:, 4] - sm * com[:, 0] * com[:, 0]
        syy = sums[:, 5] - sm * com[:, 1] * com[:, 1]
        szz = sums[:, 6] - sm * com[:, 2] * com[:, 2]
        sxy = sums[:, 7] - sm * com[:, 0] * com[:, 1]
        sxz = sums[:, 8] - sm * com[:, 0] * com[:, 2]
        syz = sums[:, 9] - sm * com[:, 1] * com[:, 2]
        tr = sxx + syy + szz
        emax = jax.ops.segment_max(jnp.where(valid_s, eps_s, 0.0), segc,
                                   num_segments=cap,
                                   indices_are_sorted=True)
        sl = slice(offs[l], offs[l] + cap)
        old_mac = tree.mac_rows[sl]
        center = old_mac[:, 4:7]
        cnt_col = old_mac[:, 7:8]
        com = jnp.where((sm > 0)[:, None], com, center)
        mac_parts.append(jnp.concatenate(
            [com, sm[:, None], center, cnt_col], axis=1))
        s_col = tree.quad_rows[sl, 7:8]
        quad_parts.append(jnp.concatenate([
            jnp.stack([3 * sxx - tr, 3 * syy - tr, 3 * szz - tr,
                       3 * sxy, 3 * sxz, 3 * syz], axis=1),
            emax[:, None], s_col], axis=1))

    part_rows = jnp.concatenate([
        pos_s, mass_s[:, None], eps_s[:, None],
        jnp.zeros((n, 3), dtype)], axis=1)

    return dataclasses.replace(
        tree, pos_s=pos_s, mass_s=mass_s, eps_s=eps_s,
        part_rows=part_rows,
        mac_rows=jnp.concatenate(mac_parts, axis=0),
        quad_rows=jnp.concatenate(quad_parts, axis=0),
        drift=drift)
