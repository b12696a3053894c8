"""Level-synchronous octree build from Morton-sorted particles.

Replaces the reference's pointer octree + recursive moment pass
(``force_treebuild``/``force_update_node_recursive``, nbody/forcetree.c:
90-719) with pure array ops:

* particles are sorted by Morton key once;
* a node at level l is a run of equal 3l-bit key prefixes — segment ids come
  from a boundary-flag cumsum, multipole moments (mass, center of mass,
  quadrupole) from segment sums;
* child ranges are ``searchsorted`` of parent prefixes into the child level's
  parent-prefix array.

Unlike the reference there is one tree over ALL particle types (the
reference keeps ``trees[6]`` per type, forcetree.c:57, purely to reuse the
gravity tree for same-type neighbour searches — our neighbour engine is
separate, so gravity needs only the combined tree; forces are identical
because gravity sums over all types anyway).

All arrays are statically sized: level l holds at most ``min(8^l, n_cap)``
nodes. Real node counts are dynamic and masked.

The reference's lazy node updates (MaxNodeMove drift + TreeUpdateFrequency
rebuild cadence, gravtree.c:63-96) are unnecessary: a full rebuild is a sort
plus O(N log N) segment sums, cheap enough to run every step — and exact.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from .morton import bounding_cube, cell_of_prefix, morton_keys

U32 = jnp.uint32


class Octree(NamedTuple):
    # particle data in Morton order
    perm: jax.Array          # (N,) sorted order: sorted_x = x[perm]
    pos_s: jax.Array         # (N,3)
    mass_s: jax.Array        # (N,)
    eps_s: jax.Array         # (N,)
    # per-level node arrays (lists of length n_levels, sizes cap_l)
    node_mass: List[jax.Array]    # (cap_l,)
    node_eps: List[jax.Array]     # (cap_l,) max softening in node
    node_com: List[jax.Array]     # (cap_l,3)
    node_quad: List[jax.Array]    # (cap_l,6)  Q = sum m(3 xi xi^T - |xi|^2 I),
    #                                order (xx,yy,zz,xy,xz,yz)
    node_center: List[jax.Array]  # (cap_l,3) geometric cell center
    node_count: List[jax.Array]   # (cap_l,) int32 particles in node
    node_start: List[jax.Array]   # (cap_l,) int32 first particle (sorted order)
    child_start: List[jax.Array]  # (cap_l,) int32 first child at level l+1
    child_count: List[jax.Array]  # (cap_l,) int32
    n_nodes: List[jax.Array]      # () int32 real node count per level
    cell_size: List[jax.Array]    # () cell side per level
    origin: jax.Array             # (3,)
    extent: jax.Array             # ()
    depth: int                    # static


def _level_caps(n: int, depth: int, max_cap: int) -> List[int]:
    return [min(8**l, max_cap) for l in range(depth + 1)]


def build_octree(pos, mass, eps, valid, *, box=0.0, depth: int = 10,
                 dtype=None) -> Octree:
    """Build the full tree. Padding particles (mass 0, valid False) sort to
    wherever their key lands but contribute zero mass/moments."""
    dtype = dtype or pos.dtype
    n = pos.shape[0]
    origin, extent = bounding_cube(pos, valid, box=box)
    keys = morton_keys(pos, origin, extent, depth)
    # invalid particles: force key to the max cell so they cluster at the end
    keys = jnp.where(valid, keys, U32(0xFFFFFFFF))
    perm = jnp.argsort(keys)
    keys_s = keys[perm]
    pos_s = pos[perm]
    mass_s = jnp.where(valid[perm], mass[perm], 0.0)
    eps_s = eps[perm]
    valid_s = valid[perm]

    caps = _level_caps(n, depth, n)
    node_mass, node_com, node_quad, node_eps = [], [], [], []
    node_center, node_count, node_start = [], [], []
    child_start, child_count, n_nodes, cell_size = [], [], [], []

    # Per level: segment id of each sorted particle (invalid particles sort
    # last with the sentinel key; their segment carries zero weight and any
    # clipping merges them into the last real node harmlessly).
    seg_ids = []
    prefixes = []
    for l in range(depth + 1):
        shift = U32(3 * (depth - l))
        pref = keys_s >> shift
        boundary = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            (pref[1:] != pref[:-1]).astype(jnp.int32)])
        seg = jnp.cumsum(boundary) - 1                      # (N,)
        seg_ids.append(seg)
        prefixes.append(pref)

    idx_n = jnp.arange(n, dtype=jnp.int32)
    nprefs = []
    for l in range(depth + 1):
        cap = caps[l]
        seg = jnp.clip(seg_ids[l], 0, cap - 1)
        w = valid_s.astype(dtype)
        m = mass_s * w

        def seg_sum(x, seg=seg, cap=cap):
            return jax.ops.segment_sum(x, seg, num_segments=cap,
                                       indices_are_sorted=True)

        sm = seg_sum(m)
        smx = seg_sum(m[:, None] * pos_s)
        com = smx / jnp.maximum(sm, 1e-30)[:, None]
        # raw second moments for the traceless quadrupole about the COM:
        # Q_ij = 3*S_ij - delta_ij tr(S), S_ij = sum m (x-com)_i (x-com)_j
        #      = 3*(R_ij - M com_i com_j) - delta_ij (tr R - M |com|^2)
        rxx = seg_sum(m * pos_s[:, 0] * pos_s[:, 0])
        ryy = seg_sum(m * pos_s[:, 1] * pos_s[:, 1])
        rzz = seg_sum(m * pos_s[:, 2] * pos_s[:, 2])
        rxy = seg_sum(m * pos_s[:, 0] * pos_s[:, 1])
        rxz = seg_sum(m * pos_s[:, 0] * pos_s[:, 2])
        ryz = seg_sum(m * pos_s[:, 1] * pos_s[:, 2])
        sxx = rxx - sm * com[:, 0] * com[:, 0]
        syy = ryy - sm * com[:, 1] * com[:, 1]
        szz = rzz - sm * com[:, 2] * com[:, 2]
        sxy = rxy - sm * com[:, 0] * com[:, 1]
        sxz = rxz - sm * com[:, 0] * com[:, 2]
        syz = ryz - sm * com[:, 1] * com[:, 2]
        tr = sxx + syy + szz
        quad = jnp.stack([3 * sxx - tr, 3 * syy - tr, 3 * szz - tr,
                          3 * sxy, 3 * sxz, 3 * syz], axis=-1)

        cnt = seg_sum(valid_s.astype(jnp.int32))
        start = jax.ops.segment_min(idx_n, seg, num_segments=cap,
                                    indices_are_sorted=True)
        start = jnp.where(cnt > 0, start, 0)

        # node prefix (first occurrence) -> geometric center
        npref = jax.ops.segment_min(prefixes[l], seg, num_segments=cap,
                                    indices_are_sorted=True)
        nprefs.append(npref)
        s_l = extent / (1 << l)
        ix, iy, iz = cell_of_prefix(npref, l, depth)
        center = origin + (jnp.stack([ix, iy, iz], -1).astype(dtype) + 0.5) * s_l

        node_mass.append(sm)
        node_eps.append(jax.ops.segment_max(
            jnp.where(valid_s, eps_s, 0.0), seg, num_segments=cap,
            indices_are_sorted=True))
        node_com.append(jnp.where((cnt > 0)[:, None], com, center))
        node_quad.append(quad)
        node_center.append(center)
        node_count.append(cnt)
        node_start.append(start)
        n_real = jnp.max(jnp.where(valid_s, seg_ids[l], -1)) + 1
        n_nodes.append(n_real.astype(jnp.int32))
        cell_size.append(s_l)

    # child links: children of node p at level l are the contiguous nodes at
    # level l+1 whose prefix>>3 equals p's prefix
    for l in range(depth + 1):
        cap = caps[l]
        if l == depth:
            child_start.append(jnp.zeros(cap, jnp.int32))
            child_count.append(jnp.zeros(cap, jnp.int32))
            continue
        cap_c = caps[l + 1]
        n_c = n_nodes[l + 1]
        # pad beyond the real nodes with a sentinel that sorts last
        cparent = jnp.where(jnp.arange(cap_c) < n_c,
                            nprefs[l + 1] >> U32(3), U32(0xFFFFFFFF))
        lo = jnp.searchsorted(cparent, nprefs[l], side="left")
        hi = jnp.searchsorted(cparent, nprefs[l], side="right")
        child_start.append(lo.astype(jnp.int32))
        child_count.append((hi - lo).astype(jnp.int32))

    return Octree(
        perm=perm.astype(jnp.int32), pos_s=pos_s, mass_s=mass_s, eps_s=eps_s,
        node_mass=node_mass, node_eps=node_eps, node_com=node_com,
        node_quad=node_quad,
        node_center=node_center, node_count=node_count, node_start=node_start,
        child_start=child_start, child_count=child_count,
        n_nodes=n_nodes, cell_size=cell_size,
        origin=origin, extent=extent, depth=depth,
    )
