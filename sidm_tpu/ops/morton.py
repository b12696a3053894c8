"""Morton (Z-order) keys for spatial sorting.

The reference builds a pointer-chained geometric octree by incremental
insertion (nbody/forcetree.c:241-345). On TPU the equivalent spatial
structure comes from sorting particles by Morton key: an octree node at depth
d is exactly a run of equal key prefixes (3d leading bits), so the whole tree
is derivable from one radix sort plus segment reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U32 = jnp.uint32

MAX_DEPTH = 10  # 3*10 = 30 bits in uint32


def _expand_bits(v):
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v.astype(U32) & U32(0x3FF)
    v = (v | (v << U32(16))) & U32(0x030000FF)
    v = (v | (v << U32(8))) & U32(0x0300F00F)
    v = (v | (v << U32(4))) & U32(0x030C30C3)
    v = (v | (v << U32(2))) & U32(0x09249249)
    return v


def morton_keys(pos, origin, extent, depth: int = MAX_DEPTH):
    """(N,) uint32 Morton keys at ``depth`` levels (cells = 2^depth per axis).

    Coordinates outside [origin, origin+extent) are clamped — harmless for
    isolated systems where the bounding cube is computed from the data.
    """
    grid = jnp.float32(1 << depth)
    x = (pos - origin) / extent * grid
    ij = jnp.clip(x, 0.0, grid - 1.0).astype(jnp.int32)
    key = (_expand_bits(ij[:, 0]) << U32(2)) \
        | (_expand_bits(ij[:, 1]) << U32(1)) \
        | _expand_bits(ij[:, 2])
    return key


def morton_keys2(pos, origin, extent, depth: int):
    """Two-word Morton keys for depth > 10 (TPU jax has no real uint64:
    64-bit ints silently truncate to 32 without x64 mode).

    Returns (hi, lo): hi = the 30-bit key of the first min(depth,10)
    levels; lo = the remaining (depth-10)*3 bits (0 when depth <= 10).
    (hi, lo) sorts lexicographically like the full-depth key.
    """
    d_hi = min(depth, MAX_DEPTH)
    d_lo = depth - d_hi
    grid = jnp.float32(1 << depth)
    x = (pos - origin) / extent * grid
    ij = jnp.clip(x, 0.0, grid - 1.0).astype(jnp.int32)   # depth bits/axis
    ij_hi = ij >> d_lo
    hi = (_expand_bits(ij_hi[:, 0]) << U32(2)) \
        | (_expand_bits(ij_hi[:, 1]) << U32(1)) \
        | _expand_bits(ij_hi[:, 2])
    if d_lo == 0:
        return hi, jnp.zeros_like(hi)
    mask = (1 << d_lo) - 1
    ij_lo = ij & mask
    lo = (_expand_bits(ij_lo[:, 0]) << U32(2)) \
        | (_expand_bits(ij_lo[:, 1]) << U32(1)) \
        | _expand_bits(ij_lo[:, 2])
    return hi, lo


def bounding_cube(pos, valid, box=0.0, pad: float = 1.001):
    """(origin (3,), extent ()) cube enclosing all valid positions.

    Periodic runs use the box itself (forcetree builds over the box domain).
    """
    if box:
        b = jnp.asarray(box, pos.dtype)
        return jnp.zeros(3, pos.dtype), b
    big = jnp.asarray(jnp.inf, pos.dtype)
    lo = jnp.min(jnp.where(valid[:, None], pos, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pos, -big), axis=0)
    ext = jnp.max(hi - lo) * pad
    ext = jnp.maximum(ext, 1e-10)
    center = 0.5 * (lo + hi)
    return center - 0.5 * ext, ext


def _compact_bits(v):
    v = v & U32(0x09249249)
    v = (v | (v >> U32(2))) & U32(0x030C30C3)
    v = (v | (v >> U32(4))) & U32(0x0300F00F)
    v = (v | (v >> U32(8))) & U32(0x030000FF)
    v = (v | (v >> U32(16))) & U32(0x3FF)
    return v


def cell_of_prefix(prefix, level: int, depth: int = MAX_DEPTH):
    """Integer (ix,iy,iz) of a node given its 3*level-bit Morton prefix."""
    p = prefix.astype(U32) << U32(3 * (depth - level))
    ix = _compact_bits(p >> U32(2))
    iy = _compact_bits(p >> U32(1))
    iz = _compact_bits(p)
    shift = depth - level
    return (ix >> U32(shift)).astype(jnp.int32), \
           (iy >> U32(shift)).astype(jnp.int32), \
           (iz >> U32(shift)).astype(jnp.int32)


def cell_of_prefix2(hipref, lopref, level: int, depth: int):
    """(ix,iy,iz) at ``level`` from two-word prefixes (morton_keys2).

    hipref = hi >> 3*(10-min(level,10)) (full hi for level >= 10);
    lopref = lo >> 3*(depth-level) (ignored for level <= 10)."""
    d_hi = min(depth, MAX_DEPTH)
    d_lo = depth - d_hi
    if level <= d_hi:
        return cell_of_prefix(hipref, level, d_hi)
    hx, hy, hz = cell_of_prefix(hipref, d_hi, d_hi)
    dl = level - d_hi
    p = lopref.astype(U32) << U32(3 * (d_lo - dl))
    lx = (_compact_bits(p >> U32(2)) >> U32(d_lo - dl)).astype(jnp.int32)
    ly = (_compact_bits(p >> U32(1)) >> U32(d_lo - dl)).astype(jnp.int32)
    lz = (_compact_bits(p) >> U32(d_lo - dl)).astype(jnp.int32)
    return (hx << dl) | lx, (hy << dl) | ly, (hz << dl) | lz
