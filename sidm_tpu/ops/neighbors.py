"""Neighbour engine: multi-level hashed cell lists, fixed-shape candidates.

TPU-native replacement for the reference's tree-based range searches
(``ngb_treefind_variable``/``ngb_treefind``/``ngb_treesearch``,
nbody/forcetree.c:1991-2470) and for all three Hsml bisection loops
(``ensure_neighbours`` density.c:382-547, ``sidm_ensure_neighbours``
sidm.c:814-968, ``setup_smoothinglengths*`` init.c:234-513).

Design
------
* Particles are hashed into cubic cells at L dyadic levels (cell size
  ``s_l = s0 * 2^l``); all (level, type, cell) keys are sorted ONCE per
  build. Bucket (start, count) tables give O(1) lookups (binary search over
  millions of entries is a dependent-gather chain — slow on TPU).
* The per-particle payload (position, velocity, mass, type/flags) is
  PRE-PERMUTED into the sorted entry order at build time: a query then reads
  each stencil cell's candidates as CONTIGUOUS 32-byte rows instead of
  random per-particle gathers — the difference between ~1 and ~16 HBM
  transactions per candidate (TPU random gathers move 512-byte sublanes).
* A query at position x with radius h uses the smallest level with
  ``s_l >= h``; its 3^3 stencil then fully covers the ball. Neighbour type
  equals the query type (the reference searches ``trees[parttype]``,
  forcetree.c:2181).
* Smoothing lengths come from a top-k k-th-distance fixed point (self
  included, k = DesNumNgb) — the reference's count band holds by
  construction, with no bisection re-runs.

Payload row layout (PAYLOAD_DIM = 8 f32):
  [0:3] position, [3:6] velocity, [6] mass, [7] aux = ptype + 8*flag
where ``flag`` marks particles excluded as scattering partners (pending
SIDM kick). All functions are jit-compatible.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

U32 = jnp.uint32
PAYLOAD_DIM = 8


class NeighborTable(NamedTuple):
    rows: jax.Array          # (L*N, 8) f32 payload in sorted entry order
    sorted_part: jax.Array   # (L*N,) int32 particle index per entry
    bucket_start: jax.Array  # (L*H,) int32
    bucket_count: jax.Array  # (L*H,) int32
    origin: jax.Array        # (3,)
    s0: jax.Array            # () base cell size
    box: jax.Array           # () box size (0 = non-periodic)
    n_levels: int            # static
    n_hash: int              # static


def make_payload(pos, vel, mass, ptype, flag=None):
    """Pack the standard payload rows (see module docstring)."""
    aux = jnp.clip(ptype, 0, 7).astype(pos.dtype)
    if flag is not None:
        aux = aux + 8.0 * flag.astype(pos.dtype)
    return jnp.concatenate([
        pos, vel, mass[:, None], aux[:, None]], axis=1)


def payload_type(rows):
    return jnp.mod(rows[..., 7], 8.0).astype(jnp.int32)


def payload_flag(rows):
    return rows[..., 7] >= 8.0


def _mix(h):
    h = h ^ (h >> U32(16))
    h = h * U32(0x7FEB352D)
    h = h ^ (h >> U32(15))
    h = h * U32(0x846CA68B)
    h = h ^ (h >> U32(16))
    return h


def _cell_hash(ix, iy, iz, ptype, n_hash):
    h = (ix.astype(U32) * U32(0x9E3779B1)
         ^ iy.astype(U32) * U32(0x85EBCA77)
         ^ iz.astype(U32) * U32(0xC2B2AE3D)
         ^ (ptype.astype(U32) + U32(1)) * U32(0x27D4EB2F))
    return (_mix(h) % U32(n_hash)).astype(jnp.int32)


def _cell_coords(pos, origin, cell_size, box, level_scale):
    s = cell_size * level_scale
    ix = jnp.floor((pos - origin) / s).astype(jnp.int32)
    dims = jnp.maximum(jnp.floor(box / s), 1.0).astype(jnp.int32)
    s_eff = jnp.where(box > 0, box / dims.astype(pos.dtype), s)
    ixp = jnp.floor((pos - origin) / s_eff).astype(jnp.int32)
    ixp = jnp.remainder(ixp, dims)
    return jnp.where(box > 0, ixp, ix), dims


def build_table(pos, ptype, valid, *, s0, box=0.0, n_levels: int = 10,
                n_hash: int = 1 << 18, payload=None) -> NeighborTable:
    """Build the table. ``payload`` defaults to positions-only rows (velocity
    and mass zero) — pass :func:`make_payload` output for interaction
    kernels."""
    n = pos.shape[0]
    dtype = pos.dtype
    if payload is None:
        payload = make_payload(pos, jnp.zeros_like(pos),
                               jnp.zeros(n, dtype), ptype)
    origin = jnp.where(box > 0, jnp.zeros(3, dtype), jnp.min(pos, axis=0))
    posw = jnp.where(jnp.asarray(box) > 0, pos - box * jnp.floor(pos / box),
                     pos)

    keys = []
    for l in range(n_levels):
        c, _ = _cell_coords(posw, origin, s0, jnp.asarray(box, dtype),
                            jnp.asarray(2.0**l, dtype))
        h = _cell_hash(c[:, 0], c[:, 1], c[:, 2], ptype, n_hash)
        key = l * n_hash + h
        key = jnp.where(valid, key, n_levels * n_hash)  # sentinel: sorts last
        keys.append(key)
    all_keys = jnp.concatenate(keys)
    part = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_levels)
    order = jnp.argsort(all_keys)
    sorted_keys = all_keys[order]
    sorted_part = part[order]

    lh = n_levels * n_hash
    seg = jnp.clip(sorted_keys, 0, lh)
    counts = jax.ops.segment_sum(jnp.ones_like(seg), seg,
                                 num_segments=lh + 1,
                                 indices_are_sorted=True)[:lh]
    starts = jnp.cumsum(counts) - counts

    return NeighborTable(
        rows=payload[sorted_part],
        sorted_part=sorted_part,
        bucket_start=starts.astype(jnp.int32),
        bucket_count=counts.astype(jnp.int32),
        origin=origin,
        s0=jnp.asarray(s0, dtype),
        box=jnp.asarray(box, dtype),
        n_levels=n_levels,
        n_hash=n_hash,
    )


def level_for_radius(table: NeighborTable, h):
    lev = jnp.ceil(jnp.log2(jnp.maximum(h, 1e-30) / table.s0))
    return jnp.clip(lev, 0, table.n_levels - 1).astype(jnp.int32)


_STENCIL = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]


def gather_candidates(table: NeighborTable, pos_q, ptype_q, h_q, *, cap: int):
    """Candidate neighbours for a block of queries.

    Returns (idx (B,27*cap) int32, rows (B,27*cap,8), mask, overflow).
    Rows are read contiguously per stencil cell from the pre-permuted
    payload. The mask is type-exact (hash buckets can mix types/cells on
    collision; distance tests resolve spatial collisions downstream)."""
    dtype = pos_q.dtype
    box = table.box
    lev = level_for_radius(table, h_q)
    scale = (2.0 ** lev.astype(dtype))
    posw = jnp.where(box > 0, pos_q - box * jnp.floor(pos_q / box), pos_q)
    base, dims = _cell_coords(posw, table.origin, table.s0, box,
                              scale[:, None])

    keys = []
    for (dx, dy, dz) in _STENCIL:
        off = jnp.array([dx, dy, dz], jnp.int32)
        c = base + off
        c = jnp.where(box > 0, jnp.remainder(c, dims), c)
        hsh = _cell_hash(c[:, 0], c[:, 1], c[:, 2], ptype_q, table.n_hash)
        keys.append(lev * table.n_hash + hsh)
    key = jnp.stack(keys, axis=1)                        # (B,27)
    # dedupe buckets visited twice (hash collision or periodic wrap)
    dup = jnp.zeros(key.shape, bool)
    for j in range(1, len(_STENCIL)):
        dup = dup.at[:, j].set(
            jnp.any(key[:, :j] == key[:, j:j + 1], axis=1))
    start = table.bucket_start[key]
    count = jnp.where(dup, 0, table.bucket_count[key])   # (B,27)
    overflow = jnp.any(count > cap, axis=1)

    rank = jnp.arange(cap, dtype=jnp.int32)
    entry = start[:, :, None] + rank[None, None, :]      # (B,27,cap)
    mask = rank[None, None, :] < jnp.minimum(count, cap)[:, :, None]
    entry = jnp.clip(entry, 0, table.sorted_part.shape[0] - 1)
    b = pos_q.shape[0]
    idx = table.sorted_part[entry].reshape(b, -1)
    dim = table.rows.shape[-1]  # payloads may be wider than PAYLOAD_DIM
    rows = table.rows[entry].reshape(b, -1, dim)
    mask = mask.reshape(b, -1) & (payload_type(rows) == ptype_q[:, None])
    return idx, rows, mask, overflow


def knn_radius(table: NeighborTable, pos_q, ptype_q, h_guess, k: int,
               *, cap: int, n_iter: int = 3, boundary_pad: float = 1.0001):
    """Radius enclosing exactly k same-type particles (self included).

    Fixed-point on the stencil level; replaces the reference's MAXITER=30/60
    bisections. Returns (h, count_at_h, overflow)."""
    box = table.box

    def one_iter(h):
        _, rows, mask, ovf = gather_candidates(table, pos_q, ptype_q, h,
                                               cap=cap)
        d = rows[..., 0:3] - pos_q[:, None, :]
        d = jnp.where(box > 0, d - box * jnp.round(d / box), d)
        r2 = jnp.sum(d * d, axis=-1)
        r2 = jnp.where(mask, r2, jnp.inf)
        kth = -lax.top_k(-r2, k)[0][:, -1]
        n_cand = jnp.sum(mask, axis=1)
        h_new = jnp.where(n_cand >= k,
                          jnp.sqrt(jnp.maximum(kth, 0.0)) * boundary_pad,
                          h * 2.0)
        return h_new, r2, ovf

    h = h_guess
    for _ in range(n_iter):
        h, r2, ovf = one_iter(h)
    cnt = jnp.sum((r2 < (h * h)[:, None]) & jnp.isfinite(r2), axis=1)
    return h, cnt, ovf


def default_cell_size(pos, valid, k: int, box=0.0):
    """Base cell size heuristic (host-side)."""
    import numpy as np
    p = np.asarray(pos)[np.asarray(valid)]
    n = max(len(p), 1)
    if float(box) > 0:
        vol = float(box) ** 3
    else:
        ext = p.max(axis=0) - p.min(axis=0) if n > 1 else np.ones(3)
        vol = float(np.prod(np.maximum(ext, 1e-10)))
    r_k = (3.0 * k * vol / (4.0 * np.pi * n)) ** (1.0 / 3.0)
    return max(r_k / 4.0, 1e-10)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("k", "cap", "n_iter"))
def _knn_chunk(table, pq, tq, hq, k, cap, n_iter):
    return knn_radius(table, pq, tq, hq, k, cap=cap, n_iter=n_iter)


def setup_smoothing_lengths(p, des_num_ngb: int, max_dev: int, box=None,
                            cap: int = 96, chunk: int = 65536):
    """Initial hsml_vd for all collisionless particles
    (init.c setup_smoothinglengths_sidm -> setup_nbr_sidm, sidm.c:630-805).

    The per-target loop is chunked at the HOST level (one compiled
    executable reused per chunk): a single multi-hundred-iteration device
    loop of large gathers destabilizes the axon TPU backend."""
    import dataclasses

    boxv = 0.0 if box is None else float(box)
    s0 = default_cell_size(p.pos, p.valid, des_num_ngb, boxv)
    table = build_table(p.pos, p.ptype, p.valid, s0=s0, box=boxv)

    n = p.pos.shape[0]
    chunk = min(chunk, n)
    npad = -(-n // chunk) * chunk
    pos_q = jnp.pad(p.pos, ((0, npad - n), (0, 0)))
    ptype_q = jnp.pad(p.ptype, (0, npad - n), constant_values=-1)
    h0 = jnp.full((npad,), 2.0 * s0, p.pos.dtype)

    hs, cs = [], []
    for i in range(npad // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        h_c, cnt_c, _ = _knn_chunk(table, pos_q[sl], ptype_q[sl], h0[sl],
                                   des_num_ngb, cap, 4)
        hs.append(h_c)
        cs.append(cnt_c)
    h = jnp.concatenate(hs)[:n]
    cnt = jnp.concatenate(cs)[:n]
    hsml_vd = jnp.where(p.is_collisionless, h, p.hsml_vd)
    ngb_vd = jnp.where(p.is_collisionless, cnt, p.ngb_vd).astype(jnp.int32)
    return dataclasses.replace(p, hsml_vd=hsml_vd, ngb_vd=ngb_vd)


def with_payload(table: NeighborTable, payload) -> NeighborTable:
    """Re-attach a (possibly wider) payload to an existing table without
    re-sorting — one permutation gather. Column 7 must stay the aux field."""
    return table._replace(rows=payload[table.sorted_part])
