"""Fused frontier range walk for SPH: density + symmetric hydro force.

Tree-segment counterparts of ``density()`` (nbody/density.c:21-354) and
``hydro_force()`` (nbody/hydra.c:16-441) for large-N gas runs, built on
the fused-frontier machinery of ops/fused_force.py / ops/fused_range.py
(per-level node-id frontiers, per-block live widths, child-compacted
expansion, 16-particle packed near rows). The hashed cell-list path
(ops/sph.py) stays the small-N default; this engine shares the force
phase's octree so no second spatial structure is built.

Structural differences from the SIDM range walk (ops/fused_range.py):

* accumulators are purely ADDITIVE (density: rho/divv/rot/count; hydro:
  acc/du/dt), so the near pass threads a generic tuple-of-arrays state —
  no running argmax;
* the hydro pass needs pairs with r < max(h_i, h_j) (the reference's
  ``ngb_treefind_pairs``, forcetree.c:2020-2155). Instead of the cell
  engine's gather+scatter half-kernel split, the walk carries a per-NODE
  hmax (range max over the node's Morton segment) and accepts cells
  within max(group pad, node hmax): each target then gathers BOTH
  half-kernels of every pair it participates in — scatter-free, exactly
  the sum the reference accumulates for particle i;
* neighbour rows pack 16 fields (two 128-lane planes) so the hydro pair
  terms (h, rho, csound, Balsara factor, dt) ride the same contiguous
  lane slices as positions.

Smoothing lengths are refreshed by the multiplicative neighbour-count
controller (replacing ensure_neighbours' bisection, density.c:382-547):
count passes reuse the density tile, so the fixed point is consistent
with the enumeration that prices the pairs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import GAMMA, GAMMA_MINUS1
from ..cosmo import hubble_of_a, s_of_a
from ..kernels import sph_kernel, sph_kernel_deriv
from ..state import Particles
from .fused_force import (IMAX, FusedConfig, _expand_open, _w_schedule,
                          compact_plane)
from .fused_range import make_gated_windows
from .sph import SphParams
from .tree import Octree, level_offsets, range_max, sparse_max_table

# node row layout (8-wide): geometric center, count, starts, node hmax
_CTR = slice(0, 3)
_CNT = 3
_NSTART = 4
_CSTART = 5
_CCNT = 6
_HMAX = 7


class SphTree(NamedTuple):
    levels: tuple          # per level (cap_l, 8) f32 packed node rows
    rows16: jax.Array      # (ceil(N/16), 16*F) planar packed particle rows
    n_levels: tuple
    n_fields: int


def pack_sph_tree(tree: Octree, rows_sorted, hmax_sorted=None) -> SphTree:
    """Per-level 8-wide node rows (geometric center + per-node hmax from a
    sorted-range max over the node's Morton segment) and the 16-particle
    planar packing of ``rows_sorted`` (N, F)."""
    n = tree.pos_s.shape[0]
    depth = tree.depth
    offs = level_offsets(n, depth)
    dtype = tree.pos_s.dtype
    F = rows_sorted.shape[1]

    if hmax_sorted is not None:
        htab = sparse_max_table(hmax_sorted)

    levels = []
    for l in range(depth + 1):
        sl = slice(offs[l], offs[l + 1])
        mac = tree.mac_rows[sl]
        child_local = tree.child_start[sl] - (offs[l + 1] if l < depth else 0)
        start = tree.node_start[sl]
        cnt = tree.node_count[sl]
        if hmax_sorted is not None:
            hmax = range_max(htab, start, start + cnt)
        else:
            hmax = jnp.zeros(start.shape[0], dtype)
        row = jnp.concatenate([
            mac[:, 4:7],                                  # geometric center
            mac[:, 7:8],                                  # count
            start[:, None].astype(dtype),
            jnp.maximum(child_local, 0)[:, None].astype(dtype),
            tree.child_count[sl, None].astype(dtype),
            hmax[:, None].astype(dtype),
        ], axis=1)
        levels.append(row)

    np16 = -(-n // 16)

    def plane(v):
        if np16 * 16 != n:
            v = jnp.concatenate([v, jnp.zeros(np16 * 16 - n, dtype)])
        return v.reshape(np16, 16)

    rows16 = jnp.concatenate([plane(rows_sorted[:, k]) for k in range(F)],
                             axis=1)
    return SphTree(levels=tuple(levels), rows16=rows16,
                   n_levels=tuple(tree.n_nodes), n_fields=F)


def _sph_classify(rows, glo, ghi, pad, s_l, leaf_cap, last_level,
                  use_hmax, drift, box=0.0):
    """Descend/accept: cell box (center +- s_l/2) within the group pad OR
    (use_hmax) within the cell's own hmax+drift of the group bbox."""
    ctr = rows[..., _CTR]
    cnt = rows[..., _CNT]
    half = 0.5 * s_l
    if box:
        gc = 0.5 * (glo + ghi)[:, None, :]
        hw = 0.5 * (ghi - glo)[:, None, :]
        delta = ctr - gc
        delta = delta - box * jnp.round(delta / box)
        dx = jnp.maximum(jnp.abs(delta) - hw - half, 0.0)
    else:
        dx = jnp.maximum(
            jnp.maximum(glo[:, None, :] - ctr, ctr - ghi[:, None, :])
            - half, 0.0)
    d2 = jnp.sum(dx * dx, axis=-1)                        # (GB, WC)
    eff = pad[:, None]
    if use_hmax:
        eff = jnp.maximum(eff, rows[..., _HMAX] + drift)
    inr = d2 <= eff * eff
    live = (cnt > 0) & inr
    is_leaf = cnt <= leaf_cap
    seg = live & is_leaf
    deep = live & ~is_leaf
    if last_level:
        return seg, jnp.zeros_like(deep), deep
    return seg, deep, jnp.zeros_like(deep)


def _sph_level_pass(fids, live_w, tbl, s_l, nl_real, glo_b, ghi_b, pad_b,
                    *, W, WC, last, cfg, NB, GB, ng, use_hmax, drift,
                    box=0.0):
    """One level of the hmax-aware range walk: classify the frontier, emit
    seg/open (and big at the last level) key planes."""

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    def block_body(args):
        fids_b, glob, ghib, padb, live_b = args
        segk = jnp.full((GB, W), IMAX, jnp.int32)
        openk = jnp.full((GB, W), IMAX, jnp.int32)
        bigk = jnp.full((GB, W), IMAX, jnp.int32)

        def chunk(state):
            ci, segk, openk, bigk = state
            c0 = ci * WC
            ids = lax.dynamic_slice(fids_b, (jnp.int32(0), c0), (GB, WC))
            dead = (ids < 0) | (ids >= nl_real)
            rows = tbl[jnp.clip(ids, 0, tbl.shape[0] - 1)]
            rows = jnp.where(dead[..., None], 0.0, rows)
            seg, opn, big = _sph_classify(rows, glob, ghib, padb, s_l,
                                          cfg.leaf_cap, last, use_hmax,
                                          drift, box)
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
            return ci + 1, segk, openk, bigk

        def cond(state):
            return state[0] * WC < jnp.minimum(live_b, W)

        _, segk, openk, bigk = lax.while_loop(
            cond, chunk, (jnp.int32(0), segk, openk, bigk))
        return segk, openk, bigk

    segk, openk, bigk = lax.map(
        block_body, (blk(fids), glo_b, ghi_b, pad_b, live_w))
    return (segk.reshape(ng, W), openk.reshape(ng, W),
            bigk.reshape(ng, W))


def _unpack_entries(ent, rows16, F):
    """Decode packed segment entries (start*32+cnt) against the planar
    16-particle rows: per-slot fields (GB, S) + window mask + indices."""
    gb, sc = ent.shape
    live = ent != IMAX
    e = jnp.where(live, ent, 0)
    start = e >> 5
    cnt = jnp.where(live, e & 31, 0)
    row0 = start >> 4
    off = start & 15

    nrows = rows16.shape[0]
    rid = jnp.stack([row0, jnp.minimum(row0 + 1, nrows - 1)], axis=-1)
    g = rows16[rid.reshape(-1)].reshape(gb, sc, 2, 16 * F)
    slot = jnp.arange(32, dtype=jnp.int32)
    okw = (slot[None, None, :] >= off[:, :, None]) \
        & (slot[None, None, :] < (off + cnt)[:, :, None]) \
        & live[:, :, None]

    S = sc * 32
    j_idx = ((start >> 4 << 4)[:, :, None]
             + slot[None, None, :]).reshape(gb, S)
    okw = okw.reshape(gb, S)

    def field(f):
        return jnp.concatenate([g[..., 0, 16 * f:16 * (f + 1)],
                                g[..., 1, 16 * f:16 * (f + 1)]],
                               axis=-1).reshape(gb, S)

    return field, okw, j_idx


def _density_tile(ent, rows16, gs, scal, box=0.0):
    """rho, div v, rot v, neighbour count of packed segment entries against
    one group block (density.c:210-232 pair terms; self included in rho)."""
    gt, gv, gh, gidx = gs
    field, okw, j_idx = _unpack_entries(ent, rows16, 8)
    spx, spy, spz = field(0), field(1), field(2)
    svx, svy, svz = field(3), field(4), field(5)
    sm = field(6)
    s_type = jnp.mod(field(7), 8.0).astype(jnp.int32)

    d0 = gt[:, :, None, 0] - spx[:, None, :]
    d1 = gt[:, :, None, 1] - spy[:, None, :]
    d2c = gt[:, :, None, 2] - spz[:, None, :]
    if box:
        d0 = d0 - box * jnp.round(d0 / box)
        d1 = d1 - box * jnp.round(d1 / box)
        d2c = d2c - box * jnp.round(d2c / box)
    r = jnp.sqrt(d0 * d0 + d1 * d1 + d2c * d2c)           # (GB, G, S)

    hb = jnp.maximum(gh, 1e-30)[:, :, None]
    ok = okw[:, None, :] & (r < hb) & (s_type == 0)[:, None, :]
    u = r / hb
    wk = jnp.where(ok, sph_kernel(u) / hb**3, 0.0)
    dwk = jnp.where(ok, sph_kernel_deriv(u) / hb**4, 0.0)
    mj = sm[:, None, :]
    rho = jnp.sum(mj * wk, axis=-1)
    r_safe = jnp.maximum(r, 1e-30)
    w0 = gv[:, :, None, 0] - svx[:, None, :]
    w1 = gv[:, :, None, 1] - svy[:, None, :]
    w2 = gv[:, :, None, 2] - svz[:, None, :]
    fac = jnp.where(ok & (r > 0), mj * dwk / r_safe, 0.0)
    divv = -jnp.sum(fac * (d0 * w0 + d1 * w1 + d2c * w2), axis=-1)
    rx = jnp.sum(fac * (d1 * w2 - d2c * w1), axis=-1)
    ry = jnp.sum(fac * (d2c * w0 - d0 * w2), axis=-1)
    rz = jnp.sum(fac * (d0 * w1 - d1 * w0), axis=-1)
    cnt = jnp.sum(ok.astype(jnp.int32), axis=-1)
    return rho, divv, jnp.stack([rx, ry, rz], axis=-1), cnt


def _hydro_tile(ent, rows16, gs, scal, box=0.0):
    """Symmetrized pressure + artificial-viscosity pair terms, both
    half-kernels gathered per target (hydra.c:275-342). Reproduces the
    cell engine's gather+scatter split exactly: the dW(h_i) half carries
    i's viscosity limiter, the dW(h_j) half carries j's."""
    gt, gv, gh, gm, grho, gpor2, gcs, gfb, gdt, gidx = gs
    prefac, fac_visc_fix, egy_fac, sqrt_a, hubble_a, mu_fac, abv = scal
    field, okw, j_idx = _unpack_entries(ent, rows16, 16)
    spx, spy, spz = field(0), field(1), field(2)
    svx, svy, svz = field(3), field(4), field(5)
    sm = field(6)
    s_type = jnp.mod(field(7), 8.0).astype(jnp.int32)
    sh = field(8)
    srho = field(9)
    scs = field(10)
    sfb = field(11)
    sdt = field(12)

    d0 = gt[:, :, None, 0] - spx[:, None, :]
    d1 = gt[:, :, None, 1] - spy[:, None, :]
    d2c = gt[:, :, None, 2] - spz[:, None, :]
    if box:
        d0 = d0 - box * jnp.round(d0 / box)
        d1 = d1 - box * jnp.round(d1 / box)
        d2c = d2c - box * jnp.round(d2c / box)
    r2 = d0 * d0 + d1 * d1 + d2c * d2c
    r = jnp.sqrt(r2)

    hi = jnp.maximum(gh, 1e-30)[:, :, None]
    hj = jnp.maximum(sh, 1e-30)[:, None, :]
    pair = (okw[:, None, :] & (j_idx[:, None, :] != gidx[:, :, None])
            & (s_type == 0)[:, None, :])
    ok_i = pair & (r < hi)
    ok_j = pair & (r < hj)
    dwk_i = jnp.where(ok_i, sph_kernel_deriv(r / hi) / hi**4, 0.0)
    dwk_j = jnp.where(ok_j, sph_kernel_deriv(r / hj) / hj**4, 0.0)

    w0 = gv[:, :, None, 0] - svx[:, None, :]
    w1 = gv[:, :, None, 1] - svy[:, None, :]
    w2 = gv[:, :, None, 2] - svz[:, None, :]
    vdotr = d0 * w0 + d1 * w1 + d2c * w2
    vdotr2 = vdotr / sqrt_a + hubble_a * r2

    # pair-symmetric viscosity core (hydra.c:275-311)
    h_ij = 0.5 * (gh[:, :, None] + sh[:, None, :])
    c_ij = 0.5 * (gcs[:, :, None] + scs[:, None, :])
    rho_ij = 0.5 * (grho[:, :, None] + srho[:, None, :])
    mu = h_ij * vdotr2 / (r2 + 0.01 * h_ij * h_ij) * mu_fac
    f_ij = 0.5 * (gfb[:, :, None] + sfb[:, None, :])
    visc = jnp.where(
        vdotr2 < 0,
        (-abv * mu * c_ij + 2.0 * abv * mu * mu)
        / jnp.maximum(rho_ij, 1e-30) * f_ij,
        0.0)

    # per-half viscosity limiter (hydra.c:296-308): the dW(h_i) half uses
    # i's timestep, the dW(h_j) half uses j's — identical to the cell
    # engine's gather and scatter halves
    msum = 0.5 * (gm[:, :, None] + sm[:, None, :])
    r_safe = jnp.maximum(r, 1e-30)

    def limited(visc, dwk, dt):
        lim = fac_visc_fix * vdotr2 / jnp.where(
            dwk < 0, msum * (2.0 * dwk) * r_safe
            * jnp.maximum(dt, 1e-30), -1e30)
        return jnp.where((dt > 1e-30) & (dwk < 0),
                         jnp.minimum(visc, lim), visc)

    visc_i = limited(visc, dwk_i, gdt[:, :, None])
    visc_j = limited(visc, dwk_j, sdt[:, None, :])

    p_or2_j = (scs[:, None, :] ** 2) / (GAMMA
                                        * jnp.maximum(srho[:, None, :],
                                                      1e-30))
    pp = 2.0 * jnp.sqrt(jnp.maximum(gpor2[:, :, None] * p_or2_j, 0.0))
    mj = sm[:, None, :]
    hfc = prefac * 0.5 * mj * ((pp + visc_i) * dwk_i
                               + (pp + visc_j) * dwk_j) / r_safe
    ax = -jnp.sum(hfc * d0, axis=-1)
    ay = -jnp.sum(hfc * d1, axis=-1)
    az = -jnp.sum(hfc * d2c, axis=-1)
    de = jnp.sum(0.5 * egy_fac * hfc * vdotr2, axis=-1)
    return (jnp.stack([ax, ay, az], axis=-1), de)


def _sph_near_level(state, seg_sorted, max_live, rows16, gs_b, scal, tile,
                    cfg, NB, GB, box=0.0):
    """Near pass over one level's sorted (ng, W) segment-key plane with a
    generic additive accumulator tuple."""
    ng, W = seg_sorted.shape
    SC = min(cfg.sc, W)

    def near_block(args):
        ent_b = args[0]
        max_b = args[1]
        gsb = args[2:]
        st = tuple(jnp.zeros((GB,) + s.shape[1:], s.dtype) for s in state)

        def chunk(c):
            ci, st = c
            e = lax.dynamic_slice(ent_b, (jnp.int32(0), ci * SC), (GB, SC))
            d = tile(e, rows16, gsb, scal, box)
            return ci + 1, tuple(a + b for a, b in zip(st, d))

        def cond(c):
            return c[0] * SC < max_b

        _, st = lax.while_loop(cond, chunk, (jnp.int32(0), st))
        return st

    ent = seg_sorted.reshape(NB, GB, W)
    out = lax.map(near_block, (ent, max_live) + gs_b)
    out = tuple(x.reshape((ng,) + x.shape[2:]) for x in out)
    return tuple(a + b for a, b in zip(state, out))


def _sph_eval(st: SphTree, gs, glo, ghi, pad, extent, drift, scal,
              cfg: FusedConfig, depth: int, n_real: int, tile,
              state0, use_hmax: bool, box: float = 0.0):
    """Range walk + near pass over all levels (the _range_eval schedule)
    with a generic additive state and optional per-node hmax acceptance."""
    ng = gs[0].shape[0]
    GB = min(cfg.group_block, ng)
    NB = ng // GB
    assert NB * GB == ng

    ws = _w_schedule(cfg, depth, n_real, 0.5, True)
    l0 = cfg.start_level
    W0 = ws[l0]

    ovf = jnp.zeros(2, jnp.int32)

    def blk(x):
        return x.reshape((NB, GB) + x.shape[1:])

    gs_b = tuple(blk(x) for x in gs)
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

    state = state0

    def run_level(state, fids, live_w, ovf, tbl, s_l, nl_real, W, last, Wn):
        segk, openk, bigk = _sph_level_pass(
            fids, live_w, tbl, s_l, nl_real, glo_b, ghi_b, pad_b,
            W=W, WC=min(cfg.wc, W), last=last, cfg=cfg, NB=NB, GB=GB,
            ng=ng, use_hmax=use_hmax, drift=drift, box=box)
        seg_sorted = (jnp.sort(segk, axis=1) if cfg.sort_compact
                      else compact_plane(segk))
        n_seg = jnp.sum((segk != IMAX).astype(jnp.int32), axis=1)
        state = _sph_near_level(
            state, seg_sorted, jnp.max(n_seg.reshape(NB, GB), axis=1),
            st.rows16, gs_b, scal, tile, cfg, NB, GB, box)
        if last:
            return state, None, None, ovf, bigk
        fids, live_w, ovf, _ = _expand_open(
            openk, ovf, Wn=Wn, cfg=cfg, NB=NB, GB=GB, ng=ng)
        return state, fids, live_w, ovf, None

    for l in range(l0, min(l_scan, depth)):
        state, fids, live_w, ovf, _ = run_level(
            state, fids, live_w, ovf, st.levels[l], extent / (1 << l),
            st.n_levels[l], ws[l], False, ws[l + 1])

    if l_scan < depth:
        W = ws[l_scan]
        dtype = st.levels[0].dtype
        cap_s = max(st.levels[l].shape[0] for l in range(l_scan, depth))
        tbls = jnp.stack([
            jnp.concatenate([t, jnp.zeros((cap_s - t.shape[0], 8), dtype)])
            if t.shape[0] < cap_s else t
            for t in (st.levels[l] for l in range(l_scan, depth))])
        sls = jnp.stack([jnp.asarray(extent / (1 << l), dtype)
                         for l in range(l_scan, depth)])
        nls = jnp.stack([jnp.asarray(st.n_levels[l], jnp.int32)
                         for l in range(l_scan, depth)])

        def scan_body(carry, xs):
            state, fids, live_w, ovf = carry
            tbl, s_l, nl_real = xs
            state, fids, live_w, ovf, _ = run_level(
                state, fids, live_w, ovf, tbl, s_l, nl_real, W, False, W)
            return (state, fids, live_w, ovf), None

        (state, fids, live_w, ovf), _ = lax.scan(
            scan_body, (state, fids, live_w, ovf), (tbls, sls, nls))

    # last level + overfull-cell chunking (see fused_range._range_eval)
    W = ws[depth]
    tbl = st.levels[depth]
    state, _, _, ovf, bigk = run_level(
        state, fids, live_w, ovf, tbl, extent / (1 << depth),
        st.n_levels[depth], W, True, W)

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
    state = _sph_near_level(
        state, bkey, jnp.max(n_bk.reshape(NB, GB), axis=1),
        st.rows16, gs_b, scal, tile, cfg, NB, GB, box)
    n_big = jnp.sum((bigk != IMAX).astype(jnp.int32), axis=1)
    ovf = ovf.at[1].add(
        jnp.sum(jnp.maximum(n_big - cfg.big_cap, 0), dtype=jnp.int32)
        + jnp.sum(jnp.maximum(bcnt - 16 * cfg.big_chunks, 0),
                  dtype=jnp.int32))
    return state, ovf


@partial(jax.jit, static_argnames=("cfg", "depth", "n_real", "box",
                                   "use_hmax", "tile_name"))
def _eval_jit(st, gs, glo, ghi, pad, extent, drift, scal, state0, *,
              cfg, depth, n_real, box, use_hmax, tile_name):
    tile = {"density": _density_tile, "hydro": _hydro_tile}[tile_name]
    return _sph_eval(st, gs, glo, ghi, pad, extent, drift, scal, cfg,
                     depth, n_real, tile, state0, use_hmax, box)


def _group_bbox(gt, live_t, gh, tree, box):
    big = jnp.asarray(1e30, gt.dtype)
    glo = jnp.min(jnp.where(live_t[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(live_t[..., None], gt, -big), axis=1)
    any_v = jnp.any(live_t, axis=1)
    if box:
        glo = jnp.where(any_v[:, None], glo, jnp.asarray(1e18, gt.dtype))
        ghi = jnp.where(any_v[:, None], ghi, jnp.asarray(-1e18, gt.dtype))
    else:
        far_here = tree.origin + 4.0 * tree.extent
        glo = jnp.where(any_v[:, None], glo, far_here)
        ghi = jnp.where(any_v[:, None], ghi, far_here)
    pad = jnp.max(jnp.where(live_t, gh, 0.0), axis=1) + tree.drift
    return glo, ghi, pad
