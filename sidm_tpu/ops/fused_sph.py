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
    # strict r < gh (unclamped): a parked dead slot (gh=0) can duplicate a
    # real particle's position, and its r=0 self-pair must not pass — the
    # W(0)/hb^3 value would overflow in the dead lane
    ok = (okw[:, None, :] & (r < gh[:, :, None])
          & (s_type == 0)[:, None, :])
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
        # clamp only approaching pairs: the reference evaluates the limiter
        # inside the if(vdotr2<0) branch (hydra.c:275,300-308)
        return jnp.where((vdotr2 < 0) & (dt > 1e-30) & (dwk < 0),
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
    # segment keys pack cnt as min(cnt, 31) and _unpack_entries' 32-slot
    # window only covers off+cnt <= 32 with off <= 15, so leaf segments
    # must hold at most 16 particles
    assert cfg.leaf_cap <= 16, "fused SPH packing requires leaf_cap <= 16"

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


# ---------------------------------------------------------------------------
# drivers: density() and hydro_force() over the fused range walk
# ---------------------------------------------------------------------------


def _gas_windows(tree, h_sorted, cfg: FusedConfig):
    """Morton windows over the compacted gas subset (h_sorted > 0 gates)."""
    n = tree.pos_s.shape[0]
    return make_gated_windows(tree.keys_s, h_sorted, n, cfg.group_size,
                              tree.depth, cfg.break_level, cfg.group_block)


def _unsort(x, gvalid, pidx, inv, n, fill):
    """Scatter per-slot results back to original particle order."""
    flat_idx = jnp.where(gvalid, pidx, n).reshape(-1)
    buf = jnp.full((n + 1,) + x.shape[2:], fill, x.dtype)
    return buf.at[flat_idx].set(x.reshape((-1,) + x.shape[2:]))[:n][inv]


def sph_density_fused(p: Particles, pos_pred, vel_pred, tree: Octree, time,
                      active, params: SphParams,
                      cfg: Optional[FusedConfig] = None, box: float = 0.0,
                      hsml_iters: int = 4):
    """Tree-segment ``density()`` (nbody/density.c:21-354): rho, div v,
    curl v, DtDensity/DtHsml for gas, over the fused range walk.

    Smoothing lengths are refreshed by ``hsml_iters`` rounds of the
    multiplicative neighbour-count controller (replacing
    ensure_neighbours' bisection, density.c:382-547); the counting passes
    reuse the density tile so the fixed point is consistent with the
    enumeration that prices the pairs. ``hsml_iters=0`` keeps ``p.hsml``.
    Returns the updated Particles (same fields as ops/sph.py
    ``sph_density``)."""
    cfg = cfg or FusedConfig()
    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    depth = tree.depth
    is_gas = p.is_gas
    upd = is_gas & active

    perm = tree.perm
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    ps = pos_pred[perm]
    vs = vel_pred[perm]
    aux = jnp.clip(p.ptype, 0, 7).astype(dtype)
    # non-gas and padding particles park with type 7 so the s_type==0 tile
    # test drops them even when they share a leaf segment with gas
    aux = jnp.where(is_gas & p.valid, aux, 7.0)[perm]
    rows = jnp.concatenate([ps, vs, p.mass[perm][:, None], aux[:, None]],
                           axis=1)
    st = pack_sph_tree(tree, rows)

    # cold start (hsml == 0, setup_smoothinglengths analog init.c:234-513):
    # seed from tree cell counts — without it the gated windows are empty
    # and the multiplicative controller is stuck at 0 forever
    from .fused_range import cell_count_hsml_seed
    seed = cell_count_hsml_seed(tree, params.des_num_ngb)
    hsml = jnp.where(p.hsml > 0, p.hsml, seed)
    hsml = jnp.where(is_gas, jnp.maximum(hsml, params.min_gas_hsml), 0.0)
    h_gate = hsml[perm]
    pidx, gvalid, ngp, GB, NB = _gas_windows(tree, h_gate, cfg)

    gt = jnp.where(gvalid[..., None], ps[pidx], 0.0)
    gv = jnp.where(gvalid[..., None], vs[pidx], 0.0)
    gidx = jnp.where(gvalid, pidx, -1)
    scal = jnp.zeros((), dtype)
    state0 = (jnp.zeros((ngp, cfg.group_size), dtype),
              jnp.zeros((ngp, cfg.group_size), dtype),
              jnp.zeros((ngp, cfg.group_size, 3), dtype),
              jnp.zeros((ngp, cfg.group_size), jnp.int32))

    def one_pass(h_flat):
        hs = h_flat[perm]
        gh = jnp.where(gvalid, hs[pidx], 0.0)
        live_t = gvalid & (gh > 0)
        glo, ghi, pad = _group_bbox(gt, live_t, gh, tree, box)
        state, ovf = _eval_jit(
            st, (gt, gv, gh, gidx), glo, ghi, pad, tree.extent, tree.drift,
            scal, state0, cfg=cfg, depth=depth, n_real=n, box=float(box),
            use_hmax=False, tile_name="density")
        return state, ovf

    # bracketed neighbour-count solve (ensure_neighbours' Left/Right
    # bisection, density.c:382-547): a plain multiplicative update
    # oscillates on outliers whose count jumps across the target band
    # within one factor-2 move (e.g. 1 <-> 500 on a far halo particle)
    des = jnp.asarray(params.des_num_ngb, dtype)
    dev = jnp.asarray(params.max_num_ngb_dev, dtype)
    left = jnp.zeros_like(hsml)
    right = jnp.full_like(hsml, jnp.inf)
    for _ in range(hsml_iters):
        (_, _, _, cnt), _ = one_pass(hsml)
        cnt_f = _unsort(cnt, gvalid, pidx, inv, n, jnp.int32(0)) \
            .astype(dtype)
        low = cnt_f < des - dev
        high = cnt_f > des + dev
        left = jnp.where(low, jnp.maximum(left, hsml), left)
        right = jnp.where(high, jnp.minimum(right, hsml), right)
        prop = hsml * jnp.clip(
            (des / jnp.maximum(cnt_f, 1.0)) ** (1.0 / 3.0), 0.5, 2.0)
        bracketed = (left > 0) & jnp.isfinite(right)
        prop = jnp.where(bracketed, jnp.sqrt(left * right), prop)
        hsml = jnp.where(upd & (low | high),
                         jnp.maximum(prop, params.min_gas_hsml), hsml)

    (rho_s, divv_s, rot_s, cnt_s), ovf = one_pass(hsml)
    rho = _unsort(rho_s, gvalid, pidx, inv, n, jnp.asarray(0, dtype))
    divv = _unsort(divv_s, gvalid, pidx, inv, n, jnp.asarray(0, dtype))
    rot = _unsort(rot_s, gvalid, pidx, inv, n, jnp.asarray(0, dtype))
    ngb = _unsort(cnt_s, gvalid, pidx, inv, n, jnp.int32(0))

    rho_safe = jnp.maximum(rho, 1e-30)
    curl = jnp.sqrt(jnp.sum(rot * rot, axis=-1)) / rho_safe
    div_over_rho = divv / rho_safe

    # rate terms + DesNumNgb correction + floors (density.c:304-325),
    # identical to the cell engine (ops/sph.py sph_density)
    if params.comoving:
        hubble_a = hubble_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        prefac = 1.0 / (hubble_a * time**1.5)
        dt_density = -prefac * divv
        dt_hsml = -hsml * dt_density / (3.0 * rho_safe)
    else:
        dt_density = -divv
        dt_hsml = hsml * div_over_rho / 3.0

    dt_step = 2.0 * (time - p.current_time)
    ngb_safe = jnp.maximum(ngb, 1)
    corr = hsml / (2.0 * jnp.maximum(dt_step, 1e-30)) * (
        (params.des_num_ngb / ngb_safe) ** (1.0 / 3.0) - 1.0)
    dt_hsml = jnp.where(dt_step > 0, dt_hsml + corr, dt_hsml)
    dt_density = jnp.where(dt_step > 0,
                           jnp.maximum(-0.9 * rho / dt_step, dt_density),
                           dt_density)
    dt_hsml = jnp.where(dt_step > 0,
                        jnp.maximum(-0.9 * hsml / dt_step, dt_hsml),
                        dt_hsml)

    return dataclasses.replace(
        p,
        hsml=jnp.where(is_gas, hsml, p.hsml),
        density=jnp.where(upd, rho, p.density),
        div_vel=jnp.where(upd, div_over_rho, p.div_vel),
        curl_vel=jnp.where(upd, curl, p.curl_vel),
        dt_density=jnp.where(upd, dt_density, p.dt_density),
        dt_hsml=jnp.where(upd, dt_hsml, p.dt_hsml),
        ngb_sph=jnp.where(upd, ngb, p.ngb_sph).astype(jnp.int32),
    ), ovf


def hydro_force_fused(p: Particles, pos_pred, vel_pred, tree: Octree, time,
                      active, params: SphParams,
                      cfg: Optional[FusedConfig] = None, box: float = 0.0):
    """Tree-segment ``hydro_force()`` (nbody/hydra.c:16-441): symmetrized
    pressure + Monaghan viscosity accelerations and du/dt for gas.

    Pairs with r < max(h_i, h_j) are found by the hmax-aware walk (the
    reference's ngb_treefind_pairs, forcetree.c:2020-2155): each node
    carries the range-max Hsml of its Morton segment, and each target
    gathers BOTH half-kernels of every pair — scatter-free. Returns
    (acc, dt_egy) like ops/sph.py ``hydro_force``."""
    cfg = cfg or FusedConfig()
    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    depth = tree.depth
    is_gas = p.is_gas
    upd = is_gas & active

    rho = jnp.maximum(p.density, 1e-30)
    egy = jnp.maximum(p.egy_spec, params.min_egy_spec)
    pressure = GAMMA_MINUS1 * egy * rho
    csnd = jnp.sqrt(GAMMA * pressure / rho)
    p_over_rho2 = pressure / (rho * rho)
    # +1e-30: a cold (u=0, csnd=0) particle with no in-range neighbours
    # has div=curl=0 and the Balsara switch would be 0/0
    f_balsara = jnp.abs(p.div_vel) / (
        jnp.abs(p.div_vel) + p.curl_vel
        + 1e-4 * csnd / jnp.maximum(p.hsml, 1e-30) + 1e-30)
    dt_step = 2.0 * (time - p.current_time)

    if params.comoving:
        sqrt_a = jnp.sqrt(time)
        hubble_a = hubble_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        prefac = 1.0 / (s_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda) * time)
        fac_visc_fix = hubble_a * time**3
        egy_fac = time * sqrt_a
        mu_fac = time
    else:
        sqrt_a, hubble_a, prefac = 1.0, 0.0, 1.0
        fac_visc_fix, egy_fac, mu_fac = 1.0, 1.0, 1.0
    scal = tuple(jnp.asarray(x, dtype) for x in (
        prefac, fac_visc_fix, egy_fac, sqrt_a, hubble_a, mu_fac,
        params.art_bulk_visc))

    perm = tree.perm
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    ps = pos_pred[perm]
    vs = vel_pred[perm]
    hsml = jnp.where(is_gas, jnp.maximum(p.hsml, params.min_gas_hsml), 0.0)
    hs = hsml[perm]
    aux = jnp.clip(p.ptype, 0, 7).astype(dtype)
    aux = jnp.where(is_gas & p.valid, aux, 7.0)[perm]
    zero = jnp.zeros((n, 1), dtype)
    rows = jnp.concatenate([
        ps, vs, p.mass[perm][:, None], aux[:, None], hs[:, None],
        rho[perm][:, None], csnd[perm][:, None], f_balsara[perm][:, None],
        dt_step[perm][:, None], zero, zero, zero], axis=1)   # (N, 16)
    st = pack_sph_tree(tree, rows, hmax_sorted=hs)

    pidx, gvalid, ngp, GB, NB = _gas_windows(tree, hs, cfg)
    gt = jnp.where(gvalid[..., None], ps[pidx], 0.0)
    gv = jnp.where(gvalid[..., None], vs[pidx], 0.0)
    gh = jnp.where(gvalid, hs[pidx], 0.0)
    gm = jnp.where(gvalid, p.mass[perm][pidx], 0.0)
    grho = jnp.where(gvalid, rho[perm][pidx], 1.0)
    gpor2 = jnp.where(gvalid, p_over_rho2[perm][pidx], 0.0)
    gcs = jnp.where(gvalid, csnd[perm][pidx], 0.0)
    gfb = jnp.where(gvalid, f_balsara[perm][pidx], 0.0)
    gdt = jnp.where(gvalid, dt_step[perm][pidx], 0.0)
    gidx = jnp.where(gvalid, pidx, -1)

    live_t = gvalid & (gh > 0)
    glo, ghi, pad = _group_bbox(gt, live_t, gh, tree, box)
    state0 = (jnp.zeros((ngp, cfg.group_size, 3), dtype),
              jnp.zeros((ngp, cfg.group_size), dtype))
    (acc_s, de_s), ovf = _eval_jit(
        st, (gt, gv, gh, gm, grho, gpor2, gcs, gfb, gdt, gidx), glo, ghi,
        pad, tree.extent, tree.drift, scal, state0, cfg=cfg, depth=depth,
        n_real=n, box=float(box), use_hmax=True, tile_name="hydro")
    acc = _unsort(acc_s, gvalid, pidx, inv, n, jnp.asarray(0, dtype))
    dt_egy = _unsort(de_s, gvalid, pidx, inv, n, jnp.asarray(0, dtype))
    return (jnp.where(upd[:, None], acc, 0.0),
            jnp.where(upd, dt_egy, p.dt_egy), ovf)
