"""Tree-segment SIDM: DSMC scattering driven by the gravity octree.

The hashed cell-list engine (ops/neighbors.py) is exact but gather-bound:
every candidate costs a random 512-byte HBM transaction. This engine reuses
the force path's trick — neighbours arrive as CONTIGUOUS Morton segments
from a range walk over the octree — dropping per-candidate HBM cost ~16x
and sharing the tree with gravity.

Partner selection is reformulated ORDER-FREE so segments can be processed
in any chunking (and host-chunked for backend stability):

* The reference picks the first neighbour whose cumulative kernel-weighted
  probability crosses a uniform (sidm.c:352-388); marginally that is:
  scatter iff rand < min(P_max_gate, P_tot), partner j with probability
  p_j / P_tot. That distribution is sampled exactly by the GUMBEL-MAX
  trick: key_j = log p_j + Gumbel(u_ij), u_ij a counter-based uniform keyed
  by (step, target, neighbour); the arg-max over neighbours is an order-free
  running max. A second pass recovers the arg-max index by exact (bitwise
  deterministic) key equality.
* Smoothing lengths follow a multiplicative controller
  h *= clip((DesNumNgb/count)^(1/3)) — the analog of the reference's DtHsml
  feedback (density.c:304-325) — and the neighbour-count band gates
  scattering exactly as sidm.c:512-519 does.

Everything here works in the tree's Morton ordering; the orchestrator maps
back through tree.perm.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import SCAT_KERNEL_FACTOR
from ..cosmo import drift_factor
from ..kernels import sph_kernel
from ..rng import particle_uniforms, random_directions
from ..sidm_common import cross_section_co, sidm_cmax, sigma_v_product, salt_u32 as _salt_u32
from ..state import Particles
from .sidm import SidmParams, _perp_unit, _resolve_conflicts_compact
from .tree import Octree, build_octree
from .treeforce import (GROUP_SIZE, _append, _bbox_dist2, _pack3,
                        gather_groups, make_groups)

SEG_GATHER = 16  # particle slots per segment row (static)


class RangeWalkConfig(NamedTuple):
    group_size: int = 64
    frontier_factor: int = 8
    seg_factor: int = 24        # segment rows cap = factor * n_targets
    big_cell_cap: int = 8192
    final_chunks: int = 64
    scan_chunk: int = 16384     # segment rows per scan chunk
    start_level: int = 2


@partial(jax.jit, static_argnames=("cfg", "n_ref", "box"))
def range_walk(tree: Octree, glo, ghi, pad, cfg: RangeWalkConfig,
               n_ref=None, n_groups=None, box=0.0):
    """Particle segments of every cell intersecting each group's bbox
    expanded by ``pad`` (per-group search radius), under minimum-image
    wrap when ``box`` > 0. Segments arrive group-sorted within each level
    run; the caller sorts globally.

    Returns (seg_g, seg_s, seg_c, scnt, overflow)."""
    ngroups = glo.shape[0]
    depth = tree.depth
    l0 = cfg.start_level
    cap0 = min(8 ** l0, tree.pos_s.shape[0])
    if n_ref is None:
        n_ref = ngroups * cfg.group_size
    F = max(1 << 14, int(cfg.frontier_factor * n_ref), ngroups * cap0)
    F = -(-F // 8) * 8
    S_cap = int(cfg.seg_factor * n_ref)

    fg = jnp.repeat(jnp.arange(ngroups, dtype=jnp.int32), cap0,
                    total_repeat_length=ngroups * cap0)
    fn = jnp.tile(tree.level_offsets[l0]
                  + jnp.arange(cap0, dtype=jnp.int32), ngroups)
    padn = F - ngroups * cap0
    if padn < 0:
        raise ValueError("frontier too small for start level")
    fg = jnp.concatenate([fg, jnp.zeros(padn, jnp.int32)])
    fn = jnp.concatenate([fn, jnp.zeros(padn, jnp.int32)])
    slot = jnp.tile(jnp.arange(cap0, dtype=jnp.int32), ngroups)
    slot = jnp.concatenate([slot, jnp.full(padn, 1 << 30, jnp.int32)])
    alive = slot < tree.n_nodes[l0]
    if n_groups is not None:
        alive = alive & (fg < n_groups)

    seg_g = jnp.zeros(S_cap + F, jnp.int32)
    seg_s = jnp.zeros(S_cap + F, jnp.int32)
    seg_c = jnp.zeros(S_cap + F, jnp.int32)
    scnt = jnp.int32(0)
    big_g = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    big_s = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    big_c = jnp.zeros(cfg.big_cell_cap + F, jnp.int32)
    bcnt = jnp.int32(0)
    overflow = jnp.int32(0)
    box = box if box else None  # minimum-image cell test when periodic

    C = SEG_GATHER
    for l in range(l0, depth + 1):
        rows = tree.mac_rows[fn]
        ctr = rows[:, 4:7]
        cnt = rows[:, 7]
        s_l = tree.extent / (1 << l)

        gpad = pad[fg]
        c2 = _bbox_dist2(glo[fg] - (0.5 * s_l + gpad)[:, None],
                         ghi[fg] + (0.5 * s_l + gpad)[:, None], ctr, box)
        inter = (c2 <= 0.0) & alive & (cnt > 0)
        is_small = cnt <= C
        to_seg = inter & (is_small | (l == depth))
        to_open = inter & (~is_small) & (l < depth)
        category = jnp.where(to_open, 0, jnp.where(to_seg, 2, 3))
        perm, n_open, n_oa, n_oas = _pack3(category, F)
        fg_p = fg[perm]
        fn_p = fn[perm]
        zpad = jnp.zeros(F, jnp.int32)
        fg_pp = jnp.concatenate([fg_p, zpad])
        fn_pp = jnp.concatenate([fn_p, zpad])

        sgg = lax.dynamic_slice_in_dim(fg_pp, n_oa, F)
        sgn = lax.dynamic_slice_in_dim(fn_pp, n_oa, F)
        sg_start = tree.node_start[sgn]
        sg_cnt = tree.node_count[sgn]
        n_seg = n_oas - n_oa
        in_seg = jnp.arange(F) < n_seg
        if l < depth:
            (seg_g, seg_s, seg_c), scnt, ov = _append(
                [seg_g, seg_s, seg_c], scnt,
                [sgg, sg_start, jnp.minimum(sg_cnt, C)], n_seg, S_cap)
            overflow += ov
        else:
            small = in_seg & (sg_cnt <= C)
            perm2, n_sm, n_smb, _ = _pack3(
                jnp.where(small, 0, jnp.where(in_seg, 1, 2)), F)
            sgg2 = jnp.concatenate([sgg[perm2], zpad])
            st2 = jnp.concatenate([sg_start[perm2], zpad])
            cf2 = jnp.concatenate([sg_cnt[perm2], zpad])
            (seg_g, seg_s, seg_c), scnt, ov = _append(
                [seg_g, seg_s, seg_c], scnt,
                [sgg2[:F], st2[:F], jnp.minimum(cf2[:F], C)], n_sm, S_cap)
            overflow += ov
            (big_g, big_s, big_c), bcnt, ov = _append(
                [big_g, big_s, big_c], bcnt,
                [lax.dynamic_slice_in_dim(sgg2, n_sm, F),
                 lax.dynamic_slice_in_dim(st2, n_sm, F),
                 lax.dynamic_slice_in_dim(cf2, n_sm, F)],
                n_smb - n_sm, cfg.big_cell_cap)
            overflow += ov

        if l == depth:
            break
        O = F // 8
        og = fg_p[:O]
        on = fn_p[:O]
        open_ok = jnp.arange(O) < n_open
        overflow += jnp.maximum(n_open - O, 0)
        cs = tree.child_start[on]
        cc = tree.child_count[on]
        k = jnp.arange(8, dtype=jnp.int32)
        fn = (cs[:, None] + k[None, :]).reshape(-1)
        fg = jnp.repeat(og, 8, total_repeat_length=F)
        alive = ((k[None, :] < cc[:, None]) & open_ok[:, None]).reshape(-1)

    # chunk overfull deepest cells
    K, B = cfg.final_chunks, cfg.big_cell_cap
    kk = jnp.arange(K, dtype=jnp.int32)
    ch_start = (big_s[:B, None] + kk[None, :] * C).reshape(-1)
    ch_cnt = jnp.clip(big_c[:B, None] - kk[None, :] * C, 0, C).reshape(-1)
    ch_g = jnp.repeat(big_g[:B], K, total_repeat_length=B * K)
    ok = (ch_cnt > 0) & (jnp.repeat(jnp.arange(B), K,
                                    total_repeat_length=B * K) < bcnt)
    perm4, n_ch, _, _ = _pack3(jnp.where(ok, 0, 3), B * K)
    take = min(F, B * K)
    (seg_g, seg_s, seg_c), scnt, ov = _append(
        [seg_g, seg_s, seg_c], scnt,
        [ch_g[perm4][:take], ch_start[perm4][:take], ch_cnt[perm4][:take]],
        jnp.minimum(n_ch, take), S_cap)
    overflow += ov + jnp.maximum(n_ch - take, 0)

    # sort segments by group with junk keyed past the last group; sorted
    # runs make the scan's segment reductions streaming, not scattering
    skey = jnp.where(jnp.arange(seg_g.shape[0]) < scnt, seg_g, ngroups)
    order = jnp.argsort(skey[:S_cap])
    return (skey[:S_cap][order], seg_s[:S_cap][order], seg_c[:S_cap][order],
            jnp.minimum(scnt, S_cap), overflow)


def _mix32(a, b, c):
    u = (a.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ b.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ c.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
    u = u ^ (u >> jnp.uint32(16))
    u = u * jnp.uint32(0x7FEB352D)
    u = u ^ (u >> jnp.uint32(15))
    u = u * jnp.uint32(0x846CA68B)
    u = u ^ (u >> jnp.uint32(16))
    return u


def _pair_gumbel(i_idx, j_idx, salt):
    """Deterministic Gumbel noise per (target, neighbour, step) triple."""
    u = _mix32(i_idx, j_idx, salt)
    uf = (u >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1 / (1 << 24))
    uf = jnp.clip(uf, 1e-7, 1.0 - 1e-7)
    return -jnp.log(-jnp.log(uf))


def _seg_pass_chunk(part_rows, seg_g, seg_s, seg_c, i0, gt, gv, gh, gdt,
                    gtype, gidx, ptot, best, cnt, bj, time, sigma_co, salt,
                    params: SidmParams, Rs: int, mode: str, box=0.0):
    """One host chunk of segment rows.

    mode "A": accumulate (P_tot, running count, running max Gumbel key).
    mode "B": recover the arg-max neighbour by exact key equality.

    part_rows: (N, 8) [pos3, vel3, mass, aux=type+8*pending] in Morton order.
    Group-indexed arrays gt (ngroups,G,3), gv, gh, gdt, gtype.
    """
    ngroups = gt.shape[0]
    G = gt.shape[1]
    n = part_rows.shape[0]

    fg = lax.dynamic_slice_in_dim(seg_g, i0, Rs)
    st = lax.dynamic_slice_in_dim(seg_s, i0, Rs)
    ct = lax.dynamic_slice_in_dim(seg_c, i0, Rs)
    live = fg < ngroups
    fgc = jnp.minimum(fg, ngroups - 1)
    tgt = gt[fgc]
    th = gh[fgc]
    tv = gv[fgc]
    tdt = gdt[fgc]
    ttyp = gtype[fgc]
    i_idx = gidx[fgc]                 # (Rs,G) sorted index per target slot

    def one_slot(c, carry):
        ptot, best_c, cnt_c, bj_c = carry
        j_idx = st + c
        j_ok = (c < ct) & live
        row = part_rows[jnp.clip(j_idx, 0, n - 1)]
        sp = row[:, 0:3]
        svl = row[:, 3:6]
        sm = row[:, 6]
        aux = row[:, 7]
        s_type = jnp.mod(aux, 8.0).astype(jnp.int32)
        s_pend = aux >= 8.0

        d = sp[:, None, :] - tgt
        if box:
            d = d - box * jnp.round(d / box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        ok = (j_ok[:, None] & (j_idx[:, None] != i_idx) & (r < th)
              & (~s_pend)[:, None] & (s_type[:, None] == ttyp))
        th_safe = jnp.maximum(th, 1e-30)
        wk = sph_kernel(r / th_safe) / th_safe**3
        dvv = tv - svl[:, None, :]
        rv = jnp.sqrt(jnp.sum(dvv * dvv, axis=-1))
        sv = sigma_v_product(rv, time, sigma_co, params.cross_section_type,
                             params.yukawa_velocity,
                             params.cross_section_vel_scale,
                             params.cross_section_pow_law, params.comoving)
        prob = jnp.where(ok, 0.5 * sm[:, None] * wk * sv * tdt, 0.0)

        key = jnp.where(prob > 0,
                        jnp.log(jnp.maximum(prob, 1e-37))
                        + _pair_gumbel(i_idx, j_idx[:, None], salt),
                        -jnp.inf)

        def seg(x, fill=0):
            return jax.ops.segment_sum(x, fg, num_segments=ngroups + 1,
                                       indices_are_sorted=True)[:ngroups]

        ptot = ptot + seg(prob)
        cnt_c = cnt_c + seg(ok.astype(jnp.int32))
        kmax = jax.ops.segment_max(
            jnp.where(live[:, None], key, -jnp.inf), fg,
            num_segments=ngroups + 1, indices_are_sorted=True)[:ngroups]
        best_c = jnp.maximum(best_c, kmax)
        if mode == "B":
            hitb = (key == best[fgc]) & jnp.isfinite(key)
            jcand = jnp.where(hitb, j_idx[:, None], -1)
            jmax = jax.ops.segment_max(
                jnp.where(live[:, None], jcand, -1), fg,
                num_segments=ngroups + 1, indices_are_sorted=True)[:ngroups]
            bj_c = jnp.maximum(bj_c, jmax)
        return ptot, best_c, cnt_c, bj_c

    ptot, best_c, cnt, bj = lax.fori_loop(0, SEG_GATHER, one_slot,
                                          (ptot, best, cnt, bj))
    return ptot, best_c, cnt, bj


@partial(jax.jit, static_argnames=("params",))
def _tree_sidm_prep(p: Particles, pos_pred, perm, time, active, vmax, key,
                    params: SidmParams):
    """Sorted-space inputs for the scan, with the P_max pre-gate.

    The reference's first-stage gate (P_max vs one uniform, sidm.c:338-346)
    fails for the overwhelming majority of particles per step, so only gated
    targets (plus a small random maintenance sample that keeps the hsml
    controller fed) are given a nonzero search radius — the range walk and
    scan then do ~gate-rate of the full work. The same uniform is reused in
    the final scatter decision, so the statistics are exactly the two-stage
    rejection of the reference.

    Search radii are further capped at 8x the median smoothing length:
    low-density outskirt particles can have h spanning the whole system, and
    the kernel-weighted rate estimate is unbiased for ANY enumeration radius
    (their scattering probability is ~0 either way).
    """
    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    aux = (jnp.clip(p.ptype, 0, 7).astype(dtype)
           + 8.0 * has_pending.astype(dtype))
    rows = jnp.concatenate([
        pos_pred, p.vel, p.mass[:, None], aux[:, None]], axis=1)[perm]

    dt = 2.0 * (time - p.current_time)
    s_inv = drift_factor(time, params.hubble, params.omega0,
                         params.omega_lambda, params.comoving)
    dt_h0 = jnp.where(active, dt, 0.0) * s_inv
    sigma_co = cross_section_co(time, params.cross_section_internal,
                                params.cross_section_type, params.comoving)

    elig = active & p.is_collisionless & p.valid & (dt_h0 > 0) \
        & (~has_pending)
    h_med = jnp.nanmedian(jnp.where(p.is_collisionless & p.valid,
                                    p.hsml_vd, jnp.nan))
    h_cap = jnp.nan_to_num(8.0 * h_med, nan=jnp.inf)
    h_eff = jnp.minimum(SCAT_KERNEL_FACTOR * p.hsml_vd,
                        jnp.maximum(h_cap, 1e-30))

    c_pmax = sidm_cmax(
        time, vmax, params.cross_section_internal, params.cross_section_type,
        params.yukawa_velocity, params.cross_section_vel_scale,
        params.des_num_ngb, params.max_num_ngb_dev,
        params.hubble, params.omega0, params.omega_lambda,
        params.comoving, per_dt_h0=True)
    u = particle_uniforms(key, p.pid, 4)
    rand = u[:, 0].astype(dtype)
    hinv3 = jnp.where(h_eff > 0, 1.0 / jnp.maximum(h_eff, 1e-30) ** 3, 0.0)
    p_max = c_pmax * p.mass * hinv3 * dt_h0
    maintenance = u[:, 3].astype(dtype) < params.maintenance_rate
    scan = elig & ((rand < p_max) | maintenance)

    h_scat = jnp.where(scan, h_eff, 0.0)
    hs = h_scat[perm]
    dts = dt_h0[perm]
    typs = jnp.where(scan, p.ptype, -9)[perm]
    return rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand


@partial(jax.jit, static_argnames=("params", "log_events"))
def _tree_sidm_finish(p: Particles, pos_pred, perm, inv, ptot_t, best_t,
                      cnt_t, bj_t, time, active, scan, p_max, rand, vmax,
                      key, params: SidmParams, log_events: bool):
    """Scatter decision + conflict resolution + kicks + hsml controller.

    ``scan``/``p_max``/``rand`` come from the pre-gate in _tree_sidm_prep
    (same uniform for gate and crossing, as sidm.c:338-388)."""
    n = pos_pred.shape[0]
    dtype = pos_pred.dtype

    # back to original particle order
    ptot = ptot_t[inv]
    cnt = cnt_t[inv]
    bj_sorted = bj_t[inv]          # partner as SORTED index
    partner = jnp.where(bj_sorted >= 0,
                        perm[jnp.clip(bj_sorted, 0, n - 1)], -1)

    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    dt = 2.0 * (time - p.current_time)
    s_inv = drift_factor(time, params.hubble, params.omega0,
                         params.omega_lambda, params.comoving)
    dt_h0 = jnp.where(p.valid, dt, 0.0) * s_inv
    u = particle_uniforms(key, p.pid, 4)
    # NOTE on the reference's neighbour-count band check (sidm.c:512-519):
    # there it guards against an Hsml inconsistent with the tree search that
    # enumerated the neighbours. Here the range walk always enumerates ALL
    # particles within h, so Sum_j m_j W(r;h) is an unbiased rate estimate
    # for any h and gating on the count would only bias rates downward while
    # the controller settles; the band is therefore diagnostic only.
    eligible = p.is_collisionless & p.valid & (~has_pending)
    hit = (eligible & active & scan & (rand < p_max) & (rand < ptot)
           & (partner >= 0) & (~has_pending[jnp.clip(partner, 0, n - 1)]))

    # type-4 angular rejection (sidm.c:391-438)
    cos_theta = None
    pj0 = jnp.clip(partner, 0, n - 1)
    if params.cross_section_type == 4:
        vc = params.yukawa_velocity / jnp.sqrt(time) if params.comoving \
            else params.yukawa_velocity
        rel0 = p.vel - p.vel[pj0]
        rv0 = jnp.sqrt(jnp.sum(rel0 * rel0, axis=-1))
        beta = rv0 / vc
        cos_theta = 2.0 * u[:, 2].astype(dtype) - 1.0
        sin22 = 0.5 * (1.0 - cos_theta)
        denom = 1.0 + beta * beta * sin22
        hit = hit & (u[:, 1].astype(dtype) < 1.0 / (denom * denom)) \
            & (rv0 > 0)

    proposal = jnp.where(hit, partner, -1)
    accepted = _resolve_conflicts_compact(proposal, n)

    pj = jnp.clip(proposal, 0, n - 1)
    rel = p.vel - p.vel[pj]
    rv = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    nhat = random_directions(key, p.pid).astype(dtype)
    if params.cross_section_type == 4:
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
        nperp = _perp_unit(rel, nhat)
        delta = -rel + cos_theta[:, None] * rel + (sin_t * rv)[:, None] * nperp
    else:
        delta = -rel + rv[:, None] * nhat
    mi, mj = p.mass, p.mass[pj]
    msum = jnp.maximum(mi + mj, 1e-30)
    dv_i = (mj / msum)[:, None] * delta
    dv_j = -(mi / msum)[:, None] * delta
    dvel = p.dvel + jnp.where(accepted[:, None], dv_i, 0.0)
    dvel = dvel.at[pj].add(jnp.where(accepted[:, None], dv_j, 0.0))
    n_scattered = jnp.sum(accepted.astype(jnp.int32))

    # hsml controller toward DesNumNgb (density.c:304-325 analog); only
    # targets that were actually scanned this step may update
    upd = p.is_collisionless & p.valid & active & scan & (dt_h0 > 0)
    ratio = (params.des_num_ngb
             / jnp.maximum(cnt, 1).astype(dtype)) ** (1.0 / 3.0)
    h_new = p.hsml_vd * jnp.clip(ratio, 0.7, 1.3)
    p = dataclasses.replace(
        p, dvel=dvel,
        hsml_vd=jnp.where(upd, h_new, p.hsml_vd),
        ngb_vd=jnp.where(upd, cnt, p.ngb_vd).astype(jnp.int32))
    if log_events:
        from .sidm import _collect_events
        ev = _collect_events(p, pos_pred, time, accepted, pj, dv_i,
                             params.event_cap)
        return p, n_scattered, ev
    return p, n_scattered, None


@partial(jax.jit, static_argnames=("cfg",))
def _group_geometry(tree: Octree, hs, cfg: RangeWalkConfig):
    """Group targets by maximal tree cells (spatially compact; see
    treeforce.make_groups). Returns group arrays plus the per-slot sorted
    index/validity for scatter-back."""
    G = cfg.group_size
    grp_start, grp_cnt, n_groups, _ = make_groups(tree, G=G)
    idxg, gvalid, (gt, gh) = gather_groups(
        tree, grp_start, grp_cnt, n_groups, tree.pos_s, hs,
        fills=[0.0, 0.0])
    big = jnp.asarray(1e30, tree.pos_s.dtype)
    glo = jnp.min(jnp.where(gvalid[..., None], gt, big), axis=1)
    ghi = jnp.max(jnp.where(gvalid[..., None], gt, -big), axis=1)
    any_v = jnp.any(gvalid, axis=1)
    glo = jnp.where(any_v[:, None], glo, 0.0)
    ghi = jnp.where(any_v[:, None], ghi, 0.0)
    pad = jnp.max(jnp.where(gvalid, gh, 0.0), axis=1)
    return gt, gh, glo, ghi, pad, idxg, gvalid, n_groups


@partial(jax.jit, static_argnames=("params", "cfg", "box"))
def _scan_all(rows, seg_g, seg_s, seg_c, scnt, gt, gv, gh, gdt, gtype,
              gidx, time, sigma_co, salt, params: SidmParams,
              cfg: RangeWalkConfig, box=0.0):
    """Both scan passes as device-side while_loops over segment chunks."""
    ng, G = gh.shape
    dtype = gt.dtype
    Rs = min(cfg.scan_chunk, seg_g.shape[0])

    def run_pass(mode, best_in):
        ptot = jnp.zeros((ng, G), dtype)
        best = jnp.full((ng, G), -jnp.inf, dtype) if mode == "A" else best_in
        cnt = jnp.zeros((ng, G), jnp.int32)
        bj = jnp.full((ng, G), -1, jnp.int32)

        def cond(st):
            return st[0] * Rs < scnt

        def body(st):
            i, ptot, best, cnt, bj = st
            ptot, best, cnt, bj = _seg_pass_chunk(
                rows, seg_g, seg_s, seg_c, i * Rs, gt, gv, gh, gdt, gtype,
                gidx, ptot, best, cnt, bj, time, sigma_co, salt, params,
                Rs, mode, box)
            return i + 1, ptot, best, cnt, bj

        _, ptot, best, cnt, bj = lax.while_loop(
            cond, body, (jnp.int32(0), ptot, best, cnt, bj))
        return ptot, best, cnt, bj

    ptot, best, cnt, _ = run_pass("A", None)
    _, _, _, bj = run_pass("B", best)
    return ptot, best, cnt, bj


def sidm_scatter_tree(p: Particles, pos_pred, tree: Octree, time, active,
                      vmax, key, params: SidmParams, box=0.0,
                      cfg: RangeWalkConfig = None, salt: int = 0):
    """Tree-segment DSMC pass (prep -> range walk -> two-pass scan ->
    finish, each its own executable).

    ``tree`` must be built at ``pos_pred``. Returns (p', n_scattered[,events])
    like sidm_scatter."""
    cfg = cfg or RangeWalkConfig()
    n = pos_pred.shape[0]
    G = cfg.group_size

    rows, hs, dts, typs, sigma_co, scan, h_eff, p_max, rand = \
        _tree_sidm_prep(p, pos_pred, tree.perm, time, active, vmax, key,
                        params)
    gt, gh, glo, ghi, pad, idxg, gvalid, n_groups = _group_geometry(
        tree, hs, cfg)

    seg_g, seg_s, seg_c, scnt, ovf = range_walk(
        tree, glo, ghi, pad, cfg, n_ref=n, n_groups=n_groups, box=box)

    gv, gdt4, gty = _gather_group_fields(rows, dts, typs, idxg, gvalid)
    gidx = jnp.where(gvalid, idxg, -1)

    ptot, best, cnt, bj = _scan_all(
        rows, seg_g, seg_s, seg_c, scnt, gt, gv, gh, gdt4, gty, gidx,
        time, sigma_co, _salt_u32(salt), params, cfg, box)

    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))

    def unflat(x, fill):
        flat_idx = jnp.where(gvalid, idxg, n).reshape(-1)
        buf = jnp.full((n + 1,), fill, x.dtype)
        return buf.at[flat_idx].set(x.reshape(-1))[:n]

    out = _tree_sidm_finish(
        p, pos_pred, tree.perm, inv, unflat(ptot, 0.0),
        unflat(best, -jnp.inf), unflat(cnt, 0), unflat(bj, -1),
        time, active, scan, p_max, rand, vmax, key, params,
        params.log_events)
    p2, n_scat, ev = out
    if params.log_events:
        return p2, n_scat, ev
    return p2, n_scat


@jax.jit
def _gather_group_fields(rows, dts, typs, idxg, gvalid):
    idxc = jnp.clip(idxg, 0, rows.shape[0] - 1)
    gv = jnp.where(gvalid[..., None], rows[idxc][..., 3:6], 0.0)
    gdt = jnp.where(gvalid, dts[idxc], 0.0)
    gty = jnp.where(gvalid, typs[idxc], -9).astype(jnp.int32)
    return gv, gdt, gty


def tree_hsml_init(p: Particles, tree: Octree, k: int,
                   cfg: RangeWalkConfig = None, iters: int = 10, box=0.0):
    """Initial smoothing lengths for collisionless particles at scale
    (setup_smoothinglengths_sidm analog, init.c:159).

    Seed: local spacing from the Morton-sorted neighbour k/2 positions away
    (order-of-magnitude correct), then the multiplicative neighbour-count
    controller for ``iters`` passes."""
    cfg = cfg or RangeWalkConfig()
    n = tree.pos_s.shape[0]
    dtype = tree.pos_s.dtype
    offs = tree.level_offsets

    # Density seed from the tree's own cell counts: per particle, take the
    # deepest ancestor cell holding >= 2k particles; local density c/s^3
    # gives h = s * (3k / (4 pi c))^(1/3). Accurate to cell-scale density
    # gradients everywhere (including sparse outskirts, where the earlier
    # Morton-window spacing seed overshot by the whole system size and the
    # resulting walk workload could kill the backend). Particle -> node maps
    # by marking each segment start with its node index and cummax-filling.
    s_sel = jnp.full(n, 1.0, dtype) * tree.extent
    c_sel = jnp.full(n, float(n), dtype)
    ends = list(offs[1:]) + [tree.node_start.shape[0]]
    for l in range(1, tree.depth + 1):
        o = offs[l]
        cap_l = ends[l] - o
        ids = o + jnp.arange(cap_l, dtype=jnp.int32)
        valid_l = jnp.arange(cap_l) < tree.n_nodes[l]
        cnts = tree.node_count[ids]
        tgt = jnp.where(valid_l & (cnts > 0), tree.node_start[ids], n)
        mark = jnp.full(n + 1, -1, jnp.int32).at[tgt].set(ids)[:n]
        nid = lax.cummax(mark)
        c_p = tree.node_count[jnp.maximum(nid, 0)].astype(dtype)
        ok = (nid >= 0) & (c_p >= 2 * k)
        s_l = tree.extent / (1 << l)
        s_sel = jnp.where(ok, s_l, s_sel)
        c_sel = jnp.where(ok, c_p, c_sel)
    h_sorted = s_sel * (3.0 * k / (4.0 * jnp.pi * c_sel)) ** (1.0 / 3.0)
    inv = jnp.zeros(n, jnp.int32).at[tree.perm].set(
        jnp.arange(n, dtype=jnp.int32))
    h = h_sorted[inv]
    col = p.is_collisionless & p.valid
    h = jnp.where(col, h, 0.0)
    # Cap at 8x median, matching the production scan's h_eff cap
    # (_tree_sidm_prep): outskirt Morton neighbours can lie across the
    # whole system, and uncapped search radii make every group bbox cover
    # every cell — a pathological walk workload.
    hcap = 8.0 * jnp.nanmedian(jnp.where(col, h, jnp.nan))
    hcap = jnp.nan_to_num(hcap, nan=jnp.inf)

    def cap(hh):
        return jnp.where(col, jnp.minimum(hh, hcap), hh)

    h = cap(h)

    typs = jnp.where(col, p.ptype, -9)[tree.perm]
    aux = jnp.clip(p.ptype, 0, 7).astype(dtype)[tree.perm]
    rows = jnp.concatenate([
        tree.pos_s,
        jnp.zeros((n, 3), dtype),
        jnp.ones((n, 1), dtype),
        aux[:, None]], axis=1)
    dts_sorted = jnp.ones(n, dtype)

    for it in range(iters + 1):  # last pass counts at the final h, no update
        hs = h[tree.perm]
        gt, gh, glo, ghi, pad, idxg, gvalid, n_groups = _group_geometry(
            tree, hs, cfg)
        seg_g, seg_s, seg_c, scnt, ovf = range_walk(
            tree, glo, ghi, pad, cfg, n_ref=n, n_groups=n_groups, box=box)
        # scalar readback: paces the dispatch queue (one walk+scan in
        # flight at a time — long async queues of these programs are not
        # reliable on the remote backend) and surfaces buffer overflow
        int(scnt)
        if int(ovf):
            import logging
            logging.getLogger(__name__).warning(
                "tree_hsml_init pass %d overflow %d", it, int(ovf))
        gv, gdt, gty = _gather_group_fields(rows, dts_sorted, typs, idxg,
                                            gvalid)
        gidx = jnp.where(gvalid, idxg, -1)
        ptot, best, cnt, bj = _scan_all(
            rows, seg_g, seg_s, seg_c, scnt, gt, gv, gh, gdt, gty, gidx,
            jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
            jnp.uint32(it), _HSML_PARAMS, cfg, box)
        flat_idx = jnp.where(gvalid, idxg, n).reshape(-1)
        cnt_sorted = jnp.zeros(n + 1, jnp.int32).at[flat_idx].set(
            cnt.reshape(-1))[:n]
        cnt_flat = cnt_sorted[inv]
        if it < iters:
            ratio = (k / jnp.maximum(cnt_flat, 1).astype(dtype)) \
                ** (1.0 / 3.0)
            # On overflow, counts are biased LOW for the dropped groups;
            # growing h would inflate the next pass's workload and feed the
            # overflow back on itself. Shrink-only until the walk fits.
            hi = 1.0 if int(ovf) else 2.0
            h = cap(jnp.where(col, h * jnp.clip(ratio, 0.5, hi), h))

    return dataclasses.replace(
        p,
        hsml_vd=jnp.where(col, h, p.hsml_vd),
        ngb_vd=jnp.where(col, cnt_flat, p.ngb_vd).astype(jnp.int32))


# dummy params for count-only passes (hard sphere, sigma 0 -> prob 0)
_HSML_PARAMS = SidmParams(0.0, 0, 1.0, 1.0, 0.0, 32, 2, False, 0.1, 0.0, 0.0)
