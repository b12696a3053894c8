"""SIDM Direct-Simulation-Monte-Carlo pair scattering.

Vectorized counterpart of ``sidm()`` (nbody/sidm.c:57-627) and its support
loops (``setup_nbr_sidm`` :630-805, ``sidm_ensure_neighbours`` :814-968).

Per active collisionless particle i (dt = 2*(Time - CurrentTime), comoving
dt_h0 = dt/s(a)):

1. First-stage gate: P_max = C_Pmax * m_i * h_i^-3 * dt_h0 vs one uniform
   (sidm.c:338-346). If the gate fails (the overwhelmingly common case) the
   neighbour scan contributes nothing.
2. Second stage: cumulative kernel-weighted pair probabilities
   P_j = 0.5 * m_j * W(r;h_i) * sigma(v_rel) * v_rel * dt_h0 accumulated in
   candidate order; the first neighbour pushing the cumulative sum past the
   SAME uniform becomes the scattering partner (sidm.c:352-388). Any fixed
   enumeration order selects partner j with probability exactly P_j.
3. Velocity kick: isotropic direction n, Delta = -v_rel + |v_rel| n,
   dv_i = m_j/(m_i+m_j) * Delta (sidm.c:446-452). The partner recoil is
   dv_j = -m_i/(m_i+m_j) * Delta — this is momentum-exact for unequal masses
   where the reference assigns -dv_i (exact only for equal masses; its own
   comment flags the approximation, sidm.c:341-342).
4. CROSS_SECTION_TYPE 4 adds an angular rejection
   1/(1 + beta^2 sin^2(theta/2))^2 after partner selection (sidm.c:391-438);
   a rejected angle cancels the scattering for this step (the reference
   resumes scanning later neighbours — an O(P^2) difference).

Differences from the reference, by design:
* Self-pairs (j == i) are excluded from the probability sum; the reference
  enumerates self in the neighbour list where it contributes zero for
  velocity-proportional cross sections but a finite spurious term for type 1.
* Double-scattering prevention is a deterministic greedy matching by target
  index (a ``while_loop`` of conflict-free rounds) instead of the sequential
  ID=0 sentinel + keep-first merge + confirmation handshake
  (sidm.c:191-194,480-490,543-603). The result is reproducible regardless of
  device count or sharding.
* The neighbour-count validity band (sidm.c:512-519) holds by construction:
  h is refreshed every step as the k-th-neighbour radius.
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
from ..sidm_common import cross_section_co, sidm_cmax, sigma_v_product
from ..state import Particles


class SidmParams(NamedTuple):
    cross_section_internal: float
    cross_section_type: int
    yukawa_velocity: float
    cross_section_vel_scale: float
    cross_section_pow_law: float
    des_num_ngb: int
    max_num_ngb_dev: int
    comoving: bool
    hubble: float
    omega0: float
    omega_lambda: float
    cap: int = 96
    block: int = 1024
    n_levels: int = 12
    log_events: bool = False     # SCATTERLOG (Makefile -DSCATTERLOG)
    event_cap: int = 4096        # max logged events per step
    maintenance_rate: float = 0.03  # hsml-controller sampling for ungated


def make_sidm_step(cfg, units, consts):
    params = SidmParams(
        cross_section_internal=units.CrossSectionInternal,
        cross_section_type=cfg.CrossSectionType,
        yukawa_velocity=cfg.YukawaVelocity,
        cross_section_vel_scale=cfg.CrossSectionVelScale,
        cross_section_pow_law=cfg.CrossSectionPowLaw,
        des_num_ngb=cfg.DesNumNgb,
        max_num_ngb_dev=cfg.MaxNumNgbDeviation,
        comoving=bool(cfg.ComovingIntegrationOn),
        hubble=units.Hubble,
        omega0=cfg.Omega0,
        omega_lambda=cfg.OmegaLambda,
        log_events=bool(cfg.ScatterLog),
    )
    box = cfg.BoxSize if cfg.PeriodicBoundariesOn else 0.0

    def fn(p, pos_pred, time, active, vmax, key):
        return sidm_scatter(p, pos_pred, time, active, vmax, key, params,
                            box=box)

    return fn


def update_hsml(p: Particles, pos_pred, table, active, params: SidmParams):
    """Refresh hsml_vd as the DesNumNgb-th neighbour radius at the predicted
    positions (replaces setup_nbr_sidm + sidm_ensure_neighbours)."""
    from .neighbors import knn_radius

    n = pos_pred.shape[0]
    block = min(params.block, n)
    nb = -(-n // block)
    npad = nb * block

    warm = jnp.where(p.hsml_vd > 0, p.hsml_vd, 2.0 * table.s0)
    pos_q = jnp.pad(pos_pred, ((0, npad - n), (0, 0)))
    type_q = jnp.pad(p.ptype, (0, npad - n), constant_values=-1)
    h_q = jnp.pad(warm, (0, npad - n), constant_values=1.0)

    def one(args):
        pq, tq, hq = args
        return knn_radius(table, pq, tq, hq, params.des_num_ngb,
                          cap=params.cap, n_iter=3)

    h, cnt, ovf = lax.map(one, (pos_q.reshape(nb, block, 3),
                                type_q.reshape(nb, block),
                                h_q.reshape(nb, block)))
    h = h.reshape(-1)[:n]
    cnt = cnt.reshape(-1)[:n].astype(jnp.int32)
    upd = p.is_collisionless & active
    return dataclasses.replace(
        p,
        hsml_vd=jnp.where(upd, h, p.hsml_vd),
        ngb_vd=jnp.where(upd, cnt, p.ngb_vd),
    )


def sidm_scatter(p: Particles, pos_pred, time, active, vmax, key,
                 params: SidmParams, box=0.0):
    """One DSMC scattering pass. Returns (particles', n_scattered)."""
    from .neighbors import build_table

    n = pos_pred.shape[0]
    dtype = pos_pred.dtype

    # ---- neighbour table at predicted positions ----
    # Base cell size: the smallest current smoothing length, so the finest
    # level resolves the densest region. Cold start (hsml_vd == 0) falls back
    # to the k-neighbour radius of a uniform distribution at the mean density.
    if box:
        vol = jnp.asarray(box, dtype) ** 3
    else:
        ext = (jnp.max(jnp.where(p.valid[:, None], pos_pred, -jnp.inf), axis=0)
               - jnp.min(jnp.where(p.valid[:, None], pos_pred, jnp.inf), axis=0))
        vol = jnp.prod(jnp.maximum(ext, 1e-10))
    n_valid = jnp.maximum(jnp.sum(p.valid), 1)
    r_k = (3.0 * params.des_num_ngb * vol
           / (4.0 * jnp.pi * n_valid)) ** (1.0 / 3.0)
    hpos = jnp.where(p.hsml_vd > 0, p.hsml_vd, jnp.inf)
    hmin = jnp.min(jnp.where(p.is_collisionless, hpos, jnp.inf))
    s0 = jnp.where(jnp.isfinite(hmin), jnp.maximum(hmin, 1e-12), r_k / 2.0)
    has_pending0 = jnp.any(p.dvel != 0.0, axis=-1)
    from .neighbors import make_payload
    payload = make_payload(pos_pred, p.vel, p.mass, p.ptype,
                           flag=has_pending0)
    table = build_table(pos_pred, p.ptype, p.valid, s0=s0, box=box,
                        n_levels=params.n_levels, payload=payload)

    # ---- refresh smoothing lengths (k-th neighbour radius) ----
    p = update_hsml(p, pos_pred, table, active, params)

    # ---- constants of this step ----
    dt = 2.0 * (time - p.current_time)
    s_inv = drift_factor(time, params.hubble, params.omega0,
                         params.omega_lambda, params.comoving)
    dt_h0 = jnp.where(active, dt, 0.0) * s_inv

    sigma_co = cross_section_co(time, params.cross_section_internal,
                                params.cross_section_type, params.comoving)
    c_pmax = sidm_cmax(
        time, vmax, params.cross_section_internal, params.cross_section_type,
        params.yukawa_velocity, params.cross_section_vel_scale,
        params.des_num_ngb, params.max_num_ngb_dev,
        params.hubble, params.omega0, params.omega_lambda,
        params.comoving, per_dt_h0=True)

    # pending-kick particles may not scatter again (ID=0 sentinel + dVel
    # checks, sidm.c:191-194,345-346,356-357)
    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    eligible = (active & p.is_collisionless & p.valid
                & (~has_pending) & (dt_h0 > 0))

    # per-particle uniforms keyed by (step, pid): [gate/select, angle-accept,
    # cos-theta]
    u = particle_uniforms(key, p.pid, 3)
    rand = u[:, 0].astype(dtype)

    h_scat = SCAT_KERNEL_FACTOR * p.hsml_vd
    hinv3 = jnp.where(h_scat > 0, 1.0 / jnp.maximum(h_scat, 1e-30) ** 3, 0.0)
    p_max = c_pmax * p.mass * hinv3 * dt_h0
    gate = eligible & (p_max >= rand)

    # ---- blocked partner-selection scan ----
    block = min(params.block, n)
    nb = -(-n // block)
    npad = nb * block

    def pad1(x, fill=0):
        return jnp.pad(x, (0, npad - n), constant_values=fill)

    args = (
        jnp.pad(pos_pred, ((0, npad - n), (0, 0))),
        jnp.pad(p.vel, ((0, npad - n), (0, 0))),
        pad1(h_scat, 1.0),
        pad1(p.ptype, -1),
        pad1(gate, False),
        pad1(rand, 2.0),
        pad1(dt_h0, 0.0),
        pad1(jnp.arange(n, dtype=jnp.int32), -1),
    )

    from .neighbors import gather_candidates, payload_flag

    def scan_block(blk):
        bpos, bvel, bh, btype, bgate, brand, bdt, bidx = blk
        idx, rows, mask, _ = gather_candidates(table, bpos, btype, bh,
                                               cap=params.cap)
        d = rows[..., 0:3] - bpos[:, None, :]
        if box:
            d = d - box * jnp.round(d / box)
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        # neighbour validity: same-type candidates (mask), inside kernel
        # support, not self, no pending kick (sidm.c:356-357)
        ok = (mask & (r < bh[:, None]) & (idx != bidx[:, None])
              & (~payload_flag(rows)))
        u_r = r / bh[:, None]
        wk = sph_kernel(u_r) / (bh[:, None] ** 3)

        rv_vec = bvel[:, None, :] - rows[..., 3:6]           # (B,C,3)
        rv = jnp.sqrt(jnp.sum(rv_vec * rv_vec, axis=-1))
        sv = sigma_v_product(rv, time, sigma_co, params.cross_section_type,
                             params.yukawa_velocity,
                             params.cross_section_vel_scale,
                             params.cross_section_pow_law, params.comoving)
        prob = jnp.where(ok, 0.5 * rows[..., 6] * wk * sv * bdt[:, None], 0.0)
        cum = jnp.cumsum(prob, axis=1)
        crossed = bgate[:, None] & (cum >= brand[:, None])
        # first crossing: argmax over boolean gives first True
        any_cross = jnp.any(crossed, axis=1)
        first = jnp.argmax(crossed, axis=1)
        partner = jnp.where(any_cross, jnp.take_along_axis(
            idx, first[:, None], axis=1)[:, 0], -1)
        return partner, any_cross

    partner, hit = lax.map(scan_block, tuple(
        a.reshape((nb, block) + a.shape[1:]) for a in args))
    partner = partner.reshape(-1)[:n]
    hit = hit.reshape(-1)[:n]

    # ---- type-4 angular rejection (sidm.c:391-438) ----
    cos_theta = None
    if params.cross_section_type == 4:
        vc = params.yukawa_velocity / jnp.sqrt(time) if params.comoving \
            else params.yukawa_velocity
        pj = jnp.clip(partner, 0, n - 1)
        rel = p.vel - p.vel[pj]
        rv = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        beta = rv / vc
        cos_theta = 2.0 * u[:, 2].astype(dtype) - 1.0
        sin22 = 0.5 * (1.0 - cos_theta)
        denom = 1.0 + beta * beta * sin22
        accept = (u[:, 1].astype(dtype) < 1.0 / (denom * denom)) & (rv > 0)
        hit = hit & accept

    proposal = jnp.where(hit & (partner >= 0), partner, -1)

    # ---- greedy-by-index conflict resolution ----
    accepted = _resolve_conflicts(proposal, n)

    # ---- kicks ----
    tgt = jnp.arange(n, dtype=jnp.int32)
    pj = jnp.clip(proposal, 0, n - 1)
    rel = p.vel - p.vel[pj]                                  # v_i - v_j
    rv = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
    nhat = random_directions(key, p.pid).astype(dtype)
    if params.cross_section_type == 4:
        # scatter into polar angle theta around v_rel with random azimuth
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
        nperp = _perp_unit(rel, nhat)
        delta = -rel + cos_theta[:, None] * rel + (sin_t * rv)[:, None] * nperp
    else:
        delta = -rel + rv[:, None] * nhat

    mi = p.mass
    mj = p.mass[pj]
    msum = jnp.maximum(mi + mj, 1e-30)
    dv_i = (mj / msum)[:, None] * delta
    dv_j = -(mi / msum)[:, None] * delta

    dvel = p.dvel
    dvel = dvel + jnp.where(accepted[:, None], dv_i, 0.0)
    dvel = dvel.at[pj].add(jnp.where(accepted[:, None], dv_j, 0.0))

    n_scattered = jnp.sum(accepted.astype(jnp.int32))
    p = dataclasses.replace(p, dvel=dvel)
    if params.log_events:
        events = _collect_events(p, pos_pred, time, accepted, pj, dv_i,
                                 params.event_cap)
        return p, n_scattered, events
    return p, n_scattered


def _collect_events(p, pos_pred, time, accepted, pj, dv_i, cap):
    """Pack per-event SCATTERLOG records (struct scatlog, nbody/sidm.h:1-10):
    [time, id1, id2, h1, h2, x1(3), x2(3), v1(3), v2(3), dv(3)] = 20 x 4
    bytes. The ids travel as a separate int32 array (the C struct stores
    them as int4byte in the same 4-byte slots) — exact at any N, unlike
    the float cast an all-f32 record would need, which corrupts ids
    above 2^24. The writer interleaves them into the binary layout;
    decode with sidm_tpu.io.checkpoint.read_scatter_log."""
    n = accepted.shape[0]
    cap = min(cap, n)
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(accepted, idx, n)
    order = jnp.argsort(key)[:cap]
    valid = accepted[order]
    i = order
    j = pj[order]
    rec = jnp.concatenate([
        jnp.full((cap, 1), time, pos_pred.dtype),
        p.hsml_vd[i][:, None], p.hsml_vd[j][:, None],
        pos_pred[i], pos_pred[j],
        p.vel[i], p.vel[j],
        dv_i[i],
    ], axis=1)
    rec = jnp.where(valid[:, None], rec, 0.0)
    ids = jnp.stack([p.pid[i], p.pid[j]], axis=1).astype(jnp.int32)
    ids = jnp.where(valid[:, None], ids, 0)
    return rec, ids, jnp.sum(valid.astype(jnp.int32))


def _perp_unit(a, b):
    """Unit vector perpendicular to a (and b), cf. perp() sidm.c:29-53."""
    c = jnp.cross(a, b)
    norm = jnp.sqrt(jnp.sum(c * c, axis=-1, keepdims=True))
    # degenerate (a || b or zeros): fall back to any perpendicular of a
    alt = jnp.cross(a, jnp.array([1.0, 0.0, 0.0], a.dtype) + 0 * a)
    alt_n = jnp.sqrt(jnp.sum(alt * alt, axis=-1, keepdims=True))
    use_alt = norm < 1e-20
    c = jnp.where(use_alt, alt, c)
    norm = jnp.where(use_alt, alt_n, norm)
    return c / jnp.maximum(norm, 1e-30)


def _resolve_conflicts(proposal, n):
    """Greedy matching by target index.

    Emulates the reference's sequential processing (earlier targets scatter
    first; later ones skip already-scattered particles) as rounds of
    conflict-free executions: a proposal (i -> j) executes when i is the
    lowest-index pending proposal touching either i or j. Proposals whose
    endpoints get taken are cancelled.
    """
    idx = jnp.arange(n, dtype=jnp.int32)
    pending = proposal >= 0
    accepted = jnp.zeros(n, bool)

    def cond(state):
        pending, _ = state
        return jnp.any(pending)

    def body(state):
        pending, accepted = state
        big = jnp.int32(n)
        prop_i = jnp.where(pending, idx, big)
        pj = jnp.clip(proposal, 0, n - 1)
        # min pending proposer touching each particle
        touch = jnp.full(n, big, jnp.int32)
        touch = touch.at[idx].min(prop_i)                 # as target itself
        touch = touch.at[pj].min(jnp.where(pending, idx, big))  # as partner
        safe = pending & (touch[idx] == idx) & (touch[pj] == idx)
        accepted = accepted | safe
        # endpoints of executed proposals are now taken
        taken = jnp.zeros(n, bool)
        taken = taken.at[idx].max(safe)
        taken = taken.at[pj].max(safe)
        pending = pending & (~safe) & (~taken) & (~taken[pj])
        return pending, accepted

    _, accepted = lax.while_loop(cond, body, (pending, accepted))
    return accepted


def _resolve_conflicts_compact(proposal, n, cap: int = 65536):
    """_resolve_conflicts with the proposals COMPACTED first.

    The greedy rounds above run ~5 iterations of full-N scatters per
    step while only a few thousand particles actually propose (the
    gate passes ~1e-3..1e-2 of N); compacting the proposers first makes
    every round's scatter O(P). Semantics are IDENTICAL (min-index
    proposer wins; endpoints of executed proposals are taken):
    engines using either resolver produce the same accepted set."""
    idx = jnp.arange(n, dtype=jnp.int32)
    is_prop = proposal >= 0
    cpos = jnp.cumsum(is_prop.astype(jnp.int32))
    dest = jnp.where(is_prop & (cpos - 1 < cap), cpos - 1, cap)
    ti = jnp.full(cap + 1, n, jnp.int32).at[dest].set(idx)[:cap]
    live = ti < n
    tj = jnp.clip(proposal[jnp.clip(ti, 0, n - 1)], 0, n - 1)
    big = jnp.int32(n)

    def cond(state):
        pending, _ = state
        return jnp.any(pending)

    def body(state):
        pending, acc_c = state
        prop_i = jnp.where(pending, ti, big)
        touch = jnp.full(n, big, jnp.int32)
        touch = touch.at[jnp.clip(ti, 0, n - 1)].min(prop_i)
        touch = touch.at[tj].min(prop_i)
        safe = pending & (touch[jnp.clip(ti, 0, n - 1)] == ti) \
            & (touch[tj] == ti)
        acc_c = acc_c | safe
        taken = jnp.zeros(n, bool)
        taken = taken.at[jnp.clip(ti, 0, n - 1)].max(safe)
        taken = taken.at[tj].max(safe)
        pending = pending & (~safe) & (~taken[jnp.clip(ti, 0, n - 1)]) \
            & (~taken[tj])
        return pending, acc_c

    _, acc_c = lax.while_loop(cond, body, (live, jnp.zeros(cap, bool)))
    accepted = jnp.zeros(n + 1, bool).at[
        jnp.where(live & acc_c, ti, n)].set(True)[:n]
    return accepted


# --------------------------------------------------------------------------
# Phased (host-chunked) execution path for large N.
#
# One fused XLA program holding the whole DSMC pass (hsml refresh + partner
# scan over ~N/block device-loop iterations) destabilizes the axon TPU
# backend at N >~ 5e5 (worker crash in long gather-heavy programs). The
# phased path runs the same math as a handful of separately jitted calls,
# with the per-target loops chunked at the HOST level; every chunk reuses
# one compiled executable. Physics is identical to sidm_scatter.
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("params", "box"))
def sidm_build_table(p: Particles, pos_pred, params: SidmParams, box=0.0):
    """Neighbour table with the SIDM payload at predicted positions."""
    from .neighbors import build_table, make_payload

    dtype = pos_pred.dtype
    if box:
        vol = jnp.asarray(box, dtype) ** 3
    else:
        ext = (jnp.max(jnp.where(p.valid[:, None], pos_pred, -jnp.inf), 0)
               - jnp.min(jnp.where(p.valid[:, None], pos_pred, jnp.inf), 0))
        vol = jnp.prod(jnp.maximum(ext, 1e-10))
    n_valid = jnp.maximum(jnp.sum(p.valid), 1)
    r_k = (3.0 * params.des_num_ngb * vol
           / (4.0 * jnp.pi * n_valid)) ** (1.0 / 3.0)
    hpos = jnp.where(p.hsml_vd > 0, p.hsml_vd, jnp.inf)
    hmin = jnp.min(jnp.where(p.is_collisionless, hpos, jnp.inf))
    s0 = jnp.where(jnp.isfinite(hmin), jnp.maximum(hmin, 1e-12), r_k / 2.0)
    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    payload = make_payload(pos_pred, p.vel, p.mass, p.ptype,
                           flag=has_pending)
    return build_table(pos_pred, p.ptype, p.valid, s0=s0, box=box,
                       n_levels=params.n_levels, payload=payload)


@partial(jax.jit, static_argnames=("params",))
def _hsml_chunk(table, pq, tq, hq, params: SidmParams):
    from .neighbors import knn_radius
    return knn_radius(table, pq, tq, hq, params.des_num_ngb,
                      cap=params.cap, n_iter=3)


@partial(jax.jit, static_argnames=("params", "box"))
def _scan_chunk(table, bpos, bvel, bh, btype, bgate, brand, bdt, bidx,
                time, sigma_co, params: SidmParams, box=0.0):
    from .neighbors import gather_candidates, payload_flag

    idx, rows, mask, _ = gather_candidates(table, bpos, btype, bh,
                                           cap=params.cap)
    d = rows[..., 0:3] - bpos[:, None, :]
    if box:
        d = d - box * jnp.round(d / box)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ok = (mask & (r < bh[:, None]) & (idx != bidx[:, None])
          & (~payload_flag(rows)))
    wk = sph_kernel(r / bh[:, None]) / (bh[:, None] ** 3)
    rv_vec = bvel[:, None, :] - rows[..., 3:6]
    rv = jnp.sqrt(jnp.sum(rv_vec * rv_vec, axis=-1))
    sv = sigma_v_product(rv, time, sigma_co, params.cross_section_type,
                         params.yukawa_velocity,
                         params.cross_section_vel_scale,
                         params.cross_section_pow_law, params.comoving)
    prob = jnp.where(ok, 0.5 * rows[..., 6] * wk * sv * bdt[:, None], 0.0)
    cum = jnp.cumsum(prob, axis=1)
    crossed = bgate[:, None] & (cum >= brand[:, None])
    any_cross = jnp.any(crossed, axis=1)
    first = jnp.argmax(crossed, axis=1)
    partner = jnp.where(any_cross, jnp.take_along_axis(
        idx, first[:, None], axis=1)[:, 0], -1)
    return partner, any_cross


@partial(jax.jit, static_argnames=("params",))
def _sidm_finish(p: Particles, pos_pred, partner, hit, time, vmax, key,
                 params: SidmParams):
    """Angular rejection (type 4), conflict resolution, kicks, events."""
    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    u = particle_uniforms(key, p.pid, 3)
    cos_theta = None
    if params.cross_section_type == 4:
        vc = params.yukawa_velocity / jnp.sqrt(time) if params.comoving \
            else params.yukawa_velocity
        pj = jnp.clip(partner, 0, n - 1)
        rel = p.vel - p.vel[pj]
        rv = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        beta = rv / vc
        cos_theta = 2.0 * u[:, 2].astype(dtype) - 1.0
        sin22 = 0.5 * (1.0 - cos_theta)
        denom = 1.0 + beta * beta * sin22
        accept = (u[:, 1].astype(dtype) < 1.0 / (denom * denom)) & (rv > 0)
        hit = hit & accept

    proposal = jnp.where(hit & (partner >= 0), partner, -1)
    accepted = _resolve_conflicts(proposal, n)

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
    p = dataclasses.replace(p, dvel=dvel)
    if params.log_events:
        ev = _collect_events(p, pos_pred, time, accepted, pj, dv_i,
                             params.event_cap)
        return p, n_scattered, ev
    return p, n_scattered, None


@partial(jax.jit, static_argnames=("params",))
def _sidm_gate(p: Particles, time, active, vmax, key, params: SidmParams):
    dtype = p.pos.dtype
    dt = 2.0 * (time - p.current_time)
    s_inv = drift_factor(time, params.hubble, params.omega0,
                         params.omega_lambda, params.comoving)
    dt_h0 = jnp.where(active, dt, 0.0) * s_inv
    sigma_co = cross_section_co(time, params.cross_section_internal,
                                params.cross_section_type, params.comoving)
    c_pmax = sidm_cmax(
        time, vmax, params.cross_section_internal, params.cross_section_type,
        params.yukawa_velocity, params.cross_section_vel_scale,
        params.des_num_ngb, params.max_num_ngb_dev,
        params.hubble, params.omega0, params.omega_lambda,
        params.comoving, per_dt_h0=True)
    has_pending = jnp.any(p.dvel != 0.0, axis=-1)
    eligible = (active & p.is_collisionless & p.valid
                & (~has_pending) & (dt_h0 > 0))
    u = particle_uniforms(key, p.pid, 3)
    rand = u[:, 0].astype(dtype)
    h_scat = SCAT_KERNEL_FACTOR * p.hsml_vd
    hinv3 = jnp.where(h_scat > 0, 1.0 / jnp.maximum(h_scat, 1e-30) ** 3, 0.0)
    p_max = c_pmax * p.mass * hinv3 * dt_h0
    gate = eligible & (p_max >= rand)
    return gate, rand, dt_h0, h_scat, sigma_co


def sidm_scatter_phased(p: Particles, pos_pred, time, active, vmax, key,
                        params: SidmParams, box=0.0,
                        chunk: int = 65536):
    """Host-chunked DSMC pass (same physics as sidm_scatter)."""
    import numpy as _np

    n = pos_pred.shape[0]
    table = sidm_build_table(p, pos_pred, params, box)

    # --- hsml refresh, chunked ---
    warm = jnp.where(p.hsml_vd > 0, p.hsml_vd, 2.0 * table.s0)
    npad = -(-n // chunk) * chunk
    posq = jnp.pad(pos_pred, ((0, npad - n), (0, 0)))
    typq = jnp.pad(p.ptype, (0, npad - n), constant_values=-1)
    hq = jnp.pad(warm, (0, npad - n), constant_values=1.0)
    hs, cnts = [], []
    for i in range(npad // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        h_c, cnt_c, _ = _hsml_chunk(table, posq[sl], typq[sl], hq[sl], params)
        hs.append(h_c)
        cnts.append(cnt_c)
    h = jnp.concatenate(hs)[:n]
    cnt = jnp.concatenate(cnts)[:n].astype(jnp.int32)
    upd = p.is_collisionless & active
    p = dataclasses.replace(
        p, hsml_vd=jnp.where(upd, h, p.hsml_vd),
        ngb_vd=jnp.where(upd, cnt, p.ngb_vd))

    # --- gate + partner scan, chunked ---
    gate, rand, dt_h0, h_scat, sigma_co = _sidm_gate(
        p, time, active, vmax, key, params)
    idxs = jnp.arange(n, dtype=jnp.int32)

    def padq(a, fill):
        return jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    velq = padq(p.vel, 0.0)
    hsq = padq(h_scat, 1.0)
    gq = padq(gate, False)
    rq = padq(rand, 2.0)
    dtq = padq(dt_h0, 0.0)
    iq = padq(idxs, -1)
    partners, hits = [], []
    for i in range(npad // chunk):
        sl = slice(i * chunk, (i + 1) * chunk)
        pt, ht = _scan_chunk(table, posq[sl], velq[sl], hsq[sl], typq[sl],
                             gq[sl], rq[sl], dtq[sl], iq[sl],
                             time, sigma_co, params, box)
        partners.append(pt)
        hits.append(ht)
    partner = jnp.concatenate(partners)[:n]
    hit = jnp.concatenate(hits)[:n]

    p, n_scat, events = _sidm_finish(p, pos_pred, partner, hit, time, vmax,
                                     key, params)
    if params.log_events:
        return p, n_scat, events
    return p, n_scat
