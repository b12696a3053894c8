"""SPH: density/velocity-divergence estimation and hydrodynamic force.

Vectorized counterparts of ``density()`` (nbody/density.c:21-354) and
``hydro_force()`` (nbody/hydra.c:16-441):

* density: rho_i = sum m_j W(r; h_i); div v and curl v from dW/dr
  (density.c:210-232); rate terms DtDensity = -div v (comoving:
  -divv/(H(a) a^1.5), density.c:48,306), DtHsml with the DesNumNgb
  correction and the -0.9/dt floors (density.c:304-325).
* hydro force: symmetrized pressure force with the geometric-mean form
  m_j (2 sqrt(Pi Pj)/(rho_i rho_j) + visc) * 0.5*(dW_i + dW_j) (hydra.c:331,
  342), Monaghan artificial viscosity with the Balsara f1/f2 switch
  (hydra.c:275-311) and the viscosity limiter (hydra.c:296-308).

Pair symmetrization without the reference's hmax-aware pair search
(``ngb_treefind_pairs``, forcetree.c:2020-2155): every interaction term that
carries dW(h_q) is complete over pairs with r < h_q, so the dW_i half is
GATHERED by i's own fixed-radius query and the dW_j half is SCATTERED from
j's query to its neighbours. The union exactly covers r < max(h_i, h_j).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import GAMMA, GAMMA_MINUS1
from ..cosmo import hubble_of_a, s_of_a
from ..kernels import sph_kernel, sph_kernel_deriv
from ..state import Particles


def payload_type_active(rows):
    """Active flag packed into the aux column (type + 8*active)."""
    return rows[..., 7] >= 8.0


class SphParams(NamedTuple):
    des_num_ngb: int
    max_num_ngb_dev: int
    art_bulk_visc: float
    min_egy_spec: float
    min_gas_hsml: float
    comoving: bool
    hubble: float
    omega0: float
    omega_lambda: float
    cap: int = 96
    block: int = 1024


def _blocked(fn, n, block, *arrays):
    nb = -(-n // block)
    npad = nb * block

    def pad(a, fill=0):
        return jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    padded = [pad(a).reshape((nb, block) + a.shape[1:]) for a in arrays]
    out = lax.map(fn, tuple(padded))
    return jax.tree.map(lambda x: x.reshape((npad,) + x.shape[2:])[:n], out)


def sph_density(p: Particles, pos_pred, vel_pred, time, active,
                params: SphParams, box=0.0):
    """Density, div/curl velocity, smoothing-length rates for gas particles.

    Smoothing lengths are refreshed to the k-th gas-neighbour radius first
    (replacing ensure_neighbours' bisection, density.c:382-547)."""
    from .neighbors import build_table, gather_candidates, knn_radius

    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    is_gas = p.is_gas

    if not False:
        # base cell size from mean gas spacing
        ngas = jnp.maximum(jnp.sum(is_gas), 1)
        if box:
            vol = jnp.asarray(box, dtype) ** 3
        else:
            ext = (jnp.max(jnp.where(p.valid[:, None], pos_pred, -jnp.inf), 0)
                   - jnp.min(jnp.where(p.valid[:, None], pos_pred, jnp.inf), 0))
            vol = jnp.prod(jnp.maximum(ext, 1e-10))
        r_k = (3.0 * params.des_num_ngb * vol
               / (4.0 * jnp.pi * ngas)) ** (1.0 / 3.0)
    hwarm = jnp.where(p.hsml > 0, p.hsml, r_k)
    hmin = jnp.min(jnp.where(is_gas, hwarm, jnp.inf))
    s0 = jnp.where(jnp.isfinite(hmin), jnp.maximum(hmin / 2, 1e-12), r_k / 2)
    from .neighbors import make_payload
    payload = make_payload(pos_pred, vel_pred, p.mass, p.ptype)
    table = build_table(pos_pred, p.ptype, p.valid, s0=s0, box=box,
                        payload=payload)

    def knn_block(args):
        pq, tq, hq = args
        h, cnt, ovf = knn_radius(table, pq, tq, hq, params.des_num_ngb,
                                 cap=params.cap, n_iter=3)
        return h, cnt, ovf

    h_new, ngb, ovf_k = _blocked(knn_block, n, params.block, pos_pred,
                                 p.ptype, hwarm)
    h_new = jnp.maximum(h_new, params.min_gas_hsml)
    upd = is_gas & active
    hsml = jnp.where(upd, h_new, p.hsml)

    def dens_block(args):
        pq, vq, tq, hq = args
        idx, rows, mask, ovf = gather_candidates(table, pq, tq, hq,
                                                 cap=params.cap)
        d = pq[:, None, :] - rows[..., 0:3]
        if box:
            d = d - box * jnp.round(d / box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        hb = jnp.maximum(hq, 1e-30)[:, None]
        ok = mask & (r < hb)
        u = r / hb
        hinv3 = 1.0 / hb**3
        hinv4 = hinv3 / hb
        wk = jnp.where(ok, sph_kernel(u) * hinv3, 0.0)
        dwk = jnp.where(ok, sph_kernel_deriv(u) * hinv4, 0.0)
        mj = rows[..., 6]
        rho = jnp.sum(mj * wk, axis=1)
        r_safe = jnp.maximum(r, 1e-30)
        dv = vq[:, None, :] - rows[..., 3:6]
        fac = jnp.where(ok & (r > 0), mj * dwk / r_safe, 0.0)
        divv = -jnp.sum(fac * jnp.sum(d * dv, axis=-1), axis=1)
        rot = jnp.sum(fac[..., None] * jnp.cross(d, dv), axis=1)
        return rho, divv, rot, ovf

    rho, divv, rot, ovf_d = _blocked(dens_block, n, params.block, pos_pred,
                                     vel_pred, p.ptype, hsml)
    # candidate-cap truncation silently drops real pairs (the reference
    # aborts instead, density.c:522-526) — surface it to the caller
    gasq = is_gas & p.valid
    ovf = jnp.sum(((ovf_k | ovf_d) & gasq).astype(jnp.int32))

    rho_safe = jnp.maximum(rho, 1e-30)
    curl = jnp.sqrt(jnp.sum(rot * rot, axis=-1)) / rho_safe
    div_over_rho = divv / rho_safe

    if params.comoving:
        hubble_a = hubble_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        prefac = 1.0 / (hubble_a * time**1.5)
        dt_density = -prefac * divv
        dt_hsml = -hsml * dt_density / (3.0 * rho_safe)
    else:
        dt_density = -divv
        dt_hsml = hsml * div_over_rho / 3.0

    # DesNumNgb drift correction + floors (density.c:304-325)
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
        hsml=hsml,
        density=jnp.where(upd, rho, p.density),
        div_vel=jnp.where(upd, div_over_rho, p.div_vel),
        curl_vel=jnp.where(upd, curl, p.curl_vel),
        dt_density=jnp.where(upd, dt_density, p.dt_density),
        dt_hsml=jnp.where(upd, dt_hsml, p.dt_hsml),
        ngb_sph=jnp.where(upd, ngb, p.ngb_sph).astype(jnp.int32),
    ), table, ovf


def hydro_force(p: Particles, pos_pred, vel_pred, time, active,
                params: SphParams, table, box=0.0):
    """Pressure + artificial-viscosity accelerations and du/dt for gas.

    Each (q -> c) candidate pair carries HALF the symmetrized kernel (the
    dW(h_q) part); the dW(h_c) part arrives from c's own query. Gather terms
    update q; scatter terms update c; the union covers r < max(h_q, h_c)."""
    from .neighbors import gather_candidates

    n = pos_pred.shape[0]
    dtype = pos_pred.dtype
    is_gas = p.is_gas

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

    if params.comoving:
        sqrt_a = jnp.sqrt(time)
        hubble_a = hubble_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        s_a_inv = 1.0 / s_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        prefac = s_a_inv / time
        fac_visc_fix = hubble_a * time**3
        egy_fac = time * sqrt_a
    else:
        sqrt_a = 1.0
        prefac = 1.0
        fac_visc_fix = 1.0
        egy_fac = 1.0

    dt_step = 2.0 * (time - p.current_time)

    block = params.block
    nb = -(-n // block)
    npad = nb * block

    def pad(a, fill=0):
        return jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    args = tuple(pad(a).reshape((nb, block) + a.shape[1:]) for a in (
        pos_pred, vel_pred, p.ptype, p.hsml,
        jnp.arange(n, dtype=jnp.int32)))

    acc = jnp.zeros((n, 3), dtype)
    dt_egy = jnp.zeros(n, dtype)

    # wide payload: neighbour state needed by the pair terms
    from .neighbors import with_payload
    wide = jnp.concatenate([
        pos_pred, vel_pred, p.mass[:, None],
        (jnp.clip(p.ptype, 0, 7).astype(dtype)
         + 8.0 * active.astype(dtype))[:, None],
        p.hsml[:, None], rho[:, None], csnd[:, None],
        f_balsara[:, None]], axis=1)                 # (N,12)
    table = with_payload(table, wide)

    def blk(carry, a):
        acc, dt_egy, novf = carry
        pq, vq, tq, hq, iq = a
        idx, rows, mask, ovf = gather_candidates(table, pq, tq, hq,
                                                 cap=params.cap)
        novf = novf + jnp.sum((ovf & (tq == 0)).astype(jnp.int32))
        d = pq[:, None, :] - rows[..., 0:3]         # dx = x_q - x_c
        if box:
            d = d - box * jnp.round(d / box)
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        hb = jnp.maximum(hq, 1e-30)[:, None]
        ok = (mask & (r < hb) & (idx != iq[:, None])
              & (tq[:, None] == 0))
        u = r / hb
        dwk_q = jnp.where(ok, sph_kernel_deriv(u) / hb**4, 0.0)

        dv = vq[:, None, :] - rows[..., 3:6]
        vdotr = jnp.sum(d * dv, axis=-1)
        if params.comoving:
            vdotr2 = vdotr / sqrt_a + hubble_of_a(
                time, params.hubble, params.omega0, params.omega_lambda) * r2
        else:
            vdotr2 = vdotr

        # artificial viscosity (hydra.c:275-311); h_ij, c_ij, rho_ij are
        # pair-symmetric so both half-kernels see the same visc
        h_ij = 0.5 * (hq[:, None] + rows[..., 8])
        c_ij = 0.5 * (csnd[iq][:, None] + rows[..., 10])
        rho_ij = 0.5 * (rho[iq][:, None] + rows[..., 9])
        mu = h_ij * vdotr2 / (r2 + 0.01 * h_ij * h_ij)
        if params.comoving:
            mu = mu * time
        f1 = f_balsara[iq][:, None]
        f2 = rows[..., 11]
        visc = jnp.where(
            vdotr2 < 0,
            (-params.art_bulk_visc * mu * c_ij
             + 2.0 * params.art_bulk_visc * mu * mu)
            / jnp.maximum(rho_ij, 1e-30) * 0.5 * (f1 + f2),
            0.0)
        # viscosity limiter (hydra.c:296-308), using the half-kernel
        msum = 0.5 * (p.mass[iq][:, None] + rows[..., 6])
        lim = fac_visc_fix * vdotr2 / jnp.where(
            dwk_q < 0, msum * (2.0 * dwk_q) * jnp.maximum(r, 1e-30)
            * jnp.maximum(dt_step[iq][:, None], 1e-30), -1e30)
        # the clamp only applies to approaching pairs: the reference
        # evaluates it inside the if(vdotr2<0) branch, so receding pairs
        # keep visc=0 (hydra.c:275,300-308)
        visc = jnp.where((vdotr2 < 0) & (dt_step[iq][:, None] > 0)
                         & (dwk_q < 0),
                         jnp.minimum(visc, lim), visc)

        # neighbour P/rho^2 from its payload: P/rho^2 = csnd^2/(GAMMA rho)
        rho_c = jnp.maximum(rows[..., 9], 1e-30)
        p_or2_c = (rows[..., 10] ** 2) / (GAMMA * rho_c)
        pp = 2.0 * jnp.sqrt(jnp.maximum(
            p_over_rho2[iq][:, None] * p_or2_c, 0.0))
        mj = rows[..., 6]
        r_safe = jnp.maximum(r, 1e-30)
        # half-kernel force: the dW(h_q) part of 0.5*(dW_i + dW_j)
        hfc = prefac * 0.5 * mj * (pp + visc) * dwk_q / r_safe
        act_q = active[iq][:, None]
        a_gather = -jnp.sum(jnp.where(ok & act_q, hfc, 0.0)[..., None] * d,
                            axis=1)
        de_gather = jnp.sum(jnp.where(ok & act_q, 0.5 * egy_fac * hfc
                                      * vdotr2, 0.0), axis=1)
        acc = acc.at[iq].add(a_gather)
        dt_egy = dt_egy.at[iq].add(de_gather)

        # scatter the same half-kernel to the neighbours (their dW_q part,
        # i.e. for them the "dW_j" term), with their own mass weights
        mi = p.mass[iq][:, None]
        hfc_c = prefac * 0.5 * mi * (pp + visc) * dwk_q / r_safe
        act_c = payload_type_active(rows)
        a_sc = jnp.where(ok & act_c, hfc_c, 0.0)[..., None] * d
        de_sc = jnp.where(ok & act_c, 0.5 * egy_fac * hfc_c * vdotr2, 0.0)
        acc = acc.at[idx.reshape(-1)].add(a_sc.reshape(-1, 3))
        dt_egy = dt_egy.at[idx.reshape(-1)].add(de_sc.reshape(-1))
        return (acc, dt_egy, novf), None

    (acc, dt_egy, novf), _ = lax.scan(
        blk, (acc, dt_egy, jnp.zeros((), jnp.int32)), args)

    upd = is_gas & active
    return (jnp.where(upd[:, None], acc, 0.0),
            jnp.where(upd, dt_egy, p.dt_egy), novf)
