"""Local velocity dispersion and DM density (VELDISP option).

Counterpart of ``veldisp()`` (nbody/veldisp.c:17-257): for each collisionless
particle, over same-type neighbours within hsml_vd,

    DensVelDisp = sum_j m_j W(r; h)
    VelDisp     = sqrt( sum_k [ <v_k^2> - <v_k>^2 ] )   (unweighted means,
                  veldisp.c:165-245)

used by timestep criteria 2-4 (timestep.c:163-224). Mutually exclusive with
SIDM in the reference build system (sidm.c:14-16) but shares hsml_vd here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import sph_kernel
from ..state import Particles


def veldisp(p: Particles, pos_pred, vel_pred, active, *, des_num_ngb: int,
            box=0.0, cap: int = 96, block: int = 1024):
    """Returns particles with vel_disp / dens_vd / hsml_vd / ngb_vd updated."""
    from .neighbors import (build_table, gather_candidates, knn_radius,
                            make_payload)

    n = pos_pred.shape[0]
    dtype = pos_pred.dtype

    if box:
        vol = jnp.asarray(box, dtype) ** 3
    else:
        ext = (jnp.max(jnp.where(p.valid[:, None], pos_pred, -jnp.inf), 0)
               - jnp.min(jnp.where(p.valid[:, None], pos_pred, jnp.inf), 0))
        vol = jnp.prod(jnp.maximum(ext, 1e-10))
    nv = jnp.maximum(jnp.sum(p.valid), 1)
    r_k = (3.0 * des_num_ngb * vol / (4.0 * jnp.pi * nv)) ** (1.0 / 3.0)
    hpos = jnp.where(p.hsml_vd > 0, p.hsml_vd, jnp.inf)
    hmin = jnp.min(jnp.where(p.is_collisionless, hpos, jnp.inf))
    s0 = jnp.where(jnp.isfinite(hmin), jnp.maximum(hmin, 1e-12), r_k / 2.0)
    payload = make_payload(pos_pred, vel_pred, p.mass, p.ptype)
    table = build_table(pos_pred, p.ptype, p.valid, s0=s0, box=box,
                        payload=payload)

    nb = -(-n // block)
    npad = nb * block

    def pad(a, fill=0):
        return jnp.pad(a, [(0, npad - n)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    hwarm = jnp.where(p.hsml_vd > 0, p.hsml_vd, 2.0 * s0)

    def one(args):
        pq, tq, hq = args
        h, cnt, _ = knn_radius(table, pq, tq, hq, des_num_ngb, cap=cap,
                               n_iter=3)
        idx, rows, mask, _ = gather_candidates(table, pq, tq, h, cap=cap)
        d = rows[..., 0:3] - pq[:, None, :]
        if box:
            d = d - box * jnp.round(d / box)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        hb = jnp.maximum(h, 1e-30)[:, None]
        ok = mask & (r < hb)
        wk = jnp.where(ok, sph_kernel(r / hb) / hb**3, 0.0)
        rho = jnp.sum(rows[..., 6] * wk, axis=1)
        ngb = jnp.sum(ok, axis=1)
        ngb_safe = jnp.maximum(ngb, 1).astype(dtype)
        v = jnp.where(ok[..., None], rows[..., 3:6], 0.0)
        vmean = jnp.sum(v, axis=1) / ngb_safe[:, None]
        v2mean = jnp.sum(v * v, axis=1) / ngb_safe[:, None]
        disp2 = jnp.sum(v2mean - vmean * vmean, axis=-1)
        disp = jnp.sqrt(jnp.maximum(disp2, 0.0))
        return h, ngb.astype(jnp.int32), rho, disp

    h, ngb, rho, disp = lax.map(
        one, (pad(pos_pred).reshape(nb, block, 3),
              pad(p.ptype, -1).reshape(nb, block),
              pad(hwarm, 1.0).reshape(nb, block)))
    h = h.reshape(-1)[:n]
    ngb = ngb.reshape(-1)[:n]
    rho = rho.reshape(-1)[:n]
    disp = disp.reshape(-1)[:n]

    upd = p.is_collisionless & active
    return dataclasses.replace(
        p,
        hsml_vd=jnp.where(upd, h, p.hsml_vd),
        ngb_vd=jnp.where(upd, ngb, p.ngb_vd),
        dens_vd=jnp.where(upd, rho, p.dens_vd),
        vel_disp=jnp.where(upd, disp, p.vel_disp),
    )
