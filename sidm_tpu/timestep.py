"""Per-particle timestep criteria (nbody/timestep.c:17-326).

Produces new ``max_pred_time`` values for active particles. All criteria act
on full arrays under masks; the reference's ordered binary timeline tree
(timeline.c) is unnecessary — the global min is a masked reduction.

Implemented criteria (TypeOfTimestepCriterion):
  0: dt = sqrt(2 * ErrTolIntAccuracy * eps / |a| * s_a)   (timestep.c:157)
  1: dt = ErrTolVelScale / |a|                            (timestep.c:160)
plus, for SIDM particles (timestep.c:246-265):
  dt_sidm = ProbabilityTol / (C_max * m * h^-3)
  dt_Grho = ErrTolDynamicalAccuracy / sqrt(C_Grho * G * m * h^-3)   [physical]
          = ErrTolDynamicalAccuracy * H(a) * a / sqrt(C_Grho G m h^-3 a^-3)
and the SPH Courant condition (timestep.c:227-245).

The growth limiter dt <= 1.3 * dt_old (timestep.c:268) and Max/Min clamps are
applied; the reference's +-2% random jitter exists only to de-duplicate keys
in its binary tree and is intentionally dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .constants import (BALL_INVERSE, GAMMA, GAMMA_MINUS1,
                        TIMESTEP_INCREASE_FACTOR)
from .cosmo import hubble_of_a, s_of_a
from .sidm_common import sidm_cmax
from .state import Particles


class TimestepParams(NamedTuple):
    criterion: int
    err_tol_int_accuracy: float
    err_tol_vel_scale: float
    err_tol_dynamical_accuracy: float
    max_size_timestep: float
    min_size_timestep: float
    courant_fac: float
    art_bulk_visc: float
    softening_table: jnp.ndarray      # (6,) comoving softenings at current time
    # SIDM
    sidm_on: bool
    probability_tol: float
    des_num_ngb: int
    max_num_ngb_dev: int
    cross_section_internal: float
    cross_section_type: int
    yukawa_velocity: float
    cross_section_vel_scale: float
    cross_section_pow_law: float
    G: float
    hubble: float
    omega0: float
    omega_lambda: float
    comoving: bool


def find_timesteps(p: Particles, time, active, vmax, params: TimestepParams,
                   first: bool = False):
    """Return new max_pred_time for active particles (others unchanged).

    ``first=True`` reproduces mode=2 (init.c:189): no growth limiter.
    ``vmax`` is the global max particle speed (sidm.c getvmax:970-990) used by
    the velocity-dependent C_max bounds.
    """
    dtype = p.pos.dtype
    ac = jnp.sqrt(jnp.sum(p.accel * p.accel, axis=-1))
    ac = jnp.maximum(ac, 1e-30)

    if params.comoving:
        s_a = s_of_a(time, params.hubble, params.omega0, params.omega_lambda)
        hubble_a = hubble_of_a(time, params.hubble, params.omega0,
                               params.omega_lambda)
        a3inv = 1.0 / time**3
    else:
        s_a = jnp.asarray(1.0, dtype)
        hubble_a = jnp.asarray(1.0, dtype)
        a3inv = jnp.asarray(1.0, dtype)

    eps = params.softening_table[jnp.clip(p.ptype, 0, 5)]
    if params.criterion == 0:
        dt = jnp.sqrt(2.0 * params.err_tol_int_accuracy * eps / ac * s_a)
    elif params.criterion == 1:
        dt = params.err_tol_vel_scale / ac
    elif params.criterion in (2, 3, 4):
        # velocity-dispersion / local-density criteria (timestep.c:163-224);
        # gas parts use csnd, collisionless parts VelDisp / DensVelDisp
        pressure = GAMMA_MINUS1 * p.egy_spec * jnp.maximum(p.density, 1e-30)
        csnd_g = jnp.sqrt(GAMMA * pressure / jnp.maximum(p.density, 1e-30))
        dens = jnp.where(p.is_gas, p.density, p.dens_vd)
        dens = jnp.maximum(dens, 1e-30)
        if params.comoving:
            dt_sigma_gas = (params.err_tol_vel_scale
                            * (csnd_g / jnp.sqrt(time)) / ac)
            dt_rho = (3.0 * params.err_tol_int_accuracy * jnp.sqrt(1.5)
                      * hubble_a * time
                      / jnp.sqrt(4.0 * jnp.pi * params.G * dens * a3inv))
        else:
            dt_sigma_gas = params.err_tol_vel_scale * csnd_g / ac
            dt_rho = (3.0 * params.err_tol_int_accuracy * jnp.sqrt(1.5)
                      / jnp.sqrt(4.0 * jnp.pi * params.G * dens))
        dt_sigma_dm = (params.err_tol_int_accuracy
                       * jnp.maximum(p.vel_disp, 1e-30) / ac)
        dt_sigma = jnp.where(p.is_gas, dt_sigma_gas, dt_sigma_dm)
        if params.criterion == 2:
            dt = dt_sigma
        elif params.criterion == 3:
            dt = dt_rho
        else:
            dt = jnp.minimum(dt_rho, dt_sigma)
    else:
        raise NotImplementedError(
            f"TypeOfTimestepCriterion {params.criterion}")

    # --- SPH Courant (timestep.c:227-245) ---
    is_gas = p.is_gas
    pressure = GAMMA_MINUS1 * p.egy_spec * jnp.maximum(p.density, 1e-30)
    csnd = jnp.sqrt(GAMMA * pressure / jnp.maximum(p.density, 1e-30))
    v = jnp.sqrt(jnp.sum(p.vel * p.vel, axis=-1))
    hs = jnp.maximum(p.hsml, 1e-30)
    visc = 1.0 + 0.6 * params.art_bulk_visc
    if params.comoving:
        vphys = v * jnp.sqrt(time)
        dt_cour = (params.courant_fac * time * hubble_a * time * hs /
                   (time * hs * jnp.abs(jnp.sqrt(time) * p.div_vel)
                    + jnp.maximum(csnd, vphys) * visc))
    else:
        dt_cour = (params.courant_fac * hs /
                   (hs * jnp.abs(p.div_vel) + jnp.maximum(csnd, v) * visc))
    dt = jnp.where(is_gas, jnp.minimum(dt, dt_cour), dt)

    # --- SIDM caps for collisionless particles (timestep.c:246-265) ---
    if params.sidm_on:
        c_max = sidm_cmax(
            time, vmax, params.cross_section_internal,
            params.cross_section_type, params.yukawa_velocity,
            params.cross_section_vel_scale,
            params.des_num_ngb, params.max_num_ngb_dev,
            params.hubble, params.omega0, params.omega_lambda,
            params.comoving, per_dt_h0=False)
        h = jnp.maximum(p.hsml_vd, 1e-30)
        hinv3 = 1.0 / (h * h * h)
        dt_sidm = params.probability_tol / jnp.maximum(
            c_max * p.mass * hinv3, 1e-30)
        c_grho = BALL_INVERSE * (params.des_num_ngb + params.max_num_ngb_dev)
        if params.comoving:
            dt_grho = (params.err_tol_dynamical_accuracy * hubble_a * time /
                       jnp.sqrt(c_grho * params.G * p.mass * hinv3 * a3inv))
        else:
            dt_grho = (params.err_tol_dynamical_accuracy /
                       jnp.sqrt(jnp.maximum(
                           c_grho * params.G * p.mass * hinv3, 1e-30)))
        cap = jnp.minimum(dt_sidm, dt_grho)
        dt = jnp.where(p.is_collisionless, jnp.minimum(dt, cap), dt)

    # --- growth limiter and clamps (timestep.c:268-307) ---
    if not first:
        # called after advance(): current_time = kick time + dt_old/2 while
        # max_pred_time still holds the kick time, so dt_old recovers as
        # 2*(current_time - max_pred_time) (cf. timestep.c:144 dtold).
        dt_old = 2.0 * (p.current_time - p.max_pred_time)
        dt_old = jnp.maximum(dt_old, 0.0)
        dt = jnp.minimum(dt, TIMESTEP_INCREASE_FACTOR * jnp.where(
            dt_old > 0, dt_old, dt))
    dt = jnp.minimum(dt, params.max_size_timestep)
    dt = jnp.maximum(dt, params.min_size_timestep)

    new_mpt = p.current_time + 0.5 * dt
    return jnp.where(active, new_mpt, p.max_pred_time)


def get_vmax(p: Particles):
    """Max |v| over all particles (sidm.c getvmax:969-989)."""
    v2 = jnp.sum(p.vel * p.vel, axis=-1)
    return jnp.sqrt(jnp.max(jnp.where(p.valid, v2, 0.0)))
