"""Shared SIDM cross-section math used by both the DSMC kernel and the
timestep criteria.

The reference compiles one of five cross-section models (CROSS_SECTION_TYPE
0..4, nbody/Makefile:32-38) and duplicates the comoving upper-bound constants
in sidm.c:226-316 and timestep.c:55-131. Here both call one function.

Model definitions (sigma0 = CrossSectionInternal):
  0: hard sphere            sigma(v) = sigma0
  1: Maxwellian             sigma(v) = sigma0 / v
  2: Yukawa-like total      sigma(v) = sigma0 / (1 + (v/vc)^2)^2
  3: power law              sigma(v) = sigma0 * (v/v_scale)^alpha
  4: Yukawa angular         dsigma/dOmega = sigma0/4pi/(1+(v/vc)^2 sin^2(t/2))^2
     (total bounded by sigma0; angle selected by rejection in the kernel)

The DSMC pair term is P_j = 0.5 * m_j * W(r;h) * sigma(v_rel) * v_rel * dt_h0
(sidm.c:352-386). The first-stage bound P_max = C_Pmax * m * h^-3 * dt_h0 with
C_Pmax = SAFEFACTOR * (3/4pi) * (DesNumNgb+Dev) * max_v[sigma(v) v].
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import BALL_INVERSE, SAFE_FACTOR


def cross_section_co(time, sigma_internal, cs_type, comoving):
    """Comoving-corrected sigma0 (sidm.c:226-316)."""
    if not comoving:
        return jnp.asarray(sigma_internal, jnp.result_type(time, float))
    power = 2.5 if cs_type == 1 else 2.0
    return sigma_internal / time**power


def sigma_v_product(rv, time, sigma_co, cs_type, yukawa_velocity,
                    vel_scale, pow_law, comoving):
    """sigma(v_rel) * v_rel in comoving-corrected internal units.

    ``rv`` is the internal relative speed. Multiplying by 0.5*m_j*W and dt_h0
    gives the per-neighbour scattering probability (sidm.c:352-386).
    """
    if cs_type == 0:
        return sigma_co * rv
    if cs_type == 1:
        return sigma_co * jnp.ones_like(rv)
    if cs_type == 2:
        vc = _vc(time, yukawa_velocity, comoving)
        beta = rv / vc
        v_dep = 1.0 / (1.0 + beta * beta)
        return sigma_co * rv * v_dep * v_dep
    if cs_type == 3:
        rv_safe = jnp.maximum(rv, 1e-30)
        return sigma_co * rv * (rv_safe / vel_scale) ** pow_law
    if cs_type == 4:
        # total cross section bounded by sigma0; angular factor is applied by
        # rejection after partner selection (sidm.c:391-438)
        return sigma_co * rv
    raise ValueError(f"unknown CROSS_SECTION_TYPE {cs_type}")


def _vc(time, yukawa_velocity, comoving):
    if comoving:
        return yukawa_velocity / jnp.sqrt(time)
    return jnp.asarray(yukawa_velocity, jnp.result_type(time, float))


def sidm_cmax(time, vmax, sigma_internal, cs_type, yukawa_velocity, vel_scale,
              des_num_ngb, max_num_ngb_dev, hubble, omega0, omega_lambda,
              comoving, per_dt_h0: bool):
    """Upper bound C on (3/4pi)(Nngb+dev) * max_v[sigma(v) v] (comoving-corrected).

    With ``per_dt_h0=True`` the caller multiplies by dt_h0 = dt/s(a) (the form
    used in sidm.c C_Pmax); with ``False`` an extra 1/s(a) is folded in for
    comoving runs so the caller can multiply by the raw da step (the form used
    in timestep.c C_max). Physical runs are identical either way.
    """
    ngb_fac = SAFE_FACTOR * BALL_INVERSE * (des_num_ngb + max_num_ngb_dev)
    sigma_co = cross_section_co(time, sigma_internal, cs_type, comoving)

    if cs_type == 0:
        bound = 2.0 * vmax * sigma_co
    elif cs_type == 1:
        bound = sigma_co
    elif cs_type == 2:
        vc = _vc(time, yukawa_velocity, comoving)
        beta = 2.0 * vmax / vc
        v_dep = 1.0 / (1.0 + beta * beta)
        small = 2.0 * vmax * v_dep * v_dep * sigma_co
        large = (3.0 * jnp.sqrt(3.0) / 16.0) * vc * sigma_co
        bound = jnp.where(2.0 * vmax < vc / jnp.sqrt(3.0), small, large)
    elif cs_type == 3:
        # sigma v = sigma0 v (v/vs)^alpha; reference bounds it by 2*vs*sigma0
        # (valid for alpha <= 0 and v ~< vs; sidm.c:260-265)
        bound = 2.0 * vel_scale * sigma_co
    elif cs_type == 4:
        bound = 2.0 * vmax * sigma_co
    else:
        raise ValueError(f"unknown CROSS_SECTION_TYPE {cs_type}")

    c = ngb_fac * bound
    if (not per_dt_h0) and comoving:
        from .cosmo import s_of_a
        c = c / s_of_a(time, hubble, omega0, omega_lambda)
    return c


def salt_u32(salt):
    """Per-step Gumbel salt as uint32. Accepts Python ints and traced
    int arrays (a traced int32 & 0xFFFFFFFF would overflow at trace
    time, so mask only concrete values)."""
    import jax.numpy as jnp

    if isinstance(salt, int):
        salt = salt & 0xFFFFFFFF
    return jnp.asarray(salt).astype(jnp.uint32)
