"""Closed-form spline kernels.

The reference tabulates these (KERN_LEN=10000 force tables in
nbody/forcetree.c:1763-1793; KERNEL_TABLE=1000 SPH tables in
nbody/begrun.c:968-1004) and interpolates linearly. On TPU the VPU evaluates
the polynomials directly — faster than gather-based table lookups and exact
rather than linearly interpolated.

Conventions (u = r/h):

* Gravitational softening (forcetree.c force_setkernel): the softened force on
  a unit-mass source is ``m * wf(u) / h^3 * dx`` for u<1 and Newtonian
  ``m/r^3 * dx`` outside; h = 2.8 eps. Potential is ``m/h * wp(u)`` inside,
  ``-m/r`` outside.
* SPH cubic spline W(u) with the 8/pi normalization (begrun.c:977-989),
  density kernel is W(u)/h^3.
"""

import jax.numpy as jnp

from .constants import SOFTENING_SPLINE_FACTOR


def grav_force_kernel(u):
    """wf(u): softened 1/r^2 force factor; force = m*wf(u)/h^3 * dx.

    Piecewise from forcetree.c:1775-1789. Continuous at u=0.5 and wf(1)=1.
    """
    u = jnp.asarray(u)
    u2 = u * u
    u3 = u2 * u
    inner = 32.0 * (1.0 / 3.0 - 1.2 * u2 + u3)
    # guard u=0 for the 1/u^3 term (masked out by the select)
    us = jnp.maximum(u, 1e-12)
    outer = (64.0 * (1.0 / 3.0 - 0.75 * u + 0.6 * u2 - u3 / 6.0)
             - 1.0 / 15.0 / (us * us * us))
    return jnp.where(u < 0.5, inner, outer)


def grav_pot_kernel(u):
    """wp(u): softened potential factor; pot = m/h * wp(u). wp(1) = -1."""
    u = jnp.asarray(u)
    u2 = u * u
    u4 = u2 * u2
    inner = 16.0 / 3.0 * u2 - 9.6 * u4 + 6.4 * u4 * u - 2.8
    us = jnp.maximum(u, 1e-12)
    outer = (1.0 / 15.0 / us + 32.0 / 3.0 * u2 - 16.0 * u2 * u
             + 9.6 * u4 - 32.0 / 15.0 * u4 * u - 3.2)
    return jnp.where(u < 0.5, inner, outer)


def softened_inv_r3(r, h, eps_floor=1e-37):
    """Combined factor f(r) with force = m * f(r) * dx.

    Newtonian 1/r^3 for r>=h, spline-softened inside; h = 2.8*eps
    (forcetree.c:834). Safe at r=0 (returns finite central value).
    """
    r = jnp.asarray(r)
    h_inv = 1.0 / h
    u = r * h_inv
    r_safe = jnp.maximum(r, eps_floor)
    newton = 1.0 / (r_safe * r_safe * r_safe)
    soft = grav_force_kernel(jnp.minimum(u, 1.0)) * (h_inv * h_inv * h_inv)
    return jnp.where(u >= 1.0, newton, soft)


def softened_potential(r, h, eps_floor=1e-37):
    """phi(r)/m: -1/r outside h, spline inside (forcetree.c potential walk)."""
    r = jnp.asarray(r)
    h_inv = 1.0 / h
    u = r * h_inv
    r_safe = jnp.maximum(r, eps_floor)
    newton = -1.0 / r_safe
    soft = grav_pot_kernel(jnp.minimum(u, 1.0)) * h_inv
    return jnp.where(u >= 1.0, newton, soft)


def softening_h(eps):
    """Spline support radius from the Plummer-equivalent softening eps."""
    return SOFTENING_SPLINE_FACTOR * eps


_EIGHT_OVER_PI = 8.0 / jnp.pi


def sph_kernel(u):
    """Cubic-spline W(u), 8/pi normalization; W(r;h) = sph_kernel(r/h)/h^3.

    Matches begrun.c:977-989; zero for u>=1.
    """
    u = jnp.asarray(u)
    inner = _EIGHT_OVER_PI * (1.0 - 6.0 * u * u * (1.0 - u))
    om = 1.0 - u
    outer = _EIGHT_OVER_PI * 2.0 * om * om * om
    w = jnp.where(u < 0.5, inner, outer)
    return jnp.where(u < 1.0, w, 0.0)


def sph_kernel_deriv(u):
    """dW/du (begrun.c:980,986); zero for u>=1."""
    u = jnp.asarray(u)
    inner = _EIGHT_OVER_PI * (-12.0 * u + 18.0 * u * u)
    om = 1.0 - u
    outer = _EIGHT_OVER_PI * (-6.0 * om * om)
    d = jnp.where(u < 0.5, inner, outer)
    return jnp.where(u < 1.0, d, 0.0)
