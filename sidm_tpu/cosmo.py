"""Cosmological integration factors.

In comoving mode the reference's time variable is the scale factor ``a`` and
the internal velocity is ``u = v_peculiar / sqrt(a)``.  Every drift uses
``dx = u * da / s(a)`` with ``s(a) = H0 sqrt(Omega0 + a(1-Omega0-OmegaL) +
a^3 OmegaL)`` (predict.c:35, sidm.c:224-232), and the raw tree acceleration is
mapped to du/da by the fac1/fac2/fac3 transform (gravtree.c:274-296).
"""

import jax.numpy as jnp


def s_of_a(a, hubble, omega0, omega_lambda):
    """s(a) = H0 * sqrt(Omega0 + a*(1-Omega0-OmegaL) + a^3*OmegaL) (predict.c:35)."""
    return hubble * jnp.sqrt(
        omega0 + a * (1.0 - omega0 - omega_lambda) + a**3 * omega_lambda)


def hubble_of_a(a, hubble, omega0, omega_lambda):
    """H(a) = H0 sqrt(Omega0/a^3 + (1-Omega0-OmegaL)/a^2 + OmegaL) (timestep.c:48)."""
    return hubble * jnp.sqrt(
        omega0 / a**3 + (1.0 - omega0 - omega_lambda) / a**2 + omega_lambda)


def drift_factor(a, hubble, omega0, omega_lambda, comoving):
    """Multiplier applied to dt for position drifts: 1/s(a) comoving, 1 physical."""
    if not comoving:
        return jnp.asarray(1.0, dtype=jnp.result_type(a, float))
    return 1.0 / s_of_a(a, hubble, omega0, omega_lambda)


def accel_postfactors(a, G, hubble, omega0, omega_lambda, comoving, periodic):
    """(fac1, fac2, fac3) mapping raw tree accel to the kick acceleration.

    Comoving (gravtree.c:274-296):
        accel = fac1 * a_tree + fac2 * vel_pred (+ fac3 * pos_pred if not periodic)
        fac1 = G / (H0 * a^2 * sqrt(Omega0 + a(1-..)+a^3 OmegaL))
        fac2 = -1.5/a
        fac3 = 0.5*H0*Omega0 / (a^2 * sqrt(...))
    Physical (gravtree.c:300-324):
        accel = G * a_tree + OmegaLambda*H0^2 * pos_pred
    """
    if comoving:
        sa = jnp.sqrt(omega0 + a * (1.0 - omega0 - omega_lambda)
                      + a**3 * omega_lambda)
        fac1 = G / (hubble * a * a * sa)
        fac2 = -1.5 / a
        fac3 = jnp.where(periodic, 0.0, 0.5 * hubble * omega0 / (a * a * sa))
        return fac1, fac2, fac3
    fac1 = jnp.asarray(G, dtype=jnp.result_type(a, float))
    fac2 = jnp.zeros_like(fac1)
    fac3 = jnp.asarray(omega_lambda, dtype=fac1.dtype) * hubble * hubble
    return fac1, fac2, fac3


def old_acc_reference(accel, pos_pred, a, G, hubble, omega0, comoving, periodic):
    """|a| stored for the relative opening criterion (gravtree.c:250-271,300-307).

    In comoving non-periodic runs the homogeneous-background pull
    0.5*H0^2*Omega0/G * x is added back before taking the norm.
    """
    if comoving and not periodic:
        fac3 = 0.5 * hubble * hubble * omega0 / G
        accel = accel + fac3 * pos_pred
    return jnp.sqrt(jnp.sum(accel * accel, axis=-1))
