"""Time integration: prediction, DKD advance, reflection, box wrapping.

The reference integrates each particle with a drift-kick-drift step centered
on the global time: ``advance()`` (nbody/predict.c:245-385) does a half drift
to All.Time, a full kick with the midpoint acceleration (plus the pending SIDM
velocity kick dVel), and a half drift with the new velocity; the particle's
step is ``dt = 2*(All.Time - CurrentTime)``.  Forces are evaluated at
positions linearly predicted to All.Time (predict.c:24-238).

Here the same scheme is expressed as pure array ops with an ``active`` mask:
inactive particles pass through unchanged, which reproduces the reference's
individual-timestep timeline semantics without its pointer-based time tree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .cosmo import accel_postfactors, drift_factor, old_acc_reference
from .state import Particles


class StepConsts(NamedTuple):
    """Scalars fixed over a run, captured as jit-static-friendly arrays."""

    G: float
    hubble: float
    omega0: float
    omega_lambda: float
    comoving: bool
    periodic: bool
    box_size: float
    no_force: bool
    no_scatter: bool
    reflection_radius: float  # 0 = off
    min_egy_spec: float = 0.0
    min_gas_hsml: float = 0.0


def predict_positions(p: Particles, time, consts: StepConsts):
    """PosPred/VelPred at the global time (predict.c:24-117).

    Velocity prediction uses the *previous* acceleration, as the reference
    does when packing force targets.
    """
    dt = (time - p.current_time)[:, None]
    dt_h0 = dt * drift_factor(time, consts.hubble, consts.omega0,
                              consts.omega_lambda, consts.comoving)
    pos_pred = p.pos + p.vel * dt_h0
    if consts.no_force:
        vel_pred = p.vel
    else:
        vel_pred = p.vel + p.accel * dt
    return pos_pred, vel_pred


def apply_accel_postfactors(raw_accel, pos_pred, vel_pred, time,
                            consts: StepConsts):
    """Map raw summed (m/r^2-style) accelerations to kick accelerations and
    the |a| stored for the relative opening criterion (gravtree.c:250-324)."""
    fac1, fac2, fac3 = accel_postfactors(
        time, consts.G, consts.hubble, consts.omega0, consts.omega_lambda,
        consts.comoving, consts.periodic)
    if consts.comoving:
        accel = fac1 * raw_accel + fac2 * vel_pred + fac3 * pos_pred
    else:
        accel = fac1 * raw_accel + fac3 * pos_pred
    old_acc = old_acc_reference(accel, pos_pred, time, consts.G, consts.hubble,
                                consts.omega0, consts.comoving, consts.periodic)
    return accel, old_acc


def advance(p: Particles, time, active, consts: StepConsts) -> Particles:
    """DKD leapfrog for active particles (predict.c:245-385).

    dt = 2*(time - current_time); pending SIDM kicks (dvel) are applied inside
    the kick and cleared (predict.c:281,335); current_time -> time + dt/2.
    """
    dt = 2.0 * (time - p.current_time)
    dt = jnp.where(active, dt, 0.0)
    dtc = dt[:, None]
    s_inv = drift_factor(time, consts.hubble, consts.omega0,
                         consts.omega_lambda, consts.comoving)

    pos = p.pos + 0.5 * p.vel * dtc * s_inv
    if consts.no_force:
        vel = p.vel
    else:
        vel = p.vel + p.accel * dtc
    if not consts.no_scatter:
        vel = vel + jnp.where(active[:, None], p.dvel, 0.0)
    pos = pos + 0.5 * vel * dtc * s_inv

    new_current = jnp.where(active, time + 0.5 * dt, p.current_time)
    dvel = jnp.where(active[:, None], 0.0, p.dvel)

    # gas thermodynamic updates (predict.c:300-320): u with the MinEgySpec
    # floor, rho advanced a half step, hsml by its full-step rate
    gas_act = active & p.is_gas
    egy = jnp.where(gas_act,
                    jnp.maximum(consts.min_egy_spec,
                                p.egy_spec + p.dt_egy * dt), p.egy_spec)
    density = jnp.where(gas_act, p.density + p.dt_density * 0.5 * dt,
                        p.density)
    hsml = jnp.where(gas_act,
                     jnp.maximum(consts.min_gas_hsml,
                                 p.hsml + p.dt_hsml * dt), p.hsml)
    return Particles(
        **{**_fields(p), "pos": pos, "vel": vel, "dvel": dvel,
           "current_time": new_current, "egy_spec": egy,
           "density": density, "hsml": hsml})


def reflect(p: Particles, radius: float) -> Particles:
    """Spherical reflecting wall (nbody/reflection.c:7-32): for r > radius and
    outward motion, reverse the radial velocity component."""
    r2 = jnp.sum(p.pos * p.pos, axis=-1)
    vr = jnp.sum(p.pos * p.vel, axis=-1)
    outside = (r2 > radius * radius) & (vr > 0.0) & p.valid
    r2_safe = jnp.maximum(r2, 1e-30)
    vel = jnp.where(outside[:, None],
                    p.vel - 2.0 * (vr / r2_safe)[:, None] * p.pos,
                    p.vel)
    return Particles(**{**_fields(p), "vel": vel})


def box_wrap(p: Particles, box: float) -> Particles:
    """Map positions onto [0, Box] (predict.c do_box_wrapping:395-416)."""
    pos = p.pos - box * jnp.floor(p.pos / box)
    return Particles(**{**_fields(p), "pos": pos})


def find_next_time(p: Particles, big: float = 1e37):
    """Global next time = min over valid particles of max_pred_time
    (timeline.c:20-78; MPI_Allreduce MIN becomes a masked min)."""
    mpt = jnp.where(p.valid, p.max_pred_time, big)
    return jnp.min(mpt)


def active_mask(p: Particles, time, tol: float = 0.0):
    """Particles due for a kick at ``time``.

    The reference activates every particle whose MaxPredTime falls in a small
    strip above the minimum (timeline.c:44-74); with synchronized or
    power-of-two block steps the strip is exact equality.
    """
    return p.valid & (p.max_pred_time <= time + tol)


def _fields(p: Particles) -> dict:
    import dataclasses
    return {f.name: getattr(p, f.name) for f in dataclasses.fields(p)}
