"""Particle state as a pytree of structure-of-arrays.

TPU-native counterpart of the reference's array-of-structs ``particle_data``
(nbody/allvars.h:422-460) and ``sph_particle_data`` (allvars.h:467-503).  All
arrays have a static padded length N (a multiple of the lane width); padding
slots carry ``ptype == -1`` and ``mass == 0`` so they are inert in every kernel
(forces, scattering, reductions) without dynamic shapes.

Unlike the reference there is no separate PosPred/VelPred storage: predictions
to the current global time are pure functions of (pos, vel, accel,
current_time) and are recomputed where needed (predict.c:24-238 becomes
:func:`sidm_tpu.integrate.predict`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "pos", "vel", "mass", "ptype", "pid", "accel", "pot", "old_acc",
        "dvel", "hsml_vd", "ngb_vd", "vel_disp", "dens_vd",
        "current_time", "max_pred_time",
        "egy_spec", "density", "hsml", "dt_egy", "dt_density", "dt_hsml",
        "div_vel", "curl_vel", "ngb_sph",
    ],
    meta_fields=[],
)
@dataclass
class Particles:
    # --- core (all types) ---
    pos: jax.Array            # (N,3) comoving position
    vel: jax.Array            # (N,3) internal velocity (u = v_pec/sqrt(a) comoving)
    mass: jax.Array           # (N,)
    ptype: jax.Array          # (N,) int32; Gadget type 0..5, -1 = padding
    pid: jax.Array            # (N,) uint32 particle id
    accel: jax.Array          # (N,3) last acceleration (physical factors applied)
    pot: jax.Array            # (N,) gravitational potential (peculiar)
    old_acc: jax.Array        # (N,) |a| for the relative opening criterion
    # --- SIDM ---
    dvel: jax.Array           # (N,3) pending scattering velocity kick
    hsml_vd: jax.Array        # (N,) SIDM/veldisp smoothing length (HsmlVelDisp)
    ngb_vd: jax.Array         # (N,) int32 neighbour count at hsml_vd
    vel_disp: jax.Array       # (N,) local velocity dispersion (VELDISP)
    dens_vd: jax.Array        # (N,) local DM density (DensVelDisp)
    # --- individual timesteps ---
    current_time: jax.Array   # (N,) particle proper integration time
    max_pred_time: jax.Array  # (N,) time at which the particle must be kicked
    # --- SPH ---
    egy_spec: jax.Array       # (N,) specific internal energy
    density: jax.Array        # (N,)
    hsml: jax.Array           # (N,) SPH smoothing length
    dt_egy: jax.Array         # (N,) du/dt
    dt_density: jax.Array     # (N,) drho/dt
    dt_hsml: jax.Array        # (N,) dh/dt
    div_vel: jax.Array        # (N,)
    curl_vel: jax.Array       # (N,)
    ngb_sph: jax.Array        # (N,) int32

    @property
    def n_padded(self) -> int:
        return self.pos.shape[0]

    @property
    def valid(self) -> jax.Array:
        return self.ptype >= 0

    @property
    def is_gas(self) -> jax.Array:
        return self.ptype == 0

    @property
    def is_collisionless(self) -> jax.Array:
        return self.ptype > 0

    def count_valid(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def make_particles(
    pos,
    vel,
    mass,
    ptype,
    pid=None,
    *,
    egy_spec=None,
    pad_to_multiple: int = 256,
    n_padded: Optional[int] = None,
    dtype=jnp.float32,
) -> Particles:
    """Build a padded Particles pytree from host arrays."""
    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    if n_padded is None:
        n_padded = _round_up(max(n, 1), pad_to_multiple)
    if n_padded < n:
        raise ValueError(f"n_padded={n_padded} < n={n}")

    def pad2(a, fill=0.0):
        a = np.asarray(a, dtype=np.float64)
        out = np.full((n_padded, 3), fill, dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out, dtype=dtype)

    def pad1(a, fill=0.0, dt=None):
        a = np.asarray(a)
        out = np.full((n_padded,), fill, dtype=a.dtype if dt is None else dt)
        out[:n] = a
        return jnp.asarray(out, dtype=dt or dtype)

    if pid is None:
        pid = np.arange(1, n + 1, dtype=np.uint32)
    ptype_arr = np.full((n_padded,), -1, dtype=np.int32)
    ptype_arr[:n] = np.asarray(ptype, dtype=np.int32)

    zeros1 = jnp.zeros((n_padded,), dtype=dtype)
    zeros3 = jnp.zeros((n_padded, 3), dtype=dtype)
    izeros = jnp.zeros((n_padded,), dtype=jnp.int32)

    return Particles(
        pos=pad2(pos),
        vel=pad2(vel),
        mass=pad1(mass, 0.0, dtype),
        ptype=jnp.asarray(ptype_arr),
        pid=pad1(pid, 0, jnp.uint32),
        accel=zeros3,
        pot=zeros1,
        old_acc=zeros1,
        dvel=zeros3,
        hsml_vd=zeros1,
        ngb_vd=izeros,
        vel_disp=zeros1,
        dens_vd=zeros1,
        current_time=zeros1,
        max_pred_time=zeros1,
        egy_spec=pad1(egy_spec, 0.0, dtype) if egy_spec is not None else zeros1,
        density=zeros1,
        hsml=zeros1,
        dt_egy=zeros1,
        dt_density=zeros1,
        dt_hsml=zeros1,
        div_vel=zeros1,
        curl_vel=zeros1,
        ngb_sph=izeros,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "mass_comp", "energy_kin_comp", "energy_pot_comp", "energy_int_comp",
        "momentum_comp", "ang_momentum_comp", "center_of_mass_comp",
    ],
    meta_fields=[],
)
@dataclass
class SystemState:
    """Global conserved-quantity summary per type (allvars.h:517-537)."""

    mass_comp: jax.Array          # (6,)
    energy_kin_comp: jax.Array    # (6,)
    energy_pot_comp: jax.Array    # (6,)
    energy_int_comp: jax.Array    # (6,)
    momentum_comp: jax.Array      # (6,3)
    ang_momentum_comp: jax.Array  # (6,3)
    center_of_mass_comp: jax.Array  # (6,3)

    @property
    def energy_tot_comp(self):
        return self.energy_kin_comp + self.energy_pot_comp + self.energy_int_comp

    @property
    def mass(self):
        return jnp.sum(self.mass_comp)

    @property
    def energy_kin(self):
        return jnp.sum(self.energy_kin_comp)

    @property
    def energy_pot(self):
        return jnp.sum(self.energy_pot_comp)

    @property
    def energy_int(self):
        return jnp.sum(self.energy_int_comp)

    @property
    def energy_tot(self):
        return jnp.sum(self.energy_tot_comp)


def state_dict(p: Particles) -> dict:
    """Flatten to a plain dict of numpy arrays (for checkpointing)."""
    return {f.name: np.asarray(getattr(p, f.name)) for f in dataclasses.fields(p)}


def state_from_dict(d: dict) -> Particles:
    return Particles(**{k: jnp.asarray(v) for k, v in d.items()})
