"""Sharded simulation step over a device mesh (shard_map + collectives).

Communication pattern (the ICI replacement for the reference's hypercube
MPI_Sendrecv rounds, gravtree.c:171-222 / sidm.c:204-603):

* gravity: one ``all_gather`` of (pos, mass, eps) -> every device builds the
  same cheap tree and walks ONLY its local Morton-contiguous target shard
  (``eval_targets``). This inverts the reference's "replicate targets, local
  trees, sum partials" into "replicate tree, shard targets, no reduction".
* SIDM: the particle pytree is all-gathered and the DSMC pass runs
  replicated (identical RNG -> identical proposals and global conflict
  resolution on every device), then each device keeps its local slice of the
  kicks. Deterministic under any device count. (A target-sharded proposal
  scan is the planned optimization; scattering is a small fraction of step
  time.)
* time integration / reductions: element-wise on shards; global minima and
  maxima (next time, vmax) via ``lax.pmin``/``lax.pmax`` — the analog of the
  reference's MPI_Allreduce MIN in timeline.c:38.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .. import integrate, timestep
from ..constants import MAX_REAL_NUMBER
from ..state import Particles
from .mesh import AXIS


def _gather(x):
    return lax.all_gather(x, AXIS, tiled=True)


def make_sharded_force(mesh: Mesh, *, theta=0.5, opening=1,
                       err_tol_force_acc=0.005, box=None, ewald=None,
                       walk_config=None, depth: int = 10):
    """Sharded tree gravity: (pos_local, mass_local, eps_local, oldacc_local)
    -> (acc_local, pot_local)."""
    from ..ops.tree import build_octree
    from ..ops.treeforce import WalkConfig, eval_targets

    cfg = walk_config or WalkConfig()

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
             out_specs=(P(AXIS), P(AXIS)))
    def force(pos_l, mass_l, eps_l, oldacc_l):
        pos = _gather(pos_l)
        mass = _gather(mass_l)
        eps = _gather(eps_l)
        valid = mass > 0
        tree = build_octree(pos, mass, eps, valid, box=box or 0.0,
                            depth=depth)
        toac = oldacc_l * err_tol_force_acc
        acc, pot, _ = eval_targets(
            tree, pos_l, eps_l, toac, mass_l > 0, box=box, theta=theta,
            use_relative=(opening == 1), config=cfg, ewald=ewald)
        pot = pot + mass_l / jnp.maximum(eps_l, 1e-30)
        pot = jnp.where(mass_l > 0, pot, 0.0)
        acc = jnp.where((mass_l > 0)[:, None], acc, 0.0)
        return acc, pot

    return force


def make_multichip_step(mesh: Mesh, consts, ts_params, *, theta=0.5,
                        opening=1, err_tol_force_acc=0.005,
                        sidm_params=None, box=None, ewald=None,
                        synchronized=True, time_max=1e30, walk_config=None,
                        depth: int = 10):
    """Full sharded timestep: predict -> gravity -> SIDM -> advance ->
    reflect/wrap -> timesteps. Mirrors simulation._build_step on shards."""
    from ..ops.tree import build_octree
    from ..ops.treeforce import WalkConfig, eval_targets

    cfg = walk_config or WalkConfig()
    specs_p = Particles(*([P(AXIS)] * len(dataclasses.fields(Particles))))

    @partial(shard_map, mesh=mesh,
             in_specs=(specs_p, P(), P()),
             out_specs=(specs_p, P(), P(), P()),
             check_vma=False)
    def step(p_l: Particles, vmax, key):
        # --- global next time (timeline.c:38 Allreduce MIN) ---
        mpt = jnp.where(p_l.valid, p_l.max_pred_time, MAX_REAL_NUMBER)
        t_next = lax.pmin(jnp.min(mpt), AXIS)
        t_next = jnp.minimum(t_next, time_max)
        active_l = integrate.active_mask(p_l, t_next)

        # --- predict + gravity on the local shard ---
        pos_pred_l, vel_pred_l = integrate.predict_positions(p_l, t_next,
                                                             consts)
        pos = _gather(pos_pred_l)
        mass = _gather(p_l.mass)
        eps_tab = ts_params.softening_table
        eps_l = eps_tab[jnp.clip(p_l.ptype, 0, 5)]
        eps = _gather(eps_l)
        valid = mass > 0
        tree = build_octree(pos, mass, eps, valid, box=box or 0.0,
                            depth=depth)
        raw_acc, pot, _ = eval_targets(
            tree, pos_pred_l, eps_l, p_l.old_acc * err_tol_force_acc,
            p_l.mass > 0, box=box, theta=theta,
            use_relative=(opening == 1), config=cfg, ewald=ewald)
        pot = pot + p_l.mass / jnp.maximum(eps_l, 1e-30)
        accel_l, old_acc_l = integrate.apply_accel_postfactors(
            raw_acc, pos_pred_l, vel_pred_l, t_next, consts)
        p_l = dataclasses.replace(
            p_l,
            accel=jnp.where(active_l[:, None], accel_l, p_l.accel),
            old_acc=jnp.where(active_l, old_acc_l, p_l.old_acc),
            pot=jnp.where(active_l, pot, p_l.pot),
        )

        # --- SIDM: replicated DSMC over the gathered state ---
        n_scat = jnp.zeros((), jnp.int32)
        if sidm_params is not None:
            from ..ops.sidm import sidm_scatter
            p_g = jax.tree.map(_gather, p_l)
            active_g = _gather(active_l)
            pos_pred_g = _gather(pos_pred_l)
            p_g2, n_scat = sidm_scatter(p_g, pos_pred_g, t_next, active_g,
                                        vmax, key, sidm_params,
                                        box=box or 0.0)
            # local slice of the updated kick field
            shard_i = lax.axis_index(AXIS)
            nloc = p_l.pos.shape[0]
            dvel_l = lax.dynamic_slice_in_dim(p_g2.dvel, shard_i * nloc,
                                              nloc, axis=0)
            hs_l = lax.dynamic_slice_in_dim(p_g2.hsml_vd, shard_i * nloc,
                                            nloc, axis=0)
            ng_l = lax.dynamic_slice_in_dim(p_g2.ngb_vd, shard_i * nloc,
                                            nloc, axis=0)
            p_l = dataclasses.replace(p_l, dvel=dvel_l, hsml_vd=hs_l,
                                      ngb_vd=ng_l)

        # --- advance + boundaries (element-wise on shards) ---
        p_l = integrate.advance(p_l, t_next, active_l, consts)
        if consts.reflection_radius > 0:
            p_l = integrate.reflect(p_l, consts.reflection_radius)
        if consts.periodic:
            p_l = integrate.box_wrap(p_l, consts.box_size)

        # --- new timesteps; vmax via pmax ---
        new_mpt = timestep.find_timesteps(p_l, t_next, active_l, vmax,
                                          ts_params)
        if synchronized:
            mpt_min = lax.pmin(
                jnp.min(jnp.where(p_l.valid, new_mpt, MAX_REAL_NUMBER)),
                AXIS)
            new_mpt = jnp.where(p_l.valid, mpt_min, new_mpt)
        p_l = dataclasses.replace(p_l, max_pred_time=new_mpt)

        v2 = jnp.sum(p_l.vel * p_l.vel, axis=-1)
        vmax_new = lax.pmax(
            jnp.sqrt(jnp.max(jnp.where(p_l.valid, v2, 0.0))), AXIS)
        n_active = lax.psum(jnp.sum(active_l.astype(jnp.int32)), AXIS)
        return p_l, t_next, vmax_new, n_active

    return step
