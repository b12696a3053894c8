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


def _fused_sharded_force(pos, mass, eps, oldacc, nsh, *, theta, opening,
                         err_tol_force_acc, fused_config=None,
                         need_pot=True, pbc=None):
    """Group-sharded fused force over REPLICATED (gathered) arrays.

    Every device builds the same tree and walks a strided slice of the
    target-group blocks; partial full-length acc/pot are psum-reduced over
    the mesh axis (the ICI analog of gravtree.c:208-222's reverse exchange
    + partial-force summation). Returns FULL-length (acc, pot); the caller
    slices its local rows and adds the self-potential term.

    pbc=(box, alpha, rcut): TreePM short-range mode (the caller adds the
    mesh force and the periodic potential constants)."""
    from ..ops.fused_force import (FusedConfig, default_depth,
                                   fused_gravity_tree)
    from ..ops.tree import build_octree

    n = pos.shape[0]
    fcfg = fused_config or FusedConfig()
    tree = build_octree(pos, mass, eps, mass > 0,
                        box=pbc[0] if pbc is not None else 0.0,
                        depth=default_depth(n))
    sidx = lax.axis_index(AXIS)
    acc, pot = fused_gravity_tree(
        tree, mass, eps, oldacc, theta=theta, opening=opening,
        err_tol_force_acc=err_tol_force_acc, config=fcfg,
        need_pot=need_pot, shard=(sidx, nsh), pbc=pbc)
    acc = lax.psum(acc, AXIS)
    pot = lax.psum(pot, AXIS) if need_pot else pot
    return acc, pot, tree


def _local_slice(x, nloc):
    shard_i = lax.axis_index(AXIS)
    return lax.dynamic_slice_in_dim(x, shard_i * nloc, nloc, axis=0)


def make_sharded_force(mesh: Mesh, *, theta=0.5, opening=1,
                       err_tol_force_acc=0.005, box=None, ewald=None,
                       walk_config=None, depth: int = 10,
                       fused_config=None, pm_kernel=None):
    """Sharded tree gravity: (pos_local, mass_local, eps_local, oldacc_local)
    -> (acc_local, pot_local).

    Non-periodic runs use the fused frontier engine with group-block
    sharding + psum. Periodic runs with pm_kernel use the TreePM split
    (group-sharded screened walk + a REPLICATED mesh solve over the
    gathered positions — the mesh is a few ms of MXU DFTs, far below one
    walk shard); without pm_kernel they use the legacy flat-pair Ewald
    walk with local targets against a replicated tree."""
    from ..ops.tree import build_octree
    from ..ops.treeforce import WalkConfig, eval_targets

    cfg = walk_config or WalkConfig()
    use_fused = (not box) or (pm_kernel is not None)
    pbc = None
    if box and pm_kernel is not None:
        pbc = (float(box), pm_kernel.alpha, pm_kernel.rcut)
    nsh = mesh.devices.size

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
             out_specs=(P(AXIS), P(AXIS)), check_vma=False)
    def force(pos_l, mass_l, eps_l, oldacc_l):
        pos = _gather(pos_l)
        mass = _gather(mass_l)
        eps = _gather(eps_l)
        valid = mass > 0
        if use_fused:
            oldacc = _gather(oldacc_l)
            acc_f, pot_f, _ = _fused_sharded_force(
                pos, mass, eps, oldacc, nsh, theta=theta, opening=opening,
                err_tol_force_acc=err_tol_force_acc,
                fused_config=fused_config, pbc=pbc)
            nloc = pos_l.shape[0]
            acc = _local_slice(acc_f, nloc)
            pot = _local_slice(pot_f, nloc)
        else:
            tree = build_octree(pos, mass, eps, valid, box=box or 0.0,
                                depth=depth)
            toac = oldacc_l * err_tol_force_acc
            acc, pot, _ = eval_targets(
                tree, pos_l, eps_l, toac, mass_l > 0, box=box, theta=theta,
                use_relative=(opening == 1), config=cfg, ewald=ewald)
        pot = pot + mass_l / jnp.maximum(eps_l, 1e-30)
        if pbc is not None:
            from ..ops.pm import pm_accel
            acc_m, pot_m = pm_accel(pm_kernel, pos, mass,
                                    with_potential=True)
            nloc = pos_l.shape[0]
            acc = acc + _local_slice(acc_m, nloc)
            pot = (pot - mass_l * (2.0 * pbc[1] / (jnp.pi ** 0.5))
                   + _local_slice(pot_m, nloc)
                   + mass_l * (2.8372975 / pbc[0] - pm_kernel.pot_self))
        pot = jnp.where(mass_l > 0, pot, 0.0)
        acc = jnp.where((mass_l > 0)[:, None], acc, 0.0)
        return acc, pot

    return force


def make_ring_force(mesh: Mesh, *, theta=0.5, opening=1,
                    err_tol_force_acc=0.005, box=None, ewald=None,
                    walk_config=None, depth: int = 10):
    """Memory-scalable sharded gravity — the reference's actual
    distributed design (gravtree.c:171-222): each device keeps only a
    LOCAL octree over its Morton-contiguous shard, and target bunches
    VISIT every device, accumulating partial forces as they go. The
    hypercube MPI_Sendrecv rounds become a ``ppermute`` ring over ICI
    (the ring-attention schedule): nsh hops circulate
    (pos, eps, toac, acc, pot) bunches of size N/nsh; after the last hop
    each bunch is back at its owner with the COMPLETE force.

    Per-device memory is O(N/nsh) — no all_gather, no full tree, no
    full-length psum (the partial sums ride in the circulating buffer).

    Returns (pos_l, mass_l, eps_l, oldacc_l) -> (acc_l, pot_l)."""
    from ..ops.tree import build_octree
    from ..ops.treeforce import WalkConfig, eval_targets

    cfg = walk_config or WalkConfig()
    nsh = mesh.devices.size
    perm = [(i, (i + 1) % nsh) for i in range(nsh)]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
             out_specs=(P(AXIS), P(AXIS)), check_vma=False)
    def force(pos_l, mass_l, eps_l, oldacc_l):
        valid_l = mass_l > 0
        dtype = pos_l.dtype
        nloc = pos_l.shape[0]
        tree = build_octree(pos_l, jnp.where(valid_l, mass_l, 0.0), eps_l,
                            valid_l, box=box or 0.0, depth=depth)
        bunch = (pos_l, eps_l,
                 (oldacc_l * err_tol_force_acc).astype(dtype),
                 valid_l.astype(jnp.int32),
                 jnp.zeros((nloc, 3), dtype), jnp.zeros(nloc, dtype))

        # fori_loop (not an unrolled Python loop) so XLA reuses ONE
        # hop's eval buffers across all nsh hops — the unrolled form
        # books every hop's walk temporaries separately in the memory
        # analysis (measured 445 MB vs ~60 MB at N=2^17 on 8 shards)
        def hop(_, bunch):
            bpos, beps, btoac, bval, bacc, bpot = bunch
            acc_p, pot_p, _ = eval_targets(
                tree, bpos, beps, btoac, bval > 0, box=box, theta=theta,
                use_relative=(opening == 1), config=cfg, ewald=ewald)
            bunch = (bpos, beps, btoac, bval, bacc + acc_p, bpot + pot_p)
            if nsh > 1:
                bunch = tuple(lax.ppermute(x, AXIS, perm) for x in bunch)
            return bunch

        # nsh ppermutes return each bunch to its owner
        bunch = lax.fori_loop(0, nsh, hop, bunch)
        _, _, _, _, acc, pot = bunch
        pot = pot + mass_l / jnp.maximum(eps_l, 1e-30)
        pot = jnp.where(valid_l, pot, 0.0)
        acc = jnp.where(valid_l[:, None], acc, 0.0)
        return acc, pot

    return force


def make_multichip_step(mesh: Mesh, consts, ts_params, *, theta=0.5,
                        opening=1, err_tol_force_acc=0.005,
                        sidm_params=None, box=None, ewald=None,
                        synchronized=True, time_max=1e30, walk_config=None,
                        depth: int = 10, fused_config=None, pm_kernel=None,
                        sidm_halo_cap: int = 0, sidm_event_cap: int = 2048,
                        halo_pad: float = 1.6, gravity: str = "replicated"):
    """Full sharded timestep: predict -> gravity -> SIDM -> advance ->
    reflect/wrap -> timesteps. Mirrors simulation._build_step on shards.

    Non-periodic runs use the FUSED frontier engines (group-sharded force
    + psum; replicated fused-range DSMC). Periodic runs with pm_kernel
    use the TreePM split (sharded screened walk + replicated mesh solve
    + fused-range DSMC with minimum-image); without pm_kernel they fall
    back to the legacy flat-pair Ewald walk + cell-hash DSMC.

    ``sidm_halo_cap > 0`` switches the DSMC pass to the halo-exchange
    engine (parallel/halo.py): per-device memory O(N/nsh + halo_cap)
    instead of the gathered O(N) — the interior/export split of
    density.c:96-108 / sidm.c:141-161.

    ``gravity="ring"`` switches gravity to the memory-scalable local-tree
    + circulating-bunch pipeline (see make_ring_force): per-device force
    memory O(N/nsh). Requires ``sidm_halo_cap > 0`` when SIDM is on (the
    gathered DSMC fallback would reintroduce the O(N) footprint), and no
    pm_kernel (mesh solve not yet sharded)."""
    from ..ops.tree import build_octree
    from ..ops.treeforce import WalkConfig, eval_targets

    cfg = walk_config or WalkConfig()
    if gravity == "ring":
        if pm_kernel is not None:
            raise ValueError("gravity='ring' does not support pm_kernel")
        if sidm_params is not None and sidm_halo_cap <= 0:
            raise ValueError("gravity='ring' with SIDM requires "
                             "sidm_halo_cap > 0 (halo-exchange DSMC)")
    use_fused = (gravity != "ring") and ((not box)
                                         or (pm_kernel is not None))
    pbc = None
    if box and pm_kernel is not None:
        pbc = (float(box), pm_kernel.alpha, pm_kernel.rcut)
    nsh = mesh.devices.size
    specs_p = Particles(*([P(AXIS)] * len(dataclasses.fields(Particles))))

    @partial(shard_map, mesh=mesh,
             in_specs=(specs_p, P(), P()),
             out_specs=(specs_p, P(), P(), P(), P()),
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
        eps_tab = ts_params.softening_table
        eps_l = eps_tab[jnp.clip(p_l.ptype, 0, 5)]
        nloc = pos_pred_l.shape[0]
        tree = None
        pos = mass = None
        if gravity != "ring":
            pos = _gather(pos_pred_l)
            mass = _gather(p_l.mass)
            eps = _gather(eps_l)
            valid = mass > 0
        if gravity == "ring":
            # local tree + circulating bunches (see make_ring_force):
            # per-device memory O(N/nsh), no gathers, no full psum
            dtype = pos_pred_l.dtype
            vl = p_l.mass > 0
            tree_l = build_octree(pos_pred_l,
                                  jnp.where(vl, p_l.mass, 0.0), eps_l, vl,
                                  box=box or 0.0, depth=depth)
            perm = [(i, (i + 1) % nsh) for i in range(nsh)]
            bunch = (pos_pred_l, eps_l,
                     (p_l.old_acc * err_tol_force_acc).astype(dtype),
                     vl.astype(jnp.int32),
                     jnp.zeros((nloc, 3), dtype), jnp.zeros(nloc, dtype))

            def hop(_, bunch):
                bpos, beps, btoac, bval, bacc, bpot = bunch
                acc_p, pot_p, _ = eval_targets(
                    tree_l, bpos, beps, btoac, bval > 0, box=box,
                    theta=theta, use_relative=(opening == 1), config=cfg,
                    ewald=ewald)
                bunch = (bpos, beps, btoac, bval, bacc + acc_p,
                         bpot + pot_p)
                if nsh > 1:
                    bunch = tuple(lax.ppermute(x, AXIS, perm)
                                  for x in bunch)
                return bunch

            bunch = lax.fori_loop(0, nsh, hop, bunch)
            raw_acc, pot = bunch[4], bunch[5]
        elif use_fused:
            oldacc = _gather(p_l.old_acc)
            acc_f, pot_f, tree = _fused_sharded_force(
                pos, mass, eps, oldacc, nsh, theta=theta, opening=opening,
                err_tol_force_acc=err_tol_force_acc,
                fused_config=fused_config, pbc=pbc)
            raw_acc = _local_slice(acc_f, nloc)
            pot = _local_slice(pot_f, nloc)
        else:
            tree = build_octree(pos, mass, eps, valid, box=box or 0.0,
                                depth=depth)
            raw_acc, pot, _ = eval_targets(
                tree, pos_pred_l, eps_l, p_l.old_acc * err_tol_force_acc,
                p_l.mass > 0, box=box, theta=theta,
                use_relative=(opening == 1), config=cfg, ewald=ewald)
        pot = pot + p_l.mass / jnp.maximum(eps_l, 1e-30)
        if pbc is not None:
            from ..ops.pm import pm_accel
            acc_m, pot_m = pm_accel(pm_kernel, pos, mass,
                                    with_potential=True)
            raw_acc = raw_acc + _local_slice(acc_m, nloc)
            pot = (pot - p_l.mass * (2.0 * pbc[1] / (jnp.pi ** 0.5))
                   + _local_slice(pot_m, nloc)
                   + p_l.mass * (2.8372975 / pbc[0] - pm_kernel.pot_self))
        accel_l, old_acc_l = integrate.apply_accel_postfactors(
            raw_acc, pos_pred_l, vel_pred_l, t_next, consts)
        p_l = dataclasses.replace(
            p_l,
            accel=jnp.where(active_l[:, None], accel_l, p_l.accel),
            old_acc=jnp.where(active_l, old_acc_l, p_l.old_acc),
            pot=jnp.where(active_l, pot, p_l.pot),
        )

        # --- SIDM: SHARDED proposals + replicated finish. Each device
        # walks only its strided slice of the gated target groups (the
        # expensive part, ~1/n_shards of the pair enumeration) against
        # the replicated tree; the per-target proposal fields combine in
        # one psum/pmax round, then the scatter decision + conflict
        # resolution + kicks run replicated from identical RNG — the ICI
        # analog of the reference's 3-phase exported-particle handshake
        # (sidm.c:204-603). Only the fields the DSMC pass actually reads
        # are gathered (vel/mass/ptype/pid/dvel/hsml_vd/ngb_vd/
        # current_time + predicted positions); everything else keeps a
        # zero placeholder, so peak per-device memory stays well below a
        # full-pytree gather. ---
        n_scat = jnp.zeros((), jnp.int32)
        # Overflow-flags bitmask (1=halo cap, 2=event cap, 4=window):
        # static caps are telemetered, never silent (ADVICE r4) — the
        # runner checks this and refits caps / hard-fails.
        flags = jnp.zeros((), jnp.int32)
        if sidm_params is not None and sidm_halo_cap > 0:
            from .halo import sidm_scatter_halo
            p_l, n_scat, _stats = sidm_scatter_halo(
                p_l, pos_pred_l, t_next, active_l, vmax, key, sidm_params,
                box=(box or 0.0), nsh=nsh, hcap=sidm_halo_cap,
                ev_cap=sidm_event_cap, halo_pad=halo_pad)
            flags = (_stats.halo_overflow.astype(jnp.int32)
                     + 2 * _stats.event_overflow.astype(jnp.int32)
                     + 4 * _stats.window_overflow.astype(jnp.int32))
        elif sidm_params is not None:
            ng_tot = pos.shape[0]

            def _zeros3(x):
                return jnp.zeros((ng_tot,) + x.shape[1:], x.dtype)

            p_g = Particles(
                pos=pos, vel=_gather(p_l.vel), mass=mass,
                ptype=_gather(p_l.ptype), pid=_gather(p_l.pid),
                accel=_zeros3(p_l.accel), pot=_zeros3(p_l.pot),
                old_acc=_zeros3(p_l.old_acc),
                dvel=_gather(p_l.dvel), hsml_vd=_gather(p_l.hsml_vd),
                ngb_vd=_gather(p_l.ngb_vd),
                vel_disp=_zeros3(p_l.vel_disp),
                dens_vd=_zeros3(p_l.dens_vd),
                current_time=_gather(p_l.current_time),
                max_pred_time=_zeros3(p_l.max_pred_time),
                egy_spec=_zeros3(p_l.egy_spec),
                density=_zeros3(p_l.density), hsml=_zeros3(p_l.hsml),
                dt_egy=_zeros3(p_l.dt_egy),
                dt_density=_zeros3(p_l.dt_density),
                dt_hsml=_zeros3(p_l.dt_hsml),
                div_vel=_zeros3(p_l.div_vel),
                curl_vel=_zeros3(p_l.curl_vel),
                ngb_sph=_zeros3(p_l.ngb_sph))
            active_g = _gather(active_l)
            pos_pred_g = pos
            if use_fused:
                from ..ops.fused_range import sidm_scatter_fused
                p_g2, n_scat = sidm_scatter_fused(
                    p_g, pos_pred_g, tree, t_next, active_g, vmax, key,
                    sidm_params, box=(pbc[0] if pbc is not None else 0.0),
                    shard=(lax.axis_index(AXIS), nsh), axis_name=AXIS)
            else:
                from ..ops.sidm import sidm_scatter
                p_g2, n_scat = sidm_scatter(p_g, pos_pred_g, t_next,
                                            active_g, vmax, key,
                                            sidm_params, box=box or 0.0)
            # local slice of the updated kick field
            p_l = dataclasses.replace(
                p_l, dvel=_local_slice(p_g2.dvel, nloc),
                hsml_vd=_local_slice(p_g2.hsml_vd, nloc),
                ngb_vd=_local_slice(p_g2.ngb_vd, nloc))

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
        return p_l, t_next, vmax_new, n_active, flags

    return step
