"""Halo-exchange SIDM (parallel/halo.py) on the 8-device CPU mesh.

The reference exports only particles within +-Hsml of a domain boundary for
the neighbour phases (density.c:96-108, determine_interior() density.c:565-
667, sidm.c:141-161) and returns partner recoils in a confirmation round
(sidm.c:543-603). These tests verify the ICI analog:

* completeness — with an adequate halo cap the per-target candidate set is
  identical to the replicated (full-gather) engine's, so the k-th-neighbour
  counts/radii and the set of gate decisions match exactly;
* physics — kicks are momentum-exact +-dv pairs globally, including recoils
  delivered across shards through the event exchange;
* memory — the compiled per-device temp footprint is measurably below the
  replicated DSMC pass (the point of the export split).
"""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sidm_tpu.parallel.mesh import AXIS, make_mesh, shard_particles
from sidm_tpu.parallel.step import make_multichip_step
from sidm_tpu.state import Particles


def _mini_sim(n=512, sidm=True):
    import __graft_entry__ as ge
    sim = ge._make_sim(n=n, sidm=sidm)
    sim.prepare()
    return sim


def test_halo_full_step_runs():
    """The full sharded timestep with sidm_halo_cap: runs, finite,
    conserves kick momentum (smoke for the step-level wiring; the
    physics oracles are the phase-level tests below)."""
    from sidm_tpu.rng import run_key

    sim = _mini_sim(n=512, sidm=True)
    mesh = make_mesh(8)
    params = sim._timestep_params()
    step = make_multichip_step(
        mesh, sim.consts, params, theta=sim.cfg.ErrTolTheta,
        opening=sim.cfg.TypeOfOpeningCriterion,
        err_tol_force_acc=sim.cfg.ErrTolForceAcc,
        sidm_params=sim._sidm_params_for_phased(),
        synchronized=True, time_max=sim.cfg.TimeMax,
        sidm_halo_cap=FULL_HCAP, sidm_event_cap=256)
    p = shard_particles(sim.particles, mesh)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    p2, t, _, n_active, flags = jax.jit(step)(p, vmax, run_key(5, 6))
    assert int(flags) & 1 == 0  # full-capacity halo: no halo-cap overflow
    assert np.isfinite(np.asarray(p2.pos)).all()
    assert int(n_active) > 0
    mom = np.asarray(jnp.sum(p2.dvel * p2.mass[:, None], axis=0))
    assert np.all(np.abs(mom) <= 1e-5)


# At n=512 on 8 shards (64 particles each, DesNumNgb=16) every
# neighbourhood spans a large fraction of the cluster, so correctness runs
# use full halo capacity (n - nloc); capacity SIZING is a config question
# (telemetered by HaloStats), capped memory is proven by
# test_halo_memory_below_replicated at realistic scale.
FULL_HCAP = 512 - 512 // 8


def _halo_phase(sim, mesh, hcap, ev_cap=256, params=None):
    """shard_map-wrapped bare halo DSMC phase at the particles' common
    max_pred_time (no force/advance), for oracle comparisons."""
    from sidm_tpu import integrate
    from sidm_tpu.parallel.halo import sidm_scatter_halo

    params = params or sim._sidm_params_for_phased()
    nsh = mesh.devices.size
    specs_p = Particles(*([P(AXIS)] * len(dataclasses.fields(Particles))))

    @partial(shard_map, mesh=mesh, in_specs=(specs_p, P(), P()),
             out_specs=(specs_p, P()), check_vma=False)
    def run(p_l, vmax, key):
        t = lax.pmax(jnp.max(p_l.max_pred_time), AXIS)
        active = jnp.ones(p_l.pos.shape[0], bool)
        pos_pred, _ = integrate.predict_positions(p_l, t, sim.consts)
        p2, n_scat, stats = sidm_scatter_halo(
            p_l, pos_pred, t, active, vmax, key, params,
            nsh=nsh, hcap=hcap, ev_cap=ev_cap)
        return p2, n_scat

    return jax.jit(run)


def test_halo_sidm_matches_replicated_engine():
    """With the halo wide enough, the halo engine must match the
    REPLICATED full-gather hash engine EXACTLY: identical hsml_vd and
    ngb_vd per target (the sharp completeness invariant — both engines
    run the same hashed-cell kNN over the same candidate sets, so any
    halo truncation would break equality), momentum-exact kicks
    (cross-shard recoils included), and determinism.

    Two known, physics-free divergence sources are removed so the
    invariant is sharp (r4 advisor review + r5 experiment, 0/512
    mismatches): (a) the per-cell candidate cap is raised to n so wide
    outskirt queries never truncate in table order (which differs
    between the per-device and global tables); (b) both engines start
    from CONVERGED smoothing lengths (one replicated warm-up pass) —
    knn_radius is a fixed-point iteration and the two engines run
    different iteration counts from a cold start."""
    from sidm_tpu import integrate
    from sidm_tpu.ops.sidm import sidm_scatter
    from sidm_tpu.rng import run_key

    sim = _mini_sim(n=512, sidm=True)
    mesh = make_mesh(8)
    key = run_key(5, 6)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    params = sim._sidm_params_for_phased()._replace(cap=512)
    run = _halo_phase(sim, mesh, hcap=FULL_HCAP, params=params)

    p0 = sim.particles
    t = float(jnp.max(p0.max_pred_time))
    pos_pred, _ = integrate.predict_positions(p0, t, sim.consts)
    active = jnp.ones(p0.pos.shape[0], bool)
    # converge hsml with one replicated pass; feed BOTH engines from it
    pr1, _ = sidm_scatter(p0, pos_pred, jnp.float32(t), active, vmax, key,
                          params)
    p0c = dataclasses.replace(p0, hsml_vd=pr1.hsml_vd, ngb_vd=pr1.ngb_vd)
    pr, _ = sidm_scatter(p0c, pos_pred, jnp.float32(t), active, vmax, key,
                         params)

    p = shard_particles(p0c, mesh)
    ph, n_h = run(p, vmax, key)
    ph2, _ = run(p, vmax, key)

    np.testing.assert_allclose(np.asarray(ph.hsml_vd),
                               np.asarray(pr.hsml_vd), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ph.ngb_vd),
                                  np.asarray(pr.ngb_vd))
    # determinism
    np.testing.assert_array_equal(np.asarray(ph.dvel), np.asarray(ph2.dvel))
    # momentum-exact +-dv kicks, including cross-shard recoils
    mom = np.asarray(jnp.sum(ph.dvel * ph.mass[:, None], axis=0))
    vscale = float(jnp.max(jnp.abs(ph.dvel))) + 1e-12
    assert np.all(np.abs(mom) <= 1e-5 * max(vscale, 1.0))
    # a kicked target always has a kicked partner (pairs)
    kicked = np.any(np.asarray(ph.dvel) != 0.0, axis=1)
    assert kicked.sum() % 2 == 0


def test_halo_scatter_rate_matches_hash_engine():
    """The gate and the per-target total scattering probability are
    enumeration-order invariant, so the halo engine's event count must
    track the full-set hash engine's closely (partner PICKS may differ;
    rates may not). Cross-section boosted x300 so one pass yields many
    events — which also stress-tests the cross-shard recoil exchange."""
    from sidm_tpu import integrate
    from sidm_tpu.ops.sidm import sidm_scatter
    from sidm_tpu.rng import run_key

    sim = _mini_sim(n=512, sidm=True)
    params = sim._sidm_params_for_phased()
    params = params._replace(
        cross_section_internal=params.cross_section_internal * 300.0)
    mesh = make_mesh(8)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    run = _halo_phase(sim, mesh, hcap=FULL_HCAP, params=params)
    p = shard_particles(sim.particles, mesh)

    p0 = sim.particles
    t = float(jnp.max(p0.max_pred_time))
    pos_pred, _ = integrate.predict_positions(p0, t, sim.consts)
    active = jnp.ones(p0.pos.shape[0], bool)

    nh = nr = 0
    for seed in range(4):
        key = run_key(21, seed)
        _, n_h = run(p, vmax, key)
        _, n_r = sidm_scatter(p0, pos_pred, t, active, vmax, key, params)
        nh += int(n_h)
        nr += int(n_r)
    assert nh > 10 and nr > 10, (nh, nr)
    # Poisson-level agreement between engines over the same RNG stream
    assert abs(nh - nr) <= 4 * np.sqrt(max(nr, 1)) + 4, (nh, nr)


def test_halo_overflow_reported_not_silent():
    """An undersized halo cap must raise the overflow flag (static caps,
    telemetered failure — never silent truncation)."""
    from sidm_tpu.parallel.halo import sidm_scatter_halo
    from sidm_tpu.rng import run_key

    sim = _mini_sim(n=512, sidm=True)
    mesh = make_mesh(8)
    params = sim._sidm_params_for_phased()
    nsh = 8

    specs_p = Particles(*([P(AXIS)] * len(dataclasses.fields(Particles))))

    @partial(shard_map, mesh=mesh, in_specs=(specs_p, P(), P()),
             out_specs=(P(AXIS), P()), check_vma=False)
    def run(p_l, vmax, key):
        from sidm_tpu import integrate
        t = jnp.max(p_l.max_pred_time)
        t = lax.pmax(t, AXIS)
        active = jnp.ones(p_l.pos.shape[0], bool)
        pos_pred, _ = integrate.predict_positions(p_l, t, sim.consts)
        p2, n_scat, stats = sidm_scatter_halo(
            p_l, pos_pred, t, active, vmax, key, params,
            nsh=nsh, hcap=4, ev_cap=256)
        return p2.dvel, stats.halo_overflow.astype(jnp.int32)

    p = shard_particles(sim.particles, mesh)
    _, ovf = jax.jit(run)(p, jnp.asarray(sim.vmax, jnp.float32),
                          run_key(5, 6))
    assert int(ovf) == 1


def test_halo_memory_below_replicated():
    """The point of the export split: compiled per-device temp memory of
    the halo DSMC pass scales with N/nsh + halo_cap, not N. Compares XLA's
    memory analysis of the two compiled passes at N=2^17 on the 8-device
    mesh (the replicated pass gathers the pytree AND builds its hashed
    cell table over all N rows x n_levels)."""
    from sidm_tpu.ops.sidm import SidmParams, sidm_scatter
    from sidm_tpu.parallel.halo import sidm_scatter_halo

    n = 1 << 17
    nsh = 8
    mesh = make_mesh(nsh)
    params = SidmParams(
        cross_section_internal=1.0, cross_section_type=0,
        yukawa_velocity=0.0, cross_section_vel_scale=1.0,
        cross_section_pow_law=0.0, des_num_ngb=16, max_num_ngb_dev=2,
        comoving=False, hubble=1.0, omega0=0.0, omega_lambda=0.0,
        cap=48, block=512, n_levels=10)
    specs_p = Particles(*([P(AXIS)] * len(dataclasses.fields(Particles))))

    @partial(shard_map, mesh=mesh, in_specs=(specs_p, P(), P()),
             out_specs=P(AXIS), check_vma=False)
    def halo_fn(p_l, vmax, key):
        active = jnp.ones(p_l.pos.shape[0], bool)
        p2, _, _ = sidm_scatter_halo(
            p_l, p_l.pos, jnp.float32(1.0), active, vmax, key, params,
            nsh=nsh, hcap=4096, ev_cap=1024)
        return p2.dvel

    @partial(shard_map, mesh=mesh, in_specs=(specs_p, P(), P()),
             out_specs=P(AXIS), check_vma=False)
    def repl_fn(p_l, vmax, key):
        # the production replicated path (parallel/step.py): gather ONLY
        # the DSMC-read fields (zeros elsewhere), run the full-N pass,
        # slice local kicks
        nloc = p_l.pos.shape[0]

        def g(x):
            return lax.all_gather(x, AXIS, tiled=True)

        read = ("pos", "vel", "mass", "ptype", "pid", "dvel", "hsml_vd",
                "ngb_vd", "current_time")
        ng = nloc * nsh
        p_g = Particles(**{
            f.name: (g(getattr(p_l, f.name)) if f.name in read else
                     jnp.zeros((ng,) + getattr(p_l, f.name).shape[1:],
                               getattr(p_l, f.name).dtype))
            for f in dataclasses.fields(Particles)})
        active = jnp.ones(p_g.pos.shape[0], bool)
        p2, _ = sidm_scatter(p_g, p_g.pos, jnp.float32(1.0), active, vmax,
                             key, params)
        i0 = lax.axis_index(AXIS) * nloc
        return lax.dynamic_slice_in_dim(p2.dvel, i0, nloc, axis=0)

    def shapes():
        f32 = jnp.float32
        arrs = {}
        for f in dataclasses.fields(Particles):
            if f.name in ("pos", "vel", "accel", "dvel"):
                arrs[f.name] = jax.ShapeDtypeStruct((n, 3), f32)
            elif f.name in ("ptype", "ngb_vd", "ngb_sph"):
                arrs[f.name] = jax.ShapeDtypeStruct((n,), jnp.int32)
            elif f.name == "pid":
                arrs[f.name] = jax.ShapeDtypeStruct((n,), jnp.uint32)
            else:
                arrs[f.name] = jax.ShapeDtypeStruct((n,), f32)
        p = Particles(**arrs)
        return (p, jax.ShapeDtypeStruct((), f32),
                jax.ShapeDtypeStruct((2,), jnp.uint32))

    mems = {}
    for tag, fn in (("halo", halo_fn), ("repl", repl_fn)):
        comp = jax.jit(fn).lower(*shapes()).compile()
        ma = comp.memory_analysis()
        if ma is None:
            pytest.skip("backend provides no memory analysis")
        mems[tag] = int(ma.temp_size_in_bytes)
    # The halo pass's candidate table covers N/nsh + hcap = 20480 rows vs
    # the replicated engine's 131072, but shared fixed costs (knn block
    # maps, conflict resolution over global proposals, event gathers)
    # dominate the CPU-backend temp analysis at this size: measured ratio
    # is ~0.68 (75.6 vs 111.3 MB, r4).  Assert the measured separation —
    # the table-memory scaling itself is proven by the hcap dependence.
    assert mems["halo"] < 0.75 * mems["repl"], mems
