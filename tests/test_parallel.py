"""Multi-chip sharded path on the 8-device CPU mesh (conftest.py).

The TPU analog of the reference's "mpirun -n 2 on one host" testing mode
(nbody/README.md:30-37): the fused group-sharded force must reproduce the
single-device fused engine, and the full sharded SIDM step must run and
conserve momentum.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sidm_tpu.io import ics
from sidm_tpu.parallel.mesh import make_mesh, shard_particles
from sidm_tpu.parallel.step import make_multichip_step, make_sharded_force

N = 2048


def _arrays(n=N, seed=7):
    pos, vel, mass = ics.hernquist(n, seed=seed)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(n, 0.05, jnp.float32)
    oldacc = jnp.zeros(n, jnp.float32)
    return pos, mass, eps, oldacc


def test_sharded_fused_force_matches_single_device():
    from sidm_tpu.ops.fused_force import fused_gravity

    mesh = make_mesh(8)
    pos, mass, eps, oldacc = _arrays()
    force = make_sharded_force(mesh, theta=0.5, opening=0)
    acc_sh, pot_sh = jax.jit(force)(pos, mass, eps, oldacc)
    acc_1, pot_1 = fused_gravity(pos, mass, eps, oldacc, theta=0.5,
                                 opening=0)
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pot_sh), np.asarray(pot_1),
                               rtol=2e-4, atol=2e-4)


def test_sharded_fused_force_accuracy_vs_direct():
    from sidm_tpu.ops.direct import direct_gravity

    mesh = make_mesh(8)
    pos, mass, eps, oldacc = _arrays(seed=11)
    force = make_sharded_force(mesh, theta=0.5, opening=0)
    acc_sh, _ = jax.jit(force)(pos, mass, eps, oldacc)
    acc_d, _ = direct_gravity(pos, mass, eps)
    err = np.linalg.norm(np.asarray(acc_sh) - np.asarray(acc_d), axis=1)
    ref = np.linalg.norm(np.asarray(acc_d), axis=1)
    p99 = np.percentile(err / np.maximum(ref, 1e-12), 99)
    assert p99 <= 1e-3, p99


def _mini_sim(n=512, sidm=True):
    import __graft_entry__ as ge
    sim = ge._make_sim(n=n, sidm=sidm)
    sim.prepare()
    return sim


@pytest.mark.parametrize("sidm", [False, True])
def test_multichip_step_runs_and_conserves(sidm):
    from sidm_tpu.ops.sidm import SidmParams
    from sidm_tpu.rng import run_key

    mesh = make_mesh(8)
    sim = _mini_sim(n=512, sidm=sidm)
    params = sim._timestep_params()
    sidm_params = None
    if sidm:
        sidm_params = sim._sidm_params_for_phased()
    step = make_multichip_step(
        mesh, sim.consts, params, theta=sim.cfg.ErrTolTheta,
        opening=sim.cfg.TypeOfOpeningCriterion,
        err_tol_force_acc=sim.cfg.ErrTolForceAcc,
        sidm_params=sidm_params, synchronized=True,
        time_max=sim.cfg.TimeMax)

    p = shard_particles(sim.particles, mesh)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    mom0 = np.asarray(jnp.sum(p.vel * p.mass[:, None], axis=0))
    p2, t, vmax2, n_active, _ = jax.jit(step)(p, vmax, run_key(3, 4))
    jax.block_until_ready(p2.pos)
    assert np.isfinite(np.asarray(p2.pos)).all()
    assert int(n_active) > 0
    assert float(t) > sim.cfg.TimeBegin
    # DKD kick conserves total momentum (kicks are +-dv pairs for SIDM)
    mom1 = np.asarray(jnp.sum(
        (p2.vel + p2.dvel) * p2.mass[:, None], axis=0))
    acc_mom = np.asarray(jnp.sum(
        p2.accel * p2.mass[:, None], axis=0))
    # gravity momentum change integrates to ~0 (tree forces are not exactly
    # pairwise-symmetric); bound it loosely, SIDM kicks exactly cancel
    assert np.all(np.abs(mom1 - mom0 - acc_mom * float(t)) < 5e-2)


def test_multichip_step_matches_singlechip_force():
    """The sharded step's acceleration field equals the single-chip phased
    force (same tree, same engine, group-sharded + psum)."""
    from sidm_tpu.rng import run_key

    mesh = make_mesh(8)
    sim = _mini_sim(n=512, sidm=False)
    params = sim._timestep_params()
    step = make_multichip_step(
        mesh, sim.consts, params, theta=sim.cfg.ErrTolTheta,
        opening=sim.cfg.TypeOfOpeningCriterion,
        err_tol_force_acc=sim.cfg.ErrTolForceAcc,
        sidm_params=None, synchronized=True, time_max=sim.cfg.TimeMax)
    p = shard_particles(sim.particles, mesh)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    p2, t, _, _, _ = jax.jit(step)(p, vmax, run_key(3, 4))

    phase_force = sim._build_phases()[0]
    p1, t1 = phase_force(sim.particles, vmax)[:2]
    assert float(t) == pytest.approx(float(t1))
    np.testing.assert_allclose(np.asarray(p2.accel), np.asarray(p1.accel),
                               rtol=3e-4, atol=3e-4)


def test_sharded_treepm_matches_single_device():
    """Periodic TreePM sharded force == single-device TreePM assembly."""
    from sidm_tpu.ops import pm
    from sidm_tpu.ops.fused_force import fused_gravity

    box = 50.0
    rng = np.random.default_rng(9)
    n = N
    pos_np = rng.uniform(0, box, (n, 3)).astype(np.float32)
    pos_np[:n // 2] = (25.0 + rng.standard_normal((n // 2, 3)) * 3.0) % box
    pos = jnp.asarray(pos_np)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    eps = jnp.full(n, 0.1, jnp.float32)
    oldacc = jnp.zeros(n, jnp.float32)

    kern = pm.build_pm_kernel(box, n=64, asmth=2.0, rcut_fac=6.0)
    mesh = make_mesh(8)
    force = make_sharded_force(mesh, theta=0.5, opening=0, box=box,
                               pm_kernel=kern)
    acc_sh, pot_sh = jax.jit(force)(pos, mass, eps, oldacc)

    pbc = (box, kern.alpha, kern.rcut)
    acc_s, pot_s = fused_gravity(pos, mass, eps, oldacc, theta=0.5,
                                 opening=0, pbc=pbc)
    acc_m, pot_m = pm.pm_accel(kern, pos, mass, with_potential=True)
    acc_1 = acc_s + acc_m
    pot_1 = pot_s + pot_m + mass * (2.8372975 / box - kern.pot_self)
    scale = float(jnp.percentile(jnp.linalg.norm(acc_1, axis=1), 50))
    np.testing.assert_allclose(np.asarray(acc_sh), np.asarray(acc_1),
                               rtol=2e-4, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(pot_sh), np.asarray(pot_1),
                               rtol=2e-4, atol=2e-4)


def test_sharded_sidm_kicks_match_device_counts():
    """The sharded DSMC pass (each device walks only its strided slice of
    the gated target groups; proposal fields combined with one psum/pmax
    round) must produce EXACTLY the same kicks on an 8-device mesh as on
    a 1-device mesh — the decomposition-invariance analog of the
    reference's 3-phase handshake (sidm.c:204-603)."""
    from sidm_tpu.rng import run_key

    sim = _mini_sim(n=512, sidm=True)
    params = sim._timestep_params()
    sidm_params = sim._sidm_params_for_phased()
    outs = {}
    for nd in (1, 8):
        mesh = make_mesh(nd)
        step = make_multichip_step(
            mesh, sim.consts, params, theta=sim.cfg.ErrTolTheta,
            opening=sim.cfg.TypeOfOpeningCriterion,
            err_tol_force_acc=sim.cfg.ErrTolForceAcc,
            sidm_params=sidm_params, synchronized=True,
            time_max=sim.cfg.TimeMax)
        p = shard_particles(sim.particles, mesh)
        vmax = jnp.asarray(sim.vmax, jnp.float32)
        p2, t, _, _, _ = jax.jit(step)(p, vmax, run_key(5, 6))
        outs[nd] = (np.asarray(p2.dvel), np.asarray(p2.hsml_vd),
                    np.asarray(p2.ngb_vd), float(t))
    assert outs[1][3] == outs[8][3]
    np.testing.assert_array_equal(outs[1][0], outs[8][0])
    np.testing.assert_array_equal(outs[1][2], outs[8][2])
    np.testing.assert_allclose(outs[1][1], outs[8][1], rtol=1e-6)


def test_reshard_run_invariant():
    """In-run domain re-decomposition (parallel/runner.py): a sharded run
    that reshards every 3 steps must produce the same physics as one that
    never reshards — every kernel is permutation-invariant (the force
    path re-sorts internally; the DSMC RNG is keyed by particle id), so
    the distributed Morton re-sort is physics-transparent. Verifies the
    run.c:119-147 / domain.c:31-145 analog end-to-end, including that
    particles actually migrate across shard windows."""
    from sidm_tpu.parallel.runner import (MultichipRunner,
                                          shard_window_histogram)

    sim = _mini_sim(n=512, sidm=True)
    mesh = make_mesh(8)

    r1 = MultichipRunner(sim, mesh, reshard_every=3)
    r2 = MultichipRunner(sim, mesh, reshard_every=10_000)
    p1 = r1.run(8)
    p2 = r2.run(8)
    assert r1.time == r2.time

    # particles moved across shard windows during the run (so the
    # reshards actually exercised migration)
    assert r1.migrated_last_reshard > 0

    # compare by particle id (reshard permutes storage order)
    o1 = np.argsort(np.asarray(p1.pid))
    o2 = np.argsort(np.asarray(p2.pid))
    v1 = np.asarray(p1.ptype)[o1] >= 0
    np.testing.assert_allclose(
        np.asarray(p1.pos)[o1][v1], np.asarray(p2.pos)[o2][v1],
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(p1.vel)[o1][v1], np.asarray(p2.vel)[o2][v1],
        rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sharded_force_work_balance():
    """The GravCost-bisection analog (domain.c:154-441): the fused force's
    density-sorted round-robin block striding must give every device a
    near-equal share of the MEASURED pair work on a strongly clustered
    distribution — not just equal particle counts. Evaluates each shard
    slice's near-segment counter (the engine's own work telemetry) for a
    Hernquist cluster and bounds the imbalance."""
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import (FusedConfig, default_depth,
                                          fused_gravity_tree)
    from sidm_tpu.ops.tree import build_octree

    n = 1 << 14
    nsh = 8
    pos, vel, mass = ics.hernquist(n, seed=3)
    pos = jnp.asarray(pos, jnp.float32)
    mass = jnp.asarray(mass, jnp.float32)
    eps = jnp.full(n, 0.05, jnp.float32)
    oldacc = jnp.zeros(n, jnp.float32)
    tree = build_octree(pos, mass, eps, mass > 0, box=0.0,
                        depth=default_depth(n))

    @jax.jit
    def shard_work(sidx):
        _, _, info = fused_gravity_tree(
            tree, mass, eps, oldacc, theta=0.5, opening=0,
            config=FusedConfig(), return_info=True, need_pot=False,
            shard=(sidx, nsh))
        return info["n_segs"]

    work = np.array([int(shard_work(jnp.int32(i))) for i in range(nsh)])
    assert work.min() > 0
    imb = work.max() / work.mean()
    # the reference's bisection targets equal GravCost per rank; the
    # static striding achieves ~1.31 on this cuspy halo (measured r4) —
    # bound it at 35% of perfect (PARITY.md records the measured number)
    assert imb < 1.35, (work.tolist(), imb)


def test_multichip_run_sim_artifacts(tmp_path):
    """run_sim() produces the reference's artifact set (run.c:17-221 /
    io.c / restart.c on a device mesh): energy, info, cpu, timings logs,
    a snapshot, and a restart dump."""
    import dataclasses as dc
    import os

    import __graft_entry__ as ge
    from sidm_tpu.parallel.runner import MultichipRunner

    sim = ge._make_sim(n=256, sidm=True)
    sim.cfg = dc.replace(
        sim.cfg, OutputDir=str(tmp_path), TimeBetStatistics=0.01,
        TimeBetSnapshot=0.5, TimeOfFirstSnapshot=0.0)
    sim.time_last_statistics = sim.cfg.TimeBegin - 1.0
    sim.prepare()
    r = MultichipRunner(sim, make_mesh(8))
    steps = r.run_sim(max_steps=3)
    assert steps == 3
    files = set(os.listdir(tmp_path))
    for expect in (sim.cfg.EnergyFile, sim.cfg.InfoFile, sim.cfg.CpuFile,
                   sim.cfg.TimingsFile):
        assert expect in files, (expect, files)
    assert any(f.startswith(sim.cfg.SnapshotFileBase) for f in files), files
    assert any(f.startswith(sim.cfg.RestartFile) for f in files), files
    # energy log has >= 1 data line with finite totals
    lines = (tmp_path / sim.cfg.EnergyFile).read_text().strip().splitlines()
    assert len(lines) >= 1
    vals = [float(x) for x in lines[0].split()]
    assert np.isfinite(vals).all()


def test_multichip_individual_mode_matches_device_counts():
    """Individual (per-particle rung) stepping under sharding: the same
    trajectory on a 1-device and an 8-device mesh (timeline.c:38's
    Allreduce MIN becomes lax.pmin; active masks are element-wise so the
    decomposition cannot change the physics)."""
    import __graft_entry__ as ge
    from sidm_tpu.parallel.runner import MultichipRunner

    outs = {}
    for nd in (1, 8):
        sim = ge._make_sim(n=256, sidm=True)
        sim.mode = "individual"
        sim.prepare()
        r = MultichipRunner(sim, make_mesh(nd), reshard_every=10_000)
        r.run(6)
        p = r.particles
        o = np.argsort(np.asarray(p.pid))
        outs[nd] = (np.asarray(p.pos)[o], np.asarray(p.vel)[o],
                    np.asarray(p.max_pred_time)[o], r.time)
    assert outs[1][3] == pytest.approx(outs[8][3], rel=1e-6)
    np.testing.assert_allclose(outs[1][0], outs[8][0], rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(outs[1][1], outs[8][1], rtol=2e-3,
                               atol=2e-4)
    # individual mode really individualizes: rungs differ across particles
    assert len(np.unique(outs[8][2].round(9))) > 1


def test_ring_force_matches_direct_and_memory_scales():
    """make_ring_force (local per-shard trees + circulating target
    bunches over a ppermute ring — gravtree.c:171-222's design): must hit
    the p99<=1e-3 accuracy bar vs direct summation, and its compiled
    per-device temp memory must stay well below the replicated
    (all-gather + full-tree) sharded force at the same N."""
    from sidm_tpu.ops.direct import direct_gravity
    from sidm_tpu.parallel.step import make_ring_force

    mesh = make_mesh(8)
    pos, mass, eps, oldacc = _arrays(seed=13)
    force = make_ring_force(mesh, theta=0.5, opening=0)
    acc_r, pot_r = jax.jit(force)(pos, mass, eps, oldacc)
    acc_d, _ = direct_gravity(pos, mass, eps)
    err = np.linalg.norm(np.asarray(acc_r) - np.asarray(acc_d), axis=1)
    ref = np.linalg.norm(np.asarray(acc_d), axis=1)
    p99 = np.percentile(err / np.maximum(ref, 1e-12), 99)
    assert p99 <= 1e-3, p99

    # memory: compare XLA temp footprints at N=2^17
    n = 1 << 17
    shapes = (jax.ShapeDtypeStruct((n, 3), jnp.float32),
              jax.ShapeDtypeStruct((n,), jnp.float32),
              jax.ShapeDtypeStruct((n,), jnp.float32),
              jax.ShapeDtypeStruct((n,), jnp.float32))
    repl = make_sharded_force(mesh, theta=0.5, opening=0)
    mems = {}
    for tag, fn in (("ring", make_ring_force(mesh, theta=0.5, opening=0)),
                    ("repl", repl)):
        lowered = jax.jit(fn).lower(*shapes)
        if tag == "ring":
            # the structural invariant: the ring program has NO
            # all-gather — no device ever materializes all N positions
            # or a full-N tree (only collective-permute of N/nsh
            # bunches rides the mesh)
            txt = lowered.as_text()
            assert "all-gather" not in txt and "all_gather" not in txt
        comp = lowered.compile()
        ma = comp.memory_analysis()
        if ma is None:
            pytest.skip("no memory analysis on this backend")
        mems[tag] = int(ma.temp_size_in_bytes)
    # both engines' walk scratch scales with the N/nsh target count, so
    # at this size the gap is the replicated path's O(N) tree+gather
    # (measured ring/repl = 0.57 at N=2^17; the margin widens with N)
    assert mems["ring"] < 0.66 * mems["repl"], mems
