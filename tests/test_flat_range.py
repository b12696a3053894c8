"""Flat-queue SIDM DSMC engine vs the blocked fused-range engine.

Same tree, same RNG key and salt => identical Gumbel keys per candidate
pair, so partner selection and kicks must agree; probability sums agree
to float tolerance. Also checks the hsml-init port and momentum/energy
exactness per scattering (sidm.c:446-452 semantics)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

import __graft_entry__ as ge
from sidm_tpu.ops.flat_force import FlatConfig
from sidm_tpu.ops.flat_range import sidm_scatter_flat, tree_hsml_init_flat
from sidm_tpu.ops.fused_force import default_depth
from sidm_tpu.ops.fused_range import sidm_scatter_fused, tree_hsml_init_fused
from sidm_tpu.ops.tree import build_octree
from sidm_tpu.rng import run_key, step_key

CFG = FlatConfig(chunk=8192, near_chunk=4096, pair_cap=1 << 20)


def _sim(n=2048):
    sim = ge._make_sim(n=n, sidm=True)
    sim.prepare()
    return sim


def _tree(sim):
    p = sim.particles
    eps = jnp.full(p.n_padded, 0.02, jnp.float32)
    mass = jnp.where(p.valid, p.mass, 0.0)
    return build_octree(p.pos, mass, eps, p.valid, box=0.0,
                        depth=default_depth(p.n_padded))


def test_flat_sidm_matches_fused():
    sim = _sim()
    p = sim.particles
    tree = _tree(sim)
    t = jnp.asarray(sim.time + 0.01, jnp.float32)
    active = p.valid
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    key = step_key(run_key(1, 2), 3)
    params = sim._sidm_params_for_phased()

    p_a, n_a = sidm_scatter_flat(p, p.pos, tree, t, active, vmax, key,
                                 params, cfg=CFG, salt=7)
    p_b, n_b = sidm_scatter_fused(p, p.pos, tree, t, active, vmax, key,
                                  params, salt=7)
    assert int(n_a) == int(n_b)
    np.testing.assert_allclose(np.asarray(p_a.dvel), np.asarray(p_b.dvel),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(p_a.ngb_vd),
                                  np.asarray(p_b.ngb_vd))


def test_flat_sidm_momentum_exact():
    sim = _sim(n=1024)
    p = sim.particles
    tree = _tree(sim)
    t = jnp.asarray(sim.time + 0.05, jnp.float32)
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    key = step_key(run_key(9, 9), 1)
    params = sim._sidm_params_for_phased()
    p2, n_scat = sidm_scatter_flat(p, p.pos, tree, t, p.valid, vmax, key,
                                   params, cfg=CFG, salt=1)
    dmom = np.asarray(jnp.sum(p2.dvel * p2.mass[:, None], axis=0))
    assert np.all(np.abs(dmom) < 1e-4)


def test_flat_hsml_init_matches_fused():
    sim = _sim(n=1024)
    p = sim.particles
    tree = _tree(sim)
    p_a = tree_hsml_init_flat(p, tree, 16, cfg=CFG, iters=4)
    p_b = tree_hsml_init_fused(p, tree, 16, iters=4)
    np.testing.assert_allclose(np.asarray(p_a.hsml_vd),
                               np.asarray(p_b.hsml_vd), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p_a.ngb_vd),
                                  np.asarray(p_b.ngb_vd))
