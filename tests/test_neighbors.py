"""Neighbour engine vs brute force."""

import numpy as np
import pytest
import jax.numpy as jnp

from sidm_tpu.io import ics
from sidm_tpu.ops import neighbors as nb
from sidm_tpu.state import make_particles


def _brute_knn_radius(pos, ptype, i, k):
    same = np.flatnonzero(ptype == ptype[i])
    d = np.linalg.norm(pos[same] - pos[i], axis=1)
    return np.sort(d)[k - 1]  # self included (d=0 is first)


def _brute_count(pos, ptype, i, h, box=None):
    same = ptype == ptype[i]
    d = pos[same] - pos[i]
    if box:
        d -= box * np.round(d / box)
    r = np.linalg.norm(d, axis=1)
    return int((r < h).sum())


def test_knn_radius_matches_brute_force_uniform():
    rng = np.random.default_rng(0)
    n, k = 500, 20
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    ptype = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    s0 = nb.default_cell_size(pos, valid, k)
    table = nb.build_table(jnp.asarray(pos), jnp.asarray(ptype),
                           jnp.asarray(valid), s0=s0)
    h0 = jnp.full((n,), 2 * s0, jnp.float32)
    h, cnt, ovf = nb.knn_radius(table, jnp.asarray(pos),
                                jnp.asarray(ptype), h0, k, cap=96, n_iter=4)
    h = np.asarray(h)
    cnt = np.asarray(cnt)
    assert not np.asarray(ovf).any()
    for i in range(0, n, 17):
        r_ref = _brute_knn_radius(pos, ptype, i, k)
        assert h[i] == pytest.approx(r_ref, rel=2e-3), i
        assert cnt[i] == k, i


def test_knn_radius_centrally_concentrated():
    """Plummer sphere: h spans orders of magnitude between core and halo."""
    pos, _, _ = ics.plummer(800, seed=4)
    pos = pos.astype(np.float32)
    n, k = len(pos), 16
    ptype = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    s0 = nb.default_cell_size(pos, valid, k)
    table = nb.build_table(jnp.asarray(pos), jnp.asarray(ptype),
                           jnp.asarray(valid), s0=s0)
    h0 = jnp.full((n,), 2 * s0, jnp.float32)
    h, cnt, ovf = nb.knn_radius(table, jnp.asarray(pos),
                                jnp.asarray(ptype), h0, k, cap=128, n_iter=5)
    h, cnt = np.asarray(h), np.asarray(cnt)
    for i in range(0, n, 37):
        r_ref = _brute_knn_radius(pos, ptype, i, k)
        assert h[i] == pytest.approx(r_ref, rel=2e-3), i
    assert (cnt[::37] == k).all()


def test_type_filtering():
    """Neighbours must be of the query's own type (forcetree.c:2181)."""
    rng = np.random.default_rng(1)
    n = 400
    pos = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    ptype = np.where(np.arange(n) % 2 == 0, 1, 2).astype(np.int32)
    valid = np.ones(n, bool)
    s0 = nb.default_cell_size(pos, valid, 10)
    table = nb.build_table(jnp.asarray(pos), jnp.asarray(ptype),
                           jnp.asarray(valid), s0=s0)
    h = jnp.full((n,), 0.3, jnp.float32)
    idx, rows, mask, ovf = nb.gather_candidates(table, jnp.asarray(pos),
                                                jnp.asarray(ptype), h,
                                                cap=256)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for i in range(0, n, 29):
        cands = idx[i][mask[i]]
        assert (ptype[cands] == ptype[i]).all()


def test_periodic_wraparound():
    rng = np.random.default_rng(2)
    n, box = 300, 1.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    # cluster split across the boundary
    pos[:20] = np.array([0.01, 0.5, 0.5]) + rng.normal(0, 0.004, (20, 3))
    pos[20:40] = np.array([0.99, 0.5, 0.5]) + rng.normal(0, 0.004, (20, 3))
    pos = np.mod(pos, box).astype(np.float32)
    ptype = np.ones(n, np.int32)
    valid = np.ones(n, bool)
    s0 = 0.02
    table = nb.build_table(jnp.asarray(pos), jnp.asarray(ptype),
                           jnp.asarray(valid), s0=s0, box=box)
    h = jnp.full((n,), 0.05, jnp.float32)
    idx, rows, mask, ovf = nb.gather_candidates(table, jnp.asarray(pos),
                                                jnp.asarray(ptype), h,
                                                cap=64)
    # particle 0 (x=0.01) must see particles across the boundary (x=0.99)
    cands = np.asarray(idx)[0][np.asarray(mask)[0]]
    d = pos[cands] - pos[0]
    d -= box * np.round(d / box)
    within = cands[np.linalg.norm(d, axis=1) < 0.05]
    assert np.intersect1d(within, np.arange(20, 40)).size > 0
    assert _brute_count(pos, ptype, 0, 0.05, box) == len(np.unique(within))


def test_padding_particles_excluded():
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 1, (64, 3))
    p = make_particles(pos, np.zeros((64, 3)), np.full(64, 1.0),
                       np.ones(64, np.int32), pad_to_multiple=128)
    p2 = nb.setup_smoothing_lengths(p, 8, 2)
    h = np.asarray(p2.hsml_vd)
    cnt = np.asarray(p2.ngb_vd)
    assert (cnt[:64] == 8).all()
    assert (h[64:] == 0).all()  # padding untouched


def test_setup_smoothing_lengths_count_in_band():
    pos, vel, mass = ics.hernquist(600, seed=9)
    p = make_particles(pos, vel, mass, np.ones(600, np.int32),
                       pad_to_multiple=256)
    p = nb.setup_smoothing_lengths(p, 30, 2)
    cnt = np.asarray(p.ngb_vd)[:600]
    # the kNN construction should put every count exactly at DesNumNgb
    assert (np.abs(cnt - 30) <= 2).all()
