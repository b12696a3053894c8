"""Gadget format-1 I/O: roundtrips and binary layout."""

import struct

import numpy as np
import pytest

from sidm_tpu.io.gadget import (GadgetHeader, Snapshot, read_snapshot,
                                write_snapshot)
from sidm_tpu.io import ics


def _make_snap(n=100, ngas=0, seed=0, equal_mass=True):
    rng = np.random.default_rng(seed)
    ptype = np.concatenate([np.zeros(ngas, np.int32),
                            np.ones(n - ngas, np.int32)])
    mass = (np.full(n, 0.25, np.float32) if equal_mass
            else rng.uniform(0.1, 1.0, n).astype(np.float32))
    return Snapshot(
        header=GadgetHeader(time=1.5, box_size=100.0, omega0=0.3,
                            omega_lambda=0.7, hubble_param=0.7),
        pos=rng.uniform(0, 100, (n, 3)).astype(np.float32),
        vel=rng.normal(size=(n, 3)).astype(np.float32),
        pid=np.arange(1, n + 1, dtype=np.uint32),
        mass=mass, ptype=ptype,
        u=rng.uniform(1, 2, ngas).astype(np.float32) if ngas else None,
    )


def test_roundtrip_equal_mass(tmp_path):
    snap = _make_snap(128)
    fn = str(tmp_path / "snp_000")
    write_snapshot(fn, snap)
    back = read_snapshot(fn)
    assert back.n == 128
    # equal masses go to the header table, not a mass block
    assert back.header.mass[1] == pytest.approx(0.25)
    np.testing.assert_allclose(back.pos, snap.pos, rtol=1e-6)
    np.testing.assert_allclose(back.vel, snap.vel, rtol=1e-6)
    np.testing.assert_array_equal(back.pid, snap.pid)
    np.testing.assert_allclose(back.mass, snap.mass, rtol=1e-6)
    assert back.header.time == pytest.approx(1.5)
    assert back.header.box_size == pytest.approx(100.0)


def test_roundtrip_individual_masses(tmp_path):
    snap = _make_snap(64, equal_mass=False)
    fn = str(tmp_path / "snp_001")
    write_snapshot(fn, snap)
    back = read_snapshot(fn)
    np.testing.assert_allclose(back.mass, snap.mass, rtol=1e-6)


def test_roundtrip_with_gas(tmp_path):
    snap = _make_snap(96, ngas=32)
    fn = str(tmp_path / "snp_002")
    write_snapshot(fn, snap)
    back = read_snapshot(fn)
    assert int((back.ptype == 0).sum()) == 32
    np.testing.assert_allclose(back.u, snap.u, rtol=1e-6)


def test_multifile_roundtrip(tmp_path):
    snap = _make_snap(200)
    fn = str(tmp_path / "snp_003")
    files = write_snapshot(fn, snap, num_files=2)
    assert len(files) == 2
    back = read_snapshot(fn)
    assert back.n == 200
    np.testing.assert_allclose(np.sort(back.pid), np.sort(snap.pid))


def test_binary_layout_f77_markers(tmp_path):
    """First 4 bytes must be the 256-byte header record marker — this is what
    makes files readable by the reference's read_ic (read_ic.c:118)."""
    snap = _make_snap(16)
    fn = str(tmp_path / "snp_004")
    write_snapshot(fn, snap)
    raw = open(fn, "rb").read()
    assert struct.unpack("<i", raw[:4])[0] == 256
    assert struct.unpack("<i", raw[4 + 256:4 + 260])[0] == 256
    # next block: positions, 16*3*4 bytes
    assert struct.unpack("<i", raw[264:268])[0] == 16 * 12


def test_header_256_bytes():
    assert len(GadgetHeader().tobytes()) == 256


def test_ic_generators_basic():
    for name, (pos, vel, m) in {
        "plummer": ics.plummer(500, seed=3),
        "hernquist": ics.hernquist(500, seed=3),
        "nfw": ics.nfw(500, rho0=1.49e-4, rs=11.14356, G=43007.1, seed=3),
    }.items():
        assert pos.shape == (500, 3) and vel.shape == (500, 3)
        assert np.isfinite(pos).all() and np.isfinite(vel).all(), name
        assert m.sum() > 0
        # roughly centered
        com = (m[:, None] * pos).sum(0) / m.sum()
        assert np.linalg.norm(com) < 0.5 * np.abs(pos).max()


def test_native_io_parity(tmp_path):
    """C++ reader/writer (native/gadget_native.cc) matches the Python path."""
    from sidm_tpu.io import native
    if not native.available() and not native.build():
        pytest.skip("native library not built")
    snap = _make_snap(150, ngas=30)
    fn = str(tmp_path / "snp_nat")
    write_snapshot(fn, snap)
    via_native = read_snapshot(fn, use_native=True)
    via_python = read_snapshot(fn, use_native=False)
    np.testing.assert_allclose(via_native.pos, via_python.pos)
    np.testing.assert_allclose(via_native.mass, via_python.mass)
    np.testing.assert_array_equal(via_native.pid, via_python.pid)
    np.testing.assert_array_equal(via_native.ptype, via_python.ptype)
    np.testing.assert_allclose(via_native.u, via_python.u)


def test_native_morton_parity():
    from sidm_tpu.io import native
    if not native.available():
        pytest.skip("native library not built")
    import jax.numpy as jnp
    from sidm_tpu.ops.morton import bounding_cube, morton_keys
    rng = np.random.default_rng(8)
    pos = rng.normal(size=(500, 3)).astype(np.float32)
    o, e = bounding_cube(jnp.asarray(pos), jnp.ones(500, bool))
    kj = np.asarray(morton_keys(jnp.asarray(pos), o, e))
    kn = native.morton_keys_native(pos, np.asarray(o), float(e))
    np.testing.assert_array_equal(kj, kn)


def test_zic_cluster_reader(tmp_path):
    """ZIC round-trip: header variants, HR/LR typing, unit factors, and the
    LR zone split (read_ic_cluster.c semantics)."""
    import math
    from sidm_tpu.io.zic import read_ic_cluster, write_zic, default_massfac

    rng = np.random.default_rng(3)
    nhr, nlr = 40, 24
    pos_hr = rng.uniform(-0.05, 0.05, (nhr, 3))
    vel_hr = rng.normal(0, 0.01, (nhr, 3))
    pos_lr = rng.uniform(-0.3, 0.3, (nlr, 3))
    vel_lr = rng.normal(0, 0.01, (nlr, 3))
    mass_lr = rng.uniform(1.0, 5.0, nlr)
    a0, pmhr, G = 0.25, 2.5, 43007.1

    fn = str(tmp_path / "zic.dat")
    write_zic(fn, pos_hr, vel_hr, pos_lr, vel_lr, mass_lr, a0, pmhr=pmhr)
    z = read_ic_cluster(fn, G)

    assert z.time == pytest.approx(a0)
    assert z.pmhr == pytest.approx(pmhr)
    mf = default_massfac(G)
    np.testing.assert_allclose(z.pos[:nhr], pos_hr.astype(np.float32) * 141300.0,
                               rtol=1e-6)
    np.testing.assert_allclose(
        z.vel[nhr:], vel_lr.astype(np.float32) * 14130.0 * math.sqrt(a0),
        rtol=1e-6)
    np.testing.assert_allclose(z.mass[:nhr], pmhr * mf, rtol=1e-6)
    np.testing.assert_allclose(z.mass[nhr:], mass_lr.astype(np.float32) * mf,
                               rtol=1e-6)
    assert (z.ptype[:nhr] == 1).all()
    r = np.linalg.norm(z.pos[nhr:], axis=1)
    np.testing.assert_array_equal(z.ptype[nhr:],
                                  np.where(r > 24000.0, 3, 2))
    assert (z.pid == np.arange(1, nhr + nlr + 1)).all()

    # old header layout: no pmhr record, caller-supplied HR mass
    fn2 = str(tmp_path / "zic_old.dat")
    write_zic(fn2, pos_hr, vel_hr, pos_lr, vel_lr, mass_lr, a0)
    z2 = read_ic_cluster(fn2, G, pmhr=7.0)
    np.testing.assert_allclose(z2.mass[:nhr], 7.0 * mf, rtol=1e-6)
