"""Spline kernels: closed forms vs the reference's tabulated definitions."""

import numpy as np
import pytest

from sidm_tpu.kernels import (grav_force_kernel, grav_pot_kernel, sph_kernel,
                              sph_kernel_deriv, softened_inv_r3,
                              softened_potential)


def _ref_force_kernel(u):
    """Direct transcription of forcetree.c force_setkernel (:1763-1793)."""
    if u <= 0.5:
        return 32 * (1.0 / 3 - 6.0 / 5 * u**2 + u**3)
    return 64 * (1.0 / 3 - 3.0 / 4 * u + 3.0 / 5 * u**2 - u**3 / 6) - 1.0 / 15 / u**3


def _ref_pot_kernel(u):
    if u <= 0.5:
        return 16.0 / 3 * u**2 - 48.0 / 5 * u**4 + 32.0 / 5 * u**5 - 14.0 / 5
    return (1.0 / 15 / u + 32.0 / 3 * u**2 - 16.0 * u**3 + 48.0 / 5 * u**4
            - 32.0 / 15 * u**5 - 16.0 / 5)


def _ref_sph_kernel(u):
    if u <= 0.5:
        return 8 / np.pi * (1 - 6 * u * u * (1 - u))
    return 8 / np.pi * 2 * (1 - u) ** 3


def test_grav_force_kernel_matches_reference():
    u = np.linspace(1e-3, 0.9999, 757)
    ours = np.asarray(grav_force_kernel(u))
    ref = np.array([_ref_force_kernel(x) for x in u])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grav_pot_kernel_matches_reference():
    u = np.linspace(1e-3, 0.9999, 757)
    ours = np.asarray(grav_pot_kernel(u))
    ref = np.array([_ref_pot_kernel(x) for x in u])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_newtonian_limit_at_boundary():
    # wf(1)=1 and wp(1)=-1: force and potential continuous at r=h
    assert float(grav_force_kernel(1.0)) == pytest.approx(1.0, rel=1e-5)
    assert float(grav_pot_kernel(1.0)) == pytest.approx(-1.0, rel=1e-5)


def test_softened_inv_r3_continuity():
    h = 2.8
    r = np.array([h * 0.999999, h * 1.000001])
    f = np.asarray(softened_inv_r3(r, h))
    assert f[0] == pytest.approx(f[1], rel=1e-4)
    # far field is Newtonian
    assert float(softened_inv_r3(10.0, h)) == pytest.approx(1e-3, rel=1e-5)


def test_softened_potential_far_field():
    assert float(softened_potential(50.0, 2.8)) == pytest.approx(-0.02, rel=1e-5)


def test_sph_kernel_matches_reference_and_normalizes():
    u = np.linspace(0, 0.999, 631)
    ours = np.asarray(sph_kernel(u))
    ref = np.array([_ref_sph_kernel(x) for x in u])
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    # integral of 4 pi u^2 W(u) du over [0,1] = 1
    uu = np.linspace(0, 1, 20001)
    w = np.asarray(sph_kernel(uu))
    integral = np.trapezoid(4 * np.pi * uu**2 * w, uu)
    assert integral == pytest.approx(1.0, rel=1e-4)


def test_sph_kernel_deriv_matches_reference():
    """KernelDer transcription from begrun.c:980,986 in float64."""
    u = np.linspace(0.01, 0.98, 211)
    ref = np.where(u <= 0.5,
                   8 / np.pi * (-12 * u + 18 * u * u),
                   8 / np.pi * (-6 * (1 - u) ** 2))
    np.testing.assert_allclose(np.asarray(sph_kernel_deriv(u)), ref,
                               rtol=1e-5, atol=1e-5)
