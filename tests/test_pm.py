"""TreePM periodic gravity (ops/pm.py + fused_force pbc mode).

The split must reproduce the reference's Ewald-corrected periodic force
(direct.py + ewald.py tables are the oracle; the tables themselves match
exact lattice sums to 2.5e-5, measured in scripts/pm_check2.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sidm_tpu.ops import pm
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.ewald import build_ewald_table
from sidm_tpu.ops.fused_force import fused_gravity

BOX = 100.0
EPS = 0.15


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    n = 2048
    pos = rng.uniform(0, BOX, (n, 3)).astype(np.float32)
    pos[:n // 2] = (50.0 + rng.standard_normal((n // 2, 3)) * 4.0) % BOX
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    return jnp.asarray(pos), jnp.asarray(mass), jnp.full(n, EPS, jnp.float32)


def test_cic_deposit_conserves_mass(cloud):
    pos, mass, _ = cloud
    rho = pm.cic_deposit(pos, mass, BOX, 64)
    np.testing.assert_allclose(float(jnp.sum(rho)), float(jnp.sum(mass)),
                               rtol=1e-5)


def test_short_range_fac_matches_f64_reference():
    """Series-stabilized screened force factor vs an f64 math.erf
    evaluation across the series/direct switch (x = alpha r in [0, 2])."""
    import math

    alpha = 0.32
    h = 2.8 * EPS
    r_np = np.linspace(1e-4, 2.0, 400) / alpha
    f = np.asarray(pm.short_range_fac(jnp.asarray(r_np, jnp.float32),
                                      jnp.asarray(h, jnp.float32), alpha))
    from sidm_tpu.kernels import softened_inv_r3
    base = np.asarray(softened_inv_r3(jnp.asarray(r_np, jnp.float32),
                                      jnp.asarray(h, jnp.float32)))
    for i in range(0, 400, 7):
        x = alpha * r_np[i]
        g = (math.erf(x) - 2.0 * x * math.exp(-x * x) / math.sqrt(math.pi)
             ) / r_np[i] ** 3
        want = base[i] - g
        assert abs(f[i] - want) <= 2e-6 * abs(base[i]) + 1e-12


def test_treepm_force_matches_ewald_oracle(cloud):
    pos, mass, eps = cloud
    n = pos.shape[0]
    ew = build_ewald_table(BOX, cache_dir="/tmp")
    acc_ref, pot_ref = direct_gravity(pos, mass, eps, box=BOX, ewald=ew)

    kern = pm.build_pm_kernel(BOX, n=64, asmth=2.0, rcut_fac=6.0)
    pbc = (BOX, kern.alpha, kern.rcut)
    acc_s, pot_s = fused_gravity(pos, mass, eps, jnp.zeros(n), theta=0.5,
                                 opening=0, pbc=pbc)
    acc_l, pot_l = pm.pm_accel(kern, pos, mass, with_potential=True)
    acc = acc_s + acc_l
    pot = pot_s + pot_l + mass * (2.8372975 / BOX - kern.pot_self)

    anorm = jnp.linalg.norm(acc_ref, axis=1)
    scale = jnp.percentile(anorm, 50)
    rel = jnp.linalg.norm(acc - acc_ref, axis=1) / jnp.maximum(anorm, scale)
    # interlaced mesh-64: measured p99 ~1e-3 at this config
    assert float(jnp.percentile(rel, 99)) < 2.5e-3
    assert float(jnp.max(rel)) < 6e-3
    pscale = jnp.percentile(jnp.abs(pot_ref), 50)
    perr = jnp.abs(pot - pot_ref) / jnp.maximum(jnp.abs(pot_ref), pscale)
    assert float(jnp.percentile(perr, 99)) < 8e-3
    e_ref = float(0.5 * jnp.sum(mass * pot_ref))
    e_err = abs(float(0.5 * jnp.sum(mass * pot)) - e_ref) / abs(e_ref)
    assert e_err < 5e-3
