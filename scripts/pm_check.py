"""CPU check: TreePM split (direct screened short + PM long) vs the
direct-Ewald oracle. Run: JAX_PLATFORMS= python scripts/pm_check.py"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sidm_tpu.kernels import softened_inv_r3
from sidm_tpu.ops import pm
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.ewald import build_ewald_table

N = 4096
BOX = 100.0
EPS = 0.15


def short_direct(pos, mass, eps, kern):
    """O(N^2) screened short-range with min-image + rcut (oracle side)."""
    d = pos[None, :, :] - pos[:, None, :]
    d = d - BOX * jnp.round(d / BOX)
    r2 = jnp.sum(d * d, axis=-1)
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(eps[:, None], eps[None, :])
    fac = pm.short_range_fac(r, h, kern.alpha) * mass[None, :]
    fac = jnp.where(r <= kern.rcut, fac, 0.0)
    fac = fac * (1.0 - jnp.eye(N))
    acc = jnp.einsum("ts,tsd->td", fac, d)
    p = pm.short_range_pot(r, h, kern.alpha) * mass[None, :]
    p = jnp.where(r <= kern.rcut, p, 0.0)
    pot = jnp.sum(p * (1.0 - jnp.eye(N)), axis=1)
    return acc, pot


def main():
    rng = np.random.default_rng(7)
    # clustered + uniform mix so there are tight pairs AND box-scale pairs
    pos = rng.uniform(0, BOX, (N, 3)).astype(np.float32)
    nc = N // 2
    pos[:nc] = (50.0 + rng.standard_normal((nc, 3)) * 4.0) % BOX
    pos = jnp.asarray(pos)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, N).astype(np.float32))
    eps = jnp.full(N, EPS, jnp.float32)

    ew = build_ewald_table(BOX, cache_dir="/tmp")
    acc_ref, pot_ref = direct_gravity(pos, mass, eps, box=BOX, ewald=ew)

    for n_mesh, asmth, rcut_fac in [(64, 1.25, 4.5), (128, 1.25, 4.5),
                                    (128, 1.5, 5.0)]:
        t0 = time.time()
        kern = pm.build_pm_kernel(BOX, n=n_mesh, asmth=asmth,
                                  rcut_fac=rcut_fac)
        acc_l, pot_l = pm.pm_accel(kern, pos, mass, with_potential=True)
        acc_s, pot_s = short_direct(pos, mass, eps, kern)
        acc = acc_l + acc_s
        pot = pot_l + pot_s - mass * kern.pot_self + mass * 2.8372975 / BOX
        # oracle direct+ewald already includes psi(0) self (d=0 row) and
        # we exclude self in short_direct; direct_gravity removes spline
        # self-pot via +mass/eps, our short excluded self entirely ->
        # compare pot up to that spline self-term
        pot_ref_cmp = pot_ref - mass / eps + mass / eps * 0  # keep explicit
        pot_cmp = pot
        anorm = jnp.linalg.norm(acc_ref, axis=1)
        scale = jnp.percentile(anorm, 50)
        err = jnp.linalg.norm(acc - acc_ref, axis=1)
        rel = err / jnp.maximum(anorm, scale)
        p99 = float(jnp.percentile(rel, 99))
        pmax = float(jnp.max(rel))
        perr = float(jnp.percentile(
            jnp.abs(pot_cmp - pot_ref_cmp)
            / jnp.maximum(jnp.abs(pot_ref_cmp), 1e-6), 99))
        print(f"mesh {n_mesh:4d} asmth {asmth:4.2f} rcut {kern.rcut:7.3f}: "
              f"force p99 {p99:.2e} max {pmax:.2e}  pot p99 {perr:.2e}  "
              f"({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
