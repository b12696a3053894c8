"""TreePM vs EXACT Ewald sums (no table interpolation), N=1024, CPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sidm_tpu.kernels import softened_inv_r3, softened_potential
from sidm_tpu.ops import pm
from sidm_tpu.ops.ewald import _ewald_force_grid, _ewald_psi_grid

N = 1024
BOX = 100.0
EPS = 0.15


def exact_ref(pos, mass, eps):
    """Exact periodic force: spline-softened nearest image + exact Ewald
    correction (lattice sums at the true separations)."""
    d = pos[None, :, :] - pos[:, None, :]
    d = d - BOX * jnp.round(d / BOX)
    r2 = jnp.sum(d * d, -1)
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(eps[:, None], eps[None, :])
    off = 1.0 - jnp.eye(N)
    fac = softened_inv_r3(r, h) * mass[None, :] * off
    acc = jnp.einsum("ts,tsd->td", fac, d)
    pot = jnp.sum(softened_potential(r, h) * mass[None, :] * off, axis=1)
    # exact correction, chunked over targets; ewald grids take x in UNIT box
    # and return unit-box forces: scale in/out
    du = d / BOX
    accs, pots = [], []
    for i in range(0, N, 64):
        fc = _ewald_force_grid(du[i:i+64])          # (64,N,3) unit box
        pc = _ewald_psi_grid(du[i:i+64])            # (64,N)
        # correction EXCLUDES the nearest-image newtonian (fc includes
        # x/r^3 leading term; see ewald.c usage: total = pair + corr where
        # corr = fc - ... actually _ewald_force_grid returns the full
        # correction as used to build the tables: f_corr(x) with
        # f_corr(x) = x/|x|^3 - sum_images(...) so ADDing it to the
        # nearest-image force gives the lattice force.
        accs.append(jnp.einsum("ts,tsd->td", mass[None, :] * off[i:i+64],
                               -fc) / BOX**2)
        pots.append(jnp.sum(mass[None, :] * pc * off[i:i+64], axis=1) / BOX)
    acc = acc + jnp.concatenate(accs)
    # self lattice term psi(0)
    pot = pot + jnp.concatenate(pots) + mass * 2.8372975 / BOX
    return acc, pot


def short_direct(pos, mass, eps, kern):
    d = pos[None, :, :] - pos[:, None, :]
    d = d - BOX * jnp.round(d / BOX)
    r2 = jnp.sum(d * d, -1)
    r = jnp.sqrt(r2)
    h = 2.8 * jnp.maximum(eps[:, None], eps[None, :])
    off = 1.0 - jnp.eye(N)
    fac = pm.short_range_fac(r, h, kern.alpha) * mass[None, :] * off
    fac = jnp.where(r <= kern.rcut, fac, 0.0)
    acc = jnp.einsum("ts,tsd->td", fac, d)
    p = pm.short_range_pot(r, h, kern.alpha) * mass[None, :] * off
    p = jnp.where(r <= kern.rcut, p, 0.0)
    return acc, jnp.sum(p, axis=1)


def main():
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, BOX, (N, 3)).astype(np.float32)
    nc = N // 2
    pos[:nc] = (50.0 + rng.standard_normal((nc, 3)) * 4.0) % BOX
    pos = jnp.asarray(pos)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, N).astype(np.float32))
    eps = jnp.full(N, EPS, jnp.float32)

    t0 = time.time()
    acc_ref, pot_ref = exact_ref(pos, mass, eps)
    print(f"exact ref: {time.time()-t0:.1f}s", flush=True)

    # sign/convention check of the exact ref against the table oracle
    from sidm_tpu.ops.direct import direct_gravity
    from sidm_tpu.ops.ewald import build_ewald_table
    ew = build_ewald_table(BOX, cache_dir="/tmp")
    acc_t, pot_t = direct_gravity(pos, mass, eps, box=BOX, ewald=ew)
    da = float(jnp.percentile(jnp.linalg.norm(acc_t - acc_ref, axis=1)
                              / jnp.maximum(jnp.linalg.norm(acc_ref, axis=1),
                                            1e-12), 99))
    dp = float(jnp.percentile(jnp.abs(pot_t - pot_ref)
                              / jnp.abs(pot_ref), 99))
    print(f"table oracle vs exact: force p99 {da:.2e}  pot p99 {dp:.2e}",
          flush=True)

    import ast
    sweep = ast.literal_eval(os.environ.get(
        "PM_SWEEP", "[(64,1.25,4.5),(128,1.25,4.5),(128,1.5,5.0),"
        "(256,1.25,4.5)]"))
    for n_mesh, asmth, rcut_fac in sweep:
        kern = pm.build_pm_kernel(BOX, n=n_mesh, asmth=asmth,
                                  rcut_fac=rcut_fac)
        acc_l, pot_l = pm.pm_accel(kern, pos, mass, with_potential=True)
        acc_s, pot_s = short_direct(pos, mass, eps, kern)
        acc = acc_l + acc_s
        pot = pot_l + pot_s - mass * kern.pot_self + mass * 2.8372975 / BOX
        anorm = jnp.linalg.norm(acc_ref, axis=1)
        scale = jnp.percentile(anorm, 50)
        rel = jnp.linalg.norm(acc - acc_ref, axis=1) / jnp.maximum(anorm,
                                                                   scale)
        p99 = float(jnp.percentile(rel, 99))
        pmax = float(jnp.max(rel))
        pscale = jnp.percentile(jnp.abs(pot_ref), 50)
        perr = float(jnp.percentile(jnp.abs(pot - pot_ref)
                                    / jnp.maximum(jnp.abs(pot_ref), pscale),
                                    99))
        e_ref = float(0.5 * jnp.sum(mass * pot_ref))
        e_err = abs(float(0.5 * jnp.sum(mass * pot)) - e_ref) / abs(e_ref)
        print(f"mesh {n_mesh:4d} asmth {asmth:4.2f} rcut {kern.rcut:7.3f}: "
              f"force p99 {p99:.2e} max {pmax:.2e}  pot p99 {perr:.2e} "
              f"Epot rel {e_err:.2e}", flush=True)


if __name__ == "__main__":
    main()
