"""Fused TreePM periodic force vs direct-Ewald oracle (CPU, N=4096)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sidm_tpu.ops import pm
from sidm_tpu.ops.direct import direct_gravity
from sidm_tpu.ops.ewald import build_ewald_table
from sidm_tpu.ops.fused_force import fused_gravity

N = 4096
BOX = 100.0
EPS = 0.15


def main():
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, BOX, (N, 3)).astype(np.float32)
    nc = N // 2
    pos[:nc] = (50.0 + rng.standard_normal((nc, 3)) * 4.0) % BOX
    pos = jnp.asarray(pos)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, N).astype(np.float32))
    eps = jnp.full(N, EPS, jnp.float32)

    ew = build_ewald_table(BOX, cache_dir="/tmp")
    acc_ref, pot_ref = direct_gravity(pos, mass, eps, box=BOX, ewald=ew)

    import ast
    scaps = ast.literal_eval(os.environ.get("SCAPS", "[0.0, 2.0, 1.0, 0.5]"))
    kern = pm.build_pm_kernel(BOX, n=128, asmth=2.0, rcut_fac=6.0)
    rs = 1.0 / kern.alpha
    for opening, scap in [(o, s) for s in scaps for o in (0, 1)]:
        pbc = (BOX, kern.alpha, kern.rcut, scap * rs)
        oa = jnp.zeros(N, jnp.float32) if opening == 0 else \
            jnp.linalg.norm(acc_ref, axis=1)
        t0 = time.time()
        acc_s, pot_s = fused_gravity(pos, mass, eps, oa, theta=0.5,
                                     opening=opening, pbc=pbc)
        acc_l, pot_l = pm.pm_accel(kern, pos, mass, with_potential=True)
        acc = acc_s + acc_l
        pot = pot_s + pot_l - mass * kern.pot_self + mass * 2.8372975 / BOX
        anorm = jnp.linalg.norm(acc_ref, axis=1)
        scale = jnp.percentile(anorm, 50)
        rel = jnp.linalg.norm(acc - acc_ref, axis=1) / jnp.maximum(anorm,
                                                                   scale)
        p99 = float(jnp.percentile(rel, 99))
        pmax = float(jnp.max(rel))
        pscale = jnp.percentile(jnp.abs(pot_ref), 50)
        perr = float(jnp.percentile(
            jnp.abs(pot - pot_ref) / jnp.maximum(jnp.abs(pot_ref), pscale),
            99))
        e_ref = float(0.5 * jnp.sum(mass * pot_ref))
        e_err = abs(float(0.5 * jnp.sum(mass * pot)) - e_ref) / abs(e_ref)
        print(f"opening {opening} scap {scap:4.1f}rs: force p99 {p99:.2e} "
              f"max {pmax:.2e} pot p99 {perr:.2e} Epot {e_err:.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
