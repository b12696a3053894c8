"""Flagship-parameter Hsml-controller rate validation (VERDICT r3 #8).

Measures the steady-state SIDM scattering rate of the production
multiplicative controller against an exact-band reference (per-step
exact kNN radius, the sidm_ensure_neighbours invariant, sidm.c:814-968)
on an NFW halo at the parameter.txt flagship parameters
(sigma/m = 38.26 cm^2/g internal-units equivalent, DesNumNgb=30).

Run: python scripts/validate_hsml_band.py [N] [steps]
Prints both rates, the Poisson resolution, and the relative deviation.
Result is recorded in PARITY.md #14.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
BURN = 10
DT = 0.25           # internal time units; scattering-active but P << 1
SIGMA = 38.2614     # parameter.txt:30 (cm^2/g, converted below)


def main():
    from sidm_tpu.config import SimConfig, set_units
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import default_depth
    from sidm_tpu.ops.fused_range import sidm_scatter_fused
    from sidm_tpu.ops.neighbors import setup_smoothing_lengths
    from sidm_tpu.ops.sidm import SidmParams
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.rng import run_key, step_key
    from sidm_tpu.state import make_particles

    cfg = SimConfig(CrossSection=SIGMA, SIDMOn=1,
                    UnitLength_in_cm=3.085678e21,
                    UnitMass_in_g=1.989e43,
                    UnitVelocity_in_cm_per_s=1e5)
    units = set_units(cfg)
    sig_int = units.CrossSectionInternal
    print(f"N={N} sigma/m internal={sig_int:.4g}")

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=7)
    p0 = make_particles(pos, vel, mass, np.ones(N, np.int32),
                        pad_to_multiple=4096)
    n_pad = p0.n_padded
    eps = jnp.full(n_pad, 0.3, jnp.float32)
    params = SidmParams(sig_int, 0, 1.0, 1.0, 0.0, 30, 2, False, 0.1,
                        0.0, 0.0, maintenance_rate=1.0)
    tree = build_octree(p0.pos, jnp.where(p0.valid, p0.mass, 0.0), eps,
                        p0.valid, box=0.0, depth=default_depth(n_pad))

    t = jnp.asarray(DT / 2.0, jnp.float32)
    vmax = jnp.sqrt(jnp.max(jnp.sum(p0.vel ** 2, -1)))
    root = run_key(99, 5)

    print("exact kNN radii (band reference)...", flush=True)
    t0 = time.time()
    p_band = setup_smoothing_lengths(p0, 30, 2)
    h_band = p_band.hsml_vd
    print(f"  {time.time()-t0:.1f}s", flush=True)

    @jax.jit
    def one(p, key, salt):
        pp, ns = sidm_scatter_fused(p, p.pos, tree, t, p.valid, vmax,
                                    key, params, salt=salt, box=0.0)
        return dataclasses.replace(pp, dvel=jnp.zeros_like(pp.dvel)), ns

    results = {}
    for mode in ("band", "controller"):
        p = (p_band if mode == "band"
             else dataclasses.replace(p0, hsml_vd=3.0 * h_band))
        counts = []
        t0 = time.time()
        for i in range(STEPS):
            if mode == "band":
                p = dataclasses.replace(p, hsml_vd=h_band)
            p, ns = one(p, step_key(root, i), i)
            counts.append(int(ns))
        counts = np.asarray(counts)
        r = counts[BURN:].mean()
        results[mode] = (r, counts[BURN:].sum())
        print(f"{mode:>11s}: rate {r:.1f} ev/step "
              f"(total {counts.sum()}, {time.time()-t0:.1f}s) "
              f"first/last5: {counts[:5]} ... {counts[-5:]}", flush=True)

    r_c, n_c = results["controller"]
    r_b, n_b = results["band"]
    poisson = np.sqrt(1.0 / max(n_c, 1) + 1.0 / max(n_b, 1))
    dev = (r_c - r_b) / r_b
    print(f"\nrelative deviation: {dev*100:+.2f}%  "
          f"(Poisson 1-sigma {poisson*100:.2f}%)")
    print("PASS" if abs(dev) < 0.01 + 3 * poisson else "FAIL")


if __name__ == "__main__":
    main()
