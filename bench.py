"""Headline benchmark: particle-steps/sec/chip for the flagship SIDM config.

Config 4-style run (BASELINE.json): N=1e6 NFW halo, constant sigma/m SIDM,
tree gravity (relative criterion), reflection boundary — the Koda & Shapiro
gravothermal-collapse setup (nbody/parameter.txt) at 2x the documented N.

Prints ONE JSON line:
  {"metric": "particle-steps/sec/chip", "value": ..., "unit": "1/s",
   "vs_baseline": ...}

vs_baseline compares against the reference CPU throughput. The reference
publishes no numbers (BASELINE.md); we use 1.5e5 particle-steps/sec/core, a
standard figure for GADGET-class tree codes at N~1e6 with theta~0.5 on a
modern x86 core (documented in BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

CPU_REFERENCE_PART_STEPS_PER_SEC = 1.5e5

N = int(os.environ.get("BENCH_N", 1_000_000))
STEPS = int(os.environ.get("BENCH_STEPS", 16))
# one full lazy-rebuild cadence: STEPS covers (K-1) cached-list steps +
# 1 rebuild step, so the measured window is the honest amortized cost
REFRESH = int(os.environ.get("BENCH_REFRESH", 16))


def main():
    import jax
    import jax.numpy as jnp

    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.rng import run_key, step_key
    from sidm_tpu.simulation import Simulation

    # NFW halo from parameter.txt:3-11 (rho0=1.49e-4, rs=11.14), sigma/m from
    # parameter.txt:30, kpc/1e10Msun/km-s units
    cfg = SimConfig(
        SIDMOn=1, CrossSection=38.2614, ProbabilityTol=0.2,
        RandomSeed1=55, RandomSeed2=497527,
        ForceMethod="tree", ErrTolTheta=0.5, TypeOfOpeningCriterion=1,
        ErrTolForceAcc=0.005, TypeOfTimestepCriterion=1, ErrTolVelScale=0.66,
        ErrTolDynamicalAccuracy=0.004,
        MaxSizeTimestep=0.1, TimeBegin=0.0, TimeMax=500.0,
        SofteningHalo=0.3, SofteningHaloMaxPhys=0.3,
        DesNumNgb=30, MaxNumNgbDeviation=2,
        TreeRefreshSteps=REFRESH,
        ReflectionBoundary=1114.35,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5)

    t0 = time.time()
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass,
                                  np.ones(N, np.int32), pad_to_multiple=4096)
    print(f"# ICs+setup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    sim.prepare()
    print(f"# prepare (first force + hsml + compile): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # warm-up steps: compile the non-first path AND absorb the skin
    # ramp-up transient (the first rebuild cycle is short while the
    # displacement rate is being learned); the measured window still
    # spans one full rebuild cadence
    t0 = time.time()
    for _ in range(3):
        sim.step()
    print(f"# warmup steps: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(STEPS):
        sim.step()
    jax.block_until_ready(sim.particles.pos)
    elapsed = time.time() - t0
    print(f"# {STEPS} steps: {elapsed:.2f}s "
          f"({elapsed/STEPS:.3f}s/step)", file=sys.stderr)

    value = N * STEPS / elapsed
    print(json.dumps({
        "metric": "particle-steps/sec/chip",
        "value": round(value, 1),
        "unit": "1/s",
        "vs_baseline": round(value / CPU_REFERENCE_PART_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
