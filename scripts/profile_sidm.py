"""SIDM fused-range engine: group_block sweep + stage timing at bench scale.

Run: python scripts/profile_sidm.py [N] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def timeit(label, fn, *args, reps=REPS):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / reps
    print(f"{label:<46s} {dt*1e3:10.1f} ms   (compile+1st {tc:.1f}s)",
          flush=True)
    return out, dt


def main():
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.ops import fused_force as ff
    from sidm_tpu.ops.fused_range import sidm_scatter_fused
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.rng import run_key, step_key
    from sidm_tpu.simulation import Simulation, softening_table
    from sidm_tpu.state import make_particles

    print(f"N = {N}, devices = {jax.devices()}", flush=True)
    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    cfg = SimConfig(
        SIDMOn=1, CrossSection=38.2614, ProbabilityTol=0.2,
        ForceMethod="tree", SofteningHalo=0.3, DesNumNgb=30,
        ReflectionBoundary=1114.35,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5)
    sim = Simulation(cfg, mode="phased")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(N, np.int32),
                                  pad_to_multiple=4096)
    print("# hsml init ...", flush=True)
    t0 = time.time()
    sim.prepare()
    print(f"# prepare: {time.time()-t0:.1f}s", flush=True)

    p = sim.particles
    params = sim._sidm_params_for_phased()
    soft = jnp.asarray(softening_table(cfg, sim.time), jnp.float32)
    eps = soft[jnp.clip(p.ptype, 0, 5)]
    m = jnp.where(p.valid, p.mass, 0.0)
    depth = ff.default_depth(p.n_padded)
    tree = jax.jit(lambda: build_octree(p.pos, m, eps, p.valid, box=0.0,
                                        depth=depth))()
    t_next = jnp.asarray(sim.time + 1e-3, jnp.float32)
    active = p.valid
    vmax = jnp.asarray(sim.vmax, jnp.float32)
    key = step_key(sim.root_key, 1)

    for gb in (32, 64, 128, 256):
        fcfg = ff.FusedConfig(group_block=gb)
        run = jax.jit(lambda tr, gb=gb, fcfg=fcfg: sidm_scatter_fused(
            p, p.pos, tr, t_next, active, vmax, key, params, cfg=fcfg))
        timeit(f"sidm_scatter_fused group_block={gb}", run, tree)


if __name__ == "__main__":
    main()
