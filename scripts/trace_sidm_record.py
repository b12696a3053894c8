"""jax.profiler trace of one SIDM candidate record at bench scale.

The honest-barrier bench attribution puts record_candidates at ~37 s per
rebuild — half the whole refresh cycle. This captures the op-level
breakdown (walk vs emission vs appends); summarize with trace_summary.py.

Run: python scripts/trace_sidm_record.py [N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
OUT = os.environ.get("TRACE_DIR", "/tmp/campaign/trace_sidm_record")


def main():
    from sidm_tpu.config import SimConfig
    from sidm_tpu.io import ics
    from sidm_tpu.ops.fused_force import default_depth
    from sidm_tpu.ops.fused_range import tree_hsml_init_fused
    from sidm_tpu.ops.list_range import record_candidates_from_particles
    from sidm_tpu.ops.tree import build_octree
    from sidm_tpu.simulation import Simulation, softening_table

    pos, vel, mass = ics.nfw(N, rho0=1.49e-4, rs=11.14356, G=43007.1,
                             seed=12345)
    cfg = SimConfig(
        SIDMOn=1, CrossSection=38.2614, ProbabilityTol=0.2,
        ForceMethod="tree", SofteningHalo=0.3, DesNumNgb=30,
        ReflectionBoundary=1114.35,
        UnitLength_in_cm=3.085678e21, UnitMass_in_g=1.989e43,
        UnitVelocity_in_cm_per_s=1e5)
    sim = Simulation(cfg, mode="synchronized")
    sim.set_particles_from_arrays(pos, vel, mass, np.ones(N, np.int32),
                                  pad_to_multiple=4096)
    p = sim.particles
    soft = jnp.asarray(softening_table(cfg, 0.0), jnp.float32)
    eps = soft[jnp.clip(p.ptype, 0, 5)]
    tree = build_octree(p.pos, jnp.where(p.valid, p.mass, 0.0), eps,
                        p.valid, box=0.0, depth=default_depth(p.n_padded))
    p = tree_hsml_init_fused(p, tree, cfg.DesNumNgb, box=0.0)
    params = sim._sidm_params_for_phased()

    def rec():
        return record_candidates_from_particles(
            p, p.pos, tree, skin=jnp.float32(0.5), params=params, box=0.0)

    # compile + settle hsml
    out = rec()
    jax.block_until_ready(out.cand)
    float(np.asarray(out.ncand[:1])[0])
    print(f"ncand mean/max = {np.asarray(out.ncand).mean():.0f}/"
          f"{np.asarray(out.ncand).max()}", flush=True)

    import time
    t0 = time.time()
    out = rec()
    jax.block_until_ready(out.cand)
    float(np.asarray(out.ncand[:1])[0])
    print(f"record wall (true barrier): {time.time()-t0:.1f}s", flush=True)

    os.makedirs(OUT, exist_ok=True)
    with jax.profiler.trace(OUT):
        out = rec()
        jax.block_until_ready(out.cand)
        float(np.asarray(out.ncand[:1])[0])
    print(f"trace written to {OUT}", flush=True)


if __name__ == "__main__":
    main()
