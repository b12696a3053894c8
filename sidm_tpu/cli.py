"""Command-line entry point.

Usage mirrors the reference (`mpirun -n N ./sidm-gadget parameter.txt
[restartflag]`, nbody/main.c:39-70) without the MPI launcher:

    python -m sidm_tpu <parameterfile> [restartflag]

restartflag: 0 = start from InitCondFile (default), 1 = resume from restart
file, 2 = start from a snapshot file (main.c:67-70, begrun.c:49-117).
"""

from __future__ import annotations

import sys

from .simulation import Simulation


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 1
    param_file = argv[0]
    restart_flag = int(argv[1]) if len(argv) > 1 else 0

    sim = Simulation.from_parameter_file(param_file, restart_flag=restart_flag)
    if restart_flag == 1:
        sim.load_restart_file()
    else:
        sim.load_ic()
    sim.prepare()

    # multi-chip auto-select (the mpirun -n N analog, main.c:39-53): with
    # more than one visible device the run loop goes through the sharded
    # MultichipRunner over the full mesh
    import jax
    n_dev = len(jax.devices())
    if n_dev > 1:
        from .parallel.mesh import make_mesh
        from .parallel.runner import MultichipRunner
        runner = MultichipRunner(sim, make_mesh(n_dev))
        steps = runner.run_sim()
        print(f"run finished ({n_dev} devices): {steps} steps, "
              f"t = {runner.time:g}")
        return 0

    steps = sim.run()
    print(f"run finished: {steps} steps, t = {sim.time:g}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
