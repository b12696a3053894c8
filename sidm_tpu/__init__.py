"""sidm-tpu: a TPU-native SIDM N-body engine (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of junkoda/sidm-nbody
(GADGET-1.1 + Koda & Shapiro 2011 DSMC self-interacting dark matter),
designed TPU-first: structure-of-arrays particle pytrees, vectorized
tree/neighbour kernels, counter-based RNG, and mesh sharding over ICI in
place of MPI domain decomposition.
"""

__version__ = "0.1.0"

from .config import SimConfig, Units, parse_parameter_file, set_units
from .state import Particles, SystemState, make_particles
